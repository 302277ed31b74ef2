"""F4 IP-source precedence: -ipcol / -jsoncol modes."""

from pyspark.sql import functions as F

from logboost_spark.functions.ip import ip_extract_stage


def test_ipcol_mode(spark):
    rows = [
        ("8.8.8.8", "noise 1.1.1.1"),  # cell parses → wins over row content
        ("10.0.0.1", "noise 1.1.1.1"),  # private cell still wins (reference keeps it)
        ("garbage with 9.9.9.9 inside", "x"),  # unparseable → regex the CELL
        ("no ip here", "but 2.2.2.2 in another col"),  # cell regex fails → NoIP
    ]
    df = spark.createDataFrame(rows, "src string, text string")
    out = ip_extract_stage(df, ip_col_name="src").select("_ip", "_cls").collect()
    assert (out[0]["_ip"], out[0]["_cls"]) == ("8.8.8.8", "pub")
    assert (out[1]["_ip"], out[1]["_cls"]) == ("10.0.0.1", "pvt")
    assert (out[2]["_ip"], out[2]["_cls"]) == ("9.9.9.9", "pub")
    assert out[3]["_cls"] == "noip"


def test_jsoncol_mode(spark):
    rows = [
        ('{"ClientIP":"8.8.4.4","Op":"x"}', "other 1.1.1.1"),  # probe wins
        ('{"ClientIPAddress":"13.107.42.1","Op":"x"}', "other"),  # alt key
        ('{"NoProbe":"x"}', "fallback row scan 7.7.7.7"),  # probe miss → row regex
        ('{"ClientIP":"not-an-ip","Op":"x"}', "row has 5.5.5.5"),  # garbage probe → NoIP (ParseIP nil)
    ]
    df = spark.createDataFrame(rows, "blob string, text string")
    out = ip_extract_stage(df, json_col_name="blob").select("_ip", "_cls").collect()
    assert out[0]["_ip"] == "8.8.4.4"
    assert out[1]["_ip"] == "13.107.42.1"
    assert out[2]["_ip"] == "7.7.7.7"
    assert out[3]["_cls"] == "noip"
