"""Format router + per-format extraction (P1-P11)."""

from pyspark.sql import functions as F

from logboost_spark.fixtures import transcripts as TR
from logboost_spark.parsers.formats import detect_format, explode_multi_json, parse_stage

SAMPLES = {
    "clf_common": '203.0.113.7 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326',
    "clf_combined": '203.0.113.7 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326 "http://r.example.com" "Mozilla/5.0"',
    "syslog_generic": "Jun 27 18:19:37 ip-172-31-82-74 systemd[1]: Started Session 1752 of user root.",
    "syslog_rfc3164": "<6>Sep 14 14:12:51 10.1.1.143 su: 'su root' failed",
    "syslog_rfc5424": "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com app - ID47 - BOM event",
    "cef": "CEF:0|SecVendor|ThreatMgr|1.0|100|detected|5|src=203.0.113.9 dst=10.1.1.4 spt=1232",
    "kv": 'timestamp="Jun 12 2023 00:00:00.000", source=host1, ip=203.0.113.5, action=allow',
    "json": '{"type":"accesslog","remoteIP":"203.0.113.4","elapsed":834,"nested":{"k":"v"},"ok":true}',
    "json_multi": '{"Records":[{"eventName":"Login","sourceIPAddress":"203.0.113.2","requestID":7}]}',
    "iis_w3c": "#Fields: date time c-ip cs-method sc-status\n2023-06-01 00:00:00 203.0.113.3 GET 200",
    "raw": "completely unstructured line with no recognizable format",
}


def test_detection_precedence(spark):
    rows = [(fmt, text) for fmt, text in SAMPLES.items()]
    df = spark.createDataFrame(rows, "want string, text string")
    got = df.select("want", detect_format(F.col("text")).alias("got")).collect()
    for r in got:
        assert r.got == r.want, (r.want, r.got)


def test_field_extraction(spark):
    rows = [(fmt, text) for fmt, text in SAMPLES.items()]
    df = parse_stage(spark.createDataFrame(rows, "want string, text string"))
    fields = {r.want: r.fields for r in df.select("want", "fields").collect()}

    assert fields["clf_common"]["client"] == "203.0.113.7"
    assert fields["clf_common"]["httpstatus"] == "200"
    assert fields["clf_combined"]["useragent"] == "Mozilla/5.0"
    assert fields["syslog_rfc3164"]["HOST"] == "10.1.1.143"
    assert fields["syslog_rfc5424"]["TIMESTAMP"] == "2003-10-11T22:14:15.003Z"
    assert fields["syslog_generic"]["PROCESS"] == "systemd"
    assert fields["syslog_generic"]["PROCID"] == "1"
    assert fields["cef"]["CEF_VENDOR"] == "SecVendor"
    assert fields["cef"]["src"] == "203.0.113.9"
    assert fields["cef"]["CEF_EVENT_SEVERITY"] == "5"
    assert fields["kv"]["ip"] == "203.0.113.5"
    assert fields["kv"]["timestamp"] == "Jun 12 2023 00:00:00.000"
    assert fields["json"]["remoteIP"] == "203.0.113.4"
    assert fields["json"]["nested_k"] == "v"  # deep flatten, parent_child
    assert fields["json"]["ok"] == "true"  # Go bool stringify
    assert fields["json_multi"]["sourceIPAddress"] == "203.0.113.2"
    assert fields["iis_w3c"]["c-ip"] == "203.0.113.3"
    assert fields["raw"]["line"].startswith("completely")


def test_all_generator_templates_detected(spark):
    """Every fixture template lands on its intended parser family."""
    df = parse_stage(spark.createDataFrame(TR.gen_pandas(1200)))
    counts = {r.format: r.cnt for r in df.groupBy("format").agg(F.count("*").alias("cnt")).collect()}
    # 12 templates; clf x2, syslog x3, json x2(+azure)=3, cef, kv, iis, raw
    assert set(counts) == {
        "clf_common", "clf_combined", "syslog_generic", "syslog_rfc3164",
        "syslog_rfc5424", "cef", "kv", "json", "json_multi", "iis_w3c", "raw",
    }


def test_explode_multi_json(spark):
    df = spark.createDataFrame(
        [('{"Records":[{"a":1},{"a":2},{"a":3}]}',), ('{"Records":[{"a":9}]}',)],
        "text string",
    )
    out = explode_multi_json(df)
    assert out.count() == 4
    vals = sorted(r.fields["a"] for r in out.collect())
    assert vals == ["1", "2", "3", "9"]
