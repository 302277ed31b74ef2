# REPL scratch: IP function smoke vs reference test vectors
import importlib
import logboost_spark.functions.ip as ipmod
importlib.reload(ipmod)
from pyspark.sql import functions as F

priv = ["127.0.0.1", "192.168.3.5", "172.16.2.3", "255.255.255.255",
        "fe80::ffff:ffff:ffff:ffff", "::1",
        "fdff:ffff:ffff:ffff:ffff:ffff:ffff:ffff",
        "64:ff9b:1:ffff:ffff:ffff:ffff:ffcf", "0.0.0.0", "224.0.0.5",
        "169.254.1.1", "192.0.2.7", "192.0.0.9", "10.250.1.2"]
pub = ["8.8.8.8", "32.3.54.1", "1.1.1.1",
       "2002:ffff:ffff:ffff:ffff:ffff:ffff:ffcf",
       "2001::ffff:ffff:ffff:ffff:ffff:fcff", "203.0.113.9", "100.64.3.1"]
df = spark.createDataFrame([(s, True) for s in priv] + [(s, False) for s in pub], "ip string, want_private boolean")
bad = df.withColumn("got", ipmod.is_private_ip(F.col("ip"))).filter(F.col("got") != F.col("want_private"))
print("PRIVACY MISMATCHES:", bad.count()); bad.show(truncate=False)

lines = [
    ("GET /x from 192.168.1.5 then 8.8.8.8 end", "8.8.8.8", True, False),
    ("only private 10.0.0.1 and 172.16.2.3 here", "10.0.0.1", True, True),
    ("no ip at all in this line", None, False, False),
    ("v6 only 2002:ffff:ffff:ffff:ffff:ffff:ffff:ffcf trailing", "2002:ffff:ffff:ffff:ffff:ffff:ffff:ffcf", True, False),
    ("v6 private only fe80::1 text", "fe80::1", True, True),
    ("203.0.113.7 - frank [10/Oct/2000:13:55:36 -0700] \"GET /x HTTP/1.0\" 200 2326", "203.0.113.7", True, False),
    ("mixed 255.255.255.255 then 1.1.1.1", "1.1.1.1", True, False),
    ("version 1.2.3.4.5 not exactly an ip 999.1.2.3", "2.3.4.5", True, False),
]
df2 = spark.createDataFrame([(a, b, c, d) for a, b, c, d in lines], "text string, want_ip string, want_found boolean, want_priv boolean")
r = df2.withColumn("s", ipmod.first_public_ip(F.col("text"))).select("text", "want_ip", "s.*")
r.show(truncate=60)
mism = r.filter(~(F.coalesce(F.col("ip") == F.col("want_ip"), F.col("ip").isNull() & F.col("want_ip").isNull())))
print("EXTRACT MISMATCHES:", mism.count())
print("IP_SMOKE_DONE")
