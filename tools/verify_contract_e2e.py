"""Drive the driver contract + resume exactly as the harness would."""
import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from logboost_spark.session import get_spark
import __spark_entry__ as E

spark = get_spark(cores=8)

# 1. entry() smoke (what the driver does at t1)
df = E.entry(spark)
n = df.count()
print("ENTRY rows:", n, "cols:", len(df.columns), df.columns[:6], "...")
assert n > 0

# 2. queries()/oracle_sql() contract shape
qs, os_ = E.queries(), E.oracle_sql()
missing = [k for k in os_ if k not in qs]
print("QUERIES:", len(qs), "ORACLES:", len(os_), "orphan oracles:", missing)
rows_only = sorted(set(qs) - set(os_))
print("rows-only (documented):", rows_only)

# 3. resume drive: full run → destroy one group's commit → resume
from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.plans.pipeline import run_pipeline
from logboost_spark.plans.checkpoint import sink_counts, read_sinks

out = "/tmp/verify_resume"
shutil.rmtree(out, ignore_errors=True)
tr = spark.read.parquet("/root/repo/data/transcripts_sf0.001.parquet")
lk = build_lookup_dfs(spark)
m1 = run_pipeline(spark, tr, lk, out, n_groups=3, partitions_per_group=2,
                  use_whois=False, use_idb=False)
c1 = sink_counts(spark, out)
print("RUN1 groups:", [m["group"] for m in m1], "counts:", c1)
# simulate crash: group 1 partially written (manifest gone, data half-there)
os.remove(os.path.join(out, "_manifest", "group-0001.json"))
datadir = os.path.join(out, "data", "group=1")
some_sink = sorted(d for d in os.listdir(datadir) if d.startswith("sink="))[0]
victims = [f for f in os.listdir(os.path.join(datadir, some_sink)) if f.endswith(".parquet")]
os.remove(os.path.join(datadir, some_sink, victims[0]))  # corrupt partial state
m2 = run_pipeline(spark, tr, lk, out, n_groups=3, partitions_per_group=2, resume=True,
                  use_whois=False, use_idb=False)
c2 = sink_counts(spark, out)
print("RESUME redid groups:", [m["group"] for m in m2], "counts equal:", c1 == c2)
assert [m["group"] for m in m2] == [1] and c1 == c2
assert read_sinks(spark, out).count() == sum(c1.values())
print("RESUME_OK")

# 4. probe: unknown sf_dir → clear failure, not silent wrong data
try:
    E.queries()["q1_pricing_summary"](spark, "/nonexistent/sfX").count()
    print("PROBE unknown sf_dir: NO ERROR (!)")
except Exception as ex:
    print("PROBE unknown sf_dir ->", type(ex).__name__, str(ex).splitlines()[0][:80])

print("VERIFY_CONTRACT_DONE")
