# Profile the enrichment plan: where does the time go?
import time
from pyspark.sql import functions as F
from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.operators.enrich import enrich
from logboost_spark.functions.ip import ip_extract_stage

tr = spark.read.parquet("/root/repo/data/transcripts_sf0.01.parquet")
lk = build_lookup_dfs(spark)

t0 = time.time(); n = tr.count(); print("read count", n, round(time.time()-t0,1))

# extraction only
t0 = time.time()
ip_extract_stage(tr).select(F.count(F.lit(1))).collect()
print("extract-only:", round(time.time()-t0, 1))

# enrich build + explain cost
t0 = time.time()
e = enrich(tr, lk, use_whois=False, use_idb=False)
print("plan build:", round(time.time()-t0, 1))
t0 = time.time()
plan = e._jdf.queryExecution().executedPlan().toString()
print("physical plan materialize:", round(time.time()-t0, 1), "plan chars:", len(plan))
import re
print("JOIN NODES:", re.findall(r"(BroadcastHashJoin|BroadcastNestedLoopJoin|SortMergeJoin|CartesianProduct)", plan).__len__(),
      set(re.findall(r"(BroadcastHashJoin|BroadcastNestedLoopJoin|SortMergeJoin|CartesianProduct)", plan)))

t0 = time.time()
e.select(F.count(F.lit(1))).collect()
print("enrich count:", round(time.time()-t0, 1))

t0 = time.time()
e.groupBy("lb_Country").count().collect()
print("enrich groupBy:", round(time.time()-t0, 1))
print("PROFILE_DONE")
