"""Scaling-efficiency evidence for the north_rule's two-cluster-size
criterion: the same pipeline job on the same input at local[8] vs
local[32] (stand-in for N vs 4N executors; no real cluster in this
sandbox). Spawns a fresh JVM per parallelism level, reports throughput
at both and efficiency = (tp32/tp8)/4, and rewrites BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000

RUN_SNIPPET = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {root!r})
from logboost_spark.session import get_spark
from logboost_spark.fixtures.transcripts import gen_spark
from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.plans.pipeline import run_pipeline

cores = {cores}
rows = {rows}
spark = get_spark(app_name=f"scaling_{{cores}}", cores=cores)
cache = os.path.join({root!r}, "data", f"bench_transcripts_{{rows}}")
if not os.path.exists(os.path.join(cache, "_SUCCESS")):
    gen_spark(spark, rows).repartition(64).write.mode("overwrite").parquet(cache)
transcripts = spark.read.parquet(cache)
lookups = build_lookup_dfs(spark)
out = f"/tmp/scaling_sinks_{{cores}}"
shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
run_pipeline(spark, transcripts, lookups, out, n_groups=4,
             use_whois=False, use_idb=False)
wall = time.time() - t0
print("RESULT " + json.dumps({{"cores": cores, "wall": wall, "rows": rows}}))
"""


def run(cores: int) -> dict:
    code = RUN_SNIPPET.format(root=ROOT, cores=cores, rows=ROWS)
    t0 = time.time()
    p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    sys.stderr.write(p.stdout[-3000:] + "\n" + p.stderr[-5000:])
    raise SystemExit(f"run at cores={cores} failed after {time.time()-t0:.0f}s")


def main():
    r8 = run(8)
    r32 = run(32)
    tp8 = ROWS / r8["wall"]
    tp32 = ROWS / r32["wall"]
    eff = (tp32 / tp8) / 4
    result = {
        "rows": ROWS,
        "wall_8": round(r8["wall"], 2),
        "wall_32": round(r32["wall"], 2),
        "turns_per_sec_8": int(tp8),
        "turns_per_sec_32": int(tp32),
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(result))
    md = f"""## Measured scaling (this repo, sandbox stand-in for N vs 4N executors)

Same job (full parse → enrich → route → per-sink write pipeline), same
input ({ROWS:,} generated transcript turns, parquet), fresh JVM per run:

| parallelism | wall (s) | throughput (turns/s) |
|---|---|---|
| local[8]  (N)  | {r8['wall']:.1f} | {int(tp8):,} |
| local[32] (4N) | {r32['wall']:.1f} | {int(tp32):,} |

**Scaling efficiency (throughput₃₂/throughput₈)/4 = {eff:.3f}** (target ≥ 0.8).
"""
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(md)
    print("wrote", path)


if __name__ == "__main__":
    main()
