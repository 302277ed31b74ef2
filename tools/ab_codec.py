"""Interleaved A/B adjudication of the parquet SINK codec (snappy vs
zstd level 1) on the driver-bench pipeline shape (VERDICT r05 #1).

Round 5 adopted zstd-1 on builder-pinned screens, then the driver's
BENCH_r05 pipeline_e2e regressed +39% vs r4 — alongside ~25% regressions
on UNTOUCHED queries (the host-noise signature). This script settles it:

* fresh JVM per rep, taskset-pinned to the full core set (protocol
  parity with bench_scaling.py),
* variant order ROTATED between reps (a fixed A,B order biases the
  first slot under decaying neighbor noise — round-5 lesson),
* sinks on the same real-disk /tmp path the driver bench uses (tmpfs
  would underweight output-byte savings),
* per JVM: one cold run (JIT warm-up included, the driver's rep-1
  shape) and one warm run (steady state); medians of both reported.

Usage: python tools/ab_codec.py [reps] [rows ...]   (default 5 reps,
sizes 2000000 16000000). Writes BENCH/ab_codec.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SIZES = [int(a) for a in sys.argv[2:]] or [2_000_000, 16_000_000]
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 32)))  # ADVICE r06: no hardcoded core count

VARIANTS = {
    "snappy": {"spark.sql.parquet.compression.codec": "snappy"},
    # empty override = session._DEFAULTS (currently zstd level 1)
    "zstd1": {},
}
if os.environ.get("AB_VARIANTS") == "offheap":
    # second use (VERDICT r05 #5 follow-up): confirm the profiler's
    # off-heap win under the interleaved protocol before adopting it
    VARIANTS = {
        "baseline": {},
        "offheap16g": {
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": str(16 * 1024**3),
        },
    }

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {root!r})
from logboost_spark.session import get_spark
from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.plans.pipeline import run_pipeline

conf = json.loads({conf!r})
spark = get_spark(app_name="ab_codec", cores={cores}, extra_conf=conf)
if {codec!r}:
    assert spark.conf.get("spark.sql.parquet.compression.codec") == {codec!r}
transcripts = spark.read.parquet({cache!r})
lookups = build_lookup_dfs(spark)
out = "/tmp/ab_codec_sinks"
walls = []
sink_bytes = 0
for i in range(2):
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    run_pipeline(spark, transcripts, lookups, out, n_groups=4,
                 group_col_name="cgroup", use_whois=False, use_idb=False)
    walls.append(round(time.time() - t0, 3))
    if i == 1:
        for dp, _, fs in os.walk(out):
            sink_bytes += sum(os.path.getsize(os.path.join(dp, f)) for f in fs)
shutil.rmtree(out, ignore_errors=True)
print("RESULT " + json.dumps({{"cold": walls[0], "warm": walls[1],
                               "sink_bytes": sink_bytes}}))
"""


def child(codec: str, cache: str) -> dict:
    conf = VARIANTS[codec]
    expect = ""
    if codec == "snappy":
        expect = "snappy"
    elif codec == "zstd1":
        expect = "zstd"
    code = CHILD.format(
        root=ROOT,
        conf=json.dumps(conf),
        cores=CORES,
        codec=expect,
        cache=cache,
    )
    cmd = ["taskset", "-c", f"0-{CORES - 1}", sys.executable, "-c", code]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:])
    raise SystemExit(f"child failed: codec={codec}")


def loadavg() -> float:
    return os.getloadavg()[0]


def main():
    results = {}
    for rows in SIZES:
        cache = os.path.join(ROOT, "data", f"bench_transcripts_{rows}_g4")
        if not os.path.exists(os.path.join(cache, "_SUCCESS")):
            # build via an untimed child (either codec; input is shared)
            print(f"building cache {cache} ...", flush=True)
            code = (
                "import sys; sys.path.insert(0, %r)\n"
                "from logboost_spark.session import get_spark\n"
                "from logboost_spark.fixtures.transcripts import gen_spark\n"
                "from pyspark.sql import functions as F\n"
                "spark = get_spark(cores=%d)\n"
                "(gen_spark(spark, %d)"
                ".withColumn('cgroup', F.pmod(F.xxhash64('conv_id'), F.lit(4)))"
                ".repartition(%d).write.partitionBy('cgroup')"  # CPUS*2, same layout as bench.py's cache builder
                ".mode('overwrite').parquet(%r))\n" % (ROOT, CORES, rows, CORES * 2, cache)
            )
            subprocess.run([sys.executable, "-c", code], check=True, timeout=3600)
        samples = {v: {"cold": [], "warm": [], "load_at": []} for v in VARIANTS}
        sink_bytes = {}
        for rep in range(REPS):
            order = list(VARIANTS) if rep % 2 == 0 else list(VARIANTS)[::-1]
            for v in order:
                la = loadavg()
                r = child(v, cache)
                samples[v]["cold"].append(r["cold"])
                samples[v]["warm"].append(r["warm"])
                samples[v]["load_at"].append(round(la, 2))
                sink_bytes[v] = r["sink_bytes"]
                print(
                    f"rows={rows} rep={rep} {v}: cold={r['cold']:.1f} "
                    f"warm={r['warm']:.1f} load_before={la:.1f}",
                    flush=True,
                )
        results[str(rows)] = {
            v: {
                "cold_median": statistics.median(s["cold"]),
                "warm_median": statistics.median(s["warm"]),
                "cold_runs": s["cold"],
                "warm_runs": s["warm"],
                "load_before": s["load_at"],
                "sink_bytes": sink_bytes[v],
            }
            for v, s in samples.items()
        }
        print(json.dumps({rows: results[str(rows)]}), flush=True)
    out = {
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "protocol": (
            f"fresh JVM per rep, taskset 0-{CORES-1}, rotated variant order, "
            "2 runs/JVM (cold+warm), real-disk /tmp sinks, "
            f"{REPS} reps per variant per size"
        ),
        "results": results,
    }
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    name = "ab_codec.json"
    if os.environ.get("AB_VARIANTS"):
        name = f"ab_{os.environ['AB_VARIANTS']}.json"
    with open(os.path.join(ROOT, "BENCH", name), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH/" + name)


if __name__ == "__main__":
    main()
