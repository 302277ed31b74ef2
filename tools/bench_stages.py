"""Stage-isolation measurement for the pipeline (guide §1.4 noop-sink).

Times each pipeline stage cumulatively with the noop sink so the
computation is measured, not the parquet write, then the real
write_routed. Also reports shuffle bytes per timed query via the UI
REST API (enabled here only; bench.py itself keeps the UI off).

Usage: python tools/bench_stages.py [rows] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
N_GROUPS = 4


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4040/api/v1/{path}") as r:
        return json.load(r)


def shuffle_totals():
    """Sum shuffle read/write bytes over all completed stages so far."""
    app = _rest("applications")[0]["id"]
    rd = wr = 0
    for s in _rest(f"applications/{app}/stages?status=complete"):
        rd += s.get("shuffleReadBytes", 0)
        wr += s.get("shuffleWriteBytes", 0)
    return rd, wr


def timed(spark, label, fn, reps=REPS):
    walls, deltas = [], []
    for _ in range(reps):
        r0, w0 = shuffle_totals()
        spark.sparkContext.setJobDescription(label)
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 2))
        r1, w1 = shuffle_totals()
        deltas.append((r1 - r0, w1 - w0))
    print(
        f"{label:38s} walls={walls} shuffleMB(r,w)="
        f"{[tuple(round(x / 1e6, 1) for x in d) for d in deltas]}",
        flush=True,
    )
    return walls


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from logboost_spark.session import get_spark
    from logboost_spark.fixtures.lookups import build_lookup_dfs
    from logboost_spark.functions.ip import ip_extract_stage
    from logboost_spark.operators.enrich import enrich
    from logboost_spark.parsers.formats import parse_stage
    from logboost_spark.plans.route import route_stage, salted_repartition
    from logboost_spark.plans.pipeline import run_pipeline
    import shutil

    spark = get_spark(
        app_name="bench_stages", cores=CPUS, extra_conf={"spark.ui.enabled": "true"}
    )
    cache = os.path.join(ROOT, "data", f"bench_transcripts_{ROWS}_g{N_GROUPS}")
    tr = spark.read.parquet(cache)
    lookups = build_lookup_dfs(spark)

    timed(spark, "scan only", lambda: noop(tr))
    ext = ip_extract_stage(tr)
    timed(spark, "scan+extract", lambda: noop(ext))
    enr = enrich(tr, lookups, use_whois=False, use_idb=False, barrier=False)
    timed(spark, "scan+enrich(no barrier)", lambda: noop(enr))
    par = parse_stage(enr)
    timed(spark, "scan+enrich+parse", lambda: noop(par))
    routed = route_stage(par)
    timed(spark, "scan+enrich+parse+route", lambda: noop(routed))
    shuf = salted_repartition(
        routed, None, 64, sort_cols=("sink", "conv_id", "turn_idx")
    )
    timed(spark, "...+salted shuffle+sort", lambda: noop(shuf))

    # parse-only (how much of enrich+parse is parse?)
    par_only = parse_stage(tr)
    timed(spark, "scan+parse only", lambda: noop(par_only))

    out = "/tmp/lb_stage_sinks"

    def full():
        shutil.rmtree(out, ignore_errors=True)
        run_pipeline(
            spark, tr, lookups, out, n_groups=N_GROUPS, group_col_name="cgroup",
            use_whois=False, use_idb=False,
        )

    timed(spark, "run_pipeline (real writes)", full)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
