"""End-to-end pipeline: per-sink counts vs oracle, stable ordering,
resume-from-checkpoint semantics."""

import glob
import json
import os
import shutil

from logboost_spark import oracle as O
from logboost_spark.fixtures import transcripts as TR
from logboost_spark.plans.checkpoint import committed_groups, read_sinks, sink_counts
from logboost_spark.plans.pipeline import run_pipeline


def _oracle_sink_counts(pdf):
    counts = {}
    for r in pdf.itertuples():
        e = O.enrich_text(r.text)
        s = O.route_category({**e, "role": r.role, "tool": r.tool})
        counts[s] = counts.get(s, 0) + 1
    return counts


def test_pipeline_counts_and_resume(spark, lookups, tmp_path):
    out = str(tmp_path / "sinks")
    pdf = TR.gen_pandas(3000)
    sdf = spark.createDataFrame(pdf)

    manifests = run_pipeline(
        spark, sdf, lookups, out, n_groups=4, partitions_per_group=4,
        use_whois=False, use_idb=False,
    )
    assert len(manifests) == 4
    got = sink_counts(spark, out)
    want = _oracle_sink_counts(pdf)
    assert {k: v for k, v in got.items() if v} == want

    # routed-row sets: every turn lands in exactly one sink, none lost
    allrows = read_sinks(spark, out)
    assert allrows.count() == 3000
    assert allrows.select("conv_id", "turn_idx").distinct().count() == 3000

    # --- stable (conv_id, turn_idx) order within every output file -------
    files = glob.glob(os.path.join(out, "data", "group=*", "sink=*", "*.parquet"))
    assert files
    import pandas as pd

    for f in files[:20]:
        part = pd.read_parquet(f, columns=["conv_id", "turn_idx"])
        key = list(zip(part["conv_id"], part["turn_idx"]))
        assert key == sorted(key), f

    # --- resume: nuke 2 groups' commits, rerun, content identical --------
    for g in [1, 3]:
        os.remove(os.path.join(out, "_manifest", f"group-{g:04d}.json"))
        shutil.rmtree(os.path.join(out, "data", f"group={g}"))
    assert committed_groups(out) == {0, 2}
    before = {
        g: os.path.getmtime(os.path.join(out, "_manifest", f"group-{g:04d}.json"))
        for g in [0, 2]
    }
    redo = run_pipeline(
        spark, sdf, lookups, out, n_groups=4, partitions_per_group=4, resume=True,
        use_whois=False, use_idb=False,
    )
    assert sorted(m["group"] for m in redo) == [1, 3]  # committed groups skipped
    for g, mt in before.items():
        assert os.path.getmtime(os.path.join(out, "_manifest", f"group-{g:04d}.json")) == mt
    assert sink_counts(spark, out) == got  # identical final counts
    assert read_sinks(spark, out).count() == 3000


def test_manifest_metrics(spark, lookups, tmp_path):
    out = str(tmp_path / "m")
    sdf = spark.createDataFrame(TR.gen_pandas(500))
    manifests = run_pipeline(
        spark, sdf, lookups, out, n_groups=2, partitions_per_group=2,
        use_whois=False, use_idb=False,
    )
    total = sum(m["rows"] for m in manifests)
    assert total == 500
    for m in manifests:
        assert m["rows"] == sum(m[f"rows_{s}"] for s in ["threat", "internal", "noip", "tool_activity", "general"])
        assert "wall_sec" in m
        with open(os.path.join(out, "_manifest", f"group-{m['group']:04d}.json")) as f:
            assert json.load(f)["rows"] == m["rows"]


def test_resume_refuses_changed_group_count(spark, tmp_path):
    """Manifests record n_groups; resuming under different bucketing
    must refuse, not silently skip/double-write conversations."""
    import pytest
    from logboost_spark.fixtures.lookups import build_lookup_dfs
    from logboost_spark.fixtures.transcripts import gen_spark
    from logboost_spark.plans.pipeline import run_pipeline

    out = str(tmp_path / "sinks")
    df = gen_spark(spark, 400)
    lookups = build_lookup_dfs(spark)
    run_pipeline(spark, df, lookups, out, n_groups=2, use_whois=False, use_idb=False)
    with pytest.raises(ValueError, match="n_groups"):
        run_pipeline(
            spark, df, lookups, out, n_groups=4, resume=True,
            use_whois=False, use_idb=False,
        )
    # same count resumes cleanly as a no-op
    m = run_pipeline(
        spark, df, lookups, out, n_groups=2, resume=True,
        use_whois=False, use_idb=False,
    )
    assert m == []


def test_group_partitioned_source_parity(spark, lookups, tmp_path):
    """The production path: a source laid out bucket-partitioned by commit
    group (Iceberg bucket(conv_id); a parquet partition column locally)
    with group_col_name= must produce byte-identical routed rows to the
    on-the-fly pmod(xxhash64(conv_id)) fallback, with the group filter
    arriving at the scan as a PartitionFilter (pruning, not a data scan)."""
    from pyspark.sql import functions as F

    pdf = TR.gen_pandas(2000)
    sdf = spark.createDataFrame(pdf)
    src = str(tmp_path / "src")
    (
        sdf.withColumn("cgroup", F.pmod(F.xxhash64("conv_id"), F.lit(3)))
        .repartition(4)
        .write.partitionBy("cgroup")
        .parquet(src)
    )
    part = spark.read.parquet(src)

    # pruning reaches the scan
    plan = (
        part.filter(F.col("cgroup").cast("bigint") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [(cgroup" in plan

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    run_pipeline(
        spark, part, lookups, out_a, n_groups=3, group_col_name="cgroup",
        use_whois=False, use_idb=False,
    )
    run_pipeline(
        spark, sdf, lookups, out_b, n_groups=3,
        use_whois=False, use_idb=False,
    )
    assert sink_counts(spark, out_a) == sink_counts(spark, out_b)

    def canon(out):
        return read_sinks(spark, out).drop("group").withColumn(
            "fields",
            F.to_json(F.map_from_entries(F.array_sort(F.map_entries("fields")))),
        )

    a, b = canon(out_a), canon(out_b)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_group_col_modulus_mismatch_refused(spark, lookups, tmp_path):
    """A source partitioned with MORE groups than the run (pmod(...,8)
    column but n_groups=4) must raise before any group job — otherwise
    rows with group >= n_groups match no filter and silently vanish from
    every sink while manifests still commit."""
    import pytest
    from pyspark.sql import functions as F

    pdf = TR.gen_pandas(500)
    sdf = spark.createDataFrame(pdf)
    src = str(tmp_path / "src8")
    (
        sdf.withColumn("cgroup", F.pmod(F.xxhash64("conv_id"), F.lit(8)))
        .write.partitionBy("cgroup")
        .parquet(src)
    )
    part = spark.read.parquet(src)
    out = str(tmp_path / "out")
    with pytest.raises(ValueError, match="outside this run's n_groups=4"):
        run_pipeline(
            spark, part, lookups, out, n_groups=4, group_col_name="cgroup",
            use_whois=False, use_idb=False,
        )
    # nothing was committed
    assert committed_groups(out) == set()
    # matching modulus passes the validation and runs clean
    m = run_pipeline(
        spark, part, lookups, out, n_groups=8, group_col_name="cgroup",
        use_whois=False, use_idb=False,
    )
    assert len(m) == 8
    assert read_sinks(spark, out).count() == 500


def test_group_pruning_reaches_scan_without_barrier(spark, lookups, tmp_path):
    """With enrich's extraction barrier disabled, the per-group commit
    filter pushes all the way below enrich+parse+route to the parquet
    scan as a PartitionFilter — real scan-level pruning, not just a
    post-scan filter (with the default barrier the input is instead
    touched once via the localCheckpoint cache; see write_routed doc)."""
    from pyspark.sql import functions as F

    from logboost_spark.operators.enrich import enrich
    from logboost_spark.parsers.formats import parse_stage
    from logboost_spark.plans.route import route_stage

    pdf = TR.gen_pandas(600)
    sdf = spark.createDataFrame(pdf)
    src = str(tmp_path / "srcp")
    (
        sdf.withColumn("cgroup", F.pmod(F.xxhash64("conv_id"), F.lit(3)))
        .write.partitionBy("cgroup")
        .parquet(src)
    )
    part = spark.read.parquet(src)
    routed = route_stage(
        parse_stage(enrich(part, lookups, barrier=False, use_whois=False, use_idb=False))
    )
    plan = (
        routed.filter(F.col("cgroup").cast("bigint") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [(cgroup" in plan, plan[:4000]


def test_concurrent_groups_no_cross_row_bleed(spark, lookups, tmp_path):
    """r07 regression guard: overlapping commit-group jobs must not share
    driver-side expression trees — shared trees produced cross-row value
    bleed (lb_IP from another row) at ~1 row/2k per run. The extracted
    lb_IP must always be a substring of the row's own text (or NoIP).
    Probabilistic detector (the race fired in ~1/3 of runs pre-fix), so
    several runs are checked; any hit is a hard failure."""
    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(TR.gen_pandas(2000))
    for trial in range(4):
        out = str(tmp_path / f"bleed{trial}")
        run_pipeline(
            spark, sdf, lookups, out, n_groups=3,
            use_whois=False, use_idb=False,
        )
        bad = (
            read_sinks(spark, out)
            .filter(
                (F.col("lb_class") != "noip")
                & ~F.col("text").contains(F.col("lb_IP"))
            )
            .count()
        )
        assert bad == 0, f"trial {trial}: {bad} rows carry another row's lb_IP"
