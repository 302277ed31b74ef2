"""Structured Streaming face (plans/streaming.py): availableNow drain
must equal the batch pipeline exactly; the windowed agg must bucket by
event time. Kept at sf0.001 — streaming adds per-micro-batch overhead,
not per-row semantics."""

import os
import tempfile

from pyspark.sql import functions as F

from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.fixtures.transcripts import fixture_path
from logboost_spark.operators.enrich import enrich
from logboost_spark.plans.route import route_stage
from logboost_spark.plans.streaming import stream_pipeline, stream_windowed_counts


def test_stream_drain_equals_batch(spark):
    src = fixture_path("sf0.001")
    out = tempfile.mkdtemp(prefix="lb_stream_test_")
    lookups = build_lookup_dfs(spark)
    stream_pipeline(spark, src, lookups, out, do_parse=False)
    got = {
        r.sink: r.cnt
        for r in spark.read.parquet(os.path.join(out, "data"))
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    batch = route_stage(
        enrich(
            spark.read.parquet(src), lookups, use_whois=False, use_idb=False
        )
    )
    want = {
        r.sink: r.cnt
        for r in batch.groupBy("sink").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want
    # checkpointed exactly-once: a second availableNow drain of the SAME
    # input adds nothing (file-level WAL replays no committed file)
    stream_pipeline(spark, src, lookups, out, do_parse=False)
    again = spark.read.parquet(os.path.join(out, "data")).count()
    assert again == sum(want.values())


def test_stream_windowed_counts(spark, tmp_path):
    """Production shape: enrich ONCE via the foreachBatch drain, then a
    second lightweight stream over the routed output feeds the
    watermarked window agg (its plan is just scan→window→agg — the
    heavy extraction trees never enter a streaming plan)."""
    src = fixture_path("sf0.001")
    lookups = build_lookup_dfs(spark)
    out = str(tmp_path / "routed")
    stream_pipeline(spark, src, lookups, out, do_parse=False)
    routed = (
        spark.readStream.schema("conv_id string, turn_idx int, ts timestamp")
        .option("recursiveFileLookup", "true")
        .parquet(os.path.join(out, "data"))
        .withColumn(
            "sink",
            F.regexp_extract(F.input_file_name(), r"sink=([^/]+)/", 1),
        )
    )
    win = stream_windowed_counts(routed, window="1 hour", watermark="2 hours")
    q = (
        win.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM wincounts").collect()
    assert rows
    # equivalence to the batch tumbling-window aggregate
    batch = route_stage(
        enrich(spark.read.parquet(src), lookups, use_whois=False, use_idb=False)
    )
    want = {
        (r.window_start, r.sink): r.rows
        for r in batch.groupBy(F.window("ts", "1 hour").alias("w"), "sink")
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(F.col("w.start").alias("window_start"), "sink", "rows")
        .collect()
    }
    got = {(r.window_start, r.sink): r.rows for r in rows}
    assert got == want
    # every window spans exactly one hour
    assert all((r.window_end - r.window_start).total_seconds() == 3600 for r in rows)


def test_cli_stream_mode(spark, tmp_path, capsys):
    """--stream drains the parquet input via Structured Streaming and
    reports per-sink counts equal to the batch CLI run."""
    import json as J

    import main as M

    src = fixture_path("sf0.001")
    out_s = str(tmp_path / "stream_sinks")
    rc = M.main([
        "--input", src, "--output", out_s, "--stream",
        "--no-whois", "--no-idb", "--no-parse",
    ])
    assert rc == 0
    res = J.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["streamed"] is True
    out_b = str(tmp_path / "batch_sinks")
    rc = M.main([
        "--input", src, "--output", out_b,
        "--no-whois", "--no-idb", "--no-parse", "--groups", "2",
    ])
    assert rc == 0
    batch = J.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["sink_counts"] == {
        k: v for k, v in batch["sink_counts"].items() if v
    } or res["sink_counts"] == batch["sink_counts"]
    # --stream rejects logs-mode input
    assert M.main([
        "--input", src, "--output", out_s, "--stream",
        "--input-format", "logs",
    ]) == 2
