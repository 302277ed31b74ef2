"""Deterministic sampling / splitting / dedup application."""

from pyspark.sql import functions as F

from logboost_spark.operators.sampling import apply_dedup, hash_sample, split_assign


def _docs(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_hash_sample_deterministic_and_near_rate(spark):
    d = _docs(spark)
    a = {r.doc_id for r in hash_sample(d, "doc_id", 10.0).collect()}
    b = {r.doc_id for r in hash_sample(d, "doc_id", 10.0).collect()}
    assert a == b                                   # same keys every run
    assert 0.07 <= len(a) / 2000 <= 0.13            # near the nominal rate
    # repartitioning must not change membership (per-partition RNG would)
    c = {r.doc_id for r in hash_sample(d.repartition(13), "doc_id", 10.0).collect()}
    assert c == a
    # a different salt draws an (almost surely) different sample
    s2 = {r.doc_id for r in hash_sample(d, "doc_id", 10.0, salt="other").collect()}
    assert s2 != a
    # rate monotonicity: the 10% sample nests inside the 20% sample
    big = {r.doc_id for r in hash_sample(d, "doc_id", 20.0).collect()}
    assert a <= big


def test_split_assign_partitions_exactly(spark):
    d = _docs(spark)
    out = split_assign(d, "doc_id").collect()
    assert len(out) == 2000                          # every row assigned
    counts = {}
    for r in out:
        assert r.split in {"train", "val", "test"}
        counts[r.split] = counts.get(r.split, 0) + 1
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert 0.95 <= counts["train"] / 2000 <= 0.995
    # deterministic: same assignment on rerun
    again = {(r.doc_id, r.split) for r in split_assign(d, "doc_id").collect()}
    assert again == {(r.doc_id, r.split) for r in out}


def test_apply_dedup_drops_only_nonkeep(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id bigint, text string"
    )
    clusters = spark.createDataFrame(
        [(1, 1, True), (3, 1, False), (7, 1, False), (5, 5, True)],
        "doc_id bigint, cluster bigint, keep boolean",
    )
    kept = sorted(r.doc_id for r in apply_dedup(docs, clusters).collect())
    # 3 and 7 dropped; cluster canonicals (1, 5) and unclustered docs kept
    assert kept == [0, 1, 2, 4, 5, 6, 8, 9]
    # plan: broadcast anti join, no shuffle of the corpus
    plan = apply_dedup(docs, clusters)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
