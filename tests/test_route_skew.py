"""Conversation-level skew: the salted write shuffle must spread a hot
conversation over many partitions (north_rule: "salted repartitioning to
defuse conversation-level skew") while keeping the required stable
(conv_id, turn_idx) order inside every partition."""

from pyspark.sql import functions as F

from logboost_spark.plans.route import salted_repartition


def _skewed_df(spark, hot_rows=60_000, cold_convs=40, cold_rows=1_000):
    hot = spark.range(hot_rows).select(
        F.lit("conv-hot").alias("conv_id"), F.col("id").cast("int").alias("turn_idx")
    )
    cold = spark.range(cold_convs * cold_rows).select(
        F.concat(F.lit("conv-"), (F.col("id") % cold_convs).cast("string")).alias("conv_id"),
        (F.col("id") / cold_convs).cast("int").alias("turn_idx"),
    )
    return hot.unionByName(cold)


def test_salted_repartition_defuses_hot_conversation(spark):
    df = _skewed_df(spark)
    # salt granularity must comfortably exceed the partition count:
    # with salt_buckets == n_parts the hot conversation occupies only
    # n_parts distinct (conv, salt) keys and balls-in-bins collisions
    # leave 2-3x lumps; 16x finer salt smooths them out
    n_parts, salt_buckets = 16, 256
    out = salted_repartition(df, n_parts, salt_buckets)

    sizes = {
        r.pid: r.cnt
        for r in out.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(sizes.values())
    assert total == 100_000
    # unsalted, one partition would hold all 60k hot rows (60% of data);
    # salted, no partition should exceed ~2x the ideal share
    assert max(sizes.values()) < 2 * total / n_parts, sizes

    hot_spread = (
        out.filter(F.col("conv_id") == "conv-hot")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert hot_spread >= n_parts // 2, f"hot conv on only {hot_spread} partitions"


def test_salted_repartition_preserves_order_within_partition(spark):
    out = salted_repartition(_skewed_df(spark, hot_rows=5_000, cold_convs=8, cold_rows=500), 8, 8)

    def check(it):
        prev = None
        for row in it:
            key = (row.conv_id, row.turn_idx)
            assert prev is None or key >= prev, (prev, key)
            prev = key
        yield {"ok": 1}

    n = out.rdd.mapPartitions(check).count()
    assert n == 8
