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


def test_group_capped_sample(spark):
    from logboost_spark.operators.sampling import group_capped_sample

    rows = [(i, "big") for i in range(1000)] + [(1000 + i, "small") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = group_capped_sample(df, "grp", "doc_id", cap=50).collect()
    by = {}
    for r in out:
        by.setdefault(r.grp, set()).add(r.doc_id)
    # under-cap group passes through WHOLE (no hash jitter)
    assert by["small"] == {1000 + i for i in range(20)}
    # over-cap group lands near the cap (binomial jitter ~ sqrt(cap))
    assert 25 <= len(by["big"]) <= 80, len(by["big"])
    # deterministic
    again = {r.doc_id for r in group_capped_sample(df, "grp", "doc_id", cap=50).collect()}
    assert again == {r.doc_id for r in out}


def test_token_repetition_vs_python_oracle(spark):
    from collections import Counter

    from logboost_spark.operators.quality import token_repetition

    rows = [
        (0, "spam spam spam spam ham"),
        (1, "all tokens here are unique"),
        (2, "  "),
        (3, "a"),
        (4, "x y x y x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in token_repetition(df).collect()}
    for i, text in rows:
        toks = text.strip().lower().split()
        c = Counter(toks)
        n = sum(c.values())
        r = got[i]
        assert r.n_tokens == n, (i, r)
        if n:
            assert abs(r.distinct_ratio - len(c) / n) < 1e-6
            assert abs(r.top_token_ratio - max(c.values()) / n) < 1e-6
        else:
            assert r.distinct_ratio == 0.0 and r.top_token_ratio == 0.0
    # the spam doc is flagged by both signals relative to the unique doc
    assert got[0].top_token_ratio > got[1].top_token_ratio
    assert got[0].distinct_ratio < got[1].distinct_ratio


def test_vocab_topk_plan_and_values(spark):
    from logboost_spark.operators.quality import vocab_topk

    rows = [(0, "a a a b b c"), (1, "b c d"), (2, "a e")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = vocab_topk(df, k=3)
    got = [(r.token, r.cnt) for r in out.collect()]
    assert got == [("a", 4), ("b", 3), ("c", 2)]
    # scale shape: per-partition k-heap merge, NOT a global sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_events_funnel_strict_ordering(spark):
    """Strict funnel: step k counts only users whose step-k event is AT
    OR AFTER their step-(k-1) min-time."""
    import datetime as dt

    from logboost_spark.entry_queries import events_funnel

    base = dt.datetime(2024, 1, 1)

    def t(m):
        return base + dt.timedelta(minutes=m)

    rows = [
        # u1: full ordered path
        (1, t(0), 1, "view", 0.0, "{}"),
        (2, t(1), 1, "click", 0.0, "{}"),
        (3, t(2), 1, "purchase", 0.0, "{}"),
        # u2: clicked BEFORE viewing, purchase after nothing -> stops at view
        (4, t(5), 2, "click", 0.0, "{}"),
        (5, t(6), 2, "view", 0.0, "{}"),
        # u3: view + purchase but no click -> stops at view
        (6, t(0), 3, "view", 0.0, "{}"),
        (7, t(9), 3, "purchase", 0.0, "{}"),
        # u4: never viewed -> not even step 1
        (8, t(0), 4, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r.step: r.users for r in events_funnel(spark, d).collect()}
    assert got == {1: 3, 2: 1, 3: 1}, got
