"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set, one pass over the corpus, per-query top-k via window — the
corpus side never shuffles except the final k-row-per-query sort, and
AQE coalesces that. The scale path is LSH bucketing (random-hyperplane
signs): corpus and queries hash to buckets, candidates come from the
query's bucket (± multi-probe), turning O(n·q) into O(n/2^bits · q).

Dot products use native ``zip_with`` + ``aggregate`` — JVM codegen, no
Python. An IVF variant would k-means the corpus first; with no BLAS in
this container the hyperplane-LSH route is the honest scalable option.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries must be broadcast-small (it is the dimension side). Output:
    (query_id, neighbor_id, cos) with ties broken by neighbor_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"))
    )


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH signature: bit i = (vec · plane_i) > 0."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a * b),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(d > 0, F.lit(2 ** i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return sig


def deterministic_planes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Seeded pseudo-random hyperplanes (LCG — no numpy state needed)."""
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (2 ** 63)
            row.append((state / 2 ** 63) * 2.0 - 1.0)
        planes.append(row)
    return planes


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    Recall < 1 by design; at 100 TB the bucket join replaces the full
    crossJoin scan (corpus shuffles once on its bucket key).
    """
    planes = deterministic_planes(n_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        hyperplane_signature(F.col(vec_col), planes).alias("_b"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        hyperplane_signature(F.col(vec_col), planes).alias("_b"),
    )
    scored = (
        c.join(F.broadcast(q), "_b")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"))
    )
