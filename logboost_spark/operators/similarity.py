"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set, one pass over the corpus, per-query top-k via window — the
corpus side never shuffles except the final k-row-per-query sort, and
AQE coalesces that. The scale path is banded random-hyperplane LSH:
the signature's sign bits are grouped into ``bands`` keys; corpus and
queries hash once, candidates share ANY band (an OR over bands — the
standard recall amplification: P(candidate) = 1-(1-p^r)^L for bit-match
probability p = 1-θ/π). Exact cosine then ranks candidates only.

Dot products use native ``zip_with`` + ``aggregate`` — JVM codegen, no
Python. An IVF variant would k-means the corpus first; with no BLAS in
this container the hyperplane-LSH route is the honest scalable option.

Recall on the driver fixture is measured and asserted in
tests/test_similarity.py (random 64-dim data is the adversarial case —
LSH selectivity grows with the similarity of true neighbors, so
production near-dup regimes bucket far more tightly than the fixture).
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


def infer_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimensionality from the first row (driver-side peek of
    ONE row — schema-level metadata, not a data scan)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row.d is None or row.d <= 0:
        raise ValueError(f"cannot infer embedding dim from column {vec_col!r}")
    return int(row.d)


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


def plane_dot(vec: Column, plane: list[float]) -> Column:
    """vec · constant plane as an explicit left-fold (deterministic
    IEEE-754 order — the DuckDB oracle reproduces it term by term)."""
    return F.aggregate(
        F.zip_with(vec, F.array(*[F.lit(float(x)) for x in plane]), lambda a, b: a * b),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


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


def hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH signature: bit i = (vec · plane_i) > 0."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        sig = sig + F.when(plane_dot(vec, p) > 0, F.lit(2 ** i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return sig


def banded_signature_buckets(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_planes: int,
    bands: int,
    dim: int,
    seed: int = 42,
    out_id: str | None = None,
) -> DataFrame:
    """(id, band, bkey) rows: one bucket row per band, single explode
    pass over the input (the fact side is touched once)."""
    planes = deterministic_planes(n_planes, dim, seed)
    r = n_planes // bands
    band_structs = []
    for b in range(bands):
        key = F.lit(0).cast("bigint")
        for j in range(r):
            key = key + F.when(
                plane_dot(F.col(vec_col), planes[b * r + j]) > 0,
                F.lit(2 ** j).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        band_structs.append(
            F.struct(F.lit(b).alias("band"), key.alias("bkey"))
        )
    out = out_id or id_col
    return df.select(
        F.col(id_col).alias(out), F.explode(F.array(*band_structs)).alias("_bb")
    ).select(out, F.col("_bb.band").alias("band"), F.col("_bb.bkey").alias("bkey"))


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    bands: int = 6,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share ANY of the query's LSH bands.

    Band-OR amplification replaces the single-bucket equality of a naive
    signature join (whose recall collapses as n_planes grows). Recall <1
    by design; at 100 TB the banded bucket join replaces the full
    crossJoin scan (corpus shuffles once on its band keys).
    """
    dim = dim or infer_dim(corpus, vec_col)
    cb = banded_signature_buckets(
        corpus.select(F.col(id_col), F.col(vec_col)),
        vec_col, id_col, n_planes, bands, dim, out_id="neighbor_id",
    )
    qb = banded_signature_buckets(
        queries.select(F.col(id_col), F.col(vec_col)),
        vec_col, id_col, n_planes, bands, dim, out_id="query_id",
    )
    cand = (
        cb.join(F.broadcast(qb), ["band", "bkey"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = cand.join(c, "neighbor_id").join(F.broadcast(q), "query_id").withColumn(
        "cos", cosine(F.col("_qv"), F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"))
    )
