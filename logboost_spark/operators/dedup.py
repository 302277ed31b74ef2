"""Deduplication operators for training-data pipelines.

Not in the reference (LogBoost never dedupes rows) — these are the
first-class large-scale additions: exact, MinHash+LSH, SimHash, n-gram
Jaccard, and embedding-cosine near-dup over a ``documents``-shaped table
(doc_id, text) / ``embeddings`` (vec_id, embedding array<float>).

Scale notes (100 TB):
* exact_dedup — one shuffle on a 60-bit text hash; with AQE the skew of
  popular boilerplate dedups fine because the groupBy key *is* the hash.
* minhash_lsh_pairs — the scale path: per-doc signatures are computed
  map-side (explode tokens → groupBy doc), candidate generation shuffles
  on band keys only (b small buckets per doc, not O(n²)); the final
  verify joins only candidates.
* ngram_jaccard_pairs — exact but quadratic in bucket size; keep for
  verification at sampled scale, use LSH for the full corpus.
* All hashing goes through md5 (functions/hashing.py) so the DuckDB
  oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, md5_long, minhash_params


def tokens(col, distinct: bool = True):
    t = F.split(F.lower(F.trim(col)), r"\s+")
    return F.array_distinct(t) if distinct else t


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per identical text (hash-groupBy, one shuffle)."""
    h = md5_long(F.col(text_col))
    return (
        docs.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .drop("_h")
    )


def _token_hashes(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    ).withColumn("_hv", md5_long(F.col("_tok")))


def minhash_signatures(
    docs: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """k-permutation MinHash over the distinct-token set of each doc."""
    th = _token_hashes(docs, text_col, id_col)
    aggs = [
        F.min(F.pmod(F.lit(a) * F.pmod(F.col("_hv"), F.lit(MERSENNE_P)) + F.lit(b), F.lit(MERSENNE_P))).alias(f"mh{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return th.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band (rows of the
    signature matrix grouped b bands × r rows; banding → bucket join)."""
    r = k // bands
    sig = minhash_signatures(docs, k, text_col, id_col)
    band_rows = []
    for b in range(bands):
        key = F.concat_ws("_", *[F.col(f"mh{b * r + j}") for j in range(r)])
        band_rows.append(
            sig.select(F.col(id_col), F.lit(b).alias("band"), key.alias("bkey"))
        )
    from functools import reduce

    exploded = reduce(DataFrame.unionByName, band_rows)
    a = exploded.alias("a")
    bside = exploded.alias("b")
    return (
        a.join(
            bside,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: per-bit majority vote of token hashes."""
    th = _token_hashes(docs, text_col, id_col)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_hv"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_v{j}")
        for j in range(bits)
    ]
    agg = th.groupBy(id_col).agg(*votes)
    sh = None
    for j in range(bits):
        term = F.when(F.col(f"_v{j}") > 0, F.lit(2 ** j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sh = term if sh is None else sh + term
    return agg.select(F.col(id_col), sh.alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity join via inverted index.

    |A∩B| from the shingle-share counts, |A∪B| = |A|+|B|-|A∩B|. The
    shingle join is the shuffle; frequent shingles are the skew risk —
    production path caps document frequency (drop shingles appearing in
    > df_cap docs: they only ever confirm already-candidate pairs).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.get(toks, i + j) for j in range(n)]),
        )
    )
    sh = docs.select(
        F.col(id_col), F.explode(grams).alias("g"), F.size(grams).alias("n_g")
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_g").alias("na"),
            F.col("b.n_g").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute force; LSH variant in
    operators/similarity.py scales it)."""
    from .similarity import cosine

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 5).alias("cos"))
    )
