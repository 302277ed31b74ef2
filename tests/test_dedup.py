"""Dedup operator family: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from logboost_spark.operators.dedup import (
    embedding_near_dups,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat"),  # near dup of 0
    (3, "completely different content about spark engines and shuffles"),
    (4, "spark engines and shuffles are completely different content about"),  # same token set as 3
    (5, "unrelated text mentioning nothing similar whatsoever here today"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_exact_dedup(spark, docs):
    out = {r.doc_id: r.dup_count for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # doc 1 collapsed into doc 0
    assert 1 not in out
    assert out[3] == 1


def test_minhash_identical_token_sets(spark, docs):
    sigs = {r.doc_id: tuple(r[i] for i in range(1, 9)) for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[1]  # identical text
    assert sigs[3] == sigs[4]  # same token set, different order
    assert sigs[0] != sigs[5]


def test_minhash_lsh_pairs(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs and (3, 4) in pairs
    assert (0, 5) not in pairs and (3, 5) not in pairs


def test_simhash_similarity(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sh[0] == sh[1]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sh[0], sh[2]) < hamming(sh[0], sh[5])


def test_ngram_jaccard_exact_value(spark, docs):
    out = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert out[(0, 1)] == 1.0
    # 0 vs 2: 8 bigrams each, 7 shared → 7/9
    assert abs(out[(0, 2)] - 7 / 9) < 1e-6


def test_embedding_near_dups(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),  # ~parallel to 0
        (2, [0.0, 1.0, 0.0]),  # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in embedding_near_dups(emb, threshold=0.9).collect()}
    assert pairs == {(0, 1)}
