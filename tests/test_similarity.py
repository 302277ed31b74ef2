"""ANN: brute-force exactness vs a numpy oracle; LSH recall sanity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from logboost_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_lsh


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 16)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    return vecs, spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _numpy_topk(vecs, qids, k):
    out = {}
    norms = np.linalg.norm(vecs, axis=1)
    for q in qids:
        cos = vecs @ vecs[q] / (norms * norms[q])
        order = sorted(range(len(vecs)), key=lambda i: (-cos[i], i))
        out[q] = [i for i in order if i != q][:k]
    return out


def test_bruteforce_matches_numpy(spark, emb):
    vecs, df = emb
    q = df.filter(F.col("vec_id") < 3)
    got = cosine_topk_bruteforce(df, q, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, -r.cos, r.neighbor_id)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    want = _numpy_topk(vecs, [0, 1, 2], 5)
    assert by_q == want


def test_lsh_subset_and_recall(spark, emb):
    vecs, df = emb
    q = df.filter(F.col("vec_id") < 3)
    exact = cosine_topk_bruteforce(df, q, k=5).collect()
    approx = cosine_topk_lsh(df, q, k=5, n_planes=4, dim=16).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    # approximate: every returned pair must be a true vector pair with a
    # correct cosine; recall is partial by design
    assert len(approx_set) > 0
    for r in approx:
        c = float(vecs[r.query_id] @ vecs[r.neighbor_id] / (np.linalg.norm(vecs[r.query_id]) * np.linalg.norm(vecs[r.neighbor_id])))
        assert abs(c - r.cos) < 1e-4
    # nearest neighbors cluster in the same bucket reasonably often
    assert len(exact_set & approx_set) >= 1
