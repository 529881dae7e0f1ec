"""Similarity-search tests: brute-force exactness vs a numpy reference,
LSH recall sanity, bucket determinism."""

from __future__ import annotations

import numpy as np
import pytest

from cmem_plugin_pyshacl_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

DIM = 16
N = 60


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(N, DIM)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), vecs


def test_brute_force_matches_numpy(spark, emb):
    df, vecs = emb
    q = df.filter(df.vec_id < 3)
    got = brute_force_topk(df, q, k=5)
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for qid in range(3):
        order = [
            int(j)
            for j in sorted(
                (j for j in range(N) if j != qid),
                key=lambda j: (-sims[qid, j], j),
            )[:5]
        ]
        mine = [
            r.neighbor_id
            for r in sorted(
                (r for r in got.collect() if r.query_id == qid),
                key=lambda r: r.rank,
            )
        ]
        assert mine == order
        top = next(r for r in got.collect() if r.query_id == qid and r.rank == 1)
        assert abs(top.cosine - sims[qid, order[0]]) < 1e-9


def test_lsh_topk_recall(spark, emb):
    df, _ = emb
    q = df.filter(df.vec_id < 5)
    exact = brute_force_topk(df, q, k=3)
    approx = lsh_topk(df, q, k=3, dim=DIM, n_planes=4)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # multi-probe with few planes on small data: recall should be decent
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5
    # ranks within a query are contiguous from 1
    by_q = {}
    for r in approx.collect():
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_lsh_deterministic(spark, emb):
    df, _ = emb
    q = df.filter(df.vec_id < 5)
    a = sorted(map(tuple, lsh_topk(df, q, k=3, dim=DIM, n_planes=4).collect()))
    b = sorted(map(tuple, lsh_topk(df, q, k=3, dim=DIM, n_planes=4).collect()))
    assert a == b
