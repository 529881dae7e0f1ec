"""Similarity-search tests: brute-force exactness vs a numpy reference,
LSH recall sanity, bucket determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

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


# --------------------------------------------- SRP candidates (round 2)
def test_srp_candidates_recall_on_near_dups(spark):
    """Construct true near-duplicates (cosine >= 0.999): the SRP
    candidate path must surface every one, and the candidate-fed
    embedding_near_dup must agree with brute force on them."""
    from cmem_plugin_pyshacl_spark.operators.dedup import embedding_near_dup
    from cmem_plugin_pyshacl_spark.operators.similarity import srp_candidate_pairs

    rng = np.random.RandomState(11)
    base = rng.randn(30, DIM)
    rows = []
    for i in range(30):
        rows.append((i, [float(x) for x in base[i]]))
        # near-dup copy: id 100+i, tiny perturbation
        rows.append((100 + i, [float(x) for x in base[i] + 1e-4 * rng.randn(DIM)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cand = srp_candidate_pairs(emb, dim=DIM, n_planes=6, n_bands=2, seed=42)
    found = embedding_near_dup(emb, threshold=0.99, candidate_pairs=cand)
    got = {(r.a_id, r.b_id) for r in found.collect()}
    expected = {(i, 100 + i) for i in range(30)}
    assert expected <= got

    brute = embedding_near_dup(emb, threshold=0.99)
    assert {(r.a_id, r.b_id) for r in brute.collect()} >= got


def test_srp_candidates_no_crossjoin(spark):
    from cmem_plugin_pyshacl_spark.operators.dedup import embedding_near_dup
    from cmem_plugin_pyshacl_spark.operators.similarity import srp_candidate_pairs

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(DIM)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cand = srp_candidate_pairs(emb, dim=DIM, n_planes=4, n_bands=1)
    out = embedding_near_dup(emb, threshold=0.5, candidate_pairs=cand)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_ivf_topk_recall_on_clustered_data(spark):
    """Cluster-structured corpus: IVF probing must recover the brute-force
    neighbors (which are in-cluster) with high recall."""
    from cmem_plugin_pyshacl_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(5)
    centers = rng.randn(8, DIM) * 10
    rows = []
    vid = 0
    for ci in range(8):
        for _ in range(25):
            rows.append((vid, [float(x) for x in centers[ci] + rng.randn(DIM)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter(F.col("vec_id") % 25 == 0)  # one query per cluster

    exact = brute_force_topk(emb, qs, k=5)
    approx = ivf_topk(emb, qs, k=5, n_centroids=8, n_probe=2)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a & e) / len(e) >= 0.9


def test_ivf_topk_ranks_and_schema(spark, emb):
    from cmem_plugin_pyshacl_spark.operators.similarity import ivf_topk

    df, _ = emb
    out = ivf_topk(df, df.filter(F.col("vec_id") < 5), k=3, n_centroids=4, n_probe=4)
    rows = out.collect()
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
