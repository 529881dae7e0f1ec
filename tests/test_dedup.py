"""Dedup-family unit tests over tiny synthetic documents with known
expected pairs/groups."""

from __future__ import annotations

import pytest

from cmem_plugin_pyshacl_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dup,
    exact_duplicates,
    minhash_duplicates,
    ngram_jaccard_pairs,
    simhash_duplicates,
    simhash_fingerprints,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river"),
        (1, "the quick brown fox jumps over the lazy dog near the river"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near a river"),    # near dup of 0
        (3, "completely different text about spark dataframes and shuffles"),
        (4, "zzz qqq xxx vvv kkk unrelated tokens entirely here now ok"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(spark, docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [0, 1]
    assert groups[0].dup_count == 2


def test_dedup_exact_keeps_min(spark, docs):
    kept = {r.doc_id for r in dedup_exact(docs).collect()}
    assert kept == {0, 2, 3, 4}


def test_simhash_hot_bucket_capped_and_surfaced(spark):
    """Round-4 VERDICT finding 2: a hot 15-bit chunk bucket must be CAPPED
    before pair explosion (no O(width^2) blowup) and the dropped bucket
    surfaced as a metric frame. 60 identical docs -> every chunk bucket has
    width 60; with max_bucket=10 the capped run emits ZERO pairs and
    reports 4 dropped buckets of width 60, while the uncapped run emits
    C(60,2)=1770 pairs."""
    rows = [(i, "same exact text repeated in every single document") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs, dropped = simhash_duplicates(
        docs, max_bucket=10, return_dropped=True
    )
    assert pairs.count() == 0
    drop_rows = dropped.collect()
    assert len(drop_rows) == 4  # one hot bucket per chunk_id
    assert all(r.width == 60 for r in drop_rows)
    assert {r.chunk_id for r in drop_rows} == {0, 1, 2, 3}

    # uncapped baseline: the full quadratic pair set
    assert simhash_duplicates(docs, max_bucket=100).count() == 60 * 59 // 2


def test_minhash_finds_near_dup(spark, docs):
    pairs = {(r.a_id, r.b_id) for r in
             minhash_duplicates(docs, threshold=0.6).collect()}
    assert (0, 1) in pairs  # exact dup always survives
    assert (0, 2) in pairs and (1, 2) in pairs  # near dup
    assert all(3 not in p and 4 not in p for p in pairs)


def test_simhash_identical_fingerprints(spark, docs):
    fps = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[3]
    pairs = {(r.a_id, r.b_id): r.hamming
             for r in simhash_duplicates(docs, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # near dup within hamming 10


def test_ngram_jaccard(spark, docs):
    pairs = {(r.a_id, r.b_id): r.jaccard
             for r in ngram_jaccard_pairs(docs, k=5, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.6 < pairs[(0, 2)] < 1.0


def test_embedding_near_dup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r.a_id, r.b_id) for r in
             embedding_near_dup(emb, threshold=0.95).collect()}
    assert pairs == {(0, 1)}


def test_near_dup_clusters_transitive(spark):
    """A≈B and B≈C chain into ONE cluster even though (A, C) was never a
    pair; cluster_id = min doc_id."""
    from cmem_plugin_pyshacl_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "a_id long, b_id long"
    )
    got = {(r.doc_id, r.cluster_id) for r in near_dup_clusters(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (9, 7)}


def test_dedup_near_keeps_one_per_cluster(spark, docs):
    """Docs 0/1/2 are one near-dup cluster (exact + near); minhash-based
    cluster dedup keeps doc 0 plus the two unrelated docs."""
    from cmem_plugin_pyshacl_spark.operators.dedup import dedup_near

    kept = sorted(
        r.doc_id for r in dedup_near(docs, threshold=0.5).collect()
    )
    assert kept == [0, 3, 4]
    # simhash path agrees on this corpus
    kept_sim = sorted(
        r.doc_id
        for r in dedup_near(docs, method="simhash", max_hamming=10).collect()
    )
    assert kept_sim == [0, 3, 4]
