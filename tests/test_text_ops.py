"""Text-analysis + multimodal operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from cmem_plugin_pyshacl_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    synthetic_media,
)
from cmem_plugin_pyshacl_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_lang_id(spark):
    docs = _docs(
        spark,
        [
            "the cat and the dog is that with",
            "der hund und die katze ist nicht mit",
            "le chat est dans la maison et que",
            "el perro es que los gatos por una",
            "xyzzy plugh quux",
        ],
    )
    got = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "es", 4: "und"}


def test_quality_score_components(spark):
    docs = _docs(spark, ["the quick brown fox jumps over the lazy dog today"])
    r = quality_score(docs).collect()[0]
    assert r.q_n_tokens == 10
    assert r.q_punct_ratio == 0.0
    assert r.q_alpha_ratio > 0.7
    assert r.q_score == 1.0  # passes all four gates


def test_quality_score_penalizes_garbage(spark):
    docs = _docs(spark, ["!!! ??? ,,, ;;; ..."])
    r = quality_score(docs).collect()[0]
    # fails the alpha-ratio and punct-ratio gates (keeps length/word-len)
    assert r.q_alpha_ratio == 0.0
    assert r.q_punct_ratio > 0.5
    assert r.q_score <= 0.6 + 1e-9


def test_token_counts(spark):
    docs = _docs(spark, ["hello world42 foo-bar"])
    r = token_counts(docs).collect()[0]
    assert r.ws_tokens == 3
    # runs: hello | world | 42 | foo | - | bar
    assert r.bpe_tokens == 6


def test_fingerprint_stability_and_sensitivity(spark):
    docs = _docs(spark, ["abcdefghij", "abcdefghij", "abcdefghiX"])
    rows = {r.doc_id: (r.winnow_min, r.content_hash)
            for r in fingerprint(docs).collect()}
    assert rows[0] == rows[1]
    assert rows[0][1] != rows[2][1]


def test_multimodal_features(spark):
    media = synthetic_media(spark, 30)
    feats = decode_features(media, dim=8).collect()
    assert len(feats) == 30
    for r in feats:
        assert r.n_bytes == 40  # 'payload-' + 32 hex chars
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-3  # normalized histogram


def test_frame_sample(spark):
    media = synthetic_media(spark, 30)
    frames = frame_sample(media, every_ms=1000)
    rows = frames.groupBy("media_id").count().collect()
    durations = {
        r.media_id: r.meta_duration_ms
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for r in rows:
        expected = (durations[r.media_id] - 1) // 1000 + 1
        assert r["count"] == expected
