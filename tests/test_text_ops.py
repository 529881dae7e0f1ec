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
        if r.kind == "image":
            # real PPM payload: decoded dims come from the header bytes
            w, h = r.media_id % 4 + 2, r.media_id % 5 + 2
            assert (r.img_width, r.img_height) == (w, h)
            assert r.n_bytes == len(f"P6\n{w} {h}\n255\n") + w * h * 3
        else:
            assert r.n_bytes == 40  # 'payload-' + 32 hex chars
            assert r.img_width is None and r.img_height is None
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-3  # normalized histogram


def test_decode_image_bytes_ppm_and_bmp():
    import numpy as np

    from cmem_plugin_pyshacl_spark.operators.multimodal import (
        decode_image_bytes,
        encode_ppm,
    )

    pix = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    w, h, back = decode_image_bytes(encode_ppm(pix))
    assert (w, h) == (3, 2)
    assert np.array_equal(back, pix)

    # hand-built 24bpp bottom-up BMP, 3x2, rows padded to 4 bytes
    import struct

    stride = (3 * 3 + 3) & ~3  # 12
    rows_bottom_up = pix[::-1][:, :, ::-1]  # BMP stores BGR bottom-up
    body = b"".join(
        rows_bottom_up[r].tobytes() + b"\x00" * (stride - 9) for r in range(2)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    w, h, back = decode_image_bytes(header + body)
    assert (w, h) == (3, 2)
    assert np.array_equal(back, pix)

    assert decode_image_bytes(b"payload-deadbeef") is None
    assert decode_image_bytes(None) is None


def test_resize_image_real_for_ppm(spark):
    import numpy as np

    from cmem_plugin_pyshacl_spark.operators.multimodal import (
        decode_image_bytes,
        resize_image,
    )

    media = synthetic_media(spark, 12)
    out = resize_image(media, width=2, height=2)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        if r.kind != "image":
            continue
        assert (r.meta_width, r.meta_height) == (2, 2)
        w, h, pix = decode_image_bytes(bytes(r.payload))
        assert (w, h) == (2, 2)
        # nearest-neighbor: pixels must come from the original image
        orig = {row.media_id: bytes(row.payload) for row in media.collect()}[mid]
        _, _, opix = decode_image_bytes(orig)
        flat = {tuple(px) for row in opix for px in row}
        assert all(tuple(px) in flat for row in pix for px in row)


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


# --------------------------------------------------- corpus hygiene (round 2)
def test_redact_pii(spark):
    from cmem_plugin_pyshacl_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at john.doe+x@example.co.uk please"),
            (2, "call +1 (555) 123-4567 or 555-7788990"),
            (3, "server at 192.168.0.1 responded"),
            (4, "clean text stays clean"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in redact_pii(df).collect()}
    assert got[1] == "mail me at <EMAIL> please"
    assert "<PHONE>" in got[2] and "555" not in got[2]
    assert got[3] == "server at <IP> responded"
    assert got[4] == "clean text stays clean"
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure codegen


def test_url_domain_and_cap(spark):
    from cmem_plugin_pyshacl_spark.operators.text import cap_per_domain, url_domain

    rows = [(i, f"https://user@Big.Example.com:8080/p/{i}?q=1") for i in range(10)]
    rows += [(100 + i, f"http://small.org/{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    doms = df.select(url_domain(F.col("url")).alias("d")).distinct().collect()
    assert {r.d for r in doms} == {"big.example.com", "small.org"}
    capped = cap_per_domain(df, max_docs=4)
    got = sorted(r.doc_id for r in capped.collect())
    assert got == [0, 1, 2, 3, 100, 101, 102]  # lowest ids kept per domain


def test_cap_per_domain_mega_domain_matches_window_version(spark):
    """Skew-safe path (pre-count + salted two-stage top-k) must produce
    EXACTLY the single-window result on a synthetic mega-domain plus many
    small domains (round-2 VERDICT finding 2)."""
    from pyspark.sql.window import Window

    from cmem_plugin_pyshacl_spark.operators.text import cap_per_domain, url_domain

    rows = [(i, f"https://mega.example.com/page/{i}") for i in range(5000)]
    for d in range(40):
        for i in range(d % 7 + 1):  # domains under and at the cap
            rows.append((100000 + d * 100 + i, f"http://site{d}.org/{i}"))
    df = spark.createDataFrame(rows, "doc_id long, url string")

    got = sorted(
        r.doc_id for r in cap_per_domain(df, max_docs=5, n_salt=8).collect()
    )
    w = Window.partitionBy("_domain").orderBy(F.col("doc_id"))
    naive = (
        df.withColumn("_domain", url_domain(F.col("url")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_domain", "_rn")
    )
    want = sorted(r.doc_id for r in naive.collect())
    assert got == want
    assert got[:5] == [0, 1, 2, 3, 4]  # mega-domain capped to lowest ids


def test_repetition_ratio(spark):
    from cmem_plugin_pyshacl_spark.operators.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "a\nb\nc"),          # all distinct -> 0
            (2, "x\nx\nx\nx"),        # 1 distinct of 4 -> 0.75
            (3, ""),                   # no lines -> 0
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.repetition_ratio for r in repetition_ratio(df).collect()}
    assert got[1] == 0.0 and abs(got[2] - 0.75) < 1e-9 and got[3] == 0.0


def test_wav_roundtrip_and_audio_features(spark):
    import numpy as np

    from cmem_plugin_pyshacl_spark.operators.multimodal import (
        audio_features,
        decode_wav_bytes,
        encode_wav,
        synthetic_media,
    )

    # encode -> decode round-trip, mono and stereo, exact rate/shape
    mono = 0.5 * np.sin(2 * np.pi * 440 * np.arange(1600) / 8000)
    rate, ch, back = decode_wav_bytes(encode_wav(mono, 8000))
    assert (rate, ch, back.shape) == (8000, 1, (1600, 1))
    assert np.allclose(back[:, 0], mono, atol=2 / 32768)
    stereo = np.stack([mono, -mono], axis=1)
    rate, ch, back = decode_wav_bytes(encode_wav(stereo, 44100))
    assert (rate, ch, back.shape) == (44100, 2, (1600, 2))

    # non-WAV payloads decode to None, truncated header too
    assert decode_wav_bytes(b"payload-abc") is None
    assert decode_wav_bytes(b"RIFF\x00\x00\x00\x00WAVE") is None

    # distributed features over the real-audio fixture: a 0.5-amplitude
    # square wave has RMS 0.5 and peak 0.5 exactly
    media = synthetic_media(spark, 30, real_audio=True)
    rows = {r.media_id: r for r in audio_features(media).collect()}
    assert rows, "audio rows present"
    for mid, r in rows.items():
        assert r.sample_rate == 8000 and r.n_channels == 1
        assert r.duration_ms == (mid % 4 + 1) * 200
        assert abs(r.rms - 0.5) < 1e-3 and abs(r.peak - 0.5) < 1e-4
        # square wave at f Hz crosses zero 2f times/sec -> rate-normalized
        expected_zcr = 2 * (110 * (mid % 8 + 1)) / 8000
        assert abs(r.zero_cross_rate - expected_zcr) < 0.02

    # opaque (non-real) audio payloads yield honest NULLs
    opaque = synthetic_media(spark, 9, real_audio=False)
    null_rows = audio_features(opaque).collect()
    assert null_rows and all(r.sample_rate is None and r.rms is None for r in null_rows)


def test_resample_audio_real_for_wav(spark):
    import numpy as np

    from cmem_plugin_pyshacl_spark.operators.multimodal import (
        decode_wav_bytes,
        resample_audio,
        synthetic_media,
    )

    media = synthetic_media(spark, 30, real_audio=True)
    out = resample_audio(media, 4000)
    audio = [r for r in out.collect() if r.kind == "audio"]
    assert audio
    for r in audio:
        rate, ch, samples = decode_wav_bytes(bytes(r.payload))
        assert rate == 4000 and ch == 1
        # nearest-neighbor downsample halves the frame count (+-1)
        assert abs(len(samples) - 4000 * r.meta_duration_ms / 1000) <= 1
    # non-audio rows pass through untouched
    img = [r for r in out.collect() if r.kind == "image"]
    assert img and all(bytes(r.payload)[:2] == b"P6" for r in img)

    # an undecodable audio payload fails loudly, not silently
    import pytest as _pytest

    opaque = synthetic_media(spark, 9, real_audio=False)
    with _pytest.raises(Exception, match="NotImplementedError|codec"):
        resample_audio(opaque, 4000).collect()


def test_decontaminate_ngram_overlap(spark):
    from cmem_plugin_pyshacl_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(1, "What is the capital city of France and when was it founded exactly")],
        "qid long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark's first 13 words verbatim (punctuation
            # and case must not matter)
            (1, "Quiz: WHAT is the Capital City of France, and when was it founded exactly? Answer below."),
            # paraphrase, no 13-gram overlap
            (2, "France's capital and its founding date are common trivia questions."),
            # shorter than 13 words -> no grams -> clean
            (3, "tiny document"),
            # repeats the benchmark text twice -> multiple hits
            (4, "what is the capital city of france and when was it founded exactly "
                "what is the capital city of france and when was it founded exactly"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in decontaminate(docs, bench, n=13).collect()}
    assert out[1].contaminated and out[1].contamination_hits >= 1
    assert not out[2].contaminated and out[2].contamination_hits == 0
    assert not out[3].contaminated
    assert out[4].contaminated and out[4].contamination_hits > out[1].contamination_hits
    # min_hits raises the bar (doc 4 matches the benchmark's single
    # 13-gram twice; doc 1 only once)
    strict = {r.doc_id: r.contaminated
              for r in decontaminate(docs, bench, n=13, min_hits=2).collect()}
    assert strict[4] and not strict[1]


def test_decontaminate_plan_has_no_cartesian(spark):
    from cmem_plugin_pyshacl_spark.operators.text import decontaminate

    bench = spark.createDataFrame([(1, "a b c d e")], "qid long, text string")
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = decontaminate(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---- chunking / vocabulary / stratified sampling ----


def test_chunk_documents_windows_and_overlap(spark):
    from cmem_plugin_pyshacl_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))  # t0..t9
    docs = spark.createDataFrame([(1, text), (2, "solo")], "doc_id long, text string")
    rows = (
        chunk_documents(docs, chunk_tokens=4, overlap=2)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    d1 = [r for r in rows if r.doc_id == 1]
    # stride 2: starts 0,2,4,6 survive; start 8 adds only the 2-token
    # overlap tail and is dropped
    assert [(r.chunk_id, r.tok_begin, r.n_tokens, r.chunk_text) for r in d1] == [
        (0, 0, 4, "t0 t1 t2 t3"),
        (1, 2, 4, "t2 t3 t4 t5"),
        (2, 4, 4, "t4 t5 t6 t7"),
        (3, 6, 4, "t6 t7 t8 t9"),
    ]
    d2 = [r for r in rows if r.doc_id == 2]
    assert [(r.chunk_id, r.n_tokens, r.chunk_text) for r in d2] == [(0, 1, "solo")]
    # reconstruction invariant: dropping each chunk's overlap prefix
    # (after the first) re-concatenates to the original token stream
    joined = " ".join(
        r.chunk_text if r.chunk_id == 0 else " ".join(r.chunk_text.split()[2:])
        for r in d1
    )
    assert joined == text


def test_chunk_documents_empty_and_null_docs_emit_no_chunks(spark):
    """split(trim(''), '\\s+') yields [''] — an empty/whitespace-only (or
    NULL) document must produce ZERO chunks, not a phantom ('', 1) row."""
    from cmem_plugin_pyshacl_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, ""), (2, "   \t  "), (3, None), (4, "one two")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    assert [(r.doc_id, r.chunk_text, r.n_tokens) for r in rows] == [
        (4, "one two", 2)
    ]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from cmem_plugin_pyshacl_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_build_vocab_counts_mincount_topk(spark):
    from cmem_plugin_pyshacl_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [(1, "a b a c A"), (2, "b a  d")], "doc_id long, text string"
    )
    counts = {r.token: r["count"] for r in build_vocab(docs).collect()}
    assert counts == {"a": 4, "b": 2, "c": 1, "d": 1}  # lowered, ws-split
    assert {r.token for r in build_vocab(docs, min_count=2).collect()} == {"a", "b"}
    top = build_vocab(docs, top_k=3).collect()
    assert [(r.token, r["count"]) for r in top] == [("a", 4), ("b", 2), ("c", 1)]
    # top_k compiles to TakeOrdered, not a full sort+exchange
    plan = (
        build_vocab(docs, top_k=3)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_sample_stratified_deterministic_and_rated(spark):
    from cmem_plugin_pyshacl_spark.operators.text import sample_stratified

    df = spark.createDataFrame(
        [(i, "big" if i % 2 == 0 else "rare") for i in range(2000)],
        "id long, stratum string",
    )
    rates = {"big": 0.25, "rare": 1.0}
    kept = sample_stratified(df, rates, "stratum", "id").collect()
    rare = [r for r in kept if r.stratum == "rare"]
    big = [r for r in kept if r.stratum == "big"]
    assert len(rare) == 1000  # rate 1.0 keeps everything
    assert 150 <= len(big) <= 350  # ~250 expected at rate 0.25
    # deterministic: same (id, seed) -> identical selection across runs
    kept2 = {r.id for r in sample_stratified(df, rates, "stratum", "id").collect()}
    assert kept2 == {r.id for r in kept}
    # different seed -> different (but similarly sized) selection
    kept3 = {
        r.id
        for r in sample_stratified(df, rates, "stratum", "id", seed=7).collect()
    }
    assert kept3 != kept2
    # unknown stratum follows default_rate
    extra = spark.createDataFrame([(99999, "other")], "id long, stratum string")
    assert sample_stratified(extra, rates, "stratum", "id").count() == 0
    assert (
        sample_stratified(extra, rates, "stratum", "id", default_rate=1.0).count()
        == 1
    )
