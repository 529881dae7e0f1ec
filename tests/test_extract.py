"""Extractor freeze tests: the per-row invariant from BASELINE.json is
byte-identical extracted text per url; the vectorized batch path must match
the single-value reference path, and golden hashes pin extractor v1."""

from __future__ import annotations

import hashlib

import pandas as pd

from cmem_plugin_pyshacl_spark.functions.extract import (
    EXTRACTOR_VERSION,
    extract_text_bytes,
    extract_text_series,
)
from cmem_plugin_pyshacl_spark.sources.pages import page_html

# frozen v1 goldens: sha256 of extract(page_html(i)) for pinned indices.
# Any drift = the extractor changed = version bump required.
GOLDEN = {
    0: None,  # filled by test bootstrap below on first computation
}


def test_batch_matches_single():
    htmls = [page_html(i).encode("utf-8") for i in range(50)]
    batch = extract_text_series(pd.Series(htmls)).tolist()
    single = [extract_text_bytes(h) for h in htmls]
    assert batch == single


def test_extract_drops_script_style_comments():
    txt = extract_text_bytes(page_html(7).encode("utf-8"))
    assert "var x=" not in txt
    assert "color: black" not in txt
    assert "comment" not in txt
    assert "Page 7 of site7" in txt


def test_extract_entities_and_whitespace():
    html = b"<html><body><p>a &amp; b &lt;c&gt;   d</p><p>e</p></body></html>"
    assert extract_text_bytes(html) == "a & b <c> d\ne"


def test_extractor_version_frozen():
    assert EXTRACTOR_VERSION == 1
    # golden corpus hash over 200 deterministic pages: pins v1 behavior
    h = hashlib.sha256()
    for i in range(200):
        h.update(extract_text_bytes(page_html(i).encode("utf-8")).encode("utf-8"))
        h.update(b"\x00")
    digest = h.hexdigest()
    # frozen on first green run of extractor v1 — do not change without
    # bumping EXTRACTOR_VERSION
    assert digest == "f9a1953d77d97d49e0685ceb1ec5429f6b1bc4be4b1b3aa6b247cdd579b781db", digest


def test_extract_in_spark(spark):
    from cmem_plugin_pyshacl_spark.sources.pages import generate_pages
    from pyspark.sql import functions as F
    from cmem_plugin_pyshacl_spark.functions.extract import extract_text_udf

    pages = generate_pages(spark, 100, num_partitions=4)
    # invariant: re-extraction equals the stored text column byte-for-byte
    diff = pages.withColumn("re", extract_text_udf(F.col("html"))).filter(
        F.col("re") != F.col("text")
    )
    assert diff.count() == 0


def test_pages_from_ids_offset_parity(spark):
    """pages_from_ids on a NON-contiguous id set derives exactly the page
    the pure-python template maps each id to (the analytic-oracle
    identity the kg_* queries rely on), and generate_pages' explicit
    num_partitions contract is untouched by the spread guard."""
    from pyspark.sql import functions as F

    from cmem_plugin_pyshacl_spark.functions.extract import extract_text_bytes
    from cmem_plugin_pyshacl_spark.sources.pages import (
        generate_pages,
        page_html,
        pages_from_ids,
    )

    ids = spark.range(0, 5).select((F.col("id") + 1_000_000).alias("id"))
    got = {r.id: r.text for r in pages_from_ids(ids).select("id", "text").collect()}
    assert set(got) == {1_000_000 + i for i in range(5)}
    for i, text in got.items():
        assert text == extract_text_bytes(page_html(i).encode())
    assert generate_pages(spark, 100, num_partitions=4).rdd.getNumPartitions() == 4
