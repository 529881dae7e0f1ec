"""Structured-Streaming ingest test: the foreachBatch path must produce
the same triples as the batch pipeline over the same pages."""

from __future__ import annotations

import os

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    SH,
    XSD_INTEGER,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.pipeline import (
    canonicalize_stage,
    relations_fused_stage,
    triples_stage,
)
from cmem_plugin_pyshacl_spark.sources.pages import generate_pages
from cmem_plugin_pyshacl_spark.streaming.ingest import validate_stream


def _shapes(spark):
    return triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "Person")),
            (EX + "S", SH + "property", iri(EX + "S/p")),
            (EX + "S/p", SH + "path", iri(EX + "basedIn")),
            (EX + "S/p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )


def test_stream_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    pages = generate_pages(spark, 120)
    # two file drops -> two micro-batches (maxFilesPerTrigger=1)
    pages.filter(pages.id < 60).coalesce(1).write.parquet(
        pages_dir, mode="overwrite"
    )
    pages.filter(pages.id >= 60).coalesce(1).write.mode("append").parquet(pages_dir)

    q = validate_stream(spark, pages_dir, _shapes(spark), out_dir)
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "triples"))
    got = {(r.s, r.p, r.o_value) for r in streamed.collect()}

    rel = relations_fused_stage(pages)
    batch = triples_stage(rel, canonicalize_stage(rel))
    want = {(r.s, r.p, r.o_value) for r in batch.collect()}
    # entity IRIs are normalization-stable, so the relation/type triples
    # must match the batch run exactly. rdfs:label carries the canonical
    # (min) SURFACE, which is a global property — a micro-batch that only
    # ever saw "org5 Inc." legitimately labels with that alias — so labels
    # are compared on subject coverage, not value.
    lbl = "http://www.w3.org/2000/01/rdf-schema#label"
    assert {t for t in got if t[1] != lbl} == {t for t in want if t[1] != lbl}
    assert {t[0] for t in got if t[1] == lbl} == {t[0] for t in want if t[1] == lbl}

    results = spark.read.parquet(os.path.join(out_dir, "validation_results"))
    assert results.count() > 0
