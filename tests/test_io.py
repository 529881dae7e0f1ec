"""read_rdf/write_rdf format dispatch — every format round-trips the
triples relation (graph column where the format carries it)."""

from __future__ import annotations

import json

import pytest

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    XSD_INTEGER,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.sources.io import read_rdf, write_rdf


def _fixture(spark, graph=None):
    return triples_from_rows(
        spark,
        [
            ("urn:a", RDF_TYPE, iri(EX + "T")),
            ("urn:a", EX + "p", lit_typed("42", XSD_INTEGER)),
            ("urn:b", EX + "q", lit_typed("hallo", None, "de")),
        ],
        graph=graph,
    )


def _terms(df):
    return {
        (r.s, r.p, r.o_kind, r.o_value, r.o_lang) for r in df.collect()
    }


@pytest.mark.parametrize("ext", ["nt", "nq", "parquet", "jsonl"])
def test_write_read_roundtrip(spark, tmp_path, ext):
    g = "urn:g:x" if ext in ("nq", "parquet") else None
    df = _fixture(spark, graph=g)
    path = str(tmp_path / f"out.{ext}")
    write_rdf(df, path)
    back = read_rdf(spark, path)
    assert _terms(back) == _terms(df)
    if ext in ("nq", "parquet"):
        assert {r.graph for r in back.collect()} == {g}


@pytest.mark.parametrize("ext", ["ttl", "trig"])
def test_turtle_trig_roundtrip(spark, tmp_path, ext):
    g = "urn:g:x" if ext == "trig" else None
    df = _fixture(spark, graph=g)
    path = str(tmp_path / f"out.{ext}")
    write_rdf(df, path, prefixes={"ex": EX})
    back = read_rdf(spark, path)
    assert _terms(back) == _terms(df)
    if ext == "trig":
        assert {r.graph for r in back.collect()} == {g}


def test_read_jsonld_document(spark, tmp_path):
    doc = {
        "@context": {"ex": EX},
        "@id": "urn:a",
        "@type": "ex:T",
        "ex:name": "x",
    }
    p = tmp_path / "doc.jsonld"
    p.write_text(json.dumps(doc))
    back = read_rdf(spark, str(p))
    assert _terms(back) == {
        ("urn:a", RDF_TYPE, "iri", EX + "T", None),
        ("urn:a", EX + "name", "literal", "x", None),
    }


def test_turtle_driver_size_guard(spark, tmp_path):
    """Turtle/TriG parse on the driver; above max_driver_bytes read_rdf
    must refuse with an error naming the splittable alternatives instead
    of silently collecting (round-4 VERDICT watch item)."""
    df = _fixture(spark)
    path = str(tmp_path / "big.ttl")
    write_rdf(df, path, prefixes={"ex": EX})
    with pytest.raises(ValueError, match=r"N-Triples.*parquet|parquet.*N-Triples"):
        read_rdf(spark, path, max_driver_bytes=1)
    # the same file under the default limit still reads fine
    assert _terms(read_rdf(spark, path)) == _terms(df)


def test_unknown_extension_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="cannot infer"):
        read_rdf(spark, str(tmp_path / "x.hextuples"))
    # explicit format overrides the extension
    df = _fixture(spark)
    path = str(tmp_path / "weird.dat")
    write_rdf(df, path, format="ntriples")
    back = read_rdf(spark, path, format="ntriples")
    assert _terms(back) == _terms(df)
