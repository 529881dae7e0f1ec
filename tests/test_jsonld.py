"""JSON-LD (expanded NDJSON) source/sink — round-trip + subset errors."""

from __future__ import annotations

import json

import pytest

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    XSD,
    iri,
    lit_typed,
    to_ntriples,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.sources.jsonld import (
    from_jsonld,
    to_jsonld,
    write_jsonld,
)


def _term_set(df):
    return {
        (r.s, r.p, r.o_kind, r.o_value, r.o_datatype, r.o_lang)
        for r in df.collect()
    }


def _mixed(spark):
    return triples_from_rows(
        spark,
        [
            ("urn:a", RDF_TYPE, iri(EX + "Person")),
            ("urn:a", EX + "knows", iri("urn:b")),
            ("urn:a", EX + "name", lit_typed('sa"y\n\\x')),  # JSON escapes
            ("urn:a", EX + "age", lit_typed("42", XSD + "integer")),
            ("urn:a", EX + "label", lit_typed("hallo", None, "de")),
            ("urn:b", EX + "name", lit_typed("plain")),
        ],
    )


def test_jsonld_roundtrip_mixed_terms(spark):
    data = _mixed(spark)
    lines = to_jsonld(data)
    # every line is standalone valid JSON with an @id
    for r in lines.collect():
        obj = json.loads(r.line)
        assert obj["@id"].startswith("urn:")
    back = from_jsonld(lines)
    assert _term_set(back) == _term_set(data)


def test_jsonld_reader_bare_scalars_and_type_keyword(spark):
    lines = spark.createDataFrame(
        [
            (
                json.dumps(
                    {
                        "@id": "urn:x",
                        "@type": [EX + "A", EX + "B"],
                        EX + "n": 7,
                        EX + "f": 2.5,
                        EX + "b": True,
                        EX + "s": "str",
                        EX + "one": {"@value": "v"},  # single, not list
                    }
                ),
            ),
            ("",),  # blank line skips
        ],
        "line string",
    )
    got = _term_set(from_jsonld(lines))
    assert ("urn:x", RDF_TYPE, "iri", EX + "A", None, None) in got
    assert ("urn:x", RDF_TYPE, "iri", EX + "B", None, None) in got
    assert ("urn:x", EX + "n", "literal", "7", XSD + "integer", None) in got
    assert ("urn:x", EX + "f", "literal", "2.5", XSD + "double", None) in got
    assert ("urn:x", EX + "b", "literal", "true", XSD + "boolean", None) in got
    assert ("urn:x", EX + "s", "literal", "str", None, None) in got
    assert ("urn:x", EX + "one", "literal", "v", None, None) in got


def test_jsonld_reader_nonfinite_floats_use_xsd_lexical_forms(spark):
    """stdlib json.loads accepts the non-standard NaN/Infinity tokens;
    the reader must emit the XSD double lexical forms (NaN/INF/-INF),
    never repr()'s 'nan'/'inf'/'-inf'."""
    lines = spark.createDataFrame(
        [('{"@id": "urn:x", "%sp": [NaN, Infinity, -Infinity]}' % EX,)],
        "line string",
    )
    got = _term_set(from_jsonld(lines))
    assert ("urn:x", EX + "p", "literal", "NaN", XSD + "double", None) in got
    assert ("urn:x", EX + "p", "literal", "INF", XSD + "double", None) in got
    assert ("urn:x", EX + "p", "literal", "-INF", XSD + "double", None) in got


def test_jsonld_reader_subset_errors(spark):
    for bad, msg in (
        ({"@id": "urn:x", "@graph": []}, "@graph"),
        ({"@id": "_:b0", "p": 1}, "blank-node"),
        ({"p": 1}, "without @id"),
        ({"@id": "urn:x", EX + "p": {"@list": [1, 2]}}, "@list"),
        ({"@id": "urn:x", EX + "p": {"k": "nested"}}, "nested node objects"),
    ):
        lines = spark.createDataFrame([(json.dumps(bad),)], "line string")
        with pytest.raises(Exception, match=msg):
            from_jsonld(lines).collect()


def test_write_jsonld_distributed_files_roundtrip(spark, tmp_path):
    data = _mixed(spark)
    out = str(tmp_path / "jl")
    write_jsonld(data.repartition(4), out)
    back = from_jsonld(spark.read.text(out), line_col="value")
    assert _term_set(back) == _term_set(data)
    # sanity vs the N-Triples surface: same term count either way
    assert back.count() == to_ntriples(data).count()
