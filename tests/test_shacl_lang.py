"""sh:languageIn and sh:uniqueLang constraint components."""

from __future__ import annotations

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    SH,
    iri,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.shacl import validate

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _data(spark):
    def lab(v, lang):
        return (v, "literal", None, lang)

    return triples_from_rows(
        spark,
        [
            ("urn:a", RDF_TYPE, iri(EX + "T")),
            ("urn:a", EX + "label", lab("hello", "en")),
            ("urn:a", EX + "label", lab("hallo", "de-DE")),
            ("urn:b", RDF_TYPE, iri(EX + "T")),
            ("urn:b", EX + "label", lab("bonjour", "fr")),
            ("urn:b", EX + "label", lab("salut", "fr")),  # duplicate fr
            ("urn:c", RDF_TYPE, iri(EX + "T")),
            ("urn:c", EX + "label", lab("untagged", None)),
        ],
    )


def _shapes(spark, extra):
    rows = [
        (EX + "TShape", RDF_TYPE, iri(SH + "NodeShape")),
        (EX + "TShape", SH + "targetClass", iri(EX + "T")),
        (EX + "TShape", SH + "property", iri(EX + "TShape-l")),
        (EX + "TShape-l", SH + "path", iri(EX + "label")),
    ] + extra
    return triples_from_rows(spark, rows)


def test_language_in(spark):
    extra = [
        (EX + "TShape-l", SH + "languageIn", iri("urn:ll:0")),
        ("urn:ll:0", RDF_NS + "first", ("en", "literal", None, None)),
        ("urn:ll:0", RDF_NS + "rest", iri("urn:ll:1")),
        ("urn:ll:1", RDF_NS + "first", ("de", "literal", None, None)),
        ("urn:ll:1", RDF_NS + "rest", iri(RDF_NS + "nil")),
    ]
    res = validate(spark, _data(spark), _shapes(spark, extra))
    got = {(r.focusNode, r.value) for r in res.collect()}
    # en + de-DE (primary match) pass; fr labels and the untagged one fail
    assert got == {
        ("urn:b", "bonjour"),
        ("urn:b", "salut"),
        ("urn:c", "untagged"),
    }


def test_unique_lang(spark):
    extra = [(EX + "TShape-l", SH + "uniqueLang", ("true", "literal", None, None))]
    res = validate(spark, _data(spark), _shapes(spark, extra))
    got = {(r.focusNode, r.value, r.sourceConstraintComponent) for r in res.collect()}
    assert got == {("urn:b", "fr", SH + "UniqueLangConstraintComponent")}
