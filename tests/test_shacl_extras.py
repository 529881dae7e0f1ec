"""Extra SHACL constraints (minLength/maxLength/in/hasValue) + meta_shacl."""

from __future__ import annotations

import pytest

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    SH,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.fixtures import shapes_graph
from cmem_plugin_pyshacl_spark.plans.shacl import validate


def _data(spark):
    return triples_from_rows(
        spark,
        [
            ("urn:c1", RDF_TYPE, iri(EX + "Customer")),
            ("urn:c1", EX + "tag", lit_typed("alpha")),
            ("urn:c2", RDF_TYPE, iri(EX + "Customer")),
            ("urn:c2", EX + "tag", lit_typed("very-long-tag-value")),
            ("urn:c3", RDF_TYPE, iri(EX + "Customer")),
            ("urn:c3", EX + "tag", lit_typed("x")),
        ],
    )


def _viol(spark, spec):
    res = validate(spark, _data(spark), shapes_graph(spark, spec))
    return {(r.focusNode, r.sourceConstraintComponent) for r in res.collect()}


def test_min_length(spark):
    got = _viol(spark, {"t": {"path": EX + "tag", "minLength": 3}})
    assert got == {("urn:c3", SH + "MinLengthConstraintComponent")}


def test_max_length(spark):
    got = _viol(spark, {"t": {"path": EX + "tag", "maxLength": 6}})
    assert got == {("urn:c2", SH + "MaxLengthConstraintComponent")}


def test_in(spark):
    got = _viol(spark, {"t": {"path": EX + "tag", "in": ["alpha", "x"]}})
    assert got == {("urn:c2", SH + "InConstraintComponent")}


def test_has_value(spark):
    got = _viol(spark, {"t": {"path": EX + "tag", "hasValue": "alpha"}})
    # one result per focus lacking the value (c2, c3) — c1 conforms
    assert got == {
        ("urn:c2", SH + "HasValueConstraintComponent"),
        ("urn:c3", SH + "HasValueConstraintComponent"),
    }


def test_meta_shacl_pass_and_fail(spark):
    shapes = shapes_graph(spark, {"t": {"path": EX + "tag", "minLength": 3}})
    # shapes graph validated against itself: conforms -> no raise
    validate(spark, _data(spark), shapes, meta_shacl=True)

    # a shapes graph that also declares itself a target and violates itself
    bad = triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", RDF_TYPE, iri(EX + "Thing")),
            (EX + "S", SH + "targetClass", iri(EX + "Thing")),
            (EX + "S", SH + "property", iri(EX + "S-p")),
            (EX + "S-p", SH + "path", iri(EX + "missing")),
            (EX + "S-p", SH + "minCount", lit_typed("1")),
        ],
    )
    with pytest.raises(ValueError, match="meta-SHACL"):
        validate(spark, _data(spark), bad, meta_shacl=True)
