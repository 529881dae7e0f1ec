"""Property-pair constraints, sh:xone, sh:qualifiedValueShape, and
sequence paths."""

from __future__ import annotations

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    SH,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.shacl import validate

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _shape_rows(constraint_rows):
    return [
        (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
        (EX + "S", SH + "targetClass", iri(EX + "T")),
        (EX + "S", SH + "property", iri(EX + "S-p")),
        (EX + "S-p", SH + "path", iri(EX + "a")),
    ] + constraint_rows


def _run(spark, data_rows, constraint_rows):
    data = triples_from_rows(spark, data_rows)
    shapes = triples_from_rows(spark, _shape_rows(constraint_rows))
    res = validate(spark, data, shapes)
    return {(r.focusNode, r.value, r.sourceConstraintComponent) for r in res.collect()}


def test_equals(spark):
    got = _run(
        spark,
        [
            ("urn:x", RDF_TYPE, iri(EX + "T")),
            ("urn:x", EX + "a", lit_typed("1")),
            ("urn:x", EX + "a", lit_typed("2")),
            ("urn:x", EX + "b", lit_typed("2")),
            ("urn:x", EX + "b", lit_typed("3")),
        ],
        [(EX + "S-p", SH + "equals", iri(EX + "b"))],
    )
    comp = SH + "EqualsConstraintComponent"
    assert got == {("urn:x", "1", comp), ("urn:x", "3", comp)}


def test_disjoint(spark):
    got = _run(
        spark,
        [
            ("urn:x", RDF_TYPE, iri(EX + "T")),
            ("urn:x", EX + "a", lit_typed("1")),
            ("urn:x", EX + "a", lit_typed("2")),
            ("urn:x", EX + "b", lit_typed("2")),
        ],
        [(EX + "S-p", SH + "disjoint", iri(EX + "b"))],
    )
    assert got == {("urn:x", "2", SH + "DisjointConstraintComponent")}


def test_less_than_numeric(spark):
    got = _run(
        spark,
        [
            ("urn:x", RDF_TYPE, iri(EX + "T")),
            ("urn:x", EX + "a", lit_typed("9")),   # 9 < 10 numerically
            ("urn:y", RDF_TYPE, iri(EX + "T")),
            ("urn:y", EX + "a", lit_typed("11")),  # 11 >= 10
            ("urn:x", EX + "b", lit_typed("10")),
            ("urn:y", EX + "b", lit_typed("10")),
        ],
        [(EX + "S-p", SH + "lessThan", iri(EX + "b"))],
    )
    assert got == {("urn:y", "11", SH + "LessThanConstraintComponent")}


def test_xone(spark):
    # HasB / HasC: exactly one must match
    data = [
        ("urn:x1", RDF_TYPE, iri(EX + "T")),
        ("urn:x1", EX + "a", iri("urn:only-b")),
        ("urn:x2", RDF_TYPE, iri(EX + "T")),
        ("urn:x2", EX + "a", iri("urn:both")),
        ("urn:x3", RDF_TYPE, iri(EX + "T")),
        ("urn:x3", EX + "a", iri("urn:neither")),
        ("urn:only-b", EX + "b", lit_typed("1")),
        ("urn:both", EX + "b", lit_typed("1")),
        ("urn:both", EX + "c", lit_typed("1")),
    ]
    shape_extra = [
        (EX + "S-p", SH + "xone", iri("urn:xl:0")),
        ("urn:xl:0", RDF_NS + "first", iri(EX + "HasB")),
        ("urn:xl:0", RDF_NS + "rest", iri("urn:xl:1")),
        ("urn:xl:1", RDF_NS + "first", iri(EX + "HasC")),
        ("urn:xl:1", RDF_NS + "rest", iri(RDF_NS + "nil")),
        (EX + "HasB", SH + "property", iri(EX + "HasB-p")),
        (EX + "HasB-p", SH + "path", iri(EX + "b")),
        (EX + "HasB-p", SH + "minCount", lit_typed("1")),
        (EX + "HasC", SH + "property", iri(EX + "HasC-p")),
        (EX + "HasC-p", SH + "path", iri(EX + "c")),
        (EX + "HasC-p", SH + "minCount", lit_typed("1")),
    ]
    got = _run(spark, data, shape_extra)
    comp = SH + "XoneConstraintComponent"
    assert got == {("urn:x2", "urn:both", comp), ("urn:x3", "urn:neither", comp)}


def test_qualified_min_count(spark):
    # each T must have >=2 'a' values conforming to HasB
    data = [
        ("urn:x", RDF_TYPE, iri(EX + "T")),
        ("urn:x", EX + "a", iri("urn:g1")),
        ("urn:x", EX + "a", iri("urn:g2")),
        ("urn:y", RDF_TYPE, iri(EX + "T")),
        ("urn:y", EX + "a", iri("urn:g1")),
        ("urn:y", EX + "a", iri("urn:bad")),
        ("urn:g1", EX + "b", lit_typed("1")),
        ("urn:g2", EX + "b", lit_typed("1")),
    ]
    shape_extra = [
        (EX + "S-p", SH + "qualifiedValueShape", iri(EX + "HasB")),
        (EX + "S-p", SH + "qualifiedMinCount", lit_typed("2")),
        (EX + "HasB", SH + "property", iri(EX + "HasB-p")),
        (EX + "HasB-p", SH + "path", iri(EX + "b")),
        (EX + "HasB-p", SH + "minCount", lit_typed("1")),
    ]
    got = _run(spark, data, shape_extra)
    assert got == {
        ("urn:y", None, SH + "QualifiedMinCountConstraintComponent")
    }


def test_sequence_path(spark):
    # path (a b): value = b-object of the a-object
    data = [
        ("urn:x", RDF_TYPE, iri(EX + "T")),
        ("urn:x", EX + "a", iri("urn:mid")),
        ("urn:mid", EX + "b", lit_typed("leaf")),
        ("urn:y", RDF_TYPE, iri(EX + "T")),
        ("urn:y", EX + "a", iri("urn:dead-end")),  # no b -> zero values
    ]
    shapes = triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "T")),
            (EX + "S", SH + "property", iri(EX + "S-p")),
            (EX + "S-p", SH + "path", iri("urn:seq:0")),
            ("urn:seq:0", RDF_NS + "first", iri(EX + "a")),
            ("urn:seq:0", RDF_NS + "rest", iri("urn:seq:1")),
            ("urn:seq:1", RDF_NS + "first", iri(EX + "b")),
            ("urn:seq:1", RDF_NS + "rest", iri(RDF_NS + "nil")),
            (EX + "S-p", SH + "minCount", lit_typed("1")),
        ],
    )
    res = validate(spark, triples_from_rows(spark, data), shapes)
    got = {(r.focusNode, r.resultPath, r.sourceConstraintComponent) for r in res.collect()}
    assert got == {
        (
            "urn:y",
            EX + "a" + "/" + EX + "b",
            SH + "MinCountConstraintComponent",
        )
    }


def test_closed_shape(spark):
    data = [
        ("urn:x", RDF_TYPE, iri(EX + "T")),
        ("urn:x", EX + "a", lit_typed("ok")),
        ("urn:x", EX + "rogue", lit_typed("not allowed")),
    ]
    shapes = triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "T")),
            (EX + "S", SH + "closed", lit_typed("true")),
            (EX + "S", SH + "ignoredProperties", iri("urn:ig:0")),
            ("urn:ig:0", RDF_NS + "first", iri(RDF_TYPE)),
            ("urn:ig:0", RDF_NS + "rest", iri(RDF_NS + "nil")),
            (EX + "S", SH + "property", iri(EX + "S-p")),
            (EX + "S-p", SH + "path", iri(EX + "a")),
        ],
    )
    res = validate(spark, triples_from_rows(spark, data), shapes)
    got = {(r.focusNode, r.resultPath, r.value, r.sourceConstraintComponent)
           for r in res.collect()}
    assert got == {
        ("urn:x", EX + "rogue", "not allowed", SH + "ClosedConstraintComponent")
    }


def test_value_range(spark):
    data = [
        ("urn:x", RDF_TYPE, iri(EX + "T")),
        ("urn:x", EX + "a", lit_typed("5")),
        ("urn:y", RDF_TYPE, iri(EX + "T")),
        ("urn:y", EX + "a", lit_typed("25")),
        ("urn:z", RDF_TYPE, iri(EX + "T")),
        ("urn:z", EX + "a", lit_typed("nope")),  # non-numeric -> violates
    ]
    got = _run(spark, data, [(EX + "S-p", SH + "minInclusive", lit_typed("10"))])
    comp = SH + "MinInclusiveConstraintComponent"
    assert got == {("urn:x", "5", comp), ("urn:z", "nope", comp)}
    got2 = _run(spark, data, [(EX + "S-p", SH + "maxExclusive", lit_typed("25"))])
    comp2 = SH + "MaxExclusiveConstraintComponent"
    assert got2 == {("urn:y", "25", comp2), ("urn:z", "nope", comp2)}


def test_alternative_path(spark):
    # path (a | b): union of both predicates' values
    data = [
        ("urn:x", RDF_TYPE, iri(EX + "T")),
        ("urn:x", EX + "a", lit_typed("va")),
        ("urn:y", RDF_TYPE, iri(EX + "T")),
        ("urn:y", EX + "b", lit_typed("vb")),
        ("urn:z", RDF_TYPE, iri(EX + "T")),  # neither -> minCount violation
    ]
    shapes = triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "T")),
            (EX + "S", SH + "property", iri(EX + "S-p")),
            (EX + "S-p", SH + "path", iri("urn:alt:node")),
            ("urn:alt:node", SH + "alternativePath", iri("urn:al:0")),
            ("urn:al:0", RDF_NS + "first", iri(EX + "a")),
            ("urn:al:0", RDF_NS + "rest", iri("urn:al:1")),
            ("urn:al:1", RDF_NS + "first", iri(EX + "b")),
            ("urn:al:1", RDF_NS + "rest", iri(RDF_NS + "nil")),
            (EX + "S-p", SH + "minCount", lit_typed("1")),
        ],
    )
    res = validate(spark, triples_from_rows(spark, data), shapes)
    got = {(r.focusNode, r.resultPath) for r in res.collect()}
    assert got == {("urn:z", EX + "a" + "|" + EX + "b")}
