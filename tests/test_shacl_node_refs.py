"""Node-shape self constraints and sh:node shape-to-shape references
(bounded by max_validation_depth)."""

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


def _data(spark):
    return triples_from_rows(
        spark,
        [
            # employees pointing at orgs; org2 has no homepage
            ("urn:e1", RDF_TYPE, iri(EX + "Employee")),
            ("urn:e1", EX + "org", iri("urn:org1")),
            ("urn:e2", RDF_TYPE, iri(EX + "Employee")),
            ("urn:e2", EX + "org", iri("urn:org2")),
            ("urn:org1", EX + "homepage", iri("https://org1.example")),
        ],
    )


def _shapes(spark):
    return triples_from_rows(
        spark,
        [
            (EX + "EmployeeShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "EmployeeShape", SH + "targetClass", iri(EX + "Employee")),
            (EX + "EmployeeShape", SH + "property", iri(EX + "EmployeeShape-org")),
            (EX + "EmployeeShape-org", SH + "path", iri(EX + "org")),
            (EX + "EmployeeShape-org", SH + "node", iri(EX + "OrgShape")),
            # referenced shape: no targets of its own
            (EX + "OrgShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "OrgShape", SH + "property", iri(EX + "OrgShape-hp")),
            (EX + "OrgShape-hp", SH + "path", iri(EX + "homepage")),
            (EX + "OrgShape-hp", SH + "minCount", lit_typed("1")),
        ],
    )


def test_sh_node_reference(spark):
    res = validate(spark, _data(spark), _shapes(spark))
    rows = {(r.focusNode, r.value, r.sourceConstraintComponent) for r in res.collect()}
    # e2's org (org2) violates OrgShape -> one NodeConstraintComponent result
    assert rows == {
        ("urn:e2", "urn:org2", SH + "NodeConstraintComponent")
    }


def test_sh_node_depth_bound(spark):
    # self-referential shape cycle: A.knows -> A; depth cap must terminate
    data = triples_from_rows(
        spark,
        [
            ("urn:a", RDF_TYPE, iri(EX + "P")),
            ("urn:a", EX + "knows", iri("urn:b")),
            ("urn:b", EX + "knows", iri("urn:c")),
            # urn:c knows nobody -> violates at depth 2
        ],
    )
    shapes = triples_from_rows(
        spark,
        [
            (EX + "PShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "PShape", SH + "targetClass", iri(EX + "P")),
            (EX + "PShape", SH + "property", iri(EX + "PShape-k")),
            (EX + "PShape-k", SH + "path", iri(EX + "knows")),
            (EX + "PShape-k", SH + "minCount", lit_typed("1")),
            (EX + "PShape-k", SH + "node", iri(EX + "PShape")),
        ],
    )
    # depth 1: only direct values checked -> b lacks... b HAS knows (c), so
    # at depth 1 b conforms (c is not expanded) -> no node violation, and
    # a itself satisfies minCount
    res1 = validate(spark, data, shapes, max_validation_depth=1)
    comps1 = {(r.focusNode, r.sourceConstraintComponent) for r in res1.collect()}
    assert comps1 == set()

    # depth 3: c (no knows) violates PShape -> b nonconforming -> a gets a
    # node violation for its value b. Per W3C SHACL, nested conformance
    # checks are internal: only the TOP-LEVEL focus node reports.
    res3 = validate(spark, data, shapes, max_validation_depth=3)
    comps3 = {(r.focusNode, r.value, r.sourceConstraintComponent) for r in res3.collect()}
    assert comps3 == {("urn:a", "urn:b", SH + "NodeConstraintComponent")}


def test_node_shape_self_constraint(spark):
    data = triples_from_rows(
        spark,
        [
            ("urn:ok1", RDF_TYPE, iri(EX + "Thing")),
            ("bad id", RDF_TYPE, iri(EX + "Thing")),
        ],
    )
    shapes = triples_from_rows(
        spark,
        [
            (EX + "TShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "TShape", SH + "targetClass", iri(EX + "Thing")),
            (EX + "TShape", SH + "pattern", lit_typed("^urn:")),
        ],
    )
    res = validate(spark, data, shapes)
    rows = {(r.focusNode, r.resultPath, r.sourceConstraintComponent) for r in res.collect()}
    assert rows == {("bad id", None, SH + "PatternConstraintComponent")}


def test_inverse_path(spark):
    data = triples_from_rows(
        spark,
        [
            ("urn:p1", RDF_TYPE, iri(EX + "Place")),
            ("urn:p2", RDF_TYPE, iri(EX + "Place")),
            ("urn:o1", EX + "basedIn", iri("urn:p1")),
            # urn:p2 has no incoming basedIn
        ],
    )
    shapes = triples_from_rows(
        spark,
        [
            (EX + "PlaceShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "PlaceShape", SH + "targetClass", iri(EX + "Place")),
            (EX + "PlaceShape", SH + "property", iri(EX + "PlaceShape-in")),
            (EX + "PlaceShape-in", SH + "path", iri("urn:pathnode:1")),
            ("urn:pathnode:1", SH + "inversePath", iri(EX + "basedIn")),
            (EX + "PlaceShape-in", SH + "minCount", lit_typed("1")),
        ],
    )
    res = validate(spark, data, shapes)
    got = {(r.focusNode, r.sourceConstraintComponent) for r in res.collect()}
    assert got == {("urn:p2", SH + "MinCountConstraintComponent")}
