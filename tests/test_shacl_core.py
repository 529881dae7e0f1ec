"""Per-constraint SHACL unit tests (FIXTURES.md §2): one tiny data+shapes
fixture per constraint with hand-computed expected violations, mirroring
the W3C SHACL test-suite pattern and the reference's golden-graph test
style (/root/reference/tests/test_pyshacl.py:51-80)."""

from __future__ import annotations

import pytest

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    SH,
    XSD_INTEGER,
    XSD_STRING,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.shacl import (
    compile_shapes,
    conforms,
    partition_reports,
    validate,
)


def shapes_min_count(spark, path=EX + "worksAt", extra=()):
    rows = [
        (EX + "PersonShape", RDF_TYPE, iri(SH + "NodeShape")),
        (EX + "PersonShape", SH + "targetClass", iri(EX + "Person")),
        (EX + "PersonShape", SH + "property", iri(EX + "PersonShape/p1")),
        (EX + "PersonShape/p1", SH + "path", iri(path)),
        *extra,
    ]
    return rows


def test_compile_shapes(spark):
    rows = shapes_min_count(spark, extra=[(EX + "PersonShape/p1", SH + "minCount", lit_typed("1", XSD_INTEGER))])
    compiled = compile_shapes(triples_from_rows(spark, rows))
    assert len(compiled.shapes) == 1
    shape = compiled.shapes[0]
    assert shape.target_classes == [EX + "Person"]
    assert shape.properties[0].min_count == 1
    assert shape.properties[0].path == EX + "worksAt"


def _data_persons(spark):
    """alice works somewhere, bob nowhere, carol twice."""
    rows = [
        (EX + "alice", RDF_TYPE, iri(EX + "Person")),
        (EX + "bob", RDF_TYPE, iri(EX + "Person")),
        (EX + "carol", RDF_TYPE, iri(EX + "Person")),
        (EX + "alice", EX + "worksAt", iri(EX + "org1")),
        (EX + "carol", EX + "worksAt", iri(EX + "org1")),
        (EX + "carol", EX + "worksAt", iri(EX + "org2")),
        (EX + "org1", RDF_TYPE, iri(EX + "Organization")),
    ]
    return triples_from_rows(spark, rows, graph=EX + "g/data")


def test_min_count(spark):
    shapes = triples_from_rows(
        spark,
        shapes_min_count(spark, extra=[(EX + "PersonShape/p1", SH + "minCount", lit_typed("1", XSD_INTEGER))]),
    )
    res = validate(spark, _data_persons(spark), shapes)
    rows = res.collect()
    assert len(rows) == 1
    assert rows[0].focusNode == EX + "bob"
    assert rows[0].sourceConstraintComponent == SH + "MinCountConstraintComponent"
    assert not conforms(res)


def test_max_count_one_result_per_focus(spark):
    shapes = triples_from_rows(
        spark,
        shapes_min_count(spark, extra=[(EX + "PersonShape/p1", SH + "maxCount", lit_typed("1", XSD_INTEGER))]),
    )
    res = validate(spark, _data_persons(spark), shapes)
    rows = res.collect()
    # carol has 2 employers -> exactly ONE result (per focus, not per value)
    assert len(rows) == 1
    assert rows[0].focusNode == EX + "carol"


def test_datatype(spark):
    shapes = triples_from_rows(
        spark,
        [
            (EX + "OrgShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "OrgShape", SH + "targetClass", iri(EX + "Organization")),
            (EX + "OrgShape", SH + "property", iri(EX + "OrgShape/p1")),
            (EX + "OrgShape/p1", SH + "path", iri(EX + "foundedYear")),
            (EX + "OrgShape/p1", SH + "datatype", iri(XSD_INTEGER)),
        ],
    )
    data = triples_from_rows(
        spark,
        [
            (EX + "org1", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org2", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org3", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org4", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org1", EX + "foundedYear", lit_typed("1999", XSD_INTEGER)),
            # wrong datatype tag
            (EX + "org2", EX + "foundedYear", lit_typed("1999", XSD_STRING)),
            # right tag, ill-formed lexical
            (EX + "org3", EX + "foundedYear", lit_typed("about 1999", XSD_INTEGER)),
            # IRI value
            (EX + "org4", EX + "foundedYear", iri(EX + "year1999")),
        ],
    )
    res = validate(spark, data, shapes)
    bad = sorted(r.focusNode for r in res.collect())
    assert bad == [EX + "org2", EX + "org3", EX + "org4"]


def test_class_with_subclass(spark):
    shapes = triples_from_rows(
        spark,
        [
            (EX + "OrgShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "OrgShape", SH + "targetClass", iri(EX + "Organization")),
            (EX + "OrgShape", SH + "property", iri(EX + "OrgShape/p1")),
            (EX + "OrgShape/p1", SH + "path", iri(EX + "basedIn")),
            (EX + "OrgShape/p1", SH + "class", iri(EX + "Place")),
        ],
    )
    data = triples_from_rows(
        spark,
        [
            (EX + "City", RDFS_SUBCLASSOF, iri(EX + "Place")),
            (EX + "org1", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org2", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org3", RDF_TYPE, iri(EX + "Organization")),
            (EX + "p1", RDF_TYPE, iri(EX + "Place")),
            (EX + "c1", RDF_TYPE, iri(EX + "City")),  # subclass instance: OK
            (EX + "org1", EX + "basedIn", iri(EX + "p1")),
            (EX + "org2", EX + "basedIn", iri(EX + "c1")),
            (EX + "org3", EX + "basedIn", iri(EX + "nowhere")),  # untyped: bad
        ],
    )
    res = validate(spark, data, shapes)
    bad = [r.focusNode for r in res.collect()]
    assert bad == [EX + "org3"]


def test_node_kind(spark):
    shapes = triples_from_rows(
        spark,
        [
            (EX + "OrgShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "OrgShape", SH + "targetClass", iri(EX + "Organization")),
            (EX + "OrgShape", SH + "property", iri(EX + "OrgShape/p1")),
            (EX + "OrgShape/p1", SH + "path", iri(EX + "homepage")),
            (EX + "OrgShape/p1", SH + "nodeKind", iri(SH + "IRI")),
        ],
    )
    data = triples_from_rows(
        spark,
        [
            (EX + "org1", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org2", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org1", EX + "homepage", iri("https://org1.example")),
            (EX + "org2", EX + "homepage", lit_typed("https://org2.example", XSD_STRING)),
        ],
    )
    res = validate(spark, data, shapes)
    bad = [r.focusNode for r in res.collect()]
    assert bad == [EX + "org2"]


def test_pattern(spark):
    shapes = triples_from_rows(
        spark,
        [
            (EX + "OrgShape", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "OrgShape", SH + "targetClass", iri(EX + "Organization")),
            (EX + "OrgShape", SH + "property", iri(EX + "OrgShape/p1")),
            (EX + "OrgShape/p1", SH + "path", iri(EX + "ticker")),
            (EX + "OrgShape/p1", SH + "pattern", lit_typed("^[A-Z]{1,5}$", XSD_STRING)),
        ],
    )
    data = triples_from_rows(
        spark,
        [
            (EX + "org1", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org2", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org3", RDF_TYPE, iri(EX + "Organization")),
            (EX + "org1", EX + "ticker", lit_typed("ACME", XSD_STRING)),
            (EX + "org2", EX + "ticker", lit_typed("toolongticker", XSD_STRING)),
            (EX + "org3", EX + "ticker", lit_typed("lower", XSD_STRING)),
        ],
    )
    res = validate(spark, data, shapes)
    bad = sorted(r.focusNode for r in res.collect())
    assert bad == [EX + "org2", EX + "org3"]


def test_targets_subjects_objects_nodes(spark):
    data = triples_from_rows(
        spark,
        [
            (EX + "a", EX + "worksAt", iri(EX + "org1")),
            (EX + "b", EX + "knows", iri(EX + "c")),
        ],
    )
    # targetSubjectsOf worksAt, require ex:name minCount 1 -> a violates
    shapes = triples_from_rows(
        spark,
        [
            (EX + "S1", SH + "targetSubjectsOf", iri(EX + "worksAt")),
            (EX + "S1", SH + "property", iri(EX + "S1/p")),
            (EX + "S1/p", SH + "path", iri(EX + "name")),
            (EX + "S1/p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )
    res = validate(spark, data, shapes)
    assert [r.focusNode for r in res.collect()] == [EX + "a"]

    shapes2 = triples_from_rows(
        spark,
        [
            (EX + "S2", SH + "targetObjectsOf", iri(EX + "knows")),
            (EX + "S2", SH + "property", iri(EX + "S2/p")),
            (EX + "S2/p", SH + "path", iri(EX + "name")),
            (EX + "S2/p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )
    res2 = validate(spark, data, shapes2)
    assert [r.focusNode for r in res2.collect()] == [EX + "c"]

    shapes3 = triples_from_rows(
        spark,
        [
            (EX + "S3", SH + "targetNode", iri(EX + "zzz")),
            (EX + "S3", SH + "property", iri(EX + "S3/p")),
            (EX + "S3/p", SH + "path", iri(EX + "name")),
            (EX + "S3/p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )
    res3 = validate(spark, data, shapes3)
    assert [r.focusNode for r in res3.collect()] == [EX + "zzz"]


def test_conforming_clean_data(spark):
    shapes = triples_from_rows(
        spark,
        shapes_min_count(spark, extra=[(EX + "PersonShape/p1", SH + "minCount", lit_typed("1", XSD_INTEGER))]),
    )
    data = triples_from_rows(
        spark,
        [
            (EX + "alice", RDF_TYPE, iri(EX + "Person")),
            (EX + "alice", EX + "worksAt", iri(EX + "org1")),
        ],
    )
    res = validate(spark, data, shapes)
    assert conforms(res)
    assert res.count() == 0


def test_partition_reports(spark):
    shapes = triples_from_rows(
        spark,
        shapes_min_count(spark, extra=[(EX + "PersonShape/p1", SH + "minCount", lit_typed("1", XSD_INTEGER))]),
    )
    rows = [
        (EX + "p0", RDF_TYPE, "iri", EX + "Person", None, None, None, 0),
        (EX + "p1", RDF_TYPE, "iri", EX + "Person", None, None, None, 1),
        (EX + "p1", EX + "worksAt", "iri", EX + "org1", None, None, None, 1),
    ]
    data = triples_from_rows(spark, rows)
    res = validate(spark, data, shapes)
    reports = {r.part_id: r for r in partition_reports(res, data.select("part_id")).collect()}
    assert reports[0].results_count == 1 and not reports[0].conforms
    assert reports[1].results_count == 0 and reports[1].conforms


def test_severity_and_message(spark):
    shapes = triples_from_rows(
        spark,
        shapes_min_count(
            spark,
            extra=[
                (EX + "PersonShape/p1", SH + "minCount", lit_typed("1", XSD_INTEGER)),
                (EX + "PersonShape/p1", SH + "severity", iri(SH + "Warning")),
                (EX + "PersonShape/p1", SH + "message", lit_typed("needs a job", XSD_STRING)),
            ],
        ),
    )
    res = validate(spark, _data_persons(spark), shapes)
    row = res.collect()[0]
    assert row.resultSeverity == SH + "Warning"
    assert row.resultMessage == "needs a job"


def test_deactivated_shape(spark):
    shapes = triples_from_rows(
        spark,
        shapes_min_count(
            spark,
            extra=[
                (EX + "PersonShape/p1", SH + "minCount", lit_typed("1", XSD_INTEGER)),
                (EX + "PersonShape", SH + "deactivated", lit_typed("true", "http://www.w3.org/2001/XMLSchema#boolean")),
            ],
        ),
    )
    res = validate(spark, _data_persons(spark), shapes)
    assert conforms(res)
