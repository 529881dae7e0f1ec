"""sh:not / sh:or / sh:and logical constraint components."""

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


def _list(rows, head: str, items: list[str]):
    for i, item in enumerate(items):
        node = f"{head}{i}"
        nxt = f"{head}{i + 1}" if i + 1 < len(items) else RDF_NS + "nil"
        rows.append((node, RDF_NS + "first", iri(item)))
        rows.append((node, RDF_NS + "rest", iri(nxt)))
    return f"{head}0"


def _data(spark):
    return triples_from_rows(
        spark,
        [
            ("urn:x1", RDF_TYPE, iri(EX + "T")),
            ("urn:x1", EX + "ref", iri("urn:both")),
            ("urn:x2", RDF_TYPE, iri(EX + "T")),
            ("urn:x2", EX + "ref", iri("urn:aonly")),
            ("urn:x3", RDF_TYPE, iri(EX + "T")),
            ("urn:x3", EX + "ref", iri("urn:neither")),
            # urn:both has propA and propB; urn:aonly only propA
            ("urn:both", EX + "propA", lit_typed("1")),
            ("urn:both", EX + "propB", lit_typed("1")),
            ("urn:aonly", EX + "propA", lit_typed("1")),
        ],
    )


def _shapes(spark, combinator: str):
    rows = [
        (EX + "TShape", RDF_TYPE, iri(SH + "NodeShape")),
        (EX + "TShape", SH + "targetClass", iri(EX + "T")),
        (EX + "TShape", SH + "property", iri(EX + "TShape-r")),
        (EX + "TShape-r", SH + "path", iri(EX + "ref")),
        # HasA: requires propA; HasB: requires propB
        (EX + "HasA", SH + "property", iri(EX + "HasA-p")),
        (EX + "HasA-p", SH + "path", iri(EX + "propA")),
        (EX + "HasA-p", SH + "minCount", lit_typed("1")),
        (EX + "HasB", SH + "property", iri(EX + "HasB-p")),
        (EX + "HasB-p", SH + "path", iri(EX + "propB")),
        (EX + "HasB-p", SH + "minCount", lit_typed("1")),
    ]
    if combinator == "not":
        rows.append((EX + "TShape-r", SH + "not", iri(EX + "HasB")))
    else:
        head = _list(rows, "urn:l:", [EX + "HasA", EX + "HasB"])
        rows.append((EX + "TShape-r", SH + combinator, iri(head)))
    return triples_from_rows(spark, rows)


def _viol(spark, combinator):
    res = validate(spark, _data(spark), _shapes(spark, combinator))
    return {(r.focusNode, r.value, r.sourceConstraintComponent) for r in res.collect()}


def test_sh_or(spark):
    # conforms if value has propA OR propB -> only urn:neither fails
    assert _viol(spark, "or") == {
        ("urn:x3", "urn:neither", SH + "OrConstraintComponent")
    }


def test_sh_and(spark):
    # needs BOTH -> urn:aonly and urn:neither fail
    assert _viol(spark, "and") == {
        ("urn:x2", "urn:aonly", SH + "AndConstraintComponent"),
        ("urn:x3", "urn:neither", SH + "AndConstraintComponent"),
    }


def test_sh_not(spark):
    # must NOT conform to HasB -> urn:both fails
    assert _viol(spark, "not") == {
        ("urn:x1", "urn:both", SH + "NotConstraintComponent")
    }
