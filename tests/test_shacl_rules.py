"""SHACL-AF rules: sh:TripleRule / sh:SPARQLRule expansion
(plans/rules.py), mirroring pySHACL's advanced-mode rule semantics —
ordered execution with sequential visibility, sh:condition conformance
filtering, and iterate_rules fixpoint."""

from __future__ import annotations

import pytest

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    SH,
    XSD_INTEGER,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.rules import apply_rules, compile_rules
from cmem_plugin_pyshacl_spark.plans.shacl import validate


def _family(spark):
    return triples_from_rows(
        spark,
        [
            ("urn:ann", RDF_TYPE, iri(EX + "Person")),
            ("urn:ann", EX + "parentOf", iri("urn:bob")),
            ("urn:bob", RDF_TYPE, iri(EX + "Person")),
            ("urn:bob", EX + "parentOf", iri("urn:cal")),
            ("urn:cal", RDF_TYPE, iri(EX + "Person")),
            ("urn:cal", EX + "parentOf", iri("urn:dee")),
            ("urn:dee", RDF_TYPE, iri(EX + "Person")),
            ("urn:ann", EX + "age", lit_typed("70", XSD_INTEGER)),
        ],
    )


def _triple_rule_shapes(spark, extra_rows=()):
    rows = [
        (EX + "RuleShape", RDF_TYPE, iri(SH + "NodeShape")),
        (EX + "RuleShape", SH + "targetClass", iri(EX + "Person")),
        (EX + "RuleShape", SH + "rule", iri("urn:rule:agent")),
        ("urn:rule:agent", RDF_TYPE, iri(SH + "TripleRule")),
        ("urn:rule:agent", SH + "subject", iri(SH + "this")),
        ("urn:rule:agent", SH + "predicate", iri(RDF_TYPE)),
        ("urn:rule:agent", SH + "object", iri(EX + "Agent")),
        *extra_rows,
    ]
    return triples_from_rows(spark, rows)


def test_triple_rule_this_and_constants(spark):
    """SHACL-AF §8.1: every Person is typed ex:Agent."""
    out = apply_rules(spark, _family(spark), _triple_rule_shapes(spark))
    inferred = out.filter(
        (out.p == RDF_TYPE) & (out.o_value == EX + "Agent")
    ).collect()
    assert {r.s for r in inferred} == {"urn:ann", "urn:bob", "urn:cal", "urn:dee"}
    # lineage: inferred rows carry the focus node's part_id
    assert all(r.part_id is not None for r in inferred)


def test_triple_rule_is_idempotent(spark):
    """Re-applying adds nothing (term-identity anti-join vs existing)."""
    once = apply_rules(spark, _family(spark), _triple_rule_shapes(spark))
    twice = apply_rules(spark, once, _triple_rule_shapes(spark))
    assert twice.count() == once.count()


def test_triple_rule_path_object(spark):
    """sh:object [sh:path ex:parentOf] — one triple per path value."""
    shapes = triples_from_rows(
        spark,
        [
            (EX + "RS", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "RS", SH + "targetClass", iri(EX + "Person")),
            (EX + "RS", SH + "rule", iri("urn:rule:child")),
            ("urn:rule:child", RDF_TYPE, iri(SH + "TripleRule")),
            ("urn:rule:child", SH + "subject", iri(SH + "this")),
            ("urn:rule:child", SH + "predicate", iri(EX + "hasChild")),
            ("urn:rule:child", SH + "object", iri("urn:expr:p")),
            ("urn:expr:p", SH + "path", iri(EX + "parentOf")),
        ],
    )
    out = apply_rules(spark, _family(spark), shapes)
    pairs = {
        (r.s, r.o_value)
        for r in out.filter(out.p == EX + "hasChild").collect()
    }
    assert pairs == {
        ("urn:ann", "urn:bob"), ("urn:bob", "urn:cal"), ("urn:cal", "urn:dee")
    }


def test_sparql_rule_construct_with_prefix(spark):
    """sh:SPARQLRule: grandparent derivation through a 2-pattern BGP,
    prefixed names expanded from an inline PREFIX declaration."""
    construct = (
        f"PREFIX ex: <{EX}> "
        "CONSTRUCT { $this ex:grandparentOf ?gc } "
        "WHERE { $this ex:parentOf ?c . ?c ex:parentOf ?gc }"
    )
    shapes = triples_from_rows(
        spark,
        [
            (EX + "RS", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "RS", SH + "targetClass", iri(EX + "Person")),
            (EX + "RS", SH + "rule", iri("urn:rule:gp")),
            ("urn:rule:gp", RDF_TYPE, iri(SH + "SPARQLRule")),
            ("urn:rule:gp", SH + "construct", lit_typed(construct)),
        ],
    )
    out = apply_rules(spark, _family(spark), shapes)
    pairs = {
        (r.s, r.o_value)
        for r in out.filter(out.p == EX + "grandparentOf").collect()
    }
    assert pairs == {("urn:ann", "urn:cal"), ("urn:bob", "urn:dee")}


def test_sparql_rule_sh_prefixes_declaration(spark):
    """SHACL-AF §5.2: prefixes come from sh:prefixes/sh:declare in the
    shapes graph instead of inline PREFIX."""
    construct = (
        "CONSTRUCT { $this ex:senior \"true\" } "
        "WHERE { $this ex:age ?a . FILTER (?a >= 65) }"
    )
    shapes = triples_from_rows(
        spark,
        [
            (EX + "RS", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "RS", SH + "targetClass", iri(EX + "Person")),
            (EX + "RS", SH + "rule", iri("urn:rule:senior")),
            ("urn:rule:senior", RDF_TYPE, iri(SH + "SPARQLRule")),
            ("urn:rule:senior", SH + "construct", lit_typed(construct)),
            ("urn:rule:senior", SH + "prefixes", iri("urn:ont")),
            ("urn:ont", SH + "declare", iri("urn:decl:ex")),
            ("urn:decl:ex", SH + "prefix", lit_typed("ex")),
            ("urn:decl:ex", SH + "namespace", lit_typed(EX)),
        ],
    )
    out = apply_rules(spark, _family(spark), shapes)
    rows = out.filter(out.p == EX + "senior").collect()
    assert {r.s for r in rows} == {"urn:ann"}
    assert rows[0].o_kind == "literal"


def test_rule_condition_filters_focus(spark):
    """sh:condition: only focus nodes conforming to the (inline, untyped)
    condition shape fire the rule — here, persons with an age."""
    shapes = triples_from_rows(
        spark,
        [
            (EX + "RS", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "RS", SH + "targetClass", iri(EX + "Person")),
            (EX + "RS", SH + "rule", iri("urn:rule:aged")),
            ("urn:rule:aged", RDF_TYPE, iri(SH + "TripleRule")),
            ("urn:rule:aged", SH + "subject", iri(SH + "this")),
            ("urn:rule:aged", SH + "predicate", iri(RDF_TYPE)),
            ("urn:rule:aged", SH + "object", iri(EX + "Aged")),
            ("urn:rule:aged", SH + "condition", iri("urn:cond:hasAge")),
            ("urn:cond:hasAge", SH + "property", iri("urn:cond:hasAge:p")),
            ("urn:cond:hasAge:p", SH + "path", iri(EX + "age")),
            ("urn:cond:hasAge:p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )
    out = apply_rules(spark, _family(spark), shapes)
    aged = {r.s for r in out.filter(out.o_value == EX + "Aged").collect()}
    assert aged == {"urn:ann"}


def test_sequential_visibility_within_one_pass(spark):
    """pySHACL executes rules in sh:order with later rules seeing earlier
    inferences: rule1 infers ex:Alpha typing, rule2 targets ex:Alpha."""
    shapes = triples_from_rows(
        spark,
        [
            (EX + "R1", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "R1", SH + "targetClass", iri(EX + "Person")),
            (EX + "R1", SH + "rule", iri("urn:rule:alpha")),
            ("urn:rule:alpha", RDF_TYPE, iri(SH + "TripleRule")),
            ("urn:rule:alpha", SH + "subject", iri(SH + "this")),
            ("urn:rule:alpha", SH + "predicate", iri(RDF_TYPE)),
            ("urn:rule:alpha", SH + "object", iri(EX + "Alpha")),
            # R2 sorts after R1 (shape-id order) and targets the class R1
            # is still inferring
            (EX + "R2", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "R2", SH + "targetClass", iri(EX + "Alpha")),
            (EX + "R2", SH + "rule", iri("urn:rule:beta")),
            ("urn:rule:beta", RDF_TYPE, iri(SH + "TripleRule")),
            ("urn:rule:beta", SH + "subject", iri(SH + "this")),
            ("urn:rule:beta", SH + "predicate", iri(RDF_TYPE)),
            ("urn:rule:beta", SH + "object", iri(EX + "Beta")),
        ],
    )
    out = apply_rules(spark, _family(spark), shapes)
    beta = {r.s for r in out.filter(out.o_value == EX + "Beta").collect()}
    assert beta == {"urn:ann", "urn:bob", "urn:cal", "urn:dee"}


def test_iterate_rules_fixpoint_transitive(spark):
    """iterate=True repeats passes to a fixpoint: ancestorOf closure over
    a parentOf chain of length 3 needs two rounds."""
    ex = EX
    shapes = triples_from_rows(
        spark,
        [
            (EX + "RS", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "RS", SH + "targetClass", iri(EX + "Person")),
            (EX + "RS", SH + "rule", iri("urn:rule:anc1")),
            ("urn:rule:anc1", RDF_TYPE, iri(SH + "SPARQLRule")),
            ("urn:rule:anc1", SH + "order", lit_typed("0", XSD_INTEGER)),
            (
                "urn:rule:anc1",
                SH + "construct",
                lit_typed(
                    "CONSTRUCT { $this <%sancestorOf> ?a } "
                    "WHERE { $this <%sparentOf> ?a }" % (ex, ex)
                ),
            ),
            (EX + "RS", SH + "rule", iri("urn:rule:anc2")),
            ("urn:rule:anc2", RDF_TYPE, iri(SH + "SPARQLRule")),
            ("urn:rule:anc2", SH + "order", lit_typed("1", XSD_INTEGER)),
            (
                "urn:rule:anc2",
                SH + "construct",
                lit_typed(
                    "CONSTRUCT { $this <%sancestorOf> ?b } "
                    "WHERE { $this <%sancestorOf> ?a . ?a <%sancestorOf> ?b }"
                    % (ex, ex, ex)
                ),
            ),
        ],
    )
    out = apply_rules(spark, _family(spark), shapes, iterate=True)
    anc = {
        (r.s, r.o_value)
        for r in out.filter(out.p == EX + "ancestorOf").collect()
    }
    assert anc == {
        ("urn:ann", "urn:bob"), ("urn:ann", "urn:cal"), ("urn:ann", "urn:dee"),
        ("urn:bob", "urn:cal"), ("urn:bob", "urn:dee"),
        ("urn:cal", "urn:dee"),
    }


def test_deactivated_rule_skipped(spark):
    shapes = _triple_rule_shapes(
        spark,
        extra_rows=[("urn:rule:agent", SH + "deactivated", lit_typed("true"))],
    )
    out = apply_rules(spark, _family(spark), shapes)
    assert out.filter(out.o_value == EX + "Agent").count() == 0


def test_unsupported_rule_type_raises(spark):
    shapes = triples_from_rows(
        spark,
        [
            (EX + "RS", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "RS", SH + "targetClass", iri(EX + "Person")),
            (EX + "RS", SH + "rule", iri("urn:rule:js")),
            ("urn:rule:js", RDF_TYPE, iri(SH + "JSRule")),
        ],
    )
    with pytest.raises(ValueError, match="sh:rule type"):
        apply_rules(spark, _family(spark), shapes)


def test_rules_run_inside_validate_advanced(spark):
    """validate(advanced=True) expands rules BEFORE constraint checking:
    a maxCount 0 on rdf:type-of-Agent only fires on inferred typings."""
    shapes = triples_from_rows(
        spark,
        [
            *[
                r
                for r in [
                    (EX + "RuleShape", RDF_TYPE, iri(SH + "NodeShape")),
                    (EX + "RuleShape", SH + "targetClass", iri(EX + "Person")),
                    (EX + "RuleShape", SH + "rule", iri("urn:rule:agent")),
                    ("urn:rule:agent", RDF_TYPE, iri(SH + "TripleRule")),
                    ("urn:rule:agent", SH + "subject", iri(SH + "this")),
                    ("urn:rule:agent", SH + "predicate", iri(RDF_TYPE)),
                    ("urn:rule:agent", SH + "object", iri(EX + "Agent")),
                    # validation half: Agents must have an age
                    (EX + "AgentShape", RDF_TYPE, iri(SH + "NodeShape")),
                    (EX + "AgentShape", SH + "targetClass", iri(EX + "Agent")),
                    (EX + "AgentShape", SH + "property", iri("urn:as:p")),
                    ("urn:as:p", SH + "path", iri(EX + "age")),
                    ("urn:as:p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
                ]
            ],
        ],
    )
    res = validate(spark, _family(spark), shapes, advanced=True)
    missing_age = {r.focusNode for r in res.collect()}
    # without rules there are NO ex:Agent instances at all; with expansion
    # everyone but ann (who has an age) violates
    assert missing_age == {"urn:bob", "urn:cal", "urn:dee"}
    assert validate(spark, _family(spark), shapes).count() == 0


def test_compile_rules_orders_by_sh_order(spark):
    shapes = triples_from_rows(
        spark,
        [
            (EX + "RS", SH + "rule", iri("urn:r:b")),
            (EX + "RS", SH + "targetClass", iri(EX + "Person")),
            ("urn:r:b", RDF_TYPE, iri(SH + "TripleRule")),
            ("urn:r:b", SH + "subject", iri(SH + "this")),
            ("urn:r:b", SH + "predicate", iri(RDF_TYPE)),
            ("urn:r:b", SH + "object", iri(EX + "B")),
            ("urn:r:b", SH + "order", lit_typed("2", XSD_INTEGER)),
            (EX + "RS", SH + "rule", iri("urn:r:a")),
            ("urn:r:a", RDF_TYPE, iri(SH + "TripleRule")),
            ("urn:r:a", SH + "subject", iri(SH + "this")),
            ("urn:r:a", SH + "predicate", iri(RDF_TYPE)),
            ("urn:r:a", SH + "object", iri(EX + "A")),
            ("urn:r:a", SH + "order", lit_typed("1", XSD_INTEGER)),
        ],
    )
    rows = shapes.select("s", "p", "o_kind", "o_value", "o_datatype", "o_lang").collect()
    rules = compile_rules(rows)[EX + "RS"]
    assert [r.rule_id for r in rules] == ["urn:r:a", "urn:r:b"]


def test_sparql_rule_uses_declared_function(spark):
    """SHACL-AF §7 functions expand inside sh:SPARQLRule bodies too."""
    from cmem_plugin_pyshacl_spark.data_model import XSD_INTEGER

    data = triples_from_rows(
        spark,
        [
            ("urn:a", RDF_TYPE, iri(EX + "T")),
            ("urn:a", EX + "n", lit_typed("6", XSD_INTEGER)),
        ],
    )
    construct = (
        f"CONSTRUCT {{ $this <{EX}dbl> ?d }} WHERE {{ "
        f"$this <{EX}n> ?n . BIND (<{EX}double>(?n) AS ?d) }}"
    )
    shapes = triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "T")),
            (EX + "S", SH + "rule", iri("urn:r1")),
            ("urn:r1", RDF_TYPE, iri(SH + "SPARQLRule")),
            ("urn:r1", SH + "construct", lit_typed(construct)),
            (EX + "double", RDF_TYPE, iri(SH + "SPARQLFunction")),
            (
                EX + "double",
                SH + "select",
                lit_typed("SELECT (?v * 2 AS ?out) WHERE {}"),
            ),
            (EX + "double", SH + "parameter", iri("urn:fp0")),
            ("urn:fp0", SH + "path", iri(EX + "v")),
        ],
    )
    out = apply_rules(spark, data, shapes)
    inferred = {
        (r.s, r.p, r.o_value)
        for r in out.collect()
        if r.p == EX + "dbl"
    }
    assert inferred == {("urn:a", EX + "dbl", "12.0")} or inferred == {
        ("urn:a", EX + "dbl", "12")
    }
