"""Standalone SPARQL query surface (plans/query.py): SELECT / ASK /
CONSTRUCT / DESCRIBE over a triples DataFrame, plus the evaluator
features it leans on (variable predicates, repeated-variable patterns,
SELECT *)."""

from __future__ import annotations

import pytest

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    XSD,
    XSD_INTEGER,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.query import (
    sparql_ask,
    sparql_construct,
    sparql_describe,
    sparql_select,
    sparql_update,
)

FOAF = "http://xmlns.com/foaf/0.1/"


@pytest.fixture(scope="module")
def graph(spark):
    return triples_from_rows(
        spark,
        [
            ("urn:alice", RDF_TYPE, iri(EX + "Person")),
            ("urn:alice", EX + "age", lit_typed("17", XSD_INTEGER)),
            ("urn:alice", EX + "knows", iri("urn:bob")),
            ("urn:alice", EX + "name", lit_typed("Alice")),
            ("urn:bob", RDF_TYPE, iri(EX + "Person")),
            ("urn:bob", EX + "age", lit_typed("42", XSD_INTEGER)),
            ("urn:bob", EX + "knows", iri("urn:carol")),
            ("urn:carol", RDF_TYPE, iri(EX + "Person")),
            ("urn:carol", EX + "knows", iri("urn:carol")),  # self-loop
            ("urn:carol", EX + "name", lit_typed("17")),  # same lexical, string
            ("urn:d", RDF_TYPE, iri(EX + "Robot")),
        ],
    )


# ------------------------------------------------------------- SELECT


def test_select_bgp_filter(spark, graph):
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?p WHERE {{
            ?p a <{EX}Person> .
            ?p <{EX}age> ?a .
            FILTER(?a > 18)
        }}""",
    )
    assert out.columns == ["p"]
    assert [r["p"] for r in out.collect()] == ["urn:bob"]


def test_select_prefix_prologue(spark, graph):
    out = sparql_select(
        spark,
        graph,
        f"""PREFIX ex: <{EX}>
        SELECT ?p WHERE {{ ?p ex:knows ?p . ?p a ex:Person . }}""",
    )
    assert [r["p"] for r in out.collect()] == ["urn:carol"]


def test_select_unbound_projection(spark, graph):
    with pytest.raises(ValueError, match="is not bound"):
        sparql_select(
            spark, graph, f"SELECT ?n WHERE {{ ?p <{EX}knows> ?p }}"
        )


def test_select_prefix_undeclared(spark, graph):
    with pytest.raises(ValueError, match="undeclared prefix"):
        sparql_select(spark, graph, "SELECT ?x WHERE { ?x foaf:name ?n }")


def test_select_rejects_this(spark, graph):
    with pytest.raises(ValueError, match="only bound inside"):
        sparql_select(
            spark, graph, f"SELECT ?x WHERE {{ $this <{EX}knows> ?x }}"
        )


def test_select_star(spark, graph):
    out = sparql_select(
        spark, graph, f"SELECT * WHERE {{ ?s <{EX}knows> ?o }}"
    )
    assert sorted(out.columns) == ["o", "s"]
    assert out.count() == 3


def test_select_var_predicate(spark, graph):
    out = sparql_select(
        spark, graph, "SELECT ?p ?o WHERE { <urn:alice> ?p ?o }"
    )
    rows = {(r["p"], r["o"]) for r in out.collect()}
    assert (EX + "age", "17") in rows
    assert (RDF_TYPE, EX + "Person") in rows
    assert len(rows) == 4


def test_select_distinct_term_identity(spark, graph):
    # "17"^^xsd:integer (alice age) and "17" plain string (carol name)
    # share a lexical form but are distinct RDF terms
    out = sparql_select(
        spark,
        graph,
        "SELECT DISTINCT ?v WHERE { ?s ?p ?v . FILTER(str(?v) = \"17\") }",
        include_term_columns=True,
    )
    assert out.count() == 2
    assert {r["v_datatype"] for r in out.collect()} == {
        XSD + "integer",
        # the surface normalizes simple literals to xsd:string (RDF 1.1)
        XSD + "string",
    }


def test_select_aggregate_order_limit(spark, graph):
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s ?p ?o }}
            GROUP BY ?s ORDER BY DESC(?n) ?s LIMIT 2""",
    )
    rows = [(r["s"], r["n"]) for r in out.collect()]
    assert rows == [("urn:alice", "4"), ("urn:bob", "3")]


def test_select_optional_minus(spark, graph):
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?p ?n WHERE {{
            ?p a <{EX}Person> .
            OPTIONAL {{ ?p <{EX}name> ?n }}
        }}""",
    )
    by_p = {r["p"]: r["n"] for r in out.collect()}
    assert by_p == {"urn:alice": "Alice", "urn:bob": None, "urn:carol": "17"}


def test_select_self_loop(spark, graph):
    out = sparql_select(
        spark, graph, f"SELECT ?x WHERE {{ ?x <{EX}knows> ?x }}"
    )
    assert [r["x"] for r in out.collect()] == ["urn:carol"]


def test_select_offset_pagination(spark, graph):
    base = f"SELECT ?s WHERE {{ ?s a <{EX}Person> }} ORDER BY ?s"
    page1 = sparql_select(spark, graph, base + " LIMIT 2")
    page2 = sparql_select(spark, graph, base + " LIMIT 2 OFFSET 2")
    assert [r["s"] for r in page1.collect()] == ["urn:alice", "urn:bob"]
    assert [r["s"] for r in page2.collect()] == ["urn:carol"]
    # OFFSET-before-LIMIT order also parses
    page2b = sparql_select(spark, graph, base + " OFFSET 1 LIMIT 1")
    assert [r["s"] for r in page2b.collect()] == ["urn:bob"]
    with pytest.raises(ValueError, match="nondeterministic"):
        sparql_select(
            spark, graph, f"SELECT ?s WHERE {{ ?s a <{EX}Person> }} OFFSET 1"
        )


def test_group_by_expression(spark, graph):
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?band (COUNT(?p) AS ?n) WHERE {{ ?p <{EX}age> ?a }}
            GROUP BY (IF(?a >= 18, "adult", "minor") AS ?band)""",
    )
    rows = sorted((r["band"], r["n"]) for r in out.collect())
    assert rows == [("adult", "1"), ("minor", "1")]


def test_group_by_expression_mixed_with_var(spark, graph):
    # expression key alongside a plain var key
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?p ?tall (COUNT(?o) AS ?n)
            WHERE {{ ?p a <{EX}Person> . ?p <{EX}knows> ?o }}
            GROUP BY ?p (STRLEN(STR(?p)) > 7 AS ?tall)""",
    )
    rows = sorted((r["p"], r["tall"], r["n"]) for r in out.collect())
    assert rows == [
        ("urn:alice", "true", "1"),
        ("urn:bob", "false", "1"),
        ("urn:carol", "true", "1"),
    ]


def test_group_by_expression_over_union(spark, graph):
    # a pure-UNION body gets wrapped so the key bind sees the union
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?k (COUNT(*) AS ?n) WHERE {{
            {{ ?s a <{EX}Person> }} UNION {{ ?s a <{EX}Robot> }}
        }} GROUP BY (SUBSTR(STR(?s), 1, 4) AS ?k)""",
    )
    assert [(r["k"], r["n"]) for r in out.collect()] == [("urn:", "4")]


def test_bind_boolean_expression(spark, graph):
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?p ?adult WHERE {{
            ?p <{EX}age> ?a . BIND(?a >= 18 AS ?adult)
        }}""",
    )
    assert {(r["p"], r["adult"]) for r in out.collect()} == {
        ("urn:alice", "false"),
        ("urn:bob", "true"),
    }


def test_group_by_expression_must_be_named(spark, graph):
    with pytest.raises(ValueError, match="must be named"):
        sparql_select(
            spark,
            graph,
            f"SELECT ?s WHERE {{ ?s <{EX}age> ?a }} GROUP BY (STR(?a))",
        )


def test_select_star_group_by_rejected(spark, graph):
    with pytest.raises(ValueError, match="SELECT \\*"):
        sparql_select(
            spark,
            graph,
            "SELECT * WHERE { ?s ?p ?o } GROUP BY ?s",
        )


# ---------------------------------------------------------------- ASK


def test_ask(spark, graph):
    assert sparql_ask(
        spark, graph, f"ASK {{ ?x <{EX}knows> ?x }}"
    )
    assert not sparql_ask(
        spark, graph, f"ASK {{ <urn:d> <{EX}knows> ?x }}"
    )


# ---------------------------------------------------------- CONSTRUCT


def test_construct(spark, graph):
    out = sparql_construct(
        spark,
        graph,
        f"""CONSTRUCT {{ ?b <{EX}knownBy> ?a . ?a a <{EX}Knower> . }}
            WHERE {{ ?a <{EX}knows> ?b }}""",
    )
    rows = {(r["s"], r["p"], r["o_value"]) for r in out.collect()}
    assert ("urn:bob", EX + "knownBy", "urn:alice") in rows
    assert ("urn:alice", RDF_TYPE, EX + "Knower") in rows
    # carol self-loop constructs both triples for carol
    assert ("urn:carol", EX + "knownBy", "urn:carol") in rows
    assert len(rows) == 6


def test_construct_spo_copy(spark, graph):
    # the CONSTRUCT { ?s ?p ?o } WHERE { ?s ?p ?o } graph-copy idiom
    out = sparql_construct(
        spark,
        graph,
        f"""CONSTRUCT {{ ?s ?p ?o }}
            WHERE {{ ?s ?p ?o . ?s a <{EX}Person> . }}""",
    )
    assert out.count() == 10  # everything except urn:d's type triple
    assert out.filter(out.s == "urn:d").count() == 0


def test_construct_where_shorthand(spark, graph):
    out = sparql_construct(
        spark, graph, f"CONSTRUCT WHERE {{ ?s <{EX}knows> ?o }}"
    )
    rows = {(r["s"], r["o_value"]) for r in out.collect()}
    assert rows == {
        ("urn:alice", "urn:bob"),
        ("urn:bob", "urn:carol"),
        ("urn:carol", "urn:carol"),
    }
    with pytest.raises(ValueError, match="paths are not allowed"):
        sparql_construct(
            spark,
            graph,
            f"CONSTRUCT WHERE {{ ?s <{EX}knows>/<{EX}name> ?n }}",
        )


def test_construct_set_semantics(spark, graph):
    out = sparql_construct(
        spark,
        graph,
        f"""CONSTRUCT {{ ?s a <{EX}Subject> }} WHERE {{ ?s ?p ?o }}""",
    )
    # 4 distinct subjects, each asserted once despite multiple solutions
    assert out.count() == 4


# ----------------------------------------------------------- DESCRIBE


def test_describe_iri(spark, graph):
    out = sparql_describe(spark, graph, "DESCRIBE <urn:alice>")
    assert out.count() == 4
    assert {r["s"] for r in out.collect()} == {"urn:alice"}


def test_describe_where(spark, graph):
    out = sparql_describe(
        spark,
        graph,
        f"""DESCRIBE ?p WHERE {{ ?p <{EX}age> ?a . FILTER(?a > 18) }}""",
    )
    assert {r["s"] for r in out.collect()} == {"urn:bob"}
    assert out.count() == 3


def test_describe_bnode_closure(spark):
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        ("urn:x", EX + "addr", ("_:b1", "bnode", None, None)),
        ("_:b1", EX + "city", lit_typed("Berlin")),
        ("_:b1", EX + "geo", ("_:b2", "bnode", None, None)),
        ("_:b2", EX + "lat", lit_typed("52.5")),
    ]
    spark_df = triples_from_rows(spark, rows)
    out = sparql_describe(spark, spark_df, "DESCRIBE <urn:x>")
    assert out.count() == 4  # follows bnodes two hops deep


def test_update_insert_data(spark, graph):
    out = sparql_update(
        spark,
        graph,
        f"""INSERT DATA {{
            <urn:e> a <{EX}Person> .
            <urn:e> <{EX}age> "30" .
            <urn:alice> a <{EX}Person> .
        }}""",
    )
    assert out.count() == 13  # 11 + 2 new; re-insert of alice's type = no-op
    assert out.filter(out.s == "urn:e").count() == 2
    # existing rows keep their part_id lineage untouched
    alice_type = out.filter(
        (out.s == "urn:alice") & (out.p == RDF_TYPE)
    ).collect()
    assert len(alice_type) == 1


def test_update_delete_data(spark, graph):
    out = sparql_update(
        spark,
        graph,
        f'DELETE DATA {{ <urn:carol> <{EX}name> "17" . }}',
    )
    assert out.count() == 10
    assert out.filter((out.s == "urn:carol") & (out.p == EX + "name")).count() == 0
    # the integer "17" (alice age) survives: term identity, not lexical
    assert out.filter(out.o_value == "17").count() == 1


def test_update_delete_where(spark, graph):
    out = sparql_update(
        spark, graph, f"DELETE WHERE {{ ?s <{EX}knows> ?o }}"
    )
    assert out.count() == 8
    assert out.filter(out.p == EX + "knows").count() == 0


def test_update_delete_insert_where(spark, graph):
    # rename a predicate: the modify idiom
    out = sparql_update(
        spark,
        graph,
        f"""DELETE {{ ?s <{EX}name> ?n }}
            INSERT {{ ?s <{EX}label> ?n }}
            WHERE {{ ?s <{EX}name> ?n }}""",
    )
    assert out.count() == 11
    assert out.filter(out.p == EX + "name").count() == 0
    rows = {
        (r["s"], r["o_value"])
        for r in out.filter(out.p == EX + "label").collect()
    }
    assert rows == {("urn:alice", "Alice"), ("urn:carol", "17")}


def test_update_insert_where_filter(spark, graph):
    out = sparql_update(
        spark,
        graph,
        f"""INSERT {{ ?p a <{EX}Adult> }}
            WHERE {{ ?p <{EX}age> ?a . FILTER(?a >= 18) }}""",
    )
    adults = [r["s"] for r in out.filter(out.o_value == EX + "Adult").collect()]
    assert adults == ["urn:bob"]


def test_update_delete_where_rejects_paths(spark, graph):
    # a sequence path would silently delete desugared intermediate hops
    with pytest.raises(ValueError, match="paths are not allowed"):
        sparql_update(
            spark,
            graph,
            f"DELETE WHERE {{ ?s <{EX}knows>/<{EX}name> ?n }}",
        )


def test_var_predicate_bound_literal_no_match(spark):
    # a literal binding whose lexical form is an IRI must NOT match a
    # predicate slot (predicates are IRIs; term matching is value+kind)
    rows = [
        ("urn:a", EX + "p", lit_typed(EX + "q")),
        ("urn:s2", EX + "q", iri("urn:y")),
    ]
    data = triples_from_rows(spark, rows)
    out = sparql_select(
        spark,
        data,
        f"SELECT ?s2 WHERE {{ <urn:a> <{EX}p> ?x . ?s2 ?x ?o2 }}",
    )
    assert out.count() == 0


def test_construct_plain_literal_normalized(spark):
    # a var-copied plain literal and a quoted template constant are the
    # same RDF term (simple literal = xsd:string) — one row, not two
    data = triples_from_rows(
        spark, [("urn:1", EX + "v", lit_typed("x"))]
    )
    out = sparql_construct(
        spark,
        data,
        f'CONSTRUCT {{ ?s <{EX}w> "x" . ?s <{EX}w> ?o }} '
        f"WHERE {{ ?s <{EX}v> ?o }}",
    )
    assert out.count() == 1
    assert out.collect()[0]["o_datatype"] == XSD + "string"


def test_describe_max_hops_validation(spark, graph):
    with pytest.raises(ValueError, match="max_hops"):
        sparql_describe(spark, graph, "DESCRIBE <urn:alice>", max_hops=0)


def test_update_ground_violation(spark, graph):
    with pytest.raises(ValueError, match="ground"):
        sparql_update(spark, graph, "INSERT DATA { ?s a <urn:C> }")
    with pytest.raises(ValueError, match="unsupported update"):
        sparql_update(spark, graph, "REIFY { <urn:a> a <urn:C> }")
    # LOAD is a real operation now — an unreadable IRI fails in the
    # reader (format sniff), not the parser
    with pytest.raises(ValueError, match="cannot infer RDF format"):
        sparql_update(spark, graph, "LOAD <urn:x>")
    assert sparql_update(spark, graph, "LOAD SILENT <urn:x>").count() == graph.count()


def test_select_pushes_constant_predicate_to_scan(spark, tmp_path):
    """Scale posture: a BGP whose patterns carry constant predicates must
    reach the parquet scan as a pushed `p = <iri>` filter — the query
    reads predicate slices, not the whole relation."""
    rows = [
        ("urn:a", EX + "age", lit_typed("17", XSD_INTEGER)),
        ("urn:a", EX + "name", lit_typed("Alice")),
    ]
    path = str(tmp_path / "tri.parquet")
    triples_from_rows(spark, rows).write.mode("overwrite").parquet(path)
    tri = spark.read.parquet(path)
    out = sparql_select(
        spark, tri, f"SELECT ?s ?v WHERE {{ ?s <{EX}age> ?v }}"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "IsNotNull(p)" in plan or "EqualTo(p," in plan
    assert [r["s"] for r in out.collect()] == ["urn:a"]


def test_describe_literal_bindings_skipped(spark, graph):
    out = sparql_describe(
        spark,
        graph,
        f"DESCRIBE ?v WHERE {{ <urn:alice> <{EX}name> ?v }}",
    )
    assert out.count() == 0


def test_predicate_object_and_object_lists(spark, graph):
    """Turtle-style `;` and `,` abbreviations in graph patterns."""
    out = sparql_select(
        spark,
        graph,
        f"""SELECT ?p ?n WHERE {{
            ?p a <{EX}Person> ; <{EX}name> ?n .
        }}""",
    )
    assert sorted(tuple(r) for r in out.collect()) == [
        ("urn:alice", "Alice"),
        ("urn:carol", "17"),
    ]
    out = sparql_select(
        spark,
        graph,
        f"SELECT ?s WHERE {{ ?s <{EX}knows> <urn:bob> , <urn:carol> }}",
    )
    # object list = conjunction: who knows BOTH bob and carol? nobody
    assert out.count() == 0
    out = sparql_select(
        spark,
        graph,
        f"SELECT ?s WHERE {{ ?s <{EX}knows> ?k ; a <{EX}Person> , <{EX}Person> }}",
    )
    assert out.count() == 3


def test_object_list_with_path_reemits_fresh_hops(spark, graph):
    out = sparql_select(
        spark,
        graph,
        f"SELECT ?s WHERE {{ ?s <{EX}knows>/<{EX}knows> <urn:carol> , <urn:carol> }}",
    )
    # alice→bob→carol, bob→carol→carol (self-loop), carol→carol→carol
    assert sorted({r["s"] for r in out.collect()}) == [
        "urn:alice", "urn:bob", "urn:carol",
    ]


def test_dangling_comma_rejected(spark, graph):
    # a ',' before any complete statement has no (subject, path) to repeat
    with pytest.raises(ValueError, match="unsupported graph pattern"):
        sparql_select(spark, graph, f"SELECT ?s WHERE {{ ?s <{EX}p> , <urn:x> }}")
    with pytest.raises(ValueError, match="object-list continuation"):
        sparql_select(
            spark, graph, f"SELECT ?s WHERE {{ ?s <{EX}p> <urn:x> , , <urn:y> }}"
        )


def test_blank_node_property_lists(spark, graph):
    """Turtle-style [ ... ] in patterns = fresh non-distinguished vars."""
    out = sparql_select(
        spark,
        graph,
        f'SELECT ?s WHERE {{ ?s <{EX}knows> [ <{EX}knows> <urn:carol> ] }}',
    )
    assert sorted({r["s"] for r in out.collect()}) == [
        "urn:alice", "urn:bob", "urn:carol",
    ]
    # subject position + predicate-object list inside the brackets
    out = sparql_select(
        spark,
        graph,
        f'SELECT ?n WHERE {{ [ a <{EX}Person> ; <{EX}name> ?n ] <{EX}age> ?a }}',
    )
    assert [r["n"] for r in out.collect()] == ["Alice"]
    # anonymous [] matches any object
    assert sparql_ask(spark, graph, f"ASK {{ <urn:d> a [] }}")


def test_select_star_hides_internal_desugar_vars(spark, graph):
    """`SELECT *` must not leak `_seq` path hops or `_bp` bnode-list
    variables — SPARQL never projects pattern bnodes."""
    out = sparql_select(
        spark,
        graph,
        f"SELECT * WHERE {{ ?s <{EX}knows>/<{EX}knows> ?o }}",
    )
    assert sorted(out.columns) == ["o", "s"]
    out = sparql_select(
        spark, graph, f"SELECT * WHERE {{ ?s <{EX}knows> [ a <{EX}Person> ] }}"
    )
    assert out.columns == ["s"]


def test_optional_subquery_aggregate(spark):
    """A subquery is legal INSIDE an OPTIONAL group: outer rows keep
    their bindings, the aggregate joins where its key matches, and
    non-matching rows get an unbound ?n."""
    from cmem_plugin_pyshacl_spark.data_model import lit_typed

    XSDI = "http://www.w3.org/2001/XMLSchema#integer"
    data = triples_from_rows(spark, [
        ("urn:a", EX + "p", iri("urn:x")),
        ("urn:b", EX + "p", iri("urn:y")),
        ("urn:x", EX + "v", lit_typed("1", XSDI)),
        ("urn:x", EX + "v", lit_typed("2", XSDI)),
    ])
    out = sparql_select(
        spark,
        data,
        f"SELECT ?s ?n WHERE {{ ?s <{EX}p> ?o . OPTIONAL {{ "
        f"{{ SELECT ?o (SUM(?w) AS ?n) WHERE {{ ?o <{EX}v> ?w }} "
        f"GROUP BY ?o }} }} }}",
    )
    assert sorted((r.s, r.n) for r in out.collect()) == [
        ("urn:a", "3.0"), ("urn:b", None),
    ]


def test_minus_subquery(spark):
    """A subquery as the MINUS group: solutions whose shared vars match a
    subquery row are removed."""
    data = triples_from_rows(spark, [
        ("urn:a", EX + "p", iri("urn:x")),
        ("urn:b", EX + "p", iri("urn:y")),
    ])
    out = sparql_select(
        spark,
        data,
        f"SELECT ?s WHERE {{ ?s <{EX}p> ?o . MINUS {{ "
        f"{{ SELECT ?s WHERE {{ ?s <{EX}p> <urn:x> }} }} }} }}",
    )
    assert sorted(r.s for r in out.collect()) == ["urn:b"]


# ---------------------------------------------------------------- BGP order


def test_order_patterns_selectivity_and_chaining():
    """_order_patterns picks the most selective pattern first, then chains
    through shared variables: constants beat unbound vars, an unbound
    variable predicate goes last, and the produced order is deterministic
    (ties keep textual order)."""
    from cmem_plugin_pyshacl_spark.plans.sparql_af import (
        _Pattern,
        _Term,
        _order_patterns,
    )

    open_scan = _Pattern(_Term("var", "s"), _Term("var", "p"), _Term("var", "o"))
    by_x = _Pattern(_Term("var", "x"), EX + "p", _Term("iri", "urn:o"))
    seed = _Pattern(_Term("iri", "urn:s"), EX + "p2", _Term("var", "x"))
    got = _order_patterns((open_scan, by_x, seed), set())
    assert got == (seed, by_x, open_scan)
    # already-bound outer variables make their patterns connected
    got2 = _order_patterns((open_scan, by_x), {"x"})
    assert got2 == (by_x, open_scan)


def test_order_patterns_keeps_closure_blocks_textual():
    """A block containing a closure-bearing property path keeps its
    textual order: the closure's reachability fixpoint seeds from what is
    bound when it runs, so reordering would change its seed frontier."""
    from cmem_plugin_pyshacl_spark.plans.shacl import PClosure, PPred
    from cmem_plugin_pyshacl_spark.plans.sparql_af import (
        _Pattern,
        _Term,
        _order_patterns,
    )

    closure = _Pattern(
        _Term("var", "a"),
        PClosure(PPred(EX + "p"), "zeroOrMore"),
        _Term("var", "b"),
    )
    plain = _Pattern(_Term("iri", "urn:s"), EX + "q", _Term("var", "a"))
    pats = (closure, plain)
    assert _order_patterns(pats, set()) == pats


def test_bgp_permutation_invariance_and_no_cartesian(spark):
    """The same chained BGP written broad-first returns identical rows to
    selective-first (BGP joins commute), and the reordering removes the
    cross join the textual order would plan: first two textual patterns
    share no variable, but the greedy connected order chains them."""
    rows = []
    for i in range(6):
        rows.append((f"urn:x{i}", EX + "p0", iri(f"urn:y{i}")))
        rows.append((f"urn:y{i}", EX + "p1", iri(f"urn:z{i}")))
        rows.append((f"urn:z{i}", EX + "p2", iri(f"urn:w{i % 2}")))
    data = triples_from_rows(spark, rows)
    chained = (
        f"SELECT ?x ?w WHERE {{ ?x <{EX}p0> ?y . ?y <{EX}p1> ?z . "
        f"?z <{EX}p2> ?w }}"
    )
    broad_first = (
        f"SELECT ?x ?w WHERE {{ ?z <{EX}p2> ?w . ?x <{EX}p0> ?y . "
        f"?y <{EX}p1> ?z }}"
    )
    a = sorted((r.x, r.w) for r in sparql_select(spark, data, chained).collect())
    b = sorted(
        (r.x, r.w) for r in sparql_select(spark, data, broad_first).collect()
    )
    assert a == b and len(a) == 6
    plan = (
        sparql_select(spark, data, broad_first)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------- disjoint OPTIONAL/EXISTS


def test_optional_disjoint_group_cross_multiplies(spark):
    """OPTIONAL sharing no variable with the outer pattern is SPARQL's
    LeftJoin with a disjoint solution set: every outer row pairs with
    every group solution; an empty group leaves the variable unbound."""
    data = triples_from_rows(spark, [
        ("urn:a", EX + "p", iri("urn:x")),
        ("urn:b", EX + "p", iri("urn:y")),
        ("urn:g", EX + "tag", iri("urn:t1")),
    ])
    out = sparql_select(
        spark, data,
        f"SELECT ?s ?v WHERE {{ ?s <{EX}p> ?o . "
        f"OPTIONAL {{ <urn:g> <{EX}tag> ?v }} }}",
    )
    assert sorted((r.s, r.v) for r in out.collect()) == [
        ("urn:a", "urn:t1"), ("urn:b", "urn:t1"),
    ]
    out2 = sparql_select(
        spark, data,
        f"SELECT ?s ?v WHERE {{ ?s <{EX}p> ?o . "
        f"OPTIONAL {{ <urn:g> <{EX}missing> ?v }} }}",
    )
    assert sorted((r.s, r.v) for r in out2.collect()) == [
        ("urn:a", None), ("urn:b", None),
    ]


def test_filter_exists_constant_probe(spark):
    """FILTER [NOT] EXISTS over a constant-only group is a global probe:
    all outer rows survive iff the store (does not) contain a match."""
    data = triples_from_rows(spark, [
        ("urn:a", EX + "p", iri("urn:x")),
        ("urn:b", EX + "p", iri("urn:y")),
        ("urn:flag", EX + "is", iri("urn:on")),
    ])
    hit = f"FILTER EXISTS {{ <urn:flag> <{EX}is> <urn:on> }}"
    miss = f"FILTER EXISTS {{ <urn:flag> <{EX}is> <urn:off> }}"
    base = f"SELECT ?s WHERE {{ ?s <{EX}p> ?o . %s }}"
    assert sorted(
        r.s for r in sparql_select(spark, data, base % hit).collect()
    ) == ["urn:a", "urn:b"]
    assert sparql_select(spark, data, base % miss).count() == 0
    neg = f"FILTER NOT EXISTS {{ <urn:flag> <{EX}is> <urn:off> }}"
    assert sorted(
        r.s for r in sparql_select(spark, data, base % neg).collect()
    ) == ["urn:a", "urn:b"]


# ---------------------------------------------------------- top-level VALUES


def test_top_level_values_filters_and_fills(spark):
    """A post-pattern VALUES clause (§10.2.2) JOINS the solutions with
    the inline data (§18.2.4.2): agreeing rows survive, rows whose
    variable is unbound (OPTIONAL miss) are compatible and get FILLED
    from the data row, and UNDEF cells constrain nothing."""
    data = triples_from_rows(spark, [
        ("urn:a", EX + "p", iri("urn:x")),
        ("urn:b", EX + "p", iri("urn:y")),
        ("urn:a", EX + "tag", iri("urn:t1")),
    ])
    # plain filter
    out = sparql_select(
        spark, data,
        f"SELECT ?s WHERE {{ ?s <{EX}p> ?o }} VALUES ?s {{ <urn:a> }}",
    )
    assert [r.s for r in out.collect()] == ["urn:a"]
    # fill: ?t unbound for urn:b, bound to urn:t1 for urn:a — the data
    # row (urn:t9) matches only the unbound solution and fills it
    out2 = sparql_select(
        spark, data,
        f"SELECT ?s ?t WHERE {{ ?s <{EX}p> ?o . "
        f"OPTIONAL {{ ?s <{EX}tag> ?t }} }} VALUES ?t {{ <urn:t9> }}",
    )
    assert sorted((r.s, r.t) for r in out2.collect()) == [("urn:b", "urn:t9")]
    # UNDEF row keeps everything; a second concrete row multiplies
    out3 = sparql_select(
        spark, data,
        f"SELECT ?s WHERE {{ ?s <{EX}p> ?o }} "
        f"VALUES (?s) {{ (UNDEF) (<urn:a>) }}",
    )
    assert sorted(r.s for r in out3.collect()) == ["urn:a", "urn:a", "urn:b"]


def test_top_level_values_new_variable_and_literals(spark):
    """VALUES variables the pattern never binds join in as new columns
    (cross product with the inline rows); literal cells match on full
    term identity (plain ≡ xsd:string)."""
    data = triples_from_rows(spark, [
        ("urn:a", EX + "name", lit_typed("alice")),
    ])
    out = sparql_select(
        spark, data,
        f"SELECT ?s ?k WHERE {{ ?s <{EX}name> ?n }} "
        f"VALUES ?k {{ \"x\" \"y\" }}",
    )
    assert sorted((r.s, r.k) for r in out.collect()) == [
        ("urn:a", "x"), ("urn:a", "y"),
    ]
    out2 = sparql_select(
        spark, data,
        f"SELECT ?s WHERE {{ ?s <{EX}name> ?n }} VALUES ?n {{ \"alice\" }}",
    )
    assert [r.s for r in out2.collect()] == ["urn:a"]


def test_top_level_values_after_aggregation(spark):
    """Per §18.2.4.2 the inline data joins AFTER aggregation: it can
    filter on an aggregate alias."""
    data = triples_from_rows(spark, [
        ("urn:a", EX + "p", iri("urn:x")),
        ("urn:a", EX + "p", iri("urn:y")),
        ("urn:b", EX + "p", iri("urn:z")),
    ])
    out = sparql_select(
        spark, data,
        f"SELECT ?s (COUNT(?o) AS ?n) WHERE {{ ?s <{EX}p> ?o }} "
        f"GROUP BY ?s VALUES ?n {{ 2 }}",
    )
    assert [(r.s, r.n) for r in out.collect()] == [("urn:a", "2")]


def test_top_level_values_rejected_in_subquery(spark):
    data = triples_from_rows(spark, [("urn:a", EX + "p", iri("urn:x"))])
    with pytest.raises(ValueError, match="trailing VALUES"):
        sparql_select(
            spark, data,
            f"SELECT ?s WHERE {{ {{ SELECT ?s WHERE {{ ?s <{EX}p> ?o }} "
            f"VALUES ?s {{ <urn:a> }} }} }}",
        )
