"""SPARQL 1.1 Update completion (plans/query.py): operation sequences,
graph management (CLEAR/DROP/CREATE/ADD/COPY/MOVE/LOAD), GRAPH-qualified
quads in DATA blocks and templates, WITH, USING [NAMED]."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.query import sparql_update
from cmem_plugin_pyshacl_spark.sources.io import write_rdf

G1 = "urn:graph:one"
G2 = "urn:graph:two"


@pytest.fixture()
def store(spark):
    """Fresh per-test: updates return new frames but tests mutate state
    sequentially and assert counts."""
    default = triples_from_rows(
        spark,
        [
            ("urn:a", EX + "p", iri("urn:b")),
            ("urn:a", EX + "name", lit_typed("default")),
        ],
    )
    g1 = triples_from_rows(
        spark,
        [
            ("urn:c", EX + "p", iri("urn:d")),
            ("urn:c", EX + "name", lit_typed("one")),
        ],
        graph=G1,
    )
    g2 = triples_from_rows(
        spark,
        [("urn:e", EX + "p", iri("urn:f"))],
        graph=G2,
    )
    return default.unionByName(g1).unionByName(g2)


def graphs_of(df):
    return sorted(
        r["graph"] or "<default>"
        for r in df.select("graph").distinct().collect()
    )


# ------------------------------------------------------- CLEAR / DROP


def test_clear_graph(spark, store):
    out = sparql_update(spark, store, f"CLEAR GRAPH <{G1}>")
    assert out.count() == 3
    assert graphs_of(out) == ["<default>", G2]


def test_drop_default(spark, store):
    out = sparql_update(spark, store, "DROP DEFAULT")
    assert out.count() == 3
    assert graphs_of(out) == [G1, G2]


def test_clear_named(spark, store):
    out = sparql_update(spark, store, "CLEAR NAMED")
    assert out.count() == 2
    assert graphs_of(out) == ["<default>"]


def test_clear_all_and_create_noop(spark, store):
    out = sparql_update(spark, store, "CLEAR SILENT ALL")
    assert out.count() == 0
    assert sparql_update(spark, store, f"CREATE GRAPH <{G1}>").count() == 5


# ---------------------------------------------------- ADD / COPY / MOVE


def test_add_graph_to_default(spark, store):
    out = sparql_update(spark, store, f"ADD GRAPH <{G2}> TO DEFAULT")
    assert out.count() == 6
    assert out.filter(F.col("graph").isNull()).count() == 3
    # source is untouched
    assert out.filter(F.col("graph") == G2).count() == 1


def test_add_is_set_semantics(spark, store):
    # adding twice inserts nothing new the second time
    once = sparql_update(spark, store, f"ADD GRAPH <{G2}> TO DEFAULT")
    twice = sparql_update(spark, once, f"ADD GRAPH <{G2}> TO DEFAULT")
    assert twice.count() == once.count()


def test_copy_replaces_destination(spark, store):
    out = sparql_update(spark, store, f"COPY GRAPH <{G1}> TO GRAPH <{G2}>")
    assert out.filter(F.col("graph") == G2).count() == 2
    assert (
        out.filter((F.col("graph") == G2) & (F.col("s") == "urn:e")).count()
        == 0
    )  # old G2 content is gone (COPY = CLEAR dst + insert src)
    assert out.filter(F.col("graph") == G1).count() == 2


def test_move_removes_source(spark, store):
    out = sparql_update(spark, store, f"MOVE DEFAULT TO GRAPH <{G1}>")
    assert out.filter(F.col("graph").isNull()).count() == 0
    moved = out.filter(F.col("graph") == G1)
    assert sorted(r["s"] for r in moved.collect()) == ["urn:a", "urn:a"]


def test_move_same_graph_is_noop(spark, store):
    out = sparql_update(spark, store, f"MOVE GRAPH <{G1}> TO GRAPH <{G1}>")
    assert out.count() == 5


# ------------------------------------------------------------- LOAD


def test_load_into_graph(spark, store, tmp_path):
    path = str(tmp_path / "extra.nt")
    extra = triples_from_rows(
        spark, [("urn:new", EX + "p", iri("urn:n2"))]
    )
    write_rdf(extra, path, single_file=True)
    out = sparql_update(
        spark, store, f"LOAD <file://{path}> INTO GRAPH <urn:loaded>"
    )
    assert out.count() == 6
    assert (
        out.filter(F.col("graph") == "urn:loaded").collect()[0]["s"]
        == "urn:new"
    )


# ------------------------------------------------ quads in DATA blocks


def test_insert_data_with_graph_quads(spark, store):
    out = sparql_update(
        spark,
        store,
        f"""INSERT DATA {{
            <urn:x> <{EX}p> <urn:y> .
            GRAPH <{G1}> {{ <urn:x> <{EX}p> <urn:z> }}
        }}""",
    )
    assert out.count() == 7
    assert (
        out.filter((F.col("s") == "urn:x") & F.col("graph").isNull()).count()
        == 1
    )
    assert (
        out.filter((F.col("s") == "urn:x") & (F.col("graph") == G1)).count()
        == 1
    )


def test_delete_data_graph_scoped(spark, store):
    # the same (s,p,o) lives in the default graph and G1 would be wrong —
    # deleting the G1 quad must not touch the default row
    seeded = sparql_update(
        spark, store, f"INSERT DATA {{ GRAPH <{G1}> {{ <urn:a> <{EX}p> <urn:b> }} }}"
    )
    assert seeded.count() == 6
    out = sparql_update(
        spark,
        seeded,
        f"DELETE DATA {{ GRAPH <{G1}> {{ <urn:a> <{EX}p> <urn:b> }} }}",
    )
    assert out.count() == 5
    assert out.filter((F.col("s") == "urn:a") & (F.col("p") == EX + "p")).count() == 1


def test_variable_graph_name_rejected_in_template(spark, store):
    with pytest.raises(ValueError, match="must be an IRI"):
        sparql_update(
            spark, store, f"INSERT DATA {{ GRAPH ?g {{ <urn:x> <{EX}p> <urn:y> }} }}"
        )


# ------------------------------------------- templates with GRAPH quads


def test_modify_with_graph_quads(spark, store):
    out = sparql_update(
        spark,
        store,
        f"""DELETE {{ GRAPH <{G1}> {{ ?s <{EX}name> ?n }} }}
            INSERT {{ GRAPH <{G2}> {{ ?s <{EX}renamed> ?n }} }}
            WHERE {{ GRAPH <{G1}> {{ ?s <{EX}name> ?n }} }}""",
    )
    assert out.filter((F.col("graph") == G1) & (F.col("p") == EX + "name")).count() == 0
    row = out.filter(F.col("p") == EX + "renamed").collect()
    assert len(row) == 1 and row[0]["graph"] == G2 and row[0]["o_value"] == "one"
    # the default graph's name triple is untouched (graph-scoped delete)
    assert out.filter(F.col("graph").isNull() & (F.col("p") == EX + "name")).count() == 1


def test_delete_where_with_graph_block(spark, store):
    out = sparql_update(
        spark,
        store,
        f"DELETE WHERE {{ GRAPH <{G1}> {{ ?s ?p ?o }} }}",
    )
    assert out.count() == 3
    assert graphs_of(out) == ["<default>", G2]


# -------------------------------------------------------- WITH / USING


def test_with_scopes_matching_and_templates(spark, store):
    # WHERE matches only in G1; un-graphed templates target G1
    out = sparql_update(
        spark,
        store,
        f"""WITH <{G1}>
            DELETE {{ ?s <{EX}name> ?n }}
            INSERT {{ ?s <{EX}label> ?n }}
            WHERE {{ ?s <{EX}name> ?n }}""",
    )
    # the default graph's name triple survives (matching scoped to G1)
    assert out.filter(F.col("graph").isNull() & (F.col("p") == EX + "name")).count() == 1
    assert out.filter((F.col("graph") == G1) & (F.col("p") == EX + "name")).count() == 0
    row = out.filter(F.col("p") == EX + "label").collect()
    assert len(row) == 1 and row[0]["graph"] == G1


def test_with_plus_graph_block_scopes_plain_patterns(spark, store):
    # §3.1.3 spec-exact (round-4 ADVICE): when the WITH <g> WHERE also
    # says GRAPH, plain patterns STILL match only g — the rest of the
    # store is reachable through GRAPH blocks alone. The plain
    # ?s <ex:p> ?o here must NOT match urn:a (default) or urn:e (G2).
    out = sparql_update(
        spark,
        store,
        f"""WITH <{G1}>
            INSERT {{ ?s a <urn:Seen> . ?t a <urn:ViaGraph> }}
            WHERE {{ ?s <{EX}p> ?o . GRAPH <{G2}> {{ ?t <{EX}p> ?u }} }}""",
    )
    seen = out.filter(F.col("o_value") == "urn:Seen")
    assert [r["s"] for r in seen.collect()] == ["urn:c"]
    via = out.filter(F.col("o_value") == "urn:ViaGraph")
    assert [r["s"] for r in via.collect()] == ["urn:e"]


def test_with_graph_block_can_still_name_g(spark, store):
    # g stays a named graph of the store, so GRAPH <g> inside the WITH
    # WHERE matches it too
    out = sparql_update(
        spark,
        store,
        f"""WITH <{G2}>
            INSERT {{ ?s a <urn:SeenInG1> }}
            WHERE {{ GRAPH <{G1}> {{ ?s <{EX}p> ?o }} }}""",
    )
    seen = out.filter(F.col("o_value") == "urn:SeenInG1")
    assert [r["s"] for r in seen.collect()] == ["urn:c"]


def test_with_and_graph_argument_conflict(spark, store):
    with pytest.raises(ValueError, match="ambiguous"):
        sparql_update(
            spark,
            store,
            f"WITH <{G1}> INSERT {{ ?s a <urn:T> }} WHERE {{ ?s <{EX}p> ?o }}",
            graph=G2,
        )


def test_using_builds_where_dataset(spark, store):
    out = sparql_update(
        spark,
        store,
        f"""INSERT {{ ?s a <urn:Seen> }}
            USING <{G2}>
            WHERE {{ ?s <{EX}p> ?o }}""",
    )
    seen = out.filter(F.col("o_value") == "urn:Seen")
    assert [r["s"] for r in seen.collect()] == ["urn:e"]


def test_using_named_with_graph_var(spark, store):
    out = sparql_update(
        spark,
        store,
        f"""INSERT {{ ?s a <urn:Seen> }}
            USING NAMED <{G1}>
            WHERE {{ GRAPH ?g {{ ?s <{EX}p> ?o }} }}""",
    )
    seen = out.filter(F.col("o_value") == "urn:Seen")
    assert [r["s"] for r in seen.collect()] == ["urn:c"]


# ------------------------------------------------------- sequences


def test_semicolon_sequence_applies_in_order(spark, store):
    out = sparql_update(
        spark,
        store,
        f"""INSERT DATA {{ <urn:x> <{EX}p> <urn:y> }} ;
            DELETE WHERE {{ <urn:x> <{EX}p> ?o }} ;
            INSERT DATA {{ <urn:x> <{EX}q> "done" }}""",
    )
    assert out.filter(F.col("s") == "urn:x").count() == 1
    assert out.filter(F.col("p") == EX + "q").count() == 1


def test_semicolon_inside_braces_not_split(spark, store):
    # predicate-object list uses ; inside the block
    out = sparql_update(
        spark,
        store,
        f'INSERT DATA {{ <urn:x> <{EX}p> <urn:y> ; <{EX}q> "v" }}',
    )
    assert out.filter(F.col("s") == "urn:x").count() == 2
