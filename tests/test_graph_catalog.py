"""R4 (graph loading + owl:imports closure) and R5 (parameter checks)."""

from __future__ import annotations

from cmem_plugin_pyshacl_spark.data_model import (
    RDFS_LABEL,
    iri,
    lit_typed,
)
from cmem_plugin_pyshacl_spark.sources.graph_catalog import (
    OWL_IMPORTS,
    ValidationParams,
    check_parameters,
    imports_closure,
    is_valid_graph_uri,
    load_graph,
)


def _store(spark):
    rows = [
        ("urn:g1", OWL_IMPORTS, "iri", "urn:g2", None, None, "urn:g1", 0),
        ("urn:g2", OWL_IMPORTS, "iri", "urn:g3", None, None, "urn:g2", 0),
        ("urn:g3", OWL_IMPORTS, "iri", "urn:g1", None, None, "urn:g3", 0),  # cycle
        ("urn:a", RDFS_LABEL, "literal", "in g1", None, None, "urn:g1", 0),
        ("urn:b", RDFS_LABEL, "literal", "in g2", None, None, "urn:g2", 0),
        ("urn:c", RDFS_LABEL, "literal", "in g3", None, None, "urn:g3", 0),
        ("urn:d", RDFS_LABEL, "literal", "in g4", None, None, "urn:g4", 0),
    ]
    from cmem_plugin_pyshacl_spark.data_model import TRIPLES_SCHEMA

    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def test_imports_closure_with_cycle(spark):
    t = _store(spark)
    assert imports_closure(t, ["urn:g2"]) == ["urn:g2", "urn:g3", "urn:g1"]


def test_load_graph_imports(spark):
    t = _store(spark)
    got = {r.graph for r in load_graph(t, "urn:g1").collect()}
    assert got == {"urn:g1", "urn:g2", "urn:g3"}
    got_no = {r.graph for r in load_graph(t, "urn:g1", owl_imports=False).collect()}
    assert got_no == {"urn:g1"}


def test_check_parameters():
    catalog = {
        "urn:data": ["http://rdfs.org/ns/void#Dataset"],
        "urn:shapes": ["https://vocab.eccenca.com/shui/ShapeCatalog"],
        "urn:not-shapes": ["http://rdfs.org/ns/void#Dataset"],
    }
    ok = check_parameters(
        ValidationParams("urn:data", "urn:shapes", generate_entities=True), catalog
    )
    assert ok.errors == []

    bad = check_parameters(
        ValidationParams(
            "not a uri", "urn:not-shapes", generate_graph=True,
            output_graph_uri=None, inference="magic", max_validation_depth=0,
        ),
        catalog,
    )
    msgs = "\n".join(bad.errors)
    assert "not a valid IRI" in msgs
    assert "not a shape catalog" in msgs
    assert "output_graph_uri" in msgs
    assert "inference" in msgs
    assert "between 1 and 999" in msgs

    # no output selected
    none_out = check_parameters(ValidationParams("urn:data", "urn:shapes"), catalog)
    assert any("no output selected" in m for m in none_out.errors)

    # dependent-param fold: add_labels=False forces include_graphs_labels off
    fold = check_parameters(
        ValidationParams(
            "urn:data", "urn:shapes", generate_entities=True,
            add_labels=False, include_graphs_labels=True,
        ),
        catalog,
    )
    assert fold.include_graphs_labels is False


def test_iri_validator():
    assert is_valid_graph_uri("https://example.org/g")
    assert is_valid_graph_uri("urn:foo:bar")
    assert not is_valid_graph_uri("not a uri")
    assert not is_valid_graph_uri("")
