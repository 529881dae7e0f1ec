"""R4/R5 — graph catalog, owl:imports closure, and parameter validation.

Reference behavior being re-expressed:
  * get_graph (plugin_pyshacl.py:539-543) fetches a graph with server-side
    owl:imports resolution (flag at :171-179, :340). Here the "store" is a
    triples table with a `graph` column; the imports closure is an
    iterative expansion over the tiny graph_meta edge set done driver-side
    (SURVEY.md §2 R4: fixpoints are the one primitive Catalyst lacks), and
    the data fetch is ONE pushed-down `graph IN (...)` filter — partition
    pruning does the rest when the table is partitioned by graph.
  * check_parameters (:545-590): URL syntax, catalog membership +
    graph-type checks (:558-577), output-sink check (:550-553), inference
    enum (:586-587), depth range 1..999 (:589-590), dependent-param fold
    (:583-584).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data_model import DATA_GRAPH_TYPES, RDF_TYPE, SHAPE_CATALOG_TYPE

OWL_IMPORTS = "http://www.w3.org/2002/07/owl#imports"

# pragmatic absolute-IRI check (reference uses validators.url, :554-556)
_IRI_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*:\S+$")


def is_valid_graph_uri(uri: str) -> bool:
    return bool(_IRI_RE.match(uri or ""))


def imports_closure(triples: DataFrame, roots: list[str]) -> list[str]:
    """owl:imports closure of `roots` over the (tiny) imports edge set.

    The edge set — (graph, owl:imports, target) triples — is orders of
    magnitude smaller than the data, so we collect it once and close on
    the driver; the alternative (iterative joins against the full table)
    would shuffle the big side once per hop."""
    edges: dict[str, set[str]] = {}
    for r in (
        triples.filter(F.col("p") == OWL_IMPORTS)
        .select("s", "o_value")
        .distinct()
        .collect()
    ):
        edges.setdefault(r.s, set()).add(r.o_value)
    seen = list(dict.fromkeys(roots))
    frontier = list(seen)
    while frontier:
        nxt = []
        for g in frontier:
            for tgt in sorted(edges.get(g, ())):
                if tgt not in seen:
                    seen.append(tgt)
                    nxt.append(tgt)
        frontier = nxt
    return seen


def load_graph(
    triples: DataFrame, graph_uri: str, owl_imports: bool = True
) -> DataFrame:
    """R4 — fetch one named graph (plus its imports closure when enabled)
    as a pushed-down IN filter on the graph column."""
    graphs = (
        imports_closure(triples, [graph_uri]) if owl_imports else [graph_uri]
    )
    return triples.filter(F.col("graph").isin(graphs))


@dataclass
class ValidationParams:
    """Mirror of the reference plugin's parameter surface (:106-307)."""

    data_graph_uri: str
    shacl_graph_uri: str
    generate_graph: bool = False
    output_graph_uri: str | None = None
    generate_entities: bool = False
    inference: str = "none"
    max_validation_depth: int = 15
    add_labels: bool = True
    include_graphs_labels: bool = False
    meta_shacl: bool = False
    errors: list[str] = field(default_factory=list)


_INFERENCE_VALUES = ("none", "rdfs", "owlrl", "both")


def check_parameters(
    params: ValidationParams, graph_catalog: dict[str, list[str]]
) -> ValidationParams:
    """R5 — driver-side config validation (reference :545-590).

    graph_catalog: {graph_uri: [rdf types]} — the get_graphs_list()
    analogue (:558). Returns params with `errors` populated (empty =>
    valid) and dependent parameters folded."""
    e = params.errors
    if not params.generate_graph and not params.generate_entities:
        e.append("no output selected: enable generate_graph and/or generate_entities")
    for label, uri in (
        ("data_graph_uri", params.data_graph_uri),
        ("shacl_graph_uri", params.shacl_graph_uri),
    ):
        if not is_valid_graph_uri(uri):
            e.append(f"{label} is not a valid IRI: {uri!r}")
    if params.generate_graph and not is_valid_graph_uri(params.output_graph_uri or ""):
        e.append(f"output_graph_uri is not a valid IRI: {params.output_graph_uri!r}")

    if params.data_graph_uri in graph_catalog:
        types = set(graph_catalog[params.data_graph_uri])
        if not types & set(DATA_GRAPH_TYPES):
            e.append(
                f"data graph {params.data_graph_uri} is not one of the "
                f"accepted data graph types"
            )
    else:
        e.append(f"data graph not in catalog: {params.data_graph_uri}")
    if params.shacl_graph_uri in graph_catalog:
        if SHAPE_CATALOG_TYPE not in graph_catalog[params.shacl_graph_uri]:
            e.append(
                f"shacl graph {params.shacl_graph_uri} is not a shape catalog"
            )
    else:
        e.append(f"shacl graph not in catalog: {params.shacl_graph_uri}")

    if params.inference not in _INFERENCE_VALUES:
        e.append(f"inference must be one of {_INFERENCE_VALUES}")
    if not 1 <= params.max_validation_depth <= 999:
        e.append("max_validation_depth must be between 1 and 999")

    # dependent-param fold (reference :583-584)
    if not params.add_labels:
        params.include_graphs_labels = False
    return params
