"""Standalone SPARQL query surface over a triples DataFrame.

The reference plugin lives inside eccenca Corporate Memory, a platform
whose primary graph-access primitive is SPARQL (the plugin itself
fetches its data/shapes graphs from a SPARQL endpoint —
plugin_pyshacl.py:311-327 `get_graph` — and users of the platform query
the same graphs ad hoc). This module exposes the SHACL-AF evaluator
(plans/sparql_af.py) as that direct query surface: SELECT / ASK /
CONSTRUCT / DESCRIBE over any triples-schema DataFrame, no shapes graph
required.

Everything is the same set-based machinery the constraint engine uses —
a progressive whole-frame join per triple pattern, OPTIONAL as a left
outer join, [NOT] EXISTS as semi/anti joins over distinct keys,
aggregation as one hash aggregate — seeded from a single-row frame
instead of a focus set. No collects of data-scale frames, no UDFs; ASK
is the only driver-side scalar (it IS a scalar).

Scale posture: a query whose patterns all carry constant predicates
reads only those predicate slices (Catalyst pushes `p = <iri>` into the
parquet scan); a variable-predicate pattern reads the full relation —
that is the query's semantics, not an implementation artifact. ORDER BY
+ LIMIT compiles to TakeOrderedAndProject (no global sort
materialization). DESCRIBE's bnode-closure loop is bounded by
``max_hops`` and each hop is one semi-join — with skolemization on
(operators/graph_ops.skolemize) graphs carry no bnodes and the loop
exits after the first hop.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data_model import (
    KIND_IRI,
    KIND_LITERAL,
    XSD,
    dedupe_triples,
)
from .sparql_af import (
    _apply_aggregation,
    _apply_block,
    _apply_order_limit,
    expand_prefixes,
    parse_ask,
    parse_construct,
    parse_select_query,
)

_TERM_SUFFIXES = ("value", "kind", "datatype", "lang")


def _prepare(query: str) -> str:
    """Expand the PREFIX prologue and reject $this — the focus-node
    pre-binding exists only inside a SHACL constraint context."""
    text = expand_prefixes(query, {})
    if re.search(r"\$this\b", text):
        raise ValueError(
            "$this is only bound inside a SHACL constraint/rule context — "
            "standalone queries must use ordinary variables"
        )
    return text


def _seed(spark: SparkSession) -> DataFrame:
    return spark.range(1).select(F.lit(0).alias("_seed"))


def sparql_select(
    spark: SparkSession,
    data: DataFrame,
    query: str,
    include_term_columns: bool = False,
) -> DataFrame:
    """Evaluate a SPARQL SELECT over a triples-schema DataFrame.

    Returns one column per projected variable holding the term's lexical
    value (IRI string / literal lexical form), in projection order. With
    ``include_term_columns`` each variable also carries ``<v>_kind`` /
    ``<v>_datatype`` / ``<v>_lang`` columns — full RDF term identity.

    Supported subset = the sh:sparql grammar (plans/sparql_af.py module
    docstring): BGPs, property paths incl. closures, OPTIONAL / UNION /
    MINUS / FILTER [NOT] EXISTS / VALUES / BIND / GRAPH, subqueries,
    aggregates + GROUP BY / HAVING, ORDER BY / LIMIT, DISTINCT, and
    ``SELECT *`` — plus variable predicates. Anything outside raises
    ValueError at parse time.

    DISTINCT deduplicates on full RDF term identity (kind + datatype +
    lang, not just the lexical form) before ORDER BY/LIMIT, per the
    SPARQL algebra ordering of Distinct inside OrderBy/Slice.
    """
    q = parse_select_query(_prepare(query))
    bound_vars: set[str] = set()
    bound = _apply_block(
        data, _seed(spark), bound_vars, q.block, "uq", has_this=False
    )
    if q.aggs or q.group_by or q.having:
        bound, bound_vars = _apply_aggregation(
            bound, bound_vars, q, has_this=False
        )
    proj = sorted(bound_vars) if q.star else list(q.proj)
    if not proj:
        raise ValueError("the SELECT projects no variables")
    for v in proj:
        if v not in bound_vars:
            raise ValueError(
                f"projected variable ?{v} is not bound by the pattern"
            )
    if q.distinct:
        cols = [f"{v}__{sfx}" for v in proj for sfx in _TERM_SUFFIXES]
        bound = bound.select(*cols).dropDuplicates()
        bound_vars = set(proj)
    bound = _apply_order_limit(bound, bound_vars, q, has_this=False)
    out_cols = []
    for v in proj:
        out_cols.append(F.col(f"{v}__value").alias(v))
        if include_term_columns:
            out_cols += [
                F.col(f"{v}__kind").alias(f"{v}_kind"),
                F.col(f"{v}__datatype").alias(f"{v}_datatype"),
                F.col(f"{v}__lang").alias(f"{v}_lang"),
            ]
    return bound.select(*out_cols)


def sparql_ask(spark: SparkSession, data: DataFrame, query: str) -> bool:
    """Evaluate a SPARQL ASK — True iff the pattern has any solution.
    The one-row probe (`LIMIT 1` under the hood) is the only driver-side
    action; the result is a scalar by definition."""
    block = parse_ask(_prepare(query))
    bound_vars: set[str] = set()
    bound = _apply_block(
        data, _seed(spark), bound_vars, block, "ua", has_this=False
    )
    return bound.limit(1).count() > 0


def sparql_construct(
    spark: SparkSession,
    data: DataFrame,
    query: str,
    graph: str | None = None,
) -> DataFrame:
    """Evaluate a SPARQL CONSTRUCT — returns a triples-schema DataFrame
    (set semantics: the emitted graph is deduplicated on term identity).
    Template slots follow the spec's instantiation rules: solutions with
    an unbound (OPTIONAL) template variable, a literal in subject
    position, or a non-IRI in predicate position instantiate no triple.
    ``graph`` stamps the emitted rows' graph column (None = default
    graph)."""
    template, block = parse_construct(_prepare(query))
    bound_vars: set[str] = set()
    bound = _apply_block(
        data, _seed(spark), bound_vars, block, "uc", has_this=False
    )
    null_s = F.lit(None).cast("string")

    def term_cols(term) -> tuple:
        if term.kind == "var":
            if term.value not in bound_vars:
                raise ValueError(
                    f"CONSTRUCT template variable ?{term.value} is not "
                    "bound by the WHERE pattern"
                )
            v = term.value
            return (
                F.col(f"{v}__value"),
                F.col(f"{v}__kind"),
                F.col(f"{v}__datatype"),
                F.col(f"{v}__lang"),
            )
        if term.kind == "iri":
            return (F.lit(term.value), F.lit(KIND_IRI), null_s, null_s)
        dt = term.dt or XSD + "string"
        return (F.lit(term.value), F.lit(KIND_LITERAL), F.lit(dt), null_s)

    frames: list[DataFrame] = []
    for t in template:
        sv, sk, _sd, _sl = term_cols(t.subj)
        ov, ok, od, ol = term_cols(t.obj)
        src = bound
        if t.subj.kind == "var":
            src = src.filter(sv.isNotNull() & (sk != F.lit(KIND_LITERAL)))
        if t.obj.kind == "var":
            src = src.filter(ov.isNotNull())
        if isinstance(t.pred, str):
            pv = F.lit(t.pred)
        else:  # variable predicate bound by the WHERE body
            pv, pk, _pd, _pl = term_cols(t.pred)
            src = src.filter(pv.isNotNull() & (pk == F.lit(KIND_IRI)))
        frames.append(
            src.select(
                sv.alias("s"),
                pv.alias("p"),
                ok.alias("o_kind"),
                ov.alias("o_value"),
                od.alias("o_datatype"),
                ol.alias("o_lang"),
                F.lit(graph).cast("string").alias("graph"),
                F.lit(0).cast("int").alias("part_id"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return dedupe_triples(out)


_DESCRIBE_RE = re.compile(
    r"\s*DESCRIBE\s+(?P<terms>(?:<[^>]*>|\?[A-Za-z_]\w*)"
    r"(?:\s+(?:<[^>]*>|\?[A-Za-z_]\w*))*)"
    r"(?:\s+WHERE\s*\{(?P<body>.*)\})?\s*$",
    re.S | re.I,
)


def sparql_describe(
    spark: SparkSession,
    data: DataFrame,
    query: str,
    max_hops: int = 8,
) -> DataFrame:
    """Evaluate a SPARQL DESCRIBE — returns the concise bounded
    description of the matched nodes as a triples-schema DataFrame: each
    node's outgoing triples, expanded recursively through blank-node
    objects (CBD, the de-facto DESCRIBE semantics), bounded by
    ``max_hops`` bnode hops.

    Two forms: ``DESCRIBE <iri> [<iri> …]`` and
    ``DESCRIBE ?v [?w …] WHERE { … }`` (each listed variable's IRI/bnode
    bindings are described; literal bindings have no description).
    """
    text = _prepare(query)
    m = _DESCRIBE_RE.match(text)
    if not m:
        raise ValueError(
            "unsupported DESCRIBE (expected DESCRIBE <iri>… or "
            "DESCRIBE ?var… WHERE { … })"
        )
    terms = m.group("terms").split()
    body = m.group("body")
    iris = [t[1:-1] for t in terms if t.startswith("<")]
    tvars = [t[1:] for t in terms if t.startswith("?")]
    if body is None:
        if tvars:
            raise ValueError("DESCRIBE ?var requires a WHERE clause")
        nodes = spark.createDataFrame(
            [(i,) for i in iris], "node string"
        ).distinct()
    else:
        if not tvars:
            raise ValueError(
                "DESCRIBE with a WHERE clause must list at least one ?var"
            )
        sel = "SELECT {} WHERE {{{}}}".format(
            " ".join(f"?{v}" for v in tvars), body
        )
        bound = sparql_select(
            spark, data, sel, include_term_columns=True
        )
        parts = [
            bound.filter(F.col(f"{v}_kind") != KIND_LITERAL).select(
                F.col(v).alias("node")
            )
            for v in tvars
        ]
        nodes = parts[0]
        for p in parts[1:]:
            nodes = nodes.unionByName(p)
        if iris:
            nodes = nodes.unionByName(
                spark.createDataFrame([(i,) for i in iris], "node string")
            )
        nodes = nodes.distinct()

    triple_cols = [
        "s", "p", "o_kind", "o_value", "o_datatype", "o_lang",
        "graph", "part_id",
    ]
    out: DataFrame | None = None
    frontier = nodes
    for _hop in range(max_hops):
        layer = data.join(
            frontier.withColumnRenamed("node", "s"), on="s", how="leftsemi"
        ).select(*triple_cols)
        out = layer if out is None else out.unionByName(layer)
        # next frontier: blank-node objects only (CBD recursion) — with
        # skolemized graphs this is empty after the first hop
        frontier = (
            layer.filter(F.col("o_kind") == "bnode")
            .select(F.col("o_value").alias("node"))
            .distinct()
        )
        if frontier.limit(1).count() == 0:
            break
    return dedupe_triples(out)
