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
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    XSD,
    XSD_STRING,
    dedupe_triples,
)
from .sparql_af import (
    _Block,
    _Term,
    _apply_aggregation,
    _apply_block,
    _apply_order_limit,
    _delim_end,
    _parse_group,
    _parse_patterns,
    expand_prefixes,
    parse_ask,
    parse_construct,
    parse_select_query,
)

_TERM_SUFFIXES = ("value", "kind", "datatype", "lang")


def _skip_string(text: str, i: int) -> int:
    """Return the index just past the string literal starting at ``i``
    (single- or double-quoted, backslash escapes honored)."""
    q = text[i]
    j = i + 1
    while j < len(text):
        if text[j] == "\\":
            j += 2
            continue
        if text[j] == q:
            return j + 1
        j += 1
    return len(text)


def _extract_dataset(text: str) -> tuple[str, list[str], list[str]]:
    """Strip ``FROM <g>`` / ``FROM NAMED <g>`` dataset clauses (brace
    depth 0 only — never inside a template/pattern block or a string
    literal) and return (text without them, FROM IRIs, FROM NAMED IRIs).
    Handles all four query forms' clause positions (SELECT/ASK/DESCRIBE:
    before WHERE; CONSTRUCT: after the template block)."""
    out: list[str] = []
    default_graphs: list[str] = []
    named_graphs: list[str] = []
    i, n = 0, len(text)
    depth = 0
    while i < n:
        c = text[i]
        if c == "{":
            depth += 1
            out.append(c)
            i += 1
        elif c == "}":
            depth -= 1
            out.append(c)
            i += 1
        elif c in "\"'":
            j = _skip_string(text, i)
            out.append(text[i:j])
            i = j
        elif c == "<":
            j = text.find(">", i)
            j = n if j < 0 else j + 1
            out.append(text[i:j])
            i = j
        else:
            m = None
            if depth == 0 and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] == "_")):
                m = re.match(r"FROM\s+(NAMED\s+)?<([^>]*)>\s*", text[i:], re.I)
            if m:
                (named_graphs if m.group(1) else default_graphs).append(
                    m.group(2)
                )
                i += m.end()
            else:
                out.append(c)
                i += 1
    return "".join(out), default_graphs, named_graphs


def _dataset(
    data: DataFrame,
    text: str,
    default_graphs: list[str],
    named_graphs: list[str],
) -> DataFrame:
    """Construct the query's RDF dataset (SPARQL §13.2) from the store:

      * no dataset clauses → the store as-is (this engine's documented
        model: plain patterns match ALL rows — a union default graph —
        and GRAPH matches the named slices);
      * ``FROM g…`` → the merge of those graphs becomes the default
        graph (their rows' ``graph`` column is nulled);
      * ``FROM NAMED n…`` → only those named graphs are visible to
        GRAPH patterns (the slice is dropped entirely when the query
        never says GRAPH — spec-correct: named graphs are unreachable
        without it).

    One documented deviation from §13.2: when a query combines FROM
    NAMED with plain (non-GRAPH) patterns, those patterns also see the
    named rows (the engine's union-default-graph model); per spec they
    would see only the FROM merge. Queries that keep named-graph access
    inside GRAPH blocks — the normal shape — behave exactly per spec."""
    if not default_graphs and not named_graphs:
        return data
    if "graph" not in data.columns:
        raise ValueError(
            "FROM/FROM NAMED require the triples frame to carry its "
            "`graph` column (it was projected away upstream)"
        )
    parts: list[DataFrame] = []
    if default_graphs:
        parts.append(
            data.filter(F.col("graph").isin(default_graphs)).withColumn(
                "graph", F.lit(None).cast("string")
            )
        )
    if named_graphs and re.search(r"\bGRAPH\b", text, re.I):
        parts.append(data.filter(F.col("graph").isin(named_graphs)))
    if not parts:
        # FROM NAMED only, and the query never says GRAPH: the default
        # graph of the dataset is empty
        return data.filter(F.lit(False))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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

    ``FROM <g>`` / ``FROM NAMED <g>`` dataset clauses construct the
    queried dataset first (see ``_dataset``).
    """
    text, dg, ng = _extract_dataset(_prepare(query))
    data = _dataset(data, text, dg, ng)
    q = parse_select_query(text)
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
    # RDF 1.1: a simple literal IS an xsd:string — normalize the datatype
    # at the surface boundary (the data model stores either NULL or
    # xsd:string depending on the source; readers mint xsd:string) so
    # DISTINCT and the returned term columns treat the two forms as the
    # one term they are
    for v in proj:
        bound = bound.withColumn(
            f"{v}__datatype",
            F.when(
                (F.col(f"{v}__kind") == KIND_LITERAL)
                & F.col(f"{v}__lang").isNull(),
                F.coalesce(F.col(f"{v}__datatype"), F.lit(XSD_STRING)),
            ).otherwise(F.col(f"{v}__datatype")),
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
    action; the result is a scalar by definition. FROM / FROM NAMED
    dataset clauses are honored (see ``_dataset``)."""
    text, dg, ng = _extract_dataset(_prepare(query))
    data = _dataset(data, text, dg, ng)
    block = parse_ask(text)
    bound_vars: set[str] = set()
    bound = _apply_block(
        data, _seed(spark), bound_vars, block, "ua", has_this=False
    )
    return bound.limit(1).count() > 0


def _instantiate(
    bound: DataFrame,
    bound_vars: set[str],
    template: list,
    graph: str | None,
    context: str = "CONSTRUCT",
) -> DataFrame:
    """Instantiate a triple-pattern template from a binding set — the
    spec's rules: solutions with an unbound (OPTIONAL) template variable,
    a literal in subject position, or a non-IRI in predicate position
    instantiate no triple. Shared by CONSTRUCT and the UPDATE forms.

    plans/rules.py::_sparql_rule_dfs is the $this-bound sibling of this
    helper, deliberately NOT unified: rule output feeds validate()
    internals, which preserve the stored NULL-vs-xsd:string datatype and
    normalize at comparison points, whereas this public surface
    normalizes simple literals to xsd:string at instantiation (a rules
    merge would churn the shacl_rules oracle's o_datatype column).
    Template-grammar changes usually need mirroring in both."""
    null_s = F.lit(None).cast("string")

    def term_cols(term) -> tuple:
        if term.kind == "var":
            if term.value not in bound_vars:
                raise ValueError(
                    f"{context} template variable ?{term.value} is not "
                    "bound by the WHERE pattern"
                )
            v = term.value
            # simple literal ≡ xsd:string (RDF 1.1): normalize so a
            # var-copied plain literal and a quoted template constant
            # (minted as xsd:string) dedupe to the one term they are
            dt = F.when(
                (F.col(f"{v}__kind") == KIND_LITERAL)
                & F.col(f"{v}__lang").isNull(),
                F.coalesce(F.col(f"{v}__datatype"), F.lit(XSD_STRING)),
            ).otherwise(F.col(f"{v}__datatype"))
            return (
                F.col(f"{v}__value"),
                F.col(f"{v}__kind"),
                dt,
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


def sparql_construct(
    spark: SparkSession,
    data: DataFrame,
    query: str,
    graph: str | None = None,
) -> DataFrame:
    """Evaluate a SPARQL CONSTRUCT — returns a triples-schema DataFrame
    (set semantics: the emitted graph is deduplicated on term identity).
    ``graph`` stamps the emitted rows' graph column (None = default
    graph). The ``CONSTRUCT WHERE { … }`` shorthand (SPARQL §10.2.3 —
    the pattern doubles as the template) takes a plain triple-pattern
    block, same restriction as DELETE WHERE. FROM / FROM NAMED dataset
    clauses are honored (see ``_dataset``)."""
    text, dg, ng = _extract_dataset(_prepare(query))
    data = _dataset(data, text, dg, ng)
    m = re.match(r"\s*CONSTRUCT\s+WHERE\s*\{(?P<body>.*)\}\s*$", text, re.S | re.I)
    if m:
        patterns, filters, binds, groups = _parse_patterns(m.group("body"))
        if filters or binds or groups or not patterns:
            raise ValueError(
                "CONSTRUCT WHERE takes a plain non-empty triple-pattern "
                "block (use CONSTRUCT { … } WHERE { … } otherwise)"
            )
        for t in patterns:
            bad = not isinstance(t.pred, (str, _Term)) or any(
                term.kind == "var" and term.value.startswith("_seq")
                for term in (t.subj, t.obj)
            )
            if bad:
                raise ValueError(
                    "property paths are not allowed in CONSTRUCT WHERE — "
                    "the pattern doubles as the template"
                )
        template = patterns
        block = _Block(tuple(patterns), (), (), ())
    else:
        template, block = parse_construct(text)
    bound_vars: set[str] = set()
    bound = _apply_block(
        data, _seed(spark), bound_vars, block, "uc", has_this=False
    )
    return _instantiate(bound, bound_vars, template, graph)


_TERM_COLS = ["s", "p", "o_kind", "o_value", "o_datatype", "o_lang"]


def _term_eq(a: str, b: str, cols: list[str]):
    """Null-safe equality of two aliased triple rows on ``cols``, with
    the RDF 1.1 simple-literal normalization the rest of the engine
    applies at comparison points (plans/shacl.py): a literal whose
    datatype column is NULL and lang is NULL ≡ xsd:string."""

    def norm_dt(p: str):
        return F.when(
            (F.col(f"{p}.o_kind") == KIND_LITERAL)
            & F.col(f"{p}.o_lang").isNull(),
            F.coalesce(F.col(f"{p}.o_datatype"), F.lit(XSD_STRING)),
        ).otherwise(F.col(f"{p}.o_datatype"))

    cond = None
    for c in cols:
        if c == "o_datatype":
            eq = norm_dt(a).eqNullSafe(norm_dt(b))
        else:
            eq = F.col(f"{a}.{c}").eqNullSafe(F.col(f"{b}.{c}"))
        cond = eq if cond is None else cond & eq
    return cond


def _without(
    data: DataFrame, dels: DataFrame, graph: str | None
) -> DataFrame:
    """Remove every triple of ``dels`` from ``data`` — a null-safe
    left-anti join on the six term columns (graph-agnostic per the
    default-graph store model; pass ``graph`` to restrict the deletion
    to one named graph). The delete set is a query result and small
    relative to the store — AQE picks the broadcast anti join."""
    d = dels.select(*_TERM_COLS).dropDuplicates().alias("_del")
    base = data.alias("_base")
    cond = _term_eq("_base", "_del", _TERM_COLS)
    if graph is not None:
        cond = cond & F.col("_base.graph").eqNullSafe(F.lit(graph))
    return base.join(d, cond, "left_anti")


def _with_new(data: DataFrame, ins: DataFrame) -> DataFrame:
    """Union only genuinely NEW triples into the store (null-safe anti
    join on the seven key columns incl. graph): set semantics without
    touching existing rows' part_id lineage — an insert of an existing
    triple is a no-op, exactly rdflib's duplicate-add behavior."""
    i = ins.alias("_ins")
    base = data.alias("_base")
    cond = _term_eq("_ins", "_base", [*_TERM_COLS, "graph"])
    fresh = i.join(base, cond, "left_anti")
    return data.unionByName(fresh)


def _ground_template(body: str, what: str) -> list:
    """Parse an INSERT/DELETE DATA block: triple patterns only, fully
    ground (no variables, no paths, no filters — allow_filters=False
    rejects paths/FILTER/BIND at parse time)."""
    patterns, _f, _b, _groups = _parse_patterns(body, allow_filters=False)
    for t in patterns:
        for term in (t.subj, t.obj):
            if term.kind in ("var", "this"):
                raise ValueError(f"{what} DATA requires ground triples")
        if not isinstance(t.pred, str):
            raise ValueError(f"{what} DATA requires ground triples")
    if not patterns:
        raise ValueError(f"{what} DATA block is empty")
    return patterns


def sparql_update(
    spark: SparkSession,
    data: DataFrame,
    update: str,
    graph: str | None = None,
) -> DataFrame:
    """Apply a SPARQL UPDATE to a triples-schema DataFrame and return the
    updated frame (frames are immutable — the caller persists/writes the
    result; `sources/sinks.py` handles the storage side).

    Supported forms (SPARQL 1.1 Update §3.1):
      * ``INSERT DATA { ground triples }``
      * ``DELETE DATA { ground triples }``
      * ``DELETE WHERE { pattern }`` (the pattern is the template)
      * ``[DELETE { tpl }] [INSERT { tpl }] WHERE { pattern }``

    Semantics: the WHERE pattern is evaluated once against the
    PRE-update store and both templates instantiate from that one
    binding set (the spec's simultaneous delete-then-insert). Deletion
    matches on full term identity across the six term columns,
    graph-agnostic unless ``graph`` is given; insertion stamps ``graph``
    on the new rows and the result is set-deduplicated.

    Scale posture: one pattern evaluation (the same progressive join the
    query surface uses), one anti join, one union — no collects, no
    per-row Python."""
    text = _prepare(update).strip()

    def take_block(s: str, kw_end: int) -> tuple[str, int]:
        j = kw_end
        while j < len(s) and s[j].isspace():
            j += 1
        if j >= len(s) or s[j] != "{":
            raise ValueError(f"expected '{{' after {s[:kw_end].strip()!r}")
        k = _delim_end(s, j, "{", "}")
        return s[j + 1 : k], k + 1

    m = re.match(r"(INSERT|DELETE)\s+DATA\b", text, re.I)
    if m:
        body, end = take_block(text, m.end())
        if text[end:].strip():
            raise ValueError("unexpected trailing text after the DATA block")
        what = m.group(1).upper()
        template = _ground_template(body, what)
        rows = _instantiate(_seed(spark), set(), template, graph, what)
        if what == "INSERT":
            return _with_new(data, rows)
        return _without(data, rows, graph)

    m = re.match(r"DELETE\s+WHERE\b", text, re.I)
    if m:
        body, end = take_block(text, m.end())
        if text[end:].strip():
            raise ValueError("unexpected trailing text after DELETE WHERE")
        patterns, filters, binds, groups = _parse_patterns(body)
        if filters or binds or groups:
            raise ValueError(
                "DELETE WHERE takes a plain triple-pattern block "
                "(use DELETE { … } WHERE { … } for filtered deletes)"
            )
        for t in patterns:
            if not isinstance(t.pred, (str, _Term)):
                raise ValueError(
                    "property paths are not allowed in DELETE WHERE — "
                    "the pattern doubles as the deletion template"
                )
            # a sequence path desugars into chained patterns over fresh
            # `_seqN` variables BEFORE this check — deleting those would
            # destructively remove intermediate-hop triples the user
            # never templated (SPARQL 1.1 forbids paths here entirely)
            for term in (t.subj, t.obj):
                if term.kind == "var" and term.value.startswith("_seq"):
                    raise ValueError(
                        "property paths are not allowed in DELETE WHERE — "
                        "the pattern doubles as the deletion template"
                    )
        block = _Block(tuple(patterns), (), (), ())
        bound_vars: set[str] = set()
        bound = _apply_block(
            data, _seed(spark), bound_vars, block, "ud", has_this=False
        )
        dels = _instantiate(bound, bound_vars, patterns, None, "DELETE")
        return _without(data, dels, graph)

    delete_tpl: list | None = None
    insert_tpl: list | None = None
    rest = text
    m = re.match(r"DELETE\b", rest, re.I)
    if m:
        body, end = take_block(rest, m.end())
        delete_tpl, _f, _b, grps = _parse_patterns(body, allow_filters=False)
        if grps:
            raise ValueError("DELETE template cannot contain alternations")
        rest = rest[end:].lstrip()
    m = re.match(r"INSERT\b", rest, re.I)
    if m:
        body, end = take_block(rest, m.end())
        insert_tpl, _f, _b, grps = _parse_patterns(body, allow_filters=False)
        if grps:
            raise ValueError("INSERT template cannot contain alternations")
        rest = rest[end:].lstrip()
    if delete_tpl is None and insert_tpl is None:
        raise ValueError(
            "unsupported update (expected INSERT DATA / DELETE DATA / "
            "DELETE WHERE / [DELETE {…}] [INSERT {…}] WHERE {…})"
        )
    m = re.match(r"WHERE\b", rest, re.I)
    if not m:
        raise ValueError("DELETE/INSERT templates require a WHERE clause")
    body, end = take_block(rest, m.end())
    if rest[end:].strip():
        raise ValueError("unexpected trailing text after the WHERE block")
    block = _parse_group(body)
    bound_vars = set()
    bound = _apply_block(
        data, _seed(spark), bound_vars, block, "uu", has_this=False
    )
    out = data
    if delete_tpl:
        dels = _instantiate(bound, bound_vars, delete_tpl, None, "DELETE")
        out = _without(out, dels, graph)
    if insert_tpl:
        ins = _instantiate(bound, bound_vars, insert_tpl, graph, "INSERT")
        out = _with_new(out, ins)
    return out


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
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    text, dg, ng = _extract_dataset(_prepare(query))
    data = _dataset(data, text, dg, ng)
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
            layer.filter(F.col("o_kind") == KIND_BNODE)
            .select(F.col("o_value").alias("node"))
            .distinct()
        )
        if frontier.limit(1).count() == 0:
            break
    return dedupe_triples(out)
