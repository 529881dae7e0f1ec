"""SHACL-AF first slice: sh:sparql constraints over a restricted SELECT
subset, compiled to DataFrame plans.

The reference delegates SHACL-AF wholesale to pySHACL
(/root/reference/cmem_plugin_pyshacl/plugin_pyshacl.py:250-257). A full
SPARQL engine is out of scope here; this module supports the shape of
sh:sparql constraint a reference user most commonly writes — a single
basic graph pattern plus optional FILTERs:

    SELECT $this ?value WHERE {
        $this <http://example.org/p> ?value .
        ?value <http://example.org/q> ?other .
        FILTER (?other < 10)
    }

Supported grammar (documented contract — anything outside raises
ValueError, matching validate()'s strictness for the unsupported rest):

  * SELECT list: ``$this`` plus any subset of pattern variables; the first
    non-$this variable becomes sh:value in the report.
  * graph patterns: ``subj pred obj .`` where subj/obj are ``$this``, a
    ``?var``, an ``<iri>``, or a quoted literal; pred is an ``<iri>`` or
    the keyword ``a`` (rdf:type). Patterns join left-to-right.
  * FILTER clauses: comparisons (=, !=, <, <=, >, >=) between vars /
    literals / numbers (numeric when both sides cast to double, else
    string), and regex(?var, "pattern").
  * PREFIX: inline ``PREFIX pfx: <ns>`` declarations before the query
    form, plus shapes-graph ``sh:prefixes``/``sh:declare`` ontologies
    (SHACL-AF §5.2) — prefixed names expand to full IRIs at compile time.
  * CONSTRUCT (``parse_construct``, used by plans/rules.py for
    sh:SPARQLRule): same body grammar plus a template block of patterns
    over ``$this`` / bound vars / constants.

Per SHACL-AF §5.3, every solution of the query is one validation result
with sourceConstraintComponent sh:SPARQLConstraintComponent.

Scale posture: each triple pattern is a ``p == <iri>`` slice of the
(persisted, predicate-sliced) relation joined progressively into the
binding set — same join shape as S5; no collects, no UDFs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data_model import KIND_IRI, KIND_LITERAL, RDF_TYPE, SH, XSD

SH_SPARQL_COMPONENT = SH + "SPARQLConstraintComponent"


@dataclass(frozen=True)
class SparqlConstraint:
    node_shape: str  # owning node shape (focus targets come from it)
    constraint_id: str  # the sh:sparql node (sourceShape in reports)
    select: str
    message: str | None
    severity: str


@dataclass(frozen=True)
class _Term:
    kind: str  # 'this' | 'var' | 'iri' | 'lit'
    value: str
    # literal datatype hint for CONSTRUCT templates: quoted -> xsd:string,
    # bare integer -> xsd:integer, bare decimal -> xsd:decimal
    dt: str | None = None


@dataclass(frozen=True)
class _Pattern:
    subj: _Term
    pred: str
    obj: _Term


@dataclass(frozen=True)
class _Filter:
    raw: str


_PREFIX_DECL_RE = re.compile(
    r"^\s*PREFIX\s+([A-Za-z_][\w-]*):\s*<([^>]*)>", re.I
)
_PNAME_RE = re.compile(r"(?<![\w?$:<])([A-Za-z_][\w-]*):([A-Za-z_][\w.-]*)")


def declared_prefixes(by_subject: dict, node: str) -> dict[str, str]:
    """SHACL-AF §5.2: ``node sh:prefixes ont`` where
    ``ont sh:declare [sh:prefix "ex"; sh:namespace "..."]``. The node's
    own subject is also checked for direct sh:declare edges."""
    prefixes: dict[str, str] = {}
    onts = [r.o_value for r in by_subject.get(node, {}).get(SH + "prefixes", [])]
    for ont in [*onts, node]:
        for decl in by_subject.get(ont, {}).get(SH + "declare", []):
            props = by_subject.get(decl.o_value, {})
            pfx = props.get(SH + "prefix", [])
            ns = props.get(SH + "namespace", [])
            if pfx and ns:
                prefixes[pfx[0].o_value] = ns[0].o_value
    return prefixes


def expand_prefixes(text: str, prefixes: dict[str, str]) -> str:
    """Strip leading PREFIX declarations and expand ``pfx:local`` tokens to
    ``<iri>`` outside <...> / "..." regions. Unknown prefixes raise — a
    silently-unexpanded pname would parse as a syntax error downstream with
    a worse message."""
    pfx = dict(prefixes)
    while True:
        m = _PREFIX_DECL_RE.match(text)
        if not m:
            break
        pfx[m.group(1)] = m.group(2)
        text = text[m.end():]

    def _sub(m: re.Match) -> str:
        if m.group(1) not in pfx:
            raise ValueError(f"undeclared prefix {m.group(1)!r} in sh:sparql query")
        return f"<{pfx[m.group(1)]}{m.group(2)}>"

    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "<":
            j = text.find(">", i)
            j = n if j < 0 else j + 1
            out.append(text[i:j])
        elif ch == '"':
            j = i + 1
            while j < n and text[j] != '"':
                j += 2 if text[j] == "\\" else 1
            j = min(j + 1, n)
            out.append(text[i:j])
        else:
            nxt = [k for k in (text.find("<", i), text.find('"', i)) if k >= 0]
            j = min(nxt) if nxt else n
            out.append(_PNAME_RE.sub(_sub, text[i:j]))
        i = j
    return "".join(out)


def index_rows(shapes_rows: list) -> dict[str, dict[str, list]]:
    """Index collected shapes-graph rows as s -> p -> [rows]."""
    by_subject: dict[str, dict[str, list]] = {}
    for r in shapes_rows:
        by_subject.setdefault(r.s, {}).setdefault(r.p, []).append(r)
    return by_subject


def compile_sparql_constraints(shapes_rows: list) -> dict[str, list[SparqlConstraint]]:
    """From collected shapes-graph rows (s, p, o_value ... tuples as Row
    objects), gather sh:sparql constraint nodes grouped by owning shape.
    Prefixed names are expanded at compile time (sh:prefixes + inline
    PREFIX), so the stored select is fully-IRI'd."""
    by_subject = index_rows(shapes_rows)
    out: dict[str, list[SparqlConstraint]] = {}
    for subj, preds in by_subject.items():
        for ref in preds.get(SH + "sparql", []):
            node = ref.o_value
            props = by_subject.get(node, {})
            selects = props.get(SH + "select", [])
            if not selects:
                raise ValueError(f"sh:sparql node {node} has no sh:select")
            msgs = props.get(SH + "message", [])
            sevs = props.get(SH + "severity", [])
            select = expand_prefixes(
                selects[0].o_value, declared_prefixes(by_subject, node)
            )
            out.setdefault(subj, []).append(
                SparqlConstraint(
                    node_shape=subj,
                    constraint_id=node,
                    select=select,
                    message=msgs[0].o_value if msgs else None,
                    severity=sevs[0].o_value if sevs else SH + "Violation",
                )
            )
    return out


_TERM_RE = re.compile(
    r"""\$this|\?[A-Za-z_][A-Za-z0-9_]*|<[^>]*>|"(?:[^"\\]|\\.)*"|\ba\b
        |[0-9]+(?:\.[0-9]+)?""",
    re.X,
)


def _parse_term(tok: str) -> _Term:
    if tok == "$this":
        return _Term("this", "this")
    if tok.startswith("?"):
        return _Term("var", tok[1:])
    if tok.startswith("<"):
        return _Term("iri", tok[1:-1])
    if tok.startswith('"'):
        return _Term("lit", tok[1:-1].replace('\\"', '"'), dt=XSD + "string")
    # bare number
    return _Term("lit", tok, dt=XSD + ("decimal" if "." in tok else "integer"))


def _parse_patterns(body: str, allow_filters: bool = True) -> tuple[list[_Pattern], list[_Filter]]:
    """Parse a { ... } block body into triple patterns + FILTERs."""
    filters: list[_Filter] = []

    def _take_filter(fm: re.Match) -> str:
        if not allow_filters:
            raise ValueError("FILTER is not allowed in a CONSTRUCT template")
        filters.append(_Filter(fm.group(1).strip()))
        return " "

    body = re.sub(r"FILTER\s*\(([^()]*(?:\([^()]*\)[^()]*)*)\)", _take_filter, body, flags=re.I)

    # tokenize the whole body (a "." splits statements only OUTSIDE <iri>
    # and string tokens — the term alternatives consume those first), then
    # reject any leftover text (OPTIONAL, UNION, nested groups, ...)
    tok_re = re.compile(_TERM_RE.pattern + r"|\.", re.X)
    tokens = tok_re.findall(body)
    leftover = tok_re.sub(" ", body).strip()
    if leftover:
        raise ValueError(f"unsupported select syntax near {leftover[:40]!r}")

    patterns: list[_Pattern] = []
    group: list[str] = []

    def _flush() -> None:
        if not group:
            return
        if len(group) != 3:
            raise ValueError(f"unsupported graph pattern {' '.join(group)!r}")
        subj, pred_tok, obj = group
        if pred_tok == "a":
            pred = RDF_TYPE
        elif pred_tok.startswith("<"):
            pred = pred_tok[1:-1]
        else:
            raise ValueError(f"unsupported predicate {pred_tok!r}")
        s_t, o_t = _parse_term(subj), _parse_term(obj)
        if s_t.kind == "lit":
            raise ValueError("literal subjects are not valid RDF")
        patterns.append(_Pattern(s_t, pred, o_t))
        group.clear()

    for tok in tokens:
        if tok == ".":
            _flush()
        else:
            group.append(tok)
    _flush()
    return patterns, filters


def parse_select(select: str) -> tuple[list[str], list[_Pattern], list[_Filter]]:
    """Parse the supported SELECT subset; ValueError on anything outside."""
    m = re.match(
        r"\s*SELECT\s+(?P<proj>.+?)\s+WHERE\s*\{(?P<body>.*)\}\s*$",
        select,
        re.S | re.I,
    )
    if not m:
        raise ValueError(
            "unsupported sh:sparql select (expected SELECT ... WHERE { ... })"
        )
    proj_toks = m.group("proj").split()
    proj: list[str] = []
    for t in proj_toks:
        if t == "$this":
            continue
        if not t.startswith("?"):
            raise ValueError(f"unsupported projection term {t!r}")
        proj.append(t[1:])
    patterns, filters = _parse_patterns(m.group("body"))
    if not patterns:
        raise ValueError("sh:sparql select has no graph pattern")
    return proj, patterns, filters


def parse_construct(construct: str) -> tuple[list[_Pattern], list[_Pattern], list[_Filter]]:
    """Parse the sh:SPARQLRule CONSTRUCT subset: a template block of triple
    patterns plus the same WHERE body grammar as parse_select. Returns
    (template, where_patterns, filters)."""
    m = re.match(
        r"\s*CONSTRUCT\s*\{(?P<tpl>.*?)\}\s*WHERE\s*\{(?P<body>.*)\}\s*$",
        construct,
        re.S | re.I,
    )
    if not m:
        raise ValueError(
            "unsupported sh:construct (expected CONSTRUCT { ... } WHERE { ... })"
        )
    template, _ = _parse_patterns(m.group("tpl"), allow_filters=False)
    if not template:
        raise ValueError("sh:construct template has no triple pattern")
    patterns, filters = _parse_patterns(m.group("body"))
    return template, patterns, filters


_CMP_RE = re.compile(
    r"""^\s*(?P<a>\$this|\?[A-Za-z_]\w*|"(?:[^"\\]|\\.)*"|[0-9]+(?:\.[0-9]+)?)\s*
        (?P<op>!=|<=|>=|=|<|>)\s*
        (?P<b>\$this|\?[A-Za-z_]\w*|"(?:[^"\\]|\\.)*"|[0-9]+(?:\.[0-9]+)?)\s*$""",
    re.X,
)
_REGEX_RE = re.compile(
    r"""^\s*(?P<neg>!)?\s*regex\s*\(\s*\?(?P<var>[A-Za-z_]\w*)\s*,\s*
        "(?P<pat>(?:[^"\\]|\\.)*)"\s*\)\s*$""",
    re.X | re.I,
)


def _term_col(tok: str, cols: dict[str, Column]) -> Column:
    if tok == "$this":
        return cols["this"]
    if tok.startswith("?"):
        name = tok[1:]
        if name not in cols:
            raise ValueError(f"FILTER references unbound variable ?{name}")
        return cols[name]
    if tok.startswith('"'):
        return F.lit(tok[1:-1].replace('\\"', '"'))
    return F.lit(tok)


def _filter_condition(f: _Filter, cols: dict[str, Column]) -> Column:
    rm = _REGEX_RE.match(f.raw)
    if rm:
        cond = _term_col("?" + rm.group("var"), cols).rlike(rm.group("pat"))
        return ~cond if rm.group("neg") else cond
    cm = _CMP_RE.match(f.raw)
    if not cm:
        raise ValueError(f"unsupported FILTER expression {f.raw!r}")
    a = _term_col(cm.group("a"), cols)
    b = _term_col(cm.group("b"), cols)
    op = cm.group("op")
    an, bn = a.cast("double"), b.cast("double")
    num_ok = an.isNotNull() & bn.isNotNull()
    num = {"=": an == bn, "!=": an != bn, "<": an < bn,
           "<=": an <= bn, ">": an > bn, ">=": an >= bn}[op]
    s = {"=": a == b, "!=": a != b, "<": a < b,
         "<=": a <= b, ">": a > b, ">=": a >= b}[op]
    return F.when(num_ok, num).otherwise(s)


def eval_bgp(
    data: DataFrame,
    focus: DataFrame,
    patterns: list[_Pattern],
    filters: list[_Filter],
) -> tuple[DataFrame, set[str]]:
    """Progressive BGP join from the focus set. Returns the binding set —
    columns ``this``, ``part_id``, and ``<var>__value/kind/datatype/lang``
    per bound variable — plus the set of bound variable names.

    Scale posture: each triple pattern is a ``p == <iri>`` slice of the
    (persisted, predicate-sliced) relation joined progressively into the
    binding set — same join shape as S5; no collects, no UDFs."""
    bound = focus.select(
        F.col("focus").alias("this"), F.col("part_id").alias("part_id")
    )
    bound_vars: set[str] = set()

    for i, pat in enumerate(patterns):
        rel = data.filter(F.col("p") == pat.pred).select(
            F.col("s").alias(f"_s{i}"),
            F.col("o_kind").alias(f"_ok{i}"),
            F.col("o_value").alias(f"_ov{i}"),
            F.col("o_datatype").alias(f"_od{i}"),
            F.col("o_lang").alias(f"_ol{i}"),
        )
        conds: list[Column] = []
        if pat.subj.kind == "this":
            conds.append(F.col(f"_s{i}") == F.col("this"))
        elif pat.subj.kind == "var":
            if pat.subj.value in bound_vars:
                conds.append(F.col(f"_s{i}") == F.col(f"{pat.subj.value}__value"))
        else:  # iri
            rel = rel.filter(F.col(f"_s{i}") == pat.subj.value)

        if pat.obj.kind == "this":
            conds.append(
                (F.col(f"_ov{i}") == F.col("this"))
                & (F.col(f"_ok{i}") == KIND_IRI)
            )
        elif pat.obj.kind == "var":
            if pat.obj.value in bound_vars:
                conds.append(F.col(f"_ov{i}") == F.col(f"{pat.obj.value}__value"))
        elif pat.obj.kind == "iri":
            rel = rel.filter(
                (F.col(f"_ov{i}") == pat.obj.value) & (F.col(f"_ok{i}") == KIND_IRI)
            )
        else:  # literal
            rel = rel.filter(
                (F.col(f"_ov{i}") == pat.obj.value)
                & (F.col(f"_ok{i}") == KIND_LITERAL)
            )

        if conds:
            cond = conds[0]
            for c in conds[1:]:
                cond = cond & c
            bound = bound.join(rel, cond)
        else:
            # no shared variable: SPARQL cross-product semantics (rare but
            # legal — e.g. an existence probe); documented and allowed
            bound = bound.crossJoin(rel)

        # register newly bound variables
        if pat.subj.kind == "var" and pat.subj.value not in bound_vars:
            v = pat.subj.value
            bound = (
                bound.withColumn(f"{v}__value", F.col(f"_s{i}"))
                .withColumn(f"{v}__kind", F.lit(KIND_IRI))
                .withColumn(f"{v}__datatype", F.lit(None).cast("string"))
                .withColumn(f"{v}__lang", F.lit(None).cast("string"))
            )
            bound_vars.add(v)
        if pat.obj.kind == "var" and pat.obj.value not in bound_vars:
            v = pat.obj.value
            bound = (
                bound.withColumn(f"{v}__value", F.col(f"_ov{i}"))
                .withColumn(f"{v}__kind", F.col(f"_ok{i}"))
                .withColumn(f"{v}__datatype", F.col(f"_od{i}"))
                .withColumn(f"{v}__lang", F.col(f"_ol{i}"))
            )
            bound_vars.add(v)
        bound = bound.drop(f"_s{i}", f"_ok{i}", f"_ov{i}", f"_od{i}", f"_ol{i}")

    cols: dict[str, Column] = {"this": F.col("this")}
    for v in bound_vars:
        cols[v] = F.col(f"{v}__value")
    for f in filters:
        bound = bound.filter(_filter_condition(f, cols))
    return bound, bound_vars


def evaluate_sparql_constraint(
    spark: SparkSession,
    data: DataFrame,
    focus: DataFrame,
    sc: SparqlConstraint,
) -> DataFrame:
    """Compile the constraint's SELECT into a progressive BGP join from the
    focus set and emit one RESULT_SCHEMA row per solution."""
    proj, patterns, filters = parse_select(sc.select)
    bound, bound_vars = eval_bgp(data, focus, patterns, filters)

    for v in proj:
        if v not in bound_vars:
            raise ValueError(f"projected variable ?{v} is not bound by the pattern")
    value_var = proj[0] if proj else None
    value_col = (
        F.col(f"{value_var}__value") if value_var else F.lit(None).cast("string")
    )
    value_kind = (
        F.col(f"{value_var}__kind") if value_var else F.lit(None).cast("string")
    )
    value_dt = (
        F.col(f"{value_var}__datatype") if value_var else F.lit(None).cast("string")
    )
    msg = sc.message or f"SPARQL constraint {sc.constraint_id} produced a solution"
    return bound.select(
        F.col("this").alias("focusNode"),
        F.lit(None).cast("string").alias("resultPath"),
        value_col.alias("value"),
        F.lit(sc.constraint_id).alias("sourceShape"),
        F.lit(SH_SPARQL_COMPONENT).alias("sourceConstraintComponent"),
        F.lit(msg).alias("resultMessage"),
        F.lit(sc.severity).alias("resultSeverity"),
        F.col("part_id").alias("part_id"),
        value_kind.alias("value_kind"),
        value_dt.alias("value_datatype"),
    ).dropDuplicates(
        ["focusNode", "value", "sourceShape"]
    )
