"""Spark-native SHACL core engine (SURVEY.md §2.2, S1–S12).

The reference delegates constraint evaluation to pySHACL 0.30.1
(/root/reference/cmem_plugin_pyshacl/plugin_pyshacl.py:631-641), a
single-node, row-at-a-time rdflib interpreter. This module reimplements the
core semantics — per the W3C SHACL Recommendation (2017-07-20) — as a
two-phase Spark plan:

  Phase 1 (S1, driver-side): COMPILE the shapes graph (always tiny — the
  reference's own fixture is pySHACL's shacl-shacl.ttl) from a triples
  DataFrame into plain-python ``PropertyConstraint`` records, which become
  broadcast constraint tables.

  Phase 2 (S2–S12, executor-side): EVALUATE constraints as 100%-native
  Column expressions over the (huge) data triples table. No Python UDFs
  anywhere in this module — every predicate stays inside whole-stage
  codegen; the only shuffles are the per-(focus,shape) count aggregate for
  min/max-count and the anti-join for sh:class.

Scale analysis (100 TB posture):
  * the shapes side of every join is broadcast() — the big triples table is
    never shuffled for target selection beyond a single filter+distinct;
  * S5 value extraction is one shuffle join keyed on subject; at cluster
    scale the triples table should be bucketed by `s` so this co-locates;
  * S6/S7 counting uses hash aggregation (partial+final map-side combine is
    automatic);
  * S9 sh:class is a left-anti join against the (class-filtered, usually
    small) type table — broadcastable when the closure is small;
  * report assembly is a union of narrow DataFrames + one per-partition agg.

Supported core (BASELINE.json north_star scope): sh:NodeShape /
sh:PropertyShape, targets (sh:targetClass incl. rdfs:subClassOf closure,
implicit class targets, sh:targetNode, sh:targetSubjectsOf,
sh:targetObjectsOf), constraints sh:minCount, sh:maxCount, sh:datatype,
sh:class, sh:nodeKind, sh:pattern (+sh:flags), sh:severity, sh:message,
sh:deactivated. Out-of-core pySHACL params (meta_shacl, inference=owlrl,
advanced/js, max_validation_depth) are accepted as documented flags — see
``validate()``.

Documented approximation: focus nodes are assumed to be IRIs
(post-skolemization). sh:targetObjectsOf therefore selects only IRI
objects — a LITERAL object selected as a focus node (legal per W3C SHACL)
is not modeled; property constraints on such a focus would trivially
yield zero values anyway, but self constraints on literal focus nodes are
not evaluated. (Literal VALUE nodes, including under shape refs, are
fully supported — see _literal_fail_condition.)
"""

from __future__ import annotations

import contextvars
import logging
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data_model import (
    KIND_IRI,
    KIND_LITERAL,
    RDF_LANGSTRING,
    RDF_TYPE,
    RDFS_SUBCLASSOF,
    SH,
    XSD,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

SH_VIOLATION = SH + "Violation"
SH_WARNING = SH + "Warning"
SH_INFO = SH + "Info"

_log = logging.getLogger(__name__)

# Bound on zeroOrMore/oneOrMore closure fixpoint rounds. Reaching the bound
# with a non-empty frontier means reachability was TRUNCATED (deep rdf:rest
# / skos:broader chains) and hasValue/minCount outcomes may be wrong — a
# warning is logged (round-2 ADVICE: silent truncation). Configurable per
# call via validate(closure_max_iters=...), carried in a ContextVar so the
# bound doesn't need threading through every evaluator signature.
_CLOSURE_MAX_ITERS: contextvars.ContextVar[int] = contextvars.ContextVar(
    "shacl_closure_max_iters", default=25
)


def _warn_closure_truncated(where: str, max_iters: int) -> None:
    _log.warning(
        "SHACL %s closure reached the %d-round bound with a non-empty "
        "frontier — reachability is truncated; raise "
        "validate(closure_max_iters=...) for deeper chains",
        where,
        max_iters,
    )


# ------------------------------------------------------- broadcast gating
# An explicit F.broadcast() hint is honored by Spark REGARDLESS of size (AQE
# demotes only its own conversions, never user hints) — so the S5 / batch /
# closed-shape "focus is the build side" plans, correct for the common
# small-focus case, would hard-fail past the 8 GB / 512M-row broadcast limit
# on a billion-node targetClass (round-2 VERDICT finding 1). Every hint on a
# focus-derived frame is therefore GATED on Catalyst's optimized-plan
# sizeInBytes — a FREE (no job) estimate. Without CBO table stats Spark's
# size-only propagation never shrinks a Filter below its child and grows
# joins multiplicatively, so a small estimate is a trustworthy upper bound:
# parquet-backed scans read their file sizes (a 100-TB scan reads huge) and
# only provably-small relations keep the hint. Anything estimated large is
# left UNHINTED: AQE converts to broadcast at runtime from real shuffle
# stats when the frame turns out small, and the 100-TB plan is a co-located
# join on `s`-bucketed storage. One exception, added by the round-4 drift
# bisect (BENCH.md): estimates SATURATE to Long.MaxValue on derived plans
# (unions of concat-projections), carrying no information — validate()
# then rescues the verdict with ONE row-bounded count of its persisted
# predicate slice (cache-warming work evaluation repeats anyway), because
# the estimate-only gate had silently unhinted every join and cost ~25%
# on shacl_full vs the round-2 count-gated plans.
_BROADCAST_GATE_BYTES = 256 << 20
# row bound for the persisted-slice count fallback (tier 3 below): a LIMIT
# this size short-circuits after ~1 partition on a genuinely big relation
_BROADCAST_GATE_ROWS = 1_000_000
# size-only propagation saturates toward Long.MaxValue on derived plans
# (unions of concat-projections multiply unknowns); estimates in this band
# carry no information, unlike honest file-size-backed large estimates
_EST_SATURATED = 1 << 50  # ~1 PiB


_ASSUME_SMALL_FOCUS: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "shacl_assume_small_focus", default=False
)


def _plan_size_bytes(df: DataFrame) -> int | None:
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # pragma: no cover - connect mode / stats failure
        return None


def _is_small(df: DataFrame) -> bool:
    """True when `df` is estimated (or globally assumed) under the broadcast
    gate. Purely stats-based — never runs a job. Memoized per DataFrame
    object."""
    if _ASSUME_SMALL_FOCUS.get():
        return True
    cached = getattr(df, "_shacl_small", None)
    if cached is not None:
        return bool(cached)
    est = _plan_size_bytes(df)
    small = est is not None and est <= _BROADCAST_GATE_BYTES
    try:
        df._shacl_small = small  # type: ignore[attr-defined]
    except Exception:  # pragma: no cover
        pass
    return small


def _b(df: DataFrame, small: bool) -> DataFrame:
    """Apply the broadcast hint only when the gate said the frame is small."""
    return F.broadcast(df) if small else df

# lexical-space regexes for the datatypes that appear in fixtures; SHACL
# requires ill-formed literals to violate sh:datatype (W3C SHACL §4.5.2).
_LEXICAL_RE = {
    XSD_INTEGER: r"^[+-]?\d+$",
    XSD_DECIMAL: r"^[+-]?(\d+(\.\d*)?|\.\d+)$",
    XSD_DOUBLE: r"^([+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|[+-]?INF|NaN)$",
    XSD_BOOLEAN: r"^(true|false|0|1)$",
    XSD_DATE: r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$",
    XSD_DATETIME: r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?$",
}

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("focusNode", T.StringType(), False),
        T.StructField("resultPath", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("sourceShape", T.StringType(), False),
        T.StructField("sourceConstraintComponent", T.StringType(), False),
        T.StructField("resultMessage", T.StringType(), True),
        T.StructField("resultSeverity", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), True),
        # term info of the offending value (null when value is null):
        # drives R13 typed-literal cell rendering ('"lex"^^<dt>') and R10
        # value-label copying, reference plugin_pyshacl.py:490-492, :414-418
        T.StructField("value_kind", T.StringType(), True),
        T.StructField("value_datatype", T.StringType(), True),
    ]
)


def _effective_datatype(kind: Column, datatype: Column, lang: Column) -> Column:
    """RDF 1.1 term model: a literal's datatype is the written one, else
    rdf:langString when language-tagged, else xsd:string. Null for IRIs."""
    return F.when(
        kind == KIND_LITERAL,
        F.coalesce(
            datatype,
            F.when(lang.isNotNull(), F.lit(RDF_LANGSTRING)).otherwise(
                F.lit(XSD_STRING)
            ),
        ),
    )


def _term_key_col(kind: Column, value: Column, datatype: Column, lang: Column) -> Column:
    """Canonical term-identity key (kind, lexical, effective datatype,
    lowercased lang) — sh:in / sh:hasValue compare on RDF term identity,
    not the bare string form (W3C SHACL §4.5.1/§4.5.2)."""
    return F.concat_ws(
        "",
        kind,
        value,
        F.coalesce(_effective_datatype(kind, datatype, lang), F.lit("")),
        # lang participates in term identity ONLY for literals
        F.when(
            kind == KIND_LITERAL, F.lower(F.coalesce(lang, F.lit("")))
        ).otherwise(F.lit("")),
    )


def _term_key_py(value: str, kind: str, datatype: str | None, lang: str | None) -> str:
    """Driver-side mirror of ``_term_key_col`` for compiled shape terms."""
    if kind == KIND_LITERAL:
        eff = datatype or (RDF_LANGSTRING if lang else XSD_STRING)
        tag = (lang or "").lower()
    else:
        # lang/datatype are not part of IRI/bnode term identity
        eff = ""
        tag = ""
    return "".join([kind, value, eff, tag])


@dataclass
class PropertyConstraint:
    """One compiled property-shape constraint (S1 output row)."""

    shape_id: str  # the property shape node (skolemized if bnode)
    node_shape: str  # owning node shape
    path: str  # simple IRI path (core scope)
    severity: str = SH_VIOLATION
    message: str | None = None
    min_count: int | None = None
    max_count: int | None = None
    datatype: str | None = None
    class_: str | None = None
    node_kind: str | None = None
    pattern: str | None = None
    flags: str | None = None
    min_length: int | None = None
    max_length: int | None = None
    in_values: list[str] | None = None  # sh:in (list of allowed values)
    has_value: str | None = None  # sh:hasValue
    node_ref: str | None = None  # sh:node (shape-to-shape reference)
    not_ref: str | None = None  # sh:not
    or_refs: list[str] | None = None  # sh:or (list of shapes)
    and_refs: list[str] | None = None  # sh:and (list of shapes)
    language_in: list[str] | None = None  # sh:languageIn (list of BCP-47 tags)
    unique_lang: bool = False  # sh:uniqueLang
    inverse: bool = False  # sh:path [sh:inversePath p] — incoming edges
    seq_path: list[str] | None = None  # sh:path ( p1 p2 ... ) — sequence
    alt_path: list[str] | None = None  # sh:path [sh:alternativePath (..)]
    equals_: str | None = None  # sh:equals (property pair)
    disjoint: str | None = None  # sh:disjoint
    less_than: str | None = None  # sh:lessThan
    less_than_eq: str | None = None  # sh:lessThanOrEquals
    xone_refs: list[str] | None = None  # sh:xone (exactly one shape)
    min_inclusive: str | None = None  # sh:minInclusive
    max_inclusive: str | None = None  # sh:maxInclusive
    min_exclusive: str | None = None  # sh:minExclusive
    max_exclusive: str | None = None  # sh:maxExclusive
    qualified_ref: str | None = None  # sh:qualifiedValueShape
    q_min: int | None = None  # sh:qualifiedMinCount
    q_max: int | None = None  # sh:qualifiedMaxCount
    q_disjoint: bool = False  # sh:qualifiedValueShapesDisjoint
    # qualifiedValueShape refs of SIBLING property shapes (same node shape)
    # — populated at compile time when q_disjoint is set
    sibling_q_refs: list[str] | None = None
    # full RDF terms (value, kind, datatype, lang) for term-identity checks
    in_terms: list[tuple[str, str, str | None, str | None]] | None = None
    has_value_term: tuple[str, str, str | None, str | None] | None = None
    # sh:zeroOrMorePath / sh:oneOrMorePath / sh:zeroOrOnePath over a simple
    # predicate: closure_kind in {'zeroOrMore','oneOrMore','zeroOrOne'}
    closure_path: str | None = None
    closure_kind: str | None = None
    # arbitrarily NESTED path expression (sequence of inverses, alternative
    # of sequences, closure of inverse, ...) — normalized PathExpr tree;
    # flat forms keep the dedicated fast paths above and leave this None
    path_expr: "PathExpr | None" = None


# ---------------------------------------------------------------- SHACL
# property-path algebra (W3C SHACL §2.3.1 / SPARQL 1.1 property paths).
# Flat shapes (one predicate, one inverse, one-level sequence/alternative/
# closure) take the dedicated plans in evaluate_constraint; everything else
# compiles to this tree and evaluates via _eval_path_expr.
@dataclass(frozen=True)
class PPred:
    iri: str


@dataclass(frozen=True)
class PInv:
    sub: "PathExpr"


@dataclass(frozen=True)
class PSeq:
    parts: tuple


@dataclass(frozen=True)
class PAlt:
    parts: tuple


@dataclass(frozen=True)
class PClosure:
    sub: "PathExpr"
    kind: str  # 'zeroOrMore' | 'oneOrMore' | 'zeroOrOne'


@dataclass(frozen=True)
class PNeg:
    """SPARQL 1.1 negated property set ``!(<a>|^<b>|…)`` — one hop over
    any predicate OUTSIDE the set: the forward arm matches (x,p,y) with
    p not in `fwd`, the inverse arm matches (y,p,x) with p not in `inv`;
    an arm is present only when its exclusion tuple is not None (spec
    §18.2.2.3: ``!(:p)`` matches forward edges only, ``!(^:q)`` reversed
    edges only, a mixed set both arms). SHACL's own path syntax has no
    negation (W3C SHACL §2.3.1), so shape compilation never builds this
    node — it exists for the sh:sparql property-path grammar
    (plans/sparql_af.py)."""

    fwd: tuple | None
    inv: tuple | None


PathExpr = PPred | PInv | PSeq | PAlt | PClosure | PNeg


def _normalize_path(e: PathExpr) -> PathExpr:
    """Push inverses to the leaves: ^(a/b) = ^b/^a, ^(a|b) = ^a|^b,
    ^(p*) = (^p)*, ^^p = p — after this, PInv only ever wraps PPred."""
    if isinstance(e, PPred):
        return e
    if isinstance(e, PSeq):
        return PSeq(tuple(_normalize_path(p) for p in e.parts))
    if isinstance(e, PAlt):
        return PAlt(tuple(_normalize_path(p) for p in e.parts))
    if isinstance(e, PClosure):
        return PClosure(_normalize_path(e.sub), e.kind)
    if isinstance(e, PNeg):
        return e
    # PInv
    s = e.sub
    if isinstance(s, PPred):
        return e
    if isinstance(s, PInv):
        return _normalize_path(s.sub)
    if isinstance(s, PSeq):
        return PSeq(tuple(_normalize_path(PInv(p)) for p in reversed(s.parts)))
    if isinstance(s, PAlt):
        return PAlt(tuple(_normalize_path(PInv(p)) for p in s.parts))
    if isinstance(s, PClosure):
        return PClosure(_normalize_path(PInv(s.sub)), s.kind)
    if isinstance(s, PNeg):
        # ^(alt(NPS(f), inv(NPS(i)))) = alt(NPS(i), inv(NPS(f))): the
        # arms swap roles, exclusion lists intact
        return PNeg(fwd=s.inv, inv=s.fwd)
    raise TypeError(type(s))


def _path_display(e: PathExpr) -> str:
    """SPARQL 1.1 property-path surface syntax for resultPath cells."""
    if isinstance(e, PPred):
        return e.iri
    if isinstance(e, PInv):
        return f"^{_path_display(e.sub)}"
    if isinstance(e, PSeq):
        return "/".join(_maybe_paren(p) for p in e.parts)
    if isinstance(e, PAlt):
        return "|".join(_maybe_paren(p) for p in e.parts)
    if isinstance(e, PNeg):
        members = [f"<{p}>" for p in (e.fwd or ())] + [
            f"^<{p}>" for p in (e.inv or ())
        ]
        return f"!({'|'.join(members)})"
    sym = {"zeroOrMore": "*", "oneOrMore": "+", "zeroOrOne": "?"}[e.kind]
    return f"{_maybe_paren(e.sub)}{sym}"


def _maybe_paren(e: PathExpr) -> str:
    s = _path_display(e)
    return s if isinstance(e, (PPred, PInv, PNeg)) else f"({s})"


@dataclass
class NodeShape:
    shape_id: str
    target_classes: list[str] = field(default_factory=list)
    target_nodes: list[str] = field(default_factory=list)
    target_subjects_of: list[str] = field(default_factory=list)
    target_objects_of: list[str] = field(default_factory=list)
    implicit_class_target: bool = False
    deactivated: bool = False
    properties: list[PropertyConstraint] = field(default_factory=list)
    # constraints declared DIRECTLY on the node shape (W3C SHACL: node
    # shapes may carry value constraints that apply to the focus node
    # itself, e.g. sh:nodeKind / sh:pattern / sh:in) — path is None
    self_constraints: list[PropertyConstraint] = field(default_factory=list)
    closed: bool = False  # sh:closed
    ignored_properties: list[str] = field(default_factory=list)


@dataclass
class CompiledShapes:
    shapes: list[NodeShape]

    @property
    def constraints(self) -> list[PropertyConstraint]:
        return [c for s in self.shapes for c in s.properties]


# --------------------------------------------------------------------- S1
def collect_shapes_rows(shapes_triples: DataFrame) -> list:
    """Collect the (small) shapes graph to the driver ONCE. Every compile
    pass — core shape compilation, meta-SHACL raw checks, SHACL-AF
    constraint/target/custom-component compilation, rule compilation —
    reads this one list instead of re-scanning the frame, so an
    advanced-mode validate() pays a single shapes-side Spark job instead
    of one per compile pass (round-4 VERDICT #3)."""
    return shapes_triples.select(
        "s", "p", "o_kind", "o_value", "o_datatype", "o_lang"
    ).collect()


def compile_shapes(
    shapes_triples: DataFrame | None, rows: list | None = None
) -> CompiledShapes:
    """S1 — compile a (small) shapes graph into constraint records.

    Shapes graphs are tiny by construction (reference fixture: pySHACL's
    shacl-shacl.ttl); we collect() them to the driver — the same strategy
    pySHACL itself uses (in-memory shape compilation), and the broadcast
    pattern SURVEY.md S1 prescribes. The DATA graph is never collected.
    Pass pre-collected ``rows`` (collect_shapes_rows shape: objects with
    s/p/o_kind/o_value/o_datatype/o_lang attributes) to skip the scan.
    """
    if rows is None:
        rows = collect_shapes_rows(shapes_triples)
    # index: s -> p -> [(o_value, o_kind, o_datatype, o_lang)]
    spo: dict[str, dict[str, list[tuple[str, str, str | None, str | None]]]] = {}
    for r in rows:
        spo.setdefault(r.s, {}).setdefault(r.p, []).append(
            (r.o_value, r.o_kind, r.o_datatype, r.o_lang)
        )

    def objs(s: str, p: str) -> list[str]:
        return [t[0] for t in spo.get(s, {}).get(p, [])]

    def term(s: str, p: str) -> tuple[str, str, str | None, str | None] | None:
        ts = spo.get(s, {}).get(p, [])
        return ts[0] if ts else None

    def obj(s: str, p: str) -> str | None:
        vals = objs(s, p)
        return vals[0] if vals else None

    RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def rdf_list(node: str | None) -> list[str] | None:
        """Walk an rdf:first/rdf:rest collection (sh:in is an RDF list)."""
        terms = rdf_list_terms(node)
        return None if terms is None else [t[0] for t in terms]

    def rdf_list_terms(
        node: str | None,
    ) -> list[tuple[str, str, str | None, str | None]] | None:
        """rdf_list, but keeping full (value, kind, datatype, lang) terms —
        sh:in membership is RDF term identity, not string form."""
        if node is None:
            return None
        out: list[tuple[str, str, str | None, str | None]] = []
        seen: set[str] = set()
        while node and node != RDF_NS + "nil" and node not in seen:
            seen.add(node)
            first = term(node, RDF_NS + "first")
            if first is not None:
                out.append(first)
            node = obj(node, RDF_NS + "rest")
        return out

    # node shapes: anything typed sh:NodeShape, or with target declarations,
    # or an rdfs:Class with sh:property (implicit class target, SHACL §2.1.3.3)
    node_shape_ids: set[str] = set()
    for s, props in spo.items():
        types = objs(s, RDF_TYPE)
        if SH + "NodeShape" in types:
            node_shape_ids.add(s)
        if any(
            p in props
            for p in (
                SH + "targetClass",
                SH + "targetNode",
                SH + "targetSubjectsOf",
                SH + "targetObjectsOf",
                SH + "target",  # SHACL-AF custom targets (sh:SPARQLTarget)
            )
        ) and SH + "path" not in props:
            node_shape_ids.add(s)

    _VALUE_PREDS = (
        "datatype", "class", "nodeKind", "pattern", "minLength",
        "maxLength", "in", "hasValue", "node", "not", "or", "and",
        "languageIn", "xone",
        "minInclusive", "maxInclusive", "minExclusive", "maxExclusive",
    )

    def constraint_from(node_id: str, owner: str, path: str | None) -> PropertyConstraint:
        raw_min = obj(node_id, SH + "minCount")
        raw_max = obj(node_id, SH + "maxCount")
        raw_minlen = obj(node_id, SH + "minLength")
        raw_maxlen = obj(node_id, SH + "maxLength")
        return PropertyConstraint(
            shape_id=node_id,
            node_shape=owner,
            path=path,
            severity=obj(node_id, SH + "severity") or SH_VIOLATION,
            message=obj(node_id, SH + "message"),
            min_count=int(raw_min) if raw_min is not None else None,
            max_count=int(raw_max) if raw_max is not None else None,
            datatype=obj(node_id, SH + "datatype"),
            class_=obj(node_id, SH + "class"),
            node_kind=obj(node_id, SH + "nodeKind"),
            pattern=obj(node_id, SH + "pattern"),
            flags=obj(node_id, SH + "flags"),
            min_length=int(raw_minlen) if raw_minlen is not None else None,
            max_length=int(raw_maxlen) if raw_maxlen is not None else None,
            in_values=rdf_list(obj(node_id, SH + "in")),
            in_terms=rdf_list_terms(obj(node_id, SH + "in")),
            has_value=obj(node_id, SH + "hasValue"),
            has_value_term=term(node_id, SH + "hasValue"),
            node_ref=obj(node_id, SH + "node"),
            not_ref=obj(node_id, SH + "not"),
            or_refs=rdf_list(obj(node_id, SH + "or")),
            and_refs=rdf_list(obj(node_id, SH + "and")),
            language_in=rdf_list(obj(node_id, SH + "languageIn")),
            unique_lang=(obj(node_id, SH + "uniqueLang") == "true"),
            equals_=obj(node_id, SH + "equals"),
            disjoint=obj(node_id, SH + "disjoint"),
            less_than=obj(node_id, SH + "lessThan"),
            less_than_eq=obj(node_id, SH + "lessThanOrEquals"),
            xone_refs=rdf_list(obj(node_id, SH + "xone")),
            min_inclusive=obj(node_id, SH + "minInclusive"),
            max_inclusive=obj(node_id, SH + "maxInclusive"),
            min_exclusive=obj(node_id, SH + "minExclusive"),
            max_exclusive=obj(node_id, SH + "maxExclusive"),
            qualified_ref=obj(node_id, SH + "qualifiedValueShape"),
            q_min=(
                int(obj(node_id, SH + "qualifiedMinCount"))
                if obj(node_id, SH + "qualifiedMinCount") is not None
                else None
            ),
            q_max=(
                int(obj(node_id, SH + "qualifiedMaxCount"))
                if obj(node_id, SH + "qualifiedMaxCount") is not None
                else None
            ),
            q_disjoint=(
                obj(node_id, SH + "qualifiedValueShapesDisjoint") == "true"
            ),
        )

    def build_shape(sid: str) -> NodeShape:
        types = objs(sid, RDF_TYPE)
        ns = NodeShape(
            shape_id=sid,
            target_classes=sorted(objs(sid, SH + "targetClass")),
            target_nodes=sorted(objs(sid, SH + "targetNode")),
            target_subjects_of=sorted(objs(sid, SH + "targetSubjectsOf")),
            target_objects_of=sorted(objs(sid, SH + "targetObjectsOf")),
            implicit_class_target="http://www.w3.org/2000/01/rdf-schema#Class"
            in types
            or "http://www.w3.org/2002/07/owl#Class" in types,
            deactivated=(obj(sid, SH + "deactivated") == "true"),
            closed=(obj(sid, SH + "closed") == "true"),
            ignored_properties=rdf_list(obj(sid, SH + "ignoredProperties")) or [],
        )
        for pshape in objs(sid, SH + "property"):
            path = obj(pshape, SH + "path")
            if path is None:
                continue  # complex paths out of core scope
            # sh:path [ sh:inversePath p ] — the path object is a node
            # carrying an inversePath edge; sh:path ( p1 p2 ... ) — the
            # path object is an RDF list (sequence path)
            def parse_path(node: str) -> PathExpr:
                """Recursive SHACL path parser — handles ARBITRARY nesting
                (sequence of inverses, alternative of sequences, closure of
                inverse, ...), matching pySHACL's full path support."""
                inv_t = obj(node, SH + "inversePath")
                if inv_t is not None:
                    return PInv(parse_path(inv_t))
                alt_t = obj(node, SH + "alternativePath")
                if alt_t is not None:
                    return PAlt(tuple(parse_path(x) for x in rdf_list(alt_t) or ()))
                for pred_name, kind in (
                    ("zeroOrMorePath", "zeroOrMore"),
                    ("oneOrMorePath", "oneOrMore"),
                    ("zeroOrOnePath", "zeroOrOne"),
                ):
                    t = obj(node, SH + pred_name)
                    if t is not None:
                        return PClosure(parse_path(t), kind)
                if obj(node, RDF_NS + "first") is not None:
                    return PSeq(tuple(parse_path(x) for x in rdf_list(node) or ()))
                return PPred(node)

            expr = _normalize_path(parse_path(path))
            display = _path_display(expr)
            # flat forms keep their dedicated one/two-join plans; anything
            # nested evaluates through the generic path-algebra walker
            if isinstance(expr, PPred):
                pc = constraint_from(pshape, sid, expr.iri)
            elif isinstance(expr, PInv):
                pc = constraint_from(pshape, sid, expr.sub.iri)
                pc.inverse = True
            elif isinstance(expr, PSeq) and all(
                isinstance(p, PPred) for p in expr.parts
            ):
                pc = constraint_from(pshape, sid, display)
                pc.seq_path = [p.iri for p in expr.parts]
            elif isinstance(expr, PAlt) and all(
                isinstance(p, PPred) for p in expr.parts
            ):
                pc = constraint_from(pshape, sid, display)
                pc.alt_path = [p.iri for p in expr.parts]
            elif isinstance(expr, PClosure) and isinstance(expr.sub, PPred):
                pc = constraint_from(pshape, sid, display)
                pc.closure_path = expr.sub.iri
                pc.closure_kind = expr.kind
            else:
                pc = constraint_from(pshape, sid, display)
                pc.path_expr = expr
            ns.properties.append(pc)
        # sh:qualifiedValueShapesDisjoint: record the sibling qualified
        # shapes each disjoint-qualified constraint must exclude
        for pc in ns.properties:
            if pc.q_disjoint and pc.qualified_ref is not None:
                pc.sibling_q_refs = [
                    o.qualified_ref
                    for o in ns.properties
                    if o is not pc and o.qualified_ref is not None
                ]
        # value constraints declared directly on the node shape apply to
        # the focus node itself (min/maxCount are property-shape-only per
        # W3C SHACL and are ignored here)
        if any(SH + p in spo.get(sid, {}) for p in _VALUE_PREDS):
            sc = constraint_from(sid, sid, None)
            sc.min_count = None
            sc.max_count = None
            ns.self_constraints.append(sc)
        return ns

    def constraint_refs(ns: NodeShape) -> set[str]:
        refs: set[str] = set()
        for c in ns.properties + ns.self_constraints:
            if c.node_ref:
                refs.add(c.node_ref)
            if c.not_ref:
                refs.add(c.not_ref)
            if c.qualified_ref:
                refs.add(c.qualified_ref)
            refs.update(c.or_refs or [])
            refs.update(c.and_refs or [])
            refs.update(c.xone_refs or [])
        return refs

    shapes: list[NodeShape] = [build_shape(sid) for sid in sorted(node_shape_ids)]
    # shapes referenced from sh:node/sh:not/sh:or/sh:and may be inline
    # (untyped, target-less) — compile them too, chasing refs-of-refs
    built = set(node_shape_ids)
    pending = set().union(*(constraint_refs(s) for s in shapes), set()) - built
    while pending:
        new = [build_shape(sid) for sid in sorted(pending)]
        shapes.extend(new)
        built |= pending
        pending = set().union(*(constraint_refs(s) for s in new), set()) - built
    return CompiledShapes(shapes=shapes)


# --------------------------------------------------------------------- S2
def subclass_closure(
    ontology_triples: DataFrame | None, classes: set[str]
) -> dict[str, set[str]]:
    """Reflexive-transitive rdfs:subClassOf closure for the target classes.

    Ontologies are small relative to data; we run the fixpoint driver-side
    over collected subclass edges (SURVEY.md §4: fixpoint loops are the one
    thing Catalyst doesn't give us). Returns {class: {class + descendants}}.
    """
    closure = {c: {c} for c in classes}
    if ontology_triples is None:
        return closure
    edges = (
        ontology_triples.filter(F.col("p") == RDFS_SUBCLASSOF)
        .select("s", "o_value")
        .collect()
    )
    children: dict[str, set[str]] = {}
    for e in edges:
        children.setdefault(e.o_value, set()).add(e.s)
    for c in classes:
        frontier = {c}
        seen = {c}
        while frontier:
            nxt = set()
            for node in frontier:
                for ch in children.get(node, ()):  # descend
                    if ch not in seen:
                        seen.add(ch)
                        nxt.add(ch)
            frontier = nxt
        closure[c] = seen
    return closure


def _focus_nodes(
    spark: SparkSession,
    data: DataFrame,
    shape: NodeShape,
    closure: dict[str, set[str]],
) -> DataFrame | None:
    """S2–S4 — target selection. Returns DataFrame[focus, part_id] or None
    when the shape has no targets. part_id is the lineage partition the
    focus node was selected from (min when several), so zero-value focus
    nodes still report into their own partition (north_rule lineage)."""
    parts: list[DataFrame] = []
    classes: set[str] = set(shape.target_classes)
    if shape.implicit_class_target:
        classes.add(shape.shape_id)
    if classes:
        expanded = sorted(set().union(*(closure.get(c, {c}) for c in classes)))
        # instances of any class in the closure; the class list is tiny so
        # this is a pushed-down isin filter on the type triples — no join.
        parts.append(
            data.filter(
                (F.col("p") == RDF_TYPE) & F.col("o_value").isin(expanded)
            ).select(F.col("s").alias("focus"), F.col("part_id"))
        )
    if shape.target_nodes:
        parts.append(
            spark.createDataFrame(
                [(n, None) for n in shape.target_nodes],
                schema="focus string, part_id int",
            )
        )
    for pred in shape.target_subjects_of:
        parts.append(
            data.filter(F.col("p") == pred).select(
                F.col("s").alias("focus"), F.col("part_id")
            )
        )
    for pred in shape.target_objects_of:
        parts.append(
            data.filter((F.col("p") == pred) & (F.col("o_kind") == KIND_IRI)).select(
                F.col("o_value").alias("focus"), F.col("part_id")
            )
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy("focus").agg(F.min("part_id").alias("part_id"))


# ---------------------------------------------------------------- S5–S11
def _message(c: PropertyConstraint, component: str, default: str) -> str:
    return c.message if c.message is not None else default


def _result_row(
    focus: Column,
    path: str | None,
    value: Column,
    shape: str,
    component: str,
    message: Column | str,
    severity: str,
    part_id: Column,
    value_kind: Column | None = None,
    value_datatype: Column | None = None,
) -> list[Column]:
    msg = F.lit(message) if isinstance(message, str) else message
    vk = value_kind if value_kind is not None else F.lit(None).cast("string")
    vd = value_datatype if value_datatype is not None else F.lit(None).cast("string")
    return [
        focus.alias("focusNode"),
        F.lit(path).alias("resultPath"),
        value.alias("value"),
        F.lit(shape).alias("sourceShape"),
        F.lit(component).alias("sourceConstraintComponent"),
        msg.alias("resultMessage"),
        F.lit(severity).alias("resultSeverity"),
        part_id.alias("part_id"),
        vk.alias("value_kind"),
        vd.alias("value_datatype"),
    ]


def _vk() -> tuple[Column, Column]:
    """The standard (value_kind, value_datatype) pair for results whose
    offending value comes from the extracted values relation."""
    return (F.col("v_kind"), F.col("v_datatype"))


def _closure_values(
    data: DataFrame, focus: DataFrame, c: PropertyConstraint,
    max_iters: int | None = None,
) -> DataFrame:
    """sh:zeroOrMorePath / sh:oneOrMorePath / sh:zeroOrOnePath over a simple
    predicate — bounded reachability fixpoint from the focus set (pySHACL,
    which the reference delegates to at plugin_pyshacl.py:631-641, supports
    full SHACL property paths; this is the Spark-native equivalent).

    Returns DataFrame[focus, v_kind, v_value, v_datatype, v_lang, v_part_id]
    with SET semantics (each reachable term once per focus node).

    Scale posture: mirrors plans/connected_components.py — per-round
    localCheckpoint truncates lineage, the frontier (bounded by the focus
    set × fan-out) drives the join, and the edge relation is scanned once
    per round from the persisted path-sliced data (see validate()).
    """
    term = ["v_kind", "v_value", "v_datatype", "v_lang"]
    edges = data.filter(F.col("p") == c.closure_path).select(
        F.col("s").alias("src"),
        F.col("o_kind").alias("v_kind"),
        F.col("o_value").alias("v_value"),
        F.col("o_datatype").alias("v_datatype"),
        F.col("o_lang").alias("v_lang"),
        F.col("part_id").alias("v_part_id"),
    )
    seeds = focus.select("focus")
    small_focus = _is_small(focus)
    self_rows = seeds.select(
        "focus",
        F.lit(KIND_IRI).alias("v_kind"),
        F.col("focus").alias("v_value"),
        F.lit(None).cast("string").alias("v_datatype"),
        F.lit(None).cast("string").alias("v_lang"),
        F.lit(None).cast(T.IntegerType()).alias("v_part_id"),
    )
    # one hop from the focus set (broadcast the small side, gated)
    level1 = edges.join(
        _b(seeds.withColumnRenamed("focus", "src"), small_focus), on="src"
    ).withColumnRenamed("src", "focus")

    if max_iters is None:
        max_iters = _CLOSURE_MAX_ITERS.get()
    if c.closure_kind == "zeroOrOne":
        out = self_rows.unionByName(level1)
    else:
        acc = level1.localCheckpoint(eager=True)
        frontier = acc.filter(F.col("v_kind") == KIND_IRI).select(
            "focus", F.col("v_value").alias("src")
        ).distinct().localCheckpoint(eager=True)
        exhausted = True
        for _ in range(max_iters):
            if frontier.isEmpty():
                exhausted = False
                break
            stepped = edges.join(_b(frontier, small_focus), on="src").select(
                "focus", *term, "v_part_id"
            )
            new_rows = stepped.join(
                acc.select("focus", *term), on=["focus", *term], how="left_anti"
            ).localCheckpoint(eager=True)
            if new_rows.isEmpty():
                exhausted = False
                break
            acc = acc.unionByName(new_rows).localCheckpoint(eager=True)
            frontier = (
                new_rows.filter(F.col("v_kind") == KIND_IRI)
                .select("focus", F.col("v_value").alias("src"))
                .distinct()
                .localCheckpoint(eager=True)
            )
        if exhausted and not frontier.isEmpty():
            _warn_closure_truncated(c.closure_kind or "closure", max_iters)
        out = acc if c.closure_kind == "oneOrMore" else self_rows.unionByName(acc)
    return out.groupBy("focus", *term).agg(F.min("v_part_id").alias("v_part_id"))


_PATH_TERM = ["v_kind", "v_value", "v_datatype", "v_lang"]


def _path_step(data: DataFrame, frontier: DataFrame, expr: PathExpr) -> DataFrame:
    """One evaluation of a (normalized) path expression from a frontier.

    frontier: DataFrame[focus, node] — `node` is where traversal stands,
    `focus` the originating focus node. Returns DataFrame[focus, v_kind,
    v_value, v_datatype, v_lang, v_part_id] of reachable value nodes (NOT
    deduplicated — callers dedup by (focus, term) for set semantics).

    Scale notes: each leaf is a `p == iri` slice of the (persisted,
    predicate-sliced) relation joined with the frontier; no broadcast hint
    is forced here — nested-path frontiers can outgrow the focus set, so
    the build side is left to AQE. Closure leaves reuse the bounded,
    lineage-truncated fixpoint pattern of _closure_values."""
    if isinstance(expr, PPred):
        return (
            data.filter(F.col("p") == expr.iri)
            .join(frontier.withColumnRenamed("node", "s"), on="s")
            .select(
                "focus",
                F.col("o_kind").alias("v_kind"),
                F.col("o_value").alias("v_value"),
                F.col("o_datatype").alias("v_datatype"),
                F.col("o_lang").alias("v_lang"),
                F.col("part_id").alias("v_part_id"),
            )
        )
    if isinstance(expr, PInv):
        # normalized: sub is always PPred
        return (
            data.filter(F.col("p") == expr.sub.iri)
            .join(frontier.withColumnRenamed("node", "o_value"), on="o_value")
            .select(
                "focus",
                F.lit(KIND_IRI).alias("v_kind"),
                F.col("s").alias("v_value"),
                F.lit(None).cast("string").alias("v_datatype"),
                F.lit(None).cast("string").alias("v_lang"),
                F.col("part_id").alias("v_part_id"),
            )
        )
    if isinstance(expr, PNeg):
        # one hop over the COMPLEMENT of a predicate set — inherently a
        # broader slice than `p == iri` (the whole relation minus a few
        # predicates), but still bounded by the frontier join; the
        # inverse arm drops literal landing nodes (a literal cannot be
        # a pattern subject)
        parts = []
        if expr.fwd is not None:
            sl = (
                data.filter(~F.col("p").isin(list(expr.fwd)))
                if expr.fwd
                else data
            )
            parts.append(
                sl.join(frontier.withColumnRenamed("node", "s"), on="s").select(
                    "focus",
                    F.col("o_kind").alias("v_kind"),
                    F.col("o_value").alias("v_value"),
                    F.col("o_datatype").alias("v_datatype"),
                    F.col("o_lang").alias("v_lang"),
                    F.col("part_id").alias("v_part_id"),
                )
            )
        if expr.inv is not None:
            sl = (
                data.filter(~F.col("p").isin(list(expr.inv)))
                if expr.inv
                else data
            )
            parts.append(
                sl.join(
                    frontier.withColumnRenamed("node", "o_value"), on="o_value"
                ).select(
                    "focus",
                    F.lit(KIND_IRI).alias("v_kind"),
                    F.col("s").alias("v_value"),
                    F.lit(None).cast("string").alias("v_datatype"),
                    F.lit(None).cast("string").alias("v_lang"),
                    F.col("part_id").alias("v_part_id"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    if isinstance(expr, PSeq):
        cur = frontier
        for part in expr.parts[:-1]:
            vals = _path_step(data, cur, part)
            # literals cannot be traversed further (no outgoing edges)
            cur = (
                vals.filter(F.col("v_kind") != KIND_LITERAL)
                .select("focus", F.col("v_value").alias("node"))
                .distinct()
            )
        return _path_step(data, cur, expr.parts[-1])
    if isinstance(expr, PAlt):
        out = None
        for part in expr.parts:
            step = _path_step(data, frontier, part)
            out = step if out is None else out.unionByName(step)
        return out
    # PClosure
    self_rows = frontier.select(
        "focus",
        F.lit(KIND_IRI).alias("v_kind"),
        F.col("node").alias("v_value"),
        F.lit(None).cast("string").alias("v_datatype"),
        F.lit(None).cast("string").alias("v_lang"),
        F.lit(None).cast(T.IntegerType()).alias("v_part_id"),
    )
    level1 = _path_step(data, frontier, expr.sub).dropDuplicates(
        ["focus", *_PATH_TERM]
    )
    if expr.kind == "zeroOrOne":
        return self_rows.unionByName(level1)
    acc = level1.localCheckpoint(eager=True)
    frontier_i = (
        acc.filter(F.col("v_kind") != KIND_LITERAL)
        .select("focus", F.col("v_value").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    max_iters = _CLOSURE_MAX_ITERS.get()
    exhausted = True
    for _ in range(max_iters):
        if frontier_i.isEmpty():
            exhausted = False
            break
        stepped = _path_step(data, frontier_i, expr.sub)
        new_rows = (
            stepped.dropDuplicates(["focus", *_PATH_TERM])
            .join(
                acc.select("focus", *_PATH_TERM),
                on=["focus", *_PATH_TERM],
                how="left_anti",
            )
            .localCheckpoint(eager=True)
        )
        if new_rows.isEmpty():
            exhausted = False
            break
        acc = acc.unionByName(new_rows).localCheckpoint(eager=True)
        frontier_i = (
            new_rows.filter(F.col("v_kind") != KIND_LITERAL)
            .select("focus", F.col("v_value").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    if exhausted and not frontier_i.isEmpty():
        _warn_closure_truncated(f"nested {expr.kind}", max_iters)
    return acc if expr.kind == "oneOrMore" else self_rows.unionByName(acc)


def _eval_path_expr(
    data: DataFrame, focus: DataFrame, expr: PathExpr
) -> DataFrame:
    """Evaluate an arbitrarily nested path from the focus set; returns the
    standard DataFrame[focus, v_kind, v_value, v_datatype, v_lang,
    v_part_id] with SET semantics."""
    seeds = focus.select("focus", F.col("focus").alias("node"))
    return (
        _path_step(data, seeds, expr)
        .groupBy("focus", *_PATH_TERM)
        .agg(F.min("v_part_id").alias("v_part_id"))
    )


_NODEKIND_ALLOWED = {
    SH + "IRI": [KIND_IRI],
    SH + "Literal": [KIND_LITERAL],
    SH + "BlankNode": ["bnode"],
    SH + "BlankNodeOrIRI": ["bnode", KIND_IRI],
    SH + "BlankNodeOrLiteral": ["bnode", KIND_LITERAL],
    SH + "IRIOrLiteral": [KIND_IRI, KIND_LITERAL],
}


def _java_pattern(c: PropertyConstraint) -> str:
    """XPath flags -> Java embedded flags (SURVEY.md §7 hard part (c))."""
    pattern = c.pattern or ""
    if c.flags:
        java_flags = "".join(ch for ch in c.flags if ch in "imsxuU")
        if java_flags:
            pattern = f"(?{java_flags}){pattern}"
    return pattern


def _vterm_key() -> Column:
    return _term_key_col(
        F.col("v_kind"), F.col("v_value"), F.col("v_datatype"), F.col("v_lang")
    )


def _self_value_fail_parts(
    c: PropertyConstraint,
    shape_map: dict[str, "NodeShape"] | None,
    depth: int,
) -> list[Column]:
    """Per-constraint fail conditions over the term columns
    (v_kind/v_value/v_datatype/v_lang) — the Column-expression form of a
    shape's value-level constraints, applied directly to a value node with
    no path traversal. Used to evaluate shape-ref constraints against
    LITERAL values (round-1 ADVICE: 'sh:or over datatype sub-shapes never
    reported violations'). Constraints not expressible value-locally
    (property pairs, counts) contribute nothing here."""
    out: list[Column] = []
    v = F.col("v_value")
    if c.datatype is not None:
        cond = (
            _effective_datatype(F.col("v_kind"), F.col("v_datatype"), F.col("v_lang"))
            != c.datatype
        )
        lex = _LEXICAL_RE.get(c.datatype)
        if lex is not None:
            cond = cond | ~v.rlike(lex)
        out.append(cond)
    if c.node_kind is not None:
        out.append(~F.col("v_kind").isin(_NODEKIND_ALLOWED.get(c.node_kind, [KIND_IRI])))
    if c.class_ is not None:
        # a literal is never a SHACL instance of a class (pySHACL parity) —
        # a referenced shape carrying sh:class always fails a literal value
        out.append(F.col("v_kind") == KIND_LITERAL)
    if c.pattern is not None:
        out.append((F.col("v_kind") == "bnode") | ~v.rlike(_java_pattern(c)))
    if c.min_length is not None:
        out.append((F.col("v_kind") == "bnode") | (F.length(v) < c.min_length))
    if c.max_length is not None:
        out.append((F.col("v_kind") == "bnode") | (F.length(v) > c.max_length))
    if c.in_values is not None:
        keys = [_term_key_py(*t) for t in (c.in_terms or [])]
        out.append(~_vterm_key().isin(keys))
    if c.has_value is not None and c.has_value_term is not None:
        out.append(_vterm_key() != _term_key_py(*c.has_value_term))
    for bound, cmp_ok in (
        (c.min_inclusive, ">="), (c.max_inclusive, "<="),
        (c.min_exclusive, ">"), (c.max_exclusive, "<"),
    ):
        if bound is None:
            continue
        v_num = F.expr("try_cast(v_value as double)")
        b_num = F.expr(f"try_cast({bound!r} as double)")
        v_ts = F.expr("try_cast(v_value as timestamp)")
        b_ts = F.expr(f"try_cast({bound!r} as timestamp)")
        num_ops = {">=": v_num >= b_num, "<=": v_num <= b_num,
                   ">": v_num > b_num, "<": v_num < b_num}
        ts_ops = {">=": v_ts >= b_ts, "<=": v_ts <= b_ts,
                  ">": v_ts > b_ts, "<": v_ts < b_ts}
        cmp_col = F.when(
            v_num.isNotNull() & b_num.isNotNull(), num_ops[cmp_ok]
        ).otherwise(
            F.when(
                v_num.isNull() & b_num.isNull()
                & v_ts.isNotNull() & b_ts.isNotNull(),
                ts_ops[cmp_ok],
            )
        )
        ok = (F.col("v_kind") == KIND_LITERAL) & cmp_col.isNotNull() & cmp_col
        out.append(~ok)
    if c.language_in is not None:
        lang = F.lower(F.coalesce(F.col("v_lang"), F.lit("")))
        tag_ok = F.lit(False)
        for t in [t.lower() for t in c.language_in]:
            tag_ok = tag_ok | (lang == t) | lang.startswith(t + "-")
        out.append(
            ~((F.col("v_kind") == KIND_LITERAL) & F.col("v_lang").isNotNull() & tag_ok)
        )
    if shape_map is not None and depth < 8:
        def sub_fail(ref: str) -> Column | None:
            s = shape_map.get(ref)
            return None if s is None else _literal_fail_condition(s, shape_map, depth + 1)

        if c.node_ref is not None:
            sf = sub_fail(c.node_ref)
            if sf is not None:
                out.append(sf)
        if c.not_ref is not None:
            sf = sub_fail(c.not_ref)
            if sf is not None:
                out.append(~sf)
        if c.or_refs:
            subs = [sub_fail(r) for r in c.or_refs]
            if all(s is not None for s in subs):
                acc = subs[0]
                for s in subs[1:]:
                    acc = acc & s
                out.append(acc)  # fails every alternative
        if c.and_refs:
            subs = [sub_fail(r) for r in c.and_refs]
            if all(s is not None for s in subs):
                acc = subs[0]
                for s in subs[1:]:
                    acc = acc | s
                out.append(acc)  # fails any conjunct
        if c.xone_refs:
            subs = [sub_fail(r) for r in c.xone_refs]
            if all(s is not None for s in subs):
                conf_cnt = None
                for s in subs:
                    term_ = F.when(~s, F.lit(1)).otherwise(F.lit(0))
                    conf_cnt = term_ if conf_cnt is None else conf_cnt + term_
                out.append(conf_cnt != 1)
    return out


def _literal_fail_condition(
    shape: "NodeShape",
    shape_map: dict[str, "NodeShape"] | None,
    depth: int = 0,
) -> Column:
    """True when a LITERAL value node does NOT conform to `shape`:
    disjunction of the shape's self-constraint fail conditions, plus
    automatic failure when the shape requires properties (sh:minCount >= 1)
    — literals have no outgoing edges."""
    fail = F.lit(False)
    if shape.deactivated:
        return fail  # deactivated shapes conform everywhere (§2.1.3.2)
    if any(
        (pc.min_count is not None and pc.min_count > 0)
        or (pc.q_min is not None and pc.q_min >= 1)
        for pc in shape.properties
    ):
        return F.lit(True)
    for c in shape.self_constraints:
        for cond in _self_value_fail_parts(c, shape_map, depth):
            fail = fail | cond
    return fail


def evaluate_constraint(
    spark: SparkSession,
    data: DataFrame,
    focus: DataFrame,
    c: PropertyConstraint,
    closure: dict[str, set[str]],
    shape_map: dict[str, "NodeShape"] | None = None,
    max_depth: int = 15,
    depth: int = 0,
) -> list[DataFrame]:
    """S5–S11 — evaluate one compiled constraint.

    `focus` is DataFrame[focus, part_id]; `data` is the triples table.
    When `c.path` is None this is a NODE-shape constraint: the focus node
    itself is the (single, IRI-kind) value. `shape_map`/`max_depth`/`depth`
    drive sh:node shape-to-shape recursion. Returns a list of result
    DataFrames with RESULT_SCHEMA columns.
    """
    results: list[DataFrame] = []
    _TERM_COLS = ["focus", "v_kind", "v_value", "v_datatype", "v_lang"]
    if c.path is None:
        # self-values: the focus node is the value (focus nodes selected by
        # our targets are IRIs post-skolemization)
        present = focus.select(
            "focus",
            F.lit(KIND_IRI).alias("v_kind"),
            F.col("focus").alias("v_value"),
            F.lit(None).cast("string").alias("v_datatype"),
            F.lit(None).cast("string").alias("v_lang"),
            F.col("part_id"),
        )
    else:
        if c.alt_path:
            # alternative path (p1 | p2 | ...): union of each predicate's
            # values — a single isin filter on the predicate column. A value
            # node reachable via SEVERAL alternatives is ONE value node
            # (W3C SHACL property paths are set-semantics) — dedupe by term
            # so min/maxCount don't double-count (round-1 ADVICE finding).
            path_triples = (
                data.filter(F.col("p").isin(c.alt_path))
                .select(
                    F.col("s").alias("focus"),
                    F.col("o_kind").alias("v_kind"),
                    F.col("o_value").alias("v_value"),
                    F.col("o_datatype").alias("v_datatype"),
                    F.col("o_lang").alias("v_lang"),
                    F.col("part_id").alias("v_part_id"),
                )
                .groupBy(_TERM_COLS)
                .agg(F.min("v_part_id").alias("v_part_id"))
            )
        elif c.seq_path:
            # sequence path ( p1 p2 ... ): chain of joins hop-to-hop; the
            # intermediate node of hop i is the subject of hop i+1; distinct
            # value nodes (two routes to one node count once).
            hops = c.seq_path
            cur = data.filter(F.col("p") == hops[0]).select(
                F.col("s").alias("focus"),
                F.col("o_kind").alias("v_kind"),
                F.col("o_value").alias("v_value"),
                F.col("o_datatype").alias("v_datatype"),
                F.col("o_lang").alias("v_lang"),
                F.col("part_id").alias("v_part_id"),
            )
            for hop in hops[1:]:
                nxt = data.filter(F.col("p") == hop).select(
                    F.col("s").alias("v_value"),
                    F.col("o_kind").alias("_k2"),
                    F.col("o_value").alias("_v2"),
                    F.col("o_datatype").alias("_d2"),
                    F.col("o_lang").alias("_l2"),
                )
                cur = cur.join(nxt, on="v_value").select(
                    "focus",
                    F.col("_k2").alias("v_kind"),
                    F.col("_v2").alias("v_value"),
                    F.col("_d2").alias("v_datatype"),
                    F.col("_l2").alias("v_lang"),
                    "v_part_id",
                )
            path_triples = cur.groupBy(_TERM_COLS).agg(
                F.min("v_part_id").alias("v_part_id")
            )
        elif c.path_expr is not None:
            # arbitrarily nested path — generic path-algebra evaluation
            path_triples = _eval_path_expr(data, focus, c.path_expr)
        elif c.closure_kind is not None:
            # sh:zeroOrMorePath / sh:oneOrMorePath / sh:zeroOrOnePath —
            # bounded reachability fixpoint (see _closure_values)
            path_triples = _closure_values(data, focus, c)
        elif c.inverse:
            # inverse path: values of focus f are SUBJECTS of triples whose
            # object is f — subjects are IRIs (post-skolemization)
            path_triples = data.filter(F.col("p") == c.path).select(
                F.col("o_value").alias("focus"),
                F.lit(KIND_IRI).alias("v_kind"),
                F.col("s").alias("v_value"),
                F.lit(None).cast("string").alias("v_datatype"),
                F.lit(None).cast("string").alias("v_lang"),
                F.col("part_id").alias("v_part_id"),
            )
        else:
            path_triples = data.filter(F.col("p") == c.path).select(
                F.col("s").alias("focus"),
                F.col("o_kind").alias("v_kind"),
                F.col("o_value").alias("v_value"),
                F.col("o_datatype").alias("v_datatype"),
                F.col("o_lang").alias("v_lang"),
                F.col("part_id").alias("v_part_id"),
            )
        # S5 (round-1 VERDICT finding 1): INNER join with the focus set as
        # the BROADCAST BUILD SIDE. Spark cannot build-broadcast the
        # preserved side of an outer join — the old broadcast(focus)
        # left-join hint was silently dropped and the plan degenerated to a
        # full-shuffle SortMergeJoin of the triples table. Broadcast-right
        # INNER is a supported shape; zero-valued focus nodes are recovered
        # with a separate anti join only where minCount / hasValue need
        # them. The hint is size-GATED (_is_small): a billion-node focus
        # set leaves the join unhinted — AQE picks the runtime strategy and
        # the scale plan is a co-located join on `s`-bucketed storage.
        small_focus = _is_small(focus)
        f = focus.withColumnRenamed("part_id", "f_part_id")
        present = (
            path_triples.join(_b(f, small_focus), on="focus")
            .withColumn(
                "part_id", F.coalesce(F.col("f_part_id"), F.col("v_part_id"))
            )
            .drop("f_part_id", "v_part_id")
        )

    def _zero_focus() -> DataFrame:
        """Focus nodes with NO value on the path (anti join against the
        ≤|focus|-sized present keys); keeps the focus part_id. The hint
        follows the focus gate — present's keys are bounded by |focus|."""
        return focus.join(
            _b(present.select("focus"), _is_small(focus)),
            on="focus", how="left_anti",
        )

    if c.min_count is not None or c.max_count is not None:
        counts = present.groupBy("focus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("part_id").alias("part_id"),
        )
        if c.min_count is not None and c.min_count > 0:
            comp = SH + "MinCountConstraintComponent"
            low = counts.filter(F.col("cnt") < c.min_count).select(
                "focus", "part_id"
            )
            if c.path is not None:
                low = low.unionByName(_zero_focus())
            results.append(
                low.select(
                    *_result_row(
                        F.col("focus"),
                        c.path,
                        F.lit(None).cast("string"),
                        c.shape_id,
                        comp,
                        _message(c, comp, f"Less than {c.min_count} values on {c.path}"),
                        c.severity,
                        F.col("part_id"),
                    )
                )
            )
        if c.max_count is not None:
            comp = SH + "MaxCountConstraintComponent"
            results.append(
                counts.filter(F.col("cnt") > c.max_count).select(
                    *_result_row(
                        F.col("focus"),
                        c.path,
                        F.lit(None).cast("string"),
                        c.shape_id,
                        comp,
                        _message(c, comp, f"More than {c.max_count} values on {c.path}"),
                        c.severity,
                        F.col("part_id"),
                    )
                )
            )

    if c.datatype is not None:
        comp = SH + "DatatypeConstraintComponent"
        lex_re = _LEXICAL_RE.get(c.datatype)
        # effective datatype: lang-tagged literals are rdf:langString, plain
        # literals xsd:string (RDF 1.1) — so sh:datatype xsd:string rejects
        # "x"@en and sh:datatype rdf:langString requires a language tag
        bad = (F.col("v_kind") != KIND_LITERAL) | (
            _effective_datatype(
                F.col("v_kind"), F.col("v_datatype"), F.col("v_lang")
            )
            != c.datatype
        )
        if lex_re is not None:
            bad = bad | ~F.col("v_value").rlike(lex_re)
        results.append(
            present.filter(bad).select(
                *_result_row(
                    F.col("focus"),
                    c.path,
                    F.col("v_value"),
                    c.shape_id,
                    comp,
                    _message(c, comp, f"Value does not have datatype {c.datatype}"),
                    c.severity,
                    F.col("part_id"), *_vk(),
                )
            )
        )

    if c.class_ is not None:
        comp = SH + "ClassConstraintComponent"
        cls_set = sorted(closure.get(c.class_, {c.class_}))
        instances = (
            data.filter((F.col("p") == RDF_TYPE) & F.col("o_value").isin(cls_set))
            .select(F.col("s").alias("v_value"))
            .distinct()
        )
        # literals always violate sh:class; IRIs violate when not typed.
        lit_bad = present.filter(F.col("v_kind") != KIND_IRI)
        iri_bad = present.filter(F.col("v_kind") == KIND_IRI).join(
            instances, on="v_value", how="left_anti"
        )
        for bad_df in (lit_bad, iri_bad):
            results.append(
                bad_df.select(
                    *_result_row(
                        F.col("focus"),
                        c.path,
                        F.col("v_value"),
                        c.shape_id,
                        comp,
                        _message(c, comp, f"Value is not an instance of {c.class_}"),
                        c.severity,
                        F.col("part_id"), *_vk(),
                )
                )
            )

    if c.node_kind is not None:
        comp = SH + "NodeKindConstraintComponent"
        nk = c.node_kind
        allowed = {
            SH + "IRI": [KIND_IRI],
            SH + "Literal": [KIND_LITERAL],
            SH + "BlankNode": ["bnode"],
            SH + "BlankNodeOrIRI": ["bnode", KIND_IRI],
            SH + "BlankNodeOrLiteral": ["bnode", KIND_LITERAL],
            SH + "IRIOrLiteral": [KIND_IRI, KIND_LITERAL],
        }.get(nk, [KIND_IRI])
        results.append(
            present.filter(~F.col("v_kind").isin(allowed)).select(
                *_result_row(
                    F.col("focus"),
                    c.path,
                    F.col("v_value"),
                    c.shape_id,
                    comp,
                    _message(c, comp, f"Value does not have node kind {nk}"),
                    c.severity,
                    F.col("part_id"), *_vk(),
                )
            )
        )

    # value-range components (sh:min/maxInclusive/Exclusive, W3C §4.3):
    # numeric comparison when both sides parse as numbers; a value that is
    # not comparable with the bound violates
    for bound, comp_name, cmp_ok in (
        (c.min_inclusive, "MinInclusiveConstraintComponent", ">="),
        (c.max_inclusive, "MaxInclusiveConstraintComponent", "<="),
        (c.min_exclusive, "MinExclusiveConstraintComponent", ">"),
        (c.max_exclusive, "MaxExclusiveConstraintComponent", "<"),
    ):
        if bound is None:
            continue
        comp = SH + comp_name
        # SHACL §4.3: numeric bounds compare numerically; xsd:date /
        # xsd:dateTime / xsd:time bounds compare temporally (round-1 ADVICE:
        # the numeric-only version made every date a violation). A value
        # comparable in NEITHER domain violates.
        v_num = F.expr("try_cast(v_value as double)")
        b_num = F.expr(f"try_cast({bound!r} as double)")
        v_ts = F.expr("try_cast(v_value as timestamp)")
        b_ts = F.expr(f"try_cast({bound!r} as timestamp)")
        num_ops = {
            ">=": v_num >= b_num, "<=": v_num <= b_num,
            ">": v_num > b_num, "<": v_num < b_num,
        }
        ts_ops = {
            ">=": v_ts >= b_ts, "<=": v_ts <= b_ts,
            ">": v_ts > b_ts, "<": v_ts < b_ts,
        }
        # the temporal branch requires BOTH sides non-numeric (Spark would
        # otherwise parse a bare '18' as year-18), mixing domains violates
        cmp_col = F.when(
            v_num.isNotNull() & b_num.isNotNull(), num_ops[cmp_ok]
        ).otherwise(
            F.when(
                v_num.isNull() & b_num.isNull()
                & v_ts.isNotNull() & b_ts.isNotNull(),
                ts_ops[cmp_ok],
            )
        )
        ok = (
            (F.col("v_kind") == KIND_LITERAL)
            & cmp_col.isNotNull() & cmp_col
        )
        results.append(
            present.filter(~ok).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, f"Value is not {cmp_ok} {bound}"),
                    c.severity, F.col("part_id"), *_vk(),
                )
            )
        )

    if c.min_length is not None:
        comp = SH + "MinLengthConstraintComponent"
        # W3C SHACL §4.4.1: string form of the value node; bnodes always fail
        results.append(
            present.filter(
                (F.col("v_kind") == "bnode")
                | (F.length(F.col("v_value")) < c.min_length)
            ).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, f"Value has less than {c.min_length} characters"),
                    c.severity, F.col("part_id"), *_vk(),
                )
            )
        )

    if c.max_length is not None:
        comp = SH + "MaxLengthConstraintComponent"
        results.append(
            present.filter(
                (F.col("v_kind") == "bnode")
                | (F.length(F.col("v_value")) > c.max_length)
            ).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, f"Value has more than {c.max_length} characters"),
                    c.severity, F.col("part_id"), *_vk(),
                )
            )
        )

    if c.in_values is not None:
        comp = SH + "InConstraintComponent"
        # RDF term identity (kind + lexical + effective datatype + lang):
        # plain literals ≡ xsd:string, lang-tagged ≡ rdf:langString (RDF 1.1)
        allowed_keys = [_term_key_py(*t) for t in (c.in_terms or [])]
        vkey = _term_key_col(
            F.col("v_kind"), F.col("v_value"), F.col("v_datatype"), F.col("v_lang")
        )
        results.append(
            present.filter(~vkey.isin(allowed_keys)).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, "Value is not in the allowed list"),
                    c.severity, F.col("part_id"), *_vk(),
                )
            )
        )

    if c.has_value is not None:
        comp = SH + "HasValueConstraintComponent"
        # one result per FOCUS node whose value set lacks the required
        # value (RDF term identity) — anti join against the matching values
        if c.has_value_term is not None:
            hv_key = _term_key_py(*c.has_value_term)
            vkey = _term_key_col(
                F.col("v_kind"), F.col("v_value"), F.col("v_datatype"), F.col("v_lang")
            )
            matched = present.filter(vkey == hv_key).select("focus")
        else:
            matched = present.filter(F.col("v_value") == c.has_value).select("focus")
        results.append(
            focus.join(_b(matched, _is_small(focus)), on="focus", how="left_anti")
            .select(
                *_result_row(
                    F.col("focus"), c.path, F.lit(None).cast("string"),
                    c.shape_id, comp,
                    _message(c, comp, f"Value {c.has_value} is required"),
                    c.severity, F.col("part_id"),
                )
            )
        )

    if c.pattern is not None:
        comp = SH + "PatternConstraintComponent"
        # XPath flags -> Java embedded flags (SURVEY.md §7 hard part (c)).
        pattern = c.pattern
        if c.flags:
            java_flags = "".join(ch for ch in c.flags if ch in "imsxuU")
            if java_flags:
                pattern = f"(?{java_flags}){pattern}"
        # W3C SHACL §4.4.3: IRIs/literals are matched on their string form;
        # blank nodes always fail sh:pattern.
        results.append(
            present.filter(
                (F.col("v_kind") == "bnode") | ~F.col("v_value").rlike(pattern)
            ).select(
                *_result_row(
                    F.col("focus"),
                    c.path,
                    F.col("v_value"),
                    c.shape_id,
                    comp,
                    _message(c, comp, f"Value does not match pattern {c.pattern}"),
                    c.severity,
                    F.col("part_id"), *_vk(),
                )
            )
        )

    if c.language_in is not None:
        comp = SH + "LanguageInConstraintComponent"
        tags = [t.lower() for t in c.language_in]
        lang = F.lower(F.coalesce(F.col("v_lang"), F.lit("")))
        # W3C SHACL §4.5.3 / RFC 4647 basic filtering: each allowed tag is
        # a RANGE — the value's tag must equal it or extend it with more
        # subtags ('en' accepts 'en-GB'; 'en-GB' does NOT accept 'en-US'
        # or bare 'en').
        tag_ok = F.lit(False)
        for t in tags:
            tag_ok = tag_ok | (lang == t) | lang.startswith(t + "-")
        ok = (F.col("v_kind") == KIND_LITERAL) & (F.col("v_lang").isNotNull()) & tag_ok
        results.append(
            present.filter(~ok).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, "Value has no language tag from the allowed list"),
                    c.severity, F.col("part_id"), *_vk(),
                )
            )
        )

    if c.unique_lang:
        comp = SH + "UniqueLangConstraintComponent"
        dup = (
            present.filter(
                (F.col("v_kind") == KIND_LITERAL) & F.col("v_lang").isNotNull()
            )
            .groupBy("focus", F.lower(F.col("v_lang")).alias("_lang"))
            .agg(F.count(F.lit(1)).alias("_n"), F.min("part_id").alias("part_id"))
            .filter(F.col("_n") > 1)
        )
        results.append(
            dup.select(
                *_result_row(
                    F.col("focus"), c.path, F.col("_lang"), c.shape_id, comp,
                    _message(c, comp, "Language tag used more than once"),
                    c.severity, F.col("part_id"),
                )
            )
        )

    # ---- property-pair constraints (sh:equals / sh:disjoint /
    # sh:lessThan / sh:lessThanOrEquals): the value sets of the shape's
    # path and another predicate on the SAME focus node are compared.
    def _other_vals(pred: str) -> DataFrame:
        return data.filter(F.col("p") == pred).select(
            F.col("s").alias("focus"), F.col("o_value").alias("v2")
        )

    if c.equals_ is not None:
        comp = SH + "EqualsConstraintComponent"
        other = _other_vals(c.equals_)
        msg = _message(c, comp, f"Value set must equal values of {c.equals_}")
        # path values missing on the other side
        miss1 = present.join(
            other.withColumnRenamed("v2", "v_value"),
            on=["focus", "v_value"], how="left_anti",
        )
        results.append(
            miss1.select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id,
                    comp, msg, c.severity, F.col("part_id"), *_vk(),
                )
            )
        )
        # other-side values missing among path values (part_id via focus)
        miss2 = (
            other.join(
                present.select("focus", F.col("v_value").alias("v2")),
                on=["focus", "v2"], how="left_anti",
            )
            .join(focus, on="focus")
        )
        results.append(
            miss2.select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v2"), c.shape_id,
                    comp, msg, c.severity, F.col("part_id"),
                )
            )
        )

    if c.disjoint is not None:
        comp = SH + "DisjointConstraintComponent"
        overlap = present.join(
            _other_vals(c.disjoint).withColumnRenamed("v2", "v_value"),
            on=["focus", "v_value"], how="left_semi",
        )
        results.append(
            overlap.select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, f"Value must not also be a value of {c.disjoint}"),
                    c.severity, F.col("part_id"), *_vk(),
                )
            )
        )

    for pred, comp_name, op in (
        (c.less_than, "LessThanConstraintComponent", "<"),
        (c.less_than_eq, "LessThanOrEqualsConstraintComponent", "<="),
    ):
        if pred is None:
            continue
        comp = SH + comp_name
        paired = present.join(_other_vals(pred), on="focus")
        # numeric-aware comparison: numbers compare numerically, otherwise
        # lexical string order (try_cast stays ANSI-safe)
        a_num = F.expr("try_cast(v_value as double)")
        b_num = F.expr("try_cast(v2 as double)")
        if op == "<":
            ok = F.when(
                a_num.isNotNull() & b_num.isNotNull(), a_num < b_num
            ).otherwise(F.col("v_value") < F.col("v2"))
        else:
            ok = F.when(
                a_num.isNotNull() & b_num.isNotNull(), a_num <= b_num
            ).otherwise(F.col("v_value") <= F.col("v2"))
        results.append(
            paired.filter(~ok)
            .dropDuplicates(["focus", "v_value"])
            .select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, f"Value must be {op} every value of {pred}"),
                    c.severity, F.col("part_id"), *_vk(),
                )
            )
        )

    # ---- shape-to-shape logical components (sh:node / sh:not / sh:or /
    # sh:and). Recursion is bounded by max_validation_depth (the reference
    # range-checks the same bound, plugin_pyshacl.py:296-305, :589-590);
    # past the bound, or for non-IRI values, sub-shapes are treated as
    # conforming (documented core approximation).
    # Shape-ref sets are keyed by the FULL term key (_term_key_col over
    # v_kind/v_value/v_datatype/v_lang), not the bare lexical form — a bare
    # v_value key conflates distinct RDF terms sharing a lexical form
    # ("5"^^xsd:integer vs "5"^^xsd:string, or an IRI equal to a literal's
    # lexical form) and corrupts or/xone conform counts (round-2 ADVICE).
    present_tk = present.withColumn("_tk", _vterm_key())

    def noncon_values(ref_id: str) -> DataFrame | None:
        """Distinct DataFrame[_tk] (full term keys) of values NOT conforming
        to the referenced shape, or None when the ref can't be expanded.
        IRI values recurse through full shape evaluation; LITERAL values are
        checked value-locally via _literal_fail_condition (no path
        traversal is possible or needed for literals)."""
        ref = (shape_map or {}).get(ref_id)
        if ref is None or depth >= max_depth:
            return None
        sub_focus = (
            present.filter(F.col("v_kind") == KIND_IRI)
            .select(F.col("v_value").alias("focus"), "part_id")
            .groupBy("focus")
            .agg(F.min("part_id").alias("part_id"))
        )
        sub_results = _evaluate_shape(
            spark, data, sub_focus, ref, closure, shape_map, max_depth,
            depth + 1,
        )
        lit_noncon = (
            present.filter(F.col("v_kind") == KIND_LITERAL)
            .select("v_kind", "v_value", "v_datatype", "v_lang")
            .distinct()
            .filter(_literal_fail_condition(ref, shape_map))
            .select(_vterm_key().alias("_tk"))
        )
        if not sub_results:
            return lit_noncon.distinct()
        noncon = sub_results[0].select("focusNode")
        for df in sub_results[1:]:
            noncon = noncon.unionByName(df.select("focusNode"))
        iri_noncon = noncon.select(
            _term_key_col(
                F.lit(KIND_IRI), F.col("focusNode"),
                F.lit(None).cast("string"), F.lit(None).cast("string"),
            ).alias("_tk")
        )
        return iri_noncon.unionByName(lit_noncon).distinct()

    def value_results(bad_keys: DataFrame, comp: str, default_msg: str) -> DataFrame:
        return present_tk.join(bad_keys, on="_tk", how="left_semi").select(
            *_result_row(
                F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                _message(c, comp, default_msg), c.severity, F.col("part_id"), *_vk(),
                )
        )

    if c.node_ref is not None and shape_map is not None:
        comp = SH + "NodeConstraintComponent"
        noncon = noncon_values(c.node_ref)
        if noncon is not None:
            results.append(
                value_results(
                    noncon, comp,
                    f"Value does not conform to shape {c.node_ref}",
                )
            )

    if c.not_ref is not None and shape_map is not None:
        comp = SH + "NotConstraintComponent"
        noncon = noncon_values(c.not_ref)
        if noncon is not None:
            # violation iff the value DOES conform: all values minus noncon
            conforming = (
                present_tk.filter(F.col("v_kind") != "bnode")
                .select("_tk")
                .distinct()
                .join(noncon, on="_tk", how="left_anti")
            )
            results.append(
                value_results(
                    conforming, comp,
                    f"Value must not conform to shape {c.not_ref}",
                )
            )

    if c.or_refs and shape_map is not None:
        comp = SH + "OrConstraintComponent"
        noncons = [noncon_values(r) for r in c.or_refs]
        if all(n is not None for n in noncons):
            # violation iff the value fails EVERY alternative: intersection
            bad = noncons[0]
            for n in noncons[1:]:
                bad = bad.join(n, on="_tk", how="left_semi")
            results.append(
                value_results(bad, comp, "Value matches none of the sh:or shapes")
            )

    if c.and_refs and shape_map is not None:
        comp = SH + "AndConstraintComponent"
        noncons = [noncon_values(r) for r in c.and_refs]
        if all(n is not None for n in noncons):
            # violation iff the value fails ANY conjunct: union
            bad = noncons[0]
            for n in noncons[1:]:
                bad = bad.unionByName(n)
            results.append(
                value_results(
                    bad.distinct(), comp,
                    "Value does not match every sh:and shape",
                )
            )

    if c.xone_refs and shape_map is not None:
        comp = SH + "XoneConstraintComponent"
        noncons = [noncon_values(r) for r in c.xone_refs]
        if all(n is not None for n in noncons):
            # conform-count per value = n_shapes - (#noncon sets holding it);
            # violation iff conform-count != 1
            universe = (
                present_tk.filter(F.col("v_kind") != "bnode")
                .select("_tk")
                .distinct()
            )
            marked = noncons[0].select("_tk")
            for n in noncons[1:]:
                marked = marked.unionByName(n.select("_tk"))
            ncnt = marked.groupBy("_tk").agg(F.count(F.lit(1)).alias("_nc"))
            bad = (
                universe.join(ncnt, on="_tk", how="left")
                .withColumn(
                    "_conf", F.lit(len(c.xone_refs)) - F.coalesce(F.col("_nc"), F.lit(0))
                )
                .filter(F.col("_conf") != 1)
                .select("_tk")
            )
            results.append(
                value_results(bad, comp, "Value must match exactly one sh:xone shape")
            )

    if (
        c.qualified_ref is not None
        and shape_map is not None
        and (c.q_min is not None or c.q_max is not None)
    ):
        noncon = noncon_values(c.qualified_ref)
        if noncon is not None:
            countable = present_tk.filter(F.col("v_kind") != "bnode").join(
                noncon, on="_tk", how="left_anti"
            )
            if c.q_disjoint and c.sibling_q_refs:
                # sh:qualifiedValueShapesDisjoint (W3C SHACL §4.5.4): value
                # nodes that ALSO conform to a sibling qualifiedValueShape
                # are excluded from this shape's count
                for sib_ref in c.sibling_q_refs:
                    sib_noncon = noncon_values(sib_ref)
                    if sib_noncon is None:
                        continue  # unexpandable sibling: lenient skip
                    sib_conforming = (
                        present_tk.filter(F.col("v_kind") != "bnode")
                        .select("_tk")
                        .distinct()
                        .join(sib_noncon, on="_tk", how="left_anti")
                    )
                    countable = countable.join(
                        sib_conforming, on="_tk", how="left_anti"
                    )
            conforming = countable.groupBy("focus").agg(
                F.count(F.lit(1)).alias("_qc")
            )
            qcounts = (
                focus.join(conforming, on="focus", how="left")
                .withColumn("_qc", F.coalesce(F.col("_qc"), F.lit(0)))
            )
            if c.q_min is not None:
                comp = SH + "QualifiedMinCountConstraintComponent"
                results.append(
                    qcounts.filter(F.col("_qc") < c.q_min).select(
                        *_result_row(
                            F.col("focus"), c.path, F.lit(None).cast("string"),
                            c.shape_id, comp,
                            _message(
                                c, comp,
                                f"Less than {c.q_min} values conform to "
                                f"{c.qualified_ref}",
                            ),
                            c.severity, F.col("part_id"),
                        )
                    )
                )
            if c.q_max is not None:
                comp = SH + "QualifiedMaxCountConstraintComponent"
                results.append(
                    qcounts.filter(F.col("_qc") > c.q_max).select(
                        *_result_row(
                            F.col("focus"), c.path, F.lit(None).cast("string"),
                            c.shape_id, comp,
                            _message(
                                c, comp,
                                f"More than {c.q_max} values conform to "
                                f"{c.qualified_ref}",
                            ),
                            c.severity, F.col("part_id"),
                        )
                    )
                )
    return results


# ---------------------------------------------------------- batched path
# Catalogs with MANY property shapes (50-200 constraints is a normal
# enterprise shapes graph) pay ~0.4 s of Catalyst analysis per constraint
# when each gets its own plan — a 200-constraint catalog spent >2 min just
# BUILDING plans. Above this threshold, simple-path count/value constraints
# are evaluated through ONE constraint-table-driven plan per constraint
# TYPE: the (tiny) compiled constraint table broadcasts, the data joins it
# once, and per-constraint parameters become columns. Per-constraint plans
# remain for complex paths / shape refs / pair constraints.
_BATCH_THRESHOLD = 16


def _is_batchable(c: PropertyConstraint) -> bool:
    return (
        c.path is not None
        and not (c.inverse or c.seq_path or c.alt_path or c.closure_kind)
        and c.path_expr is None
        and c.node_ref is None and c.not_ref is None
        and not c.or_refs and not c.and_refs and not c.xone_refs
        and c.qualified_ref is None
        and c.equals_ is None and c.disjoint is None
        and c.less_than is None and c.less_than_eq is None
        and not c.unique_lang
    )


def _evaluate_simple_batch(
    spark: SparkSession,
    data: DataFrame,
    focus: DataFrame,
    constraints: list[PropertyConstraint],
    closure: dict[str, set[str]] | None = None,
) -> list[DataFrame]:
    """Evaluate simple-path count/value constraints via a broadcast
    constraint table — a FIXED number of plans regardless of how many
    constraints the catalog declares."""
    ct_rows = []
    for c in constraints:
        ct_rows.append(
            (
                c.path, c.shape_id, c.severity, c.message,
                c.min_count, c.max_count,
                c.datatype, _LEXICAL_RE.get(c.datatype) if c.datatype else None,
                _NODEKIND_ALLOWED.get(c.node_kind, [KIND_IRI]) if c.node_kind else None,
                c.node_kind,
                _java_pattern(c) if c.pattern is not None else None,
                c.pattern,
                c.min_length, c.max_length,
                c.min_inclusive, c.max_inclusive, c.min_exclusive, c.max_exclusive,
                c.class_,
                [_term_key_py(*t) for t in c.in_terms] if c.in_terms is not None else None,
                _term_key_py(*c.has_value_term) if c.has_value_term is not None else None,
                c.has_value,
                [t.lower() for t in c.language_in] if c.language_in is not None else None,
            )
        )
    ct_schema = (
        "p string, shape_id string, severity string, message string, "
        "min_count int, max_count int, datatype string, lex_re string, "
        "nk_allowed array<string>, node_kind string, pattern_java string, "
        "pattern_raw string, min_len int, max_len int, "
        "min_inc string, max_inc string, min_exc string, max_exc string, "
        "class string, in_keys array<string>, hv_key string, hv_display string, "
        "lang_tags array<string>"
    )
    ct = F.broadcast(spark.createDataFrame(ct_rows, schema=ct_schema))
    paths = sorted({c.path for c in constraints})

    small_focus = _is_small(focus)
    f = focus.withColumnRenamed("part_id", "f_part_id")
    vals = (
        data.filter(F.col("p").isin(paths))
        .select(
            F.col("s").alias("focus"), "p",
            F.col("o_kind").alias("v_kind"),
            F.col("o_value").alias("v_value"),
            F.col("o_datatype").alias("v_datatype"),
            F.col("o_lang").alias("v_lang"),
            F.col("part_id").alias("v_part_id"),
        )
        .join(_b(f, small_focus), on="focus")
        .withColumn("part_id", F.coalesce(F.col("f_part_id"), F.col("v_part_id")))
        .drop("f_part_id", "v_part_id")
        .join(ct, on="p")
    )

    def row(component: Column | str, message: Column, value: Column,
            vk: Column, vd: Column, src: DataFrame, path_col: Column) -> DataFrame:
        comp = F.lit(component) if isinstance(component, str) else component
        return src.select(
            F.col("focus").alias("focusNode"),
            path_col.alias("resultPath"),
            value.alias("value"),
            F.col("shape_id").alias("sourceShape"),
            comp.alias("sourceConstraintComponent"),
            F.coalesce(F.col("message"), message).alias("resultMessage"),
            F.col("severity").alias("resultSeverity"),
            F.col("part_id").alias("part_id"),
            vk.alias("value_kind"),
            vd.alias("value_datatype"),
        )

    out: list[DataFrame] = []
    vnull = F.lit(None).cast("string")

    # ---- counts: ONE aggregation for every min/max constraint
    if any(c.min_count is not None or c.max_count is not None for c in constraints):
        counts = vals.groupBy(
            "focus", "p", "shape_id", "severity", "message",
            "min_count", "max_count",
        ).agg(F.count(F.lit(1)).alias("cnt"), F.min("part_id").alias("part_id"))
        out.append(
            row(
                SH + "MinCountConstraintComponent",
                F.concat(F.lit("Less than "), F.col("min_count").cast("string"),
                         F.lit(" values on "), F.col("p")),
                vnull, vnull, vnull,
                counts.filter(
                    F.col("min_count").isNotNull()
                    & (F.col("cnt") < F.col("min_count"))
                ),
                F.col("p"),
            )
        )
        out.append(
            row(
                SH + "MaxCountConstraintComponent",
                F.concat(F.lit("More than "), F.col("max_count").cast("string"),
                         F.lit(" values on "), F.col("p")),
                vnull, vnull, vnull,
                counts.filter(
                    F.col("max_count").isNotNull()
                    & (F.col("cnt") > F.col("max_count"))
                ),
                F.col("p"),
            )
        )
        # zero-value recovery for minCount: focus × (tiny) constraint rows
        # via explode of a literal array — no join, no cartesian node
        min_specs = [
            (c.path, c.shape_id, c.severity, c.message, c.min_count)
            for c in constraints
            if c.min_count is not None and c.min_count > 0
        ]
        if min_specs:
            spec_arr = F.array(*[
                F.struct(
                    F.lit(p0).alias("p"), F.lit(sid).alias("shape_id"),
                    F.lit(sev).alias("severity"),
                    F.lit(msg).cast("string").alias("message"),
                    F.lit(mc).alias("min_count"),
                )
                for p0, sid, sev, msg, mc in min_specs
            ])
            zero = (
                focus.withColumn("_c", F.explode(spec_arr))
                .select(
                    "focus", "part_id",
                    F.col("_c.p").alias("p"),
                    F.col("_c.shape_id").alias("shape_id"),
                    F.col("_c.severity").alias("severity"),
                    F.col("_c.message").alias("message"),
                    F.col("_c.min_count").alias("min_count"),
                )
                .join(
                    _b(
                        vals.select("focus", "p", "shape_id").distinct(),
                        small_focus,
                    ),
                    on=["focus", "p", "shape_id"],
                    how="left_anti",
                )
            )
            out.append(
                row(
                    SH + "MinCountConstraintComponent",
                    F.concat(F.lit("Less than "), F.col("min_count").cast("string"),
                             F.lit(" values on "), F.col("p")),
                    vnull, vnull, vnull, zero, F.col("p"),
                )
            )

    vk = (F.col("v_kind"), F.col("v_datatype"))
    vv = F.col("v_value")

    # ---- datatype
    if any(c.datatype is not None for c in constraints):
        eff = _effective_datatype(F.col("v_kind"), F.col("v_datatype"), F.col("v_lang"))
        bad = (F.col("v_kind") != KIND_LITERAL) | (eff != F.col("datatype")) | (
            F.col("lex_re").isNotNull() & ~F.expr("rlike(v_value, lex_re)")
        )
        out.append(
            row(
                SH + "DatatypeConstraintComponent",
                F.concat(F.lit("Value does not have datatype "), F.col("datatype")),
                vv, *vk,
                vals.filter(F.col("datatype").isNotNull() & bad),
                F.col("p"),
            )
        )

    # ---- nodeKind
    if any(c.node_kind is not None for c in constraints):
        out.append(
            row(
                SH + "NodeKindConstraintComponent",
                F.concat(F.lit("Value does not have node kind "), F.col("node_kind")),
                vv, *vk,
                vals.filter(
                    F.col("nk_allowed").isNotNull()
                    & ~F.array_contains(F.col("nk_allowed"), F.col("v_kind"))
                ),
                F.col("p"),
            )
        )

    # ---- pattern (column-valued regex: rlike(left, right))
    if any(c.pattern is not None for c in constraints):
        out.append(
            row(
                SH + "PatternConstraintComponent",
                F.concat(F.lit("Value does not match pattern "), F.col("pattern_raw")),
                vv, *vk,
                vals.filter(
                    F.col("pattern_java").isNotNull()
                    & ((F.col("v_kind") == "bnode")
                       | ~F.expr("rlike(v_value, pattern_java)"))
                ),
                F.col("p"),
            )
        )

    # ---- lengths
    if any(c.min_length is not None for c in constraints):
        out.append(
            row(
                SH + "MinLengthConstraintComponent",
                F.concat(F.lit("Value has less than "),
                         F.col("min_len").cast("string"), F.lit(" characters")),
                vv, *vk,
                vals.filter(
                    F.col("min_len").isNotNull()
                    & ((F.col("v_kind") == "bnode")
                       | (F.length(vv) < F.col("min_len")))
                ),
                F.col("p"),
            )
        )
    if any(c.max_length is not None for c in constraints):
        out.append(
            row(
                SH + "MaxLengthConstraintComponent",
                F.concat(F.lit("Value has more than "),
                         F.col("max_len").cast("string"), F.lit(" characters")),
                vv, *vk,
                vals.filter(
                    F.col("max_len").isNotNull()
                    & ((F.col("v_kind") == "bnode")
                       | (F.length(vv) > F.col("max_len")))
                ),
                F.col("p"),
            )
        )

    # ---- value ranges (numeric, then temporal; incomparable violates)
    for bound_col, comp_name, cmp_ok in (
        ("min_inc", "MinInclusiveConstraintComponent", ">="),
        ("max_inc", "MaxInclusiveConstraintComponent", "<="),
        ("min_exc", "MinExclusiveConstraintComponent", ">"),
        ("max_exc", "MaxExclusiveConstraintComponent", "<"),
    ):
        if not any(getattr(c, {
            "min_inc": "min_inclusive", "max_inc": "max_inclusive",
            "min_exc": "min_exclusive", "max_exc": "max_exclusive",
        }[bound_col]) is not None for c in constraints):
            continue
        v_num = F.expr("try_cast(v_value as double)")
        b_num = F.expr(f"try_cast({bound_col} as double)")
        v_ts = F.expr("try_cast(v_value as timestamp)")
        b_ts = F.expr(f"try_cast({bound_col} as timestamp)")
        num_ops = {">=": v_num >= b_num, "<=": v_num <= b_num,
                   ">": v_num > b_num, "<": v_num < b_num}
        ts_ops = {">=": v_ts >= b_ts, "<=": v_ts <= b_ts,
                  ">": v_ts > b_ts, "<": v_ts < b_ts}
        cmp_col = F.when(
            v_num.isNotNull() & b_num.isNotNull(), num_ops[cmp_ok]
        ).otherwise(
            F.when(
                v_num.isNull() & b_num.isNull()
                & v_ts.isNotNull() & b_ts.isNotNull(),
                ts_ops[cmp_ok],
            )
        )
        ok = (F.col("v_kind") == KIND_LITERAL) & cmp_col.isNotNull() & cmp_col
        out.append(
            row(
                SH + comp_name,
                F.concat(F.lit(f"Value is not {cmp_ok} "), F.col(bound_col)),
                vv, *vk,
                vals.filter(F.col(bound_col).isNotNull() & ~ok),
                F.col("p"),
            )
        )

    # ---- sh:in (term identity via precomputed key arrays)
    if any(c.in_values is not None for c in constraints):
        vkey = _vterm_key()
        out.append(
            row(
                SH + "InConstraintComponent",
                F.lit("Value is not in the allowed list"),
                vv, *vk,
                vals.filter(
                    F.col("in_keys").isNotNull()
                    & ~F.array_contains(F.col("in_keys"), vkey)
                ),
                F.col("p"),
            )
        )

    # ---- sh:hasValue: per-FOCUS anti join (explode the tiny spec list)
    hv_specs = [
        (c.path, c.shape_id, c.severity, c.message,
         _term_key_py(*c.has_value_term) if c.has_value_term is not None else None,
         c.has_value)
        for c in constraints
        if c.has_value is not None
    ]
    if hv_specs:
        vkey = _vterm_key()
        matched = (
            vals.filter(F.col("hv_key").isNotNull() & (vkey == F.col("hv_key")))
            .select("focus", "p", "shape_id")
            .distinct()
        )
        hv_arr = F.array(*[
            F.struct(
                F.lit(p0).alias("p"), F.lit(sid).alias("shape_id"),
                F.lit(sev).alias("severity"),
                F.lit(msg).cast("string").alias("message"),
                F.lit(disp).alias("hv_display"),
            )
            for p0, sid, sev, msg, _k, disp in hv_specs
        ])
        missing = (
            focus.withColumn("_c", F.explode(hv_arr))
            .select(
                "focus", "part_id",
                F.col("_c.p").alias("p"),
                F.col("_c.shape_id").alias("shape_id"),
                F.col("_c.severity").alias("severity"),
                F.col("_c.message").alias("message"),
                F.col("_c.hv_display").alias("hv_display"),
            )
            .join(
                _b(matched, small_focus),
                on=["focus", "p", "shape_id"], how="left_anti",
            )
        )
        out.append(
            row(
                SH + "HasValueConstraintComponent",
                F.concat(F.lit("Value "), F.col("hv_display"),
                         F.lit(" is required")),
                vnull, vnull, vnull, missing, F.col("p"),
            )
        )

    # ---- sh:languageIn (RFC 4647 ranges over a tag array column)
    if any(c.language_in is not None for c in constraints):
        lang = F.lower(F.coalesce(F.col("v_lang"), F.lit("")))
        tag_ok = F.exists(
            F.col("lang_tags"),
            lambda t: (lang == t) | lang.startswith(F.concat(t, F.lit("-"))),
        )
        ok = (
            (F.col("v_kind") == KIND_LITERAL)
            & F.col("v_lang").isNotNull() & tag_ok
        )
        out.append(
            row(
                SH + "LanguageInConstraintComponent",
                F.lit("Value has no language tag from the allowed list"),
                vv, *vk,
                vals.filter(F.col("lang_tags").isNotNull() & ~ok),
                F.col("p"),
            )
        )

    # ---- sh:class: ONE anti join against the (class, instance) relation.
    # The (constraint-class -> closure-member) map is tiny and broadcast;
    # instances of any closure member become (constraint_class, instance)
    # pairs; IRI values missing their pair violate, literals always do.
    if any(c.class_ is not None for c in constraints):
        cls_pairs = sorted({
            (c.class_, member)
            for c in constraints
            if c.class_ is not None
            for member in (closure or {}).get(c.class_, {c.class_})
        })
        cls_map = F.broadcast(
            spark.createDataFrame(cls_pairs, schema="class string, member string")
        )
        instances = (
            data.filter(F.col("p") == RDF_TYPE)
            .select(F.col("s").alias("v_value"), F.col("o_value").alias("member"))
            .join(cls_map, on="member")
            .select("class", "v_value")
            .distinct()
        )
        cls_vals = vals.filter(F.col("class").isNotNull())
        cls_msg = F.concat(
            F.lit("Value is not an instance of "), F.col("class")
        )
        out.append(
            row(
                SH + "ClassConstraintComponent", cls_msg, vv, *vk,
                cls_vals.filter(F.col("v_kind") != KIND_IRI),
                F.col("p"),
            )
        )
        out.append(
            row(
                SH + "ClassConstraintComponent", cls_msg, vv, *vk,
                cls_vals.filter(F.col("v_kind") == KIND_IRI).join(
                    instances, on=["class", "v_value"], how="left_anti"
                ),
                F.col("p"),
            )
        )
    return out


def _evaluate_shape(
    spark: SparkSession,
    data: DataFrame,
    focus: DataFrame,
    shape: NodeShape,
    closure: dict[str, set[str]],
    shape_map: dict[str, NodeShape],
    max_depth: int,
    depth: int,
) -> list[DataFrame]:
    """Evaluate ALL of a shape's constraints (self + property + closed)
    against an explicit focus set — the sh:node recursion entry point (no
    target selection)."""
    out: list[DataFrame] = []
    if shape.deactivated:
        # W3C SHACL §2.1.3.2: a deactivated shape has NO effect — every
        # focus node conforms, including when reached via shape refs
        return out
    for sc in shape.self_constraints:
        out.extend(
            evaluate_constraint(
                spark, data, focus, sc, closure, shape_map, max_depth, depth
            )
        )
    batchable = [pc for pc in shape.properties if _is_batchable(pc)]
    per_constraint = shape.properties
    if len(batchable) >= _BATCH_THRESHOLD:
        out.extend(_evaluate_simple_batch(spark, data, focus, batchable, closure))
        batch_ids = {id(pc) for pc in batchable}
        per_constraint = [pc for pc in shape.properties if id(pc) not in batch_ids]
    for pc in per_constraint:
        out.extend(
            evaluate_constraint(
                spark, data, focus, pc, closure, shape_map, max_depth, depth
            )
        )
    if shape.closed:
        # sh:closed — one result per (focus, value) whose predicate is
        # neither a declared simple property path nor ignored
        comp = SH + "ClosedConstraintComponent"
        allowed = sorted(
            {pc.path for pc in shape.properties if pc.path and not pc.inverse and not pc.seq_path}
            | set(shape.ignored_properties)
        )
        # sh:closed needs EVERY predicate, so it joins the big table with
        # the focus set as the broadcast build side of an INNER join (the
        # supported broadcast shape; see the S5 note in
        # evaluate_constraint). Gated like S5.
        extra = (
            data.select(
                F.col("s").alias("focus"), "p",
                F.col("o_value").alias("v_value"),
                F.col("o_kind").alias("v_kind"),
                F.col("o_datatype").alias("v_datatype"),
                F.col("part_id"),
            )
            .join(_b(focus.select("focus"), _is_small(focus)), on="focus")
            .filter(~F.col("p").isin(allowed))
        )
        out.append(
            extra.select(
                F.col("focus").alias("focusNode"),
                F.col("p").alias("resultPath"),
                F.col("v_value").alias("value"),
                F.lit(shape.shape_id).alias("sourceShape"),
                F.lit(comp).alias("sourceConstraintComponent"),
                F.lit("Predicate is not allowed (closed shape)").alias("resultMessage"),
                F.lit(SH_VIOLATION).alias("resultSeverity"),
                F.col("part_id").alias("part_id"),
                F.col("v_kind").alias("value_kind"),
                F.col("v_datatype").alias("value_datatype"),
            )
        )
    return out


def _path_leaf_preds(e: PathExpr) -> set[str]:
    if isinstance(e, PPred):
        return {e.iri}
    if isinstance(e, PInv):
        return _path_leaf_preds(e.sub)
    if isinstance(e, (PSeq, PAlt)):
        out: set[str] = set()
        for p in e.parts:
            out |= _path_leaf_preds(p)
        return out
    return _path_leaf_preds(e.sub)


def _constraint_predicates(compiled: CompiledShapes) -> set[str] | None:
    """Every data-graph predicate the compiled shapes can touch, or None
    when the set is open (sh:closed shapes must see ALL predicates).
    Drives the single-scan path slice in validate()."""
    preds: set[str] = {RDF_TYPE}
    for s in compiled.shapes:
        if s.closed:
            return None
        preds.update(s.target_subjects_of)
        preds.update(s.target_objects_of)
        for c in s.properties:
            if c.path_expr is not None:
                preds.update(_path_leaf_preds(c.path_expr))
            elif c.alt_path:
                preds.update(c.alt_path)
            elif c.seq_path:
                preds.update(c.seq_path)
            elif c.closure_path:
                preds.add(c.closure_path)
            elif c.path is not None:
                preds.add(c.path)
        for c in s.properties + s.self_constraints:
            for pred in (c.equals_, c.disjoint, c.less_than, c.less_than_eq):
                if pred is not None:
                    preds.add(pred)
    return preds


def _check_shapes_rows(shapes_triples: DataFrame, rows: list | None = None) -> None:
    """meta_shacl structural invariants, pre-compilation pass (round-1
    ADVICE: self-validation is usually a no-op). Checks raw-triple
    SHACL-SHACL invariants: every sh:property object carries an sh:path;
    count/length parameters have integer lexical forms; sh:nodeKind is one
    of the six IRIs. Raises ValueError listing all problems (these would
    otherwise crash or mis-compile shape compilation)."""
    import re as _re

    problems: list[str] = []
    if rows is None:
        rows = shapes_triples.select("s", "p", "o_value").collect()
    paths = {r.s for r in rows if r.p == SH + "path"}
    int_preds = {SH + p for p in ("minCount", "maxCount", "minLength", "maxLength",
                                  "qualifiedMinCount", "qualifiedMaxCount")}
    for r in rows:
        if r.p == SH + "property" and r.o_value not in paths:
            problems.append(f"property shape {r.o_value} has no sh:path")
        if r.p in int_preds and not _re.fullmatch(r"[+-]?\d+", r.o_value or ""):
            problems.append(f"{r.s}: {r.p.split('#')[-1]} is not an integer: {r.o_value!r}")
        if r.p == SH + "nodeKind" and r.o_value not in _NODEKIND_ALLOWED:
            problems.append(f"{r.s}: unknown sh:nodeKind {r.o_value}")
    if problems:
        raise ValueError("meta-SHACL: shapes graph does not conform: " + "; ".join(problems))


def _check_shapes_compiled(compiled: CompiledShapes) -> None:
    """meta_shacl structural invariants over compiled constraints:
    compilable sh:pattern, consistent count bounds."""
    import re as _re

    problems: list[str] = []
    for c in compiled.constraints:
        if c.pattern is not None:
            try:
                _re.compile(c.pattern)
            except _re.error as exc:
                problems.append(f"{c.shape_id}: sh:pattern does not compile: {exc}")
        if c.min_count is not None and c.max_count is not None and c.min_count > c.max_count:
            problems.append(f"{c.shape_id}: minCount {c.min_count} > maxCount {c.max_count}")
    if problems:
        raise ValueError("meta-SHACL: shapes graph does not conform: " + "; ".join(problems))


# chunk size for lineage-truncating union of per-constraint result plans —
# bounds analyzer/optimizer time on catalogs with hundreds of shapes
_UNION_CHUNK = 48


def _chunked_union(dfs: list[DataFrame]) -> DataFrame:
    """Union many same-schema result frames; above _UNION_CHUNK inputs the
    union is built in lineage-truncated (lazy localCheckpoint) chunks so
    the analyzed plan stays bounded on catalogs with hundreds of
    constraints (round-1 VERDICT finding 10; reused for the sh:sparql
    catalog path in round 4)."""
    if len(dfs) <= _UNION_CHUNK:
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        return out
    chunks: list[DataFrame] = []
    for i in range(0, len(dfs), _UNION_CHUNK):
        chunk = dfs[i]
        for df in dfs[i + 1 : i + _UNION_CHUNK]:
            chunk = chunk.unionByName(df)
        chunks.append(chunk.localCheckpoint(eager=False))
    out = chunks[0]
    for df in chunks[1:]:
        out = out.unionByName(df)
    return out


# --------------------------------------------------------------------- S12
def validate(
    spark: SparkSession,
    data_triples: DataFrame,
    shapes_triples: DataFrame,
    ont_triples: DataFrame | None = None,
    inference: str = "none",
    meta_shacl: bool = False,
    advanced: bool = False,
    js: bool = False,
    max_validation_depth: int = 15,
    single_scan: bool = True,
    closure_max_iters: int | None = None,
    iterate_rules: bool = False,
    focus_subset: DataFrame | None = None,
) -> DataFrame:
    """The engine's equivalent of the reference's pyshacl.validate call-site
    (plugin_pyshacl.py:631-641). Returns the validation-results DataFrame
    (RESULT_SCHEMA); derive the global flag with ``conforms(results)``.

    Parameter parity with the reference's plumbing (:218-305):
      * inference: 'none'|'rdfs' — rdfs runs the subclass/propagation subset
        (see plans/inference.py); 'owlrl'/'both' additionally run the
        OWL-RL equivalence/inverse subset (owl:equivalentClass/
        equivalentProperty/inverseOf/symmetric/transitive rules) — a
        documented, logged approximation of owlrl 7.1.4 full closure.
      * meta_shacl: check SHACL-SHACL structural invariants of the shapes
        graph (sh:path presence, integer lexical forms, known sh:nodeKind,
        compilable sh:pattern) AND validate it against itself.
      * advanced: SHACL-AF slice — sh:sparql constraints over the
        restricted SELECT subset compiled by plans/sparql_af.py (single
        BGP + FILTERs, sh:prefixes/PREFIX expansion), plus sh:rule
        expansion (sh:TripleRule / sh:SPARQLRule via plans/rules.py)
        applied to the data graph BEFORE validation, mirroring pySHACL's
        advanced-mode order; iterate_rules mirrors pySHACL's flag (False:
        one ordered pass; True: bounded fixpoint). Anything outside the
        subsets raises ValueError at parse time. js: SHACL-JS stays out
        of scope -> ValueError (the reference delegates both to pySHACL,
        plugin_pyshacl.py:250-265).
      * max_validation_depth: recursion bound for shape-to-shape refs
        (1..999, reference range-checks at :589-590).
      * focus_subset: optional DataFrame with a ``focus`` column — every
        shape's target selection is intersected (left-semi) with it, so
        only those focus nodes are (re)checked while value extraction,
        class closures and existence probes still see the FULL data
        relation. This is the incremental-revalidation hook
        (plans/incremental.py): correctness-preserving because SHACL
        results are per-focus-node; narrowing focus never changes the
        verdict of the nodes that remain.
      * single_scan: pre-slice the data relation to the predicates the
        shape catalog can touch and persist that slice, so a 50-property
        catalog evaluates against ONE scan of the triples table instead of
        one scan per constraint (round-1 VERDICT finding 3). Disabled
        automatically when a sh:closed shape needs the full relation.
    """
    if js:
        raise ValueError("SHACL-JS is outside the supported core scope")
    if not 1 <= max_validation_depth <= 999:
        raise ValueError("max_validation_depth must be in 1..999")
    if closure_max_iters is not None:
        if closure_max_iters < 1:
            raise ValueError("closure_max_iters must be >= 1")
        # run the whole call in a COPIED context so the override cannot
        # leak into later validate() calls on this thread
        ctx = contextvars.copy_context()

        def _with_bound() -> DataFrame:
            _CLOSURE_MAX_ITERS.set(closure_max_iters)
            return validate(
                spark, data_triples, shapes_triples, ont_triples, inference,
                meta_shacl, advanced, js, max_validation_depth, single_scan,
                closure_max_iters=None, iterate_rules=iterate_rules,
                focus_subset=focus_subset,
            )

        return ctx.run(_with_bound)

    if inference and inference != "none":
        from .inference import apply_inference

        data_triples = apply_inference(data_triples, ont_triples, profile=inference)

    # ONE shapes-side Spark job feeds every compile pass below (core shape
    # compilation, meta-SHACL raw checks, rule compilation, the SHACL-AF
    # slice and custom-component parameter values) — advanced mode used to
    # re-collect the shapes graph once per pass (round-4 VERDICT #3).
    shapes_rows = collect_shapes_rows(shapes_triples)

    if advanced:
        # SHACL-AF rule expansion runs BEFORE constraint validation
        # (pySHACL advanced-mode order); no-op when the shapes graph
        # declares no sh:rule
        from .rules import apply_rules

        data_triples = apply_rules(
            spark, data_triples, shapes_triples, iterate=iterate_rules,
            shapes_rows=shapes_rows,
        )

    if meta_shacl:
        _check_shapes_rows(shapes_triples, rows=shapes_rows)
    compiled = compile_shapes(shapes_triples, rows=shapes_rows)
    if meta_shacl:
        _check_shapes_compiled(compiled)
        # ... and validate shapes against themselves (cheap: shapes are tiny)
        meta_results = validate(spark, shapes_triples, shapes_triples)
        if meta_results.limit(1).count() > 0:
            raise ValueError("meta-SHACL: shapes graph does not conform")

    # SHACL-AF slice: compile sh:sparql constraints up front (parse errors
    # for unsupported selects surface here, before any Spark job)
    sparql_map: dict[str, list] = {}
    starget_map: dict[str, list[str]] = {}
    sparql_preds: set[str] = set()
    # a negated property set reads the COMPLEMENT of a predicate list, so
    # any predicate slice would silently drop its matchable edges
    sparql_unsliceable = False
    if advanced:
        from .sparql_af import (
            compile_custom_components,
            compile_sparql_constraints,
            compile_sparql_targets,
            parse_select,
        )

        # driver-side slice of the one collected shapes list — no extra
        # Spark job for the AF pass
        _af_preds = {
            SH + name
            for name in (
                "sparql", "select", "ask", "message", "severity", "target",
                # sh:prefixes ontologies (SHACL-AF §5.2)
                "prefixes", "declare", "prefix", "namespace",
                # custom constraint components (SHACL-AF §6)
                "parameter", "path", "optional", "validator",
                "nodeValidator", "propertyValidator", "property",
                # SPARQL functions (SHACL-AF §7)
                "order", "returnType",
            )
        }
        af_rows = [r for r in shapes_rows if r.p in _af_preds or r.p == RDF_TYPE]
        sparql_map = compile_sparql_constraints(af_rows)
        starget_map = compile_sparql_targets(af_rows)
        for k, v in compile_custom_components(
            af_rows, shapes_triples, all_rows=shapes_rows
        ).items():
            sparql_map.setdefault(k, []).extend(v)
        # SHACL-AF §7 SPARQL functions: expand calls textually into every
        # validator/target body BEFORE parsing — the evaluator never sees
        # the function (same pre-binding strategy as component parameters)
        from .sparql_af import compile_sparql_functions, expand_function_calls

        af_functions = compile_sparql_functions(af_rows)
        if af_functions:
            from dataclasses import replace as _dc_replace

            sparql_map = {
                k: [
                    _dc_replace(
                        sc,
                        select=expand_function_calls(sc.select, af_functions)
                        if sc.select
                        else sc.select,
                        ask=expand_function_calls(sc.ask, af_functions)
                        if sc.ask
                        else sc.ask,
                    )
                    for sc in scs
                ]
                for k, scs in sparql_map.items()
            }
            starget_map = {
                k: [expand_function_calls(s, af_functions) for s in v]
                for k, v in starget_map.items()
            }
        from .sparql_af import parse_ask, pattern_predicates

        for scs in sparql_map.values():
            for sc in scs:
                # property ASK validators may pre-bind $value in triple
                # patterns; the evaluator substitutes $value->?value before
                # parsing, so this collection-time parse must match or a
                # supported body would raise here
                blk = (
                    parse_ask(
                        re.sub(r"\$value\b", "?value", sc.ask),
                        allow_pattern_free=sc.path is not None,
                    )
                    if sc.ask is not None
                    else parse_select(sc.select)[1]
                )
                ps, has_neg = pattern_predicates(blk)
                sparql_preds.update(ps)
                if sc.path:
                    sparql_preds.add(sc.path)
                sparql_unsliceable = sparql_unsliceable or has_neg
        for sels in starget_map.values():
            for sel in sels:
                _, blk = parse_select(sel)
                ps, has_neg = pattern_predicates(blk)
                sparql_preds.update(ps)
                sparql_unsliceable = sparql_unsliceable or has_neg

    closure_src = ont_triples if ont_triples is not None else data_triples
    all_classes: set[str] = set()
    for s in compiled.shapes:
        all_classes.update(s.target_classes)
        if s.implicit_class_target:
            all_classes.add(s.shape_id)
        for c in s.properties + s.self_constraints:
            if c.class_ is not None:
                all_classes.add(c.class_)
    closure = subclass_closure(closure_src, all_classes)
    shape_map = {s.shape_id: s for s in compiled.shapes}

    # single-scan evaluation: one predicate-sliced, persisted relation
    # feeds every constraint; each per-constraint `p == X` filter then
    # slices the in-memory relation instead of rescanning storage.
    eval_data = data_triples
    preds = _constraint_predicates(compiled) if single_scan else None
    if sparql_unsliceable:
        preds = None  # full scan: a !(...) hop can touch any predicate
    elif preds is not None and sparql_preds:
        preds = set(preds) | sparql_preds
    n_constraints = sum(
        len(s.properties) + len(s.self_constraints) for s in compiled.shapes
    )
    try:
        lvl = data_triples.storageLevel
        already_cached = lvl.useMemory or lvl.useDisk
    except Exception:
        already_cached = False
    slice_df: DataFrame | None = None
    if preds is not None and n_constraints > 1 and not already_cached:
        eval_data = data_triples.filter(F.col("p").isin(sorted(preds)))
        eval_data.persist()
        slice_df = eval_data

    # Broadcast gate (round-2 VERDICT finding 1): the free Catalyst size
    # estimate first — no job, no extra pass over the derive pipeline. The
    # round-4 drift bisect (BENCH.md) showed the estimate is UNINFORMATIVE
    # for derived graphs: size-only propagation through unions of
    # concat-projections saturates to Long.MaxValue, so an estimate-only
    # gate silently turned every hint off and shacl_full regressed ~25%
    # vs the round-2 count-gated plans (interleaved A/B: r2 best 4.1-4.7 s,
    # estimate-only best 5.4-5.8 s, count-gated cdd9f1f best 4.55 s).
    # Tiers:
    #   1. finite estimate ≤ gate → small (parquet-backed scans read real
    #      file sizes, so this is trustworthy);
    #   2. finite estimate > gate but below the saturation band → big
    #      (a 100-TB scan honestly reads huge) — NO count, no hint; AQE
    #      converts at runtime if the frame turns out small;
    #   3. saturated estimate (≥ _EST_SATURATED: overflow/no information)
    #      AND the slice is persisted → ONE row-bounded count; it warms
    #      the cache evaluation reads anyway (the +2-2.5 s measured for
    #      count fallbacks applied to UN-persisted single-constraint
    #      validates, where the count re-executed the derive pipeline —
    #      that path stays estimate-only/unhinted).
    # The flag is scoped to plan construction (hints are applied at build
    # time) and reset on exit so it cannot leak into later calls.
    est = _plan_size_bytes(eval_data)
    data_under_gate = est is not None and est <= _BROADCAST_GATE_BYTES
    if (
        not data_under_gate
        and slice_df is not None
        and (est is None or est >= _EST_SATURATED)
    ):
        # FULL count, not LIMIT-bounded: CollectLimit iterates partitions
        # partially, and partially-iterated partitions are NOT cached — a
        # bounded count would serialize an extra derive execution and warm
        # nothing (A/B-measured worse). The full count materializes every
        # partition of the persisted slice exactly once; evaluation reads
        # the cache. At 100-TB scale this fronts the scan the first
        # evaluation job would otherwise perform — same total work.
        n = eval_data.count()
        data_under_gate = n <= _BROADCAST_GATE_ROWS
    _assume_token = _ASSUME_SMALL_FOCUS.set(data_under_gate)
    try:
        result_dfs: list[DataFrame] = []
        af_select_dfs: list[DataFrame] = []
        for shape in compiled.shapes:
            if shape.deactivated:
                continue
            focus = _focus_nodes(spark, eval_data, shape, closure)
            t_sels = starget_map.get(shape.shape_id, [])
            if t_sels:
                from .sparql_af import evaluate_target_select

                tfocus = evaluate_target_select(spark, eval_data, t_sels[0])
                for sel in t_sels[1:]:
                    tfocus = tfocus.unionByName(
                        evaluate_target_select(spark, eval_data, sel)
                    )
                # lineage: a target-selected focus node reports into the
                # min partition of its own subject triples (NULL when it
                # never appears as a subject — same as sh:targetNode)
                tfocus = (
                    tfocus.join(
                        eval_data.select(F.col("s").alias("focus"), "part_id"),
                        on="focus",
                        how="left",
                    )
                    .groupBy("focus")
                    .agg(F.min("part_id").alias("part_id"))
                )
                focus = (
                    tfocus
                    if focus is None
                    else focus.unionByName(tfocus)
                    .groupBy("focus")
                    .agg(F.min("part_id").alias("part_id"))
                )
            if focus is None:
                continue
            if focus_subset is not None:
                focus = focus.join(
                    focus_subset.select("focus").distinct(),
                    on="focus",
                    how="left_semi",
                )
            result_dfs.extend(
                _evaluate_shape(
                    spark, eval_data, focus, shape, closure, shape_map,
                    max_validation_depth, 0,
                )
            )
            for sc in sparql_map.get(shape.shape_id, []):
                from .sparql_af import (
                    evaluate_ask_constraint,
                    evaluate_property_ask_constraint,
                    evaluate_sparql_constraint,
                )

                if sc.ask is not None and sc.path is not None:
                    result_dfs.append(
                        evaluate_property_ask_constraint(
                            spark, eval_data, focus, sc
                        )
                    )
                elif sc.ask is not None:
                    result_dfs.append(
                        evaluate_ask_constraint(spark, eval_data, focus, sc)
                    )
                else:
                    # dedupe deferred: SELECT-constraint frames are
                    # collected separately and deduplicated ONCE below —
                    # one shuffle for the whole sh:sparql catalog instead
                    # of one per constraint (round-3 verdict finding 3)
                    af_select_dfs.append(
                        evaluate_sparql_constraint(
                            spark, eval_data, focus, sc, dedupe=False
                        )
                    )

        if af_select_dfs:
            merged = _chunked_union(af_select_dfs)
            result_dfs.append(merged.dropDuplicates())

        if not result_dfs:
            results = spark.createDataFrame([], schema=RESULT_SCHEMA)
        else:
            results = _chunked_union(result_dfs)
        if slice_df is not None:
            _remember_eval_slice(slice_df)
        return results
    finally:
        _ASSUME_SMALL_FOCUS.reset(_assume_token)


# Capacity-ONE registry for the persisted predicate slice. Round 3 tied the
# slice's lifetime to the results frame with a GC finalizer; the round-4
# drift bisect (BENCH.md) showed that unpersisting on results-GC makes
# every repeated validate over the same data RECOMPUTE the derive+slice —
# Spark's CacheManager matches cache entries by canonicalized plan, so the
# r2-era "slice stays cached until the next validate" behavior made
# loop/test/incremental revalidation patterns warm (measured: 6.8-7.7 s
# per rep cold vs 3.9-4.6 s warm on the sf0.1 customer graph). This
# registry restores that, bounded: at most one slice is ever pinned, the
# next validate() evicts it unless its plan is semantically identical
# (then the warm entry is reused), and release_eval_cache() frees it
# explicitly. One MEMORY_AND_DISK slice is evictable by Spark under
# storage pressure, so the pin is a performance hint, not a leak.
_SLICE_CACHE: list[DataFrame] = []


def _remember_eval_slice(df: DataFrame) -> None:
    while _SLICE_CACHE:
        old = _SLICE_CACHE.pop()
        try:
            if old.sameSemantics(df):
                continue  # same CacheManager entry — keep it warm
            old.unpersist()
        except Exception:  # pragma: no cover - session torn down
            pass
    _SLICE_CACHE.append(df)


def release_eval_cache() -> None:
    """Unpersist the one retained predicate slice (see _SLICE_CACHE)."""
    while _SLICE_CACHE:
        try:
            _SLICE_CACHE.pop().unpersist()
        except Exception:  # pragma: no cover
            pass


def conforms(results: DataFrame) -> bool:
    """Global sh:conforms = zero results (reference reads it off the pyshacl
    return tuple; S12)."""
    return results.limit(1).count() == 0


def partition_reports(results: DataFrame, all_part_ids: DataFrame | None = None) -> DataFrame:
    """north_rule: per-partition sh:ValidationReport rows — one row per
    part_id with violation count, conforms flag, and severity breakdown.

    When `all_part_ids` (DataFrame[part_id]) is given, partitions with zero
    violations are included with conforms=true (left join)."""
    agg = results.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("results_count"),
        F.sum((F.col("resultSeverity") == SH_VIOLATION).cast("long")).alias(
            "violations"
        ),
        F.sum((F.col("resultSeverity") == SH_WARNING).cast("long")).alias("warnings"),
    )
    if all_part_ids is not None:
        agg = (
            all_part_ids.select("part_id")
            .distinct()
            .join(agg, on="part_id", how="left")
            .fillna(0, subset=["results_count", "violations", "warnings"])
        )
    return agg.withColumn("conforms", F.col("results_count") == 0)
