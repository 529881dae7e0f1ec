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
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..data_model import (
    KIND_IRI,
    KIND_LITERAL,
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
)

SH_VIOLATION = SH + "Violation"
SH_WARNING = SH + "Warning"
SH_INFO = SH + "Info"

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
    ]
)


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
def compile_shapes(shapes_triples: DataFrame) -> CompiledShapes:
    """S1 — compile a (small) shapes graph into constraint records.

    Shapes graphs are tiny by construction (reference fixture: pySHACL's
    shacl-shacl.ttl); we collect() them to the driver — the same strategy
    pySHACL itself uses (in-memory shape compilation), and the broadcast
    pattern SURVEY.md S1 prescribes. The DATA graph is never collected.
    """
    rows = shapes_triples.select(
        "s", "p", "o_kind", "o_value", "o_datatype", "o_lang"
    ).collect()
    # index: s -> p -> [(o_value, o_kind)]
    spo: dict[str, dict[str, list[tuple[str, str]]]] = {}
    for r in rows:
        spo.setdefault(r.s, {}).setdefault(r.p, []).append((r.o_value, r.o_kind))

    def objs(s: str, p: str) -> list[str]:
        return [v for v, _ in spo.get(s, {}).get(p, [])]

    def obj(s: str, p: str) -> str | None:
        vals = objs(s, p)
        return vals[0] if vals else None

    RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def rdf_list(node: str | None) -> list[str] | None:
        """Walk an rdf:first/rdf:rest collection (sh:in is an RDF list)."""
        if node is None:
            return None
        out: list[str] = []
        seen: set[str] = set()
        while node and node != RDF_NS + "nil" and node not in seen:
            seen.add(node)
            first = obj(node, RDF_NS + "first")
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
            has_value=obj(node_id, SH + "hasValue"),
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
            inv = obj(path, SH + "inversePath")
            alt = rdf_list(obj(path, SH + "alternativePath"))
            seq = rdf_list(path) if obj(path, RDF_NS + "first") else None
            if alt:
                pc = constraint_from(pshape, sid, "|".join(alt))
                pc.alt_path = alt
            elif seq:
                pc = constraint_from(pshape, sid, "/".join(seq))
                pc.seq_path = seq
            else:
                pc = constraint_from(pshape, sid, inv if inv is not None else path)
                pc.inverse = inv is not None
            ns.properties.append(pc)
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
) -> list[Column]:
    msg = F.lit(message) if isinstance(message, str) else message
    return [
        focus.alias("focusNode"),
        F.lit(path).alias("resultPath"),
        value.alias("value"),
        F.lit(shape).alias("sourceShape"),
        F.lit(component).alias("sourceConstraintComponent"),
        msg.alias("resultMessage"),
        F.lit(severity).alias("resultSeverity"),
        part_id.alias("part_id"),
    ]


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
    if c.path is None:
        # self-values: the focus node is the value (focus nodes selected by
        # our targets are IRIs post-skolemization)
        values = focus.select(
            "focus",
            F.lit(KIND_IRI).alias("v_kind"),
            F.col("focus").alias("v_value"),
            F.lit(None).cast("string").alias("v_datatype"),
            F.lit(None).cast("string").alias("v_lang"),
            F.col("part_id").alias("v_part_id"),
            F.col("part_id"),
        )
    elif c.alt_path:
        # alternative path (p1 | p2 | ...): union of each predicate's
        # values — a single isin filter on the predicate column
        path_triples = data.filter(F.col("p").isin(c.alt_path)).select(
            F.col("s").alias("focus"),
            F.col("o_kind").alias("v_kind"),
            F.col("o_value").alias("v_value"),
            F.col("o_datatype").alias("v_datatype"),
            F.col("o_lang").alias("v_lang"),
            F.col("part_id").alias("v_part_id"),
        )
        values = (
            F.broadcast(focus)
            .join(path_triples, on="focus", how="left")
            .withColumn("part_id", F.coalesce(F.col("part_id"), F.col("v_part_id")))
        )
    elif c.seq_path:
        # sequence path ( p1 p2 ... ): chain of joins hop-to-hop; the
        # intermediate node of hop i is the subject of hop i+1. INNER
        # joins build the reachable value set, then one LEFT join from the
        # focus set preserves zero-value focus nodes for minCount.
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
        values = (
            F.broadcast(focus)
            .join(cur.dropDuplicates(["focus", "v_kind", "v_value", "v_datatype", "v_lang"]), on="focus", how="left")
            .withColumn("part_id", F.coalesce(F.col("part_id"), F.col("v_part_id")))
        )
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
        values = (
            F.broadcast(focus)
            .join(path_triples, on="focus", how="left")
            .withColumn("part_id", F.coalesce(F.col("part_id"), F.col("v_part_id")))
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
        # S5: LEFT join so zero-valued focus nodes survive for minCount. The
        # focus side is usually far smaller than the triples table;
        # broadcast it.
        values = (
            F.broadcast(focus)
            .join(path_triples, on="focus", how="left")
            .withColumn("part_id", F.coalesce(F.col("part_id"), F.col("v_part_id")))
        )

    if c.min_count is not None or c.max_count is not None:
        counts = values.groupBy("focus").agg(
            F.count("v_value").alias("cnt"),
            F.min("part_id").alias("part_id"),
        )
        if c.min_count is not None and c.min_count > 0:
            comp = SH + "MinCountConstraintComponent"
            results.append(
                counts.filter(F.col("cnt") < c.min_count).select(
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

    present = values.filter(F.col("v_value").isNotNull())

    if c.datatype is not None:
        comp = SH + "DatatypeConstraintComponent"
        lex_re = _LEXICAL_RE.get(c.datatype)
        bad = (F.col("v_kind") != KIND_LITERAL) | (
            F.coalesce(F.col("v_datatype"), F.lit(XSD + "string")) != c.datatype
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
                    F.col("part_id"),
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
                        F.col("part_id"),
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
                    F.col("part_id"),
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
        v_num = F.expr("try_cast(v_value as double)")
        b_num = F.expr(f"try_cast({bound!r} as double)")
        ops = {
            ">=": v_num >= b_num, "<=": v_num <= b_num,
            ">": v_num > b_num, "<": v_num < b_num,
        }
        ok = (
            (F.col("v_kind") == KIND_LITERAL)
            & v_num.isNotNull() & b_num.isNotNull() & ops[cmp_ok]
        )
        results.append(
            present.filter(~ok).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, f"Value is not {cmp_ok} {bound}"),
                    c.severity, F.col("part_id"),
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
                    c.severity, F.col("part_id"),
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
                    c.severity, F.col("part_id"),
                )
            )
        )

    if c.in_values is not None:
        comp = SH + "InConstraintComponent"
        # core approximation: membership compared on the value's string
        # form (IRI or lexical), not full term equality
        results.append(
            present.filter(~F.col("v_value").isin(c.in_values)).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, "Value is not in the allowed list"),
                    c.severity, F.col("part_id"),
                )
            )
        )

    if c.has_value is not None:
        comp = SH + "HasValueConstraintComponent"
        # one result per FOCUS node whose value set lacks the required
        # value — left-anti join against the matching values
        matched = values.filter(F.col("v_value") == c.has_value).select("focus")
        results.append(
            values.select("focus", "part_id")
            .groupBy("focus")
            .agg(F.min("part_id").alias("part_id"))
            .join(matched, on="focus", how="left_anti")
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
                    F.col("part_id"),
                )
            )
        )

    if c.language_in is not None:
        comp = SH + "LanguageInConstraintComponent"
        tags = [t.lower() for t in c.language_in]
        primaries = sorted({t.split("-")[0] for t in tags})
        lang = F.lower(F.coalesce(F.col("v_lang"), F.lit("")))
        # W3C SHACL §4.5.3 basic filtering: exact tag or primary-subtag match
        ok = (F.col("v_kind") == KIND_LITERAL) & (
            lang.isin(tags) | F.split(lang, "-").getItem(0).isin(primaries)
        )
        results.append(
            present.filter(~ok).select(
                *_result_row(
                    F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                    _message(c, comp, "Value has no language tag from the allowed list"),
                    c.severity, F.col("part_id"),
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
                    comp, msg, c.severity, F.col("part_id"),
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
                    c.severity, F.col("part_id"),
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
                    c.severity, F.col("part_id"),
                )
            )
        )

    # ---- shape-to-shape logical components (sh:node / sh:not / sh:or /
    # sh:and). Recursion is bounded by max_validation_depth (the reference
    # range-checks the same bound, plugin_pyshacl.py:296-305, :589-590);
    # past the bound, or for non-IRI values, sub-shapes are treated as
    # conforming (documented core approximation).
    def noncon_values(ref_id: str) -> DataFrame | None:
        """Distinct DataFrame[v_value] of IRI values NOT conforming to the
        referenced shape, or None when the ref can't be expanded."""
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
        if not sub_results:
            return spark.createDataFrame([], schema="v_value string")
        noncon = sub_results[0].select("focusNode")
        for df in sub_results[1:]:
            noncon = noncon.unionByName(df.select("focusNode"))
        return noncon.distinct().withColumnRenamed("focusNode", "v_value")

    def value_results(bad_values: DataFrame, comp: str, default_msg: str) -> DataFrame:
        return present.join(bad_values, on="v_value", how="left_semi").select(
            *_result_row(
                F.col("focus"), c.path, F.col("v_value"), c.shape_id, comp,
                _message(c, comp, default_msg), c.severity, F.col("part_id"),
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
            # violation iff the value DOES conform: IRI values minus noncon
            conforming = (
                present.filter(F.col("v_kind") == KIND_IRI)
                .select("v_value")
                .distinct()
                .join(noncon, on="v_value", how="left_anti")
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
                bad = bad.join(n, on="v_value", how="left_semi")
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
                present.filter(F.col("v_kind") == KIND_IRI)
                .select("v_value")
                .distinct()
            )
            marked = noncons[0].select("v_value")
            for n in noncons[1:]:
                marked = marked.unionByName(n.select("v_value"))
            ncnt = marked.groupBy("v_value").agg(F.count(F.lit(1)).alias("_nc"))
            bad = (
                universe.join(ncnt, on="v_value", how="left")
                .withColumn(
                    "_conf", F.lit(len(c.xone_refs)) - F.coalesce(F.col("_nc"), F.lit(0))
                )
                .filter(F.col("_conf") != 1)
                .select("v_value")
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
            conforming = (
                present.filter(F.col("v_kind") == KIND_IRI)
                .join(noncon, on="v_value", how="left_anti")
                .groupBy("focus")
                .agg(F.count(F.lit(1)).alias("_qc"))
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
    for sc in shape.self_constraints:
        out.extend(
            evaluate_constraint(
                spark, data, focus, sc, closure, shape_map, max_depth, depth
            )
        )
    for pc in shape.properties:
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
        extra = (
            F.broadcast(focus)
            .join(
                data.select(
                    F.col("s").alias("focus"), "p",
                    F.col("o_value").alias("v_value"),
                ),
                on="focus",
            )
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
            )
        )
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
) -> DataFrame:
    """The engine's equivalent of the reference's pyshacl.validate call-site
    (plugin_pyshacl.py:631-641). Returns the validation-results DataFrame
    (RESULT_SCHEMA); derive the global flag with ``conforms(results)``.

    Parameter parity with the reference's plumbing (:218-305):
      * inference: 'none'|'rdfs' — rdfs runs the subclass/propagation subset
        (see plans/inference.py) before validation; 'owlrl'/'both' fall back
        to 'rdfs' (documented approximation of owlrl 7.1.4).
      * meta_shacl: validate the shapes graph against itself first (the
        reference forwards this to pySHACL; we reuse this same engine).
      * advanced/js: SHACL-AF / SHACL-JS are out of core scope -> ValueError
        if set (the reference would delegate to pySHACL).
      * max_validation_depth: recursion bound; our core subset has no
        shape-to-shape recursion, kept as a validated guard (1..999,
        reference range-checks at :589-590).
    """
    if advanced or js:
        raise ValueError("SHACL-AF/SHACL-JS are outside the supported core scope")
    if not 1 <= max_validation_depth <= 999:
        raise ValueError("max_validation_depth must be in 1..999")

    if inference and inference != "none":
        from .inference import rdfs_inference

        data_triples = rdfs_inference(data_triples, ont_triples)

    if meta_shacl:
        # validate shapes against themselves (cheap: shapes are tiny)
        meta_results = validate(spark, shapes_triples, shapes_triples)
        if meta_results.limit(1).count() > 0:
            raise ValueError("meta-SHACL: shapes graph does not conform")

    compiled = compile_shapes(shapes_triples)
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

    result_dfs: list[DataFrame] = []
    for shape in compiled.shapes:
        if shape.deactivated:
            continue
        focus = _focus_nodes(spark, data_triples, shape, closure)
        if focus is None:
            continue
        result_dfs.extend(
            _evaluate_shape(
                spark, data_triples, focus, shape, closure, shape_map,
                max_validation_depth, 0,
            )
        )

    if result_dfs:
        results = result_dfs[0]
        for df in result_dfs[1:]:
            results = results.unionByName(df)
    else:
        results = spark.createDataFrame([], schema=RESULT_SCHEMA)
    return results


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
