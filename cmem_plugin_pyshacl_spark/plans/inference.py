"""RDFS inference subset (reference `inference` parameter,
/root/reference/cmem_plugin_pyshacl/plugin_pyshacl.py:238-249, delegated to
owlrl 7.1.4 forward chaining inside pySHACL).

We implement the RDFS entailment rules that affect core-SHACL outcomes —
the fixpoint of:

  rdfs9 : (x rdf:type c1), (c1 rdfs:subClassOf c2)    => (x rdf:type c2)
  rdfs11: (c1 subClassOf c2), (c2 subClassOf c3)       => (c1 subClassOf c3)
  rdfs7 : (x p y), (p rdfs:subPropertyOf q)            => (x q y)
  rdfs2 : (x p y), (p rdfs:domain c)                   => (x rdf:type c)
  rdfs3 : (x p y:iri), (p rdfs:range c)                => (y rdf:type c)

Scale posture: the SCHEMA side (subClassOf / subPropertyOf / domain / range
edges) is tiny — we close it driver-side and apply it to the huge instance
table with ONE broadcast join per rule, not an iterative join on the big
table. The only fixpoint loop runs over the collected schema (SURVEY.md §4:
fixpoint is the one primitive Catalyst lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data_model import (
    KIND_IRI,
    RDF_TYPE,
    RDFS,
    RDFS_SUBCLASSOF,
    TRIPLES_SCHEMA,
    dedupe_triples,
)

RDFS_SUBPROPERTYOF = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"
OWL = "http://www.w3.org/2002/07/owl#"
OWL_EQ_CLASS = OWL + "equivalentClass"
OWL_EQ_PROP = OWL + "equivalentProperty"
OWL_INVERSE_OF = OWL + "inverseOf"
OWL_SYMMETRIC = OWL + "SymmetricProperty"
OWL_TRANSITIVE = OWL + "TransitiveProperty"
_SCHEMA_PREDS = [RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF, RDFS_DOMAIN, RDFS_RANGE]
_OWL_SCHEMA_PREDS = [OWL_EQ_CLASS, OWL_EQ_PROP, OWL_INVERSE_OF]


def _transitive_close(edges: set[tuple[str, str]]) -> set[tuple[str, str]]:
    """Driver-side transitive closure of a small edge set (rdfs5/rdfs11)."""
    closure = set(edges)
    changed = True
    while changed:
        changed = False
        by_src: dict[str, set[str]] = {}
        for a, b in closure:
            by_src.setdefault(a, set()).add(b)
        new = set()
        for a, b in closure:
            for c in by_src.get(b, ()):  # a->b->c
                if (a, c) not in closure:
                    new.add((a, c))
        if new:
            closure |= new
            changed = True
    return closure


def _mk_broadcast_map(
    spark, pairs: set[tuple[str, str]], a: str, b: str
) -> DataFrame:
    return F.broadcast(
        spark.createDataFrame(sorted(pairs), schema=f"{a} string, {b} string")
    )


def _transitive_instance_closure(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Transitive closure of an instance-level edge relation
    DataFrame[s, o] by PATH DOUBLING: each round joins the closure with
    itself, so round k covers chains of length 2^k — 20 rounds close any
    realistic hierarchy. Per-round localCheckpoint keeps the plan bounded;
    the join shuffles on the edge keys only (never the full triple table)."""
    acc = edges.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # explicit renames sidestep self-join attribute ambiguity on the
        # checkpointed relation
        hop = acc.select(F.col("s").alias("_hs"), F.col("o").alias("_ho"))
        stepped = (
            acc.join(hop, F.col("o") == F.col("_hs"))
            .select("s", F.col("_ho").alias("o"))
            .distinct()
        )
        prev = acc.select(F.col("s").alias("_ps"), F.col("o").alias("_po"))
        new = (
            stepped.join(
                prev,
                (F.col("s") == F.col("_ps")) & (F.col("o") == F.col("_po")),
                how="left_anti",
            )
        ).localCheckpoint(eager=True)
        if new.isEmpty():
            break
        acc = acc.unionByName(new).localCheckpoint(eager=True)
    else:  # pragma: no cover - 2^20-hop chains
        import logging

        logging.getLogger(__name__).warning(
            "TransitiveProperty closure still growing after %d doubling "
            "rounds — result may be incomplete",
            max_rounds,
        )
    return acc


def apply_inference(
    data: DataFrame, ontology: DataFrame | None = None, profile: str = "rdfs"
) -> DataFrame:
    """Dispatch the reference's `inference` parameter
    (plugin_pyshacl.py:238-249). 'rdfs' runs the RDFS subset; 'owlrl' and
    'both' run RDFS plus the OWL equivalence/inverse/symmetric forward
    rules — a LOGGED approximation of owlrl 7.1.4's full OWL-RL closure
    (sameAs, property chains, hasValue restrictions etc. are not
    entailed)."""
    if profile in ("owlrl", "both"):
        import logging

        logging.getLogger(__name__).warning(
            "inference=%s: applying the RDFS + OWL equivalence/inverseOf/"
            "symmetric/transitive subset, NOT the full OWL-RL closure of "
            "owlrl 7.1.4 (no sameAs, no property chains)",
            profile,
        )
        return rdfs_inference(data, ontology, owl=True)
    return rdfs_inference(data, ontology)


def rdfs_inference(
    data: DataFrame, ontology: DataFrame | None = None, owl: bool = False
) -> DataFrame:
    """Forward-chain the RDFS subset onto the data triples; returns
    data ∪ entailed, deduplicated. The ontology graph (if given) mirrors
    the reference's ont_graph inoculation (plugin_pyshacl.py:227-237):
    its schema triples drive the rules and are unioned into the output.

    With owl=True, also applies (same broadcast-schema pattern — the
    schema side is tiny and closed driver-side, the instance table joins
    it once per rule):
      owl:equivalentClass  c1≡c2 => c1 subClassOf c2 AND c2 subClassOf c1
      owl:equivalentProperty p≡q => p subPropertyOf q AND q subPropertyOf p
      owl:inverseOf        (x p y), (p inverseOf q) => (y q x), both ways
      owl:SymmetricProperty (x p y) => (y p x)
      owl:TransitiveProperty (x p y), (y p z) => (x p z) — instance-level
        path-doubling fixpoint (prp-trp)
    """
    spark = data.sparkSession
    schema_src = data if ontology is None else data.unionByName(ontology)
    schema_preds = _SCHEMA_PREDS + (_OWL_SCHEMA_PREDS if owl else [])
    schema_filter = F.col("p").isin(schema_preds)
    if owl:
        # symmetric/transitive-property declarations are the ONLY rdf:type
        # rows the schema needs — never collect the data graph's instance
        # types
        schema_filter = schema_filter | (
            (F.col("p") == RDF_TYPE)
            & (F.col("o_value").isin([OWL_SYMMETRIC, OWL_TRANSITIVE]))
        )
    schema_rows = (
        schema_src.filter(schema_filter)
        .select("s", "p", "o_value")
        .distinct()
        .collect()
    )
    sub_class = {(r.s, r.o_value) for r in schema_rows if r.p == RDFS_SUBCLASSOF}
    sub_prop = {(r.s, r.o_value) for r in schema_rows if r.p == RDFS_SUBPROPERTYOF}
    domain = {(r.s, r.o_value) for r in schema_rows if r.p == RDFS_DOMAIN}
    range_ = {(r.s, r.o_value) for r in schema_rows if r.p == RDFS_RANGE}

    inverse_pairs: set[tuple[str, str]] = set()
    symmetric_props: set[str] = set()
    transitive_props: set[str] = set()
    if owl:
        for r in schema_rows:
            if r.p == OWL_EQ_CLASS:
                sub_class.add((r.s, r.o_value))
                sub_class.add((r.o_value, r.s))
            elif r.p == OWL_EQ_PROP:
                sub_prop.add((r.s, r.o_value))
                sub_prop.add((r.o_value, r.s))
            elif r.p == OWL_INVERSE_OF:
                inverse_pairs.add((r.s, r.o_value))
                inverse_pairs.add((r.o_value, r.s))
            elif r.p == RDF_TYPE and r.o_value == OWL_SYMMETRIC:
                symmetric_props.add(r.s)
            elif r.p == RDF_TYPE and r.o_value == OWL_TRANSITIVE:
                transitive_props.add(r.s)

    sub_class = _transitive_close(sub_class)
    sub_prop = _transitive_close(sub_prop)

    out = data if ontology is None else dedupe_triples(data.unionByName(ontology))
    extras: list[DataFrame] = []

    # owl:inverseOf / owl:SymmetricProperty flip (x p y:iri) => (y q x)
    # BEFORE property entailment so inverse edges feed rdfs7/domain/range
    flips = {(p, q) for p, q in inverse_pairs} | {(p, p) for p in symmetric_props}
    if flips:
        m = _mk_broadcast_map(spark, flips, "p", "inv_p")
        flipped = (
            out.filter(F.col("o_kind") == KIND_IRI)
            .join(m, on="p")
            .select(
                F.col("o_value").alias("s"),
                F.col("inv_p").alias("p"),
                F.lit(KIND_IRI).alias("o_kind"),
                F.col("s").alias("o_value"),
                F.lit(None).cast("string").alias("o_datatype"),
                F.lit(None).cast("string").alias("o_lang"),
                "graph",
                "part_id",
            )
        )
        out = dedupe_triples(out.unionByName(flipped))

    def _mk_map(pairs: set[tuple[str, str]], a: str, b: str) -> DataFrame:
        return F.broadcast(
            spark.createDataFrame(sorted(pairs), schema=f"{a} string, {b} string")
        )

    # rdfs7 first (property entailment feeds type rules)
    if sub_prop:
        m = _mk_map(sub_prop, "p", "super_p")
        extras.append(
            out.join(m, on="p")
            .select(
                "s",
                F.col("super_p").alias("p"),
                "o_kind",
                "o_value",
                "o_datatype",
                "o_lang",
                "graph",
                "part_id",
            )
        )
    base = out if not extras else dedupe_triples(out.unionByName(extras[0]))
    extras = []

    # owl:TransitiveProperty — the one INSTANCE-level fixpoint (reference
    # parity driver: owlrl 7.1.4 prp-trp, plugin_pyshacl.py:238-249). Runs
    # AFTER rdfs7 (so super-property edges feed it) and BEFORE domain/
    # range/rdfs9 (so entailed edges feed the type rules). Path-doubling
    # join with per-round localCheckpoint (same lineage posture as
    # plans/connected_components.py): 20 rounds covers chains to 2^20.
    for p_t in sorted(transitive_props):
        edges = (
            base.filter((F.col("p") == p_t) & (F.col("o_kind") == KIND_IRI))
            .select("s", F.col("o_value").alias("o"))
            .distinct()
        )
        closed = _transitive_instance_closure(edges)
        # lineage: entailed (s, o) pairs report into the min partition /
        # graph of s's direct edges (deterministic; s always has >=1 edge)
        src_meta = (
            base.filter(F.col("p") == p_t)
            .groupBy("s")
            .agg(F.min("graph").alias("graph"), F.min("part_id").alias("part_id"))
        )
        entailed_t = closed.join(src_meta, on="s").select(
            "s",
            F.lit(p_t).alias("p"),
            F.lit(KIND_IRI).alias("o_kind"),
            F.col("o").alias("o_value"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            "graph",
            "part_id",
        )
        base = dedupe_triples(base.unionByName(entailed_t))

    if domain:
        m = _mk_map(domain, "p", "cls")
        extras.append(
            base.join(m, on="p").select(
                "s",
                F.lit(RDF_TYPE).alias("p"),
                F.lit(KIND_IRI).alias("o_kind"),
                F.col("cls").alias("o_value"),
                F.lit(None).cast("string").alias("o_datatype"),
                F.lit(None).cast("string").alias("o_lang"),
                "graph",
                "part_id",
            )
        )
    if range_:
        m = _mk_map(range_, "p", "cls")
        extras.append(
            base.filter(F.col("o_kind") == KIND_IRI)
            .join(m, on="p")
            .select(
                F.col("o_value").alias("s"),
                F.lit(RDF_TYPE).alias("p"),
                F.lit(KIND_IRI).alias("o_kind"),
                F.col("cls").alias("o_value"),
                F.lit(None).cast("string").alias("o_datatype"),
                F.lit(None).cast("string").alias("o_lang"),
                "graph",
                "part_id",
            )
        )
    for e in extras:
        base = base.unionByName(e)
    base = dedupe_triples(base)

    # rdfs9: broadcast the (closed) subclass map against the type triples
    if sub_class:
        m = _mk_map(sub_class, "cls", "super_cls")
        types = base.filter(F.col("p") == RDF_TYPE)
        entailed = types.join(m, types.o_value == m.cls).select(
            "s",
            F.lit(RDF_TYPE).alias("p"),
            F.lit(KIND_IRI).alias("o_kind"),
            F.col("super_cls").alias("o_value"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            "graph",
            "part_id",
        )
        base = dedupe_triples(base.unionByName(entailed))
    return base
