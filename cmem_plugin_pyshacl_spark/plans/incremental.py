"""Incremental revalidation: re-check only the partitions whose triples
changed since the last run, at full-graph correctness.

north_rule: the run is "resumable from checkpoint with per-partition
lineage + metrics". run_pipeline (plans/pipeline.py) already resumes the
CONSTRUCTION half from committed parquet; this module makes the
VALIDATION half incremental too — at 100 TB, a daily crawl delta touches
a handful of lineage partitions and revalidating the other 99.9 % of the
graph is wasted compute.

Correctness model (why this is not "validate only the changed triples"):
SHACL outcomes are per focus node, but their evaluation is graph-global —
a sh:class check reads type triples wherever they live, property paths
cross partitions, sh:maxCount counts every value of the subject. So the
delta pass narrows WHICH focus nodes are re-checked (validate's
focus_subset semi-join) while value extraction still scans the full
relation. A node is re-checked when any partition that mentions it
(as subject, or as IRI object — covers targetObjectsOf/inverse paths)
changed or disappeared; results of unaffected nodes are carried over
from the prior run unchanged. The differential test pins
incremental == from-scratch on add / modify / delete deltas.

State between runs is two small relations the caller persists as parquet:

  fingerprints(part_id, fp, n_triples) — order-independent per-partition
      content hash: bit_xor of xxhash64 over the full triple key
      (bit_xor, not sum: Spark 4 ANSI mode overflows sum on hash values;
      xor is also insertion-order-proof). n_triples guards the xor's
      blind spot (pairs of changes cancelling) one level further.
  mentions(part_id, node) — distinct nodes each partition mentions; the
      prior run's mentions tell us which nodes a DELETED or changed
      partition used to touch.

Scale posture: fingerprints/mentions are one partial+final agg each over
the triples relation (no joins); the affected-node set is bounded by the
changed partitions' size, never the graph's; changed part_ids come to the
driver (partition counts are thousands, not billions). The revalidation
itself reuses validate()'s single-scan predicate slice.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data_model import KIND_IRI
from .shacl import partition_reports, validate

_KEY_COLS = ["s", "p", "o_kind", "o_value", "o_datatype", "o_lang", "graph"]


@dataclass
class IncrementalState:
    fingerprints: DataFrame  # part_id, fp, n_triples
    mentions: DataFrame  # part_id, node
    results: DataFrame  # RESULT_SCHEMA


def partition_fingerprints(triples: DataFrame) -> DataFrame:
    row_h = F.xxhash64(*[F.col(c) for c in _KEY_COLS])
    return triples.groupBy("part_id").agg(
        F.bit_xor(row_h).alias("fp"),
        F.count(F.lit(1)).alias("n_triples"),
    )


def partition_mentions(triples: DataFrame) -> DataFrame:
    subj = triples.select("part_id", F.col("s").alias("node"))
    obj = triples.filter(F.col("o_kind") == KIND_IRI).select(
        "part_id", F.col("o_value").alias("node")
    )
    return subj.unionByName(obj).distinct()


def changed_partitions(
    fps_new: DataFrame, fps_prior: DataFrame
) -> tuple[list[int], list[int]]:
    """(changed_or_new, removed) part_id lists — driver-side by design,
    partition counts are small."""
    new = fps_new.select(
        "part_id", F.col("fp").alias("_fn"), F.col("n_triples").alias("_nn")
    )
    old = fps_prior.select(
        "part_id", F.col("fp").alias("_fo"), F.col("n_triples").alias("_no")
    )
    joined = new.join(old, on="part_id", how="full_outer").collect()
    changed = sorted(
        r.part_id
        for r in joined
        if r._fn is not None and (r._fo is None or r._fn != r._fo or r._nn != r._no)
    )
    removed = sorted(r.part_id for r in joined if r._fn is None)
    return changed, removed


def incremental_revalidate(
    spark: SparkSession,
    triples: DataFrame,
    shapes_triples: DataFrame,
    prior: IncrementalState | None = None,
    known_changed: list[int] | None = None,
    **validate_kwargs,
) -> tuple[IncrementalState, DataFrame, list[int]]:
    """Returns (new_state, per-partition reports, changed part_ids).

    prior=None runs a full validation (bootstrap). Otherwise only focus
    nodes mentioned by changed/removed partitions are re-checked against
    the FULL graph; every other node's results carry over. Persist
    new_state.{fingerprints,mentions,results} as parquet between runs.

    known_changed: when the caller already knows which partitions it
    rewrote (run_pipeline's sink overwrites specific part_ids — the usual
    case), pass them and the fingerprint/mention state maintenance reads
    ONLY those partitions (partition-pruned on part_id-partitioned
    parquet); unchanged partitions' state carries over without a scan.
    Without it, change DETECTION itself costs one full fingerprint scan —
    still one scan instead of a full re-validation, but the delta-bounded
    path is the 100-TB posture."""
    if prior is not None and known_changed is not None:
        known = sorted(set(known_changed))
        delta = triples.filter(F.col("part_id").isin(known))
        fps_delta = partition_fingerprints(delta)
        mentions_delta = partition_mentions(delta)
        present = {r.part_id for r in fps_delta.select("part_id").collect()}
        prior_parts = {
            r.part_id
            for r in prior.fingerprints.select("part_id")
            .filter(F.col("part_id").isin(known))
            .collect()
        }
        changed = sorted(present)
        removed = sorted(prior_parts - present)
        keep = ~F.col("part_id").isin(known)
        fps = prior.fingerprints.filter(keep).unionByName(fps_delta)
        mentions = prior.mentions.filter(keep).unionByName(mentions_delta)
        touched = changed + removed
        if not touched:
            results = prior.results
        else:
            affected = (
                prior.mentions.filter(F.col("part_id").isin(touched))
                .select("node")
                .unionByName(mentions_delta.select("node"))
                .distinct()
                .withColumnRenamed("node", "focus")
            )
            fresh = validate(
                spark,
                triples,
                shapes_triples,
                focus_subset=affected,
                **validate_kwargs,
            )
            kept = prior.results.join(
                affected.withColumnRenamed("focus", "focusNode"),
                on="focusNode",
                how="left_anti",
            )
            results = kept.unionByName(fresh)
        state = IncrementalState(fps, mentions, results)
        reports = partition_reports(results, fps.select("part_id"))
        return state, reports, touched

    fps = partition_fingerprints(triples)
    mentions = partition_mentions(triples)

    if prior is None:
        results = validate(spark, triples, shapes_triples, **validate_kwargs)
    else:
        changed, removed = changed_partitions(fps, prior.fingerprints)
        touched = changed + removed
        if not touched:
            results = prior.results
        else:
            affected = (
                prior.mentions.filter(F.col("part_id").isin(touched))
                .select("node")
                .unionByName(
                    mentions.filter(F.col("part_id").isin(changed)).select(
                        "node"
                    )
                )
                .distinct()
                .withColumnRenamed("node", "focus")
            )
            fresh = validate(
                spark,
                triples,
                shapes_triples,
                focus_subset=affected,
                **validate_kwargs,
            )
            kept = prior.results.join(
                affected.withColumnRenamed("focus", "focusNode"),
                on="focusNode",
                how="left_anti",
            )
            results = kept.unionByName(fresh)
        state = IncrementalState(fps, mentions, results)
        reports = partition_reports(results, fps.select("part_id"))
        return state, reports, changed + removed

    state = IncrementalState(fps, mentions, results)
    reports = partition_reports(results, fps.select("part_id"))
    return state, reports, sorted(
        r.part_id for r in fps.select("part_id").collect()
    )
