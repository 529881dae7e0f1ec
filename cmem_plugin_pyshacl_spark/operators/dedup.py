"""Deduplication family over the `documents` table — first-class operators
for the 100 TB training-data pipeline.

All hashing is the deterministic md5-derived family (functions/hashing.py)
so every operator here is DuckDB-oracle-checkable AND stable across
re-runs/resumes (no engine-private hash, no rand()).

Scale notes per operator:
  * exact_duplicates: one shuffle on the content hash; map-side partial agg
    makes the common all-unique case cheap.
  * minhash_duplicates: signature computation is embarrassingly parallel
    (array exprs in codegen); the band self-join shuffles on band buckets;
    hot buckets capped (see linking.lsh_candidate_pairs).
  * simhash_duplicates: fingerprint is a single pass; candidate pairing via
    band keys on 16-bit chunks (classic Manku et al. WWW'07 rotation trick
    reduced to 4 chunk-keys for hamming<=3 within 60-bit prints).
  * ngram_jaccard_pairs: exact verifier on candidate pairs only — never
    all-pairs at scale.
  * embedding_near_dup: cosine over float arrays via JVM zip_with/aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    hamming64,
    md5_int60,
    simhash64,
)
from ..plans.linking import jaccard_pairs_verified, lsh_candidate_pairs


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (content_hash, doc_ids, dup_count),
    only groups with >1 member. One hash-shuffle; partial+final agg."""
    return (
        documents.select(F.col("doc_id"), md5_int60(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.count("*").alias("dup_count"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep exactly one doc (min doc_id) per distinct content hash."""
    w_hash = documents.withColumn("content_hash", md5_int60(F.col(text_col)))
    keep = w_hash.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    return documents.join(keep, on="doc_id", how="left_semi")


def exact_dedup_annotated(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document exact-dedup verdict: (doc_id, content_hash, dup_count,
    kept) — the groups view and the keep-one view in one pass. `kept` marks
    the canonical survivor (min doc_id per hash). Same single hash-shuffle
    as exact_duplicates; the survivor pick is a window over the hash
    partition (no second join)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash")
    return (
        documents.select(
            F.col("doc_id"), md5_int60(F.col(text_col)).alias("content_hash")
        )
        .withColumn("dup_count", F.count(F.lit(1)).over(w))
        .withColumn("kept", F.col("doc_id") == F.min("doc_id").over(w))
    )


def minhash_duplicates(
    documents: DataFrame,
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification:
    (a_id, b_id, jaccard) for pairs above threshold."""
    pairs = lsh_candidate_pairs(documents, "doc_id", text_col, num_perm, bands)
    return (
        jaccard_pairs_verified(documents, pairs, "doc_id", text_col, k=5)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash_fingerprints(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash per document over whitespace tokens."""
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < parallelism:
        # CPU-heavy per-row expression; don't serialize on one input split
        documents = documents.repartition(parallelism)
    tokens_expr = f"split(trim({text_col}), '\\\\s+')"
    return documents.select(
        "doc_id", simhash64(tokens_expr).alias("simhash")
    )


def simhash_chunk_buckets(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """SimHash pigeonhole buckets: each doc lands in 4 buckets keyed by
    (chunk_id, 15-bit chunk value); members carried as (doc_id, simhash)
    structs sorted by doc_id. ONE scan of the fingerprint pass."""
    fp = simhash_fingerprints(documents, text_col)
    chunks = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright(F.col("simhash"), i * 15)
                        .bitwiseAND(F.lit((1 << 15) - 1))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk_id", "c.chunk_val")
    return chunks.groupBy("chunk_id", "chunk_val").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("doc_id").alias("id"), F.col("simhash").alias("sh")))
        ).alias("members")
    )


def simhash_duplicates(
    documents: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 1000,
    return_dropped: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Near-dup pairs by SimHash: candidates share one of 4 15-bit chunks
    (pigeonhole: hamming<=3 over 60 bits => >=1 of 4 chunks equal), then
    exact hamming filter. Returns (a_id, b_id, hamming).

    Scale posture (round-4 VERDICT finding 2): chunk space is only 15 bits
    (32,768 values), so at 10^9+ docs the average bucket holds ~30k docs
    and a naive self-join explodes to O(width^2) pairs per bucket (~10^13
    total). Mirror of the MinHash-LSH guard (plans/linking.py): ONE shuffle
    groups each (chunk_id, chunk_val) bucket, width is CAPPED at
    `max_bucket` BEFORE pair explosion, and in-bucket pairs come from an
    array expression over the sorted member list — a hot bucket can never
    emit O(width^2) rows, and the fingerprint pass is scanned once instead
    of twice (the old self-join re-ran it for each side).

    With return_dropped=True also returns the (chunk_id, chunk_val, width)
    frame of buckets the cap dropped, so callers can surface recall loss
    as a metric instead of silently missing pairs.
    """
    buckets = simhash_chunk_buckets(documents, text_col)
    kept = buckets.filter(
        (F.size("members") >= 2) & (F.size("members") <= max_bucket)
    )
    pairs_expr = (
        "flatten(transform(sequence(1, size(members) - 1), "
        "i -> transform(slice(members, i + 1, size(members) - i), "
        "x -> struct(element_at(members, i).id as a_id, "
        "element_at(members, i).sh as a_sh, x.id as b_id, x.sh as b_sh))))"
    )
    pairs = (
        kept.select(F.explode(F.expr(pairs_expr)).alias("_pr"))
        .select(
            F.col("_pr.a_id").alias("a_id"),
            F.col("_pr.b_id").alias("b_id"),
            hamming64(F.col("_pr.a_sh"), F.col("_pr.b_sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    if not return_dropped:
        return pairs
    dropped = buckets.filter(F.size("members") > max_bucket).select(
        "chunk_id", "chunk_val", F.size("members").alias("width")
    )
    return pairs, dropped


def ngram_jaccard_pairs(
    documents: DataFrame,
    candidate_pairs: DataFrame | None = None,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact character-k-gram Jaccard for candidate pairs (or LSH-derived
    candidates when none given)."""
    if candidate_pairs is None:
        candidate_pairs = lsh_candidate_pairs(documents, "doc_id", text_col)
    return (
        jaccard_pairs_verified(documents, candidate_pairs, "doc_id", text_col, k=k)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Without candidates this is the
    brute-force O(n^2) baseline (fine at test scale; at 100 TB feed it
    LSH/IVF candidates from operators/similarity.py)."""
    from .similarity import cosine_expr

    # per-pair cosine runs on these sides' partitioning — spread a small
    # single-split input first (see lsh_banded / brute_force_topk)
    parallelism = embeddings.sparkSession.sparkContext.defaultParallelism
    if embeddings.rdd.getNumPartitions() < parallelism:
        embeddings = embeddings.repartition(parallelism)
    a = embeddings.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = embeddings.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    if candidate_pairs is not None:
        joined = candidate_pairs.join(a, on="a_id").join(b, on="b_id")
    else:
        joined = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    return (
        joined.withColumn("cosine", cosine_expr(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "cosine")
    )


def near_dup_clusters(pairs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id) from near-duplicate PAIRS via connected
    components — near-duplication is transitive in practice (A≈B, B≈C ⇒
    one cluster even when A,C were never paired), so pair output alone
    over-keeps. cluster_id = min doc_id of the cluster, the same
    deterministic canonicalization the entity-linking stage uses
    (plans/connected_components: star-contraction fixpoint at scale,
    union-find under the small-graph threshold). Docs in no pair are
    absent (each is its own singleton cluster by definition)."""
    from ..plans.connected_components import connected_components

    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    return connected_components(edges).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def dedup_near(
    documents: DataFrame,
    text_col: str = "text",
    method: str = "minhash",
    **kwargs,
) -> DataFrame:
    """Keep ONE representative (min doc_id) per near-duplicate CLUSTER —
    the stage real training-data pipelines run between pair generation and
    the corpus sink. method selects the pair generator: 'minhash'
    (MinHash-LSH + exact-Jaccard verify) or 'simhash' (pigeonhole banding
    + exact hamming); kwargs pass through (threshold, num_perm, bands /
    max_hamming). Plan shape: pair generation (banded, never all-pairs)
    → CC canonicalize → one anti join on doc_id."""
    if method == "minhash":
        pairs = minhash_duplicates(documents, text_col, **kwargs)
    elif method == "simhash":
        pairs = simhash_duplicates(documents, text_col, **kwargs)
    else:
        raise ValueError(f"unknown near-dup method {method!r}")
    clusters = near_dup_clusters(pairs.select("a_id", "b_id"))
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return documents.join(losers, on="doc_id", how="left_anti")
