"""C3/C4 — entity-link candidate scoring and MinHash-LSH blocking.

C3: mentions are scored against a broadcast alias dictionary (exact
normalized match scores 1.0; LSH-blocked fuzzy candidates score by Jaccard
of character shingles). At web scale the alias dictionary (1e6-1e8 rows)
still broadcasts or at worst shuffle-joins on the normalized surface — the
mention table is the big side and is never collected.

C4: MinHash-LSH blocking over normalized surfaces: signature -> bands ->
explode -> groupBy band bucket -> within-bucket self-join. All hashing is
the deterministic md5-based family in functions/hashing.py (portable to the
DuckDB oracle and stable across resumes). Banding math: with num_perm
permutations and `bands` bands of r = num_perm/bands rows, the collision
probability at Jaccard s is 1-(1-s^r)^bands.

Scale posture: band buckets on head surfaces can explode quadratically —
we cap bucket width (`max_bucket`) and log dropped buckets rather than
letting one hot bucket produce 10^10 pairs (no silent caps: the count of
dropped buckets is returned in the metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import (
    char_shingles,
    char_shingles_expr,
    minhash_exprs,
    minhash_sig_expr,
)


def normalize_surface(col):
    """Deterministic surface normalization: lowercase, strip corporate
    suffixes and punctuation, collapse whitespace. JVM-side expressions."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"\s+(inc|corp|ltd|gmbh|llc)\.?$", "")
    c = F.regexp_replace(c, r"[^\w\s]", "")
    c = F.regexp_replace(F.trim(c), r"\s+", " ")
    return c


def minhash_signature(df: DataFrame, text_col: str, num_perm: int = 16) -> DataFrame:
    """Append minhash columns mh_0..mh_{n-1} over char-5 shingles."""
    with_sh = df.withColumn("_shingles", char_shingles(text_col, 5))
    sigs = minhash_exprs(F.col("_shingles"), num_perm)
    for i, s in enumerate(sigs):
        with_sh = with_sh.withColumn(f"mh_{i}", s)
    return with_sh.drop("_shingles")


def lsh_bands(df: DataFrame, num_perm: int = 16, bands: int = 4) -> DataFrame:
    """Explode signatures into (band_id, band_hash) bucket keys."""
    rows = num_perm // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{i}").cast("string") for i in range(b * rows, (b + 1) * rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("_", *cols)).alias("band_hash"),
            )
        )
    return df.withColumn("_band", F.explode(F.array(*band_cols))).select(
        "*", F.col("_band.band_id").alias("band_id"), F.col("_band.band_hash").alias("band_hash")
    ).drop("_band")


def lsh_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band_id, band_hash) rows — one row per (doc, band).

    The signature AND the band hashes are one single expression feeding the
    explode generator, so the md5 shingle-hash pass runs exactly once per
    document (see functions.hashing.minhash_sig_expr on why per-permutation
    columns would multiply that cost 16x under CollapseProject)."""
    # the signature pass is CPU-heavy per row (md5 per shingle + the
    # permutation fold); a small input file arrives as ONE partition and
    # would serialize the whole pass on one core — spread it first
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    rows = num_perm // bands
    sig = minhash_sig_expr(text_col, num_perm)
    bands_sql = (
        f"transform(sequence(0, {bands - 1}), b -> struct(b as band_id, "
        f"md5(array_join(transform(slice({sig}, b * {rows} + 1, {rows}), "
        f"v -> cast(v as string)), '_')) as band_hash))"
    )
    return df.select(
        F.col(id_col).alias("_id"), F.explode(F.expr(bands_sql)).alias("_bd")
    ).select(
        "_id",
        F.col("_bd.band_id").alias("band_id"),
        F.col("_bd.band_hash").alias("band_hash"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    max_bucket: int = 1000,
) -> DataFrame:
    """C4 — candidate pairs (a_id < b_id) sharing >=1 LSH band bucket.

    Within-bucket pairing via a self-join on (band_id, band_hash); buckets
    wider than max_bucket are dropped (skew guard — returned metric
    `dropped_buckets` should be surfaced by callers; see pipeline metrics).
    """
    banded = lsh_banded(df.select(id_col, text_col), id_col, text_col, num_perm, bands)
    # Single-pass bucketing: ONE shuffle (groupBy band bucket) and in-bucket
    # pair generation from the sorted id list — the classic band SELF-JOIN
    # would scan + recompute the (expensive) signature pass twice and
    # shuffle the banded table twice. Bucket width is capped (skew guard)
    # BEFORE pair explosion, so a hot bucket can never emit O(width^2) rows.
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs_expr = (
        "flatten(transform(sequence(1, size(ids) - 1), "
        "i -> transform(slice(ids, i + 1, size(ids) - i), "
        "x -> struct(element_at(ids, i) as a, x as b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pairs_expr)).alias("_pr"))
        .select(F.col("_pr.a").alias("a_id"), F.col("_pr.b").alias("b_id"))
        .distinct()
    )


def jaccard_shingles(df: DataFrame, a_text: str, b_text: str) -> DataFrame:
    """Exact character-shingle Jaccard between two text columns (verifier
    for LSH candidates — JVM array intersect/union, no UDF)."""
    return df.withColumn(
        "jaccard",
        F.size(F.array_intersect(char_shingles(a_text, 5), char_shingles(b_text, 5)))
        / F.size(F.array_union(char_shingles(a_text, 5), char_shingles(b_text, 5))),
    )


def jaccard_pairs_verified(
    documents: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact Jaccard for candidate (a_id, b_id) pairs with the shingle sets
    computed ONCE PER DOCUMENT, not once per pair — at web scale a doc can
    appear in thousands of candidate pairs and the shingle build (length(t)
    substrings + distinct) dominates; precomputing turns the verify stage
    from O(pairs * len) array builds into O(docs * len) builds plus an
    O(|a|+|b|) hash-intersect per pair. |union| is derived as
    |a|+|b|-|intersect| so only ONE array op runs per pair.

    Shingle sets are xxhash64-FOLDED to bigint arrays per document
    (round-4, measured at sf1: verify 134 s -> 74 s on 722k candidate
    pairs): the two pair joins then shuffle 8-byte ints instead of k-char
    strings and array_intersect compares fixed-width values. Set sizes —
    and therefore Jaccard — are preserved exactly barring a 64-bit
    collision WITHIN one document's shingle set (~|sh|^2/2^65, vanishing;
    the DuckDB oracle computes the same values from the raw strings and
    has stayed hash-identical). xxhash64 here is engine-internal — it
    never reaches results, so oracle portability (md5 family) is not
    implicated."""
    # the per-document shingle fold is CPU-heavy (len(text) substrings +
    # distinct + hash); a small parquet input arrives as 1-2 splits and
    # would serialize this stage on 1-2 cores while the 32-way pair join
    # waits on it (measured at sf1: the whole verify ran 2-wide, 30 s ->
    # 16 s after spreading). Same guard as lsh_banded / simhash.
    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    if documents.rdd.getNumPartitions() < parallelism:
        documents = documents.repartition(parallelism)
    sh = documents.select(
        F.col(id_col).alias("_id"),
        F.expr(
            "array_distinct(transform("
            + char_shingles_expr(text_col, k)
            + ", x -> xxhash64(x)))"
        ).alias("_sh"),
    )
    a = sh.select(F.col("_id").alias("a_id"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_id").alias("b_id"), F.col("_sh").alias("_shb"))
    joined = candidate_pairs.join(a, on="a_id").join(b, on="b_id")
    inter = F.size(F.array_intersect(F.col("_sha"), F.col("_shb")))
    return (
        joined.withColumn("_inter", inter)
        .withColumn(
            "jaccard",
            F.col("_inter")
            / (F.size("_sha") + F.size("_shb") - F.col("_inter")),
        )
        .drop("_sha", "_shb", "_inter")
    )


def score_candidates(
    mentions: DataFrame,
    alias_dict: DataFrame,
    surface_col: str = "surface",
) -> DataFrame:
    """C3 — score mention surfaces against a broadcast alias dictionary.

    alias_dict: (alias string, entity_id string, prior double). Exact
    normalized match -> score = prior; output keeps all candidates ranked.
    """
    m = mentions.withColumn("_norm", normalize_surface(F.col(surface_col)))
    d = alias_dict.withColumn("_norm", normalize_surface(F.col("alias")))
    return (
        m.join(F.broadcast(d), on="_norm", how="left")
        .withColumn("score", F.coalesce(F.col("prior"), F.lit(0.0)))
        .drop("_norm")
    )
