"""C7 — skew handling for head entities: deterministic key salting +
two-stage aggregation (SURVEY.md §2.3; north_rule: "skew from head-entity
URLs is handled with key salting plus two-stage aggregation").

Why: a plain groupBy(key) sends EVERY row of a hot key (a celebrity URL
with 10^8 mentions) to one reduce task. Salting splits each key into
`buckets` sub-keys for the partial aggregate, so the hot key's rows are
combined by up to `buckets` parallel tasks, and only `buckets` partial rows
per key reach the final stage. The salt derives from a hash of secondary
columns — NOT rand() — so retries, re-runs, and checkpoint resumes see
identical partitioning (SURVEY.md §7 hard part (b)).

AQE's skew-join splitting handles the JOIN side at runtime; this handles
the AGGREGATION side, and still matters under AQE because map-side partial
aggregation alone degrades when one key dominates a partition's hash table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_int60


def salted_count_by_key(
    df: DataFrame,
    key_col: str,
    salt_from: str | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Two-stage count per key: partial count on (key, salt), final sum on
    key. Output: (key_col, cnt) — identical to
    ``df.groupBy(key_col).count()`` but skew-immune.

    `salt_from`: column whose hash drives the salt (defaults to the key's
    row content via monotonically varying secondary column is NOT allowed —
    it must be deterministic per row, so pass a real column; falling back
    to the key itself still bounds the final stage to `buckets` rows/key
    while keeping the partial stage deterministic)."""
    src = F.col(salt_from) if salt_from else F.col(key_col)
    salt = (md5_int60(src.cast("string")) % F.lit(buckets)).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(key_col).agg(F.sum("_c").alias("cnt"))


def salted_agg_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_from: str,
    buckets: int = 32,
) -> DataFrame:
    """Two-stage sum/count/min/max per key over a value column. Output:
    (key_col, cnt, total, vmin, vmax) — algebraic aggregates decompose
    exactly across the salted partial stage."""
    salt = (md5_int60(F.col(salt_from).cast("string")) % F.lit(buckets)).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(value_col).alias("_s"),
            F.min(value_col).alias("_mn"),
            F.max(value_col).alias("_mx"),
        )
    )
    return partial.groupBy(key_col).agg(
        F.sum("_c").alias("cnt"),
        F.sum("_s").alias("total"),
        F.min("_mn").alias("vmin"),
        F.max("_mx").alias("vmax"),
    )
