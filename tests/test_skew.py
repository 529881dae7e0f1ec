"""C7 salted two-stage aggregation: equivalence with plain groupBy and
determinism of the salt."""

from __future__ import annotations

from pyspark.sql import functions as F

from cmem_plugin_pyshacl_spark.operators.skew import (
    salted_agg_by_key,
    salted_count_by_key,
)


def _skewed(spark):
    # hot key 'head' with 5000 rows, 50 cold keys with 10 each
    hot = spark.range(5000).select(
        F.lit("head").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(500).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    plain = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r.k: r.cnt for r in salted_count_by_key(df, "k", salt_from="v").collect()}
    assert salted == plain
    assert salted["head"] == 5000


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.cnt, r.total, r.vmin, r.vmax)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("total"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    salted = {
        r.k: (r.cnt, r.total, r.vmin, r.vmax)
        for r in salted_agg_by_key(df, "k", "v", salt_from="v").collect()
    }
    assert salted == plain


def test_salt_is_deterministic(spark):
    df = _skewed(spark)
    a = sorted(map(tuple, salted_agg_by_key(df, "k", "v", "v").collect()))
    b = sorted(map(tuple, salted_agg_by_key(df, "k", "v", "v").collect()))
    assert a == b
