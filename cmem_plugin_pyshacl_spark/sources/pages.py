"""Deterministic synthetic `pages` table (BASELINE.json input_hint shape:
url string, warc_ts timestamp, html binary, text string, lang string).

FIXTURES.md §1 generation rules, seed-fixed (seed=42): pure function of the
row index, no wall-clock, no unseeded rand — so reruns, resumes, and the
two-parallelism scaling runs all see byte-identical input.

Generation is DISTRIBUTED: spark.range(N) partitions the index space across
executors and all columns derive from `id` via JVM expressions + one Arrow
pandas UDF for the html/text templating (vectorized, no per-row Python
interpreter in the row loop beyond numpy-backed string ops). At 10^12 rows
this generator is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# fixed entity vocabulary (FIXTURES.md §1): drives the exactly-computable
# golden triple set for P/R checks.
PERSONS = [f"person{i}" for i in range(50)]
ORGS = [f"org{i}" for i in range(20)]
PLACES = [f"place{i}" for i in range(10)]
LANGS = ["en", "de", "fr", "es", "zh"]

_FILLER = [
    "the quick brown fox jumps over the lazy dog",
    "lorem ipsum dolor sit amet consectetur",
    "a journey of a thousand miles begins with a single step",
    "to be or not to be that is the question",
    "all that glitters is not gold",
    "actions speak louder than words",
    "practice makes perfect every single day",
]


def _mention_sentences(i: int) -> list[str]:
    """Deterministic mention sentences for row i. ~60% of rows carry
    mentions; alias variants (org{k} Inc.) exercise canonicalization."""
    out = []
    if i % 5 in (0, 1, 2):
        p = PERSONS[(i * 7) % len(PERSONS)]
        o = ORGS[(i * 11) % len(ORGS)]
        org_surface = f"{o} Inc." if i % 3 == 0 else o
        out.append(f"{p} works at {org_surface}.")
    if i % 5 in (1, 3):
        o = ORGS[(i * 13) % len(ORGS)]
        pl = PLACES[(i * 17) % len(PLACES)]
        out.append(f"{o} is based in {pl}.")
    return out


def page_html(i: int) -> str:
    """Pure python single-row html template (shared by the pandas UDF and
    the golden-triple oracle in tests)."""
    title = f"Page {i} of site{i % 97}"
    sentences = _mention_sentences(i) + [
        _FILLER[(i + j) % len(_FILLER)] + "." for j in range(1 + i % 3)
    ]
    body = "".join(f"<p>{s}</p>" for s in sentences)
    return (
        f"<html><head><title>{title}</title>"
        f"<script>var x={i};</script>"
        f"<style>p {{color: black}}</style></head>"
        f"<body><h1>{title}</h1>{body}<!-- comment {i} --></body></html>"
    )


@pandas_udf(T.BinaryType())
def _html_udf(idx: pd.Series) -> pd.Series:
    return idx.map(lambda i: page_html(int(i)).encode("utf-8"))


def generate_pages(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """Distributed deterministic pages table with part_id = id % 64 lineage
    column (FIXTURES.md §1)."""
    df = spark.range(0, n, 1, num_partitions or max(1, min(64, n // 250 or 1)))
    return pages_from_ids(df, spread=False)  # caller controls partitioning


def pages_from_ids(ids: DataFrame, spread: bool = True) -> DataFrame:
    """Pages derived for an ARBITRARY id set (column ``id``) — the same
    pure per-id derivation generate_pages feeds with ``spark.range``. Lets
    a caller build the page a given ``documents.doc_id`` analytically maps
    to even when ids are non-contiguous (e.g. locally-replicated scale
    fixtures offset replica ids to keep them unique). ``spread`` applies
    the small-split repartition guard (the html/text templating is a
    CPU-heavy pandas UDF; an id frame read from a small parquet arrives
    as 1-2 splits and would serialize it) — generate_pages turns it off
    because its num_partitions argument IS the partitioning contract."""
    from ..functions.extract import extract_text_udf

    if spread:
        parallelism = ids.sparkSession.sparkContext.defaultParallelism
        if ids.rdd.getNumPartitions() < parallelism:
            ids = ids.repartition(parallelism)
    df = ids.select(
        F.concat(
            F.lit("https://example.org/site"),
            (F.col("id") % 97).cast("string"),
            F.lit("/page"),
            F.col("id").cast("string"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("id") * 37).cast("double"))
        ).alias("warc_ts"),
        _html_udf(F.col("id")).alias("html"),
        F.element_at(
            F.array(*[F.lit(lang) for lang in LANGS]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("lang"),
        (F.col("id") % 64).cast("int").alias("part_id"),
        F.col("id"),
    )
    # `text` column pre-filled with the extractor's own output so tests can
    # assert the frozen byte-identity invariant (extract(html) == text).
    df = df.withColumn("text", extract_text_udf(F.col("html")))
    return df.select("url", "warc_ts", "html", "text", "lang", "part_id", "id")
