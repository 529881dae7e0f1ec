"""Partitioned triple-table sinks with Iceberg-style
``overwritePartitions()`` semantics.

The north rule targets partitioned Iceberg tables with snapshot
checkpointing. Two paths, picked at runtime:

* **Iceberg** (when the runtime jar + a configured Iceberg catalog are
  present): ``df.writeTo(table).overwritePartitions()`` — dynamic
  partition replacement recorded in the table's snapshot log, giving
  atomic per-partition refresh and time-travel-able checkpoints.
* **Parquet fallback** (this container ships no Iceberg jar; allowed per
  SURVEY.md §7 M0): per-write ``partitionOverwriteMode=dynamic`` +
  ``mode("overwrite").partitionBy(...)`` — replaces exactly the
  partitions present in the incoming DataFrame and leaves every other
  partition's files untouched, which is the same contract
  ``overwritePartitions()`` gives (minus atomicity across partitions);
  the ``_SUCCESS`` marker doubles as the commit record the pipeline's
  resume logic (plans/pipeline.py C8) reads.

Scale posture: dynamic overwrite means a per-partition recompute of a
10^12-row table touches only the refreshed partitions' files — no
read-modify-write of the whole table, no shuffle beyond the write's own
partitioning. Writers should pre-``repartition(partition_cols)`` when the
incoming data is many-small-files-per-partition shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ICEBERG_CATALOG_IMPLS = (
    "org.apache.iceberg.spark.SparkCatalog",
    "org.apache.iceberg.spark.SparkSessionCatalog",
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on this session AND the
    Iceberg runtime classes actually load in the JVM."""
    try:
        confs = spark.conf.getAll  # Spark 4: property returning dict
        if callable(confs):  # pragma: no cover - older API shape
            confs = dict(spark.sparkContext.getConf().getAll())
    except Exception:
        confs = {}
    has_catalog = any(
        k.startswith("spark.sql.catalog.") and v in _ICEBERG_CATALOG_IMPLS
        for k, v in confs.items()
    )
    if not has_catalog:
        return False
    try:
        spark._jvm.java.lang.Class.forName(_ICEBERG_CATALOG_IMPLS[0])
        return True
    except Exception:
        return False


def write_triples(
    df: DataFrame,
    target: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = ("part_id",),
    use_iceberg: bool | None = None,
) -> None:
    """Write a TRIPLES_SCHEMA (or any partitionable) DataFrame to
    ``target``.

    mode:
      * ``overwrite`` — full-table replace (the pipeline's whole-run
        checkpoint write).
      * ``overwrite_partitions`` — Iceberg ``overwritePartitions()``
        semantics: replace only the partitions present in ``df``; all
        other partitions keep their existing files byte-identically.
      * ``append`` — blind append.

    ``target`` is a table identifier when the Iceberg path is active,
    else a filesystem path for parquet. ``use_iceberg=None`` autodetects
    via :func:`iceberg_available`.
    """
    spark = df.sparkSession
    if use_iceberg is None:
        use_iceberg = iceberg_available(spark)

    if use_iceberg:
        if mode == "overwrite":
            writer = df.writeTo(target).using("iceberg")
            for col in partition_by:
                writer = writer.partitionedBy(col)
            writer.createOrReplace()
        elif mode == "overwrite_partitions":
            # partition spec lives in the existing table's metadata
            df.writeTo(target).overwritePartitions()
        elif mode == "append":
            df.writeTo(target).append()
        else:
            raise ValueError(f"unsupported sink mode {mode!r}")
        return

    w = df.write.partitionBy(*partition_by)
    if mode == "overwrite":
        w.mode("overwrite").parquet(target)
    elif mode == "overwrite_partitions":
        # per-write dynamic mode: only partitions present in df are
        # replaced — session-level partitionOverwriteMode is untouched
        w.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(target)
    elif mode == "append":
        w.mode("append").parquet(target)
    else:
        raise ValueError(f"unsupported sink mode {mode!r}")


def refresh_partitions(df: DataFrame, target: str,
                       partition_by: tuple[str, ...] = ("part_id",)) -> None:
    """Per-partition refresh: recompute some lineage partitions and swap
    them into the committed table without touching the rest — the
    incremental-rerun half of the checkpoint/resume story (C8). Callers
    pass ONLY the recomputed partitions' rows."""
    write_triples(df, target, mode="overwrite_partitions",
                  partition_by=partition_by)
