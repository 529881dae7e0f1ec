"""Incremental ingest: readStream over a parquet pages directory ->
foreachBatch(construct + validate) -> parquet sinks with checkpointing.

Each micro-batch runs the SAME batch plan as plans/pipeline.py (foreachBatch
hands us a plain DataFrame), so batch/stream semantics cannot drift. The
streaming checkpoint directory provides exactly-once file-source progress;
the per-batch parquet commits provide the same per-partition lineage as the
batch path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..data_model import TRIPLES_SCHEMA


def pages_stream(spark: SparkSession, pages_dir: str, schema=None) -> DataFrame:
    """File-source stream of pages parquet drops (one file per drop)."""
    reader = spark.readStream
    if schema is None:
        # parquet streams need an explicit schema; infer from existing files
        schema = spark.read.parquet(pages_dir).schema
    return reader.schema(schema).option("maxFilesPerTrigger", 1).parquet(pages_dir)


def validate_stream(
    spark: SparkSession,
    pages_dir: str,
    shapes_triples: DataFrame,
    out_dir: str,
    checkpoint_dir: str | None = None,
):
    """Start a stream that constructs + validates each micro-batch of pages
    and appends triples/results to parquet sinks. Returns the
    StreamingQuery (caller awaits/stops it)."""
    from ..plans.pipeline import (
        canonicalize_stage,
        relations_fused_stage,
        triples_stage,
    )
    from ..plans.shacl import validate as shacl_validate

    stream = pages_stream(spark, pages_dir)
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        relations = relations_fused_stage(batch_df)
        mapping = canonicalize_stage(relations)
        triples = triples_stage(relations, mapping)
        triples.write.mode("append").partitionBy("part_id").parquet(
            os.path.join(out_dir, "triples")
        )
        results = shacl_validate(spark, triples, shapes_triples)
        results.write.mode("append").parquet(os.path.join(out_dir, "validation_results"))

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
