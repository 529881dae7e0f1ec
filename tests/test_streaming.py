"""Structured-Streaming ingest test: the foreachBatch path must produce
the same triples as the batch pipeline over the same pages."""

from __future__ import annotations

import os

from cmem_plugin_pyshacl_spark.data_model import (
    EX,
    RDF_TYPE,
    SH,
    XSD_INTEGER,
    iri,
    lit_typed,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.plans.pipeline import (
    canonicalize_stage,
    relations_fused_stage,
    triples_stage,
)
from cmem_plugin_pyshacl_spark.sources.pages import generate_pages
from cmem_plugin_pyshacl_spark.streaming.ingest import validate_stream


def _shapes(spark):
    return triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "Person")),
            (EX + "S", SH + "property", iri(EX + "S/p")),
            (EX + "S/p", SH + "path", iri(EX + "basedIn")),
            (EX + "S/p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )


def test_stream_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    pages = generate_pages(spark, 120)
    # two file drops -> two micro-batches (maxFilesPerTrigger=1)
    pages.filter(pages.id < 60).coalesce(1).write.parquet(
        pages_dir, mode="overwrite"
    )
    pages.filter(pages.id >= 60).coalesce(1).write.mode("append").parquet(pages_dir)

    q = validate_stream(spark, pages_dir, _shapes(spark), out_dir)
    q.awaitTermination(120)

    streamed = spark.read.parquet(os.path.join(out_dir, "triples"))
    got = {(r.s, r.p, r.o_value) for r in streamed.collect()}

    rel = relations_fused_stage(pages)
    batch = triples_stage(rel, canonicalize_stage(rel))
    want = {(r.s, r.p, r.o_value) for r in batch.collect()}
    # entity IRIs are normalization-stable, so the relation/type triples
    # must match the batch run exactly. rdfs:label carries the canonical
    # (min) SURFACE, which is a global property — a micro-batch that only
    # ever saw "org5 Inc." legitimately labels with that alias — so labels
    # are compared on subject coverage, not value.
    lbl = "http://www.w3.org/2000/01/rdf-schema#label"
    assert {t for t in got if t[1] != lbl} == {t for t in want if t[1] != lbl}
    assert {t[0] for t in got if t[1] == lbl} == {t[0] for t in want if t[1] == lbl}

    results = spark.read.parquet(os.path.join(out_dir, "validation_results"))
    assert results.count() > 0


# ---------------------------------------------- stateful streaming (round 2)
def _write_event_files(spark, tmp_path, n_files=4):
    """Events parquet split into ts-ordered file drops so the watermark
    advances across micro-batches."""
    import pandas as pd

    src = "/root/testdata/sf0.001/events.parquet"
    pdf = pd.read_parquet(src).sort_values(["ts", "event_id"]).reset_index(drop=True)
    d = str(tmp_path / "event_stream")
    import os

    os.makedirs(d, exist_ok=True)
    chunk = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        part = pdf.iloc[i * chunk : (i + 1) * chunk]
        if len(part):
            part.to_parquet(f"{d}/part-{i:03d}.parquet", index=False)
    return d


def _batch_sessions(spark, events, gap=1800):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # keep sub-second precision (the stream side works in fractional epoch
    # seconds; unix_timestamp would truncate)
    secs = F.col("ts").cast("timestamp").cast("double")
    prev = F.lag(secs).over(w)
    marked = events.withColumn("secs", secs).withColumn(
        "new_s", (prev.isNull() | ((secs - prev) > gap)).cast("long")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = marked.withColumn("sid", F.sum("new_s").over(w2))
    return (
        sess.groupBy("user_id", "sid")
        .agg(
            F.min("secs").alias("session_start"),
            F.max("secs").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("sid").alias("_sid"),
        )
        .drop("_sid")
    )


def test_windowed_counts_stream_subset_of_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from cmem_plugin_pyshacl_spark.streaming.ingest import pages_stream  # noqa: F401
    from cmem_plugin_pyshacl_spark.streaming.stateful import windowed_event_counts

    d = _write_event_files(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        windowed_event_counts(stream, window="6 hours", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type, r.n)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = {
        (r.window_start, r.event_type, r.n)
        for r in windowed_event_counts(spark.read.parquet(d), window="6 hours").collect()
    }
    assert got, "append mode should finalize at least the early windows"
    assert got <= batch  # every emitted window agrees exactly with batch


def test_sessionize_stream_reconciles_with_batch(spark, tmp_path):
    from cmem_plugin_pyshacl_spark.streaming.stateful import sessionize_stream

    d = _write_event_files(spark, tmp_path)
    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, round(r.session_start, 3), round(r.session_end, 3), r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    batch = _batch_sessions(spark, spark.read.parquet(d))
    all_sessions = {
        (r.user_id, round(r.session_start, 3), round(r.session_end, 3), r.n_events)
        for r in batch.collect()
    }
    # last session per user may stay open at end-of-stream (timeout not yet
    # passed); every session closed by in-data evidence MUST be emitted
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    non_final = {
        (r.user_id, round(r.session_start, 3), round(r.session_end, 3), r.n_events)
        for r in batch.withColumn("last_end", F.max("session_end").over(w))
        .filter(F.col("session_end") < F.col("last_end"))
        .collect()
    }
    assert got <= all_sessions  # emitted sessions agree exactly with batch
    assert non_final <= got  # all evidence-closed sessions emitted
    assert len(non_final) > 0  # the fixture does contain multi-session users
