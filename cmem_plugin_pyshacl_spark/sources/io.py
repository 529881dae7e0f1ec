"""Format-dispatching RDF I/O front door.

The reference moves graphs through rdflib, which sniffs the serialization
and parses anything (plugin_pyshacl.py:539-543). This module is the Spark
twin: one `read_rdf(spark, path)` / `write_rdf(df, path)` pair that
dispatches on the file extension (or an explicit `format=`) to the
format-specific sources in this package, always producing/consuming the
canonical TRIPLES_SCHEMA relation.

Scale posture per format (documented on each source):
  * parquet          — the native table form; fully distributed both ways.
  * .nt / .nq        — line-oriented, splittable: distributed text scan
                       with pure-codegen regex parsing; N-Quads round-trips
                       the graph column.
  * .jsonl/.ndjson   — expanded NDJSON JSON-LD: splittable mapInPandas.
  * .ttl / .trig     — driver-side parse (Turtle's multi-line statements
                       and bnode property lists are not line-splittable);
                       the shapes/ontology ingest path. Writers ARE
                       distributed (per-part standalone headers).
  * .jsonld / .json  — driver-side compacted-document expansion
                       (@context, nested nodes, @list, @reverse, @graph).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..data_model import (
    from_nquads,
    from_ntriples,
    to_nquads,
    to_ntriples,
)

_READ_EXTS = {
    ".parquet": "parquet",
    ".nt": "ntriples",
    ".nq": "nquads",
    ".nquads": "nquads",
    ".ttl": "turtle",
    ".trig": "trig",
    ".jsonld": "jsonld",
    ".json": "jsonld",
    ".jsonl": "ndjson",
    ".ndjson": "ndjson",
    ".rdf": "rdfxml",
    ".owl": "rdfxml",
    ".rdfxml": "rdfxml",
}


def _sniff(path: str, format: str | None) -> str:
    if format:
        return format
    base = path.rstrip("/")
    # Spark's text source decompresses .gz/.bz2/… transparently — sniff
    # the inner extension ("pages.nt.gz" reads as N-Triples)
    root, ext = os.path.splitext(base)
    if ext.lower() in (".gz", ".bz2", ".zst", ".lz4", ".snappy"):
        base = root
    ext = os.path.splitext(base)[1].lower()
    if ext in _READ_EXTS:
        return _READ_EXTS[ext]
    raise ValueError(
        f"cannot infer RDF format from {path!r} — pass format= one of "
        f"{sorted(set(_READ_EXTS.values()))}"
    )


# Turtle/TriG are NOT line-splittable (multi-line statements, prefix state),
# so they parse on the DRIVER — right for shapes-sized graphs, a silent OOM
# for a bulk corpus someone exported as .trig. Guard the collect with a byte
# threshold (round-4 VERDICT watch item) and point users at the splittable
# formats instead of letting the driver die.
_DRIVER_PARSE_MAX_BYTES = 256 << 20


def read_rdf(
    spark: SparkSession,
    path: str,
    format: str | None = None,
    graph: str | None = None,
    max_driver_bytes: int = _DRIVER_PARSE_MAX_BYTES,
    contexts: dict | None = None,
) -> DataFrame:
    """Read an RDF file/directory into the triples relation, dispatching
    on extension (or explicit `format`). `graph` names the default graph
    for formats that don't carry one per statement.

    Turtle/TriG inputs are parsed driver-side and therefore refused above
    `max_driver_bytes` (raise the limit explicitly if you really mean it);
    N-Triples/N-Quads/NDJSON-LD/parquet scale distributed.

    ``contexts={url: dict}`` resolves remote JSON-LD @context URLs from
    the caller's mapping (.jsonld documents only) — no network I/O."""
    fmt = _sniff(path, format)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "ntriples":
        return from_ntriples(spark.read.text(path), line_col="value", graph=graph)
    if fmt == "nquads":
        return from_nquads(spark.read.text(path), line_col="value")
    if fmt == "ndjson":
        from .jsonld import from_jsonld

        return from_jsonld(spark.read.text(path), line_col="value", graph=graph)
    if fmt in ("turtle", "trig"):
        from .turtle import from_turtle

        lines = spark.read.text(path)
        # file-size-backed Catalyst estimate (no job) — same trustworthy
        # upper bound the broadcast gate relies on; works for any
        # filesystem Spark can read (local/HDFS/S3), unlike os.stat
        try:
            est = int(
                lines._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # pragma: no cover - connect mode
            est = 0
        if est > max_driver_bytes:
            raise ValueError(
                f"{path!r} is ~{est >> 20} MiB of {fmt}; Turtle/TriG parse "
                f"on the DRIVER (not line-splittable) and this exceeds "
                f"max_driver_bytes={max_driver_bytes >> 20} MiB. For bulk "
                f"graphs use a splittable format instead — N-Triples (.nt), "
                f"N-Quads (.nq), NDJSON-LD (.ndjson), parquet, or "
                f"line-delimited TriG via sources.trig_bulk.read_trig_bulk "
                f"— or pass max_driver_bytes explicitly if the driver "
                f"really has the memory."
            )
        # one driver-side document per part file; directories concatenate
        texts = [r.value for r in lines.collect()]
        return from_turtle(spark, "\n".join(texts), graph)
    if fmt == "jsonld":
        from .jsonld import read_jsonld_document

        with open(path, encoding="utf-8") as fh:
            return read_jsonld_document(
                spark, fh.read(), graph=graph, contexts=contexts
            )
    if fmt == "rdfxml":
        from .rdfxml import read_rdfxml

        return read_rdfxml(spark, path, graph=graph)
    raise ValueError(f"unknown RDF format {fmt!r}")


def write_rdf(
    df: DataFrame,
    path: str,
    format: str | None = None,
    single_file: bool = False,
    prefixes: dict[str, str] | None = None,
) -> None:
    """Write a triples relation in the format implied by the extension
    (or explicit `format`)."""
    fmt = _sniff(path, format)
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return
    if fmt == "ntriples":
        out = to_ntriples(df)
    elif fmt == "nquads":
        out = to_nquads(df)
    elif fmt == "ndjson":
        from .jsonld import to_jsonld

        out = to_jsonld(df)
    elif fmt == "turtle":
        from .turtle import write_turtle

        write_turtle(df, path, prefixes, single_file=single_file)
        return
    elif fmt == "trig":
        from .turtle import write_trig

        write_trig(df, path, prefixes, single_file=single_file)
        return
    elif fmt == "rdfxml":
        from .rdfxml import write_rdfxml

        write_rdfxml(df, path, single_file=single_file)
        return
    else:
        raise ValueError(f"unknown RDF format {fmt!r}")
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)
