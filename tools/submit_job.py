"""spark-submit entry point (north_rule: "run via spark-submit --py-files
on a multi-executor cluster").

The package is shipped via --py-files; this script imports it ONLY from
the shipped zip (no repo-path assumptions), builds the synthetic pages
input, runs the full construct-then-validate pipeline, and writes one
JSON metrics line.

Usage:
  spark-submit --master local[8] \
      --py-files /path/to/cmem_plugin_pyshacl_spark.zip \
      tools/submit_job.py <n_pages> <out_dir>
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import SparkSession


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/submit_job_out"

    spark = (
        SparkSession.builder.appName("kg-construct-validate")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    # --py-files put the zip on the driver sys.path and ships it to workers
    from cmem_plugin_pyshacl_spark.data_model import (
        EX,
        RDF_TYPE,
        SH,
        XSD_INTEGER,
        iri,
        lit_typed,
        triples_from_rows,
    )
    from cmem_plugin_pyshacl_spark.plans.pipeline import run_pipeline
    from cmem_plugin_pyshacl_spark.sources.pages import generate_pages

    pages = generate_pages(spark, n_pages, num_partitions=8)
    shapes = triples_from_rows(
        spark,
        [
            (EX + "S", RDF_TYPE, iri(SH + "NodeShape")),
            (EX + "S", SH + "targetClass", iri(EX + "Person")),
            (EX + "S", SH + "property", iri(EX + "S/p")),
            (EX + "S/p", SH + "path", iri(EX + "basedIn")),
            (EX + "S/p", SH + "minCount", lit_typed("1", XSD_INTEGER)),
        ],
    )
    res = run_pipeline(spark, pages, shapes, out_dir=out_dir)
    metrics = {
        "n_pages": n_pages,
        "n_results": res.results.count(),
        "n_report_partitions": res.reports.count(),
        **res.metrics,
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
        fh.write(json.dumps(metrics) + "\n")
    print("METRICS " + json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
