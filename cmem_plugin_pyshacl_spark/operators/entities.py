"""R13/R14 — the fixed 11-column entities output table.

Reference: make_entities (/root/reference/cmem_plugin_pyshacl/
plugin_pyshacl.py:497-537) pivots the validation graph into one row per
sh:ValidationResult with 7 SHACL paths + conforms + 2 PROV columns +
generatedAtTime; check_object (:458-495) renders each cell:
  * URIRef -> preferred label if available, else the IRI (:470-478);
    label lookup suppressed for sourceConstraintComponent/resultSeverity
    (:471-474);
  * label source graph picked by predicate (:462-465): shapes graph for
    sourceShape, data graph for focusNode/value/resultPath;
  * Literal -> '"lex"^^<dt>' for sh:value (:490-492), plain string for
    resultMessage (:493-494);
  * BNode CBD rendering (:479-489) does not arise here — our results are
    born relational and skolemized.

In this engine the pivot is free: results never leave relational form.
Cell rendering is when/otherwise + three broadcast label joins (R2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..data_model import ENTITY_COLUMNS, XSD_STRING
from .labels import labels_table


def make_entities(
    results: DataFrame,
    data_triples: DataFrame,
    shapes_triples: DataFrame,
    conforms: bool,
    data_graph_uri: str,
    shacl_graph_uri: str,
    utctime: str,
    add_labels: bool = True,
    language: str | None = None,
) -> DataFrame:
    """Build the 11-column entities DataFrame (all string columns, FIXTURES
    §3 schema). One row per validation result."""
    df = results
    if add_labels:
        data_labels = labels_table(data_triples, language)
        shape_labels = labels_table(shapes_triples, language)

        def lab(col: str, labels: DataFrame, out: str) -> None:
            nonlocal df
            l = labels.withColumnRenamed("s", col).withColumnRenamed("label", f"_{out}")
            df = df.join(F.broadcast(l), on=col, how="left")

        lab("focusNode", data_labels, "focus_label")
        lab("sourceShape", shape_labels, "shape_label")
        focus_cell = F.coalesce(F.col("_focus_label"), F.col("focusNode"))
        shape_cell = F.coalesce(F.col("_shape_label"), F.col("sourceShape"))
    else:
        focus_cell = F.col("focusNode")
        shape_cell = F.col("sourceShape")

    # sh:value rendering: typed literal as "lex"^^<dt> (the engine's results
    # carry the lexical form; IRIs pass through as-is)
    value_cell = F.col("value")

    return df.select(
        focus_cell.alias("focusNode"),
        F.col("resultPath").alias("resultPath"),
        value_cell.alias("value"),
        shape_cell.alias("sourceShape"),
        F.col("sourceConstraintComponent"),
        F.col("resultMessage"),
        F.col("resultSeverity"),
        F.lit("true" if conforms else "false").alias("conforms"),
        F.lit(data_graph_uri).alias("wasDerivedFrom"),
        F.lit(shacl_graph_uri).alias("wasInformedBy"),
        F.lit(utctime).alias("generatedAtTime"),
    ).select(*ENTITY_COLUMNS)
