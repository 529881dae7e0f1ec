"""Splittable line-delimited TriG reader (sources/trig_bulk.py).

Reference counterpart: rdflib's trig parse in plugin_pyshacl.py:509-543 —
single-threaded/driver-bound; this is the distributed bulk path."""

import os

import pytest
from pyspark.sql import functions as F

from cmem_plugin_pyshacl_spark.data_model import XSD_STRING
from cmem_plugin_pyshacl_spark.sources.io import read_rdf
from cmem_plugin_pyshacl_spark.sources.trig_bulk import read_trig_bulk
from cmem_plugin_pyshacl_spark.sources.turtle import (
    TurtleParseError,
    write_trig,
)

EX = "http://example.org/"

DOC = """\
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

# default-graph statements
ex:a ex:p ex:b .
ex:a ex:q "hello" ; ex:r 5 .

# one whole graph block per line
ex:g1 { ex:s1 ex:p "in g1" . ex:s2 a ex:Thing . }
GRAPH ex:g2 { ex:s3 ex:p "in g2"@en . }
ex:g1 { ex:s4 ex:p "g1 again" . }
"""


def _write(tmp_path, text, name="bulk.trig"):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w", encoding="utf-8") as fh:
        fh.write(text)
    return p


def test_bulk_matches_driver_parse(spark, tmp_path):
    """The bulk reader and the driver-side TriG parse agree statement-for-
    statement on the shared subset."""
    p = _write(tmp_path, DOC)
    bulk = read_trig_bulk(spark, p)
    drv = read_rdf(spark, p, format="trig")
    cols = ["s", "p", "o_kind", "o_value", "o_datatype", "o_lang", "graph"]
    assert sorted(map(tuple, bulk.select(*cols).collect())) == sorted(
        map(tuple, drv.select(*cols).collect())
    )
    # named-graph fidelity + prefixed-name resolution
    g1 = bulk.filter(F.col("graph") == EX + "g1")
    assert g1.count() == 3
    assert (
        bulk.filter(F.col("o_lang") == "en").select("graph").first().graph
        == EX + "g2"
    )


def test_bulk_is_distributed_and_restamps_part_id(spark, tmp_path):
    # many lines -> force >1 split via a tiny maxPartitionBytes session
    # conf is global, so instead assert the part_id column reflects
    # spark_partition_id (0 on a single split) and the plan has no collect
    p = _write(tmp_path, DOC)
    df = read_trig_bulk(spark, p)
    assert {r.part_id for r in df.select("part_id").distinct().collect()} == {0}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan


def test_line_delimited_writer_roundtrip(spark, tmp_path):
    """write_trig(line_delimited=True) -> read_trig_bulk round-trips with
    both sides distributed (IRI-subject rows; bnodes relabel by contract)."""
    p = _write(tmp_path, DOC)
    triples = read_rdf(spark, p, format="trig")
    out = os.path.join(str(tmp_path), "out_trig")
    write_trig(
        triples,
        out,
        prefixes={"ex": EX},
        single_file=False,
        line_delimited=True,
    )
    back = read_trig_bulk(spark, out)
    cols = ["s", "p", "o_kind", "o_value", "o_datatype", "o_lang", "graph"]
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, triples.select(*cols).collect())
    )


def test_consistent_redeclaration_ok_conflict_raises(spark, tmp_path):
    # a directory of files each carrying the same prologue: fine
    ok = _write(
        tmp_path,
        "@prefix ex: <http://example.org/> .\n"
        "ex:a ex:p ex:b .\n"
        "@prefix ex: <http://example.org/> .\n"
        "ex:c ex:p ex:d .\n",
        "ok.trig",
    )
    assert read_trig_bulk(spark, ok).count() == 2
    bad = _write(
        tmp_path,
        "@prefix ex: <http://example.org/> .\n"
        "ex:a ex:p ex:b .\n"
        "@prefix ex: <http://OTHER.example/> .\n"
        "ex:c ex:p ex:d .\n",
        "bad.trig",
    )
    with pytest.raises(Exception, match="consistent prologue"):
        read_trig_bulk(spark, bad).count()


def test_multiline_statement_names_the_subset(spark, tmp_path):
    p = _write(
        tmp_path,
        "@prefix ex: <http://example.org/> .\n"
        "ex:g {\n"
        "  ex:a ex:p ex:b .\n"
        "}\n",
        "multiline.trig",
    )
    with pytest.raises(Exception, match="one statement per line"):
        read_trig_bulk(spark, p).count()


def test_bnode_labels_are_line_scoped(spark, tmp_path):
    p = _write(
        tmp_path,
        "@prefix ex: <http://example.org/> .\n"
        "_:x ex:p ex:a .\n"
        "_:x ex:p ex:b .\n",
        "bnodes.trig",
    )
    df = read_trig_bulk(spark, p)
    subs = {r.s for r in df.select("s").collect()}
    assert len(subs) == 2  # same label on two lines = two distinct bnodes
    assert all(s.startswith("_:") for s in subs)


def test_plain_literal_datatype_and_numbers(spark, tmp_path):
    p = _write(tmp_path, DOC)
    df = read_trig_bulk(spark, p)
    hello = df.filter(F.col("o_value") == "hello").first()
    assert hello.o_datatype == XSD_STRING
    five = df.filter(F.col("p") == EX + "r").first()
    assert five.o_value == "5"
    assert five.o_datatype.endswith("integer")


def test_size_guard_error_names_bulk_reader(spark, tmp_path):
    p = _write(tmp_path, DOC)
    with pytest.raises(ValueError, match="read_trig_bulk"):
        read_rdf(spark, p, format="trig", max_driver_bytes=1)


def test_prologue_found_when_larger_file_has_no_directives(spark, tmp_path):
    """Spark packs splits largest-file-first, so partition 0 is NOT the
    directory's first file — the old head-of-partition-0 prologue scan
    missed a prologue that lives in a smaller file (round-5 review). The
    distributed gather finds it regardless of split order."""
    _write(
        tmp_path,
        "@prefix ex: <http://example.org/> .\nex:a ex:p ex:b .\n",
        "a_first.trig",
    )
    # much larger, directive-free data file -> becomes partition 0
    big = "<http://example.org/s%d> <http://example.org/p> ex:o .\n"
    _write(
        tmp_path,
        "".join(big % i for i in range(2000)),
        "z_big.trig",
    )
    df = read_trig_bulk(spark, str(tmp_path))
    assert df.count() == 2001
    assert df.filter(F.col("s") == EX + "a").count() == 1


def test_explicit_prologue_skips_the_gather_scan(spark, tmp_path):
    p = _write(
        tmp_path,
        "ex:a ex:p ex:b .\n",  # no directives in the file at all
        "nodirectives.trig",
    )
    df = read_trig_bulk(
        spark, p, prologue="@prefix ex: <http://example.org/> ."
    )
    assert df.first().s == EX + "a"


def test_writer_refuses_cross_line_bnode_by_default(spark, tmp_path):
    """A bnode referenced from another subject's line would be severed by
    the default per-line relabeling — the writer refuses with remedies
    (round-5 review)."""
    src = _write(
        tmp_path,
        "@prefix ex: <http://example.org/> .\n"
        "_:shared ex:p ex:a .\n"
        "ex:x ex:ref _:shared .\n",
        "src.ttl",
    )
    triples = read_rdf(spark, src, format="turtle")
    out = os.path.join(str(tmp_path), "out_bn")
    with pytest.raises(ValueError, match="keep_bnode_labels"):
        write_trig(triples, out, single_file=False, line_delimited=True)


def test_cross_line_bnode_roundtrip_with_global_labels(spark, tmp_path):
    """bnode_labels_global + keep_bnode_labels round-trips cross-line
    bnode co-references exactly."""
    src = _write(
        tmp_path,
        "@prefix ex: <http://example.org/> .\n"
        "_:shared ex:p ex:a .\n"
        "ex:x ex:ref _:shared .\n"
        "ex:g1 { ex:y ex:ref _:shared . }\n",
        "src.trig",
    )
    triples = read_rdf(spark, src, format="trig")
    out = os.path.join(str(tmp_path), "out_bng")
    write_trig(
        triples,
        out,
        prefixes={"ex": EX},
        single_file=False,
        line_delimited=True,
        bnode_labels_global=True,
    )
    back = read_trig_bulk(spark, out, keep_bnode_labels=True)
    cols = ["s", "p", "o_kind", "o_value", "o_datatype", "o_lang", "graph"]
    assert sorted(map(tuple, back.select(*cols).collect())) == sorted(
        map(tuple, triples.select(*cols).collect())
    )
    # the co-reference survives: the bnode subject equals the bnode object
    subj = {r.s for r in back.filter(F.col("s").startswith("_:")).collect()}
    objs = {
        r.o_value for r in back.filter(F.col("o_kind") == "bnode").collect()
    }
    assert subj == objs and len(subj) == 1
