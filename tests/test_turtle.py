"""Turtle-subset reader tests: feature coverage, error reporting, the
NT-is-valid-Turtle differential against from_ntriples, and the end-to-end
user path (load .ttl shapes + data -> skolemize -> validate)."""

from __future__ import annotations

import pytest

from cmem_plugin_pyshacl_spark.data_model import (
    KIND_IRI,
    KIND_LITERAL,
    RDF,
    XSD,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    from_ntriples,
    to_ntriples,
    triples_from_rows,
)
from cmem_plugin_pyshacl_spark.operators.graph_ops import skolemize
from cmem_plugin_pyshacl_spark.sources.turtle import (
    TurtleParseError,
    from_turtle,
    parse_turtle,
    read_turtle,
)

EX = "http://example.org/"
SH = "http://www.w3.org/ns/shacl#"

PREAMBLE = f"@prefix ex: <{EX}> .\n@prefix xsd: <{XSD}> .\n"


def _spo(rows):
    return {(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows}


# ------------------------------------------------------------------ parsing
def test_basic_abbreviations():
    rows = parse_turtle(
        PREAMBLE
        + 'ex:a a ex:T ; ex:p "x" , "y"@en , "5"^^xsd:integer ; ex:q ex:b .'
    )
    got = _spo(rows)
    assert (EX + "a", RDF + "type", KIND_IRI, EX + "T", None, None) in got
    assert (EX + "a", EX + "p", KIND_LITERAL, "x", XSD_STRING, None) in got
    assert (EX + "a", EX + "p", KIND_LITERAL, "y", None, "en") in got
    assert (EX + "a", EX + "p", KIND_LITERAL, "5", XSD_INTEGER, None) in got
    assert (EX + "a", EX + "q", KIND_IRI, EX + "b", None, None) in got
    assert len(rows) == 5


def test_numeric_and_boolean_literals():
    rows = parse_turtle(
        PREAMBLE + "ex:n ex:i 42 ; ex:i -7 ; ex:d 3.14 ; ex:e 1.5e3 ; ex:b true ; ex:b false ."
    )
    dts = {(r[3], r[4]) for r in rows}
    assert ("42", XSD_INTEGER) in dts
    assert ("-7", XSD_INTEGER) in dts
    assert ("3.14", XSD_DECIMAL) in dts
    assert ("1.5e3", XSD_DOUBLE) in dts
    assert ("true", XSD_BOOLEAN) in dts and ("false", XSD_BOOLEAN) in dts


def test_bnode_property_lists_and_collections():
    rows = parse_turtle(
        PREAMBLE
        + "ex:s ex:p [ ex:q [ ex:r 1 ] ] .\n"
        + "ex:l ex:vals ( ex:x 2 ) .\n"
        + "ex:e ex:vals () ."
    )
    got = _spo(rows)
    # nested bnodes chain: s -p-> b1 -q-> b2 -r-> 1
    outer = next(r for r in rows if r[1] == EX + "p")
    assert outer[2] == "bnode"
    inner = next(r for r in rows if r[0] == outer[3] and r[1] == EX + "q")
    assert inner[2] == "bnode"
    assert (inner[3], EX + "r", KIND_LITERAL, "1", XSD_INTEGER, None) in got
    # collection chain terminates in rdf:nil; empty collection IS rdf:nil
    assert (EX + "e", EX + "vals", KIND_IRI, RDF + "nil", None, None) in got
    head = next(r for r in rows if r[0] == EX + "l")
    first = {r[3] for r in rows if r[0] == head[3] and r[1] == RDF + "first"}
    assert first == {EX + "x"}


def test_string_escapes_and_long_strings():
    rows = parse_turtle(
        PREAMBLE
        + 'ex:s ex:p "tab\\there\\nnl \\u00e9 \\U0001F600 b\\\\s \\"q\\"" .\n'
        + 'ex:s ex:q """line1\nline2 "inner" end"""" .\n'
        + "ex:s ex:r 'single' ; ex:r2 '''long 'single' x''' ."
    )
    vals = {r[3] for r in rows}
    assert 'tab\there\nnl \u00e9 \U0001f600 b\\s "q"' in vals
    # the 4th closing quote belongs to the content
    assert 'line1\nline2 "inner" end"' in vals
    assert "single" in vals and "long 'single' x" in vals


def test_base_resolution_and_sparql_directives():
    rows = parse_turtle(
        "BASE <http://base.org/dir/>\n"
        "PREFIX ex: <http://example.org/>\n"
        "prefix : <http://d.org/>\n"
        "<item> ex:rel <sub/x> ; ex:frag <#f> ; ex:abs <http://abs.org/y> ; ex:self <> .\n"
        ":d ex:ok true ."
    )
    got = {(r[0], r[1], r[3]) for r in rows}
    assert ("http://base.org/dir/item", EX + "rel", "http://base.org/dir/sub/x") in got
    assert ("http://base.org/dir/item", EX + "frag", "http://base.org/dir/#f") in got
    assert ("http://base.org/dir/item", EX + "abs", "http://abs.org/y") in got
    assert ("http://base.org/dir/item", EX + "self", "http://base.org/dir/") in got
    assert ("http://d.org/d", EX + "ok", "true") in got


def test_prefixed_name_edge_cases():
    rows = parse_turtle(
        PREAMBLE
        + "@prefix pre: <http://p.org/> .\n"
        + "pre:a.b ex:p pre:x ; ex:q pre:esc\\,c .\n"
        + "ex:t ex:u pre:v. "  # trailing dot terminates the statement
    )
    got = {(r[0], r[3]) for r in rows}
    assert ("http://p.org/a.b", "http://p.org/x") in got
    assert ("http://p.org/a.b", "http://p.org/esc,c") in got
    assert ("http://example.org/t", "http://p.org/v") in got


def test_named_bnodes_are_stable_within_doc():
    rows = parse_turtle(PREAMBLE + "_:x ex:p _:y . _:y ex:q _:x .")
    by_pred = {r[1]: r for r in rows}
    assert by_pred[EX + "p"][3] == by_pred[EX + "q"][0]
    assert by_pred[EX + "q"][3] == by_pred[EX + "p"][0]


def test_comments_and_semicolon_runs():
    rows = parse_turtle(
        PREAMBLE + "# leading comment\nex:s ex:p 1 ; # mid comment\n ; ex:q 2 ; ."
    )
    assert len(rows) == 2


@pytest.mark.parametrize(
    "bad",
    [
        'ex:a ex:b "unterminated .',
        "@prefix x <http://a.org/> .",
        "<http://a.org/s> <http://a.org/p> undeclared:x .",
        "<http://a.org/s> <http://a.org/p> <http://a.org/o>",  # missing dot
        '<http://a.org/s> <http://a.org/p> "bad\nnewline" .',
        "<http://a.org/s> <http://a.org/p> [ .",
    ],
)
def test_malformed_documents_raise(bad):
    with pytest.raises(TurtleParseError):
        parse_turtle(bad)


def test_error_position_is_reported():
    with pytest.raises(TurtleParseError, match="line 2"):
        parse_turtle("<http://a/s> <http://a/p> <http://a/o> .\n<http://a/s> <bad iri> <http://a/o> .")


# ----------------------------------------------- NT differential (spark)
def test_every_ntriples_doc_is_valid_turtle(spark):
    """to_ntriples output must parse identically through parse_turtle and
    from_ntriples — N-Triples is a subset of Turtle."""
    nasty = [
        ("u:s1", "u:p", ("plain", KIND_LITERAL, XSD_STRING, None)),
        ("u:s1", "u:p", ("C:\\nightly \\n", KIND_LITERAL, XSD_STRING, None)),
        ("u:s2", "u:p", ('quo"te\nnl\ttab\rcr', KIND_LITERAL, XSD_STRING, None)),
        ("u:s2", "u:q", ("hola", KIND_LITERAL, None, "es")),
        ("u:s3", "u:q", ("5", KIND_LITERAL, XSD + "integer", None)),
        ("u:s3", "u:r", ("http://o.example/x", KIND_IRI, None, None)),
    ]
    df = triples_from_rows(spark, nasty)
    lines = [r.line for r in to_ntriples(df).collect()]
    via_nt = {
        tuple(r)[:6]
        for r in from_ntriples(spark.createDataFrame([(l,) for l in lines], "line string")).collect()
    }
    via_ttl = {r[:6] for r in parse_turtle("\n".join(lines))}
    assert via_ttl == via_nt
    assert len(via_ttl) == len(nasty)


# ------------------------------------------------------- end-to-end (spark)
SHAPES_TTL = """
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:PersonShape a sh:NodeShape ;
    sh:targetClass ex:Person ;
    sh:property [
        sh:path ex:name ;
        sh:minCount 1 ;
        sh:datatype xsd:string ;
    ] ;
    sh:property [
        sh:path ex:age ;
        sh:maxCount 1 ;
    ] .
"""

DATA_TTL = """
@prefix ex: <http://example.org/> .

ex:alice a ex:Person ; ex:name "Alice" ; ex:age 30 .
ex:bob a ex:Person ; ex:age 1 ; ex:age 2 .
ex:carol a ex:Person ; ex:name 5 .
"""


def test_validate_turtle_shapes_end_to_end(spark):
    """The reference-user path: bring your own .ttl shapes + data, validate.
    Reference accepts Turtle via rdflib (plugin_pyshacl.py:593-608); this is
    the engine's equivalent ingest."""
    from cmem_plugin_pyshacl_spark.plans.shacl import validate

    shapes = skolemize(from_turtle(spark, SHAPES_TTL, graph="shapes"), EX + "sk/")
    data = skolemize(from_turtle(spark, DATA_TTL, graph="data"), EX + "sk/")
    results = validate(spark, data, shapes).collect()
    by_focus = {}
    for r in results:
        by_focus.setdefault(r.focusNode, set()).add(r.sourceConstraintComponent)
    assert EX + "alice" not in by_focus
    assert by_focus[EX + "bob"] == {SH + "MinCountConstraintComponent", SH + "MaxCountConstraintComponent"}
    assert by_focus[EX + "carol"] == {SH + "DatatypeConstraintComponent"}


def test_read_turtle_file(spark, tmp_path):
    p = tmp_path / "g.ttl"
    p.write_text(PREAMBLE + 'ex:s ex:p "v" .', encoding="utf-8")
    df = read_turtle(spark, str(p), graph="g")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].s == EX + "s" and rows[0].graph == "g"
    assert df.schema == triples_from_rows(spark, []).schema


# ------------------------------------------------------------ writer tests
def test_to_turtle_round_trips_and_compacts(spark):
    from cmem_plugin_pyshacl_spark.sources.turtle import to_turtle, turtle_header

    rows = [
        (EX + "a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         (EX + "T", KIND_IRI, None, None)),
        (EX + "a", EX + "p", ("plain \"q\"\nnl", KIND_LITERAL, XSD_STRING, None)),
        (EX + "a", EX + "p", ("hola", KIND_LITERAL, None, "es")),
        (EX + "a", EX + "n", ("5", KIND_LITERAL, XSD + "integer", None)),
        (EX + "b", EX + "q", (EX + "a", KIND_IRI, None, None)),
        # IRI whose local part is NOT a safe pname (slash) stays <iri>
        (EX + "b", EX + "q", (EX + "x/y", KIND_IRI, None, None)),
    ]
    df = triples_from_rows(spark, rows, graph="g")
    pfx = {"ex": EX, "xsd": XSD}
    lines = [r.line for r in to_turtle(df, pfx).collect()]
    text = turtle_header(pfx) + "\n".join(lines)
    assert any("ex:a a ex:T" in l for l in lines)  # rdf:type -> a, compacted
    assert any('"5"^^xsd:integer' in l for l in lines)
    assert any("<http://example.org/x/y>" in l for l in lines)
    back = {r[:6] for r in parse_turtle(text)}
    orig = {tuple(r)[:6] for r in df.collect()}
    assert back == orig


def test_to_turtle_without_prefixes_is_valid(spark):
    from cmem_plugin_pyshacl_spark.sources.turtle import to_turtle

    df = triples_from_rows(
        spark, [(EX + "s", EX + "p", ("v", KIND_LITERAL, XSD_STRING, None))]
    )
    text = "\n".join(r.line for r in to_turtle(df).collect())
    assert parse_turtle(text) == [
        (EX + "s", EX + "p", KIND_LITERAL, "v", XSD_STRING, None, None, 0)
    ]


def test_write_turtle_partitioned_parts_are_standalone(spark, tmp_path):
    import glob

    from cmem_plugin_pyshacl_spark.sources.turtle import write_turtle

    rows = [
        (f"{EX}s{i}", EX + "p", (f"v{i}", KIND_LITERAL, XSD_STRING, None))
        for i in range(40)
    ]
    df = triples_from_rows(spark, rows).repartition(4)
    out = str(tmp_path / "part_ttl")
    write_turtle(df, out, {"ex": EX}, single_file=False, num_files=4)
    parts = sorted(glob.glob(out + "/part-*"))
    assert len(parts) > 1
    got = set()
    for p in parts:
        content = open(p).read()
        if not content.strip():
            continue
        # every non-empty part parses STANDALONE (has its own header)
        assert content.startswith("@prefix")
        got |= {r[:6] for r in parse_turtle(content)}
    assert got == {tuple(r)[:6] for r in df.collect()}


def test_write_turtle_single_file(spark, tmp_path):
    import glob

    from cmem_plugin_pyshacl_spark.sources.turtle import write_turtle

    df = triples_from_rows(
        spark,
        [(f"{EX}s{i}", EX + "p", (f"v{i}", KIND_LITERAL, XSD_STRING, None)) for i in range(5)],
    )
    out = str(tmp_path / "one_ttl")
    write_turtle(df, out, {"ex": EX}, single_file=True)
    parts = [p for p in glob.glob(out + "/part-*") if open(p).read().strip()]
    assert len(parts) == 1
    content = open(parts[0]).read()
    assert content.startswith("@prefix ex:")
    assert {r[:6] for r in parse_turtle(content)} == {
        tuple(r)[:6] for r in df.collect()
    }


def test_to_turtle_groups_objects_with_commas(spark):
    from cmem_plugin_pyshacl_spark.sources.turtle import to_turtle, turtle_header

    rows = [
        (EX + "a", EX + "p", ("v1", KIND_LITERAL, XSD_STRING, None)),
        (EX + "a", EX + "p", ("v2", KIND_LITERAL, XSD_STRING, None)),
        (EX + "a", EX + "p", ("v3", KIND_LITERAL, XSD_STRING, None)),
        (EX + "a", EX + "q", (EX + "b", KIND_IRI, None, None)),
    ]
    df = triples_from_rows(spark, rows)
    pfx = {"ex": EX}
    lines = [r.line for r in to_turtle(df, pfx).collect()]
    assert len(lines) == 1
    # same-predicate objects fold into ONE , object list; predicates ;
    assert 'ex:p "v1" , "v2" , "v3"' in lines[0]
    assert lines[0].count("ex:p") == 1
    assert " ;\n    ex:q ex:b ." in lines[0]
    back = {r[:6] for r in parse_turtle(turtle_header(pfx) + lines[0])}
    assert back == {tuple(r)[:6] for r in df.collect()}


# ----------------------------------------------------------- TriG (round 4)
def test_parse_trig_graph_blocks():
    """TriG: <g> { } / GRAPH <g> { } / bare { } blocks populate the graph
    column; plain Turtle statements stay in the default graph; inner
    trailing '.' before '}' is optional."""
    from cmem_plugin_pyshacl_spark.sources.turtle import parse_trig

    text = """
    @prefix ex: <http://example.org/> .
    ex:top ex:p "default" .
    ex:g1 { ex:a ex:p ex:b . ex:a ex:q "in-g1" }
    GRAPH <http://example.org/g2> {
        ex:c a ex:T ;
             ex:p "in-g2" .
    }
    { ex:d ex:p "default-block" }
    ex:g1 { ex:e ex:p "more-g1" . }
    """
    rows = parse_trig(text)
    by_graph: dict = {}
    for s, p, k, v, dt, lang, g, _pid in rows:
        by_graph.setdefault(g, set()).add((s, p, v))
    EXn = "http://example.org/"
    assert (EXn + "top", EXn + "p", "default") in by_graph[None]
    assert (EXn + "d", EXn + "p", "default-block") in by_graph[None]
    assert by_graph[EXn + "g1"] == {
        (EXn + "a", EXn + "p", EXn + "b"),
        (EXn + "a", EXn + "q", "in-g1"),
        (EXn + "e", EXn + "p", "more-g1"),  # repeated label unions
    }
    assert (EXn + "c", EXn + "p", "in-g2") in by_graph[EXn + "g2"]
    assert (
        EXn + "c",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        EXn + "T",
    ) in by_graph[EXn + "g2"]


def test_trig_default_graph_argument():
    """The `graph` argument names the default graph; explicit blocks win."""
    from cmem_plugin_pyshacl_spark.sources.turtle import parse_trig

    text = '<urn:s> <urn:p> "top" . <urn:g> { <urn:s> <urn:p> "in" . }'
    rows = parse_trig(text, graph="urn:default")
    gs = {(r[3], r[6]) for r in rows}
    assert gs == {("top", "urn:default"), ("in", "urn:g")}


def test_to_trig_round_trips_with_graphs(spark):
    from cmem_plugin_pyshacl_spark.sources.turtle import (
        parse_trig,
        to_trig,
        turtle_header,
    )

    pfx = {"ex": EX}
    rows_g = [
        (EX + "a", EX + "p", (EX + "b", KIND_IRI, None, None)),
        (EX + "a", EX + "q", ("v1", KIND_LITERAL, XSD_STRING, None)),
    ]
    rows_d = [(EX + "c", EX + "p", ("plain", KIND_LITERAL, XSD_STRING, None))]
    df = triples_from_rows(spark, rows_g, graph=EX + "g1").unionByName(
        triples_from_rows(spark, rows_d, graph=None)
    )
    lines = [r.line for r in to_trig(df, pfx).collect()]
    doc = turtle_header(pfx) + "\n".join(lines)
    back = {(r[0], r[1], r[3], r[6]) for r in parse_trig(doc)}
    assert back == {
        (EX + "a", EX + "p", EX + "b", EX + "g1"),
        (EX + "a", EX + "q", "v1", EX + "g1"),
        (EX + "c", EX + "p", "plain", None),
    }
    # null-graph rows render as bare Turtle statements (no block)
    bare = [ln for ln in lines if "{" not in ln]
    assert len(bare) == 1 and bare[0].startswith("ex:c ")


def test_write_trig_partitioned_parts_are_standalone(spark, tmp_path):
    import glob

    from cmem_plugin_pyshacl_spark.sources.turtle import parse_trig, write_trig

    rows = [
        (f"{EX}s{i}", EX + "p", (f"v{i}", KIND_LITERAL, XSD_STRING, None))
        for i in range(20)
    ]
    df = triples_from_rows(spark, rows, graph=EX + "g").repartition(3)
    out = str(tmp_path / "trig_parts")
    write_trig(df, out, {"ex": EX}, single_file=False, num_files=3)
    parts = [p for p in glob.glob(out + "/part-*") if open(p).read().strip()]
    assert len(parts) > 1
    got = set()
    for p in parts:
        content = open(p).read()
        assert content.startswith("@prefix ex:")  # standalone-valid part
        got |= {(r[0], r[3], r[6]) for r in parse_trig(content)}
    assert got == {(f"{EX}s{i}", f"v{i}", EX + "g") for i in range(20)}
