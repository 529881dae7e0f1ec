"""RDF/XML subset reader — node/property forms, parseTypes, containers,
bnodes, xml:base/xml:lang scoping, and subset errors."""

from __future__ import annotations

import pytest

from cmem_plugin_pyshacl_spark.data_model import EX, RDF, RDF_TYPE
from cmem_plugin_pyshacl_spark.sources.rdfxml import (
    RdfXmlParseError,
    parse_rdfxml,
)

RDFNS = 'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
EXNS = f'xmlns:ex="{EX}"'


def _terms(rows):
    return {(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows}


def test_typed_node_attributes_and_literals():
    doc = f"""<rdf:RDF {RDFNS} {EXNS}>
      <ex:Person rdf:about="urn:alice" ex:nick="Ally">
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:age>
        <ex:name xml:lang="de">Alice</ex:name>
        <ex:knows rdf:resource="urn:bob"/>
      </ex:Person>
    </rdf:RDF>"""
    got = _terms(parse_rdfxml(doc))
    assert got == {
        ("urn:alice", RDF_TYPE, "iri", EX + "Person", None, None),
        ("urn:alice", EX + "nick", "literal", "Ally", None, None),
        ("urn:alice", EX + "age", "literal", "42",
         "http://www.w3.org/2001/XMLSchema#integer", None),
        ("urn:alice", EX + "name", "literal", "Alice", None, "de"),
        ("urn:alice", EX + "knows", "iri", "urn:bob", None, None),
    }


def test_nested_nodes_nodeid_and_parsetype_resource():
    doc = f"""<rdf:RDF {RDFNS} {EXNS}>
      <rdf:Description rdf:about="urn:a">
        <ex:addr rdf:parseType="Resource">
          <ex:city>Berlin</ex:city>
        </ex:addr>
        <ex:friend>
          <ex:Person rdf:nodeID="fb">
            <ex:name>Bob</ex:name>
          </ex:Person>
        </ex:friend>
        <ex:ref rdf:nodeID="fb"/>
      </rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(doc)
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r[1], []).append(r)
    addr_b = by_pred[EX + "addr"][0][3]
    assert addr_b.startswith("_:")
    assert (addr_b, EX + "city", "literal", "Berlin", None, None) in _terms(rows)
    friend_b = by_pred[EX + "friend"][0][3]
    assert by_pred[EX + "ref"][0][3] == friend_b  # rdf:nodeID co-refers
    assert (friend_b, EX + "name", "literal", "Bob", None, None) in _terms(rows)
    assert (friend_b, RDF_TYPE, "iri", EX + "Person", None, None) in _terms(rows)


def test_collection_li_base_and_xmlliteral():
    doc = f"""<rdf:RDF {RDFNS} {EXNS} xml:base="http://example.org/base">
      <rdf:Description rdf:ID="thing">
        <ex:opts rdf:parseType="Collection">
          <rdf:Description rdf:about="urn:x"/>
          <rdf:Description rdf:about="urn:y"/>
        </ex:opts>
        <ex:items>
          <rdf:Description rdf:nodeID="bag">
            <rdf:li>one</rdf:li>
            <rdf:li>two</rdf:li>
          </rdf:Description>
        </ex:items>
        <ex:html rdf:parseType="Literal"><b>bold</b></ex:html>
      </rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(doc)
    terms = _terms(rows)
    subj = "http://example.org/base#thing"
    head = next(r[3] for r in rows if r[1] == EX + "opts")
    cells = {r[0]: (r[1], r[3]) for r in rows if r[1] == RDF + "first"}
    assert (head, (RDF + "first", "urn:x")) in cells.items()
    rests = {r[0]: r[3] for r in rows if r[1] == RDF + "rest"}
    second = rests[head]
    assert cells[second] == (RDF + "first", "urn:y")
    assert rests[second] == RDF + "nil"
    bag = next(r[3] for r in rows if r[1] == EX + "items")
    assert (bag, RDF + "_1", "literal", "one", None, None) in terms
    assert (bag, RDF + "_2", "literal", "two", None, None) in terms
    assert (
        subj, EX + "html", "literal", "<b>bold</b>", RDF + "XMLLiteral", None
    ) in terms


def test_rdfxml_shapes_validate_end_to_end(spark):
    """An RDF/XML shapes document loads and drives validate()."""
    from cmem_plugin_pyshacl_spark.data_model import (
        XSD_INTEGER, iri, lit_typed, triples_from_rows,
    )
    from cmem_plugin_pyshacl_spark.plans.shacl import validate
    from cmem_plugin_pyshacl_spark.sources.rdfxml import from_rdfxml

    doc = f"""<rdf:RDF {RDFNS} {EXNS}
        xmlns:sh="http://www.w3.org/ns/shacl#">
      <sh:NodeShape rdf:about="{EX}S">
        <sh:targetClass rdf:resource="{EX}T"/>
        <sh:property>
          <rdf:Description>
            <sh:path rdf:resource="{EX}p"/>
            <sh:minCount
              rdf:datatype="http://www.w3.org/2001/XMLSchema#integer"
              >1</sh:minCount>
          </rdf:Description>
        </sh:property>
      </sh:NodeShape>
    </rdf:RDF>"""
    shapes = from_rdfxml(spark, doc)
    # nested anonymous property shape arrives as a bnode — skolemize per
    # the engine contract
    from cmem_plugin_pyshacl_spark.operators.graph_ops import skolemize

    shapes = skolemize(shapes, "urn:shapes")
    data = triples_from_rows(spark, [
        ("urn:ok", RDF_TYPE, iri(EX + "T")),
        ("urn:ok", EX + "p", lit_typed("1", XSD_INTEGER)),
        ("urn:bad", RDF_TYPE, iri(EX + "T")),
    ])
    res = validate(spark, data, shapes).collect()
    assert [r.focusNode for r in res] == ["urn:bad"]


def test_read_rdf_dispatches_rdfxml(spark, tmp_path):
    from cmem_plugin_pyshacl_spark.sources.io import read_rdf

    doc = f"""<rdf:RDF {RDFNS} {EXNS}>
      <rdf:Description rdf:about="urn:s"><ex:p>v</ex:p></rdf:Description>
    </rdf:RDF>"""
    p = tmp_path / "g.owl"
    p.write_text(doc)
    back = read_rdf(spark, str(p))
    assert [(r.s, r.p, r.o_value) for r in back.collect()] == [
        ("urn:s", EX + "p", "v")
    ]


def test_subset_errors():
    for doc, msg in (
        (f'<rdf:RDF {RDFNS}><rdf:Description rdf:about="urn:x">'
         f'<p xmlns="">v</p></rdf:Description></rdf:RDF>', "unnamespaced"),
        (f'<rdf:RDF {RDFNS} {EXNS}><rdf:Description rdf:about="rel">'
         f"</rdf:Description></rdf:RDF>", "xml:base"),
        (f'<rdf:RDF {RDFNS} {EXNS}><rdf:Description rdf:about="urn:x">'
         f'<ex:p rdf:parseType="Weird"/></rdf:Description></rdf:RDF>',
         "parseType"),
        (f'<rdf:RDF {RDFNS} {EXNS}><rdf:Description rdf:about="urn:x">'
         f'<ex:p rdf:ID="r1">v</ex:p></rdf:Description></rdf:RDF>',
         "reification"),
        ("<not-xml", "well-formed"),
    ):
        with pytest.raises(RdfXmlParseError, match=msg):
            parse_rdfxml(doc)


# --------------------- round 5: distributed writer (VERDICT r4 #8)


def _norm_terms(df):
    """Term set with the simple-literal ≡ xsd:string identity applied and
    bnode labels canonicalized (readers mint fresh `_:bN` labels; the
    fixture holds a single bnode, so one shared placeholder suffices)."""
    xsd_s = "http://www.w3.org/2001/XMLSchema#string"

    def bn(v):
        return "_:x" if isinstance(v, str) and v.startswith("_:") else v

    out = set()
    for r in df.select("s", "p", "o_kind", "o_value", "o_datatype",
                       "o_lang").collect():
        dt = r[4]
        if r[2] == "literal" and r[5] is None and dt is None:
            dt = xsd_s
        out.add((bn(r[0]), r[1], r[2], bn(r[3]), dt, r[5]))
    return out


@pytest.fixture(scope="module")
def wgraph(spark):
    from cmem_plugin_pyshacl_spark.data_model import (
        KIND_BNODE,
        iri,
        lit_typed,
        triples_from_rows,
    )

    return triples_from_rows(
        spark,
        [
            ("urn:alice", RDF_TYPE, iri(EX + "Person")),
            ("urn:alice", EX + "age",
             lit_typed("42", "http://www.w3.org/2001/XMLSchema#integer")),
            ("urn:alice", EX + "name", lit_typed("Alice", None, "de")),
            ("urn:alice", EX + "motto", lit_typed('x < "y" & z')),
            ("urn:alice", EX + "knows", iri("urn:bob")),
            ("urn:alice", EX + "addr", ("_:b7", KIND_BNODE, None, None)),
            ("_:b7", EX + "city", lit_typed("Berlin")),
        ],
    )


def test_rdfxml_writer_roundtrips_single_file(spark, wgraph, tmp_path):
    from cmem_plugin_pyshacl_spark.sources.rdfxml import write_rdfxml

    out = str(tmp_path / "g.rdf")
    write_rdfxml(wgraph, out, single_file=True)
    import glob

    [part] = glob.glob(out + "/part-*")
    text = open(part).read()
    assert text.startswith('<?xml version="1.0"')
    back = spark.createDataFrame(
        parse_rdfxml(text),
        "s string, p string, o_kind string, o_value string, "
        "o_datatype string, o_lang string, graph string, part_id int",
    )
    assert _norm_terms(back) == _norm_terms(wgraph)


def test_rdfxml_writer_distributed_parts_each_standalone(
    spark, wgraph, tmp_path
):
    from cmem_plugin_pyshacl_spark.sources.rdfxml import write_rdfxml

    out = str(tmp_path / "parts.rdf")
    write_rdfxml(wgraph, out, single_file=False, num_files=3)
    import glob

    rows = []
    parts = glob.glob(out + "/part-*")
    # AQE may coalesce an underfilled partition — multi-part is the point
    assert len(parts) >= 2
    for part in parts:
        text = open(part).read()
        # round-5 review: EVERY part — even one whose partition held no
        # subjects — is a standalone-valid XML document, never zero bytes
        assert text.splitlines()[0].startswith('<?xml version="1.0"')
        rows.extend(parse_rdfxml(text))
    back = spark.createDataFrame(
        rows,
        "s string, p string, o_kind string, o_value string, "
        "o_datatype string, o_lang string, graph string, part_id int",
    )
    assert _norm_terms(back) == _norm_terms(wgraph)


def test_rdfxml_writer_empty_partitions_still_valid_documents(
    spark, wgraph, tmp_path
):
    """A frame with fewer subjects than partitions must not leave
    zero-byte part files — each part carries its <rdf:RDF> envelope
    (round-5 review)."""
    import glob

    from cmem_plugin_pyshacl_spark.sources.rdfxml import (
        parse_rdfxml,
        write_rdfxml,
    )

    one = wgraph.limit(1)
    out = str(tmp_path / "sparse.rdf")
    write_rdfxml(one.repartition(4), out, single_file=False, num_files=4)
    parts = glob.glob(out + "/part-*")
    assert len(parts) >= 2
    total = 0
    for part in parts:
        text = open(part).read()
        assert text.splitlines()[0].startswith('<?xml version="1.0"')
        total += len(parse_rdfxml(text))
    assert total == 1


def test_rdfxml_writer_via_write_rdf_dispatch(spark, wgraph, tmp_path):
    from cmem_plugin_pyshacl_spark.sources.io import read_rdf, write_rdf

    out = str(tmp_path / "g2.owl")
    write_rdf(wgraph, out, format="rdfxml", single_file=True)
    import glob

    [part] = glob.glob(out + "/part-*")
    back = read_rdf(spark, part, format="rdfxml")
    assert _norm_terms(back) == _norm_terms(wgraph)


def test_rdfxml_writer_rejects_unqname_predicate(spark, tmp_path):
    from cmem_plugin_pyshacl_spark.data_model import iri, triples_from_rows
    from cmem_plugin_pyshacl_spark.sources.rdfxml import write_rdfxml

    bad = triples_from_rows(
        spark, [("urn:s", "http://example.org/p/", iri("urn:o"))]
    )
    with pytest.raises(Exception, match="QName|N-Triples"):
        write_rdfxml(bad, str(tmp_path / "bad.rdf"), single_file=True)
