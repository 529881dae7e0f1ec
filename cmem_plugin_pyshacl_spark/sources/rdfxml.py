"""RDF/XML reader (driver-side, stdlib ElementTree).

Reference surface: the eccenca plugin moves graphs through rdflib, whose
default content negotiation includes application/rdf+xml
(plugin_pyshacl.py:539-543) — most published OWL ontologies and many
shapes graphs still ship as RDF/XML. Spark-first posture: RDF/XML is one
deeply-nested XML document (not line-splittable), so this is a
DRIVER-SIDE parse exactly like sources/turtle.py — the shapes/ontology
ingest path. Bulk data stays on the splittable N-Triples/N-Quads/NDJSON/
parquet paths.

Subset (the constructs real ontologies use; anything else raises with the
offending element):

  * rdf:RDF roots (or a single node element); rdf:Description and TYPED
    node elements (the element QName asserts rdf:type);
  * rdf:about / rdf:ID (resolved against xml:base) / rdf:nodeID subjects,
    fresh blank nodes for anonymous ones (the Turtle reader's `_:bN`
    convention);
  * property elements with rdf:resource / rdf:nodeID object refs, nested
    node elements, text literals with rdf:datatype or inherited xml:lang,
    property ATTRIBUTES (non-rdf: attributes on node elements assert
    plain-literal triples);
  * rdf:parseType="Resource" (anonymous bnode with nested property
    elements), rdf:parseType="Collection" (rdf:first/rdf:rest chain),
    rdf:parseType="Literal" (inner XML serialized, rdf:XMLLiteral);
  * rdf:li container membership (rdf:_1, rdf:_2, … per parent element);
  * reification attributes (rdf:ID on property elements), rdf:aboutEach,
    and rdf:bagID are OUTSIDE the subset and raise.

Blank nodes follow the engine contract: o_kind = "bnode", skolemize
before shuffle-sensitive use (operators/graph_ops.skolemize).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

from ..data_model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF,
    TRIPLES_SCHEMA,
)

_RDF_RDF = f"{{{RDF}}}RDF"
_RDF_DESCRIPTION = f"{{{RDF}}}Description"
_RDF_ABOUT = f"{{{RDF}}}about"
_RDF_ID = f"{{{RDF}}}ID"
_RDF_NODEID = f"{{{RDF}}}nodeID"
_RDF_RESOURCE = f"{{{RDF}}}resource"
_RDF_DATATYPE = f"{{{RDF}}}datatype"
_RDF_PARSETYPE = f"{{{RDF}}}parseType"
_RDF_LI = f"{{{RDF}}}li"
_XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"
_XMLLITERAL = RDF + "XMLLiteral"
_UNSUPPORTED_ATTRS = (f"{{{RDF}}}aboutEach", f"{{{RDF}}}bagID")


class RdfXmlParseError(ValueError):
    pass


def _qname_iri(tag: str) -> str:
    """ElementTree expands QNames to ``{ns}local`` — join them."""
    if not tag.startswith("{"):
        raise RdfXmlParseError(
            f"unnamespaced element/attribute {tag!r} (RDF/XML terms must "
            "be namespace-qualified)"
        )
    ns, local = tag[1:].split("}", 1)
    return ns + local


class _Parser:
    def __init__(self, graph: str | None):
        self.graph = graph
        self.rows: list[tuple] = []
        self.bnode_n = 0
        self.nodeids: dict[str, str] = {}
        # rdf:li membership numbering, per subject (the spec numbers per
        # parent element; one Description per subject — the common case —
        # makes these identical, and per-subject stays deterministic when
        # a subject is described twice)
        self.li_counters: dict[str, int] = {}

    def _fresh(self) -> str:
        self.bnode_n += 1
        return f"_:b{self.bnode_n}"

    def _named(self, label: str) -> str:
        return self.nodeids.setdefault(label, self._fresh())

    def _emit(self, s, p, kind, value, dt=None, lang=None):
        self.rows.append((s, p, kind, value, dt, lang, self.graph, 0))

    def _subject_kind(self, subj: str) -> str:
        return KIND_BNODE if subj.startswith("_:") else KIND_IRI

    # ------------------------------------------------------------- nodes
    def node(self, el: ET.Element, base: str | None, lang: str | None) -> str:
        """Parse one node element; returns its subject term."""
        for a in _UNSUPPORTED_ATTRS:
            if a in el.attrib:
                raise RdfXmlParseError(f"{a} is outside the subset")
        base = el.get(_XML_BASE, base)
        lang = el.get(_XML_LANG, lang)
        about = el.get(_RDF_ABOUT)
        rid = el.get(_RDF_ID)
        nodeid = el.get(_RDF_NODEID)
        if sum(x is not None for x in (about, rid, nodeid)) > 1:
            raise RdfXmlParseError(
                "node element with more than one of rdf:about/rdf:ID/"
                "rdf:nodeID"
            )
        if about is not None:
            subj = self._resolve(about, base)
        elif rid is not None:
            if base is None:
                raise RdfXmlParseError(
                    f"rdf:ID={rid!r} needs an in-scope xml:base"
                )
            subj = base.split("#")[0] + "#" + rid
        elif nodeid is not None:
            subj = self._named(nodeid)
        else:
            subj = self._fresh()

        tag_iri = _qname_iri(el.tag)
        if tag_iri != RDF + "Description":
            self._emit(subj, RDF + "type", KIND_IRI, tag_iri)
        # property attributes (non-rdf:, non-xml:) on node elements
        for attr, val in el.attrib.items():
            if attr in (_RDF_ABOUT, _RDF_ID, _RDF_NODEID, _XML_LANG, _XML_BASE):
                continue
            iri_a = _qname_iri(attr)
            if iri_a.startswith(RDF):
                raise RdfXmlParseError(
                    f"rdf: attribute {iri_a} on a node element is outside "
                    "the subset"
                )
            self._emit(subj, iri_a, KIND_LITERAL, val, None, lang)
        for child in el:
            self.prop(subj, child, base, lang)
        return subj

    def _resolve(self, ref: str, base: str | None) -> str:
        if ref == "":
            if base is None:
                raise RdfXmlParseError("empty rdf:about needs xml:base")
            return base
        if ":" in ref.split("/")[0].split("#")[0]:
            return ref  # absolute
        if base is None:
            raise RdfXmlParseError(
                f"relative reference {ref!r} needs an in-scope xml:base"
            )
        if ref.startswith("#"):
            return base.split("#")[0] + ref
        return base.rstrip("/") + "/" + ref

    # -------------------------------------------------------- properties
    def prop(self, subj: str, el: ET.Element, base, lang) -> None:
        base = el.get(_XML_BASE, base)
        lang = el.get(_XML_LANG, lang)
        if el.get(_RDF_ID) is not None:
            raise RdfXmlParseError(
                "rdf:ID reification on property elements is outside the "
                "subset"
            )
        if el.tag == _RDF_LI:
            n = self.li_counters.get(subj, 0) + 1
            self.li_counters[subj] = n
            pred = f"{RDF}_{n}"
        else:
            pred = _qname_iri(el.tag)

        parse_type = el.get(_RDF_PARSETYPE)
        resource = el.get(_RDF_RESOURCE)
        nodeid = el.get(_RDF_NODEID)
        datatype = el.get(_RDF_DATATYPE)
        children = list(el)
        text = (el.text or "").strip() if not children else ""

        if parse_type == "Resource":
            b = self._fresh()
            self._emit(subj, pred, KIND_BNODE, b)
            for child in children:
                self.prop(b, child, base, lang)
            return
        if parse_type == "Collection":
            cells = [self._fresh() for _ in children]
            head = cells[0] if cells else RDF + "nil"
            self._emit(
                subj, pred,
                KIND_BNODE if cells else KIND_IRI, head,
            )
            for i, (cell, child) in enumerate(zip(cells, children)):
                obj = self.node(child, base, lang)
                self._emit(cell, RDF + "first", self._subject_kind(obj), obj)
                rest = cells[i + 1] if i + 1 < len(cells) else RDF + "nil"
                self._emit(
                    cell, RDF + "rest",
                    KIND_BNODE if i + 1 < len(cells) else KIND_IRI, rest,
                )
            return
        if parse_type == "Literal":
            inner = (el.text or "") + "".join(
                ET.tostring(c, encoding="unicode") for c in children
            )
            self._emit(subj, pred, KIND_LITERAL, inner, _XMLLITERAL, None)
            return
        if parse_type is not None:
            raise RdfXmlParseError(f"rdf:parseType={parse_type!r} unknown")
        if resource is not None:
            self._emit(subj, pred, KIND_IRI, self._resolve(resource, base))
            return
        if nodeid is not None:
            self._emit(subj, pred, KIND_BNODE, self._named(nodeid))
            return
        if children:
            if len(children) != 1 or text:
                raise RdfXmlParseError(
                    f"property element <{pred}> must contain exactly one "
                    "nested node element"
                )
            obj = self.node(children[0], base, lang)
            self._emit(subj, pred, self._subject_kind(obj), obj)
            return
        # text literal (possibly empty)
        lex = el.text or ""
        if datatype is not None:
            self._emit(subj, pred, KIND_LITERAL, lex, datatype, None)
        elif lang is not None:
            self._emit(subj, pred, KIND_LITERAL, lex, None, lang)
        else:
            self._emit(subj, pred, KIND_LITERAL, lex, None, None)


def parse_rdfxml(text: str, graph: str | None = None) -> list[tuple]:
    """Parse an RDF/XML document into TRIPLES_SCHEMA rows (driver-side)."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise RdfXmlParseError(f"not well-formed XML: {e}") from e
    p = _Parser(graph)
    base = root.get(_XML_BASE)
    lang = root.get(_XML_LANG)
    if root.tag == _RDF_RDF:
        for child in root:
            p.node(child, base, lang)
    else:
        p.node(root, base, lang)
    return p.rows


def from_rdfxml(
    spark: SparkSession, text: str, graph: str | None = None
) -> DataFrame:
    """Parse RDF/XML text into a triples DataFrame (driver-side by design;
    see module docstring). Blank nodes arrive with o_kind='bnode' and MUST
    be skolemized before shuffle-sensitive use."""
    return spark.createDataFrame(parse_rdfxml(text, graph), schema=TRIPLES_SCHEMA)


def read_rdfxml(
    spark: SparkSession, path: str, graph: str | None = None
) -> DataFrame:
    """Read one .rdf/.owl file from the local filesystem (shapes-sized)."""
    with open(path, encoding="utf-8") as fh:
        return from_rdfxml(spark, fh.read(), graph)


# ------------------------------------------------------------- writer
#
# Distributed like the Turtle writer (sources/turtle.py::to_turtle): one
# <rdf:Description> block per subject via a single hash aggregation of
# pure Column expressions — no driver-side serialization, no UDFs — so a
# 100-TB graph's subjects never fold into one row. Reference parity:
# rdflib serializes RDF/XML too (plugin_pyshacl.py:539-543 moves graphs
# through rdflib in any of its formats).

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _xml_escape(col, attr: bool = False):
    """XML content/attribute escaping as Column expressions (& first)."""
    from pyspark.sql import functions as F

    out = F.regexp_replace(col, "&", "&amp;")
    out = F.regexp_replace(out, "<", "&lt;")
    out = F.regexp_replace(out, ">", "&gt;")
    if attr:
        out = F.regexp_replace(out, '"', "&quot;")
    return out


def to_rdfxml(df: DataFrame) -> DataFrame:
    """Serialize a triples DataFrame to RDF/XML ``<rdf:Description>``
    blocks — one `line` row per subject, children sorted for
    determinism. Property elements carry their namespace as a local
    default ``xmlns`` (split at the last ``/``, ``#`` or ``:``), so no
    document-level prefix table is needed and every block is
    self-contained; objects render as rdf:resource / rdf:nodeID
    attributes or text literals with rdf:datatype / xml:lang. A
    predicate IRI whose tail is not a valid NCName fails the job with a
    clear error (RDF/XML genuinely cannot express it — use N-Triples).
    Graph columns are ignored (RDF/XML has no named graphs), matching
    to_turtle. Round-trips through parse_rdfxml (tested); xsd:string
    literals come back with a NULL datatype — the same simple-literal ≡
    xsd:string identity the rest of the engine applies."""
    from pyspark.sql import functions as F

    local = F.regexp_extract(F.col("p"), r"([A-Za-z_][A-Za-z0-9_.\-]*)$", 1)
    ns = F.expr(
        "substring(p, 1, length(p) - length("
        "regexp_extract(p, '([A-Za-z_][A-Za-z0-9_.\\\\-]*)$', 1)))"
    )
    bad = (
        (local == "")
        | (ns == "")
        | F.col("p").startswith(RDF)  # rdf:type etc. keep the rdf: prefix
    )
    # rdf:-namespace predicates serialize with the documented rdf: prefix
    # (rdf:type most of all); anything else uses a local default xmlns
    rdf_local = F.substring(F.col("p"), len(RDF) + 1, 10_000)
    open_tag = F.when(
        F.col("p").startswith(RDF),
        F.concat(F.lit("rdf:"), rdf_local),
    ).otherwise(F.concat(local, F.lit(' xmlns="'), _xml_escape(ns, True), F.lit('"')))
    close_tag = F.when(
        F.col("p").startswith(RDF), F.concat(F.lit("rdf:"), rdf_local)
    ).otherwise(local)
    invalid_rdf_local = F.col("p").startswith(RDF) & ~rdf_local.rlike(
        r"^[A-Za-z_][A-Za-z0-9_.\-]*$"
    )
    open_tag = F.when(
        bad & ~F.col("p").startswith(RDF) | invalid_rdf_local,
        F.raise_error(
            F.concat(
                F.lit("predicate IRI not expressible as an RDF/XML QName: "),
                F.col("p"),
                F.lit(" — serialize this graph as N-Triples/N-Quads instead"),
            )
        ),
    ).otherwise(open_tag)

    obj_attr = F.when(
        F.col("o_kind") == KIND_IRI,
        F.concat(
            F.lit(' rdf:resource="'), _xml_escape(F.col("o_value"), True),
            F.lit('"/>'),
        ),
    ).when(
        F.col("o_kind") == KIND_BNODE,
        F.concat(
            F.lit(' rdf:nodeID="'),
            _xml_escape(F.regexp_replace(F.col("o_value"), "^_:", ""), True),
            F.lit('"/>'),
        ),
    )
    lit_attrs = F.concat(
        F.when(
            F.col("o_datatype").isNotNull()
            & (F.col("o_datatype") != _XSD_STRING),
            F.concat(
                F.lit(' rdf:datatype="'),
                _xml_escape(F.col("o_datatype"), True), F.lit('"'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("o_lang").isNotNull(),
            F.concat(F.lit(' xml:lang="'), F.col("o_lang"), F.lit('"')),
        ).otherwise(F.lit("")),
    )
    prop = F.when(
        F.col("o_kind").isin(KIND_IRI, KIND_BNODE),
        F.concat(F.lit("  <"), open_tag, obj_attr),
    ).otherwise(
        F.concat(
            F.lit("  <"), open_tag, lit_attrs, F.lit(">"),
            _xml_escape(F.col("o_value")),
            F.lit("</"), close_tag, F.lit(">"),
        )
    )
    subj_attr = F.when(
        F.col("s").startswith("_:"),
        F.concat(
            F.lit(' rdf:nodeID="'),
            _xml_escape(F.regexp_replace(F.col("s"), "^_:", ""), True),
            F.lit('"'),
        ),
    ).otherwise(
        F.concat(F.lit(' rdf:about="'), _xml_escape(F.col("s"), True), F.lit('"'))
    )
    return (
        df.withColumn("_prop", prop)
        .withColumn("_sattr", subj_attr)
        .groupBy("s", "_sattr")
        .agg(
            F.concat_ws("\n", F.sort_array(F.collect_list("_prop"))).alias(
                "_body"
            )
        )
        .select(
            F.concat(
                F.lit("<rdf:Description"), F.col("_sattr"), F.lit(">\n"),
                F.col("_body"), F.lit("\n</rdf:Description>"),
            ).alias("line")
        )
    )


RDFXML_HEADER = (
    '<?xml version="1.0" encoding="utf-8"?>\n'
    f'<rdf:RDF xmlns:rdf="{RDF}">'
)
RDFXML_FOOTER = "</rdf:RDF>"


def write_rdfxml(
    df: DataFrame,
    path: str,
    single_file: bool = True,
    num_files: int | None = None,
) -> None:
    """Write a triples DataFrame as RDF/XML text. single_file=True
    coalesces to one ordered document; single_file=False keeps the
    partitioning (or repartitions to num_files) and wraps EVERY part
    file in its own <rdf:RDF> envelope via mapInPandas, so each part is
    a standalone-valid document and a directory of parts is read back
    part-by-part — the distributed path, same shape as write_turtle."""
    import pandas as pd
    from pyspark.sql import functions as F

    body = to_rdfxml(df)
    if num_files and not single_file:
        body = body.repartition(num_files)
    if single_file:
        spark = df.sparkSession
        ends = spark.createDataFrame(
            [(0, RDFXML_HEADER), (2, RDFXML_FOOTER)], "k int, line string"
        )
        out = (
            ends.unionByName(body.select(F.lit(1).alias("k"), "line"))
            .coalesce(1)
            .sortWithinPartitions("k", "line")
            .select("line")
        )
        out.write.mode("overwrite").text(path)
        return

    def _wrap(batches):
        # ALWAYS emit the envelope — a subject-free partition (common
        # after filters) must still produce a valid empty <rdf:RDF/>
        # document, not a zero-byte part file that breaks a part-by-part
        # XML consumer (round-5 review)
        yield pd.DataFrame({"line": [RDFXML_HEADER]})
        for pdf in batches:
            yield pdf
        yield pd.DataFrame({"line": [RDFXML_FOOTER]})

    body.mapInPandas(_wrap, "line string").write.mode("overwrite").text(path)
