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
