"""Deterministic RDF derivations over the driver's testdata tables.

The driver's oracle harness can only check queries whose inputs are the
pre-registered parquet views (region nation customer supplier part orders
lineitem events documents embeddings).  The SHACL/graph half of this engine
consumes *triples*, so we derive triples tables from those views with pure,
engine-portable expressions — the exact same derivation is expressible in
DuckDB SQL (see __spark_entry__.oracle_sql), which makes every graph
operator end-to-end checkable against an independent implementation.

Violations are injected *by construction* (arithmetic on keys), so the
expected validation results are analytically computable in the oracle:

  customer graph (derive_customer_graph):
    urn:cust:<k>  rdf:type       ex:Customer                  (all)
    urn:cust:<k>  rdfs:label     c_name                       (all)
    urn:cust:<k>  ex:segment     c_mktsegment                 (all)
    urn:cust:<k>  ex:nation      urn:nation:<nk>  (IRI)       (all)
    urn:cust:<k>  ex:email       c<k>@example.com             (k % 3 != 0)
    urn:cust:<k>  ex:email       alt-c<k>@example.com         (k%3!=0 and k%7==0)
    urn:cust:<k>  ex:age         k%80  ^^xsd:integer          (k % 11 != 0)
    urn:cust:<k>  ex:age         'n/a' ^^xsd:integer          (k % 11 == 0)
    urn:cust:<k>  ex:homepage    'not-a-url' literal          (k % 5 == 0)
    urn:cust:<k>  ex:homepage    https://example.com/c<k> IRI (k % 5 != 0)
    urn:nation:<n> rdf:type      ex:Nation                    (n < 20)
    urn:nation:<n> rdf:type      ex:MemberNation              (20 <= n < 22)
    ex:MemberNation rdfs:subClassOf ex:Nation
    ex:Nation       rdfs:subClassOf ex:GeoEntity

  expected violations under CUSTOMER_SHAPES:
    sh:minCount  (ex:email >= 1)      : k % 3 == 0
    sh:maxCount  (ex:email <= 1)      : k % 3 != 0 and k % 7 == 0
    sh:datatype  (ex:age integer)     : k % 11 == 0  (value 'n/a')
    sh:class     (ex:nation ex:Nation): c_nationkey >= 22 (untyped nations)
    sh:nodeKind  (ex:homepage sh:IRI) : k % 5 == 0
    sh:pattern   (segment ^[A-Z]{1,9}$): len(c_mktsegment) > 9 (AUTOMOBILE)

part_id lineage = c_custkey % 16 on customer triples, 0 on nation/schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .data_model import (
    EX,
    KIND_IRI,
    KIND_LITERAL,
    RDF_TYPE,
    RDFS_LABEL,
    RDFS_SUBCLASSOF,
    SH,
    SKOS_PREFLABEL,
    SKOSXL_LITERALFORM,
    SKOSXL_PREFLABEL,
    TRIPLES_SCHEMA,
    XSD_INTEGER,
    XSD_STRING,
    triples_from_rows,
)

GRAPH = "urn:graph:test"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _triple(s, p, o_kind, o_value, o_datatype, part_id):
    return [
        s.alias("s"),
        p.alias("p") if not isinstance(p, str) else F.lit(p).alias("p"),
        F.lit(o_kind).alias("o_kind"),
        o_value.alias("o_value"),
        (F.lit(o_datatype) if o_datatype else F.lit(None)).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(GRAPH).alias("graph"),
        part_id.cast("int").alias("part_id"),
    ]


def derive_customer_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data graph derived from customer ⋈ nation (see module docstring)."""
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cust = F.concat(F.lit("urn:cust:"), k.cast("string"))
    part = k % 16
    nation_iri = F.concat(F.lit("urn:nation:"), F.col("c_nationkey").cast("string"))

    parts = [
        c.select(*_triple(cust, RDF_TYPE, KIND_IRI, F.lit(EX + "Customer"), None, part)),
        c.select(*_triple(cust, RDFS_LABEL, KIND_LITERAL, F.col("c_name"), XSD_STRING, part)),
        c.select(*_triple(cust, EX + "segment", KIND_LITERAL, F.col("c_mktsegment"), XSD_STRING, part)),
        c.select(*_triple(cust, EX + "nation", KIND_IRI, nation_iri, None, part)),
        c.filter(k % 3 != 0).select(
            *_triple(
                cust, EX + "email", KIND_LITERAL,
                F.concat(F.lit("c"), k.cast("string"), F.lit("@example.com")), XSD_STRING, part,
            )
        ),
        c.filter((k % 3 != 0) & (k % 7 == 0)).select(
            *_triple(
                cust, EX + "email", KIND_LITERAL,
                F.concat(F.lit("alt-c"), k.cast("string"), F.lit("@example.com")), XSD_STRING, part,
            )
        ),
        c.select(
            *_triple(
                cust, EX + "age", KIND_LITERAL,
                F.when(k % 11 == 0, F.lit("n/a")).otherwise((k % 80).cast("string")),
                XSD_INTEGER, part,
            )
        ),
        c.filter(k % 5 == 0).select(
            *_triple(cust, EX + "homepage", KIND_LITERAL, F.lit("not-a-url"), XSD_STRING, part)
        ),
        c.filter(k % 5 != 0).select(
            *_triple(
                cust, EX + "homepage", KIND_IRI,
                F.concat(F.lit("https://example.com/c"), k.cast("string")), None, part,
            )
        ),
    ]
    n = load(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    n_iri = F.concat(F.lit("urn:nation:"), nk.cast("string"))
    parts += [
        n.filter(nk < 20).select(
            *_triple(n_iri, RDF_TYPE, KIND_IRI, F.lit(EX + "Nation"), None, F.lit(0))
        ),
        n.filter((nk >= 20) & (nk < 22)).select(
            *_triple(n_iri, RDF_TYPE, KIND_IRI, F.lit(EX + "MemberNation"), None, F.lit(0))
        ),
    ]
    schema_triples = triples_from_rows(
        spark,
        [
            (EX + "MemberNation", RDFS_SUBCLASSOF, (EX + "Nation", KIND_IRI, None, None)),
            (EX + "Nation", RDFS_SUBCLASSOF, (EX + "GeoEntity", KIND_IRI, None, None)),
        ],
        graph=GRAPH,
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.unionByName(schema_triples)


def shapes_graph(spark: SparkSession, constraints: dict[str, dict]) -> DataFrame:
    """Build a shapes triples graph from a compact spec:
    {prop_shape_suffix: {path, minCount, maxCount, datatype, class,
    nodeKind, pattern, flags}} all under one ex:CustomerShape targeting
    ex:Customer."""
    shape = EX + "CustomerShape"
    rows = [
        (shape, RDF_TYPE, (SH + "NodeShape", KIND_IRI, None, None)),
        (shape, SH + "targetClass", (EX + "Customer", KIND_IRI, None, None)),
    ]
    for suffix, spec in sorted(constraints.items()):
        pid = f"{shape}-{suffix}"
        rows.append((shape, SH + "property", (pid, KIND_IRI, None, None)))
        rows.append((pid, SH + "path", (spec["path"], KIND_IRI, None, None)))
        for key, pred in [
            ("minCount", "minCount"), ("maxCount", "maxCount"),
            ("datatype", "datatype"), ("class", "class"),
            ("nodeKind", "nodeKind"), ("pattern", "pattern"), ("flags", "flags"),
            ("minLength", "minLength"), ("maxLength", "maxLength"),
            ("hasValue", "hasValue"),
            ("minInclusive", "minInclusive"), ("maxInclusive", "maxInclusive"),
            ("minExclusive", "minExclusive"), ("maxExclusive", "maxExclusive"),
        ]:
            if key in spec:
                v = spec[key]
                kind = KIND_IRI if key in ("datatype", "class", "nodeKind") else KIND_LITERAL
                rows.append((pid, SH + pred, (str(v), kind, None, None)))
        if "in" in spec:
            # sh:in takes an RDF collection (rdf:first / rdf:rest / rdf:nil)
            RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
            items = list(spec["in"])
            rows.append((pid, SH + "in", (f"urn:list:{suffix}:0", KIND_IRI, None, None)))
            for i, item in enumerate(items):
                node = f"urn:list:{suffix}:{i}"
                nxt = (
                    f"urn:list:{suffix}:{i + 1}"
                    if i + 1 < len(items)
                    else RDF_NS + "nil"
                )
                rows.append((node, RDF_NS + "first", (str(item), KIND_LITERAL, None, None)))
                rows.append((node, RDF_NS + "rest", (nxt, KIND_IRI, None, None)))
    return triples_from_rows(spark, rows, graph="urn:graph:shapes")


CUSTOMER_SHAPES_ALL = {
    "email": {"path": EX + "email", "minCount": 1, "maxCount": 1},
    "age": {"path": EX + "age", "datatype": XSD_INTEGER},
    "nation": {"path": EX + "nation", "class": EX + "Nation"},
    "homepage": {"path": EX + "homepage", "nodeKind": SH + "IRI"},
    "segment": {"path": EX + "segment", "pattern": "^[A-Z]{1,9}$"},
}


def derive_label_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-precedence fixture from `part` (R2): every part has a
    skos:prefLabel; even keys also an rdfs:label (wins); keys %3==0 also a
    skosxl 2-hop path label (beats skos, loses to rdfs)."""
    p = load(spark, sf_dir, "part")
    k = F.col("p_partkey")
    subj = F.concat(F.lit("urn:part:"), k.cast("string"))
    xl = F.concat(F.lit("urn:xl:"), k.cast("string"))
    part = k % 16
    parts = [
        p.select(
            *_triple(subj, SKOS_PREFLABEL, KIND_LITERAL,
                     F.concat(F.lit("skos "), F.col("p_name")), XSD_STRING, part)
        ),
        p.filter(k % 2 == 0).select(
            *_triple(subj, RDFS_LABEL, KIND_LITERAL,
                     F.concat(F.lit("rdfs "), F.col("p_name")), XSD_STRING, part)
        ),
        p.filter(k % 3 == 0).select(
            *_triple(subj, SKOSXL_PREFLABEL, KIND_IRI, xl, None, part)
        ),
        p.filter(k % 3 == 0).select(
            *_triple(xl, SKOSXL_LITERALFORM, KIND_LITERAL,
                     F.concat(F.lit("xl "), F.col("p_name")), XSD_STRING, part)
        ),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out


def derive_bnode_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skolemization fixture from `supplier`: even keys get blank-node
    subjects (and a bnode-valued object triple), odd keys plain IRIs."""
    s = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    subj = F.when(
        k % 2 == 0, F.concat(F.lit("_:b"), k.cast("string"))
    ).otherwise(F.concat(F.lit("urn:supp:"), k.cast("string")))
    parts = [
        s.select(
            *_triple(subj, RDFS_LABEL, KIND_LITERAL, F.col("s_name"), XSD_STRING, k % 16)
        ),
        s.filter(k % 2 == 0).select(
            F.concat(F.lit("urn:supp-ref:"), k.cast("string")).alias("s"),
            F.lit(EX + "supplier").alias("p"),
            F.lit("bnode").alias("o_kind"),
            F.concat(F.lit("_:b"), k.cast("string")).alias("o_value"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(GRAPH).alias("graph"),
            (k % 16).cast("int").alias("part_id"),
        ),
    ]
    return parts[0].unionByName(parts[1])
