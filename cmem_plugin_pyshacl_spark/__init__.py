"""cmem_plugin_pyshacl_spark — a from-scratch, PySpark-native KG-construction
and SHACL-validation engine.

Capability parity target: eccenca/cmem-plugin-pyshacl (the reference wraps
pySHACL 0.30.1 over rdflib; see /root/reference/cmem_plugin_pyshacl/
plugin_pyshacl.py). This engine re-expresses every operator the reference
computes as declarative Spark DataFrame plans over a canonical ``triples``
table, extended into a full build-then-validate pipeline:

  pages (url, warc_ts, html, text, lang)
    -> extract (pandas UDF, byte-deterministic per url)
    -> mention detection (pandas UDF -> explode)
    -> entity-link scoring (broadcast alias dict)
    -> MinHash-LSH blocking (vectorized hash exprs)
    -> connected-components canonicalization (large-star/small-star fixpoint)
    -> triples materialization (partitioned parquet, per-partition lineage)
    -> SHACL core validation (broadcast constraint tables, vectorized predicates)
    -> per-partition sh:ValidationReport + 11-column entities table

All hot-path logic is JVM-side Column expressions; Python appears only in
Arrow-batched pandas UDFs (extraction, mention detection) per the input
contract (no per-row Python UDFs).
"""

__version__ = "0.1.0"
