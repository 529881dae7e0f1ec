"""Splittable LINE-DELIMITED TriG reader — the bulk named-graph text path.

Turtle/TriG proper are stateful (prefix map, base, multi-line statements),
so `read_rdf` parses them on the DRIVER and refuses above a byte threshold
(sources/io.py). That leaves N-Quads as the only splittable named-graph
text format — verbose (no prefixes) and one quad per line. This module
closes the gap with a *line-delimited TriG subset*: prefixed names and
graph blocks, but splittable, so a 100-TB named-graph corpus exported in
it reads with one ordinary `spark.read.text` scan — each split parses
independently, no driver collect, no cross-split state.

Subset contract (each constraint exists to keep splits independent):
  * every physical line is a COMPLETE TriG statement — a directive, a
    default-graph triples statement, or an entire ``<g> { … }`` /
    ``GRAPH <g> { … }`` block (graph blocks may repeat; TriG unions them);
  * ``@prefix`` / ``@base`` directives are ONE CONSISTENT set for the
    whole corpus — they may appear anywhere (each file conventionally
    repeats the shared prologue at its top), but a conflicting
    redefinition raises, because line meaning would otherwise depend on
    split boundaries. ``read_trig_bulk`` gathers the directive set with
    one distributed scan (order-independent by that consistency rule), or
    accepts it explicitly via ``prologue=``;
  * blank-node labels are line-scoped BY DEFAULT (each line's bnodes are
    namespaced `_:p{partition}s{statement}b{n}` so independently-authored
    lines never collide — content-address them with
    operators/graph_ops.skolemize before any identity-sensitive use, per
    the engine's bnode contract). A corpus with globally-consistent
    authored labels — e.g. one written by ``write_trig(
    line_delimited=True)``, which serializes one frame's labels verbatim —
    reads with ``keep_bnode_labels=True`` to preserve cross-line bnode
    co-references (the writer REFUSES to emit a label that spans lines
    unless told its reader will do so; see write_trig).

``to_trig(..., line_delimited=True)`` / ``write_trig(...,
line_delimited=True)`` emit exactly this subset, so bulk TriG round-trips
writer->reader with BOTH sides fully distributed.

Scale posture: the scan is `spark.read.text` (splittable, predicate-
prunable by path), the parse is a mapInPandas batch over lines — the same
tier as the N-Triples regex path but in Python (the prefix/bnode state
machine doesn't reduce to codegen regexps). The per-batch parser is
seeded ONCE with the broadcast prologue's prefix map, so per-line work is
the statement body only. Reference counterpart: rdflib's trig parser in
the reference plugin (plugin_pyshacl.py:509-543 parses any rdflib format),
which is single-threaded and driver-bound — this is the distributed
re-expression for corpora that outgrow it.
"""

from __future__ import annotations

import re
from collections import ChainMap
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..data_model import TRIPLES_SCHEMA
from .turtle import TurtleParseError, _Parser

_DIRECTIVE_RE = re.compile(r"^(?:@prefix|@base|PREFIX|BASE)[ \t<]", re.I)

_COLUMNS = [f.name for f in TRIPLES_SCHEMA.fields]


class _LineParser(_Parser):
    """One-statement parser seeded with the shared prologue state and a
    per-line blank-node namespace (labels must not collide across lines
    that parsed in different splits).

    The prologue prefix map is shared across ALL lines of a batch via a
    copy-on-write ChainMap (a mid-line directive — a contract violation —
    writes into the private front map, never the shared one), so per-line
    setup is O(1), not a map copy per line."""

    def __init__(
        self,
        text: str,
        graph: str | None,
        prefixes: dict[str, str],
        base: str | None,
        bnode_ns: str,
        keep_labels: bool = False,
    ):
        super().__init__(text, graph)
        self.prefixes = ChainMap({}, prefixes)
        self.base = base
        self._bnode_ns = bnode_ns
        self._keep_labels = keep_labels

    def _fresh_bnode(self) -> str:
        self.bnode_n += 1
        return f"_:{self._bnode_ns}b{self.bnode_n}"

    def _named_bnode(self, label: str) -> str:
        # keep_labels: the corpus guarantees globally-consistent authored
        # labels (e.g. it was written by write_trig(line_delimited=True),
        # whose single source frame makes them so), so cross-line bnode
        # co-references survive; anonymous []-nodes still get the
        # collision-free per-line namespace via _fresh_bnode.
        if self._keep_labels:
            return label
        return super()._named_bnode(label)


def _check_redeclaration(
    line: str, prefixes: dict[str, str], base: str | None
) -> None:
    """A directive line after the prologue must re-declare an existing
    binding identically (files in a directory each repeat the shared
    prologue; that is fine). Anything else would make line meaning depend
    on split boundaries — refuse loudly."""
    q = _Parser(line, None)
    q.base = base  # relative re-declarations resolve like the prologue's
    q.parse()
    for k, v in q.prefixes.items():
        if prefixes.get(k) != v:
            raise ValueError(
                f"read_trig_bulk: mid-corpus prefix redefinition "
                f"'{k}: <{v}>' conflicts with the prologue binding "
                f"{prefixes.get(k)!r} — the line-delimited subset requires "
                f"one consistent prologue (split boundaries would otherwise "
                f"change statement meaning)"
            )
    if q.base is not None and q.base != base:
        raise ValueError(
            f"read_trig_bulk: mid-corpus @base <{q.base}> conflicts with "
            f"the prologue base {base!r} — the line-delimited subset "
            f"requires one consistent prologue"
        )


def gather_prologue(lines: DataFrame, line_col: str = "value") -> str:
    """Collect the corpus's directive lines DISTRIBUTED and merge them
    into one prologue, order-independently: a pushed-down prefix filter +
    distinct + collect of the (tiny) directive set. Unlike a head-of-
    partition-0 ``take()``, this is correct for multi-file directories
    regardless of Spark's split ordering (splits are packed largest-file-
    first, so partition 0 is NOT necessarily the first file). Conflicting
    declarations raise — consistency is what makes order irrelevant.
    Cost: one extra scan of the text; callers that already know the
    prologue pass it to :func:`read_trig_bulk`/:func:`from_trig_lines`
    explicitly and skip the scan."""
    from pyspark.sql import functions as F

    c = F.trim(F.col(line_col))
    directive = (
        c.startswith("@prefix") | c.startswith("@base")
        | c.startswith("PREFIX") | c.startswith("BASE")
        | c.startswith("prefix") | c.startswith("base")
    )
    rows = [r[0] for r in lines.filter(directive).select(c).distinct().collect()]
    rows = [t for t in rows if _DIRECTIVE_RE.match(t)]
    # bases first (they resolve the prefix IRIs); >1 distinct base is a
    # conflict by construction
    bases = [t for t in rows if re.match(r"^(?:@base|BASE)\b", t, re.I)]
    prefixes: dict[str, str] = {}
    base: str | None = None
    for t in bases + [t for t in rows if t not in bases]:
        q = _Parser(t, None)
        q.base = base
        q.parse()
        for k, v in q.prefixes.items():
            if k in prefixes and prefixes[k] != v:
                raise ValueError(
                    f"read_trig_bulk: conflicting @prefix declarations for "
                    f"'{k}:' ({prefixes[k]!r} vs {v!r}) — the line-delimited "
                    f"subset requires one consistent prologue"
                )
            prefixes[k] = v
        if q.base is not None:
            if base is not None and q.base != base:
                raise ValueError(
                    f"read_trig_bulk: conflicting @base declarations "
                    f"({base!r} vs {q.base!r}) — the line-delimited subset "
                    f"requires one consistent prologue"
                )
            base = q.base
    out = []
    if base is not None:
        out.append(f"@base <{base}> .")
    out.extend(f"@prefix {k}: <{v}> ." for k, v in sorted(prefixes.items()))
    return "\n".join(out)


def from_trig_lines(
    lines: DataFrame,
    prologue: str = "",
    line_col: str = "value",
    graph: str | None = None,
    keep_bnode_labels: bool = False,
) -> DataFrame:
    """Parse a DataFrame of line-delimited TriG statements (one complete
    statement per row of `line_col`) into the triples relation — the
    distributed core of :func:`read_trig_bulk`, usable directly when the
    lines come from something other than a text file (a serializer's
    output, a message stream). `prologue` carries the ``@prefix``/``@base``
    directives the lines were written against. part_id arrives as the
    parser's placeholder 0 (callers that care stamp their own).

    ``keep_bnode_labels=True`` preserves authored ``_:label``s verbatim —
    REQUIRED to round-trip cross-line bnode co-references, and safe only
    when the corpus's labels are globally consistent (one writer, e.g.
    ``write_trig(line_delimited=True)``); the default renames labels into
    a per-line namespace so independently-authored files can never
    collide."""
    proto = _Parser(prologue, None)
    proto.parse()  # directives only; raises on a malformed prologue
    prefixes, base = proto.prefixes, proto.base

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        seq = 0
        for pdf in batches:
            rows: list[tuple] = []
            for raw in pdf[line_col]:
                t = (raw or "").strip()
                if not t or t.startswith("#"):
                    continue
                if _DIRECTIVE_RE.match(t):
                    _check_redeclaration(t, prefixes, base)
                    continue
                seq += 1
                p = _LineParser(
                    t, graph, prefixes, base, f"p{pid}s{seq}",
                    keep_labels=keep_bnode_labels,
                )
                try:
                    rows.extend(p.parse())
                except TurtleParseError as e:
                    raise TurtleParseError(
                        f"read_trig_bulk: not a complete single-line "
                        f"statement ({e.args[0] if e.args else e}) — the "
                        f"bulk subset is one statement per line; for "
                        f"free-form multi-line TriG use read_rdf's "
                        f"driver-side path",
                        0,
                        t,
                    ) from e
            yield pd.DataFrame(rows, columns=_COLUMNS)

    return lines.select(line_col).mapInPandas(
        parse_batches, schema=TRIPLES_SCHEMA
    )


def read_trig_bulk(
    spark: SparkSession,
    path: str,
    graph: str | None = None,
    prologue: str | None = None,
    keep_bnode_labels: bool = False,
) -> DataFrame:
    """Read line-delimited TriG (module docstring) into the triples
    relation, fully distributed. `graph` names the default graph for
    top-level statements and bare ``{ … }`` blocks, like `read_rdf`.

    When `prologue` is None the corpus's directives are gathered with one
    distributed scan (:func:`gather_prologue` — correct for multi-file
    directories in any split order); pass the prologue explicitly to skip
    that scan on a corpus you control. `keep_bnode_labels` as in
    :func:`from_trig_lines`."""
    lines = spark.read.text(path)
    if prologue is None:
        prologue = gather_prologue(lines)
    parsed = from_trig_lines(
        lines, prologue, line_col="value", graph=graph,
        keep_bnode_labels=keep_bnode_labels,
    )
    # restamp the placeholder part_id with the real split id, matching the
    # NT reader's lineage convention
    from pyspark.sql import functions as F

    return parsed.withColumn("part_id", F.spark_partition_id())
