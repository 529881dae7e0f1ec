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
  * ``@prefix`` / ``@base`` directives form a contiguous prologue at the
    top of the (first) file; directive lines elsewhere are allowed only if
    they RE-declare the prologue bindings identically (a mid-corpus
    redefinition would change the meaning of lines after it depending on
    split boundaries, so it raises);
  * blank-node labels are line-scoped (a label cannot span lines; each
    line's bnodes are namespaced `_:p{partition}s{statement}b{n}` so lines
    never collide — content-address them with operators/graph_ops.skolemize
    before any identity-sensitive use, per the engine's bnode contract).

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
    that parsed in different splits)."""

    def __init__(
        self,
        text: str,
        graph: str | None,
        prefixes: dict[str, str],
        base: str | None,
        bnode_ns: str,
    ):
        super().__init__(text, graph)
        self.prefixes = dict(prefixes)
        self.base = base
        self._bnode_ns = bnode_ns

    def _fresh_bnode(self) -> str:
        self.bnode_n += 1
        return f"_:{self._bnode_ns}b{self.bnode_n}"


def _scan_prologue(head_lines: list[str]) -> str:
    """Collect the contiguous directive prologue from the first lines of
    the corpus (blank/comment lines may interleave)."""
    out: list[str] = []
    for raw in head_lines:
        t = (raw or "").strip()
        if not t or t.startswith("#"):
            continue
        if _DIRECTIVE_RE.match(t):
            out.append(t)
            continue
        break
    return "\n".join(out)


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


def from_trig_lines(
    lines: DataFrame,
    prologue: str = "",
    line_col: str = "value",
    graph: str | None = None,
) -> DataFrame:
    """Parse a DataFrame of line-delimited TriG statements (one complete
    statement per row of `line_col`) into the triples relation — the
    distributed core of :func:`read_trig_bulk`, usable directly when the
    lines come from something other than a text file (a serializer's
    output, a message stream). `prologue` carries the ``@prefix``/``@base``
    directives the lines were written against. part_id arrives as the
    parser's placeholder 0 (callers that care stamp their own)."""
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
                p = _LineParser(t, graph, prefixes, base, f"p{pid}s{seq}")
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
    prologue_max_lines: int = 1024,
) -> DataFrame:
    """Read line-delimited TriG (module docstring) into the triples
    relation, fully distributed. `graph` names the default graph for
    top-level statements and bare ``{ … }`` blocks, like `read_rdf`."""
    lines = spark.read.text(path)
    # take() touches only the leading split(s) — the prologue is at the
    # top of the first file by contract
    head = [r.value for r in lines.take(prologue_max_lines)]
    prologue = _scan_prologue(head)
    parsed = from_trig_lines(lines, prologue, line_col="value", graph=graph)
    # restamp the placeholder part_id with the real split id, matching the
    # NT reader's lineage convention
    from pyspark.sql import functions as F

    return parsed.withColumn("part_id", F.spark_partition_id())
