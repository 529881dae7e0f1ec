"""C1 — HTML -> text extraction as an Arrow-batched pandas UDF.

The reference repo consumes RDF, not HTML, so it has no extractor
(SURVEY.md §2.3 footnote); the per-row invariant from BASELINE.json
("byte-identical extracted text per url") therefore binds this engine to
ITS OWN deterministic extractor, fixed once and frozen. The function below
is the frozen v1: a pure function of the html bytes, implemented with
vectorized pandas string ops (regex over a whole Arrow batch at a time —
no per-row Python beyond the regex engine itself).

Freeze contract (tests/test_extract.py pins golden sha256 hashes):
  1. drop <script>...</script>, <style>...</style>, <!-- comments -->
  2. replace <br> and block-element boundaries with '\n'
  3. strip all remaining tags
  4. decode the 5 standard XML entities (&amp; &lt; &gt; &quot; &#39;/&apos;)
  5. collapse runs of spaces/tabs to one space; collapse blank lines;
     strip each line; strip the whole text
Any change to these rules is a new extractor VERSION (bump EXTRACTOR_VERSION
and regenerate goldens) — never mutate v1 in place.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EXTRACTOR_VERSION = 1

_BLOCK_TAGS = (
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|tr|table|section|article|header|footer|"
    "blockquote|pre|title"
)
_RE_SCRIPT = re.compile(r"(?is)<script\b.*?</script\s*>")
_RE_STYLE = re.compile(r"(?is)<style\b.*?</style\s*>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
_RE_BR = re.compile(r"(?i)<br\s*/?\s*>")
_RE_BLOCK = re.compile(rf"(?is)</?(?:{_BLOCK_TAGS})\b[^>]*>")
_RE_TAG = re.compile(r"(?s)<[^>]*>")
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")
_RE_BLANKLINES = re.compile(r"\n\s*\n+")
_RE_LINE_EDGES = re.compile(r"(?m)^[ ]+|[ ]+$")

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def extract_text_bytes(html: bytes) -> str:
    """Single-value reference implementation (used by tests/oracles)."""
    s = html.decode("utf-8", errors="replace")
    s = _RE_SCRIPT.sub(" ", s)
    s = _RE_STYLE.sub(" ", s)
    s = _RE_COMMENT.sub(" ", s)
    s = _RE_BR.sub("\n", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _RE_SPACES.sub(" ", s)
    s = _RE_LINE_EDGES.sub("", s)
    s = _RE_BLANKLINES.sub("\n", s)
    return s.strip()


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized batch implementation — pandas .str ops over the whole
    Arrow batch. MUST stay behavior-identical to extract_text_bytes (the
    frozen invariant); test_extract.py cross-checks both paths."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    s = s.str.replace(_RE_SCRIPT, " ", regex=True)
    s = s.str.replace(_RE_STYLE, " ", regex=True)
    s = s.str.replace(_RE_COMMENT, " ", regex=True)
    s = s.str.replace(_RE_BR, "\n", regex=True)
    s = s.str.replace(_RE_BLOCK, "\n", regex=True)
    s = s.str.replace(_RE_TAG, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    s = s.str.replace(_RE_SPACES, " ", regex=True)
    s = s.str.replace(_RE_LINE_EDGES, "", regex=True)
    s = s.str.replace(_RE_BLANKLINES, "\n", regex=True)
    return s.str.strip()


@pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)
