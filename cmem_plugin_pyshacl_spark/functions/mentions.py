"""C2 — batched mention detection as a pandas UDF returning
array<struct<surface,start,end,mtype>>, exploded downstream.

Pattern-driven extraction over the deterministic fixture grammar
(FIXTURES.md §1: "{PERSON} works at {ORG}." / "{ORG} is based in {PLACE}.").
The regexes are anchored on the relation phrases, so this detector is a
pure function of `text` — reruns are byte-stable and the golden triple set
is exactly computable.

Scale: Series->Series pandas UDF, Arrow-batched; regex runs per batch via
python's `re` on each string — acceptable because this IS the designated
Python slow path (same tier as real NER model inference would be), and it
parallelizes perfectly across partitions with zero shuffle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

MENTION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("surface", T.StringType()),
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("mtype", T.StringType()),
        ]
    )
)

RELATION_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("subj_surface", T.StringType()),
            T.StructField("subj_type", T.StringType()),
            T.StructField("pred", T.StringType()),
            T.StructField("obj_surface", T.StringType()),
            T.StructField("obj_type", T.StringType()),
        ]
    )
)

# entity-ish token: word chars, optionally followed by a corporate suffix
_ENT = r"[A-Za-z][\w]*(?:\s+(?:Inc|Corp|Ltd|GmbH|LLC)\.?)?"
_RE_WORKS_AT = re.compile(rf"\b({_ENT})\s+works\s+at\s+({_ENT})\s*\.")
_RE_BASED_IN = re.compile(rf"\b({_ENT})\s+is\s+based\s+in\s+({_ENT})\s*\.")

WORKS_AT = "http://example.org/worksAt"
BASED_IN = "http://example.org/basedIn"


def detect_mentions(text: str) -> list[tuple[str, int, int, str]]:
    out = []
    for m in _RE_WORKS_AT.finditer(text or ""):
        out.append((m.group(1), m.start(1), m.end(1), "PERSON"))
        out.append((m.group(2), m.start(2), m.end(2), "ORG"))
    for m in _RE_BASED_IN.finditer(text or ""):
        out.append((m.group(1), m.start(1), m.end(1), "ORG"))
        out.append((m.group(2), m.start(2), m.end(2), "PLACE"))
    return out


def detect_relations(text: str) -> list[tuple[str, str, str, str, str]]:
    out = []
    for m in _RE_WORKS_AT.finditer(text or ""):
        out.append((m.group(1), "PERSON", WORKS_AT, m.group(2), "ORG"))
    for m in _RE_BASED_IN.finditer(text or ""):
        out.append((m.group(1), "ORG", BASED_IN, m.group(2), "PLACE"))
    return out


@pandas_udf(MENTION_SCHEMA)
def mentions_udf(text: pd.Series) -> pd.Series:
    return text.map(detect_mentions)


@pandas_udf(RELATION_SCHEMA)
def relations_udf(text: pd.Series) -> pd.Series:
    return text.map(detect_relations)
