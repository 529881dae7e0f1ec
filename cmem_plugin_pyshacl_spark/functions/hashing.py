"""Deterministic, engine-portable hashing expressions.

Everything here is a pure function of its string input with NO engine-private
hash (no xxhash64/murmur salt drift): we derive 60-bit integers from md5 hex,
which DuckDB computes identically (`('0x'||substr(md5(x),1,15))::BIGINT`).
That makes MinHash/LSH/SimHash results oracle-checkable row-for-row, and —
more importantly at scale — re-runs and checkpoint resumes are byte-stable
(SURVEY.md §7 hard part (b): no rand(), no sequential ids).

Used for: skolemization (reference rewrites BNodes to URIs at
plugin_pyshacl.py:647-649 — we use content hashes instead of sequential
ids so the rewrite is partition-stable), MinHash-LSH blocking,
SimHash fingerprints, exact-dedup keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^61 - 1, a Mersenne prime: modulus for the universal-hash family used by
# the MinHash permutations. Products a_i * h stay within int128? No — Spark
# longs are 64-bit, so we keep h < 2^30 and a_i < 2^30 to avoid overflow in
# a*h+b. DuckDB BIGINT matches.
MERSENNE_31 = (1 << 31) - 1  # 2147483647

# fixed permutation parameters, seeded deterministically (seed=42 convention)
def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_31), rng.randrange(0, MERSENNE_31))
        for _ in range(num_perm)
    ]


def md5_int60(col: Column) -> Column:
    """Deterministic 60-bit non-negative integer hash of a string column.

    Spark:  conv(substr(md5(x),1,15),16,10)::bigint
    DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int60_sql(expr: str) -> str:
    """DuckDB-side equivalent of md5_int60 for oracle SQL strings."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def base_hash31(col: Column) -> Column:
    """md5-derived hash reduced mod 2^31-1 (input to the minhash family)."""
    return md5_int60(col) % F.lit(MERSENNE_31)


def base_hash31_sql(expr: str) -> str:
    return f"({md5_int60_sql(expr)} % {MERSENNE_31})"


def minhash_exprs(shingles: Column, num_perm: int, seed: int = 42) -> list[Column]:
    """MinHash signature as `num_perm` Column expressions over an
    array<string> shingle column.

    Each permutation i computes min over shingles of (a_i*h(x)+b_i) mod p,
    entirely with JVM-side array higher-order functions (transform +
    array_min) — no UDF, stays in whole-stage codegen.
    """
    h = F.transform(shingles, lambda x: base_hash31(x))
    out = []
    for a, b in _perm_params(num_perm, seed):
        out.append(
            F.array_min(
                F.transform(
                    h, lambda v: (v * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_31)
                )
            )
        )
    return out


def minhash_sql(shingles_expr: str, num_perm: int, seed: int = 42) -> list[str]:
    """DuckDB equivalents of minhash_exprs (list_transform + list_min)."""
    h = f"list_transform({shingles_expr}, x -> {base_hash31_sql('x')})"
    out = []
    for a, b in _perm_params(num_perm, seed):
        out.append(
            f"list_min(list_transform({h}, v -> (v * {a} + {b}) % {MERSENNE_31}))"
        )
    return out


def char_shingles_expr(colname: str, k: int = 5) -> str:
    """Spark-SQL string form of the char k-gram shingle set."""
    return (
        f"array_distinct(transform(sequence(1, greatest(length({colname}) - {k - 1}, 1)),"
        f" i -> substr({colname}, i, {k})))"
    )


def char_shingles(colname: str, k: int = 5) -> Column:
    """Character k-gram shingles via native expr (substr over a sequence)."""
    return F.expr(char_shingles_expr(colname, k))


def minhash_sig_expr(colname: str, num_perm: int, k: int = 5, seed: int = 42) -> str:
    """Spark-SQL string computing the FULL minhash signature as ONE
    array<bigint> expression.

    Why one expression: a naive per-permutation column set (mh_0..mh_15
    each re-deriving transform(shingles, md5…)) gets the md5 hashing pass
    INLINED once per permutation by Catalyst's CollapseProject — 16x the
    md5 work. Here the shingle-hash pass is the first argument of a single
    aggregate(), so every shingle is md5-hashed exactly once and the 16
    permutations are pure arithmetic inside the fold."""
    params = _perm_params(num_perm, seed)
    a_arr = "array(" + ", ".join(f"{a}L" for a, _ in params) + ")"
    b_arr = "array(" + ", ".join(f"{b}L" for _, b in params) + ")"
    h = (
        f"transform({char_shingles_expr(colname, k)}, "
        f"x -> cast(conv(substring(md5(x), 1, 15), 16, 10) as bigint) % {MERSENNE_31})"
    )
    return (
        f"aggregate({h}, "
        f"transform(sequence(0, {num_perm - 1}), i -> cast({MERSENNE_31} as bigint)), "
        f"(acc, h) -> zip_with(acc, sequence(0, {num_perm - 1}), "
        f"(m, i) -> least(m, (h * element_at({a_arr}, i + 1) "
        f"+ element_at({b_arr}, i + 1)) % {MERSENNE_31})))"
    )


def char_shingles_sql(expr: str, k: int = 5) -> str:
    """DuckDB equivalent of char_shingles."""
    return (
        f"list_distinct(list_transform(range(1, greatest(length({expr}) - {k - 1}, 1) + 1),"
        f" i -> substr({expr}, i::INT, {k})))"
    )


def word_shingles(colname: str, n: int = 3) -> Column:
    """Word n-gram shingles (whitespace tokenized), JVM-side."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(split(trim({colname}), '\\\\s+')) - {n - 1}, 1)),"
        f" i -> array_join(slice(split(trim({colname}), '\\\\s+'), i, {n}), ' ')))"
    )


def simhash64(tokens_expr: str) -> Column:
    """60-bit SimHash over an array<string> token expression, pure SQL
    expressions (whole-stage-codegen friendly; no UDF).

    For each of 60 bit positions (we use the 60-bit md5 hash), sum +1/-1
    over tokens by bit value, sign -> bit. Built as a SQL expr string
    because the per-position shift amount is itself a lambda variable —
    SQL `shiftleft` accepts column operands where the Python wrapper only
    takes int literals.

    `tokens_expr` is a SQL expression evaluating to array<string>,
    e.g. "split(trim(text), '\\\\s+')".
    """
    h = (
        f"transform({tokens_expr}, "
        "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    )
    counts = (
        f"aggregate({h}, transform(sequence(0, 59), j -> 0L), "
        "(acc, h) -> zip_with(acc, sequence(0, 59), "
        "(a, j) -> a + IF((h & shiftleft(1L, j)) != 0, 1L, -1L)))"
    )
    return F.expr(
        f"aggregate(zip_with({counts}, sequence(0, 59), "
        "(c, j) -> IF(c > 0, shiftleft(1L, j), 0L)), 0L, (acc, v) -> acc | v)"
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints: popcount(a XOR b).

    bit_count is native in Spark 3.5+/4.x.
    """
    return F.bit_count(a.bitwiseXOR(b))


def skolem_iri(base: str, *cols: Column) -> Column:
    """Deterministic skolem IRI from content columns (reference R8,
    plugin_pyshacl.py:647-649 uses rdflib skolemization with
    basepath=validation_graph_uri; ours is content-addressed so it is
    stable across partitions, re-runs, and resumes)."""
    return F.concat(
        F.lit(base.rstrip("/") + "/.well-known/genid/"),
        F.sha2(F.concat_ws("|", *cols), 256),
    )


def salted_key(key: Column, buckets: int) -> Column:
    """Deterministic salt for skew mitigation (SURVEY.md C7): derived from
    the key itself via md5 — NOT rand() — so retries/resumes see identical
    partitioning. Two-stage aggregation: group by (key, salt) partial, then
    by key final."""
    return F.concat_ws("#", key, (md5_int60(key) % F.lit(buckets)).cast("string"))
