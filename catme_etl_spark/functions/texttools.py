"""Text tokenization / shingling / hashing column expressions.

Everything here is built-in Spark SQL expressions (JVM, codegen'd) —
document counts in the billions stream through these without Python.
The hash primitives are md5-hex so the DuckDB oracle can reproduce the
exact same values (xxhash64 would be faster but is Spark-only; swap in
``F.xxhash64`` in production and keep md5 for oracle-checked runs —
the algorithms are hash-agnostic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(toks: Column, k: int = 3) -> Column:
    """Word k-gram shingles from a token ARRAY: ['a','b','c','d'] →
    ['a b c', 'b c d']. Guarded for short docs (< k tokens → empty).

    CAUTION: the transform lambda re-evaluates ``toks`` per element
    (HOFs are interpreted, no CSE) — pass a cheap column reference,
    not an expensive expression; for raw text prefer
    :func:`word_shingles`, which is one codegen'd regex pass.
    """
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Overlapping word k-grams straight from single-space-separated
    text via one lookahead regex — ~8× faster than tokenize+transform
    (zero-width match anchored at token starts captures each k-gram
    without consuming it). Identical output to
    ``shingles(tokens(text), k)``.
    """
    c = F.col(text) if isinstance(text, str) else text
    pat = r"(?=(?:^| )(" + " ".join([r"\S+"] * k) + r"))"
    return F.regexp_extract_all(c, F.lit(pat), F.lit(1))


def hex_prefix_long(s: Column, n_hex: int = 15, start: int = 1) -> Column:
    """``n_hex`` hex chars of a digest from 1-based ``start`` →
    non-negative int64 (≤15 hex chars = ≤60 bits fits a signed long).
    Numeric hash primitive for simhash bit math and the minhash
    universal family.
    """
    return F.conv(F.substring(s, start, n_hex), 16, 10).cast("long")


def sql_hex_long(expr: str, n_hex: int, start: int = 1) -> str:
    """DuckDB SQL computing the same value as :func:`hex_prefix_long`."""
    return (
        f"CAST(list_sum(list_transform(range({n_hex}), j -> "
        f"CAST(strpos('0123456789abcdef', substring({expr}, {start} + j, 1)) - 1 "
        f"AS BIGINT) * (CAST(1 AS BIGINT) << (4 * ({n_hex} - 1 - j))))) AS BIGINT)"
    )


def minhash_family(digest_hex: Column, n_seeds: int) -> Column:
    """The n-seed universal hash family over one md5 digest:
    ``h_s = a + s·b`` with a = 56-bit, b = 52-bit slices of the hex —
    ``a + (n-1)·b`` stays < 2^61 for n ≤ 32, so the arithmetic is
    int64-exact in Spark and DuckDB alike. One digest per value, n
    cheap integer hashes out.

    Built as a literal ``F.array`` (not ``F.transform``) on purpose:
    higher-order-function lambdas run interpreted and re-evaluate the
    captured ``a``/``b`` digest expressions PER ELEMENT (n× md5 per
    value — measured ~17× slower), while a plain array of expressions
    sits inside whole-stage codegen where common-subexpression
    elimination computes the digest once; ``element_at`` on it also
    constant-folds. Same values either way.
    """
    a = hex_prefix_long(digest_hex, 14, 1)
    b = hex_prefix_long(digest_hex, 13, 15)
    return F.array(*[a + F.lit(s).cast("long") * b for s in range(n_seeds)])
