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
    """Word k-gram shingles: ['a','b','c','d'] → ['a b c', 'b c d'].

    Guarded for short docs (fewer than k tokens → empty array); the
    sequence/transform pair stays inside codegen.
    """
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))


def hex_prefix_long(s: Column, n_hex: int = 15) -> Column:
    """First ``n_hex`` hex chars of a digest → non-negative int64.

    15 hex chars = 60 bits, which fits a signed long; used as the
    numeric hash for simhash bit math.
    """
    return F.conv(F.substring(s, 1, n_hex), 16, 10).cast("long")


def seeded_md5(value: Column, seed: Column) -> Column:
    """Deterministic per-seed hash family for minhash: md5(value '#' seed).

    Fixed-width lowercase hex compares lexicographically in the same
    order as its numeric value, so ``min()`` over these strings is a
    valid minhash without any hex→int conversion.
    """
    return F.md5(F.concat(value, F.lit("#"), seed.cast("string")))
