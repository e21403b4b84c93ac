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
    """Whitespace tokenization with empty tokens removed.

    ``F.split('', ' ')`` yields ``['']`` — one phantom empty token —
    and doubled/leading/trailing spaces inject more of them, which
    made the slow tokenize-then-shingle path diverge from
    :func:`word_shingles` on empty text (hypothesis-found, pinned in
    ``tests/test_texttools_property.py``). ``array_remove`` drops
    every ``''`` in the same codegen stage as the split (no
    interpreted higher-order lambda), so empty text tokenizes to
    ``[]`` and token counts mean what they say. Oracle mirror:
    ``list_filter(string_split(text, ' '), t -> t <> '')``.

    Remaining pinned divergence vs the regex path: ASCII
    control-whitespace INSIDE a token ('\\x0c') is split-visible but
    Java-regex ``\\S+``-invisible — out of domain for the
    single-space-normalized corpus contract, still pinned in the
    property test.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.array_remove(F.split(c, " "), "")


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


MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def minhash_constants(n_seeds: int) -> list[tuple[int, int]]:
    """Deterministic per-seed Carter-Wegman constants (a_s, b_s),
    a_s ∈ [1, p-1], b_s ∈ [0, p-1], derived from md5(f"mh{s}") — the
    same constants embed as literals in the Spark plan and the DuckDB
    oracle SQL, so both engines evaluate the identical family."""
    import hashlib

    out = []
    for s in range(n_seeds):
        hx = hashlib.md5(f"mh{s}".encode()).hexdigest()
        a = int(hx[:14], 16) % (MINHASH_P - 1) + 1
        b = int(hx[14:27], 16) % MINHASH_P
        out.append((a, b))
    return out


def minhash_family(digest_hex: Column, n_seeds: int) -> Column:
    """The n-seed universal hash family over one md5 digest:
    ``h_s(x) = (a_s·x + b_s) mod p`` with p = 2^31−1, x = the digest's
    56-bit prefix reduced mod p, and INDEPENDENT per-seed constants
    (:func:`minhash_constants`). a_s < 2^31 and x < 2^31 keep the
    product < 2^62 — int64-exact in Spark and DuckDB alike. One digest
    per value, n cheap integer hashes out.

    Why independent constants matter (found by
    `dedup_minhash_estimator_audit`): the earlier linear-in-s form
    ``a + s·b`` makes the SAME value minimize every seed whenever one
    value has both small a and small b — per-seed minima were almost
    perfectly correlated, so the k/32 Jaccard estimate saturated at
    1.0 for near-disjoint candidate docs and LSH banding's S-curve
    assumption (independent rows) was silently violated, inflating
    false-positive candidates that only the exact-verify stage
    filtered out.

    Built as a literal ``F.array`` (not ``F.transform``) on purpose:
    higher-order-function lambdas run interpreted and re-evaluate the
    captured digest expressions PER ELEMENT (n× md5 per value —
    measured ~17× slower), while a plain array of expressions sits
    inside whole-stage codegen where common-subexpression elimination
    computes the digest once; ``element_at`` on it also
    constant-folds. Same values either way.
    """
    x = hex_prefix_long(digest_hex, 14, 1) % F.lit(MINHASH_P)
    return F.array(
        *[
            (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)
            for a, b in minhash_constants(n_seeds)
        ]
    )
