"""Property tests for the tokenization/shingling kernels — these feed
every MinHash/SimHash/containment operator, so their equivalences are
load-bearing claims, not implementation details:

- ``word_shingles(text, k)`` (one lookahead-regex pass) promises
  IDENTICAL output to ``shingles(tokens(text), k)`` (tokenize +
  transform) in its docstring; hypothesis drives token counts, token
  shapes, and k across the boundary cases (n < k, n == k, unicode).
- ``hex_prefix_long`` promises a non-negative int64 for any ≤15-hex
  prefix — the invariant the banding arithmetic silently relies on.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# tokens free of JAVA-REGEX whitespace (\s = [ \t\n\x0B\f\r] — Spark
# compiles \S+ with Java defaults, NOT Unicode-aware), the contract
# the single-space-normalized fixtures guarantee; a token containing
# e.g. \f is split-visible but regex-invisible — pinned below
_token = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters=" \t\n\x0b\x0c\r\x00"
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=st.lists(_token, min_size=1, max_size=12), k=st.integers(1, 5))
def test_word_shingles_equals_tokenize_then_shingle(spark, toks, k):
    """On NON-EMPTY single-space text the two paths are identical
    (the docstring's claim, now property-checked). Empty text is the
    one pinned divergence — see the dedicated test below."""
    from catme_etl_spark.functions.texttools import (
        shingles,
        tokens,
        word_shingles,
    )

    text = " ".join(toks)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        word_shingles("text", k=k).alias("a"),
        shingles(tokens("text"), k=k).alias("b"),
    ).collect()[0]
    assert got.a == got.b
    # and both agree with the obvious python reference
    pytoks = text.split(" ")
    expect = (
        [" ".join(pytoks[i : i + k]) for i in range(len(pytoks) - k + 1)]
        if len(pytoks) >= k
        else []
    )
    assert got.a == expect


def test_empty_text_shingle_divergence_fixed_r7(spark):
    """Round-6 hypothesis run found ``F.split('', ' ') == ['']`` (one
    phantom empty token), making ``shingles(tokens(''), 1) == ['']``
    while ``word_shingles('', 1) == []``. Round 7 closed it the pinned
    way: ``tokens()`` now ``array_remove``s empty tokens, so empty
    text (and doubled/leading/trailing spaces) tokenize to what the
    regex path sees. This test asserts the FIX holds on the empty,
    all-space, and doubled-space shapes."""
    from catme_etl_spark.functions.texttools import (
        shingles,
        tokens,
        word_shingles,
    )

    df = spark.createDataFrame(
        [("",), ("   ",), ("a  b",)], "text string"
    )
    for row in df.select(
        "text",
        tokens("text").alias("t"),
        shingles(tokens("text"), k=1).alias("b"),
    ).collect():
        assert "" not in row.t, row
        assert row.b == [x for x in row.text.split(" ") if x], row

    # still-pinned divergence class (hypothesis-found, out of the
    # single-space-normalized corpus domain): ASCII control whitespace
    # INSIDE a token — literal-space split keeps '\f' as a token,
    # Java-regex \S+ skips it. tokens() only removes EMPTY tokens, so
    # '\f' survives the split path.
    df2 = spark.createDataFrame([("\x0c",)], "text string")
    got2 = df2.select(
        word_shingles("text", k=1).alias("a"),
        shingles(tokens("text"), k=1).alias("b"),
    ).collect()[0]
    assert got2.a == []
    assert got2.b == ["\x0c"]


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(s=st.text(min_size=0, max_size=40), n_hex=st.integers(1, 15))
def test_hex_prefix_long_nonnegative_int64(spark, s, n_hex):
    from catme_etl_spark.functions.texttools import hex_prefix_long

    df = spark.createDataFrame([(s,)], "s string")
    v = df.select(
        hex_prefix_long(F.md5("s"), n_hex, 1).alias("v")
    ).collect()[0].v
    assert v is not None and 0 <= v < (1 << (4 * n_hex))


def test_minhash_family_constants_invariants():
    """The Carter-Wegman constants' load-bearing properties (the
    estimator audit caught the correlated-family bug this family
    replaced — these assertions keep it dead): a_s never 0 mod p
    (h would collapse to a constant), all (a, b) pairs distinct
    (pairwise independence needs distinct seeds), and the a·x product
    bound that keeps the Spark/DuckDB arithmetic int64-exact."""
    from catme_etl_spark.functions.texttools import (
        MINHASH_P,
        minhash_constants,
    )

    consts = minhash_constants(64)
    assert len(set(consts)) == 64
    for a, b in consts:
        assert 1 <= a <= MINHASH_P - 1
        assert 0 <= b <= MINHASH_P - 1
        # max product a*x with x < p stays under 2^62 (int64-exact)
        assert a * (MINHASH_P - 1) < (1 << 62)
    # determinism: same constants on every call (they embed as plan
    # literals AND oracle literals — drift would split the engines)
    assert consts == minhash_constants(64)
