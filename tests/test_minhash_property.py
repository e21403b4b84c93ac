"""Property tests for the MinHash+LSH near-dup pipeline against a
driver-side brute-force oracle on tiny synthetic corpora.

Two properties that hold regardless of banding luck:

1. **Soundness**: every (doc_a, doc_b, jaccard) the pipeline returns
   must equal the brute-force shingle-set Jaccard computed in plain
   Python — the verification stage is exact, so LSH can only *miss*
   pairs, never report a wrong similarity.
2. **Exact-duplicate completeness**: identical texts have identical
   signatures, so every band matches and the pair is guaranteed a
   candidate → planted exact duplicates MUST appear (with jaccard 1.0).

Near-dup recall in between is probabilistic by design (the 8×4 banding
S-curve) and deliberately not asserted.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
          "golf", "hotel", "india", "juliet", "kilo", "lima"]


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _brute_jaccard(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=3, max_value=8))
    docs = []
    for _ in range(n):
        words = draw(st.lists(st.sampled_from(_WORDS), min_size=5, max_size=20))
        docs.append(" ".join(words))
    # plant one exact duplicate pair
    dup_src = draw(st.integers(min_value=0, max_value=len(docs) - 1))
    docs.append(docs[dup_src])
    return docs


@pytest.fixture(scope="module")
def minhash_runner(spark, tmp_path_factory):
    """One reusable runner: writes a docs list as a documents.parquet
    fixture dir and runs the registered minhash pairs query on it."""
    from catme_etl_spark.operators.dedup import dedup_minhash_lsh_pairs

    counter = {"i": 0}

    def run(docs: list[str]):
        counter["i"] += 1
        d = tmp_path_factory.mktemp(f"mh{counter['i']}")
        rows = [(i, t) for i, t in enumerate(docs)]
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        return dedup_minhash_lsh_pairs(spark, str(d)).collect()

    return run


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora())
def test_minhash_pairs_sound_and_dup_complete(minhash_runner, docs):
    got = minhash_runner(docs)
    # 1. soundness: reported jaccard == brute force (rounded like the query)
    for r in got:
        expect = round(_brute_jaccard(docs[r.doc_a], docs[r.doc_b]), 4)
        assert r.jaccard == pytest.approx(expect, abs=1e-4), (
            f"pair ({r.doc_a},{r.doc_b}) reported {r.jaccard}, brute {expect}"
        )
        assert r.jaccard >= 0.5  # query threshold respected
    # 2. exact-duplicate completeness: every identical text pair found
    seen = {(r.doc_a, r.doc_b) for r in got}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if docs[i] == docs[j] and len(docs[i].split()) >= 3:
                assert (i, j) in seen, f"exact duplicate ({i},{j}) missed"
