"""Property: for FULL batches, length-sorted batching minimizes total
padding (`pack_padding_waste_audit`'s saving is never negative).

Proof shape the test exercises: in any partition of n = m·B items into
m groups of B, the k-th largest group-max is >= the ((k-1)·B+1)-th
largest item, so sum-of-maxima (and hence padding, since sum-of-items
is fixed) is minimized by grouping consecutive descending order
statistics — exactly the audit's sorted plan. Partial batches break
the guarantee (the crafted test pins a 0-saving partial batch), so the
property is asserted on multiples of the batch size only.

Pure-Python mirror of the operator's integer arithmetic — no Spark
session, so hypothesis can run hundreds of cases."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

BATCH = 32


def pad(tokens: list[int], order: list[int]) -> int:
    total = 0
    for i in range(0, len(order), BATCH):
        chunk = [tokens[j] for j in order[i : i + BATCH]]
        total += max(chunk) * len(chunk) - sum(chunk)
    return total


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=4096),
        min_size=BATCH,
        max_size=BATCH * 8,
    ).filter(lambda xs: len(xs) % BATCH == 0)
)
def test_sorted_batching_minimizes_padding_on_full_batches(tokens):
    naive = pad(tokens, list(range(len(tokens))))
    by_len = sorted(
        range(len(tokens)), key=lambda j: (-tokens[j], j)
    )  # the operator's (tok DESC, doc_id) order
    assert pad(tokens, by_len) <= naive


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=4096),
        min_size=BATCH,
        max_size=BATCH * 4,
    ).filter(lambda xs: len(xs) % BATCH == 0),
    st.randoms(use_true_random=False),
)
def test_sorted_batching_beats_any_shuffle_on_full_batches(tokens, rnd):
    """Stronger form: sorted is minimal against an ARBITRARY
    permutation, not just arrival order."""
    perm = list(range(len(tokens)))
    rnd.shuffle(perm)
    by_len = sorted(range(len(tokens)), key=lambda j: (-tokens[j], j))
    assert pad(tokens, by_len) <= pad(tokens, perm)
