"""Pins the two sample_coreset_kcenter tiers to each other (round-15
optimization): the broadcast-tier kernel (greedy selections over the
session-shared embeddings matrix, zero jobs) must equal the
distributed per-pass tier (k-1 mapInPandas scans, driver-reduced)
tuple for tuple — same selections, same d2_sel doubles — because both
fold dims left-to-right and fold mins in selection order, and min is
exact. The oracle hash certifies the broadcast tier (the one the
query takes at fixture scale); this test certifies the scale fallback
never diverges from it."""

from __future__ import annotations

import pytest


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_broadcast_tier_equals_per_pass_tier(spark, sf):
    from catme_etl_spark.operators._shared import shared_matrix_broadcast
    from catme_etl_spark.operators.similarity import (
        _kcenter_from_matrix,
        _kcenter_passes,
        fan_out,
    )
    from catme_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf, spark, emb)
    ids, mat, _ = bc.value
    fast = _kcenter_from_matrix(ids, mat)
    slow = _kcenter_passes(fan_out(emb, spark))
    assert fast == slow
    assert len(fast) == 10 and fast[0][2] == 0.0


def test_per_pass_tier_engages_above_collect_budget(spark, monkeypatch):
    """The query must fall back to the distributed tier when the
    corpus exceeds the bounded-collect budget instead of collecting
    anyway — and produce the same rows."""
    import catme_etl_spark.operators._shared as sh
    from catme_etl_spark.operators.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    baseline = sorted(
        tuple(r) for r in QUERIES["sample_coreset_kcenter"](spark, sf).collect()
    )
    monkeypatch.setattr(sh, "MAX_COLLECT_ROWS", 1)
    # a fresh session-cache name would be needed to re-trigger the
    # bounded collect; clear so the budget check actually runs
    sh.clear_shared()
    forced = sorted(
        tuple(r) for r in QUERIES["sample_coreset_kcenter"](spark, sf).collect()
    )
    sh.clear_shared()
    assert forced == baseline
