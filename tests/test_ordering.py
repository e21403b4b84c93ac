"""SWEEP_ORDER ↔ registry ↔ rotation-tool sync.

Round-2 ADVICE: new queries were registered but never added to the
list, so the driver's budgeted correctness gate never ran them — the
first test keeps the list and the registry in exact agreement.

Round-6 item #4: the 50-slot certification window is now SELECTED
MECHANICALLY by ``tools/rotation.py`` (per-query dependency
fingerprints diffed against the committed ``rotation_state.json``);
the second test asserts the committed SWEEP_ORDER equals the tool's
output, so a hand edit that disagrees with the dependency diff — or a
code change whose blast radius was never rotated into the window —
fails here instead of silently shipping an uncertified change.
"""

from __future__ import annotations


def test_sweep_order_matches_registry_exactly():
    import __spark_entry__  # noqa: F401 — registers every query

    from catme_etl_spark.operators.ordering import SWEEP_ORDER
    from catme_etl_spark.operators.registry import QUERIES

    listed, registered = set(SWEEP_ORDER), set(QUERIES)
    assert len(SWEEP_ORDER) == len(listed), "duplicate names in SWEEP_ORDER"
    assert registered - listed == set(), (
        f"registered but missing from SWEEP_ORDER: {sorted(registered - listed)}"
    )
    assert listed - registered == set(), (
        f"in SWEEP_ORDER but not registered: {sorted(listed - registered)}"
    )


def test_window_equals_rotation_tool_output():
    """The committed ordering must be exactly what the dependency-
    driven selector computes: every changed/new fingerprint inside the
    50-slot window, canaries first, untouched spillover in prior
    order."""
    import __spark_entry__  # noqa: F401 — registers every query

    from catme_etl_spark.operators.ordering import SWEEP_ORDER

    import tools.rotation as rotation

    computed, forced = rotation.compute_sweep_order()
    assert SWEEP_ORDER == computed, (
        "SWEEP_ORDER is out of sync with tools/rotation.py — run "
        "`python tools/rotation.py emit --write` (and re-snapshot if "
        "this is intentional new work)"
    )
    window = SWEEP_ORDER[: rotation.WINDOW_SLOTS]
    assert window[:2] == rotation.CANARIES
    overflow = [n for n in forced if n not in window]
    assert overflow == [], (
        f"changed/new names fell OUTSIDE the certification window: {overflow}"
    )


def test_pending_queue_discipline():
    """Window-budget deferrals (registry.pending_query) must stay
    invisible to the driver — absent from SWEEP_ORDER — while every
    queued name keeps a runnable callable AND an oracle, so the next
    round's flip to @query is a one-line change with certification
    evidence already staged."""
    import __spark_entry__  # noqa: F401 — registers every query

    from catme_etl_spark.operators.ordering import SWEEP_ORDER
    from catme_etl_spark.operators.registry import (
        ORACLE,
        PENDING,
        PENDING_ORACLE,
        QUERIES,
    )

    assert set(PENDING) & set(QUERIES) == set()
    assert set(PENDING) & set(SWEEP_ORDER) == set()
    assert set(PENDING_ORACLE) == set(PENDING), (
        "every deferred query must carry its oracle into the queue"
    )
    assert set(PENDING_ORACLE) & set(ORACLE) == set()
    for name, fn in PENDING.items():
        assert callable(fn), name
    # the staged round-10 debut queue, pinned by name (evidence:
    # PENDING_CHECK_r09.txt, tests/test_round10_pending.py)
    assert set(PENDING) == {
        "dedup_near_dup_conflicting_metadata",
        "events_burstiness_fano",
        "quality_split_balance_audit",
        "sample_importance_weights_ppm",
        "quality_split_leakage_near_dup",
        "sample_sqrt_temperature_mix",
        "sim_ivf_recall_clustered",
        "stats_bootstrap_ci_md5",
        "stream_concurrency_by_hour",
        "stream_minhash_band_index",
        "stream_volume_anomaly_weekly",
        "text_hapax_ratio_by_source",
    }


def test_max_staleness_bound():
    """Round-7 verdict item #6: the staleness-weighted spillover must
    keep the certification-freshness guarantee a NUMBER. If this
    fails, the round's forced set ate too much spillover slack:
    budget fewer certified-code changes or grow the window,
    explicitly.

    Round-9 fix (round-8 verdict item #1): assert the ACHIEVABLE
    bound — the staleness of a fresh stalest-first emit computed NOW —
    not the committed order's raw on-disk staleness. The raw bound
    reddened when the driver delivered CORRECTNESS_r08.json after the
    round's final emit (upcoming 8 → 9 with zero code change); the
    achievable bound is what the rotation mechanism can still
    guarantee at round entry, whenever the artifact lands.

    Bound arithmetic: round 9's emit drains the 11-name r01 cohort
    plus the stalest 19 of r02's 44; the ~25 r02 names left outside
    read upcoming−2 = 7 going into round 10, so 7 stays the floor.
    RATCHET: drop to 6 once the r02 cohort has fully rotated through
    (two more ≤ ~20-forced rounds)."""
    import __spark_entry__  # noqa: F401 — registers every query

    import tools.rotation as rotation

    rep = rotation.achievable_staleness_report()
    assert rep["max_rounds_stale_outside_window"] <= 7, rep


def test_staleness_bound_robust_to_driver_artifact_timing(monkeypatch):
    """The crafted round-8 failure: the driver drops a NEW
    CORRECTNESS_r{N}.json (certifying the committed window) after the
    builder's final run, pushing ``upcoming`` one round forward. The
    achievable bound must stay green through that delivery — the
    hypothetical emit absorbs whatever the new artifact made
    stalest."""
    import __spark_entry__  # noqa: F401 — registers every query

    from catme_etl_spark.operators.ordering import SWEEP_ORDER

    import tools.rotation as rotation

    before = rotation.achievable_staleness_report()
    assert before["max_rounds_stale_outside_window"] <= 7, before

    certified, latest = rotation.last_certified()
    simulated = dict(certified)
    for n in SWEEP_ORDER[: rotation.WINDOW_SLOTS]:
        simulated[n] = latest + 1

    monkeypatch.setattr(
        rotation, "last_certified", lambda: (simulated, latest + 1)
    )
    after = rotation.achievable_staleness_report()
    assert after["max_rounds_stale_outside_window"] <= 7, after


ROUND7_DEBUT_QUEUE = [
    "sim_graph_triangle_count",
    "pipeline_dedup_impact_report",
    "events_dau_wau_stickiness",
    "events_assoc_lift",
    "events_bot_signature_scan",
    "quality_referential_integrity_audit",
    "quality_pii_scan",
    "sample_epoch_mix_plan",
    "pack_padding_waste_audit",
    "emb_dimension_profile",
    "sim_norm_audit",
    "sim_centroid_distance_matrix",
    "sim_ivf_nprobe_curve",
    "stats_kaplan_meier_churn",
    "agg_jackknife_mean_se",
    "text_vocab_overlap_sources",
    "text_oov_rate_split",
    "text_pmi_collocations",
    "text_length_percentiles_by_lang",
]


ROUND8_DEBUT_QUEUE = [
    "dedup_bloom_prefilter_audit",
    "events_weekly_seasonality_profile",
    "events_daily_autocorrelation",
    "events_retention_halflife_fit",
    "events_volume_anomaly_by_type_week",
    "quality_dup_conflicting_metadata",
    "events_attribution_u_shaped",
    "sample_epoch_shuffle_head",
    "sample_quality_weighted_budget",
    "sim_recall_vs_k_curve",
    "sim_cosine_band_histogram",
    "text_diversity_length_corr",
    "text_js_divergence_sources",
    "stream_bloom_index_maintenance",
]


def test_debut_queues_flipped_live():
    """Round-N+1 item #1 each round: operators deferred by a round's
    window budget must be LIVE next round (@query, with oracle) — the
    queue is a deferral, never a skip. Round 7's 19 landed in round 8
    (all green in CORRECTNESS_r08); round 8's 14 must sit inside the
    round-9 certification window."""
    import __spark_entry__  # noqa: F401 — registers every query

    from catme_etl_spark.operators.ordering import SWEEP_ORDER
    from catme_etl_spark.operators.registry import ORACLE, PENDING, QUERIES

    import tools.rotation as rotation

    window = set(SWEEP_ORDER[: rotation.WINDOW_SLOTS])
    for name in ROUND7_DEBUT_QUEUE + ROUND8_DEBUT_QUEUE:
        assert name in QUERIES, f"{name} missing from live registry"
        assert name in ORACLE, f"{name} lost its oracle in the flip"
        assert name not in PENDING, f"{name} still queued"
    for name in ROUND8_DEBUT_QUEUE:
        assert name in window, f"{name} outside the certification window"


def test_flip_tool_finds_every_pending_site():
    """The round-8 flip tool's source scan must agree with the live
    PENDING registry — a pending registration the rewriter can't see
    (formatting drift, a new module outside its globs) would survive
    the flip and silently miss its debut window."""
    import __spark_entry__  # noqa: F401 — registers every query

    import tools.flip_pending as flip
    from catme_etl_spark.operators.registry import PENDING

    found = {n for names in flip.flip_sites().values() for n in names}
    assert found == set(PENDING)
