"""SWEEP_ORDER ↔ registry sync (round-2 ADVICE: new queries were
registered but never added to the list, so the driver's budgeted
correctness gate never ran them).

Importing ``__spark_entry__`` populates the registry; the list and the
registry must then agree exactly — a query missing from SWEEP_ORDER
silently lands behind the certification window, and a stale name in
SWEEP_ORDER means a query was renamed/removed without updating the
rotation.
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


def test_round5_certification_window_composition():
    """Round-5 rotation: the driver's 50-slot window must open with the
    2 canaries and contain every name needing (re-)certification this
    round — the 4 rows-only→hash-certified reworks (changed schemas)
    and all round-5 additions."""
    import __spark_entry__  # noqa: F401 — registers every query

    from catme_etl_spark.operators.ordering import SWEEP_ORDER

    window = SWEEP_ORDER[:50]
    assert window[:2] == [
        "etl_pipeline_stages",
        "flagship_revenue_by_nation",
    ]
    needs_certification = [
        # reworked (schema changed → r01-r04 green rows are stale)
        "agg_approx_count_distinct",
        # minhash-family fix → all minhash-derived values changed
        "dedup_minhash_lsh_pairs",
        "dedup_minhash_canonical",
        "stream_session_sealed",
        "sim_ml_lsh_pairs",
        "sim_ivf_kmeans_topk",
        # round-5 additions
        "pipeline_dedup_corpus",
        "sim_centroid_assign_audit",
        "text_boilerplate_chunks",
        "events_attribution_linear",
        "dedup_cross_source_matrix",
        "pipeline_dedup_ingest",
        "events_markov_transitions",
        "quality_benford_first_digit",
        "window_rolling_distinct_users",
        "agg_ks_drift_halves",
        "ts_interpolate_linear",
        "text_unigram_logprob",
        "pipeline_semantic_dedup",
        "dedup_containment_pairs",
        "agg_chi2_independence",
        "ts_cusum_max_deviation",
        "window_rfm_segments",
        "agg_mann_whitney_u",
        "events_pareto_user_deciles",
        "stream_histogram_value_bins",
        "text_bigram_logprob",
        "pipeline_training_export",
        "ts_rolling_median_close",
        "quality_pk_uniqueness_audit",
        "ts_seasonal_naive_backtest",
        "agg_trend_regression",
        "dedup_minhash_estimator_audit",
        "sim_srp_recall_audit",
        "dedup_minhash_scurve_audit",
        "sim_ivf_recall_audit",
        "quality_anomaly_mad_outliers",
        "text_lang_confusion_matrix",
        "text_ngram_novelty",
        "agg_seasonality_strength",
        "ts_autocorr_lag1",
        "agg_weighted_median_price",
        "events_funnel_within_session",
        "agg_hhi_market_concentration",
        "scalar_bitwise_funcs",
        "events_conversion_latency_quartiles",
    ]
    for name in needs_certification:
        assert name in window[2:], f"{name} fell outside the window"
