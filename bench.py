"""Headline benchmark for the engine (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Execution is forced through Spark's ``noop`` sink — the full plan runs
(every column materialized, nothing short-circuited by count-only
optimization) and nothing funnels through the driver, which is exactly
the shape of a production write job.

Protocol (artifact-warm, round 13): session-shared artifacts (decon
survivors, near-dup pairs, MinHash/SRP bands, matrix/IVF-PQ
broadcasts) are force-built ONCE in an untimed discovery pass and
reported as their own ``artifact:<name>`` entries (self-time, nested
builds attributed once); the timed sweep then runs artifact-warm, so
``queries`` report each consumer's net cost. This is the 100 TB-honest
split — artifacts are written once to reliable storage and every
release/dedup job reads them — and it stops the one-time build cost
from landing on whichever family member a single-pass sweep touches
first (round-12 verdict item #4).
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (join+agg, wide agg, window,
# LSH dedup, self-join dedup, text agg, vector kernel, JSON/event agg,
# heavy multi-join TPC-H, deterministic SRP-LSH ANN, and a genuine
# Structured Streaming job so round-over-round tracking covers the
# join-heavy and streaming families too).
HEADLINE = [
    "flagship_revenue_by_nation",
    "q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_revenue",
    "tpch_q18_large_volume_customers",
    "window_running_total_per_customer",
    "events_tumbling_10min",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "text_top_tokens",
    "dedup_embedding_cosine_pairs",
    "sim_ivf_topk",
    "sim_srp_lsh_pairs",
    "scalar_json_props",
    "stream_tumbling_10min",
    # round-3 additions: ingestion-shaped dedup, mergeable-state
    # rollup, and deterministic mix resampling
    "dedup_minhash_incremental",
    "agg_bitmap_distinct_rollup",
    "sample_temperature_mix",
    # round-4 additions: every family added since r02 gets regression
    # tracking — HLL sketch union, LATERAL join, grouped-agg pandas
    # UDF, CDC merge, and the two heaviest new round-4 operators
    "agg_hll_union_rollup",
    "join_lateral_top2_customers",
    "udf_grouped_agg_gmean",
    "merge_cdc_latest_wins",
    "window_gaps_islands_user_activity",
    "asof_nearest_purchase",
    # round-5 additions: every family added since r02 now has
    # round-over-round regression tracking — point-in-time temporal
    # join, CMS sketch bound-check, recursive per-key EWMA, the dedup
    # deliverable (cluster representatives), single-scan IQR profile,
    # and the composed end-to-end dedup pipeline
    "join_point_in_time_priority",
    "agg_cms_heavy_hitters",
    "grouped_map_user_ewma",
    "dedup_cluster_representatives",
    "quality_anomaly_iqr_fences",
    "pipeline_dedup_corpus",
    # late round-5: the new pipeline/audit operators — ingest
    # admission, provenance matrix, boilerplate chunks, attribution,
    # and the centroid label audit
    "pipeline_dedup_ingest",
    "dedup_cross_source_matrix",
    "text_boilerplate_chunks",
    "events_attribution_linear",
    "sim_centroid_assign_audit",
    # round-5 second batch: behavioral matrix, rolling distinct
    # rewrite, drift statistic, interpolation, corpus LM score, and
    # the embedding-space dedup composition
    "events_markov_transitions",
    "window_rolling_distinct_users",
    "agg_ks_drift_halves",
    "ts_interpolate_linear",
    "text_unigram_logprob",
    "pipeline_semantic_dedup",
    # round-5 third batch: containment (new shingle consumer),
    # rank-test family, exact-integer CUSUM, and the streaming
    # mergeable-state histogram
    "dedup_containment_pairs",
    "agg_mann_whitney_u",
    "ts_cusum_max_deviation",
    "stream_histogram_value_bins",
    # the capstone corpus-to-training-batches composition
    "pipeline_training_export",
    # sketch/ANN self-audits (shingle + band-index consumers)
    "dedup_minhash_scurve_audit",
    "sim_srp_recall_audit",
    # round-6 additions: template clustering + the split-contamination
    # audit it feeds, the skew/inequality profile family, URL
    # canonicalization, the quality-score histogram, and the
    # bounded-staleness as-of variant
    "dedup_prefix_template_clusters",
    "quality_split_leakage_audit",
    "skew_salt_plan_event_type",
    "agg_theil_index",
    "agg_pareto_alpha_hill",
    "scalar_url_canonicalize_dedup",
    "text_logprob_bins",
    "asof_backward_tolerance_1h",
    # round-6 second batch: nearest-dup report (shingle consumer),
    # similarity-graph density, cross-series correlation, Heaps
    # vocabulary growth, Poisson burst scan
    "dedup_nearest_duplicate_report",
    "sim_graph_degree_histogram",
    "ts_cross_correlation_matrix",
    "text_vocab_growth_heaps",
    "events_poisson_burst_scan",
    # round-6 third batch: SCD2 time-travel, k-fold assignment,
    # SimHash threshold audit
    "scd2_snapshot_as_of",
    "sample_kfold_assignment",
    "dedup_simhash_hamming_histogram",
    # round-6 fourth batch: Zipf head fit, winsorized mean, and the
    # inter-arrival traffic model
    "text_zipf_fit_audit",
    "agg_winsorized_mean_price",
    "events_interarrival_stats",
    # round-6b additions
    "events_retention_cohorts",
    "quality_table_profile",
    "skew_hot_user_report",
    "agg_join_cardinality_audit",
    "sample_token_budget_apportion",
    "pack_compaction_plan",
    "sim_int8_quant_recall",
    "sim_pq_adc_recall",
    "quality_psi_drift",
    "pipeline_drift_gate",
    # round-7 additions: the Expand-free profiler default, the
    # streaming PSI verdict, and the SRP-index ingest.
    # round-10 demotion (r9 verdict item #4): sim_pq_trained_recall —
    # the opt-in ALL-PAIRS truth audit, the last disclosed quadratic in
    # the headline — is no longer benched; its scale-safe siblings
    # (sim_pq_recall_sampled_panel, sim_pq_trained_recall_clustered)
    # are the tracked pair. The full form stays registered and
    # oracle-green as evidence.
    "quality_table_profile_approx",
    "stream_drift_gate",
    "pipeline_semantic_ingest",
    # round-7b: the one new live debut (the other round-7b ops are
    # window-budget deferred to round 8 — registry.pending_query)
    "quality_order_total_consistency",
    # round-8 additions: the 19 flipped round-7b debuts + the
    # sampled-panel form of the trained-PQ recall audit
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
    "sim_pq_recall_sampled_panel",
    # round-8b: the curation trio + the session-concurrency curve
    "pipeline_train_decontamination",
    "dedup_lsh_parameter_planner",
    "sample_coreset_kcenter",
    "events_concurrency_by_hour",
    # round-8c: journey paths, corpus predictability, class balancing
    "events_session_paths_top20",
    "text_bigram_cond_entropy",
    "sample_balanced_labels",
    # round-8d: the mergeable log2 latency sketch + ORC interop
    "events_latency_log2_sketch",
    "orc_roundtrip_revenue",
    # round-9: the 14 flipped round-8 debuts
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
    # round-9b: the clustered trained-PQ audit (the scale-safe sibling
    # that replaces the demoted all-pairs form) + the sealed-session
    # latency sketch
    "sim_pq_trained_recall_clustered",
    "stream_latency_sketch_sealed",
    # round-10: the 12 flipped round-9 debuts
    "dedup_near_dup_conflicting_metadata",
    "quality_split_leakage_near_dup",
    "events_burstiness_fano",
    "quality_split_balance_audit",
    "sample_importance_weights_ppm",
    "sample_sqrt_temperature_mix",
    "sim_ivf_recall_clustered",
    "stats_bootstrap_ci_md5",
    "text_hapax_ratio_by_source",
    "stream_minhash_band_index",
    "stream_volume_anomaly_weekly",
    "stream_concurrency_by_hour",
    # round-11: the 12 flipped round-10 debuts (live as of r11 flip)
    "stream_latency_alert_daily",
    "pipeline_corpus_release",
    "sim_ivfpq_recall_clustered",
    "stats_permutation_test_md5",
    "events_changepoint_max_meanshift",
    "dedup_winnowing_fingerprint_pairs",
    "stream_changepoint_daily",
    "events_attribution_time_decay",
    "stream_winnowing_shard_index",
    "dedup_winnowing_containment",
    "ts_holt_linear_forecast",
    "stream_holt_forecast_daily",
    # round-12 debut queue, pre-staged (inert until the flip: the
    # runner filters HEADLINE to registered live queries)
    "sample_neyman_allocation",
    "sample_neyman_draw",
    "agg_theil_between_within",
    "dedup_winnowing_clusters",
    "pipeline_release_diff",
    "quality_release_gate",
    "events_changepoint_two_level",
    "pipeline_vector_index_ingest",
    "stream_ivf_list_maintenance",
    "ts_holt_winters_weekly",
    "stream_holt_winters_weekly",
    "text_source_signature_terms",
]

# Canary families (round-7 item #2). The single join+agg canary
# under-corrected host contention on shuffle/Arrow-heavy queries: the
# r6 driver run printed 2.5x phantom normalized readings on exactly the
# python-worker-heavy queries (containment 4.60s vs a true ~1.8s)
# because the light JVM-only canary doesn't touch python workers, Arrow
# transfer, or large shuffles. Each headline query is preceded by the
# canary whose RESOURCE PROFILE matches its own, and normalized by
# that family's ratio.
#
# Classification is MEASURED, not name-based (round-7 ADVICE: several
# dedup_/pipeline_/text_-prefixed headlines are pure-JVM join/agg
# plans and were being normalized by the pandas-UDF canary whose
# contention profile they don't share): during warm-up each query's
# physical plan — built from a cleared session so lazy-checkpointed
# builders still show their full lineage — is scanned for
# python-worker nodes. Streaming headlines stay "heavy" by override:
# their returned DataFrame is the small post-run result, so the
# micro-batch cost never appears in its plan.
PY_PLAN_MARKERS = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInArrow",
    "PythonUDTF",
    "PythonUDF",
)

# prefix fallback, used only when a plan can't be inspected
HEAVY_PREFIXES = (
    "dedup_",
    "sim_",
    "pipeline_",
    "stream_",
    "udf_",
    "grouped_map_",
    "text_",
)


def _load_local_record():
    """Latest committed BENCH_r*_local.json — the controlled 3-run
    detached reading this host's numbers are adjudicated against
    (round-10 verdict item #4: a hot driver host must be readable
    from the artifact alone)."""
    import glob as _glob

    recs = sorted(
        _glob.glob(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_r*_local.json",
            )
        )
    )
    if not recs:
        return None, None
    try:
        return json.load(open(recs[-1])), os.path.basename(recs[-1])
    except Exception:
        return None, None


def _plan_family(name: str, df) -> str:
    if name.startswith("stream_"):
        return "heavy"
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return "heavy" if name.startswith(HEAVY_PREFIXES) else "join"
    return (
        "heavy" if any(m in plan for m in PY_PLAN_MARKERS) else "join"
    )


def main() -> None:
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from catme_etl_spark.session import get_spark

    spark = get_spark("bench")
    from catme_etl_spark.operators._shared import clear_shared as _cs

    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]
    # Warm-up: run every headline query once at sf0.001 (~1000x less
    # data). This compiles the same generated code / JIT-warms the same
    # operators the timed sf0.1 runs use, so the numbers measure the
    # queries, not one-time JVM compilation — i.e. steady-state
    # production behavior. Data volume is negligible (<0.2% of timed).
    # Session-shared builders are cleared BEFORE each warm-up so every
    # query's captured plan carries its full lineage (a builder another
    # query already materialized would otherwise hide its python
    # stages behind a checkpoint scan) — the same full-pipeline shape
    # the timed cold runs pay.
    fams: dict[str, str] = {}
    for name in names:
        try:
            _cs()
            df = qs[name](spark, "/root/testdata/sf0.001")
            fams[name] = _plan_family(name, df)
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            # warm-up must never break the timed run
            fams.setdefault(
                name,
                "heavy" if name.startswith(HEAVY_PREFIXES) else "join",
            )
    # warm sf0.1 parquet footers once
    qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # ---- Artifact pass (round-12 verdict item #4) ----------------
    # Session-shared artifacts (decon survivors, near-dup pairs,
    # MinHash/SRP bands, matrix/IVF-PQ broadcasts, ...) used to be
    # rebuilt inside every timed run: each consumer's number included
    # the one-time artifact build, and in single-pass sweeps (the
    # driver's) the build landed on whichever family member ran first
    # — 26 names flagged >=1.3x vs local in round 12 purely from that
    # attribution. New protocol: ONE untimed discovery pass over the
    # headline set at SF_DIR with the _shared build hooks armed, so
    # every artifact is force-built exactly once and its build cost is
    # recorded as its own "artifact:<name>" entry; the timed sweep then
    # runs ARTIFACT-WARM and "queries" report the consumer's net cost —
    # the 100 TB-honest split, where artifacts are written once to
    # reliable storage and every release/dedup job reads them.
    # The instrumentation lives entirely HERE, as call-time wrappers
    # swapped into every operator module's namespace — NOT as hooks
    # inside _shared.py — so the engine's source (and with it the
    # rotation fingerprints of the 150+ live queries whose closures
    # include shared_df) stays byte-identical; bench.py is outside
    # every query fingerprint.
    from catme_etl_spark.operators import _shared as _shmod
    from catme_etl_spark.operators._shared import clear_shared

    clear_shared()
    spark.catalog.clearCache()
    artifacts: dict[str, float] = {}
    _orig_df, _orig_bc = _shmod.shared_df, _shmod.shared_broadcast
    _stack: list[list[float]] = []  # nested-build self-time accounting

    def _record(name: str, sf_dir: str, fn):
        """Run one cache-miss build observed: report self time (total
        minus nested shared builds) under artifact:<name>."""
        _stack.append([0.0])
        t0 = time.time()
        try:
            return fn()
        finally:
            total = time.time() - t0
            child = _stack.pop()[0]
            if _stack:
                _stack[-1][0] += total
            if sf_dir == SF_DIR:
                key = f"artifact:{name}"
                artifacts[key] = round(
                    artifacts.get(key, 0.0) + max(total - child, 0.0), 3
                )

    def _wrap_df(name, sf_dir, spark, build, materialize=False):
        key = (name, sf_dir, spark.sparkContext.applicationId)
        if key in _shmod._DF_CACHE:
            return _orig_df(name, sf_dir, spark, build, materialize)

        def _miss():
            df = _orig_df(name, sf_dir, spark, build, materialize)
            # force-execute inside the observed window so the build
            # cost lands on the artifact, not its first consumer
            df.write.format("noop").mode("overwrite").save()
            return df

        return _record(name, sf_dir, _miss)

    def _wrap_bc(name, sf_dir, spark, build):
        key = (name, sf_dir, spark.sparkContext.applicationId)
        if key in _shmod._BC_CACHE:
            return _orig_bc(name, sf_dir, spark, build)
        return _record(
            name, sf_dir, lambda: _orig_bc(name, sf_dir, spark, build)
        )

    def _patch(on: bool) -> None:
        df_fn = _wrap_df if on else _orig_df
        bc_fn = _wrap_bc if on else _orig_bc
        _shmod.shared_df = df_fn
        _shmod.shared_broadcast = bc_fn
        for mn, mod in list(sys.modules.items()):
            if not mn.startswith("catme_etl_spark") or mod is None:
                continue
            if getattr(mod, "shared_df", None) in (_orig_df, _wrap_df):
                mod.shared_df = df_fn
            if getattr(mod, "shared_broadcast", None) in (_orig_bc, _wrap_bc):
                mod.shared_broadcast = bc_fn

    _patch(True)
    discovery_failures: list[str] = []
    try:
        for name in names:
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                # Discovery must never break the timed run, but a
                # failure here means the first timed consumer silently
                # rebuilds the artifact — the exact attribution bug
                # the warm protocol exists to fix (round-13 advisor
                # finding). Make the taint loud and recorded.
                discovery_failures.append(name)
                print(
                    f"bench: artifact discovery FAILED for {name}: "
                    f"{type(exc).__name__}: {exc}",
                    file=sys.stderr,
                )
    finally:
        _patch(False)

    # Timing: min of two ARTIFACT-WARM runs per query. Shared
    # artifacts stay materialized from the discovery pass (their build
    # cost is already reported under its own entry), so both runs
    # measure the query's own pipeline; the min removes single-run
    # jitter (GC pauses, micro-batch scheduling, OS noise — observed
    # ±30% on identical plans). No clear_shared()/clearCache() inside
    # the sweep: clearing would silently re-attribute artifact builds
    # to the next consumer AND clearCache() would drop persist()-mode
    # shared entries out from under later queries.
    def cold_run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    local_rec, local_name = _load_local_record()
    local_q = (local_rec or {}).get("queries", {})

    def timed_query(name: str) -> float:
        # min of two cold runs; if the two samples disagree >1.5x the
        # host was visibly unstable during one of them — take a third
        # and use the MEDIAN (round-7 item #2's second defense: a
        # lucky-fast or contended-slow outlier can't be the reading).
        a, b = cold_run(name), cold_run(name)
        if max(a, b) / max(min(a, b), 1e-9) > 1.5:
            c = cold_run(name)
            return round(sorted((a, b, c))[1], 3)
        val = min(a, b)
        # round-10 verdict item #4: a reading that disagrees >1.3x
        # with the committed local record gets the median-of-3
        # treatment, so one contended run on the driver host can't be
        # the recorded number for a shared query.
        ref = local_q.get(name)
        if ref and val > 1.3 * ref:
            c = cold_run(name)
            val = sorted((a, b, c))[1]
        return round(val, 3)

    # Host-drift correction (round-6 item #2, family-shaped in round
    # 7): a micro-canary runs COLD immediately before every headline
    # query — the JOIN family uses the flagship join+agg (untouched
    # since r01); the HEAVY family uses a fixed synthetic probe that
    # exercises exactly the resources the light canary missed (md5 +
    # explode fan-out, a real shuffle, and an Arrow-batched pandas UDF
    # round-trip through the python workers). canary_ratio[q] =
    # family-canary-before-q / best-family-canary-of-this-run;
    # queries_normalized divides wall time by that ratio. Cross-round,
    # compare queries_normalized (plus canary_ref_sec for absolute
    # drift) instead of re-running queries by hand.
    CANARY = "flagship_revenue_by_nation"

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _canary_pudf(s):
        return s.astype("float64") * 1.0000001

    def heavy_canary() -> float:
        t0 = time.time()
        df = spark.range(60_000).select(
            F.md5(F.col("id").cast("string")).alias("h"),
            (F.col("id") % 97).alias("k"),
        )
        ex = df.select(
            "k",
            F.explode(
                F.array(*[F.substring("h", i + 1, 8) for i in range(6)])
            ).alias("g"),
        )
        agg = ex.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
        agg.select(_canary_pudf(F.col("n").cast("double")).alias("v")).agg(
            F.sum("v")
        ).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    canary_fn = {"join": lambda: cold_run(CANARY), "heavy": heavy_canary}
    # prime each family's cold cost: best of two before the sweep
    c_samples = {fam: [fn(), fn()] for fam, fn in canary_fn.items()}

    times: dict[str, float] = {}
    canary: dict[str, float] = {}
    for name in names:
        fam = fams[name]
        c = canary_fn[fam]()
        c_samples[fam].append(c)
        canary[name] = round(c, 3)
        times[name] = timed_query(name)

    c_ref = {fam: min(v) for fam, v in c_samples.items()}
    ratios = {
        n: round(max(canary[n] / c_ref[fams[n]], 1.0), 3) for n in names
    }
    normalized = {n: round(times[n] / ratios[n], 3) for n in names}

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None
    # Adjudication context (round-10 verdict item #4): per-query ratio
    # vs the committed local record plus its geomean over the shared
    # set — a hot host reads as a uniform >1.15x ratio with inflated
    # canary_ref_sec; a genuine per-query regression reads as one
    # outlier ratio with clean canaries.
    shared = [n for n in names if n in local_q and local_q[n] > 0]
    vs_local = {n: round(times[n] / local_q[n], 3) for n in shared}
    geo = (
        round(
            math.exp(
                sum(math.log(max(v, 1e-9)) for v in vs_local.values())
                / len(vs_local)
            ),
            3,
        )
        if vs_local
        else None
    )
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "artifacts": artifacts,
                "artifact_total": round(sum(artifacts.values()), 3),
                "protocol": "artifact-warm-r13",
                "discovery_failures": discovery_failures,
                "canary_ref_sec": {
                    fam: round(v, 3) for fam, v in c_ref.items()
                },
                "canary_family": fams,
                "canary_ratio": ratios,
                "queries_normalized": normalized,
                "normalized_total": round(sum(normalized.values()), 3),
                "local_record": local_name,
                "vs_local_geomean_shared": geo,
                "vs_local_flagged": {
                    n: v for n, v in vs_local.items() if v > 1.3
                },
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
