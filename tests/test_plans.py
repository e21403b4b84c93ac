"""Plan-shape guardrails: pushdown, pruning, broadcast, shuffle counts
(SURVEY §4.3/§4.4 — 'the plan you'd want at 100 TB', tested)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as e
from catme_etl_spark.operators.pipeline import run_pipeline
from catme_etl_spark.plans.explain import (
    assert_broadcast_join,
    assert_columns_pruned,
    assert_no_shuffle,
    assert_pushed_filters,
    codegen_stage_count,
    count_shuffles,
)
from catme_etl_spark.sources.tables import load_table


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    assert_pushed_filters(q, "GreaterThan(l_quantity,30")


def test_column_pruning_on_projection(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    # scan must not read the wide money/text columns
    assert_columns_pruned(q, "l_extendedprice", "l_returnflag", "l_shipdate")


def test_flagship_broadcasts_dims_and_pushes_date_filter(spark, sf_dir):
    q = e.queries()["flagship_revenue_by_nation"](spark, sf_dir)
    assert_broadcast_join(q, min_count=1)
    assert_pushed_filters(q, "GreaterThanOrEqual(l_shipdate")


def test_pipeline_is_narrow_and_codegend(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    out = run_pipeline(n)
    assert_no_shuffle(out)
    assert codegen_stage_count(out) >= 1


def test_banded_interval_join_is_hash_join_not_bnl(spark, sf_dir):
    """The point of banding: the |dt|<=W theta-join must plan as an
    equi hash/merge join, never BroadcastNestedLoop over a cross
    product."""
    q = e.queries()["rangejoin_view_near_purchase"](spark, sf_dir)
    from catme_etl_spark.plans.explain import executed_plan_str

    plan = executed_plan_str(q)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_q1_has_single_shuffle(spark, sf_dir):
    """Grouped agg = exactly one exchange (partial agg map-side, final
    after one hash shuffle); the sort for ORDER BY may add one more."""
    q = e.queries()["q1_pricing_summary"](spark, sf_dir)
    assert count_shuffles(q) <= 2


def test_tpch2_q7_pushes_nation_disjunction_and_broadcasts(spark, sf_dir):
    """Catalyst must infer the per-side nation filters from the OR pair
    predicate and push them into both broadcast nation scans, and the
    ship-date range must reach the lineitem scan."""
    q = e.queries()["tpch_q7_volume_shipping"](spark, sf_dir)
    assert_broadcast_join(q, min_count=2)
    assert_pushed_filters(
        q,
        "GreaterThanOrEqual(l_shipdate",
        "EqualTo(n_name,NATION_1)",
    )


def test_tpch2_q18_having_rollup_joins_broadcast(spark, sf_dir):
    q = e.queries()["tpch_q18_large_volume_customers"](spark, sf_dir)
    assert_broadcast_join(q, min_count=1)
    # the qty roll-up reads only the two columns it needs
    assert_columns_pruned(q, "l_extendedprice", "l_discount", "l_shipdate")


def test_gapfill_spine_join_stays_small(spark, sf_dir):
    """Gap-fill joins the spine against the AGGREGATED series; the raw
    events scan must read only ts (plus the pushed type filter) — a
    plan that drags value/props into the count would be reading ~3x
    the bytes at 100 TB."""
    q = e.queries()["ts_gapfill_10min_purchase"](spark, sf_dir)
    assert_pushed_filters(q, "EqualTo(event_type,purchase)")
    assert_columns_pruned(q, "props", "user_id", "value")


def test_quality_audit_broadcasts_every_dim(spark, sf_dir):
    q = e.queries()["quality_fk_audit"](spark, sf_dir)
    assert_broadcast_join(q, min_count=7)


def test_weighted_reservoir_plans_topk_not_global_sort(spark, sf_dir):
    """The weighted sample must plan as TakeOrderedAndProject
    (per-partition heaps + driver merge of k rows) — a global Sort
    before the limit would be the 100 TB failure mode."""
    q = e.queries()["sample_weighted_reservoir"](spark, sf_dir)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_salted_join_spreads_key_without_extra_shuffles(spark, sf_dir):
    """Salted join: same result shape as the plain join, and the salt
    column never reaches the output schema."""
    q = e.queries()["join_salted_event_type_stats"](spark, sf_dir)
    assert "_salt" not in q.columns
    assert q.count() > 0


def test_repetition_stats_is_pure_scan(spark, sf_dir):
    """Gopher repetition filters must be narrow — zero exchanges; the
    explode+groupBy formulation would shuffle the whole token stream."""
    q = e.queries()["text_repetition_stats"](spark, sf_dir)
    assert count_shuffles(q) == 0


def test_contamination_broadcasts_benchmark_side(spark, sf_dir):
    """Decontamination joins the corpus n-gram stream against the tiny
    benchmark set — that side must broadcast, never shuffle the corpus."""
    q = e.queries()["text_contamination_overlap"](spark, sf_dir)
    assert_broadcast_join(q, min_count=1)


def test_chunking_is_pure_narrow_explode(spark, sf_dir):
    q = e.queries()["text_chunk_documents"](spark, sf_dir)
    assert count_shuffles(q) == 0


def test_int8_quantization_is_pure_scan(spark, sf_dir):
    q = e.queries()["sim_int8_quantization"](spark, sf_dir)
    assert count_shuffles(q) == 0


def test_split_tag_is_narrow_single_agg_shuffle(spark, sf_dir):
    q = e.queries()["sample_train_val_test"](spark, sf_dir)
    assert count_shuffles(q) == 1


def test_packing_reuses_window_partitioning(spark, sf_dir):
    """The per-source packing window and the (source, seq_id) rollup
    must share ONE exchange — HashPartitioning(source) satisfies the
    rollup's clustering, so a second shuffle would be a regression."""
    q = e.queries()["pack_sequences_by_budget"](spark, sf_dir)
    assert count_shuffles(q) == 1


def test_incremental_dedup_broadcasts_new_batch(spark, sf_dir):
    """The incremental ingest join must broadcast the (small) new
    batch's band keys — the corpus-sized LSH index never shuffles for
    the probe, and nothing degenerates to a sort-merge self-join."""
    from catme_etl_spark.plans.explain import executed_plan_str

    q = e.queries()["dedup_minhash_incremental"](spark, sf_dir)
    assert_broadcast_join(q, min_count=1)
    assert "SortMergeJoin" not in executed_plan_str(q)


def test_temperature_mix_broadcasts_rates(spark, sf_dir):
    """The per-stratum rate table is tiny — it must broadcast back onto
    the corpus scan, never shuffle the documents for the join."""
    q = e.queries()["sample_temperature_mix"](spark, sf_dir)
    assert_broadcast_join(q, min_count=1)


def test_gaps_islands_single_shuffle(spark, sf_dir):
    """Both window passes and the island aggregation share the user_id
    partitioning — the whole query is ONE exchange (hash partitioning
    on a grouping-key subset satisfies the agg's distribution)."""
    q = e.queries()["window_gaps_islands_user_activity"](spark, sf_dir)
    assert count_shuffles(q) == 1


def test_interval_overlap_bnl_is_broadcast_of_generated_dim(spark, sf_dir):
    """The theta condition runs as a BNL ONLY against the broadcast
    27-row generated quarter dim — the interval table itself must not
    cartesian with anything its own size."""
    from catme_etl_spark.plans.explain import executed_plan_str

    q = e.queries()["join_interval_overlap_quarters"](spark, sf_dir)
    plan = executed_plan_str(q)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_completeness_profile_is_single_scan(spark, sf_dir):
    """The per-column profile computes every null/distinct count from
    ONE pass over storage (Catalyst's Expand), not one scan per column
    like the oracle's UNION ALL formulation."""
    from catme_etl_spark.plans.explain import scan_read_schemas

    q = e.queries()["quality_completeness_profile"](spark, sf_dir)
    assert len(scan_read_schemas(q)) == 1


def test_entropy_closed_form_has_no_join(spark, sf_dir):
    """H = log2(tot) - sum(n*log2 n)/tot needs only the per-stratum
    counts: two cascaded aggs, no join back for the total (the naive
    p*log2(p) form costs an extra shuffle + join)."""
    from catme_etl_spark.plans.explain import executed_plan_str

    q = e.queries()["agg_entropy_lang_by_source"](spark, sf_dir)
    plan = executed_plan_str(q)
    assert "Join" not in plan
    assert count_shuffles(q) == 2


def test_point_in_time_filter_pushdown_survives_asof_composition(spark, sf_dir):
    """The as-of union/window composition must not block column
    pruning: the lineitem scan reads only the probe columns."""
    q = e.queries()["join_point_in_time_priority"](spark, sf_dir)
    assert_columns_pruned(q, "l_quantity", "l_extendedprice", "l_returnflag")
