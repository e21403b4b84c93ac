"""Round-6 second-batch operator tests: invariants the oracle hash
can't see (exactness of the apportionment, byte conservation of the
compaction plan, the cardinality formula being EXACT, quantization
recall bounds) plus crafted-table runs for the semantics the fixtures
never exercise (NULL counting in the profiler, a genuinely shifted
distribution for PSI — the fixtures drift ~0 by construction)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest


def _duck_view(con, name, path_glob):
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path_glob}'")


def test_apportion_sums_to_budget_exactly(spark, sf_dir):
    """Hamilton apportionment invariants: Σ alloc == B exactly, and
    every source gets floor-share or floor-share + 1."""
    from catme_etl_spark.operators.sampling import (
        sample_token_budget_apportion,
    )

    rows = sample_token_budget_apportion(spark, sf_dir).collect()
    total_avail = sum(r.avail_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) == 1_000_000
    for r in rows:
        fl = (1_000_000 * r.avail_tokens) // total_avail
        assert r.alloc_tokens in (fl, fl + 1)


def test_compaction_plan_conserves_docs_and_bytes(spark, sf_dir):
    """Every doc lands in exactly one shard, bytes are conserved, and
    shard ids are contiguous from 0 within each source."""
    from catme_etl_spark.operators.sampling import pack_compaction_plan
    from catme_etl_spark.sources.tables import load_table

    plan = pack_compaction_plan(spark, sf_dir).collect()
    docs = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg({"n_chars": "sum", "*": "count"})
        .collect()
    )
    by_src = {r["source"]: r for r in docs}
    for src in by_src:
        shards = sorted(p.shard for p in plan if p.source == src)
        assert shards == list(range(len(shards))), "non-contiguous shards"
        assert sum(p.n_docs for p in plan if p.source == src) == (
            by_src[src]["count(1)"]
        )
        assert sum(p.shard_bytes for p in plan if p.source == src) == (
            by_src[src]["sum(n_chars)"]
        )


def test_retention_offset0_is_full_cohort(spark, sf_dir):
    """Week-0 retention is definitionally 100%: every user is active
    in their own first week."""
    from catme_etl_spark.operators.events import events_retention_cohorts

    rows = events_retention_cohorts(spark, sf_dir).collect()
    zero = [r for r in rows if r.week_offset == 0]
    assert zero, "no offset-0 rows"
    for r in zero:
        assert r.active_users == r.cohort_size
        assert r.retention_pct == 100.0


def test_join_cardinality_histogram_formula_is_exact(spark, sf_dir):
    """Σₖ n_o(k)·n_l(k) is not an estimate — it must equal the real
    join row count bit-for-bit. (The SAMPLED estimator is the only
    approximate column.)"""
    from catme_etl_spark.operators.stats import agg_join_cardinality_audit

    row = agg_join_cardinality_audit(spark, sf_dir).collect()[0]
    assert row.predicted_rows == row.actual_rows
    assert row.sampled_est_rows >= 0


def test_hot_user_report_shape(spark, sf_dir):
    from catme_etl_spark.operators.skew import skew_hot_user_report

    rows = skew_hot_user_report(spark, sf_dir).collect()
    assert len(rows) == 10
    counts = [r.n_events for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 <= r.share_bp <= 10000
        assert r.hot in (0, 1)


@pytest.mark.parametrize(
    "fn_name", ["sim_int8_quant_recall", "sim_pq_adc_recall"]
)
def test_quant_recall_bounds(spark, sf_dir, fn_name):
    """Recall audits: hits ⊆ truth, and the reported recall is the
    half-away-rounded hits/truth ratio."""
    import catme_etl_spark.operators.similarity as sim

    row = getattr(sim, fn_name)(spark, sf_dir).collect()[0]
    assert 0 <= row.n_hits <= row.n_truth
    import math

    expect = math.floor(row.n_hits / row.n_truth * 1_000_000 + 0.5) / 1_000_000
    assert row[3] == expect


def test_profile_counts_nulls_on_crafted_table(spark, tmp_path):
    """The fixtures carry no NULLs, so the profiler's null column is
    only ever exercised here: a crafted lineitem with one NULL l_tax
    and two NULL l_returnflag must count them, and the Spark result
    must match the DuckDB oracle on the same crafted parquet."""
    import __spark_entry__ as entry
    from catme_etl_spark.operators.quality import quality_table_profile

    rows = [
        (1.0, 10.0, 0.1, 0.02, dt.datetime(2024, 1, 1), "A", "O"),
        (2.0, 20.0, 0.2, None, dt.datetime(2024, 1, 2), None, "F"),
        (3.0, 30.0, 0.2, 0.04, dt.datetime(2024, 1, 3), None, "O"),
    ]
    df = spark.createDataFrame(
        rows,
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_shipdate timestamp, l_returnflag string, "
        "l_linestatus string",
    )
    out = str(tmp_path / "lineitem.parquet")
    df.coalesce(1).write.parquet(out)

    got = {
        r.col_name: r
        for r in quality_table_profile(spark, str(tmp_path)).collect()
    }
    assert got["l_tax"].n_nulls == 1
    assert got["l_returnflag"].n_nulls == 2
    assert got["l_returnflag"].n_distinct == 1
    assert got["l_discount"].n_distinct == 2

    con = duckdb.connect()
    _duck_view(con, "lineitem", out + "/*.parquet")
    oracle = con.execute(
        entry.oracle_sql()["quality_table_profile"]
    ).fetchall()
    spark_rows = sorted(
        tuple(r) for r in quality_table_profile(spark, str(tmp_path)).collect()
    )
    assert spark_rows == sorted(tuple(r) for r in oracle)


def test_psi_detects_crafted_shift(spark, tmp_path):
    """PSI semantics on data the fixtures can't produce: a type whose
    distribution is identical in both halves scores ~0; a type whose
    mass moves from the bottom to the top of the range scores large;
    a constant-valued type is dropped by the degenerate-range guard
    on BOTH engines (ANSI-division trap)."""
    import __spark_entry__ as entry
    from catme_etl_spark.operators.quality import quality_psi_drift

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(200):
        half = 0 if i < 100 else 1
        ts = base + dt.timedelta(minutes=i)
        # stable: same uniform pattern in both halves
        rows.append((eid, ts, i, "stable", float(i % 10), "{}"))
        eid += 1
        # shifted: low values first half, high values second half
        v = float(i % 3) if half == 0 else 7.0 + (i % 3)
        rows.append((eid, ts, i, "shifted", v, "{}"))
        eid += 1
        # const: degenerate range, must be dropped
        rows.append((eid, ts, i, "const", 5.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(out)

    got = {r.event_type: r for r in quality_psi_drift(spark, str(tmp_path)).collect()}
    assert set(got) == {"stable", "shifted"}, "const type must be dropped"
    assert got["stable"].psi_r4 < 0.05
    assert got["shifted"].psi_r4 > 1.0

    con = duckdb.connect()
    _duck_view(con, "events", out + "/*.parquet")
    oracle = con.execute(entry.oracle_sql()["quality_psi_drift"]).fetchall()
    spark_rows = sorted(
        tuple(r) for r in quality_psi_drift(spark, str(tmp_path)).collect()
    )
    assert spark_rows == sorted(tuple(r) for r in oracle)


def test_psi_reuses_stats_exchange(spark, sf_dir):
    """The per-type stats subtree feeds both the midpoint rollup and
    the range filter; at runtime AQE must REUSE that exchange so
    events is scanned twice total (stats + binning), not three times
    — the point of deriving the global midpoint from the per-type
    bounds."""
    from catme_etl_spark.operators.quality import quality_psi_drift
    from catme_etl_spark.plans.explain import executed_plan_str

    df = quality_psi_drift(spark, sf_dir)
    df.collect()
    assert "ReusedExchange" in executed_plan_str(df)


def test_retention_has_no_events_scale_join(spark, sf_dir):
    """The collect_set form must not plan a sort-merge join: the only
    |events|-scale movement is the single user-keyed aggregation
    exchange; everything joined afterwards is grid-sized and
    broadcast."""
    from catme_etl_spark.operators.events import events_retention_cohorts
    from catme_etl_spark.plans.explain import executed_plan_str

    plan = executed_plan_str(events_retention_cohorts(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
