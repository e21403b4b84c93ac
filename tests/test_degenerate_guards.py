"""Denominator/overflow guards on DEGENERATE data (round-6 ADVICE).

The sf fixtures never produce an empty stratum, a zero-variance
series, or a 2^60-range id — so the guards added in round 6 can only
be proven on crafted tables, run through BOTH engines (the
`test_session_gap_boundary` pattern): Spark result and DuckDB oracle
must agree row-for-row, including the dropped/NULL rows, on exactly
the inputs where unguarded division diverges (Spark Divide → NULL,
DuckDB IEEE float ops → inf/NaN).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    return path


def _oracle_rows(path, name):
    from catme_etl_spark.operators.registry import ORACLE

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    cur = con.execute(ORACLE[name])
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _compare(spark_df, path, name):
    cols, orows = _oracle_rows(path, name)
    srows = spark_df.select(*cols).collect()
    s = sorted(tuple(_norm(v) for v in r) for r in srows)
    o = sorted(tuple(_norm(v) for v in r) for r in orows)
    assert s == o, f"{name}: spark={s} oracle={o}"
    return s


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _at(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_ks_drops_type_with_empty_half(spark, tmp_path):
    """Type 'lop' has every event before the global midpoint (tb = 0);
    the unguarded D statistic is NULL-vs-inf across engines. Both must
    now DROP the row and keep the balanced type."""
    from catme_etl_spark.operators.stats import agg_ks_drift_halves

    rows = [
        (1, _at(0), 1, "bal", 1.0, "{}"),
        (2, _at(240), 1, "bal", 2.0, "{}"),
        (3, _at(1), 2, "lop", 3.0, "{}"),
        (4, _at(2), 2, "lop", 4.0, "{}"),
    ]
    path = _write_events(spark, tmp_path, rows)
    out = _compare(agg_ks_drift_halves(spark, str(tmp_path)), path, name="agg_ks_drift_halves")
    assert [r[0] for r in out] == ["bal"]


def test_mwu_drops_stratum_missing_one_group(spark, tmp_path):
    """All events on one epoch-day and all 'click' (n_b = 0): the AUC
    denominator is 0. Both engines must return an EMPTY result, not a
    NULL-vs-NaN mismatch."""
    from catme_etl_spark.operators.stats import agg_mann_whitney_u

    rows = [
        (1, _at(0), 1, "click", 1.0, "{}"),
        (2, _at(5), 1, "click", 2.0, "{}"),
    ]
    path = _write_events(spark, tmp_path, rows)
    out = _compare(agg_mann_whitney_u(spark, str(tmp_path)), path, name="agg_mann_whitney_u")
    assert out == []


def test_autocorr_zero_variance_is_null_both_engines(spark, tmp_path):
    """A constant series has zero variance → acf1 NULL on both sides
    (DuckDB would otherwise emit NaN from 0/0)."""
    from catme_etl_spark.operators.timeseries import ts_autocorr_lag1

    rows = [
        # constant across 3 adjacent 10-min buckets
        (1, _at(0), 1, "flat", 5.0, "{}"),
        (2, _at(10), 1, "flat", 5.0, "{}"),
        (3, _at(20), 1, "flat", 5.0, "{}"),
        # a varying series for contrast
        (4, _at(0), 2, "vary", 1.0, "{}"),
        (5, _at(10), 2, "vary", 2.0, "{}"),
        (6, _at(20), 2, "vary", 4.0, "{}"),
    ]
    path = _write_events(spark, tmp_path, rows)
    out = _compare(ts_autocorr_lag1(spark, str(tmp_path)), path, name="ts_autocorr_lag1")
    by_type = {r[0]: r for r in out}
    assert by_type["flat"][-1] == "NULL"
    assert by_type["vary"][-1] != "NULL"


def test_seasonality_constant_values_null_eta(spark, tmp_path):
    """All values identical → total SSE is 0 → η² NULL on both sides."""
    from catme_etl_spark.operators.stats import agg_seasonality_strength

    rows = [
        (1, _at(0), 1, "const", 3.0, "{}"),
        (2, _at(60), 1, "const", 3.0, "{}"),
        (3, _at(120), 1, "const", 3.0, "{}"),
    ]
    path = _write_events(spark, tmp_path, rows)
    out = _compare(
        agg_seasonality_strength(spark, str(tmp_path)),
        path,
        name="agg_seasonality_strength",
    )
    assert out[0][2] == "NULL"  # eta_sq column (cols sorted by SELECT order)


def test_bitwise_huge_and_negative_ids(spark, tmp_path):
    """event_id ≥ 2^60 would overflow Spark's silent-wrap shiftleft vs
    DuckDB's <<; the 60-bit mask makes both engines compute the same
    shifted value. Negative ids (where % and >> diverge cross-engine)
    are excluded by the domain filter on BOTH sides."""
    from catme_etl_spark.operators.scalars import scalar_bitwise_funcs

    huge = (((1 << 61) // 37) + 1) * 37  # multiple of 37, > 2^60
    neg = -37
    rows = [
        (huge, _at(0), 1, "click", 1.0, "{}"),
        (neg, _at(1), 1, "click", 1.0, "{}"),
        (74, _at(2), 1, "click", 1.0, "{}"),
    ]
    path = _write_events(spark, tmp_path, rows)
    out = _compare(scalar_bitwise_funcs(spark, str(tmp_path)), path, name="scalar_bitwise_funcs")
    ids = {r[0] for r in out}
    assert str(huge) in ids and "74" in ids and str(neg) not in ids


@pytest.mark.parametrize("bin_width_cents", [500, 300])
def test_stream_histogram_tie_rule_matches_oracle(spark, bin_width_cents):
    """The explicit floor(x·100+0.5) half-away cents in the streaming
    histogram must equal DuckDB ROUND at EVERY boundary — including an
    odd-cent bin width, where pandas' old half-to-even .round()
    silently diverged. Checked directly on the tie values."""
    import numpy as np

    vals = np.array([2.495, 2.505, 7.495, 4.485, 0.005, 0.015])
    vc = np.floor(vals * 100 + 0.5).astype("int64")
    con = duckdb.connect()
    got = [
        r[0]
        for r in con.execute(
            "SELECT CAST(ROUND(v * 100) AS BIGINT) FROM (SELECT unnest(?) v)",
            [list(map(float, vals))],
        ).fetchall()
    ]
    assert list(vc) == got
    assert list((vc // bin_width_cents).clip(min=0, max=19)) == [
        int(g) // bin_width_cents if g // bin_width_cents <= 19 else 19
        for g in got
    ]


def test_release_family_empty_is_loud_on_both_engines(spark, tmp_path):
    """Round-12 verdict item #3 (the guard-pruning sweep): the release
    manifest's two `raise_error` guards (total_final == 0,
    total_passing == 0) must fire through EVERY consumer of
    `_release_manifest` — diff, gate, and pin select only a subset of
    manifest columns, so if either engine's optimizer pruned the guard
    column (the `events_changepoint_two_level` bug class, fixed commit
    e76ca12) an empty release would ship as a silent 0-share row. The
    guards are structurally load-bearing (groupBy keys of the final
    allocation aggregate, and `fshare` feeds `alloc_tokens`), and this
    pins it: a corpus where decontamination drops everything raises
    'release is empty' on BOTH engines for all three consumers."""
    import pytest

    from catme_etl_spark.operators._shared import clear_shared
    from catme_etl_spark.operators.dedup import (
        pipeline_release_diff,
        pipeline_release_pin,
        quality_release_gate,
    )

    # same degenerate corpus as test_corpus_release_empty_is_loud:
    # both docs are verbatim copies of the eval slice's text, so the
    # decon gram join drops every train doc -> total_final == 0.
    ta = "alpha beta gamma delta epsilon zeta eta theta"
    docs = [(1, ta, "en", "s1", 1), (9, ta, "en", "s1", 1)]
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(out)

    import __spark_entry__ as entry

    for op in (pipeline_release_diff, quality_release_gate, pipeline_release_pin):
        clear_shared()
        try:
            with pytest.raises(Exception, match="release is empty"):
                op(spark, str(tmp_path)).collect()
        finally:
            clear_shared()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{out}/*.parquet'"
    )
    for name in (
        "pipeline_release_diff",
        "quality_release_gate",
        "pipeline_release_pin",
    ):
        with pytest.raises(duckdb.Error, match="release is empty"):
            con.execute(entry.oracle_sql()[name]).fetchall()


def test_release_passing_zero_fires_fshare_guard(spark, tmp_path):
    """The OTHER manifest guard: a release where docs survive
    (total_final > 0) but every survivor fails the passing predicate
    (nt outside [20, 80]) has total_passing == 0 — `fshare` is
    undefined and must raise on BOTH engines even through consumers
    that never select fshare directly (it feeds alloc_tokens, so
    pruning it would be the silent-NULL-allocation lie)."""
    import pytest

    import __spark_entry__ as entry
    from catme_etl_spark.operators._shared import clear_shared
    from catme_etl_spark.operators.dedup import (
        pipeline_corpus_release,
        quality_release_gate,
    )

    # short unique texts (< 20 tokens) -> survive decon (no shared
    # grams with anything) but fail the passing window.
    docs = [
        (1, "quark lepton boson", "en", "s1", 1),
        (2, "meson hadron gluon", "en", "s1", 1),
    ]
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(out)

    for op in (pipeline_corpus_release, quality_release_gate):
        clear_shared()
        try:
            with pytest.raises(Exception, match="release is empty"):
                op(spark, str(tmp_path)).collect()
        finally:
            clear_shared()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{out}/*.parquet'"
    )
    for name in ("pipeline_corpus_release", "quality_release_gate"):
        with pytest.raises(duckdb.Error, match="release is empty"):
            con.execute(entry.oracle_sql()[name]).fetchall()
