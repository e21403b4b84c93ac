"""Brute-force cross-checks of the rank/ECDF statistics on crafted
random tables — the oracle hash proves Spark == DuckDB on the shared
formulation; these prove the formulation itself equals the textbook
O(n²)/O(n log n) definitions (midrank ties, ECDF step handling, half
split), on data with heavy ties and a controlled time axis.
"""

from __future__ import annotations

import datetime as dt
import random


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_mann_whitney_equals_pair_count(spark, tmp_path):
    """U_A from the midrank formulation equals the direct pair count
    #(a>b) + 0.5·#(a==b) over all (click, view) pairs."""
    from catme_etl_spark.operators.stats import agg_mann_whitney_u

    rng = random.Random(7)
    t0 = dt.datetime(2024, 3, 4, 0, 30)  # all inside one epoch day
    rows = []
    for i in range(400):
        et = "click" if i % 2 == 0 else "view"
        # coarse cent grid -> heavy ties, the hard case for midranks
        v = rng.randrange(0, 40) / 4.0
        rows.append(
            (i, t0 + dt.timedelta(seconds=i), i % 17, et, v, "{}")
        )
    _write_events(spark, tmp_path, rows)

    out = agg_mann_whitney_u(spark, str(tmp_path)).collect()
    assert len(out) == 1  # one stratum: a single epoch day
    r = out[0]

    a = [round(v * 100) for (_, _, _, et, v, _) in rows if et == "click"]
    b = [round(v * 100) for (_, _, _, et, v, _) in rows if et == "view"]
    u_brute = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert abs(r["u_a"] - u_brute) < 1e-9, (r["u_a"], u_brute)
    assert abs(r["auc"] - u_brute / (len(a) * len(b))) < 1e-6


def test_ks_equals_numpy_ecdf(spark, tmp_path):
    """The cent-grid KS D equals the direct two-sample sup-distance of
    the empirical CDFs evaluated on the pooled support."""
    from catme_etl_spark.operators.stats import agg_ks_drift_halves

    rng = random.Random(11)
    t0 = dt.datetime(2024, 5, 1)
    rows = []
    for i in range(500):
        # second half drawn from a shifted distribution -> real drift
        half_late = i >= 250
        base = 5.0 if half_late else 3.0
        v = round(rng.gauss(base, 1.5) * 4) / 4.0
        ts = t0 + dt.timedelta(hours=i)  # monotone: clean half split
        rows.append((i, ts, i % 13, "click", v, "{}"))
    _write_events(spark, tmp_path, rows)

    out = agg_ks_drift_halves(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]

    secs = [(ts - t0).total_seconds() for (_, ts, *_rest) in rows]
    mid = (min(secs) + max(secs)) / 2.0
    a = sorted(
        round(v * 100)
        for (i, ts, _, _, v, _) in rows
        if (ts - t0).total_seconds() < mid
    )
    b = sorted(
        round(v * 100)
        for (i, ts, _, _, v, _) in rows
        if (ts - t0).total_seconds() >= mid
    )
    support = sorted(set(a) | set(b))
    d_brute = max(
        abs(
            sum(1 for x in a if x <= s) / len(a)
            - sum(1 for x in b if x <= s) / len(b)
        )
        for s in support
    )
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    assert abs(r["ks_d"] - d_brute) < 1e-6, (r["ks_d"], d_brute)
    assert r["ks_d"] > 0.3  # the planted drift is visible


def test_null_values_cross_engine(spark, tmp_path):
    """NULL event values are out-of-domain for the value statistics —
    pinned by driving a crafted table WITH nulls (absent from the sf
    fixtures) through both engines: KS half-split bounds must come
    from non-null rows only, and an all-NULL bucket must interpolate
    as a gap, not anchor as an observation."""
    import duckdb

    from catme_etl_spark.operators.registry import ORACLE
    from catme_etl_spark.operators.stats import agg_ks_drift_halves
    from catme_etl_spark.operators.timeseries import ts_interpolate_linear

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        # NULL rows at the extreme timestamps: if they leaked into the
        # KS bounds, mid (and the halves) would shift
        (0, t0 - dt.timedelta(hours=5), 1, "click", None, "{}"),
        (99, t0 + dt.timedelta(hours=50), 1, "click", None, "{}"),
    ]
    # observed buckets at 0 and 30 minutes; the 10-20min buckets carry
    # ONLY null values -> must come out as interpolated gaps
    rows += [
        (1, t0, 1, "click", 10.0, "{}"),
        (2, t0 + dt.timedelta(minutes=10), 1, "click", None, "{}"),
        (3, t0 + dt.timedelta(minutes=30), 1, "click", 40.0, "{}"),
    ]
    rows += [
        (i + 10, t0 + dt.timedelta(hours=i), 2, "click", float(i % 7), "{}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )

    from catme_etl_spark.operators.timeseries import (
        ts_rolling_median_close,
        ts_seasonal_naive_backtest,
    )

    for name, fn in (
        ("agg_ks_drift_halves", agg_ks_drift_halves),
        ("ts_interpolate_linear", ts_interpolate_linear),
        ("ts_rolling_median_close", ts_rolling_median_close),
        ("ts_seasonal_naive_backtest", ts_seasonal_naive_backtest),
    ):
        got = {
            tuple(str(x) for x in r) for r in fn(spark, str(tmp_path)).collect()
        }
        want = {
            tuple(str(x) for x in r) for r in con.execute(ORACLE[name]).fetchall()
        }
        assert got == want, (name, got ^ want)

    # and the gap really interpolates: the t0 bucket averages the 10.0
    # doc with user 2's colliding 0.0 event (mean 5.0), so the two
    # NULL-only buckets take the 5.0 -> 40.0 line, NOT anchor values
    out = {
        (r["win_start_us"], r["src"], r["value_filled"])
        for r in ts_interpolate_linear(spark, str(tmp_path)).collect()
    }
    base_us = int(t0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    step = 600 * 1_000_000
    assert (base_us, "obs", 5.0) in out
    assert (base_us + step, "interp", 16.6667) in out
    assert (base_us + 2 * step, "interp", 28.3333) in out
