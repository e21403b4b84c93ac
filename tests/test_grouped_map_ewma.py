"""grouped_map_user_ewma after the r14 optimization: the per-key
recurrence runs over a JVM-packed, array_sort-ordered history with ONE
vectorized Python boundary — no per-group pandas frames — and the FP
sequence (0.2*x + 0.8*y) is the oracle's recursive CTE exactly."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from catme_etl_spark.operators.udfs import grouped_map_user_ewma


def test_ewma_matches_hand_computed_recurrence(spark, sf_dir, tmp_path):
    base = datetime.datetime(2031, 1, 1)
    rows = [
        # user 1: out-of-order arrival; recurrence must follow (ts, event_id)
        (1, base + datetime.timedelta(minutes=2), 3, 10.0),
        (1, base + datetime.timedelta(minutes=1), 2, 4.0),
        (1, base + datetime.timedelta(minutes=0), 1, 2.0),
        # user 2: single event -> seed only
        (2, base, 4, 7.25),
        # user 3: equal ts, event_id breaks the tie
        (3, base, 6, 1.0),
        (3, base, 5, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    # single-file layout like the fixtures
    import os

    part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    os.replace(os.path.join(out, part), os.path.join(flat, "events.parquet"))

    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in grouped_map_user_ewma(spark, flat).collect()
    }

    def rec(vals):
        y = vals[0]
        for x in vals[1:]:
            y = 0.2 * x + 0.8 * y
        return y

    import math

    def r6(v):
        return math.floor(v * 10**6 + 0.5) / 10**6 if v >= 0 else round(v, 6)

    assert got[1] == (3, r6(rec([2.0, 4.0, 10.0])))
    assert got[2] == (1, r6(7.25))
    assert got[3] == (2, r6(rec([5.0, 1.0])))


def test_ewma_plan_has_no_per_group_python(spark, sf_dir):
    plan = (
        grouped_map_user_ewma(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "ArrowEvalPython" in plan  # exactly one vectorized crossing
