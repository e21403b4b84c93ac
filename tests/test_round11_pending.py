"""Crafted-table tests for the round-11 debut queue (held in
registry.pending_query; see tests/test_ordering.py for the flip
discipline). Each op is runnable and oracle-carrying; these pin the
closed-form/boundary semantics the fixtures never exercise."""

from __future__ import annotations

import datetime as dt

import duckdb

import __spark_entry__ as entry


def _oracle(con, name):
    from catme_etl_spark.operators.registry import PENDING_ORACLE

    sql = entry.oracle_sql().get(name) or PENDING_ORACLE[name]
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _write_events(spark, tmp_path, rows):
    out = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.parquet(out)
    return out


def _con(view, path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {view} AS SELECT * FROM '{path}/*.parquet'")
    return con


def test_latency_alert_both_branches(spark, tmp_path):
    """One sealed conversion per day, hand-computed buckets: day A's
    5-minute latency lands in the 2^29-1 bucket (under the 20-min SLA,
    alert 0); day B's 25-minute latency lands in 2^31-1 (alert 1). A
    lone far-future anchor seals both sessions and is itself absent
    (no view->purchase pair)."""
    from catme_etl_spark.streaming.jobs import stream_latency_alert_daily

    d0 = dt.datetime(2024, 1, 1)
    d1 = dt.datetime(2024, 1, 2)
    rows = [
        (1, d0, "view", 1.0),
        (1, d0 + dt.timedelta(minutes=5), "purchase", 1.0),
        (2, d1, "view", 1.0),
        (2, d1 + dt.timedelta(minutes=25), "purchase", 1.0),
        (9, dt.datetime(2024, 1, 5), "click", 1.0),  # seal anchor, open
    ]
    out = _write_events(spark, tmp_path, rows)
    got = _spark_rows(stream_latency_alert_daily(spark, str(tmp_path)))
    con = _con("events", out)
    assert got == _oracle(con, "stream_latency_alert_daily")
    day_us = 86_400_000_000
    e0 = int(d0.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    # 5 min = 3.0e8 us -> bin length 29 -> hi 2^29-1; 25 min = 1.5e9 us
    # -> bin length 31 -> hi 2^31-1 > 1.2e9 SLA
    assert got == [
        (e0, 1, (1 << 29) - 1, (1 << 29) - 1, 0),
        (e0 + day_us, 1, (1 << 31) - 1, (1 << 31) - 1, 1),
    ]


def test_latency_alert_unsealed_day_absent(spark, tmp_path):
    """A conversion whose session is NOT yet sealed (its session end is
    within watermark + gap of max ts) must be absent from the verdict
    on both engines — the append-mode contract."""
    from catme_etl_spark.streaming.jobs import stream_latency_alert_daily

    d0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, d0, "view", 1.0),
        (1, d0 + dt.timedelta(minutes=5), "purchase", 1.0),
        # max ts only 1h after the session end: seal needs end + 30min
        # <= max - 1h, so this session stays open
        (9, d0 + dt.timedelta(minutes=65), "click", 1.0),
    ]
    out = _write_events(spark, tmp_path, rows)
    got = _spark_rows(stream_latency_alert_daily(spark, str(tmp_path)))
    con = _con("events", out)
    assert got == _oracle(con, "stream_latency_alert_daily")
    assert got == []
