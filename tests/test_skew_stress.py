"""Pathological-skew stress for the keyed-window / CC / join family
(round-6 item #5). The sf fixtures are uniform; these tests craft a
hot key owning ~30% of all rows — the shape that melts a 100 TB job —
and prove three things:

- the heavy keyed-window queries still MATCH the DuckDB oracle on the
  skewed table (correctness is key-distribution-independent);
- connected-components labels are exact on a star graph (the skewed
  topology: one hub, thousands of spokes) on BOTH tiers — the
  union-find fast path and the distributed propagation loop;
- the two skew mitigations actually engage: AQE splits the oversized
  shuffle partition (plan shows skew=true) and `salted_join` spreads
  the hot key across salt buckets with identical join results.
"""

from __future__ import annotations

import datetime as dt

import duckdb

from pyspark.sql import functions as F

HOT_USER = 7
N_USERS = 60
N_EVENTS = 9000  # hot user owns ~30%


def _skewed_events(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    types = ["view", "click", "purchase"]
    for i in range(N_EVENTS):
        user = HOT_USER if i % 10 < 3 else (i * 131) % N_USERS + 100
        # hot user fires every ~40s (continuous session churn); cold
        # users are sparse so their 30-min session gaps actually split
        ts = t0 + dt.timedelta(seconds=40 * i if user == HOT_USER else 977 * i)
        rows.append(
            (i, ts, user, types[i % 3], float((i % 997) + 0.25), "{}")
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(path)
    return path


def _oracle(path, name):
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


def _assert_matches(spark_df, path, name):
    cols, orows = _oracle(path, name)
    srows = spark_df.select(*cols).collect()
    s = sorted(tuple(_norm(v) for v in r) for r in srows)
    o = sorted(tuple(_norm(v) for v in r) for r in orows)
    assert len(s) > 0, f"{name}: empty result on the skewed fixture"
    assert s == o, f"{name} diverged on skewed data (first spark row {s[:1]})"


def test_gaps_islands_matches_oracle_on_hot_user(spark, tmp_path):
    from catme_etl_spark.operators.windows import (
        window_gaps_islands_user_activity,
    )

    path = _skewed_events(spark, tmp_path)
    _assert_matches(
        window_gaps_islands_user_activity(spark, str(tmp_path)),
        path,
        "window_gaps_islands_user_activity",
    )


def test_latency_quartiles_match_oracle_on_hot_user(spark, tmp_path):
    from catme_etl_spark.operators.events import (
        events_conversion_latency_quartiles,
    )

    path = _skewed_events(spark, tmp_path)
    _assert_matches(
        events_conversion_latency_quartiles(spark, str(tmp_path)),
        path,
        "events_conversion_latency_quartiles",
    )


def test_cc_star_graph_exact_on_both_tiers(spark, tmp_path):
    """One hub connected to 3000 spokes (the max-skew topology for
    label propagation: every edge touches the same vertex) plus a
    10-node chain. Expected labels are trivial to state; both the
    union-find fast path and the distributed loop must produce them
    bit-identically."""
    from catme_etl_spark.operators.dedup import propagate_min_labels

    n_spokes = 3000
    edges = [(0, i) for i in range(1, n_spokes + 1)]
    chain = [(10_000 + i, 10_001 + i) for i in range(9)]
    vertices = spark.createDataFrame(
        [(v,) for v in range(n_spokes + 1)]
        + [(10_000 + i,) for i in range(10)]
        + [(99_999,)],  # isolated vertex: its own component
        "id long",
    )
    pairs = spark.createDataFrame(edges + chain, "a long, b long")

    fast = propagate_min_labels(vertices, pairs, reliable=False)
    got_fast = {r.id: r.component for r in fast.collect()}

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck"))
    loop = propagate_min_labels(vertices, pairs, reliable=True)
    got_loop = {r.id: r.component for r in loop.collect()}

    expected = {v: 0 for v in range(n_spokes + 1)}
    expected.update({10_000 + i: 10_000 for i in range(10)})
    expected[99_999] = 99_999
    assert got_fast == expected
    assert got_loop == expected


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    """With the skew thresholds lowered to fixture scale (the
    mechanism demo, same approach as the runtime-bloom test), a
    sort-merge self-join on the skewed user_id must come back from
    AQE with the hot partition SPLIT (skew=true in the final plan) and
    the aggregate unchanged."""
    from catme_etl_spark.plans.explain import executed_plan_str

    _skewed_events(spark, tmp_path)
    e = spark.read.parquet(str(tmp_path / "events.parquet"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # the downstream groupBy needs the join's hash partitioning, so
        # splitting the hot partition costs an extra shuffle — AQE
        # declines by default; this opts into split-then-reshuffle
        # (the right trade when one straggler partition IS the job)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        a = e.select(F.col("user_id"), F.col("event_id").alias("ea"))
        b = e.select(F.col("user_id"), F.col("event_id").alias("eb"))
        j = a.join(b, "user_id").groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        got = {r.user_id: r.n for r in j.collect()}
        hot = e.filter(F.col("user_id") == HOT_USER).count()
        assert got[HOT_USER] == hot * hot
        assert "skew=true" in executed_plan_str(j)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_spreads_hot_key_same_results(spark, tmp_path):
    """salted_join on the skewed table: per-user join results identical
    to the plain join, and no (key, salt) bucket holds more than
    ~1/n_salt of the hot key's rows (the salt actually spreads)."""
    from catme_etl_spark.operators.skew import salted_join

    _skewed_events(spark, tmp_path)
    e = spark.read.parquet(str(tmp_path / "events.parquet"))
    dim = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_total"))

    plain = (
        e.join(dim, "user_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("user_total").alias("t"))
    )
    salted = salted_join(e, dim, on="user_id", n_salt=8, salt_src="event_id")
    salted_agg = salted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("user_total").alias("t")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted_agg.collect())
    )

    hot_per_bucket = (
        e.filter(F.col("user_id") == HOT_USER)
        .groupBy(
            # the identical salt expression salted_join derives
            F.pmod(F.xxhash64(F.col("event_id")), F.lit(8)).alias("s")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    hot_total = sum(r.n for r in hot_per_bucket)
    assert len(hot_per_bucket) == 8
    assert max(r.n for r in hot_per_bucket) < hot_total * 0.25
