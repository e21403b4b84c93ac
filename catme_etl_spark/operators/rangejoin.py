"""Banded range/interval join (SURVEY §2.3 J5 done right at scale).

A condition like ``|a.ts - b.ts| <= W`` is a theta-join: Spark's only
generic plan is a broadcast-nested-loop over the cross product — O(n·m)
and interpreted. The scale fix is BANDING: bucket both sides by
``floor(ts / W)``; any qualifying pair's buckets differ by at most 1,
so joining on (key, bucket) with the probe side exploded to
{bucket-1, bucket, bucket+1} turns the theta-join into a hash
EQUI-join, then the exact predicate filters the ~3× candidate set.
Cost drops from |L|×|R| per key to Σ bucket-pair sizes; the plan
becomes a plain shuffled hash join that AQE can size and skew-split.

tests/test_plans.py-style guarantee: the oracle runs DuckDB's direct
inequality join, so banding provably loses no pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delta_us: int,
) -> DataFrame:
    """Pairs (l, r) sharing ``on`` with |l.ts - r.ts| <= max_delta_us.
    Timestamps are compared as epoch-micro longs. Both inputs keep all
    their columns; the right side's are suffixed ``_r`` on collision.
    """
    lcol = set(left.columns)
    rren = right
    for c in right.columns:
        if c in lcol and c != on:
            rren = rren.withColumnRenamed(c, c + "_r")
    rts = right_ts + ("_r" if right_ts in lcol and right_ts != on else "")

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(rts))
    lb = left.withColumn("_lus", l_us).withColumn(
        "_band", F.floor(F.col("_lus") / max_delta_us)
    )
    rb = rren.withColumn("_rus", r_us).withColumn(
        "_band0", F.floor(F.col("_rus") / max_delta_us)
    )
    rb = rb.withColumn(
        "_band", F.explode(F.array(F.col("_band0") - 1, F.col("_band0"), F.col("_band0") + 1))
    ).drop("_band0")
    out = lb.join(rb, [on, "_band"]).filter(
        F.abs(F.col("_lus") - F.col("_rus")) <= max_delta_us
    )
    return out.drop("_band", "_lus", "_rus")


@query(
    "rangejoin_view_near_purchase",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS delta_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.user_id
     AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= 600000000
    """,
)
def rangejoin_view_near_purchase(spark, sf_dir: str) -> DataFrame:
    """Views within ±10 min of a purchase by the same user — the
    banded equi-join plan; the oracle's direct inequality join proves
    no pair is lost at the band edges."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    j = banded_interval_join(
        views, purchases, on="user_id", left_ts="ts", right_ts="ts",
        max_delta_us=600_000_000,
    )
    return j.select(
        "view_id",
        "purchase_id",
        "user_id",
        (F.unix_micros(F.col("ts_r")) - F.unix_micros(F.col("ts"))).alias("delta_us"),
    )
