"""Statistical aggregates (SURVEY §2.4 EXT): correlation, covariance,
dispersion, and shape moments over the fact tables.

The reference computes no statistics of any kind (its only reductions
are row counts and byte sizes, `unified_code.py:187,380-388`); this is
driver-contract query surface.

Cross-engine float discipline: these are ratio-of-moments quantities,
so exact integer-cents tricks don't apply. Both engines accumulate
doubles in (potentially) different orders, giving ~1e-12 relative
drift — ROUND(…, 3) leaves ≥9 orders of magnitude of margin.
Definitional parity matters more: Spark's ``skewness`` is the
*population* g1 = m3/m2^1.5 while DuckDB's is the *sample*-adjusted
G1 = g1·√(n(n−1))/(n−2); the oracle converts explicitly rather than
pretending they're the same function. The oracle's ``+ 0.0`` maps IEEE
−0.0 to +0.0: DuckDB's ROUND preserves the sign of zero, Spark's does
not, and a near-zero correlation rounds to signed zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


@query(
    "agg_stats_lineitem_by_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(corr(l_quantity, l_extendedprice), 3) + 0.0 AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 3) + 0.0 AS covar_qty_price,
           ROUND(stddev_samp(l_extendedprice), 3) + 0.0 AS std_price,
           ROUND(var_samp(l_quantity), 3) + 0.0 AS var_qty,
           ROUND(skewness(l_extendedprice)
                 * (COUNT(*) - 2)
                 / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 3) + 0.0 AS skew_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_lineitem_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flag second/third-moment statistics in ONE hash-agg pass —
    Spark's moment aggregates are single-pass streaming (Welford-style)
    with map-side partials, so a 100-TB scan shuffles one small moment
    state per group, never raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 3).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias(
                "covar_qty_price"
            ),
            F.round(F.stddev_samp("l_extendedprice"), 3).alias("std_price"),
            F.round(F.var_samp("l_quantity"), 3).alias("var_qty"),
            # Spark skewness = population g1; DuckDB converts on its side
            F.round(F.skewness("l_extendedprice"), 3).alias("skew_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count states (SURVEY §2.4 EXT): the pre-aggregation
# pattern behind every 100 TB dashboard — partial states that REAGGREGATE
# across days/partitions, where COUNT(DISTINCT) would need the raw rows
# again.
# ---------------------------------------------------------------------------


@query(
    "agg_bitmap_distinct_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event type from mergeable bitmap
    partials: day-level bitmaps (`bitmap_construct_agg` over
    `bitmap_bit_position`, bucketed by `bitmap_bucket_number`) are
    OR-merged across days, then `bitmap_count` + sum gives the exact
    total. One scan, three strictly-shrinking shuffles
    (type×day×bucket partials → type×bucket merge → type sum).

    Why this matters at 100 TB: the day-level bitmap table is a tiny
    materializable artifact that answers distinct-count queries over
    ANY date range by re-merging — COUNT(DISTINCT) forces a full
    rescan of raw events per question. Exactness (unlike HLL) makes it
    oracle-checkable end to end."""
    ev = load_table(spark, sf_dir, "events")
    partial = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.bitmap_bucket_number("user_id").alias("bkt"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    per_bkt = partial.groupBy("event_type", "bkt").agg(
        F.bitmap_count(F.bitmap_or_agg("bm")).alias("n_bkt")
    )
    return per_bkt.groupBy("event_type").agg(
        F.sum("n_bkt").cast("long").alias("distinct_users")
    )


@query(
    "agg_hll_union_rollup",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bounds
    FROM events GROUP BY event_type
    """,
)
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches `hll_sketch_agg`): one
    sketch per (event_type, day), `hll_union_agg`-merged to a per-type
    estimate — the approximate sibling of the bitmap rollup for key
    spaces too wide for bitmaps. Validated like
    `agg_approx_distinct_bounds`: the output carries the exact count
    (oracle-matched) plus a boolean asserting the merged estimate
    lands within 5% — the sketch value is engine-specific but
    deterministic, so estimator drift hash-mismatches instead of
    hiding behind a rows-only check. The exact branch rescans events
    by construction (that is the point being demonstrated: the sketch
    table answers without the rescan)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    est = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("_est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_bounds"),
    )
