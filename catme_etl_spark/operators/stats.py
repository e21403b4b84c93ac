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
