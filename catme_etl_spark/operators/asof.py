"""As-of join (SURVEY §2.3 extension; the classic time-series operator
Spark lacks natively): for each left row, the single right row with the
greatest timestamp ≤ the left timestamp, per key.

Implemented as a composition of built-in ops (option (a) of the custom-
operator ladder): tag both streams, UNION them, and take a running
``last(..., ignorenulls)`` over a (key, time) window. One shuffle on
the key, sort within partitions — exactly the distributed merge-join
shape a dedicated as-of implementation would use, and AQE handles
skewed keys. No Python in the path.

DuckDB has native ``ASOF JOIN``, which the oracle uses — so the
composition is verified against a reference implementation of the real
semantics, including the tie rule (a right row at exactly the left
timestamp matches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Generic as-of join: attach to each ``left`` row the latest
    ``right`` row (per ``on`` key) with ``right_ts <= left_ts``.

    ``value_cols`` are the right-side columns to carry (default: just
    the right timestamp). Right rows sort BEFORE left rows on timestamp
    ties so an equal-timestamp right row is visible to the left row.
    """
    value_cols = value_cols or []
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_mk"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix)
          for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(right_ts + suffix),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c != on else F.col(on)
          for c in lcols],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_mk"),
        *[F.col(c).alias(c + suffix) for c in value_cols],
        F.col(right_ts).alias(right_ts + suffix),
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_t"), F.col("_mk"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        *lcols,
        "_mk",
        *[
            F.last(F.when(F.col("_mk") == 0, F.col(c + suffix)), ignorenulls=True)
            .over(w)
            .alias(c + suffix)
            for c in value_cols
        ],
        F.last(F.when(F.col("_mk") == 0, F.col(right_ts + suffix)), ignorenulls=True)
        .over(w)
        .alias(right_ts + suffix),
    )
    return matched.filter(F.col("_mk") == 1).drop("_mk")


def _us(c: Column) -> Column:
    return F.unix_micros(c)


@query(
    "asof_click_last_purchase",
    oracle="""
    SELECT e.event_id, e.user_id,
           epoch_us(e.ts) AS ts_us,
           epoch_us(p.ts) AS purchase_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    """,
)
def asof_click_last_purchase(spark, sf_dir: str) -> DataFrame:
    """Every click matched to the user's most recent purchase at or
    before it (NULL if none yet) — attribution, the canonical as-of."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    out = asof_join(clicks, purchases, on="user_id")
    return out.select(
        "event_id",
        "user_id",
        _us(F.col("ts")).alias("ts_us"),
        _us(F.col("ts_asof")).alias("purchase_ts_us"),
    )
