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


@query(
    "asof_nearest_purchase",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS p_id, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT c.event_id, c.user_id,
             abs(epoch_us(p.pts) - epoch_us(c.ts)) AS gap_us,
             p.p_id, p.pts
      FROM c JOIN p
        ON c.user_id = p.user_id
       AND p.pts BETWEEN c.ts - INTERVAL 240 MINUTE
                     AND c.ts + INTERVAL 240 MINUTE
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_id ORDER BY gap_us, pts, p_id) AS rn
      FROM cand
    )
    SELECT event_id AS click_id, user_id,
           p_id AS purchase_id, gap_us // 1000000 AS gap_s
    FROM r WHERE rn = 1
    """,
)
def asof_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of (bidirectional): each click matched to
    the temporally closest purchase by the same user within ±4 hours — the variant backward-only ASOF can't express (attribution
    windows span both directions). Equi-join on user_id carries the
    time predicate as a post-join filter — the join key does the heavy
    lifting, so the shuffle is the plain per-user hash join AQE can
    skew-split; top-1-per-click is a keyed window with a total
    (gap, ts, id) order so ties resolve identically cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    gap_us = F.abs(F.unix_micros("pts") - F.unix_micros("ts"))
    cand = (
        c.join(p, F.col("user_id") == F.col("p_user"))
        .filter(gap_us <= 14_400_000_000)
        .select("event_id", "user_id", gap_us.alias("gap_us"), "p_id", "pts")
    )
    w = Window.partitionBy("event_id").orderBy("gap_us", "pts", "p_id")
    return (
        cand.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("p_id").alias("purchase_id"),
            F.expr("gap_us div 1000000").alias("gap_s"),
        )
    )


@query(
    "asof_backward_tolerance_1h",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT event_id AS p_id, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    cand AS (
      SELECT c.event_id, p.p_id,
             epoch_us(c.ts) - epoch_us(p.pts) AS stale_us
      FROM c JOIN p
        ON c.user_id = p.user_id
       AND p.pts <= c.ts
       AND p.pts >= c.ts - INTERVAL 60 MINUTE
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY event_id ORDER BY stale_us, p_id) AS rn
      FROM cand
    )
    SELECT c.event_id AS click_id, c.user_id,
           r.p_id AS purchase_id,
           r.stale_us // 1000 AS staleness_ms
    FROM c LEFT JOIN (SELECT * FROM r WHERE rn = 1) r
      ON r.event_id = c.event_id
    """,
)
def asof_backward_tolerance_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness point-in-time lookup — the feature-store
    freshness SLA: each click joined to the user's most recent
    purchase no older than ONE HOUR, NULL when the freshest available
    feature is stale (instead of silently attaching a week-old value,
    which is what an unbounded backward as-of does). The tolerance
    variant of `asof_nearest_purchase` / `join_point_in_time_priority`.

    Same 100-TB shape as the other as-of operators: the equi-join on
    user_id carries the shuffle (AQE can skew-split it), the staleness
    window is a post-join filter, top-1 is a keyed window with a total
    (staleness, id) order, and the LEFT join back preserves the
    no-match clicks — exactly the rows the SLA monitor counts.
    """
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    stale_us = F.unix_micros("ts") - F.unix_micros("pts")
    cand = (
        c.join(p, F.col("user_id") == F.col("p_user"))
        .filter((F.col("pts") <= F.col("ts")) & (stale_us <= 3_600_000_000))
        .select(F.col("event_id").alias("m_id"), stale_us.alias("stale_us"), "p_id")
    )
    w = Window.partitionBy("m_id").orderBy("stale_us", "p_id")
    best = (
        cand.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
    )
    return c.join(best, F.col("event_id") == F.col("m_id"), "left").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("p_id").alias("purchase_id"),
        F.expr("stale_us div 1000").alias("staleness_ms"),
    )
