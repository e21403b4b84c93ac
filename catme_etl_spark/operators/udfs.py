"""The UDF surface (SURVEY §2.10 F7): every Python extension mechanism
the engine supports, each demonstrated on a driver table with a SQL
oracle where expressible.

Tiers, fastest first — this ordering IS the guidance:

1. built-in column expressions (everything else in this repo) — JVM,
   codegen, zero Python;
2. ``pandas_udf`` — Arrow-batched vectorized Python; ~10-100× faster
   than row UDFs; the right tier for numpy math on columns;
2b. grouped-agg ``pandas_udf`` (Series → scalar) — a vectorized custom
   aggregate usable inside ``groupBy().agg``; shuffles raw rows (no
   partial aggregation), so built-in decompositions still win;
3. ``applyInPandas`` (grouped map) — the Python UDAF/UDTF substitute:
   whole group in, DataFrame out, one shuffle on the key;
4. row-at-a-time ``F.udf`` — pickled per row; LAST RESORT, kept here
   as the mechanism demo (and a measuring stick).

A pivot demo rides along (grouped pivot = conditional aggregation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Tier 2: vectorized pandas UDF.
# ---------------------------------------------------------------------------


def _logistic_udf():
    import numpy as np

    def logistic(n_chars):
        x = (n_chars.to_numpy(dtype="float64") - 150.0) / 30.0
        return pd.Series(1.0 / (1.0 + np.exp(-x)))

    logistic.__annotations__ = {"n_chars": pd.Series, "return": pd.Series}
    return F.pandas_udf(logistic, "double")


@query(
    "udf_pandas_logistic_score",
    oracle="""
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-(CAST(n_chars AS DOUBLE) - 150.0) / 30.0)), 4)
               AS score
    FROM documents
    """,
)
def udf_pandas_logistic_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched logistic 'quality' score over n_chars: whole
    batches hit numpy at once; no per-row Python."""
    d = load_table(spark, sf_dir, "documents")
    udf = _logistic_udf()
    return d.select("doc_id", F.round(udf(F.col("n_chars")), 4).alias("score"))


def _gmean_udf():
    import numpy as np

    def gmean(v):
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    gmean.__annotations__ = {"v": pd.Series, "return": float}
    return F.pandas_udf(gmean, "double")


@query(
    "udf_grouped_agg_gmean",
    oracle="""
    SELECT o_orderstatus,
           ROUND(exp(AVG(ln(CAST(o_totalprice AS DOUBLE)))), 4) AS gmean_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def udf_grouped_agg_gmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized custom AGGREGATE (grouped-agg pandas UDF): Series in,
    scalar out, usable directly inside ``groupBy().agg`` alongside
    built-ins — the missing rung between scalar pandas UDFs and full
    grouped-map. Geometric mean of order value per status (exp of the
    log-mean: overflow-safe for products of thousands of prices).

    Plan shape: the grouped-agg UDF cannot partial-aggregate (whole
    group's values must reach one Python worker), so it shuffles raw
    rows where a built-in would shuffle partial states — the documented
    cost of this tier, and why the log-sum decomposition (avg ∘ ln via
    built-ins, then exp) is the preferred form when the aggregate
    happens to decompose; this entry demonstrates the mechanism for
    aggregates that genuinely don't. (Engine restriction, worth
    knowing: a grouped-agg pandas UDF cannot share one ``agg`` with
    built-in aggregates — mixed aggregations need two passes joined on
    the key.)"""
    o = load_table(spark, sf_dir, "orders")
    gm = _gmean_udf()
    return o.groupBy("o_orderstatus").agg(
        F.round(gm(F.col("o_totalprice").cast("double")), 4).alias("gmean_price")
    )


# ---------------------------------------------------------------------------
# Tier 3: grouped map (applyInPandas) — the Python-UDAF substitute.
# ---------------------------------------------------------------------------


@query(
    "grouped_map_user_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                 AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(*) + 1 AS n_events,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST((200 * SUM(gap_us) + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 100
               AS avg_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def grouped_map_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap stats via ``applyInPandas``: each user's
    full history arrives as one pandas frame (shuffle on user_id —
    same cost shape as any keyed agg), and arbitrary Python computes
    the aggregate. Users with < 2 events are skipped (no gaps)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts")

    def gaps(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                columns=["user_id", "n_events", "max_gap_us", "avg_gap_us"]
            )
        ts = pdf["ts"].sort_values().astype("int64")  # ns
        d_us = (ts.diff().dropna() // 1000).to_numpy()
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "max_gap_us": [int(d_us.max())],
                # half-up rounding in EXACT integer math: float means
                # drift by summation order, and Python's round() is
                # half-even while SQL ROUND is half-away — integers
                # sidestep both
                "avg_gap_us": [
                    ((200 * int(d_us.sum()) + len(d_us)) // (2 * len(d_us))) / 100
                ],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        gaps, schema="user_id long, n_events long, max_gap_us long, avg_gap_us double"
    )


# ---------------------------------------------------------------------------
# Tier 4: row-at-a-time Python UDF — the mechanism, and the warning.
# ---------------------------------------------------------------------------


@query(
    "udf_python_reverse",
    oracle="""
    SELECT doc_id, reverse(lang) AS gnal
    FROM documents
    """,
)
def udf_python_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time UDF registration demo (F.udf). Deliberately on a
    tiny column of a small table: per-row pickling makes this tier
    ~100× slower than builtins — never put it on the 100 TB hot path
    (F.reverse exists; the UDF is the point here, not the reverse)."""
    d = load_table(spark, sf_dir, "documents")
    rev = F.udf(lambda s: None if s is None else s[::-1], StringType())
    return d.select("doc_id", rev(F.col("lang")).alias("gnal"))


# ---------------------------------------------------------------------------
# Pivot (grouped pivot = conditional aggregation under the hood).
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_type_counts_by_bucket",
    oracle=f"""
    SELECT user_id % 10 AS bucket,
           {", ".join(
               f"COUNT(*) FILTER (event_type = '{t}') AS n_{t}"
               for t in _EVENT_TYPES
           )}
    FROM events
    GROUP BY user_id % 10
    """,
)
def pivot_type_counts_by_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().pivot(values).count()`` with the pivot values given
    explicitly — at scale never let Spark run the extra distinct job to
    discover them."""
    e = load_table(spark, sf_dir, "events")
    p = (
        e.groupBy((F.col("user_id") % 10).alias("bucket"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return p.select(
        "bucket", *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES]
    )


# ---------------------------------------------------------------------------
# Tier 3b: co-grouped map (two tables' groups side by side in pandas).
# ---------------------------------------------------------------------------


@query(
    "cogroup_customer_order_lineitem",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
             ROUND(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2)
                 AS total_spent
      FROM orders GROUP BY o_custkey
    ),
    l AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_custkey
    )
    SELECT o.custkey, n_orders, total_spent, COALESCE(n_lines, 0) AS n_lines
    FROM o LEFT JOIN l USING (custkey)
    """,
)
def cogroup_customer_order_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup().applyInPandas``: both tables shuffle once on the key
    and each task receives the customer's orders AND its lineitems as
    two aligned pandas frames — the two-input custom-aggregation shape
    (a Python FULL OUTER merge-combine) that a join + UDAF can't express
    in one pass. Integer-cents sum keeps the pandas float sum exact."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        (F.round(F.col("o_totalprice") * 100, 0)).cast("long").alias("cents"),
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .join(
            load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("custkey"))
    )

    def combine(key, orders_pdf, lines_pdf):
        custkey = key[0]
        return pd.DataFrame(
            {
                "custkey": [custkey],
                "n_orders": [len(orders_pdf)],
                "total_spent": [round(orders_pdf["cents"].sum() / 100.0, 2)],
                "n_lines": [len(lines_pdf)],
            }
        )

    return (
        o.groupBy("custkey")
        .cogroup(li.groupBy("custkey"))
        .applyInPandas(
            combine,
            schema="custkey long, n_orders long, total_spent double, n_lines long",
        )
    )


# ---------------------------------------------------------------------------
# Tier 3c: Python UDTF (one row in, many rows out, arbitrary logic).
# ---------------------------------------------------------------------------


@query(
    "udtf_sentence_split",
    oracle="""
    SELECT doc_id,
           CAST(pos AS INTEGER) - 1 AS sent_idx,
           trim(s) AS sentence
    FROM (
      SELECT doc_id, unnest(string_split(text, '.')) AS s,
             generate_subscripts(string_split(text, '.'), 1) AS pos
      FROM documents
    )
    WHERE trim(s) <> ''
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): each document row expands to one
    row per sentence with its index — the lateral-view shape with
    arbitrary Python inside. Built-ins could express this split (and
    would be faster); the UDTF is the mechanism demo for expansions
    that genuinely need Python (parsers, tokenizers, decoders). Runs
    narrow: no shuffle, expansion happens map-side."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, sent_idx: int, sentence: string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            idx = 0
            for part in (text or "").split("."):
                s = part.strip()
                if s:
                    yield doc_id, idx, s
                    idx += 1

    d = load_table(spark, sf_dir, "documents")
    spark.udtf.register("sentence_split", SentenceSplit)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT s.* FROM docs_for_udtf, "
        "LATERAL sentence_split(doc_id, text) s"
    )


@query(
    "grouped_map_user_ewma",
    oracle="""
    WITH RECURSIVE o AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    ),
    rec AS (
      SELECT user_id, rn, n, value AS ewma FROM o WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.n, 0.2 * o.value + 0.8 * rec.ewma
      FROM rec JOIN o ON o.user_id = rec.user_id AND o.rn = rec.rn + 1
    )
    SELECT user_id, n AS n_events,
           ROUND(ewma, 6) + 0.0 AS ewma_value
    FROM rec WHERE rn = n
    """,
)
def grouped_map_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE recursive EWMA (adjust=False: y_t = αx_t + (1−α)y_{t−1},
    seeded y_1 = x_1, α = 0.2) — the canonical per-key sequential state
    Spark's window algebra cannot express (no recursive frames).

    The per-key history is packed JVM-side — ``collect_list`` of
    (ts, event_id, value) structs with map-side partial aggregation,
    then ``array_sort`` (event_id is unique in the fixture schema, so
    (ts, event_id) fully orders the struct and the trailing ``value``
    field never breaks a tie) — and ONE vectorized pandas UDF runs the
    recurrence per packed array. This replaces the earlier per-group
    ``applyInPandas`` form (kept as the ladder demo on
    `grouped_map_user_gaps`): shipping every row into a fresh pandas
    frame per user cost ~2.7 ms × |users| of pure per-group overhead —
    measured 4.1 s vs 0.67 s at sf0.1 for bit-identical output (guide
    §2.3/§4.1: aggregate JVM-side before crossing the Python
    boundary). One shuffle on the key either way.

    The recurrence is evaluated literally as ``0.2*x + 0.8*y`` —
    the exact FP sequence of the DuckDB RECURSIVE-CTE oracle (and of
    the previous ``Series.ewm(adjust=False)`` C loop), so the result
    is bit-identical before the final rounding (JVM-side F.round,
    half-away like SQL ROUND; Python's round() is half-even)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    packed = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("h"),
    )

    @F.pandas_udf("double")
    def ewma_arr(vs: pd.Series) -> pd.Series:
        out = []
        for arr in vs:
            y = float(arr[0])
            for x in arr[1:]:
                y = 0.2 * float(x) + 0.8 * y
            out.append(y)
        return pd.Series(out, dtype="float64")

    # NULL-value discipline (round-14 ADVICE): a null event value
    # reaches the UDF as NaN and poisons the recurrence from that
    # position on — which is exactly what the oracle's SQL recurrence
    # does (0.2*NULL + 0.8*y = NULL propagates to the final row), except
    # SQL lands on NULL where the float loop lands on NaN. Emit NULL for
    # any group containing a null value so the hypothetical-null case is
    # oracle-exact too (the fixture has none; hash-neutral there).
    return packed.select(
        "user_id",
        "n_events",
        F.when(
            F.exists(F.col("h.value"), lambda x: x.isNull()),
            F.lit(None).cast("double"),
        )
        .otherwise(F.round(ewma_arr(F.col("h.value")), 6))
        .alias("ewma_value"),
    )
