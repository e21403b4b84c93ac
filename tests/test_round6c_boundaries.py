"""Boundary/tie semantics for the round-6b operators, pinned on
crafted tables against the DuckDB oracle (the pattern that has caught
every certified-by-luck divergence so far): apportionment remainder
TIES, compaction shard-boundary placement, the hot-key flag
threshold, and a retention cohort with a gap week."""

from __future__ import annotations

import datetime as dt

import duckdb


def _oracle(con, name):
    import __spark_entry__ as entry

    return sorted(tuple(r) for r in con.execute(entry.oracle_sql()[name]).fetchall())


def test_apportion_remainder_tie_breaks_by_source(spark, tmp_path):
    """Two sources with IDENTICAL token counts have identical
    remainders; when only one leftover token exists the tie must go to
    the lexicographically smaller source on BOTH engines."""
    from catme_etl_spark.operators.sampling import (
        sample_token_budget_apportion,
    )

    # aa and bb tie at 5 tokens (the TOP remainder, 5/13), cc has 3;
    # floor shares sum to 999_999 → exactly one leftover token that
    # must land on the remainder tie, where source order decides.
    docs = [
        (1, "x y z w v", "aa", 9),
        (2, "x y z w v", "bb", 9),
        (3, "x y z", "cc", 5),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(out)

    got = sorted(
        tuple(r)
        for r in sample_token_budget_apportion(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{out}/*.parquet'")
    assert got == _oracle(con, "sample_token_budget_apportion")
    alloc = {r[0]: r[2] for r in got}
    assert sum(alloc.values()) == 1_000_000
    # 5+5+3=13 tokens; floor shares 384615+384615+230769 = 999999 →
    # one leftover; aa and bb tie on the top remainder (5), aa wins.
    assert alloc["aa"] == alloc["bb"] + 1
    assert alloc["aa"] == 384616 and alloc["cc"] == 230769


def test_compaction_exact_boundary_and_oversized_doc(spark, tmp_path):
    """A doc whose cumulative-before lands EXACTLY on the 64 KB edge
    opens the next shard (floor semantics); an oversized doc occupies
    one shard slot (assignment is by bytes BEFORE, never split)."""
    from catme_etl_spark.operators.sampling import pack_compaction_plan

    docs = [
        (1, "t", "s", 65536),      # cum_before=0     → shard 0
        (2, "t", "s", 200000),     # cum_before=65536 → shard 1 (edge)
        (3, "t", "s", 10),         # cum_before=265536→ shard 4
        (4, "t", "s", 10),         # cum_before=265546→ shard 4
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(out)

    got = {
        r.shard: r for r in pack_compaction_plan(spark, str(tmp_path)).collect()
    }
    assert got[0].n_docs == 1 and got[0].shard_bytes == 65536
    assert got[1].n_docs == 1 and got[1].shard_bytes == 200000
    assert got[4].n_docs == 2 and got[4].shard_bytes == 20
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{out}/*.parquet'")
    spark_rows = sorted(
        tuple(r) for r in pack_compaction_plan(spark, str(tmp_path)).collect()
    )
    assert spark_rows == _oracle(con, "pack_compaction_plan")


def test_hot_flag_fires_only_above_10x_mean(spark, tmp_path):
    """One user carrying ~35% of events must flag hot; uniform users
    must not — and the crafted table must hash-match the oracle."""
    from catme_etl_spark.operators.skew import skew_hot_user_report

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for i in range(350):  # hot user: 350 of ~1000 events
        rows.append((eid, base + dt.timedelta(seconds=eid), 1, "view", 1.0, "{}"))
        eid += 1
    for u in range(2, 67):  # 65 cold users × 10 events
        for i in range(10):
            rows.append(
                (eid, base + dt.timedelta(seconds=eid), u, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(out)

    got = skew_hot_user_report(spark, str(tmp_path)).collect()
    by_user = {r.user_id: r for r in got}
    assert by_user[1].hot == 1  # 350 × 66 users ≫ 10 × 1000
    assert all(r.hot == 0 for r in got if r.user_id != 1)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{out}/*.parquet'")
    assert sorted(tuple(r) for r in got) == _oracle(con, "skew_hot_user_report")


def test_retention_gap_week_and_oracle_parity(spark, tmp_path):
    """A user active in weeks {w, w+2} contributes offsets 0 and 2 but
    NOT 1 — cohorting is by first-seen week, activity is per distinct
    week; crafted parquet must hash-match the oracle."""
    from catme_etl_spark.operators.events import events_retention_cohorts

    wk = 604800
    rows = []
    eid = 0
    # two users in cohort week 2900: one active weeks 0&2, one week 0 only
    for u, weeks in [(1, (0, 2)), (2, (0,))]:
        for w in weeks:
            ts = dt.datetime.fromtimestamp((2900 + w) * wk, dt.timezone.utc)
            rows.append((eid, ts.replace(tzinfo=None), u, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(out)

    got = {
        (r.cohort_week, r.week_offset): r
        for r in events_retention_cohorts(spark, str(tmp_path)).collect()
    }
    assert got[(2900, 0)].active_users == 2
    assert got[(2900, 0)].retention_pct == 100.0
    assert (2900, 1) not in got
    assert got[(2900, 2)].active_users == 1
    assert got[(2900, 2)].retention_pct == 50.0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{out}/*.parquet'")
    spark_rows = sorted(
        tuple(r)
        for r in events_retention_cohorts(spark, str(tmp_path)).collect()
    )
    assert spark_rows == _oracle(con, "events_retention_cohorts")
