"""Oracle CTE-prefix materialization (tools/check_oracle.py).

Round-11 verdict item #4: the local verification protocol replays the
release family's banded-LSH ``pairs`` build per oracle (431.8 s for
``pipeline_release_diff`` alone at sf0.1 in PENDING_CHECK_r11.txt)
while the Spark side materializes shared artifacts once per session.
check_oracle now materializes registered WITH-prefixes as temp tables
and rewrites matching oracles to read them. These tests pin the two
properties the mechanism's safety rests on: the prefix parser splits
real CTE stacks correctly, and the rewritten query returns the exact
rows of the verbatim oracle (the driver always runs the verbatim
string — the rewrite exists only locally)."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry  # noqa: F401 — registers prefixes
from tools.check_oracle import _apply_prefix_artifacts, _split_with_ctes

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_split_with_ctes_synthetic():
    """Nested parens, quoted commas, a VALUES CTE with a declared
    column list, and WITH RECURSIVE all split correctly."""
    prefix = """WITH a AS (SELECT 1 AS x, ',' AS s FROM (SELECT 2) t),
      seeds (s, sa, sb) AS (VALUES (0, 1, 2), (1, 3, 4)),
      b AS (SELECT x FROM a WHERE s <> '(')"""
    ctes = _split_with_ctes(prefix)
    assert [n for n, _ in ctes] == ["a", "seeds", "b"]
    con = duckdb.connect()
    for name, body in ctes:
        con.execute(f"CREATE TEMP TABLE {name} AS {body}")
    assert con.execute("SELECT COUNT(*) FROM seeds").fetchone()[0] == 2
    assert con.execute(
        "SELECT sa FROM seeds WHERE s = 1"
    ).fetchone()[0] == 3
    assert _split_with_ctes("WITH RECURSIVE a AS (SELECT 1 AS x)") == [
        ("a", "SELECT 1 AS x")
    ]


def test_registered_prefixes_parse_and_match():
    """Both registered prefixes parse into creatable CTE lists, and
    every release-family oracle embeds one byte-exact."""
    from catme_etl_spark.operators.registry import (
        ORACLE,
        ORACLE_CTE_PREFIXES,
    )

    assert set(ORACLE_CTE_PREFIXES) >= {"minhash", "release_head"}
    for label, prefix in ORACLE_CTE_PREFIXES.items():
        names = [n for n, _ in _split_with_ctes(prefix)]
        assert len(names) == len(set(names)), label
        assert not (set(names) & set(TABLES)), label
    assert ORACLE_CTE_PREFIXES["release_head"] in ORACLE["pipeline_release_diff"]
    assert ORACLE_CTE_PREFIXES["release_head"] in ORACLE["quality_release_gate"]
    assert ORACLE_CTE_PREFIXES["minhash"] in ORACLE["pipeline_corpus_release"]


def test_rewrite_equivalence_release_gate():
    """The materialized rewrite returns the EXACT rows of the verbatim
    oracle on real sf0.001 data — for one release-family oracle (full
    head) and one minhash-family oracle (pairs prefix only)."""
    from catme_etl_spark.operators.registry import ORACLE

    for name in ("quality_release_gate", "dedup_minhash_lsh_pairs"):
        sql = ORACLE[name]
        con = _con()
        raw = con.execute(sql).fetchall()
        done: dict = {}
        rewritten = _apply_prefix_artifacts(con, sql, done)
        assert rewritten != sql, name  # a prefix actually matched
        assert done, name
        got = con.execute(rewritten).fetchall()
        assert sorted(map(tuple, got)) == sorted(map(tuple, raw)), name
        con.close()


def test_no_rewrite_without_match():
    """An oracle embedding no registered prefix runs verbatim and
    materializes nothing."""
    con = duckdb.connect()
    done: dict = {}
    sql = "SELECT 1 AS x"
    assert _apply_prefix_artifacts(con, sql, done) == sql
    assert done == {}


def test_bench_adopt_medians_stream_entries(tmp_path):
    """tools/bench_adopt.py: stream_* entries become per-entry medians
    across runs; batch entries keep the base reading; totals recompute."""
    import json

    from tools.bench_adopt import merge

    def rec(s1, s2, batch):
        return {
            "value": s1 + s2 + batch,
            "queries": {"stream_a": s1, "stream_b": s2, "agg_x": batch},
            "queries_normalized": {
                "stream_a": s1, "stream_b": s2, "agg_x": batch,
            },
        }

    base = rec(9.0, 4.0, 2.0)
    out = merge(base, [rec(5.0, 4.2, 2.1), rec(5.5, 3.8, 1.9)])
    assert out["queries"]["stream_a"] == 5.5   # median of 9.0/5.0/5.5
    assert out["queries"]["stream_b"] == 4.0
    assert out["queries"]["agg_x"] == 2.0      # batch: base reading kept
    assert out["value"] == 11.5
    assert out["medianed_entries"] == ["stream_a", "stream_b"]
    assert "median" in out["protocol"]
