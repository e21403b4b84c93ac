"""t1-style smoke tests: entry() runs, flagship returns sane rows."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    assert all(r.revenue > 0 for r in rows)


def test_every_query_has_callable_signature(spark, sf_dir):
    qs = e.queries()
    assert qs, "registry must not be empty"
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_oracle_keys_subset_of_queries():
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
