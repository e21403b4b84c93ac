"""Round-9 crafted tests: the planted-cluster ANN audit helpers and
the streaming latency sketch (sealed-session batch equivalence on a
hand-computable table)."""

from __future__ import annotations

import datetime as dt

import duckdb

import __spark_entry__ as entry


def _oracle(con, name):
    sql = entry.oracle_sql()[name]
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _spark_rows(df):
    return sorted(tuple(r) for r in df.collect())


class _FakeBC:
    def __init__(self, value):
        self.value = value


def test_clustered_matrix_mixing_identity():
    """The planted corpus is a pure function of the fixture: row i
    must equal 0.75·centroid[md5(id_i) % NC] + 0.25·v_i exactly,
    ids come back sorted, and two builds are bit-identical (no RNG
    anywhere)."""
    import hashlib

    import numpy as np

    from catme_etl_spark.operators.similarity import (
        CLUSTER_MEMBERS,
        _clustered_matrix,
    )

    rng = np.random.default_rng(7)  # test-input randomness only
    raw_ids = np.array([30, 10, 20, 50, 40, 70, 60, 90, 80, 0], dtype=np.int64)
    raw_ids = np.concatenate([raw_ids, raw_ids + 100])  # 20 vectors
    M = rng.normal(size=(len(raw_ids), 64))
    bc = _FakeBC((raw_ids, M, None))

    ids, M2, norms = _clustered_matrix(bc)
    assert list(ids) == sorted(raw_ids.tolist())
    nc = max(16, len(ids) // CLUSTER_MEMBERS)

    order = np.argsort(raw_ids, kind="stable")
    Msorted = M[order]
    for i, vid in enumerate(ids):
        c = int(hashlib.md5(str(int(vid)).encode()).hexdigest(), 16) % nc
        expect = 0.75 * Msorted[c] + 0.25 * Msorted[i]
        assert np.array_equal(M2[i], expect), vid

    ids_b, M2_b, _ = _clustered_matrix(bc)
    assert np.array_equal(M2, M2_b) and np.array_equal(ids, ids_b)
    assert np.allclose(norms, np.sqrt((M2 * M2).sum(axis=1)))


def test_swap_clustered_gen_replaces_queries_with_corpus_rows():
    """The query-side wrapper must hand the inner kernel the CLUSTERED
    row for each vec_id — bit-identical to the broadcast corpus side —
    and leave ids/row-order untouched."""
    import numpy as np
    import pandas as pd

    from catme_etl_spark.operators.similarity import _swap_clustered_gen

    ids = np.array([10, 20, 30, 40], dtype=np.int64)
    M2 = np.arange(16, dtype=np.float64).reshape(4, 4)
    cl_bc = _FakeBC((ids, M2, None))

    seen = []

    def inner(batches):
        for pdf in batches:
            seen.append(pdf)
            yield pdf[["vec_id"]]

    pdf_in = pd.DataFrame(
        {"vec_id": [30, 10], "embedding": [[9.0] * 4, [8.0] * 4]}
    )
    out = list(_swap_clustered_gen(inner, cl_bc)([pdf_in]))
    assert len(out) == 1 and list(out[0]["vec_id"]) == [30, 10]
    got = np.array(seen[0]["embedding"].tolist())
    assert np.array_equal(got[0], M2[2])  # vec_id 30 -> sorted pos 2
    assert np.array_equal(got[1], M2[0])  # vec_id 10 -> sorted pos 0
    # the input frame must not be mutated (kernels may re-read it)
    assert pdf_in["embedding"][0] == [9.0] * 4


def test_stream_latency_sketch_crafted_sessions(spark, tmp_path):
    """Hand-computable sealed-session latencies: a plain conversion
    (100 s), a purchase-BEFORE-view session where only the later
    purchase counts (140 s), a second sealed session (50 s), plus a
    view-only session, a purchase-only session, and an UNSEALED
    converting session right at the stream's end — all excluded on
    both engines. Buckets: 50e6->bl 26, 100e6->bl 27, 140e6->bl 28,
    so p50/p90/p99 read 2^27-1 / 2^28-1 / 2^28-1."""
    from catme_etl_spark.streaming.jobs import stream_latency_sketch_sealed

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)

    def ts(seconds):
        return t0 + dt.timedelta(seconds=seconds)

    day = 86400
    rows = [
        # user 1: view -> purchase 100 s later (sealed)
        (1, ts(0), "view", 1.0),
        (1, ts(100), "purchase", 5.0),
        # user 2: purchase, view, purchase — v = t+60, first p >= v at
        # t+200 -> us = 140 s (sealed)
        (2, ts(0), "purchase", 2.0),
        (2, ts(60), "view", 1.0),
        (2, ts(200), "purchase", 3.0),
        # user 3: view only -> no conversion
        (3, ts(10), "view", 1.0),
        # user 4: purchase only -> v NULL -> excluded
        (4, ts(20), "purchase", 9.0),
        # user 5: sealed conversion at 50 s...
        (5, ts(0), "view", 1.0),
        (5, ts(50), "purchase", 4.0),
        # ...and an OPEN session at the end of the stream (within the
        # final watermark's 1 h + 30 min gap) -> excluded both sides
        (5, ts(3 * day - 120), "view", 1.0),
        (5, ts(3 * day - 60), "purchase", 6.0),
        # user 9: the max-ts anchor (its own unsealed session)
        (9, ts(3 * day), "view", 1.0),
    ]
    out = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.parquet(out)

    got = _spark_rows(stream_latency_sketch_sealed(spark, str(tmp_path)))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{out}/*.parquet'")
    assert got == _oracle(con, "stream_latency_sketch_sealed")
    assert got == [(3, 3, (1 << 27) - 1, (1 << 28) - 1, (1 << 28) - 1)]
