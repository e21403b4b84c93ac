"""Unit tests for the time-series rollups, connected components, and
SRP-LSH operators (beyond the DuckDB oracle gate, these check the
*semantic invariants* the oracle can't see: density, monotone
convergence, closure transitivity, LSH recall vs brute force)."""

from __future__ import annotations

from pyspark.sql import functions as F

from catme_etl_spark.operators.dedup import (
    dedup_connected_components,
    dedup_simhash_pairs,
)
from catme_etl_spark.operators.similarity import sim_srp_lsh_pairs
from catme_etl_spark.operators.timeseries import (
    ts_forward_fill_10min_purchase,
    ts_gapfill_10min_purchase,
    ts_ohlc_10min_by_type,
)


def test_gapfill_is_dense_and_count_preserving(spark, sf_dir):
    out = ts_gapfill_10min_purchase(spark, sf_dir).collect()
    starts = sorted(r.win_start_us for r in out)
    # dense: consecutive buckets exactly 600s apart, no holes
    assert all(b - a == 600_000_000 for a, b in zip(starts, starts[1:]))
    # count-preserving: gap-filling adds zeros, never drops events
    total = sum(r.n_events for r in out)
    expected = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total == expected


def test_ohlc_invariants(spark, sf_dir):
    for r in ts_ohlc_10min_by_type(spark, sf_dir).collect():
        assert r.low <= r.high
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.volume >= 1
        if r.volume == 1:
            assert r.open == r.close == r.high == r.low


def test_forward_fill_has_no_nulls_and_holds_last(spark, sf_dir):
    rows = sorted(
        ts_forward_fill_10min_purchase(spark, sf_dir).collect(),
        key=lambda r: r.win_start_us,
    )
    assert all(r.close_ffill is not None for r in rows)


def test_connected_components_closure(spark, sf_dir):
    comp = {
        r.doc_id: r.component
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    pairs = dedup_simhash_pairs(spark, sf_dir).collect()
    # every near-dup edge joins two docs of the same component
    for p in pairs:
        assert comp[p.doc_a] == comp[p.doc_b], (p.doc_a, p.doc_b)
    # component representative is the min doc_id of its members
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    for c, ds in members.items():
        assert c == min(ds)


def test_srp_lsh_pairs_subset_of_bruteforce(spark, sf_dir):
    """LSH output must be a subset of the brute-force ≥0.4 pair set
    (banding can miss pairs, never invent them), with decent recall on
    this corpus."""
    import itertools

    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r.vec_id for r in emb])
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cos = mat @ mat.T
    truth = {
        (int(ids[i]), int(ids[j]))
        for i, j in itertools.combinations(range(len(ids)), 2)
        if round(cos[i, j], 6) >= 0.4
    }
    got = {
        (r.vec_a, r.vec_b) for r in sim_srp_lsh_pairs(spark, sf_dir).collect()
    }
    assert got <= truth
    if truth:
        assert len(got) / len(truth) >= 0.3  # 4×4-bit bands: moderate recall


def test_scd2_intervals_are_contiguous_and_exhaustive(spark, sf_dir):
    """Per customer: intervals ordered, non-overlapping, contiguous
    (each valid_to equals the next valid_from), exactly one open
    (is_current) interval, and the first interval starts at the
    customer's first order date."""
    from collections import defaultdict

    from catme_etl_spark.operators.relational2 import scd2_priority_intervals

    rows = scd2_priority_intervals(spark, sf_dir).collect()
    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.custkey].append(r)
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_d"))
        .collect()
    )
    first_date = {r.o_custkey: r.first_d for r in orders}
    for cust, ivs in by_cust.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert ivs[0].valid_from == first_date[cust]
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to == "9999-12-31"
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from  # contiguous, no overlap
