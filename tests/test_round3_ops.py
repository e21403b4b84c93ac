"""Round-3 operator invariants: incremental dedup ≡ restricted full
pairs; temperature-mix rates flatten the stratum distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as e

SF001 = "/root/testdata/sf0.01"


def test_incremental_dedup_equals_full_pairs_restriction(spark):
    """Probing the index with only the new batch must lose nothing: the
    incremental result IS the full self-join result restricted to
    pairs touching the new batch (band candidates, verification, and
    threshold are shared code paths)."""
    qs = e.queries()
    full = qs["dedup_minhash_lsh_pairs"](spark, SF001)
    inc = qs["dedup_minhash_incremental"](spark, SF001)
    is_new = lambda c: F.col(c) % 10 == 9  # noqa: E731
    expected = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in full.filter(is_new("doc_a") | is_new("doc_b")).collect()
    }
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in inc.collect()}
    assert got == expected


def test_temperature_mix_rates_flatten_monotonically(spark):
    """T=2 keep-rates must decrease with stratum size (bigger strata
    downsample harder) and the rarest surviving stratum keeps
    everything."""
    qs = e.queries()
    sampled = qs["sample_temperature_mix"](spark, SF001)
    rates = (
        sampled.select("lang", "source", "rate").distinct().collect()
    )
    sizes = {
        (r.lang, r.source): r.n
        for r in e.queries()["text_corpus_mix"](spark, SF001)
        .select("lang", "source", "n_docs")
        .withColumnRenamed("n_docs", "n")
        .collect()
    }
    by_rate = sorted(rates, key=lambda r: -r.rate)
    assert abs(by_rate[0].rate - 1.0) < 1e-9  # rarest stratum keeps all
    # monotone: larger stratum → rate no larger
    for a in rates:
        for b in rates:
            if sizes[(a.lang, a.source)] < sizes[(b.lang, b.source)]:
                assert a.rate >= b.rate


def test_incremental_probe_against_durable_index(spark, tmp_path):
    """The session-shared band index stands in for a PERSISTED index
    table; prove the durable form works: write the bands to parquet,
    probe the stored table with the new batch, and get exactly the
    in-memory incremental result."""
    from catme_etl_spark.operators.dedup import (
        _minhash_bands,
        _shingle_sets,
        _verify_jaccard,
    )

    idx_path = str(tmp_path / "lsh_index.parquet")
    _minhash_bands(spark, SF001).write.parquet(idx_path)
    bands = spark.read.parquet(idx_path)

    new = bands.filter(F.col("doc_id") % 10 == 9).select(
        F.col("doc_id").alias("doc_n"),
        F.col("band").alias("band_n"),
        F.col("bkey").alias("bkey_n"),
    )
    cand = (
        bands.join(
            F.broadcast(new),
            (F.col("band") == F.col("band_n"))
            & (F.col("bkey") == F.col("bkey_n"))
            & (F.col("doc_id") != F.col("doc_n")),
        )
        .select(
            F.least("doc_id", "doc_n").alias("doc_a"),
            F.greatest("doc_id", "doc_n").alias("doc_b"),
        )
        .distinct()
    )
    durable = (
        _verify_jaccard(_shingle_sets(spark, SF001), cand)
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )
    in_memory = e.queries()["dedup_minhash_incremental"](spark, SF001)
    assert {tuple(r) for r in durable.collect()} == {
        tuple(r) for r in in_memory.collect()
    }
