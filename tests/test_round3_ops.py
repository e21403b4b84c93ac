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
