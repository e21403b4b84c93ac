"""Pins the round-15 `_pair_cosine` kernel (ids-only candidate stream,
vectors gathered from the broadcast matrix) to the join+UDF form it
replaced: cos_raw must be BIT-identical per pair — downstream windows
order by it and filters round it, so even a ulp of drift could flip a
rank or a threshold row."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pair_cosine_matches_join_udf_form(spark):
    from catme_etl_spark.functions.vector import make_cosine_pandas_udf
    from catme_etl_spark.operators.similarity import (
        _pair_cosine,
        _srp_candidates,
    )
    from catme_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    cand = _srp_candidates(spark, sf)
    fast = {
        (r.vec_a, r.vec_b): r.cos_raw
        for r in _pair_cosine(spark, sf, cand, "vec_a", "vec_b").collect()
    }
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    ea = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    )
    cos_udf = make_cosine_pandas_udf()
    slow = {
        (r.vec_a, r.vec_b): r.cos_raw
        for r in cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cos_raw", cos_udf("emb_a", "emb_b"))
        .collect()
    }
    assert len(fast) == len(slow) > 0
    # bit-identical, not approximately equal
    diffs = [k for k in slow if fast[k] != slow[k]]
    assert not diffs, f"{len(diffs)} pairs differ, e.g. {diffs[:3]}"


def test_pair_cosine_passthrough_columns_and_fallback(spark, monkeypatch):
    """Extra columns ride through unchanged, and the over-budget
    fallback (join+UDF) yields the same rows."""
    import catme_etl_spark.operators._shared as sh
    from catme_etl_spark.operators.similarity import (
        _pair_cosine,
        _srp_candidates,
    )

    sf = "/root/testdata/sf0.001"
    cand = _srp_candidates(spark, sf).withColumn(
        "tag", (F.col("vec_a") * 7 + F.col("vec_b")).cast("long")
    )
    fast = sorted(
        tuple(r) for r in _pair_cosine(spark, sf, cand, "vec_a", "vec_b").collect()
    )
    monkeypatch.setattr(sh, "MAX_COLLECT_ROWS", 1)
    sh.clear_shared()
    cand2 = _srp_candidates(spark, sf).withColumn(
        "tag", (F.col("vec_a") * 7 + F.col("vec_b")).cast("long")
    )
    slow = sorted(
        tuple(r)
        for r in _pair_cosine(spark, sf, cand2, "vec_a", "vec_b").collect()
    )
    sh.clear_shared()
    assert fast == slow and fast
