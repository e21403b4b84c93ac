"""ANN tier comparison: the k-means IVF tier must retrieve at least
as well as the deterministic stride tier it productionizes.

Ground truth is exact brute-force cosine top-k; recall@5 is the
fraction of true top-5 neighbors an ANN tier returns. Run at sf0.01
(500 vectors → 10 centroids) — sf0.001's single stride centroid makes
IVF degenerate to brute force and the comparison meaningless.
"""

from __future__ import annotations

from conftest import SF001


def _recall_at_k(spark, ann_df, truth_df) -> float:
    hits = ann_df.select("query_id", "neighbor_id").intersect(
        truth_df.select("query_id", "neighbor_id")
    )
    return hits.count() / truth_df.count()


def test_ivf_kmeans_recall_at_least_stride(spark):
    from catme_etl_spark.operators.similarity import (
        ivf_kmeans_topk_plan,
        sim_ivf_topk,
        sim_topk_bruteforce,
    )

    truth = sim_topk_bruteforce(spark, SF001).persist()
    truth.count()
    stride = _recall_at_k(spark, sim_ivf_topk(spark, SF001), truth)
    kmeans = _recall_at_k(spark, ivf_kmeans_topk_plan(spark, SF001), truth)
    truth.unpersist()
    # data-adaptive centroids should not retrieve worse than a fixed
    # stride of the corpus (tiny slack: a tie is a pass, not a flake)
    assert kmeans >= stride - 0.02, (kmeans, stride)
    assert kmeans > 0.3, kmeans  # sanity: the tier actually retrieves


def test_ivf_kmeans_shape_and_determinism(spark):
    from catme_etl_spark.operators.similarity import TOP_K, ivf_kmeans_topk_plan

    df = ivf_kmeans_topk_plan(spark, SF001)
    assert df.columns == ["query_id", "rank", "neighbor_id", "cos"]
    rows = df.groupBy("query_id").count().agg({"count": "max"}).collect()
    assert rows[0][0] <= TOP_K


def test_certified_summaries_all_bounds_pass(spark):
    """The round-5 hash-certification reworks: every asserted bound in
    the sim_ml_lsh_pairs / sim_ivf_kmeans_topk summaries holds, so the
    driver's value hash (which includes the booleans) is stable."""
    from catme_etl_spark.operators.similarity import (
        sim_ivf_kmeans_topk,
        sim_ml_lsh_pairs,
    )

    [ml] = sim_ml_lsh_pairs(spark, SF001).collect()
    assert ml.n_true_pairs > 0
    assert ml.precision_ok and ml.recall_ok

    [km] = sim_ivf_kmeans_topk(spark, SF001).collect()
    assert km.n_queries > 0 and km.top_k == 5
    assert km.recall_floor_ok and km.at_least_stride_ok
