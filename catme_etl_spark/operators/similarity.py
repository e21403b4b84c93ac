"""Approximate-nearest-neighbor similarity search over the
``embeddings`` table (SURVEY §2.10 F10; driver contract "similarity
search").

Two tiers, same deterministic semantics (cosine, ties broken by
neighbor id) so both are DuckDB-oracle-checkable:

- **brute force** (`sim_topk_bruteforce`): every query scores every
  vector via one blocked ``A @ B.T`` per Arrow batch. The baseline and
  the exact answer; O(n·m) — fine when one side is bounded (it is the
  broadcast side, like a broadcast join build side).
- **IVF** (`sim_ivf_topk`): coarse quantization. A small deterministic
  centroid set is broadcast; every vector is assigned to its nearest
  centroid (inverted lists, PARTITIONED BY cluster id — this is the
  100 TB layout); each query probes its ``NPROBE`` nearest clusters
  via an equi-join on cluster id, so the shuffle moves only
  |queries|×NPROBE probe rows and candidate scoring touches ~NPROBE/
  n_clusters of the corpus instead of all of it. Scoring is an
  Arrow-batched pandas UDF (dense math never runs interpreted).

Centroids here are a fixed stride of the data (``vec_id % STRIDE``) —
deterministic for the oracle; production would k-means them (same
plumbing, different centroid table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.texttools import hex_prefix_long, sql_hex_long
from ..functions.vector import SQL_NORM, make_cosine_pandas_udf, sql_cosine
from ..sources.tables import load_table
from ._shared import (
    fan_out as _fan_out_unsized,
    require_bounded,
    shared_broadcast,
    shared_matrix_broadcast,
)
from .registry import pending_query, query

TOP_K = 5
NPROBE = 2
CENTROID_STRIDE = 50

# Scale-adaptive fan-out for this module's numeric-vector kernels
# (guide §2: make partitioning derive from input size, not the core
# count). Every fan_out here feeds an Arrow/numpy kernel whose
# per-row cost is a fused BLAS pass — moderate — so a kilobyte-scale
# vector slice should not pay 32 python-worker round-trips per stage
# (~0.2 s of pure overhead at sf0.1, ×9 passes in the k-center loop).
# 128 KiB of vectors per task ≈ 1.6k embedding rows; past ~4 MiB of
# input the target hits the defaultParallelism clamp and the plan is
# identical to the classic fan_out. Results are partition-independent
# by construction (row-local kernels; per-partition winners reduce
# under a global tie rule) — re-certified against the oracle for the
# whole family.
_EMB_BYTES_PER_TASK = int(
    os.environ.get("CATME_EMB_BYTES_PER_TASK", str(128 << 10))
)


def fan_out(df, spark, *keys):
    return _fan_out_unsized(
        df, spark, *keys, bytes_per_task=_EMB_BYTES_PER_TASK
    )


def _topk_against(bc, k: int, exclude_self: bool):
    """mapInPandas generator: per input batch, blocked matmul against
    the broadcast matrix, emit top-k (cos desc, id asc) per row."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        bids, bmat, bnorms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ia = pdf["vec_id"].to_numpy()
            na = np.sqrt((A * A).sum(axis=1))
            cos = (A @ bmat.T) / (na[:, None] * bnorms[None, :])
            if exclude_self:
                self_mask = ia[:, None] == bids[None, :]
                cos = np.where(self_mask, -np.inf, cos)
            # stable deterministic order: cos desc, then neighbor id asc
            order = np.lexsort((np.broadcast_to(bids, cos.shape), -cos), axis=1)
            top = order[:, :k]
            n, kk = top.shape
            rows_idx = np.repeat(np.arange(n), kk)
            cols = top.ravel()
            scores = cos[rows_idx, cols]
            # degenerate-corpus guard: with fewer than k non-self
            # neighbors, the self row's -inf mask would otherwise be
            # emitted as a phantom neighbor (and pollute n_truth in
            # every recall audit that consumes this as ground truth).
            # -inf rows always sort last within a query's top-k, so
            # dropping them keeps ranks 1..n_neighbors contiguous —
            # matching the oracle's vec_id <> vec_id join exactly.
            keep = ~np.isneginf(scores)
            yield pd.DataFrame(
                {
                    "query_id": ia[rows_idx][keep],
                    "rank": np.tile(np.arange(1, kk + 1), n)[keep],
                    "neighbor_id": bids[cols][keep],
                    "cos_raw": scores[keep],
                }
            )

    return gen


_COS_AB = sql_cosine("a.embedding", "b.embedding")


def _pair_cosine(
    spark: SparkSession, sf_dir: str, pairs: DataFrame, acol: str, bcol: str
) -> DataFrame:
    """``cos_raw`` for id pairs, computed against the session-shared
    embeddings matrix broadcast: the candidate stream ships ONLY ids
    (plus any passthrough columns) across the exchanges and the Python
    boundary, and each task gathers the vectors from the broadcast
    (guide §2.3/§8 — move keys and metadata, attach the payload via a
    broadcast instead of joining it onto every candidate row).
    Measured on the 460k-pair SRP verification at sf0.1: the join+UDF
    form moved ~470 MB of array cells through the exchanges and Arrow;
    the id stream is ~7 MB. It also removes the §4.4 double
    ``ArrowEvalPython`` the filter-above-UDF shape planned.

    Bit-identical to ``make_cosine_pandas_udf`` over the joined
    arrays: same float64 row matrices (float32 storage widens exactly
    either way), same einsum reductions, and per-row results are
    independent of batch composition. Pinned by
    tests/test_pair_cosine.py.

    Falls back to the join+UDF form when the corpus exceeds the
    broadcast-tier budget (`_shared.MAX_COLLECT_ROWS`) — at that scale
    the arrays must flow through the join, and the LSH/IVF candidate
    generation is already what bounds the pair count."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    try:
        bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    except ValueError:
        cos_udf = make_cosine_pandas_udf()
        ea = emb.select(
            F.col("vec_id").alias(acol), F.col("embedding").alias("_ea")
        )
        eb = emb.select(
            F.col("vec_id").alias(bcol), F.col("embedding").alias("_eb")
        )
        return (
            pairs.join(ea, acol)
            .join(eb, bcol)
            .withColumn("cos_raw", cos_udf("_ea", "_eb"))
            .select(*pairs.columns, "cos_raw")
        )

    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in pairs.schema.fields
        )
        + ", cos_raw double"
    )

    def gen(batches):
        import numpy as np

        ids, mat, _norms = bc.value
        pos = {int(v): i for i, v in enumerate(ids)}
        for pdf in batches:
            if not len(pdf):
                continue
            A = mat[[pos[int(x)] for x in pdf[acol]]]
            B = mat[[pos[int(x)] for x in pdf[bcol]]]
            dots = np.einsum("ij,ij->i", A, B)
            na = np.sqrt(np.einsum("ij,ij->i", A, A))
            nb = np.sqrt(np.einsum("ij,ij->i", B, B))
            denom = na * nb
            out = np.where(
                denom == 0, 0.0, dots / np.where(denom == 0, 1.0, denom)
            )
            res = pdf.copy()
            res["cos_raw"] = out
            yield res

    return pairs.mapInPandas(gen, out_schema)


def ml_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml integration path: ``BucketedRandomProjectionLSH``
    over L2-normalized vectors (unit sphere: d² = 2 − 2·cos, so the
    Euclidean threshold √1.2 ≈ cos ≥ 0.4). Returns the raw pair list
    — deterministic per seed, but the library-internal random
    projections aren't SQL-reproducible, so the CERTIFIED surface is
    :func:`sim_ml_lsh_pairs`' recall/precision summary."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("raw")
    )
    unit = Normalizer(inputCol="raw", outputCol="v", p=2.0).transform(emb)
    lsh = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=0.5,
        numHashTables=4, seed=42,
    )
    model = lsh.fit(unit)
    sj = model.approxSimilarityJoin(unit, unit, 1.0954451150103321)
    return sj.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id")).select(
        F.col("datasetA.vec_id").alias("vec_a"),
        F.col("datasetB.vec_id").alias("vec_b"),
        F.round("distCol", 4).alias("l2_dist"),
    )


_ML_LSH_RECALL_FLOOR = 0.8  # measured 0.983 at sf0.01; generous margin


@query(
    "sim_ml_lsh_pairs",
    oracle=f"""
    SELECT COUNT(*) AS n_true_pairs,
           TRUE AS precision_ok,
           TRUE AS recall_ok
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND({_COS_AB}, 6) >= 0.4
    """,
)
def sim_ml_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified summary of the pyspark.ml LSH tier
    (:func:`ml_lsh_candidate_pairs`), hash-checked via the repo's
    within-bounds pattern (`agg_cms_heavy_hitters` / `agg_hll_union_
    rollup` precedents): the seeded pair list itself is not
    SQL-reproducible, but its QUALITY against exact ground truth is —
    the output carries the exact cos ≥ 0.4 pair count (oracle-matched
    all-pairs cosine) plus two asserted bounds:

    - ``precision_ok``: every LSH pair is a true pair.
      ``approxSimilarityJoin`` post-filters candidates by TRUE
      distance, and on unit vectors d ≤ √1.2 ⟺ cos ≥ 0.4, so any
      false positive means the kernel itself drifted.
    - ``recall_ok``: the LSH tier retrieves ≥ {_ML_LSH_RECALL_FLOOR:.0%}
      of true pairs (measured 98% at sf0.01 with 4 hash tables; a
      seed/library change that degrades retrieval flips the boolean
      and hash-mismatches). Vacuously true on corpora with no true
      pairs.

    The exact branch is a bounded-broadcast kernel
    (`dedup_embedding_cosine_pairs`); at open-ended scale the ground
    truth would be a sampled audit, same summary shape."""
    from .dedup import dedup_embedding_cosine_pairs

    true_pairs = dedup_embedding_cosine_pairs(spark, sf_dir).select(
        "vec_a", "vec_b"
    )
    ml = ml_lsh_candidate_pairs(spark, sf_dir).select("vec_a", "vec_b")
    hit = ml.join(true_pairs, ["vec_a", "vec_b"])
    return (
        true_pairs.agg(F.count(F.lit(1)).alias("n_true_pairs"))
        .crossJoin(ml.agg(F.count(F.lit(1)).alias("_n_ml")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("_n_hit")))
        .select(
            "n_true_pairs",
            (F.col("_n_hit") == F.col("_n_ml")).alias("precision_ok"),
            (
                F.col("_n_hit")
                >= _ML_LSH_RECALL_FLOOR * F.col("n_true_pairs")
            ).alias("recall_ok"),
        )
    )


@query(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COS_AB} AS c
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, c,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY c DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
           ROUND(c, 4) AS cos
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors (F10 baseline): blocked A@B.T per
    Arrow batch against the broadcast corpus; ties broken by neighbor
    id. The broadcast build side is BOUNDED (``bounded_collect``
    raises past the budget) and session-shared with
    ``dedup_embedding_cosine_pairs``; open-ended corpora go through
    SRP-LSH/IVF candidates instead."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    # fan_out: a single-row-group embeddings file would otherwise run
    # the whole blocked matmul in ONE Arrow task
    out = fan_out(emb, spark).mapInPandas(
        _topk_against(bc, TOP_K, exclude_self=True),
        schema="query_id long, rank long, neighbor_id long, cos_raw double",
    )
    return out.select(
        "query_id", "rank", "neighbor_id", F.round("cos_raw", 4).alias("cos")
    )


_COS_VC = sql_cosine("v.embedding", "c.ce")


@query(
    "sim_ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM embeddings WHERE vec_id % {CENTROID_STRIDE} = 0
    ),
    vc AS (
      SELECT v.vec_id, c.cid, {_COS_VC} AS vcos,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {_COS_VC} DESC, c.cid) AS rn
      FROM embeddings v, cent c
    ),
    assign AS (SELECT vec_id, cid FROM vc WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM vc WHERE rn <= {NPROBE}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE a.vec_id <> p.query_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             {sql_cosine('qa.embedding', 'qb.embedding')} AS cos_raw
      FROM cand c
      JOIN embeddings qa ON qa.vec_id = c.query_id
      JOIN embeddings qb ON qb.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
           ROUND(cos_raw, 4) AS cos
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign → probe → inverted-list equi-join → score → top-k.

    The join on ``cid`` is the scale move: candidates co-locate with
    probes by cluster, so a 1000-executor run shuffles only probe rows
    and each task scores one cluster's list against its probes.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0)
    bc = shared_matrix_broadcast("ivf_centroids", sf_dir, spark, cent)
    return _ivf_plan(emb, bc, spark, sf_dir)


def _ivf_plan(
    emb: DataFrame, bc, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """assign → probe → inverted-list equi-join → score → top-k against
    any broadcast centroid table ``(ids, matrix, norms)``."""
    # nearest-NPROBE centroids per vector; rn=1 is the list assignment
    # (fan_out: keep the centroid matmul off a single scan task)
    near = fan_out(emb, spark).mapInPandas(
        _topk_against(bc, NPROBE, exclude_self=False),
        schema="query_id long, rank long, neighbor_id long, cos_raw double",
    ).select(
        F.col("query_id").alias("vec_id"),
        F.col("rank").alias("rn"),
        F.col("neighbor_id").alias("cid"),
    )
    assign = near.filter(F.col("rn") == 1).select("vec_id", "cid")
    probes = near.select(F.col("vec_id").alias("query_id"), "cid")

    # inverted lists and candidates carry IDS ONLY — the vectors are
    # attached inside _pair_cosine via the broadcast matrix, so the
    # cid shuffle and the candidate stream never move array cells
    lists = assign.select("cid", F.col("vec_id").alias("neighbor_id"))
    cand = probes.join(lists, "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = _pair_cosine(
        spark,
        sf_dir,
        cand.select("query_id", "neighbor_id"),
        "query_id",
        "neighbor_id",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"),
            "neighbor_id", F.round("cos_raw", 4).alias("cos"),
        )
    )


def ivf_kmeans_topk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with **k-means** centroids — the production centroid
    tier (`pyspark.ml.clustering.KMeans`, fixed seed) behind the same
    probe-join plan as `sim_ivf_topk` (which keeps the deterministic
    stride centroids for the DuckDB oracle). Returns the per-query
    top-k rows — deterministic per seed, but the seeded Lloyd
    iteration is not SQL-reproducible, so the CERTIFIED surface is
    :func:`sim_ivf_kmeans_topk`'s recall summary.

    k matches the stride variant's centroid count so the two tiers'
    recall is apples-to-apples (asserted in
    `tests/test_similarity.py`); at real scale pick k ≈ √n and fit on
    a sample — the fit is one pass over a vector column, the rest of
    the plan is unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def fit_centroids():
        import numpy as np
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        n = emb.count()
        k = max(2, n // CENTROID_STRIDE)
        vecs = emb.select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias(
                "features"
            )
        )
        model = KMeans(k=k, seed=7, maxIter=20, featuresCol="features").fit(vecs)
        mat = np.vstack([np.asarray(c) for c in model.clusterCenters()]).astype(
            np.float64
        )
        ids = np.arange(len(mat), dtype=np.int64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        return ids, mat, norms

    bc = shared_broadcast("ivf_kmeans_centroids", sf_dir, spark, fit_centroids)
    return _ivf_plan(emb, bc, spark, sf_dir)


_KMEANS_RECALL_FLOOR = 0.3  # measured 0.48 at sf0.01; tier-sanity floor
_STRIDE_SLACK = 0.02  # a tie with the stride tier is a pass, not a flake


@query(
    "sim_ivf_kmeans_topk",
    oracle=f"""
    SELECT COUNT(DISTINCT vec_id) AS n_queries,
           {TOP_K} AS top_k,
           TRUE AS recall_floor_ok,
           TRUE AS at_least_stride_ok
    FROM embeddings
    """,
)
def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certified summary of the k-means IVF tier
    (:func:`ivf_kmeans_topk_plan`), hash-checked via the repo's
    within-bounds pattern: the seeded top-k rows aren't
    SQL-reproducible, but their RETRIEVAL QUALITY against exact ground
    truth is — the output carries the query count (oracle-matched)
    plus two asserted recall bounds over recall@{TOP_K} vs the exact
    brute-force top-k:

    - ``recall_floor_ok``: the tier retrieves ≥ {_KMEANS_RECALL_FLOOR:.0%}
      of true neighbors (measured 48% at sf0.01 with NPROBE={NPROBE}
      of ~10 clusters — recall scales with NPROBE, the standard IVF
      dial).
    - ``at_least_stride_ok``: data-adaptive k-means centroids retrieve
      no worse than the fixed-stride centroid tier (`sim_ivf_topk`)
      minus {_STRIDE_SLACK:.0%} slack — the claim that fitting
      centroids actually buys something.

    A KMeans seed/library change that degrades retrieval flips a
    boolean and hash-mismatches instead of hiding behind a rows-only
    check. Ground truth is the bounded-broadcast brute-force kernel;
    at open-ended scale the audit runs on a query sample, same shape."""
    truth = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    km = ivf_kmeans_topk_plan(spark, sf_dir).select("query_id", "neighbor_id")
    stride = sim_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    km_hit = km.join(truth, ["query_id", "neighbor_id"])
    st_hit = stride.join(truth, ["query_id", "neighbor_id"])
    return (
        truth.agg(
            F.countDistinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("_n_truth"),
        )
        .crossJoin(km_hit.agg(F.count(F.lit(1)).alias("_n_km")))
        .crossJoin(st_hit.agg(F.count(F.lit(1)).alias("_n_st")))
        .select(
            "n_queries",
            F.lit(TOP_K).alias("top_k"),
            (
                F.col("_n_km") >= _KMEANS_RECALL_FLOOR * F.col("_n_truth")
            ).alias("recall_floor_ok"),
            (
                F.col("_n_km")
                >= F.col("_n_st") - _STRIDE_SLACK * F.col("_n_truth")
            ).alias("at_least_stride_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Sign-random-projection LSH (deterministic, oracle-checkable).
# ---------------------------------------------------------------------------

_SRP_PLANES = 16
_SRP_BANDS = 4
_SRP_BAND_BITS = _SRP_PLANES // _SRP_BANDS  # 4


def _srp_weight(p: int, d: int) -> float:
    """±1 hyperplane weight derived from md5(f"{p}_{d}") — the same
    digest DuckDB computes, so both engines build identical planes."""
    import hashlib

    return 1.0 if int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[0], 16) & 1 else -1.0


def _srp_proj_sql(p: int) -> str:
    """DuckDB: sequential Σ emb[d]·w(p,d) — same fold order as Spark's
    unrolled chain, so the sign bit can't disagree."""
    w = (
        f"(CASE WHEN (strpos('0123456789abcdef', "
        f"substring(md5('{p}_' || CAST(d AS VARCHAR)), 1, 1)) - 1) % 2 = 1 "
        f"THEN 1.0 ELSE -1.0 END)"
    )
    return (
        "list_sum(list_transform(range(len(embedding)), "
        f"d -> CAST(embedding[d+1] AS DOUBLE) * {w}))"
    )


_SRP_KEY_SQL = " + ".join(
    f"(CASE WHEN {_srp_proj_sql(p)} >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(_SRP_PLANES)
)


def _srp_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct SRP band-collision candidate pairs (vec_a < vec_b) —
    the banded self-join shared by the pairs query and the recall
    audit. Session-shared (the 16×dim unrolled signature compiles and
    runs once; consumers read the persisted candidates)."""

    def build() -> DataFrame:
        from ..functions.vector import dim_of

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        dim = dim_of(emb)
        key_sql = " + ".join(
            "(CASE WHEN ("
            + " + ".join(
                f"CAST(element_at(embedding, {d + 1}) AS DOUBLE) * "
                f"({_srp_weight(p, d)})"
                for d in range(dim)
            )
            + f") >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(_SRP_PLANES)
        )
        # persist: the candidate self-join reads the signature twice;
        # the 16×dim unrolled projection must not run once per side.
        # fan_out: don't compute 16 unrolled 64-term FMA chains per row
        # in a single scan task when the file arrives as one split.
        sig = (
            fan_out(emb, spark)
            .select("vec_id", F.expr(key_sql).alias("key"))
            .persist()
        )
        banded = sig.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(_SRP_BANDS - 1))).alias("b"),
            F.col("key").alias("key"),
        ).select(
            "vec_id",
            "b",
            F.expr(
                f"shiftright(key, {_SRP_BAND_BITS} * b)"
                f" & {(1 << _SRP_BAND_BITS) - 1}"
            ).alias("bval"),
        )
        a = banded.select(F.col("vec_id").alias("vec_a"), "b", "bval")
        bb = banded.select(
            F.col("vec_id").alias("vec_b"),
            F.col("b").alias("b2"),
            F.col("bval").alias("bval2"),
        )
        return (
            a.join(
                bb,
                (F.col("b") == F.col("b2"))
                & (F.col("bval") == F.col("bval2"))
                & (F.col("vec_a") < F.col("vec_b")),
            )
            .select("vec_a", "vec_b")
            .distinct()
        )

    from ._shared import shared_df

    return shared_df("srp_candidates", sf_dir, spark, build)


@query(
    "sim_srp_lsh_pairs",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id, embedding, {_SRP_KEY_SQL} AS key
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id, b,
             (key >> ({_SRP_BAND_BITS} * b)) & {(1 << _SRP_BAND_BITS) - 1} AS bval
      FROM proj, (SELECT unnest(range({_SRP_BANDS})) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bval = b.bval AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           ROUND({sql_cosine('ea.embedding', 'eb.embedding')}, 4) AS cos
    FROM cand
    JOIN embeddings ea ON ea.vec_id = vec_a
    JOIN embeddings eb ON eb.vec_id = vec_b
    WHERE ROUND({sql_cosine('ea.embedding', 'eb.embedding')}, 6) >= 0.4
    """,
)
def sim_srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via sign-random-projection LSH, verified by exact
    cosine — the pure-DataFrame ANN scale path (vs. the seeded
    pyspark.ml variant `sim_ml_lsh_pairs`, which is rows-only because
    its planes are library-internal randoms).

    The {p}×{d} hyperplane grid derives from md5, so DuckDB rebuilds
    the exact same planes and the whole pipeline — signature, banding,
    candidate join, verification — is hash-checked end to end.

    Scale shape: one narrow scan computes the 16-bit signature in
    codegen (unrolled FMA chains, no Python); banding shuffles
    O(vectors × 4) tiny keys; the candidate join touches only same-band
    buckets (16 values per 4-bit band → dense buckets at corpus scale
    would add more planes/bands, same plan); exact cosine runs on
    candidates only (Arrow-batched numpy), never all pairs.

    Plan-construction note: the unrolled signature is generated as ONE
    SQL string handed to ``F.expr`` — building it from Column operators
    would issue thousands of py4j round-trips (measured 30+ s of pure
    driver time before any execution).
    """
    cand = _srp_candidates(spark, sf_dir)
    return (
        _pair_cosine(spark, sf_dir, cand, "vec_a", "vec_b")
        .filter(F.round("cos_raw", 6) >= 0.4)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos"))
    )


@query(
    "sim_int8_quantization",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS scale
      FROM embeddings
      WHERE vec_id < 200
    ),
    d AS (
      SELECT vec_id, embedding, scale,
             list_transform(embedding,
               x -> round(CAST(x AS DOUBLE) * 127.0 / scale) * scale / 127.0)
               AS dq
      FROM s WHERE scale > 0
    )
    SELECT vec_id,
           ROUND(scale, 6) AS scale,
           ROUND(list_sum(list_transform(range(len(embedding)),
                 i -> CAST(embedding[i+1] AS DOUBLE) * dq[i+1]))
             / (sqrt(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(dq, x -> x * x)))), 6)
             AS cos_fidelity,
           ROUND(list_max(list_transform(range(len(embedding)),
                 i -> abs(CAST(embedding[i+1] AS DOUBLE) - dq[i+1]))), 6)
             AS max_abs_err
    FROM d
    """,
)
def sim_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization audit — the storage tier
    for web-scale ANN (4× smaller vectors, SIMD int8 dot products).
    Per vector: the per-vector scale (absmax), the cosine between the
    original and its dequantized reconstruction, and the max absolute
    element error.

    Plan shape: one narrow scan, zero exchanges — each step
    materializes its intermediate as a real column in a separate
    SELECT so the interpreted HOF lambdas reference cheap columns
    instead of re-evaluating the absmax/quantize expressions per
    element (the caution documented in ``functions/texttools``).
    Bounded to vec_id < 200 to keep the oracle diff small; the plan
    is identical unbounded.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    xd = lambda x: x.cast("double")  # noqa: E731
    s = emb.select(
        "vec_id",
        "embedding",
        F.array_max(F.transform("embedding", lambda x: F.abs(xd(x)))).alias("scale"),
    ).filter(F.col("scale") > 0)
    d = s.select(
        "vec_id",
        "embedding",
        "scale",
        F.transform(
            "embedding",
            lambda x: F.round(xd(x) * 127.0 / F.col("scale"))
            * F.col("scale")
            / 127.0,
        ).alias("dq"),
    )
    cos = F.aggregate(
        F.zip_with("embedding", "dq", lambda x, y: xd(x) * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (
        F.sqrt(
            F.aggregate(
                F.transform("embedding", lambda x: xd(x) * xd(x)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        * F.sqrt(
            F.aggregate(
                F.transform("dq", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    )
    err = F.array_max(F.zip_with("embedding", "dq", lambda x, y: F.abs(xd(x) - y)))
    return d.select(
        "vec_id",
        F.round("scale", 6).alias("scale"),
        F.round(cos, 6).alias("cos_fidelity"),
        F.round(err, 6).alias("max_abs_err"),
    )


@query(
    "sim_centroid_assign_audit",
    oracle="""
    WITH cent AS (
      SELECT label, dim, ROUND(AVG(v), 5) + 0.0 AS cv
      FROM (
        SELECT label, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
      )
      GROUP BY label, dim
    ),
    ev AS (
      SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    ),
    vc AS (
      SELECT ev.vec_id, ev.label, c.label AS clabel,
             ROUND(SUM(ev.v * c.cv)
                   / (SQRT(SUM(ev.v * ev.v)) * SQRT(SUM(c.cv * c.cv))),
                   6) AS cos
      FROM ev JOIN cent c USING (dim)
      GROUP BY ev.vec_id, ev.label, c.label
    ),
    r AS (
      SELECT vec_id, label, clabel, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, clabel) AS rn
      FROM vc
    )
    SELECT label, clabel AS assigned_label, COUNT(*) AS n,
           ROUND(AVG(cos), 4) + 0.0 AS avg_cos
    FROM r WHERE rn = 1
    GROUP BY label, clabel
    """,
)
def sim_centroid_assign_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise audit by nearest-centroid assignment — the
    classifier-free check a training-data pipeline runs on labeled
    embeddings: build one centroid per label (the
    `embeddings_centroid_by_label` means), assign every vector to its
    nearest centroid by cosine, and report the (label, assigned_label)
    confusion counts with mean assignment cosine. Off-diagonal rows are
    candidate mislabels / label bleed; a label whose diagonal share
    collapses is drifting.

    Scale shape: the centroid table is K×dim (kilobytes at any corpus
    size) — computed as one hash-agg over posexploded dims, then
    broadcast; assignment is a single Arrow-batched pass over the
    corpus (blocked matmul against the broadcast centroid matrix, no
    shuffle), and only (label, assigned) pair counts aggregate at the
    end. 100 TB cost = one corpus scan.

    Float discipline: centroids are rounded in SPARK (F.round ≡ DuckDB
    ROUND, half away from zero) and collected rounded, so both engines
    score against IDENTICAL centroid values; per-pair cosines are
    rounded half-away to 6 decimals inside the kernel BEFORE the
    argmax (ties → smaller label), so the winner can't flip on
    accumulation-order noise."""
    import numpy as np
    import pandas as pd

    from ._shared import bounded_collect, shared_broadcast

    def build_centroids():
        rows = bounded_collect(
            embeddings_centroid_by_label(spark, sf_dir),
            what="label centroid table (K x dim rows)",
        )
        labels = sorted({r.label for r in rows})
        dims = 1 + max(r.dim for r in rows)
        lix = {lb: i for i, lb in enumerate(labels)}
        mat = np.zeros((len(labels), dims - 1), dtype=np.float64)
        for r in rows:
            mat[lix[r.label], r.dim - 1] = r.centroid_v
        norms = np.sqrt((mat * mat).sum(axis=1))
        return np.array(labels, dtype=np.int64), mat, norms

    bc = shared_broadcast("label_centroids", sf_dir, spark, build_centroids)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )

    def assign(batches):
        clabels, cmat, cnorms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            na = np.sqrt((A * A).sum(axis=1))
            cos = (A @ cmat.T) / (na[:, None] * cnorms[None, :])
            # half-away-from-zero to 6 decimals: matches F.round/DuckDB
            cos = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5) / 1e6
            order = np.lexsort(
                (np.broadcast_to(clabels, cos.shape), -cos), axis=1
            )
            best = order[:, 0]
            yield pd.DataFrame(
                {
                    "label": pdf["label"],
                    "assigned_label": clabels[best],
                    "cos": cos[np.arange(len(best)), best],
                }
            )

    out = fan_out(emb, spark).mapInPandas(
        assign, schema="label long, assigned_label long, cos double"
    )
    return out.groupBy("label", "assigned_label").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.avg("cos"), 4) + 0.0).alias("avg_cos"),
    )


@query(
    "embeddings_centroid_by_label",
    oracle="""
    SELECT label, dim, ROUND(AVG(v), 5) + 0.0 AS centroid_v
    FROM (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def embeddings_centroid_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label centroid vectors in long (label, dim, value) form —
    the building block of IVF coarse quantizers and class prototypes
    (`sim_ivf_kmeans_topk` consumes exactly these means). posexplode
    turns the vector column into rows so the mean is a plain hash-agg
    with map-side partials: at 100 TB this shuffles one partial
    (sum, count) per (label, dim) per task — 64×|labels| rows — never
    raw vectors. Float inputs are exact; only the double accumulation
    order differs cross-engine, so ROUND(.., 5) (+0.0 for signed zero)
    pins the hash."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg((F.round(F.avg("v"), 5) + 0.0).alias("centroid_v"))
    )


_SEMANTIC_COMP_ORACLE = f"""
    WITH RECURSIVE proj AS (
      SELECT vec_id, embedding, {_SRP_KEY_SQL} AS key
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id, b,
             (key >> ({_SRP_BAND_BITS} * b)) & {(1 << _SRP_BAND_BITS) - 1} AS bval
      FROM proj, (SELECT unnest(range({_SRP_BANDS})) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bval = b.bval AND a.vec_id < b.vec_id
    ),
    verified AS (
      SELECT vec_a, vec_b
      FROM cand
      JOIN embeddings ea ON ea.vec_id = vec_a
      JOIN embeddings eb ON eb.vec_id = vec_b
      WHERE ROUND({sql_cosine('ea.embedding', 'eb.embedding')}, 6) >= 0.4
    ),
    edges AS (
      SELECT vec_a AS s, vec_b AS t FROM verified
      UNION ALL
      SELECT vec_b, vec_a FROM verified
    ),
    walk AS (
      SELECT vec_id AS d, vec_id AS lab FROM embeddings
      UNION
      SELECT e.t AS d, w.lab FROM walk w JOIN edges e ON e.s = w.d
    ),
    comp AS (SELECT d AS vec_id, MIN(lab) AS component FROM walk GROUP BY d)
"""


@query(
    "pipeline_semantic_dedup",
    oracle=f"""
    {_SEMANTIC_COMP_ORACLE},
    norms AS (
      SELECT vec_id, ROUND({{norm}}, 4) AS nr FROM embeddings
    ),
    ranked AS (
      SELECT component, c.vec_id, nr,
             ROW_NUMBER() OVER (PARTITION BY component
                                ORDER BY nr DESC, c.vec_id) AS rn,
             COUNT(*) OVER (PARTITION BY component) AS n_members
      FROM comp c JOIN norms ON norms.vec_id = c.vec_id
    )
    SELECT component,
           CAST(n_members AS BIGINT) AS n_members,
           vec_id AS survivor_id,
           nr AS survivor_norm
    FROM ranked
    WHERE rn = 1 AND n_members >= 2
    """.replace(
        "{norm}",
        "sqrt(list_sum(list_transform(range(len(embedding)), "
        "i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE))))",
    ),
)
def pipeline_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style end-to-end *embedding-space* dedup composition:
    deterministic SRP-LSH candidates → exact-cosine verification
    (cos ≥ 0.4) → connected components over the verified pairs → one
    norm-argmax survivor per multi-member cluster. The semantic sibling
    of `pipeline_dedup_corpus` (which closes over the *lexical* SimHash
    graph) — together they cover both halves of a modern
    training-corpus dedup stack.

    Survivor pick: highest L2 norm (rounded to 4 so accumulation-order
    noise can't flip the winner), ties to the smallest vec_id — a
    single mergeable `max_by(id, array(norm, -id))` state per cluster,
    so at corpus scale only (component, best) pairs shuffle. The CC
    loop is the shared star-augmented min-label propagation
    (`dedup.propagate_min_labels`) over LSH-candidate edges only —
    never all pairs.
    """
    from ..functions.vector import norm
    from .dedup import propagate_min_labels

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pairs = sim_srp_lsh_pairs(spark, sf_dir).select("vec_a", "vec_b")
    labels = propagate_min_labels(
        emb.select(F.col("vec_id").alias("id")),
        pairs.select(F.col("vec_a").alias("a"), F.col("vec_b").alias("b")),
    ).select(F.col("id").alias("vec_id"), "component")
    norms = emb.select("vec_id", F.round(norm(F.col("embedding")), 4).alias("nr"))
    return (
        labels.join(norms, "vec_id")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by(
                "vec_id",
                F.array(F.col("nr"), -F.col("vec_id").cast("double")),
            ).alias("survivor_id"),
            F.max("nr").alias("survivor_norm"),
        )
        .filter(F.col("n_members") >= 2)
    )


def _srp_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PERSISTED SRP band index: ``(vec_id, b, bval)`` for every
    corpus vector — the embedding-tier analog of the MinHash band
    index `dedup_minhash_incremental` probes. Session-shared: built
    once (one narrow scan computing the 16-bit signature in codegen),
    then every nightly ingest probes it without re-banding — and
    crucially without ever self-joining — the corpus. Kept separate
    from :func:`_srp_candidates` (which feeds the corpus×corpus
    dedup path): the index is the durable artifact, the candidate
    self-join is one of its consumers' strategies; both derive their
    planes from the same ``_srp_weight`` md5 grid, so signatures are
    identical by construction (asserted in
    ``tests/test_round7_ops.py``)."""

    def build() -> DataFrame:
        from ..functions.vector import dim_of

        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        dim = dim_of(emb)
        key_sql = " + ".join(
            "(CASE WHEN ("
            + " + ".join(
                f"CAST(element_at(embedding, {d + 1}) AS DOUBLE) * "
                f"({_srp_weight(p, d)})"
                for d in range(dim)
            )
            + f") >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(_SRP_PLANES)
        )
        sig = fan_out(emb, spark).select(
            "vec_id", F.expr(key_sql).alias("key")
        )
        return sig.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(_SRP_BANDS - 1))).alias("b"),
            F.expr(
                f"shiftright(key, {_SRP_BAND_BITS} * b)"
                f" & {(1 << _SRP_BAND_BITS) - 1}"
            ).alias("bval"),
        )

    from ._shared import shared_df

    return shared_df("srp_bands", sf_dir, spark, build)


@query(
    "pipeline_semantic_ingest",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id, embedding, {_SRP_KEY_SQL} AS key
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id, b,
             (key >> ({_SRP_BAND_BITS} * b)) & {(1 << _SRP_BAND_BITS) - 1} AS bval
      FROM proj, (SELECT unnest(range({_SRP_BANDS})) AS b)
    ),
    cand AS (
      SELECT DISTINCT LEAST(a.vec_id, n.vec_id) AS vec_a,
             GREATEST(a.vec_id, n.vec_id) AS vec_b
      FROM bands a JOIN bands n
        ON a.b = n.b AND a.bval = n.bval AND a.vec_id <> n.vec_id
      WHERE n.vec_id % 10 = 9
    ),
    dup AS (
      SELECT vec_a, vec_b FROM cand
      JOIN embeddings ea ON ea.vec_id = vec_a
      JOIN embeddings eb ON eb.vec_id = vec_b
      WHERE ROUND({sql_cosine('ea.embedding', 'eb.embedding')}, 6) >= 0.4
    ),
    rej AS (
      SELECT DISTINCT CASE
               WHEN vec_a % 10 = 9 AND vec_b % 10 <> 9 THEN vec_a
               ELSE vec_b
             END AS vec_id
      FROM dup
    )
    SELECT e.vec_id, e.label,
           CAST(len(e.embedding) AS BIGINT) AS n_dims
    FROM embeddings e
    WHERE e.vec_id % 10 = 9
      AND e.vec_id NOT IN (SELECT vec_id FROM rej)
    """,
)
def pipeline_semantic_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SemDeDup NIGHTLY-INGEST composition — the embedding-tier
    sibling of `pipeline_dedup_ingest`: a new batch of vectors
    (``vec_id % 10 == 9``, the repo's ingest stand-in) is admitted
    only if it survives semantic near-dup screening against the
    corpus, by probing the PERSISTED SRP band index
    (:func:`_srp_bands`) with the batch's band keys — the corpus is
    never re-banded and never self-joins, so per-ingest cost is
    O(batch), independent of corpus size.

    Rules mirror the lexical ingest exactly: a new vector whose
    exact cosine to ANY existing corpus vector is ≥ 0.4 is rejected
    unconditionally; within the batch, first-wins (lower vec_id
    admitted, higher rejected). The probe side is budget-enforced
    and BROADCAST (an over-sized batch fails fast with the
    partitioned-probe fallback named); candidates verify by the same
    Arrow-batched exact cosine the SRP pairs query certifies. The
    admitted rows are what a real pipeline appends to the vector
    store and hands to the index updater (their band rows append to
    the same index — proven durable/equal in
    ``tests/test_round7_ops.py``)."""
    bands = _srp_bands(spark, sf_dir)
    new = bands.filter(F.col("vec_id") % 10 == 9).select(
        F.col("vec_id").alias("vec_n"),
        F.col("b").alias("b_n"),
        F.col("bval").alias("bval_n"),
    )
    require_bounded(
        new,
        what="pipeline_semantic_ingest new-batch band keys",
        hint=(
            "The broadcast probe assumes an ingest-sized batch; for a "
            "batch this large drop the F.broadcast hint and run the same "
            "(b, bval) equi-join as a partitioned shuffle join against "
            "the persisted SRP index — identical semantics, only the "
            "probe strategy changes."
        ),
    )
    cand = (
        bands.join(
            F.broadcast(new),
            (F.col("b") == F.col("b_n"))
            & (F.col("bval") == F.col("bval_n"))
            & (F.col("vec_id") != F.col("vec_n")),
        )
        .select(
            F.least("vec_id", "vec_n").alias("vec_a"),
            F.greatest("vec_id", "vec_n").alias("vec_b"),
        )
        .distinct()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    dup = (
        _pair_cosine(spark, sf_dir, cand, "vec_a", "vec_b")
        .filter(F.round("cos_raw", 6) >= 0.4)
        .select("vec_a", "vec_b")
    )
    new_a = F.col("vec_a") % 10 == 9
    new_b = F.col("vec_b") % 10 == 9
    rejected = dup.select(
        F.when(new_a & ~new_b, F.col("vec_a"))
        .otherwise(F.col("vec_b"))
        .alias("vec_id")
    ).distinct()
    batch = emb.filter(F.col("vec_id") % 10 == 9)
    return batch.join(rejected, "vec_id", "left_anti").select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("n_dims"),
    )


@query(
    "sim_srp_recall_audit",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id, embedding, {_SRP_KEY_SQL} AS key
      FROM embeddings
    ),
    bands AS (
      SELECT vec_id, b,
             (key >> ({_SRP_BAND_BITS} * b)) & {(1 << _SRP_BAND_BITS) - 1} AS bval
      FROM proj, (SELECT unnest(range({_SRP_BANDS})) AS b)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.b = b.b AND a.bval = b.bval AND a.vec_id < b.vec_id
    ),
    srp AS (
      SELECT vec_a, vec_b FROM cand
      JOIN embeddings ea ON ea.vec_id = vec_a
      JOIN embeddings eb ON eb.vec_id = vec_b
      WHERE ROUND({sql_cosine('ea.embedding', 'eb.embedding')}, 6) >= 0.4
    ),
    truth AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ROUND({sql_cosine('a.embedding', 'b.embedding')}, 6) >= 0.4
    )
    SELECT (SELECT COUNT(*) FROM truth) AS n_true,
           (SELECT COUNT(*) FROM cand) AS n_candidates,
           (SELECT COUNT(*) FROM srp) AS n_retrieved,
           floor((CAST((SELECT COUNT(*) FROM srp) AS DOUBLE)
                  / (SELECT COUNT(*) FROM truth)) * 1000000 + 0.5)
             / 1000000 AS recall
    """,
)
def sim_srp_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT recall of the deterministic SRP-LSH tier against
    brute-force ground truth — because both sides are deterministic,
    the recall itself is an oracle-checked VALUE, not an asserted
    bound (the strongest form of ANN quality evidence this repo emits;
    the seeded pyspark.ml tier can only get the boolean-bounds form,
    `sim_ml_lsh_pairs`).

    Every SRP-verified pair passes the same cos ≥ 0.4 filter as the
    truth set, so retrieved ⊆ truth and recall = n_retrieved/n_true —
    one number that drops when bands/planes are mistuned for the
    corpus. Candidate count rides along: (n_candidates − n_retrieved)
    is the verification cost the banding wastes on false positives.
    At open-ended scale the truth side becomes a sampled audit (fixed
    doc sample, same shape); candidates and retrieved stay exact.
    """
    from .dedup import dedup_embedding_cosine_pairs

    truth = dedup_embedding_cosine_pairs(spark, sf_dir).select("vec_a", "vec_b")
    srp = sim_srp_lsh_pairs(spark, sf_dir).select("vec_a", "vec_b")
    cand = _srp_candidates(spark, sf_dir)
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(F.broadcast(cand.agg(F.count(F.lit(1)).alias("n_candidates"))))
        .crossJoin(F.broadcast(srp.agg(F.count(F.lit(1)).alias("n_retrieved"))))
        .select(
            "n_true",
            "n_candidates",
            "n_retrieved",
            (
                F.floor(
                    (F.col("n_retrieved").cast("double") / F.col("n_true"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("recall"),
        )
    )


@query(
    "sim_ivf_recall_audit",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM embeddings WHERE vec_id % {CENTROID_STRIDE} = 0
    ),
    vc AS (
      SELECT v.vec_id, c.cid, {_COS_VC} AS vcos,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {_COS_VC} DESC, c.cid) AS rn
      FROM embeddings v, cent c
    ),
    assign AS (SELECT vec_id, cid FROM vc WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM vc WHERE rn <= {NPROBE}),
    icand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE a.vec_id <> p.query_id
    ),
    iscored AS (
      SELECT c.query_id, c.neighbor_id,
             {sql_cosine('qa.embedding', 'qb.embedding')} AS cos_raw
      FROM icand c
      JOIN embeddings qa ON qa.vec_id = c.query_id
      JOIN embeddings qb ON qb.vec_id = c.neighbor_id
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_raw DESC, neighbor_id) AS rank
        FROM iscored
      ) WHERE rank <= {TOP_K}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_AB} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      ) WHERE rank <= {TOP_K}
    )
    SELECT (SELECT COUNT(DISTINCT query_id) FROM brute) AS n_queries,
           (SELECT COUNT(*) FROM brute) AS n_truth,
           (SELECT COUNT(*) FROM ivf JOIN brute
              USING (query_id, neighbor_id)) AS n_hits,
           floor((CAST((SELECT COUNT(*) FROM ivf JOIN brute
                          USING (query_id, neighbor_id)) AS DOUBLE)
                  / (SELECT COUNT(*) FROM brute)) * 1000000 + 0.5)
             / 1000000 AS recall_at_{TOP_K}
    """,
)
def sim_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT recall@{TOP_K} of the stride-centroid IVF tier against the
    brute-force truth — the SRP audit's sibling for the
    coarse-quantization path: both tiers are deterministic, so the
    recall is an oracle-checked VALUE (the seeded kmeans tier keeps
    its bounds form, `sim_ivf_kmeans_topk`). The number quantifies
    exactly what NPROBE={NPROBE} probes of a {CENTROID_STRIDE}-stride
    codebook give up: true neighbors living in unprobed inverted lists
    are unreachable by construction, and a codebook/NPROBE mistune
    moves this single number before it corrupts any downstream result.

    Both sides are the registered, individually-certified queries —
    one equi-join on (query, neighbor) and three count aggregates on
    top; at open-ended scale the brute-force truth becomes a sampled
    query panel (same shape, exact per sample).
    """
    ivf = sim_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    brute = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    hits = ivf.join(brute, ["query_id", "neighbor_id"])
    return (
        brute.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_truth"),
        )
        .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_hits"))))
        .select(
            "n_queries",
            "n_truth",
            "n_hits",
            (
                F.floor(
                    (F.col("n_hits").cast("double") / F.col("n_truth"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias(f"recall_at_{TOP_K}"),
        )
    )


def _quant_max_abs(bmat):
    """Shared guard for the int8/PQ quantization kernels: the symmetric
    scale 127/max|x| divides by the corpus absmax, so an EMPTY corpus
    matrix (``.max()`` raises on numpy) or an ALL-ZERO one (division by
    zero → NaN codes → garbage top-k) must fail loudly — the same
    degenerate-input discipline the stats operators apply. Returns the
    strictly-positive absmax."""
    import numpy as np

    if bmat.size == 0:
        raise ValueError(
            "int8/PQ quantization: empty embedding corpus — nothing to "
            "derive the symmetric scale from (check the embeddings table "
            "and any upstream filters)"
        )
    max_abs = float(np.abs(bmat).max())
    if max_abs == 0.0:
        raise ValueError(
            "int8/PQ quantization: all-zero embedding corpus — the "
            "symmetric scale 127/max|x| is undefined; quantizing a "
            "degenerate corpus would rank garbage (clean the embeddings "
            "instead)"
        )
    return max_abs


def _int8_topk_against(bc, k: int):
    """mapInPandas generator: int8 symmetric scalar quantization of
    both sides against the shared broadcast matrix, EXACT int64 dot
    products, top-k (qdot desc, id asc) per query row. The scale is
    derived from the broadcast corpus itself (127/max|x|), so workers
    never need a second pass or a driver scalar."""
    import numpy as np
    import pandas as pd

    def quant(M, max_abs):
        return np.clip(
            np.floor(M * 127.0 / max_abs + 0.5), -127, 127
        ).astype(np.int64)

    def gen(batches):
        bids, bmat, _ = bc.value
        max_abs = _quant_max_abs(bmat)
        Q = quant(bmat, max_abs)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ia = pdf["vec_id"].to_numpy()
            qa = quant(A, max_abs)
            dot = qa @ Q.T
            self_mask = ia[:, None] == bids[None, :]
            dotm = np.where(self_mask, np.int64(-(1 << 62)), dot)
            order = np.lexsort(
                (np.broadcast_to(bids, dotm.shape), -dotm), axis=1
            )
            top = order[:, :k]
            n, kk = top.shape
            rows_idx = np.repeat(np.arange(n), kk)
            yield pd.DataFrame(
                {
                    "query_id": ia[rows_idx],
                    "rank": np.tile(np.arange(1, kk + 1), n),
                    "neighbor_id": bids[top].ravel(),
                    "qdot": dotm[rows_idx, top.ravel()],
                }
            )

    return gen


_SQL_QDOT = (
    "CAST(list_sum(list_transform(range(len(a.qv)), "
    "i -> a.qv[i+1] * b.qv[i+1])) AS BIGINT)"
)


@query(
    "sim_int8_quant_recall",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(list_max(list_transform(embedding,
               v -> abs(CAST(v AS DOUBLE))))) AS max_abs
      FROM embeddings
    ),
    q AS (
      SELECT vec_id,
             list_transform(embedding, v ->
               CAST(GREATEST(-127.0, LEAST(127.0,
                 floor(CAST(v AS DOUBLE) * 127.0 / max_abs + 0.5)))
               AS BIGINT)) AS qv
      FROM embeddings, mx
    ),
    scored AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_SQL_QDOT} AS qdot
      FROM q a JOIN q b ON a.vec_id <> b.vec_id
    ),
    qtop AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qdot DESC, neighbor_id) AS rk
        FROM scored
      ) WHERE rk <= {TOP_K}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_AB} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      ) WHERE rank <= {TOP_K}
    )
    SELECT (SELECT COUNT(DISTINCT query_id) FROM brute) AS n_queries,
           (SELECT COUNT(*) FROM brute) AS n_truth,
           (SELECT COUNT(*) FROM qtop JOIN brute
              USING (query_id, neighbor_id)) AS n_hits,
           floor((CAST((SELECT COUNT(*) FROM qtop JOIN brute
                          USING (query_id, neighbor_id)) AS DOUBLE)
                  / (SELECT COUNT(*) FROM brute)) * 1000000 + 0.5)
             / 1000000 AS recall_at_{TOP_K}
    """,
)
def sim_int8_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT recall@{TOP_K} of int8 symmetric scalar quantization —
    the memory-compression tier the SRP/IVF audits don't cover: store
    4 B/vec-dim as 1 B (plus one global scale 127/max|x|), rank by
    integer dot product, and measure exactly what the rounding costs
    against the float brute-force truth. Because quantization is
    floor(x·127/max+0.5) — deterministic, engine-identical IEEE
    arithmetic — and the quantized scores are EXACT int64, the recall
    is an oracle-checked VALUE like its SRP/IVF siblings, not a
    bound. At 100 TB this is the tier that keeps a 25 GB shard of
    fp32 embeddings in 6 GB of executor memory; the audit number is
    what you check before turning it on.

    Same blocked-kernel shape as `sim_topk_bruteforce` (shared
    broadcast matrix, Arrow batches, int64 matmul per block); truth
    side IS the certified brute-force query, so the audit adds one
    (query, neighbor) equi-join and three counts. Sampled query panel
    at open-ended scale, same shape.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    qtop = fan_out(emb, spark).mapInPandas(
        _int8_topk_against(bc, TOP_K),
        schema="query_id long, rank long, neighbor_id long, qdot long",
    ).select("query_id", "neighbor_id")
    brute = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    hits = qtop.join(brute, ["query_id", "neighbor_id"])
    return (
        brute.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_truth"),
        )
        .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_hits"))))
        .select(
            "n_queries",
            "n_truth",
            "n_hits",
            (
                F.floor(
                    (F.col("n_hits").cast("double") / F.col("n_truth"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias(f"recall_at_{TOP_K}"),
        )
    )


# --- product quantization (PQ) audit tier -------------------------------
# M subspaces of the 64-dim embedding; codebook = the int8-quantized
# sub-vectors of every PQ_STRIDE-th vector (the same deterministic
# stride-codebook device as the IVF coarse tier, but a finer stride) —
# ~50 codewords per subspace at sf0.01.
PQ_M = 16
PQ_SUB = 4  # dims per subspace (PQ_M * PQ_SUB = embedding dim)
PQ_STRIDE = 10  # finer than the IVF tier's CENTROID_STRIDE (~50 codewords/subspace at sf0.01)

# int8 symmetric quantization of the whole corpus, as DuckDB SQL
# (identical arithmetic to _int8_topk_against's quant()).
_SQL_INT8_CORPUS = """
    mx AS (
      SELECT MAX(list_max(list_transform(embedding,
               v -> abs(CAST(v AS DOUBLE))))) AS max_abs
      FROM embeddings
    ),
    q AS (
      SELECT vec_id,
             list_transform(embedding, v ->
               CAST(GREATEST(-127.0, LEAST(127.0,
                 floor(CAST(v AS DOUBLE) * 127.0 / max_abs + 0.5)))
               AS BIGINT)) AS qv
      FROM embeddings, mx
    )
"""


def _pq_kernels(bc, k: int, stride: int):
    """Build (pq_gen, exact_gen) mapInPandas generators sharing one
    int8-quantized corpus: `exact_gen` ranks by exact int64 squared-L2
    (the truth the product quantizer approximates); `pq_gen` encodes
    every corpus vector as PQ_M codeword ids over the stride-centroid
    codebook and ranks by the ADC lookup-table distance. Everything
    after the shared int8 step is integer arithmetic — bit-exact
    cross-engine, so the recall is an oracle-checked VALUE."""
    import numpy as np
    import pandas as pd

    def corpus():
        bids, bmat, _ = bc.value
        order = np.argsort(bids, kind="stable")
        ids = bids[order]
        max_abs = _quant_max_abs(bmat)
        Q = np.clip(
            np.floor(bmat[order] * 127.0 / max_abs + 0.5), -127, 127
        ).astype(np.int64)
        return ids, Q

    def quant_batch(pdf, max_abs):
        A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        return np.clip(
            np.floor(A * 127.0 / max_abs + 0.5), -127, 127
        ).astype(np.int64)

    def emit(ia, ids, score, k, asc=True):
        # rank by (score asc, id asc); self already masked to +inf-ish
        s = score if asc else -score
        order = np.lexsort((np.broadcast_to(ids, s.shape), s), axis=1)
        top = order[:, :k]
        n, kk = top.shape
        rows_idx = np.repeat(np.arange(n), kk)
        return pd.DataFrame(
            {
                "query_id": ia[rows_idx],
                "rank": np.tile(np.arange(1, kk + 1), n),
                "neighbor_id": ids[top].ravel(),
            }
        )

    BIG = np.int64(1 << 62)

    def exact_gen(batches):
        bids, bmat, _ = bc.value
        max_abs = _quant_max_abs(bmat)
        ids, Q = corpus()
        for pdf in batches:
            if not len(pdf):
                continue
            qa = quant_batch(pdf, max_abs)
            ia = pdf["vec_id"].to_numpy()
            # ||a-b||^2 pairwise, exact int64
            d2 = (
                (qa * qa).sum(axis=1)[:, None]
                + (Q * Q).sum(axis=1)[None, :]
                - 2 * (qa @ Q.T)
            )
            d2 = np.where(ia[:, None] == ids[None, :], BIG, d2)
            yield emit(ia, ids, d2, k)

    def pq_gen(batches):
        bids, bmat, _ = bc.value
        max_abs = _quant_max_abs(bmat)
        ids, Q = corpus()
        cmask = ids % stride == 0
        C = Q[cmask]  # (n_cent, dim), rows sorted by centroid id asc
        # encode the corpus: per subspace, nearest codeword (tie → first
        # = smallest centroid id, matching the oracle's ORDER BY d, cid).
        # Distances use the int64 matmul identity q² + c² − 2q·c —
        # EXACT integer algebra, bit-identical to the subtract-square
        # broadcast it replaces, at a fraction of the temporary memory.
        codes = np.empty((len(ids), PQ_M), dtype=np.int64)
        for m in range(PQ_M):
            lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
            Qm, Cm = Q[:, lo:hi], C[:, lo:hi]
            dm = (
                (Qm * Qm).sum(axis=1)[:, None]
                + (Cm * Cm).sum(axis=1)[None, :]
                - 2 * (Qm @ Cm.T)
            )
            codes[:, m] = dm.argmin(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            qa = quant_batch(pdf, max_abs)
            ia = pdf["vec_id"].to_numpy()
            adc = np.zeros((len(ia), len(ids)), dtype=np.int64)
            for m in range(PQ_M):
                lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
                qm, Cm = qa[:, lo:hi], C[:, lo:hi]
                lut = (
                    (qm * qm).sum(axis=1)[:, None]
                    + (Cm * Cm).sum(axis=1)[None, :]
                    - 2 * (qm @ Cm.T)
                )  # (n, n_cent), exact int64
                adc += lut[:, codes[:, m]]
            adc = np.where(ia[:, None] == ids[None, :], BIG, adc)
            yield emit(ia, ids, adc, k)

    return pq_gen, exact_gen


PQ_KMEANS_ITERS = 20  # fixed Lloyd iterations — determinism over convergence
# Bounds for the TRAINED-codebook audit (the sim_ivf_kmeans_topk
# pattern): measured recall@5 = 0.5024 at sf0.01 vs the stride
# codebook's 0.3528 — a +42% relative recall gain at identical
# codebook size/memory, even on near-random synthetics. Floor set
# safely below the measured value; the must-beat-stride margin is
# the claim that training pays.
_PQ_TRAINED_FLOOR = 0.42
_PQ_TRAINED_STRIDE_MARGIN = 0.02


def _pq_train_codebooks(Q, ids, stride):
    """Per-subspace k-means codebooks over the int8-quantized corpus:
    Lloyd refinement INITIALIZED from the deterministic stride
    codewords (so codeword count matches the stride tier and the
    comparison is apples-to-apples), fixed ``PQ_KMEANS_ITERS``
    iterations, assignment ties -> lowest codeword id (argmin-first,
    the same tie rule the encoders use), empty clusters keep their
    previous centroid. Deterministic given the corpus — no RNG — but
    the float means are not SQL-reproducible, so the certified
    surface is the bounds-form recall summary. At open scale you
    train on a sample (one driver-side pass over ≤ the broadcast
    budget) and ship the codebooks as a tiny broadcast, exactly as
    here."""
    import numpy as np

    cmask = ids % stride == 0
    books = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
        X = Q[:, lo:hi].astype(np.float64)
        C = X[cmask].copy()
        # matmul form of the pairwise distance (x² + c² − 2x·c): the
        # O(n·k·d) broadcast temporary was the training-time hot spot;
        # BLAS keeps it cache-blocked. Argmin ties still resolve to the
        # lowest codeword id (np.argmin is first-of-ties).
        x2 = (X * X).sum(axis=1)
        k = len(C)
        for _ in range(PQ_KMEANS_ITERS):
            d = x2[:, None] + (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            a = d.argmin(axis=1)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            nz = cnt > 0
            sums = np.stack(
                [
                    np.bincount(a, weights=X[:, dd], minlength=k)
                    for dd in range(X.shape[1])
                ],
                axis=1,
            )
            C[nz] = sums[nz] / cnt[nz, None]
        books.append(C)
    return books


def _pq_fit_trained(bc):
    """Driver-side ONE-TIME fit of the trained-PQ artifact from the
    shared corpus broadcast: per-subspace Lloyd codebooks
    (:func:`_pq_train_codebooks`) plus the corpus PQ codes encoded
    against them. Returned as a plain tuple for
    :func:`~catme_etl_spark.operators._shared.shared_broadcast`, so
    the (identical, deterministic) training runs ONCE per
    (sf_dir, session) and every scan task reads the finished
    codebooks from the broadcast — the round-7 verdict's fix for the
    per-task retraining that dominated this audit's wall clock (the
    training is work×tasks for identical output otherwise). This is
    also the real-scale shape: train on a bounded sample driver-side,
    ship kilobytes of codebooks, stream the ADC scan."""
    import numpy as np

    bids, bmat, _ = bc.value
    max_abs = _quant_max_abs(bmat)
    order = np.argsort(bids, kind="stable")
    ids = bids[order]
    Q = np.clip(
        np.floor(bmat[order] * 127.0 / max_abs + 0.5), -127, 127
    ).astype(np.int64)
    books = _pq_train_codebooks(Q, ids, PQ_STRIDE)
    codes = np.empty((len(ids), PQ_M), dtype=np.int64)
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
        dm = ((Q[:, None, lo:hi].astype(np.float64)
               - books[m][None, :, :]) ** 2).sum(axis=2)
        codes[:, m] = dm.argmin(axis=1)
    return ids, max_abs, books, codes


def _pq_trained_kernel(trained_bc, k: int):
    """mapInPandas generator: PQ-ADC ranking against TRAINED
    (per-subspace k-means) codebooks. Same blocked scan shape as the
    stride kernel in :func:`_pq_kernels`, but the codebooks and corpus
    codes arrive PRE-TRAINED in ``trained_bc`` (see
    :func:`_pq_fit_trained`) — tasks only quantize their query batch
    and run the integer ADC lookup, never retrain."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        ids, max_abs, books, codes = trained_bc.value
        BIG = np.float64(1e30)
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            qa = np.clip(
                np.floor(A * 127.0 / max_abs + 0.5), -127, 127
            ).astype(np.int64)
            ia = pdf["vec_id"].to_numpy()
            adc = np.zeros((len(ia), len(ids)), dtype=np.float64)
            for m in range(PQ_M):
                lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
                lut = ((qa[:, None, lo:hi].astype(np.float64)
                        - books[m][None, :, :]) ** 2).sum(axis=2)
                adc += lut[:, codes[:, m]]
            adc = np.where(ia[:, None] == ids[None, :], BIG, adc)
            srt = np.lexsort((np.broadcast_to(ids, adc.shape), adc), axis=1)
            top = srt[:, :k]
            n, kk = top.shape
            rows_idx = np.repeat(np.arange(n), kk)
            yield pd.DataFrame(
                {
                    "query_id": ia[rows_idx],
                    "rank": np.tile(np.arange(1, kk + 1), n),
                    "neighbor_id": ids[top].ravel(),
                }
            )

    return gen


@query(
    "sim_pq_trained_recall",
    oracle=f"""
    SELECT COUNT(DISTINCT vec_id) AS n_queries,
           {TOP_K} AS top_k,
           TRUE AS trained_floor_ok,
           TRUE AS at_least_stride_ok
    FROM embeddings
    """,
)
def sim_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED-codebook PQ rung — the tier `sim_pq_adc_recall`'s
    honest 0.353 stride recall says to build next: per-subspace
    k-means codebooks (Lloyd over the int8 sub-vectors, initialized
    from the stride codewords so codeword count and memory footprint
    are identical) re-ranked by the same ADC scan. Measured at
    sf0.01: recall@{TOP_K} = 0.5024 trained vs 0.3528 stride — a
    +42% relative recall gain at zero extra memory, even on
    near-random synthetic embeddings (no manifold to exploit, the
    regime PQ degrades in) — the certified evidence that the
    training pass pays for itself; on clustered production
    embeddings the gap widens.

    The float k-means means aren't SQL-reproducible, so certification
    uses the `sim_ivf_kmeans_topk` bounds pattern: the query count is
    oracle-matched and two booleans assert (a) trained recall ≥
    {_PQ_TRAINED_FLOOR:.0%} of the exact int8-L2 truth and (b)
    trained recall beats the certified stride tier minus a
    {_PQ_TRAINED_STRIDE_MARGIN:.0%} margin — a training regression
    flips a boolean and hash-mismatches. Truth and stride sides are
    the exact same kernels the stride audit certifies value-exactly.

    Scale shape: three blocked mapInPandas scans over one shared
    broadcast matrix (truth, stride-ADC, trained-ADC) + two
    (query, neighbor) equi-joins + counts. The codebooks train ONCE
    driver-side from the shared matrix and ship pre-trained in their
    own broadcast (:func:`_pq_fit_trained`) — scan tasks never
    retrain. At 100 TB the training input becomes a bounded sample
    and the ADC scan streams {PQ_M}-byte codes — the same plan minus
    the audit joins."""
    from ._shared import shared_broadcast

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    trained_bc = shared_broadcast(
        "pq_trained_artifact", sf_dir, spark, lambda: _pq_fit_trained(bc)
    )
    pq_gen, exact_gen = _pq_kernels(bc, TOP_K, PQ_STRIDE)
    trained_gen = _pq_trained_kernel(trained_bc, TOP_K)
    schema = "query_id long, rank long, neighbor_id long"
    exact = fan_out(emb, spark).mapInPandas(exact_gen, schema=schema).select(
        "query_id", "neighbor_id"
    )
    stride = fan_out(emb, spark).mapInPandas(pq_gen, schema=schema).select(
        "query_id", "neighbor_id"
    )
    trained = fan_out(emb, spark).mapInPandas(
        trained_gen, schema=schema
    ).select("query_id", "neighbor_id")
    t_hit = trained.join(exact, ["query_id", "neighbor_id"])
    s_hit = stride.join(exact, ["query_id", "neighbor_id"])
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("_n_truth"),
        )
        .crossJoin(F.broadcast(t_hit.agg(F.count(F.lit(1)).alias("_n_t"))))
        .crossJoin(F.broadcast(s_hit.agg(F.count(F.lit(1)).alias("_n_s"))))
        .select(
            "n_queries",
            F.lit(TOP_K).alias("top_k"),
            (
                F.col("_n_t") >= _PQ_TRAINED_FLOOR * F.col("_n_truth")
            ).alias("trained_floor_ok"),
            (
                F.col("_n_t")
                >= F.col("_n_s") - _PQ_TRAINED_STRIDE_MARGIN * F.col("_n_truth")
            ).alias("at_least_stride_ok"),
        )
    )


# Sampled-panel truth tier (round-7 verdict item #4; sizing fixed
# round 9 per the round-8 verdict): the production form of the
# quadratic ANN audits. The panel is the first PQ_PANEL_N vectors in
# md5(vec_id) order — a FIXED-SIZE deterministic sample, so the exact
# truth side is genuinely O(PQ_PANEL_N · corpus) at ANY corpus size
# (the round-8 `vec_id % 7` panel grew with the corpus, leaving the
# audit quadratic with a 1/7 constant). md5 of the decimal id string
# is independent of `vec_id % PQ_STRIDE` residue, preserving the
# no-self-quantizing-bias property the old co-prime modulus bought.
PQ_PANEL_N = 256


@query(
    "sim_pq_recall_sampled_panel",
    oracle=f"""
    SELECT CAST(LEAST({PQ_PANEL_N}, COUNT(*)) AS BIGINT) AS n_queries,
           {TOP_K} AS top_k,
           TRUE AS trained_floor_ok,
           TRUE AS at_least_stride_ok
    FROM embeddings
    """,
)
def sim_pq_recall_sampled_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAMPLED-PANEL form of the trained-PQ recall audit — the one
    that stays runnable as the corpus grows: `sim_pq_trained_recall`
    scores EVERY vector as a query (truth side O(corpus²), the scaling
    ladder's only >0.5 data term), while this audit scores a
    FIXED-SIZE deterministic query panel — the first {PQ_PANEL_N}
    vectors in ``md5(vec_id)`` order — exactly against the full
    corpus, O({PQ_PANEL_N}·corpus) at any scale, and certifies the
    SAME claims in the same bounds form: (a) trained-codebook
    recall@{TOP_K} ≥ {_PQ_TRAINED_FLOOR:.0%} of the exact int8-L2
    truth and (b) trained beats the stride codebook minus a
    {_PQ_TRAINED_STRIDE_MARGIN:.0%} margin. The audit answers with a
    fraction of the compute, which is why production recall
    monitoring runs THIS form on a schedule and the all-pairs form
    only on demand.

    Panel discipline: membership is a pure function of vec_id (md5 of
    its decimal string — identical bytes on any engine), so re-runs,
    engines, and cluster sizes audit the identical query set; hash
    order is independent of the ``% {PQ_STRIDE}`` codeword-donor
    residue, so panel composition carries no self-quantizing bias.
    Corpora smaller than the panel budget are audited in full
    (n_queries = min({PQ_PANEL_N}, corpus)).

    Scale shape: panel selection is one TakeOrderedAndProject over
    (md5, vec_id) — an O(corpus) scan returning {PQ_PANEL_N} rows —
    then the same three blocked mapInPandas scans and two equi-joins
    as the full audit, fed only panel rows against the broadcast
    corpus. Codebooks arrive pre-trained via the shared
    :func:`_pq_fit_trained` broadcast (trained once per session/
    sf_dir, shared with the full audit)."""
    from ._shared import shared_broadcast

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    trained_bc = shared_broadcast(
        "pq_trained_artifact", sf_dir, spark, lambda: _pq_fit_trained(bc)
    )
    panel = (
        emb.withColumn("_pk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_pk", "vec_id")
        .limit(PQ_PANEL_N)
        .drop("_pk")
    )
    pq_gen, exact_gen = _pq_kernels(bc, TOP_K, PQ_STRIDE)
    trained_gen = _pq_trained_kernel(trained_bc, TOP_K)
    schema = "query_id long, rank long, neighbor_id long"
    exact = fan_out(panel, spark).mapInPandas(exact_gen, schema=schema).select(
        "query_id", "neighbor_id"
    )
    stride = fan_out(panel, spark).mapInPandas(pq_gen, schema=schema).select(
        "query_id", "neighbor_id"
    )
    trained = fan_out(panel, spark).mapInPandas(
        trained_gen, schema=schema
    ).select("query_id", "neighbor_id")
    t_hit = trained.join(exact, ["query_id", "neighbor_id"])
    s_hit = stride.join(exact, ["query_id", "neighbor_id"])
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("_n_truth"),
        )
        .crossJoin(F.broadcast(t_hit.agg(F.count(F.lit(1)).alias("_n_t"))))
        .crossJoin(F.broadcast(s_hit.agg(F.count(F.lit(1)).alias("_n_s"))))
        .select(
            "n_queries",
            F.lit(TOP_K).alias("top_k"),
            (
                F.col("_n_t") >= _PQ_TRAINED_FLOOR * F.col("_n_truth")
            ).alias("trained_floor_ok"),
            (
                F.col("_n_t")
                >= F.col("_n_s") - _PQ_TRAINED_STRIDE_MARGIN * F.col("_n_truth")
            ).alias("at_least_stride_ok"),
        )
    )


@query(
    "sim_pq_adc_recall",
    oracle=f"""
    WITH {_SQL_INT8_CORPUS},
    sub AS (SELECT UNNEST(range({PQ_M})) AS m),
    cent AS (SELECT vec_id AS cid, qv AS cqv FROM q
             WHERE vec_id % {PQ_STRIDE} = 0),
    subdist AS (
      SELECT q.vec_id, sub.m, cent.cid,
             CAST(list_sum(list_transform(range({PQ_SUB}), i ->
               (q.qv[sub.m * {PQ_SUB} + i + 1]
                - cent.cqv[sub.m * {PQ_SUB} + i + 1])
               * (q.qv[sub.m * {PQ_SUB} + i + 1]
                  - cent.cqv[sub.m * {PQ_SUB} + i + 1])))
             AS BIGINT) AS d
      FROM q, sub, cent
    ),
    codes AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, cid) AS rn
        FROM subdist
      ) WHERE rn = 1
    ),
    adc AS (
      SELECT s.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(s.d) AS BIGINT) AS adc_d
      FROM codes c
      JOIN subdist s ON s.m = c.m AND s.cid = c.cid
      WHERE s.vec_id <> c.vec_id
      GROUP BY 1, 2
    ),
    pqtop AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_d, neighbor_id) AS rk
        FROM adc
      ) WHERE rk <= {TOP_K}
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(a.qv)), i ->
                   (a.qv[i+1] - b.qv[i+1]) * (a.qv[i+1] - b.qv[i+1])))
                 AS BIGINT), b.vec_id) AS rk
        FROM q a JOIN q b ON a.vec_id <> b.vec_id
      ) WHERE rk <= {TOP_K}
    )
    SELECT (SELECT COUNT(DISTINCT query_id) FROM exact) AS n_queries,
           (SELECT COUNT(*) FROM exact) AS n_truth,
           (SELECT COUNT(*) FROM pqtop JOIN exact
              USING (query_id, neighbor_id)) AS n_hits,
           floor((CAST((SELECT COUNT(*) FROM pqtop JOIN exact
                          USING (query_id, neighbor_id)) AS DOUBLE)
                  / (SELECT COUNT(*) FROM exact)) * 1000000 + 0.5)
             / 1000000 AS recall_at_{TOP_K}
    """,
)
def sim_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT recall@{TOP_K} of product quantization with asymmetric
    distance computation (ADC) — the last rung of the repo's
    quantization ladder (IVF coarse codebook → SRP binary sketch →
    int8 scalar → PQ sub-vector codebooks). The 64-dim int8 vector is
    split into {PQ_M} subspaces of {PQ_SUB} dims; each sub-vector is
    replaced by the id of its nearest codeword (the int8 sub-vectors
    of every {PQ_STRIDE}-th vector — same deterministic
    stride-codebook device as the IVF tier, finer stride), so a vector stores
    {PQ_M} small ids instead of 64 floats. Queries stay unquantized
    on the PQ axis: ADC sums {PQ_M} lookup-table sub-distances.
    Every step after the shared int8 quantization is int64
    arithmetic, so encode, ADC ranking, and the exact squared-L2
    truth are all bit-identical cross-engine and the recall is an
    oracle-checked VALUE — measuring exactly what the {PQ_M}-byte
    code costs versus the 64-byte int8 vector it compresses 4×.
    Measured: recall@5 = 0.35 at sf0.01 — the synthetic embeddings
    are near-random (no manifold for the codebook to exploit), which
    is precisely the regime PQ is known to degrade in; on clustered
    production embeddings the same audit is the evidence that a
    TRAINED (k-means) codebook and/or OPQ rotation is worth its
    build cost. The audit exists to make that call a measured one.

    Spark side: one shared broadcast matrix, two blocked integer
    kernels (codebook encode once per task, ADC via per-query LUT —
    the textbook PQ scan shape that at 100 TB streams codes, not
    vectors); the audit join is (query, neighbor) equi-join + three
    counts. Truth becomes a sampled query panel at open-ended scale.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    pq_gen, exact_gen = _pq_kernels(bc, TOP_K, PQ_STRIDE)
    schema = "query_id long, rank long, neighbor_id long"
    pqtop = fan_out(emb, spark).mapInPandas(pq_gen, schema=schema).select(
        "query_id", "neighbor_id"
    )
    exact = fan_out(emb, spark).mapInPandas(exact_gen, schema=schema).select(
        "query_id", "neighbor_id"
    )
    hits = pqtop.join(exact, ["query_id", "neighbor_id"])
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("n_truth"),
        )
        .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("n_hits"))))
        .select(
            "n_queries",
            "n_truth",
            "n_hits",
            (
                F.floor(
                    (F.col("n_hits").cast("double") / F.col("n_truth"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias(f"recall_at_{TOP_K}"),
        )
    )


@query(
    "emb_dimension_profile",
    oracle="""
    SELECT dim,
           floor(AVG(v) * 100000 + 0.5) / 100000        AS mean_v,
           floor(stddev_pop(v) * 100000 + 0.5) / 100000 AS std_v,
           floor(MIN(v) * 100000 + 0.5) / 100000        AS min_v,
           floor(MAX(v) * 100000 + 0.5) / 100000        AS max_v
    FROM (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    )
    GROUP BY dim
    """,
)
def emb_dimension_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile of the embedding corpus —
    the vector-store health check run before building any index: a
    dimension with collapsed variance contributes nothing to distances
    (dead dimension → PQ subspaces waste bits on it), a mean far from
    zero says the corpus isn't centered (hurts SRP hyperplane balance),
    and out-of-family min/max flags corrupt vectors. One row per
    dimension regardless of corpus size.

    Scale shape: posexplode to (dim, value) rows, then ONE map-side-
    combinable hash-agg into |dims| rows — the same shuffle shape as
    `embeddings_centroid_by_label` (partial (sum, sumsq, count, min,
    max) per task per dim, never raw vectors). Float32 inputs widen to
    double exactly; population stddev on both engines; the module's
    half-away idiom floor(x*1e5+0.5)/1e5 — written identically on both
    engines, deterministic for either sign, and never producing -0.0 —
    pins accumulation-order noise (F.round vs DuckDB ROUND disagree on
    binary ties)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("v").cast("double")

    def _r5(c):
        return F.floor(c * 100000 + F.lit(0.5)) / 100000

    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            _r5(F.avg(v)).alias("mean_v"),
            _r5(F.stddev_pop(v)).alias("std_v"),
            _r5(F.min(v)).alias("min_v"),
            _r5(F.max(v)).alias("max_v"),
        )
    )


@query(
    "sim_norm_audit",
    oracle=f"""
    WITH n AS (
      SELECT floor({SQL_NORM.format(a='embedding')} * 1000000 + 0.5)
               / 1000000 AS nr
      FROM embeddings
    )
    SELECT CAST(FLOOR(nr / 0.25) AS BIGINT)        AS norm_bin,
           CAST(COUNT(*) AS BIGINT)                AS n_vecs,
           floor(AVG(nr) * 10000 + 0.5) / 10000    AS avg_norm
    FROM n GROUP BY 1
    """,
)
def sim_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm histogram of the embedding corpus (0.25-wide bins) —
    the degenerate-vector sweep run before any cosine-based stage:
    bin 0 holds zero/near-zero vectors (cosine undefined — the
    division-by-zero inputs the quantization kernels guard against),
    and a multi-modal histogram means mixed encoder versions in one
    corpus, which silently breaks dot-product comparability.

    Scale shape: one narrow scan — the norm is a JVM-side sequential
    fold per row (`functions.vector.norm`, same left-to-right order as
    the DuckDB oracle, so the doubles agree to the last ulp BEFORE
    rounding) — then a map-side-combinable agg into a constant-size
    bin grid. Nothing but the histogram crosses the driver. Both
    roundings use the module's half-away idiom floor(x*10^k+0.5)/10^k
    written identically on both engines (F.round vs DuckDB ROUND
    disagree on binary ties)."""
    from ..functions.vector import norm

    n = load_table(spark, sf_dir, "embeddings").select(
        (F.floor(norm(F.col("embedding")) * 1000000 + F.lit(0.5)) / 1000000)
        .alias("nr")
    )
    return n.groupBy(
        F.floor(F.col("nr") / 0.25).cast("long").alias("norm_bin")
    ).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.floor(F.avg("nr") * 10000 + F.lit(0.5)) / 10000).alias("avg_norm"),
    )


@query(
    "sim_centroid_distance_matrix",
    oracle="""
    WITH c AS (
      SELECT label, dim, ROUND(AVG(v), 5) + 0.0 AS cv
      FROM (
        SELECT label, generate_subscripts(embedding, 1) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
      )
      GROUP BY label, dim
    )
    SELECT a.label AS label_a, b.label AS label_b,
           floor(SQRT(SUM((a.cv - b.cv) * (a.cv - b.cv)))
                 * 10000 + 0.5) / 10000 AS l2_dist,
           floor(SUM(a.cv * b.cv)
                 / (SQRT(SUM(a.cv * a.cv)) * SQRT(SUM(b.cv * b.cv)))
                 * 10000 + 0.5) / 10000 AS cosine
    FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def sim_centroid_distance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-centroid distance matrix (L2 + cosine per label pair) —
    the cluster-separation audit on labeled embeddings: two label
    centroids at cosine ≈ 1 are duplicate classes (merge candidates /
    label bleed — cross-check the off-diagonal mass
    `sim_centroid_assign_audit` reports for the same pair), and the
    matrix is the K² summary a curator reads instead of n² vector
    pairs.

    Scale shape: consumes the `embeddings_centroid_by_label` hash-agg
    (the ONLY data-sized pass — partial per (label, dim), never raw
    vectors), then self-joins K×dims rows on dim: K²×dims intermediate
    rows, kilobytes at any corpus size. Centroids are rounded to 5 ON
    BOTH ENGINES before any pair math (the `sim_centroid_assign_audit`
    float discipline), so distances derive from identical inputs; the
    64-term pair sums are order-stable well past the final half-away
    floor-round at 4 decimals (the module's pinned idiom — F.round vs
    DuckDB ROUND disagree on binary ties, and cosine can be negative,
    where floor(x*1e4+0.5)/1e4 stays engine-identical)."""
    c = embeddings_centroid_by_label(spark, sf_dir)
    a = c.select(
        F.col("label").alias("label_a"), "dim", F.col("centroid_v").alias("va")
    )
    b = c.select(
        F.col("label").alias("label_b"),
        F.col("dim").alias("dim_b"),
        F.col("centroid_v").alias("vb"),
    )
    return (
        a.join(
            b,
            (F.col("dim") == F.col("dim_b")) & (F.col("label_a") < F.col("label_b")),
        )
        .groupBy("label_a", "label_b")
        .agg(
            (
                F.floor(
                    F.sqrt(
                        F.sum(
                            (F.col("va") - F.col("vb"))
                            * (F.col("va") - F.col("vb"))
                        )
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("l2_dist"),
            (
                F.floor(
                    F.sum(F.col("va") * F.col("vb"))
                    / (
                        F.sqrt(F.sum(F.col("va") * F.col("va")))
                        * F.sqrt(F.sum(F.col("vb") * F.col("vb")))
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("cosine"),
        )
    )


@query(
    "sim_ivf_nprobe_curve",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce
      FROM embeddings WHERE vec_id % {CENTROID_STRIDE} = 0
    ),
    vc AS (
      SELECT v.vec_id, c.cid, {_COS_VC} AS vcos,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                ORDER BY {_COS_VC} DESC, c.cid) AS rn
      FROM embeddings v, cent c
    ),
    assign AS (SELECT vec_id, cid FROM vc WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cid, rn AS probe_rn FROM vc WHERE rn <= 4
    ),
    icand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, p.probe_rn
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE a.vec_id <> p.query_id
    ),
    iscored AS (
      SELECT c.query_id, c.neighbor_id, c.probe_rn,
             {sql_cosine('qa.embedding', 'qb.embedding')} AS cos_raw
      FROM icand c
      JOIN embeddings qa ON qa.vec_id = c.query_id
      JOIN embeddings qb ON qb.vec_id = c.neighbor_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, probe_rn,
             SUM(CASE WHEN probe_rn <= 1 THEN 1 ELSE 0 END)
               OVER w AS rank1,
             SUM(CASE WHEN probe_rn <= 2 THEN 1 ELSE 0 END)
               OVER w AS rank2,
             SUM(CASE WHEN probe_rn <= 4 THEN 1 ELSE 0 END)
               OVER w AS rank4
      FROM iscored
      WINDOW w AS (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_AB} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      ) WHERE rank <= {TOP_K}
    ),
    hits AS (
      SELECT CAST(SUM(CASE WHEN r.probe_rn <= 1 AND r.rank1 <= {TOP_K}
                           THEN 1 ELSE 0 END) AS BIGINT) AS h1,
             CAST(SUM(CASE WHEN r.probe_rn <= 2 AND r.rank2 <= {TOP_K}
                           THEN 1 ELSE 0 END) AS BIGINT) AS h2,
             CAST(SUM(CASE WHEN r.probe_rn <= 4 AND r.rank4 <= {TOP_K}
                           THEN 1 ELSE 0 END) AS BIGINT) AS h4
      FROM ranked r JOIN brute b
        ON b.query_id = r.query_id AND b.neighbor_id = r.neighbor_id
    ),
    t AS (
      SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
             CAST(COUNT(*) AS BIGINT) AS n_truth
      FROM brute
    )
    SELECT nprobe, t.n_queries, t.n_truth, n_hits,
           floor(CAST(n_hits AS DOUBLE) / t.n_truth * 1000000 + 0.5)
             / 1000000 AS recall_at_{TOP_K}
    FROM (
      SELECT 1 AS nprobe, h1 AS n_hits FROM hits
      UNION ALL SELECT 2, h2 FROM hits
      UNION ALL SELECT 4, h4 FROM hits
    ) CROSS JOIN t
    """,
)
def sim_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{TOP_K} at nprobe = 1, 2, 4 from ONE candidate pass —
    the measured knob curve behind the IVF tier: `sim_ivf_recall_audit`
    certifies the operating point (NPROBE={NPROBE}); this curve
    certifies the TRADE, showing exactly what each extra probed list
    buys before anyone re-tunes a 100 TB vector store. Because probe
    sets nest (tier k ⊂ tier 4), candidates are scored once at
    nprobe=4 and each tier's top-{TOP_K} is recovered with a
    CONDITIONAL cumulative rank (count of tier-k candidates at or
    above each row in cosine order) — one sort serves all three tiers;
    no per-tier rescan, no per-tier shuffle.

    Scale shape: identical to the certified IVF plan (broadcast
    centroid matmul per Arrow batch, inverted-list equi-join on cid)
    with probe_rn carried through; the window is keyed by query; the
    brute-force truth is the bounded certified baseline (sampled query
    panel at open scale). Output is 3 rows.

    Float discipline: ranks, hit counts, and truth sizes are exact
    integers; both engines order candidates by the identically-
    computed float64 cosine (the certified audit discipline); recall
    is one division, half-away-floored at 6."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cent = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0)
    bc = shared_matrix_broadcast("ivf_centroids", sf_dir, spark, cent)
    near = fan_out(emb, spark).mapInPandas(
        _topk_against(bc, 4, exclude_self=False),
        schema="query_id long, rank long, neighbor_id long, cos_raw double",
    ).select(
        F.col("query_id").alias("vec_id"),
        F.col("rank").alias("rn"),
        F.col("neighbor_id").alias("cid"),
    )
    assign = near.filter(F.col("rn") == 1).select("vec_id", "cid")
    probes = near.select(
        F.col("vec_id").alias("query_id"), "cid", F.col("rn").alias("probe_rn")
    )
    # ids-only candidate stream; vectors attach via the broadcast
    # matrix inside _pair_cosine (guide §2.3/§8)
    lists = assign.select("cid", F.col("vec_id").alias("neighbor_id"))
    cand = probes.join(lists, "cid").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = _pair_cosine(
        spark,
        sf_dir,
        cand.select("query_id", "neighbor_id", "probe_rn"),
        "query_id",
        "neighbor_id",
    ).select("query_id", "neighbor_id", "probe_rn", "cos_raw")
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def tier_rank(k: int):
        return F.sum(
            F.when(F.col("probe_rn") <= k, F.lit(1)).otherwise(F.lit(0))
        ).over(w)

    ranked = scored.select(
        "query_id",
        "neighbor_id",
        "probe_rn",
        tier_rank(1).alias("rank1"),
        tier_rank(2).alias("rank2"),
        tier_rank(4).alias("rank4"),
    )
    brute = sim_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    hits = ranked.join(brute, ["query_id", "neighbor_id"]).agg(
        *[
            F.sum(
                F.when(
                    (F.col("probe_rn") <= k) & (F.col(f"rank{k}") <= TOP_K),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(f"h{k}")
            for k in (1, 2, 4)
        ]
    )
    t = brute.agg(
        F.count_distinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_truth"),
    )
    curve = hits.selectExpr(
        "stack(3, 1, h1, 2, h2, 4, h4) AS (nprobe, n_hits)"
    )
    return curve.crossJoin(F.broadcast(t)).select(
        F.col("nprobe").cast("long").alias("nprobe"),
        "n_queries",
        "n_truth",
        "n_hits",
        (
            F.floor(
                F.col("n_hits").cast("double") / F.col("n_truth") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias(f"recall_at_{TOP_K}"),
    )


# --- diverse-subset selection (k-center coreset) -------------------------

CORESET_K = 10

_KC_D2 = (
    "list_sum(list_transform(range(len(e.embedding)), i -> "
    "(CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.embedding[i+1] AS DOUBLE))"
    " * (CAST(e.embedding[i+1] AS DOUBLE) - CAST(c.embedding[i+1] AS DOUBLE))"
    "))"
)


def _kcenter_sql() -> str:
    """Unrolled greedy k-center as chained CTE layers (one per
    selection): layer i picks the point farthest from the first i-1
    centers (ties -> lowest vec_id) and refreshes every point's
    min-distance. The fold inside the distance is DuckDB's sequential
    list_sum — the same left-to-right order the Spark kernel uses, so
    the doubles the argmax compares are ulp-identical cross-engine."""
    parts = [
        f"""
    c1 AS (
      SELECT vec_id, embedding, 0.0 AS dmin FROM embeddings
      WHERE vec_id = (SELECT MIN(vec_id) FROM embeddings)
    ),
    d1 AS (
      SELECT e.vec_id, e.embedding, {_KC_D2} AS dmin
      FROM embeddings e, c1 c
    )"""
    ]
    for i in range(2, CORESET_K + 1):
        parts.append(
            f""",
    c{i} AS (
      SELECT vec_id, embedding, dmin FROM d{i - 1}
      ORDER BY dmin DESC, vec_id LIMIT 1
    ),
    d{i} AS (
      SELECT e.vec_id, e.embedding, LEAST(e.dmin, {_KC_D2}) AS dmin
      FROM d{i - 1} e, c{i} c
    )"""
        )
    selects = [
        "SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, 0.0 AS d2_sel FROM c1"
    ]
    for i in range(2, CORESET_K + 1):
        selects.append(
            f"SELECT CAST({i} AS BIGINT), vec_id, "
            f"floor(dmin * 1000000 + 0.5) / 1000000 FROM c{i}"
        )
    return "WITH " + "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@query("sample_coreset_kcenter", oracle=_kcenter_sql())
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diverse-subset selection: greedy k-center (Gonzalez) coreset
    over the embedding corpus — the curation move that picks the
    {k} MOST MUTUALLY DISTANT exemplars (seed = lowest vec_id, then
    repeatedly the point farthest from everything already chosen,
    ties -> lowest vec_id). Each selection's ``d2_sel`` is the squared
    L2 distance that made it the argmax — i.e. the covering radius of
    the first i-1 centers, so the output doubles as the coverage
    curve a curator reads to choose k. The 2-approximation guarantee
    of greedy k-center makes this the standard seed set for diverse
    sampling, annotation budgeting, and cluster initialization.

    Scale shape, two tiers (guide §1.2 — the r14 profile showed the 9
    sequential mapInPandas jobs were ~all per-pass fixed cost,
    8-vs-32-core ratio 0.98; §4.5 — keep the matrix resident across
    rounds instead of re-crossing the boundary per selection):

    - **Broadcast tier** (corpus within the repo's bounded-build-side
      budget, `_shared.MAX_COLLECT_ROWS` — the SAME tier, bound, and
      loud overflow error that gate the brute-force cosine kernels):
      the greedy loop runs over the session-shared
      ``embeddings_matrix`` broadcast (ids, matrix, norms — the
      artifact every sim kernel reads), all k selections in one numpy
      pass sequence with ZERO Spark jobs after the artifact. k-center
      is a k-row selection over exactly the matrix the brute kernels
      already materialize, so it rides the same tier rather than
      paying 1 seed job + k-1 scan jobs of per-pass fixed cost
      (measured: ~0.37 s/job at sf0.1 — the whole r14 cost). (A
      barrier-mode allGather kernel — one job, rounds synchronized
      executor-side — was tried first and measured ~1 s/round of
      barrier-coordinator latency, 3× WORSE than the per-pass form;
      evidence in OPTIMIZATION_r15.md.)
    - **Per-pass tier** (corpus above the collect budget): the r14
      form, k-1 narrow mapInPandas scans each emitting one
      best-candidate row per partition, driver-reduced under the same
      tie rule. At 100 TB this is k scans of a columnar table with a
      1-row reduce each, the textbook distributed form of the greedy
      algorithm.

    Both tiers fold dims in the oracle's exact left-to-right order and
    apply ``np.minimum`` per center in selection order — min is exact,
    so the running min equals the per-pass recompute bit for bit and
    partitioning cannot perturb any compared double (pinned by
    tests/test_coreset_kcenter.py). A persisted running-min column
    (one fresh-literal codegen distance per pass, O(k·n)) produced
    identical hashes but measured NO faster end-to-end at fixture
    scale — per-pass expression compilation and cache materialization
    ate the savings — so the stateless kernels stay.

    Degenerate corpora (< k distinct positions) stay deterministic
    and engine-identical: once every point's distance is 0 the argmax
    tie rule re-selects the lowest vec_id on BOTH engines.

    Reference basis: none (the reference has no vector ops); contract
    training-data family (SURVEY §2.10), sibling of the dedup/ANN
    tiers over the same corpus."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    try:
        bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    except ValueError:
        # corpus above the bounded-collect budget: the distributed
        # per-pass tier is the scale path
        return spark.createDataFrame(
            _kcenter_passes(fan_out(emb, spark)),
            "sel_rank long, vec_id long, d2_sel double",
        )
    ids, mat, _norms = bc.value
    return spark.createDataFrame(
        _kcenter_from_matrix(ids, mat),
        "sel_rank long, vec_id long, d2_sel double",
    )


def _kcenter_from_matrix(ids, mat) -> list[tuple[int, int, float]]:
    """All CORESET_K greedy selections over the in-memory (ids,
    matrix) pair — the broadcast-tier kernel. Identical arithmetic to
    :func:`_kcenter_passes`: same per-dim left-to-right fold, same
    ``np.minimum`` fold in selection order, same (dmin desc, vec_id
    asc) tie rule — partitioning never perturbs a compared double, so
    the global argmax here equals the per-partition winners' reduce."""
    import math

    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    A = np.asarray(mat, dtype=np.float64)
    j = int(np.argmin(ids))
    center = A[j]
    out = [(1, int(ids[j]), 0.0)]
    dmin = None
    for rank in range(2, CORESET_K + 1):
        acc = np.zeros(len(ids), dtype=np.float64)
        for i in range(A.shape[1]):
            diff = A[:, i] - center[i]
            acc = acc + diff * diff
        dmin = acc if dmin is None else np.minimum(dmin, acc)
        j = int(np.lexsort((ids, -dmin))[0])
        center = A[j]
        out.append(
            (
                rank,
                int(ids[j]),
                math.floor(float(dmin[j]) * 1000000 + 0.5) / 1000000,
            )
        )
    return out


def _kcenter_passes(pts: DataFrame) -> list[tuple[int, int, float]]:
    """The per-pass tier: k-1 mapInPandas scans, one best-candidate
    row per partition per pass, driver-reduced under the same
    (dmin desc, vec_id asc) rule. The scale form for inputs whose
    partition count exceeds the concurrent slot count."""
    import math

    import numpy as np
    import pandas as pd

    seed = pts.orderBy("vec_id").limit(1).collect()[0]
    centers: list[list[float]] = [[float(x) for x in seed.embedding]]
    out = [(1, int(seed.vec_id), 0.0)]
    for rank in range(2, CORESET_K + 1):
        cs = [list(c) for c in centers]

        def gen(batches, cs=cs):
            best = None
            for pdf in batches:
                if not len(pdf):
                    continue
                A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                ids = pdf["vec_id"].to_numpy()
                dmin = None
                for c in cs:
                    acc = np.zeros(len(ids), dtype=np.float64)
                    for i in range(A.shape[1]):
                        diff = A[:, i] - c[i]
                        acc = acc + diff * diff
                    dmin = acc if dmin is None else np.minimum(dmin, acc)
                j = int(np.lexsort((ids, -dmin))[0])
                cand = (float(dmin[j]), int(ids[j]), [float(x) for x in A[j]])
                if best is None or (cand[0], -cand[1]) > (best[0], -best[1]):
                    best = cand
            if best is not None:
                yield pd.DataFrame(
                    {
                        "dmin": [best[0]],
                        "vec_id": [best[1]],
                        "embedding": [best[2]],
                    }
                )

        wins = pts.mapInPandas(
            gen, schema="dmin double, vec_id long, embedding array<double>"
        ).collect()
        w = max(wins, key=lambda r: (r.dmin, -r.vec_id))
        centers.append([float(x) for x in w.embedding])
        out.append(
            (rank, int(w.vec_id), math.floor(w.dmin * 1000000 + 0.5) / 1000000)
        )
    return out


sample_coreset_kcenter.__doc__ = sample_coreset_kcenter.__doc__.replace(
    "{k}", str(CORESET_K)
)


# k values for the recall-vs-k curve (pending round-9 debut)
_K_CURVE = (1, 3, 5)


@query(
    "sim_recall_vs_k_curve",
    oracle=f"""
    WITH mx AS (
      SELECT MAX(list_max(list_transform(embedding,
               v -> abs(CAST(v AS DOUBLE))))) AS max_abs
      FROM embeddings
    ),
    q AS (
      SELECT vec_id,
             list_transform(embedding, v ->
               CAST(GREATEST(-127.0, LEAST(127.0,
                 floor(CAST(v AS DOUBLE) * 127.0 / max_abs + 0.5)))
               AS BIGINT)) AS qv
      FROM embeddings, mx
    ),
    qtop AS (
      SELECT query_id, neighbor_id, rk FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_SQL_QDOT} DESC, b.vec_id) AS rk
        FROM q a JOIN q b ON a.vec_id <> b.vec_id
      ) WHERE rk <= {max(_K_CURVE)}
    ),
    brute AS (
      SELECT query_id, neighbor_id, rank FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_AB} DESC, b.vec_id) AS rank
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      ) WHERE rank <= {max(_K_CURVE)}
    ),
    ks AS (SELECT unnest(ARRAY{list(_K_CURVE)}) AS k),
    t AS (
      SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_truth
      FROM ks JOIN brute ON brute.rank <= ks.k GROUP BY ks.k
    ),
    h AS (
      SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM ks, qtop, brute
      WHERE brute.query_id = qtop.query_id
        AND brute.neighbor_id = qtop.neighbor_id
        AND qtop.rk <= ks.k AND brute.rank <= ks.k
      GROUP BY ks.k
    )
    SELECT t.k AS top_k, COALESCE(h.n_hits, 0) AS n_hits, t.n_truth,
           floor(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_truth
                 * 1000000 + 0.5) / 1000000 AS recall
    FROM t LEFT JOIN h ON h.k = t.k
    """,
)
def sim_recall_vs_k_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k CURVE of the int8-quantized ranking against the exact
    float-cosine truth at k = 1, 3, 5 — the knob table that says how
    deep a re-rank window the quantized tier needs: recall@1 prices
    "trust the quantized argmax", recall@5 prices "fetch 5 then
    re-rank exactly". Both rankings come from ONE scored pass each
    (rank ≤ max k, conditional cumulative counts per k — the
    `sim_ivf_nprobe_curve` device), so the curve costs one extra
    row-number over what the single-point audit already pays.

    Per-k truth counts use the BRUTE side's rank ≤ k row count, so a
    corpus with fewer than k non-self neighbors denominates honestly
    (the `sim_topk_bruteforce` degenerate guard carries through).
    Quantization arithmetic is the certified bit-exact int8 kernel;
    recall is a ratio of exact integers, floored once at 1e-6.

    Scale shape: the int8 scan is the blocked broadcast-matrix
    kernel; the truth side is the certified brute query; the curve
    math joins two (query, neighbor, rank) tables once and folds to
    |k| rows. At open scale both sides swap to the sampled-panel
    device (`sim_pq_recall_sampled_panel`) unchanged.

    Reference basis: none; contract ANN-audit family."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    kmax = max(_K_CURVE)
    qtop = fan_out(emb, spark).mapInPandas(
        _int8_topk_against(bc, kmax),
        schema="query_id long, rank long, neighbor_id long, qdot long",
    ).select("query_id", "neighbor_id", F.col("rank").alias("rk"))
    brute = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_b")
    )
    ks = spark.createDataFrame([(k,) for k in _K_CURVE], "k long")
    t = (
        brute.crossJoin(F.broadcast(ks))
        .filter(F.col("rank_b") <= F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    )
    h = (
        qtop.join(brute, ["query_id", "neighbor_id"])
        .crossJoin(F.broadcast(ks))
        .filter((F.col("rk") <= F.col("k")) & (F.col("rank_b") <= F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        t.join(h, "k", "left")
        .select(
            F.col("k").alias("top_k"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            "n_truth",
            (
                F.floor(
                    F.coalesce("n_hits", F.lit(0)).cast("double")
                    / F.col("n_truth")
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("recall"),
        )
    )


# 0.05-wide cosine bands straddling the 0.4 dedup threshold
_BAND_LO_EDGE = 0.25
_BAND_HI_EDGE = 0.55


@query(
    "sim_cosine_band_histogram",
    oracle=f"""
    WITH p AS (
      SELECT floor({_COS_AB} * 1000000 + 0.5) / 1000000 AS c6
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    f AS (
      SELECT CAST(floor(c6 * 20) AS BIGINT) AS band
      FROM p WHERE c6 >= {_BAND_LO_EDGE} AND c6 < {_BAND_HI_EDGE}
    ),
    g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM f GROUP BY band),
    t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS tot FROM g)
    SELECT g.band / 20.0 AS band_lo, g.n_pairs,
           CAST((1000000 * g.n_pairs) // t.tot AS BIGINT) AS share_ppm
    FROM g, t
    """,
)
def sim_cosine_band_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-boundary mass around the 0.4 duplicate threshold: the
    pair-count histogram in 0.05-wide cosine bands over [0.25, 0.55)
    — the calibration read that says whether the threshold sits in a
    sparse valley (robust: moving it changes few decisions) or on a
    dense shoulder (brittle: the `dedup_lsh_parameter_planner` and
    S-curve trades then matter much more, and the near-threshold
    pairs deserve the exact verify). Completes the threshold-
    governance set: planner (design) → S-curve audit (retrieval) →
    THIS (decision mass).

    Float discipline: cosine rounds half-away at 1e-6 FIRST (the
    certified pair queries' device — floor(x·10⁶+0.5)/10⁶ written
    identically on both engines), then bands by floor(c6·20); band
    identity derives from the already-rounded value, so the band edge
    cannot disagree where the rounded cosines agree.

    Scale shape: audit tier — blocked matmul per Arrow batch against
    the bounded session-shared broadcast matrix (the
    `sim_topk_bruteforce` kernel shape), with each task folding its
    block straight into ≤ 6 per-band partial counts: nothing but the
    histogram shuffles, and each unordered pair is counted once via
    the id-order mask. At open scale the pair universe comes from the
    banded candidate generator instead, same summary shape.

    Reference basis: none; contract ANN/dedup-audit family."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    lo, hi = _BAND_LO_EDGE, _BAND_HI_EDGE

    def gen(batches):
        bids, bmat, bnorms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            ia = pdf["vec_id"].to_numpy()
            na = np.sqrt((A * A).sum(axis=1))
            cos = (A @ bmat.T) / (na[:, None] * bnorms[None, :])
            c6 = np.floor(cos * 1000000 + 0.5) / 1000000
            keep = (ia[:, None] < bids[None, :]) & (c6 >= lo) & (c6 < hi)
            bands = np.floor(c6[keep] * 20).astype(np.int64)
            if len(bands) == 0:
                continue
            uniq, counts = np.unique(bands, return_counts=True)
            yield pd.DataFrame({"band": uniq, "k": counts.astype(np.int64)})

    g = (
        fan_out(emb, spark)
        .mapInPandas(gen, schema="band long, k long")
        .groupBy("band")
        .agg(F.sum("k").cast("long").alias("n_pairs"))
    )
    t = g.agg(F.sum("n_pairs").cast("long").alias("tot"))
    return g.crossJoin(F.broadcast(t)).select(
        (F.col("band") / 20.0).alias("band_lo"),
        "n_pairs",
        F.expr("CAST((1000000 * n_pairs) div tot AS BIGINT)").alias(
            "share_ppm"
        ),
    )


# --- planted-cluster corpus audit (round 9) ---------------------------------
# The random synthetic embeddings pin PQ recall near its noise floor
# (trained 0.42-0.51): there is no manifold to learn, so the audit can
# prove the machinery but not the VALUE of training. This tier plants
# cluster structure DETERMINISTICALLY from the fixture itself — no RNG,
# no synthetic inputs — and re-runs the identical exact/stride/trained
# kernels on it: v'_i = 0.75·centroid[md5(vec_id) % NC] + 0.25·v_i with
# NC = corpus/8 (≈ 8 members per cluster, so a query's exact top-5 is
# essentially "the rest of my cluster" — a signal quantization should
# preserve). Measured panel recall@5: trained 0.745/0.734/0.780 and
# stride 0.732/0.726/0.751 at sf0.001/0.01/0.1 — far above the
# random-corpus tier, certifying that the PQ ladder genuinely exploits
# structure when structure exists.
CLUSTER_MEMBERS = 8
_CLUSTERED_TRAINED_FLOOR = 0.65
_CLUSTERED_STRIDE_MARGIN = 0.02


def _clustered_matrix(bc):
    """Derive the planted-cluster corpus from the shared fixture
    broadcast: ids sorted ascending, each vector mixed 75/25 toward
    its md5-assigned centroid (centroids are the first NC vectors in
    id order — fixture rows, not synthetics). Returns the same
    ``(ids, matrix, norms)`` tuple shape as
    :func:`~catme_etl_spark.operators._shared.shared_matrix_broadcast`
    so every PQ kernel and :func:`_pq_fit_trained` run on it
    unchanged."""
    import hashlib

    import numpy as np

    bids, bmat, _ = bc.value
    order = np.argsort(bids, kind="stable")
    ids = bids[order]
    M = bmat[order]
    nc = max(16, len(ids) // CLUSTER_MEMBERS)
    cl = np.array(
        [
            int(hashlib.md5(str(int(i)).encode()).hexdigest(), 16) % nc
            for i in ids
        ]
    )
    cent = M[:nc]
    M2 = 0.75 * cent[cl] + 0.25 * M
    return ids, M2, np.sqrt((M2 * M2).sum(axis=1))


def _swap_clustered_gen(inner_gen, cl_bc):
    """Wrap a PQ kernel generator so each query batch's ``embedding``
    is replaced by its CLUSTERED corpus row before the inner kernel
    quantizes it (searchsorted on the sorted id axis — every query id
    is a corpus id by construction, so the lookup is exact). Keeps the
    query side and the broadcast corpus side bit-identical without a
    second clustered table ever materializing as a DataFrame."""

    def gen(batches):
        def xform():
            import numpy as np

            ids, M2, _ = cl_bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                pos = np.searchsorted(ids, pdf["vec_id"].to_numpy())
                out = pdf.copy()
                out["embedding"] = list(M2[pos])
                yield out

        yield from inner_gen(xform())

    return gen


@query(
    "sim_pq_trained_recall_clustered",
    oracle=f"""
    SELECT CAST(LEAST({PQ_PANEL_N}, COUNT(*)) AS BIGINT) AS n_queries,
           {TOP_K} AS top_k,
           TRUE AS clustered_floor_ok,
           TRUE AS beats_stride_ok
    FROM embeddings
    """,
)
def sim_pq_trained_recall_clustered(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trained-PQ recall on a PLANTED-CLUSTER corpus — the round-8
    verdict's "trained-tier ANN on clustered (non-random) synthetic
    embeddings, where PQ/IVF recall numbers would stop being
    noise-floor-bound" item. The random fixture gives the trained
    tier no structure to learn (recall 0.42-0.51); this audit derives
    a clustered corpus deterministically from the SAME fixture
    (v' = 0.75·centroid + 0.25·v, centroid = md5(vec_id)-assigned
    among the first corpus/{CLUSTER_MEMBERS} vectors, ≈
    {CLUSTER_MEMBERS} members per cluster) and re-certifies the
    identical kernels on it. Measured panel recall@{TOP_K}: trained
    0.745/0.734/0.780, stride 0.732/0.726/0.751 at sf0.001/0.01/0.1 —
    the certified evidence that the PQ ladder recovers real structure
    when structure exists, and the honest complement to the
    random-corpus tiers' disclosed noise floors.

    Bounds form (float k-means means aren't SQL-reproducible):
    (a) trained recall ≥ {_CLUSTERED_TRAINED_FLOOR:.0%} of the exact
    int8-L2 truth on the clustered corpus; (b) trained ≥ stride −
    {_CLUSTERED_STRIDE_MARGIN:.0%}. Queries are the fixed
    {PQ_PANEL_N}-vector md5-order panel (`sim_pq_recall_sampled_panel`
    discipline), so the exact-truth side stays O(panel·corpus) at any
    corpus size.

    Scale shape: the cluster plant is a driver-side O(corpus)
    transform cached in its own `shared_broadcast`; the three blocked
    mapInPandas scans and two equi-joins are byte-for-byte the
    trained-recall audit's plan. The query side reuses the clustered
    broadcast rows via a batch-transform wrapper — no second
    embeddings table is shuffled or written.

    Reference basis: none (the reference has no vector surface);
    contract F10/F14 ANN audit family."""
    from ._shared import shared_broadcast

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    cl_bc = shared_broadcast(
        "embeddings_matrix_clustered", sf_dir, spark, lambda: _clustered_matrix(bc)
    )
    trained_bc = shared_broadcast(
        "pq_trained_clustered_artifact",
        sf_dir,
        spark,
        lambda: _pq_fit_trained(cl_bc),
    )
    panel = (
        emb.withColumn("_pk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_pk", "vec_id")
        .limit(PQ_PANEL_N)
        .drop("_pk")
    )
    pq_gen, exact_gen = _pq_kernels(cl_bc, TOP_K, PQ_STRIDE)
    trained_gen = _pq_trained_kernel(trained_bc, TOP_K)
    schema = "query_id long, rank long, neighbor_id long"
    exact = fan_out(panel, spark).mapInPandas(
        _swap_clustered_gen(exact_gen, cl_bc), schema=schema
    ).select("query_id", "neighbor_id")
    stride = fan_out(panel, spark).mapInPandas(
        _swap_clustered_gen(pq_gen, cl_bc), schema=schema
    ).select("query_id", "neighbor_id")
    trained = fan_out(panel, spark).mapInPandas(
        _swap_clustered_gen(trained_gen, cl_bc), schema=schema
    ).select("query_id", "neighbor_id")
    t_hit = trained.join(exact, ["query_id", "neighbor_id"])
    s_hit = stride.join(exact, ["query_id", "neighbor_id"])
    return (
        exact.agg(
            F.count_distinct("query_id").alias("n_queries"),
            F.count(F.lit(1)).alias("_n_truth"),
        )
        .crossJoin(F.broadcast(t_hit.agg(F.count(F.lit(1)).alias("_n_t"))))
        .crossJoin(F.broadcast(s_hit.agg(F.count(F.lit(1)).alias("_n_s"))))
        .select(
            "n_queries",
            F.lit(TOP_K).alias("top_k"),
            (
                F.col("_n_t") >= _CLUSTERED_TRAINED_FLOOR * F.col("_n_truth")
            ).alias("clustered_floor_ok"),
            (
                F.col("_n_t")
                >= F.col("_n_s")
                - _CLUSTERED_STRIDE_MARGIN * F.col("_n_truth")
            ).alias("beats_stride_ok"),
        )
    )


# --- relational planted-cluster corpus (round-9 queue) ----------------------
# The SQL-expressible sibling of `_clustered_matrix`: cluster c's
# centroid is the MIN-vec_id member of c (rank-free, so both engines
# derive it with one groupBy instead of a global sort), assignment is
# the 56-bit md5 slice mod NC, and the 75/25 mix + int8 quantization
# are the same IEEE-exact double ops the certified int8 audits use —
# the whole clustered corpus reproduces BIT-IDENTICALLY in DuckDB, so
# recall on it certifies as a VALUE, not a bounds-form boolean.
_CLV_SQL_CTES = f"""
    nct AS (
      SELECT GREATEST(16, COUNT(*) // {CLUSTER_MEMBERS}) AS nc
      FROM embeddings
    ),
    asg0 AS (
      SELECT vec_id, embedding,
             ({sql_hex_long("md5(CAST(vec_id AS VARCHAR))", 14, 1)}) % nc
               AS cl
      FROM embeddings, nct
    ),
    cmin AS (SELECT cl, MIN(vec_id) AS cvid FROM asg0 GROUP BY cl),
    cvec AS (
      SELECT m.cl, a.embedding AS ce
      FROM cmin m JOIN asg0 a ON a.vec_id = m.cvid
    ),
    clv AS (
      SELECT a.vec_id,
             list_transform(range(len(a.embedding)), j ->
               0.75 * CAST(c.ce[j+1] AS DOUBLE)
               + 0.25 * CAST(a.embedding[j+1] AS DOUBLE)) AS emb
      FROM asg0 a JOIN cvec c USING (cl)
    ),
    mx AS (
      SELECT MAX(list_max(list_transform(emb, v -> abs(v)))) AS max_abs
      FROM clv
    ),
    qc AS (
      SELECT vec_id,
             list_transform(emb, v ->
               CAST(GREATEST(-127.0, LEAST(127.0,
                 floor(v * 127.0 / max_abs + 0.5))) AS BIGINT)) AS qv
      FROM clv, mx
    )
"""


@query(
    "sim_ivf_recall_clustered",
    oracle=f"""
    WITH {_CLV_SQL_CTES},
    cent AS (
      SELECT vec_id AS cid, qv AS cqv FROM qc
      WHERE vec_id % {CENTROID_STRIDE} = 0
    ),
    panel AS (
      SELECT vec_id, qv FROM (
        SELECT vec_id, qv,
               ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pr
        FROM qc
      ) WHERE pr <= {PQ_PANEL_N}
    ),
    adist AS (
      SELECT q.vec_id, c.cid,
             CAST(list_sum(list_transform(range(len(q.qv)), j ->
               (q.qv[j+1] - c.cqv[j+1]) * (q.qv[j+1] - c.cqv[j+1])))
             AS BIGINT) AS d
      FROM qc q, cent c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM adist
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT a.vec_id AS query_id, a.cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM adist
      ) a JOIN panel p ON p.vec_id = a.vec_id
      WHERE a.rn <= {NPROBE}
    ),
    icand AS (
      SELECT pr.query_id, asg.vec_id AS neighbor_id
      FROM probes pr JOIN assign asg ON asg.cid = pr.cid
      WHERE asg.vec_id <> pr.query_id
    ),
    iscored AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(range(len(qa.qv)), j ->
               (qa.qv[j+1] - qb.qv[j+1]) * (qa.qv[j+1] - qb.qv[j+1])))
             AS BIGINT) AS d
      FROM icand c
      JOIN qc qa ON qa.vec_id = c.query_id
      JOIN qc qb ON qb.vec_id = c.neighbor_id
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY d, neighbor_id) AS rank
        FROM iscored
      ) WHERE rank <= {TOP_K}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM panel p JOIN qc b ON b.vec_id <> p.vec_id
      ) WHERE rank <= {TOP_K}
    )
    SELECT (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM brute)
             AS n_queries,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM brute) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ivf JOIN brute
              USING (query_id, neighbor_id)) AS n_hits,
           floor((CAST((SELECT COUNT(*) FROM ivf JOIN brute
                          USING (query_id, neighbor_id)) AS DOUBLE)
                  / (SELECT COUNT(*) FROM brute)) * 1000000 + 0.5)
             / 1000000 AS recall_at_{TOP_K}
    """,
)
def sim_ivf_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT VALUE-certified recall@{TOP_K} of the stride-centroid IVF
    tier on a PLANTED-CLUSTER corpus — the strongest form of the
    round-8 verdict's "ANN on clustered embeddings" ask: where
    `sim_pq_trained_recall_clustered` certifies bounds-form booleans
    (its float k-means isn't SQL-reproducible), THIS tier's whole
    pipeline — md5-slice cluster assignment, min-member centroids, the
    75/25 IEEE-double mix, int8 quantization, integer-L2 assignment /
    {NPROBE}-probe search / exact truth — reproduces bit-identically
    in SQL, so the recall lands in the hash like any other value. The
    cluster plant here is rank-free (centroid = min-vec_id member of
    each md5 cluster) precisely so a relational engine derives it with
    one groupBy; queries are the fixed {PQ_PANEL_N}-vector md5-order
    panel, keeping the exact-truth side O(panel·corpus).

    Scale shape (round-11 migration, same oracle/hash): the original
    relational form assigned every corpus vector to its centroid via a
    broadcast nested-loop of |corpus| x |corpus/{CENTROID_STRIDE}| —
    correct but genuinely quadratic at 100x (the round-10 verdict's
    one flagged scale-killer). Now it rides the round-8 "fit once,
    broadcast the model" rule: the IVF assignment is fitted ONCE
    driver-side as part of the SHARED `ivfpq_artifacts` broadcast
    (one int64 matmul-identity kernel, amortized with
    `sim_ivfpq_recall_clustered`), and the panel's scan tasks do only
    per-query work — probe selection, candidate gathers over
    ~{CLUSTER_MEMBERS}·{CENTROID_STRIDE}·{NPROBE} inverted-list rows,
    and the panel-bounded exact-truth row. All ranking arithmetic is
    the same int64 (ties to lowest id via stable sorts), so the
    recall still lands in the oracle hash bit-identically.

    Reference basis: none; contract F10/F14 ANN audit family."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    panel = (
        emb.withColumn("_pk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_pk", "vec_id")
        .limit(PQ_PANEL_N)
        .select("vec_id")
    )
    rows = fan_out(panel, spark).mapInPandas(
        _ivf_gen(art), schema="query_id long, neighbor_id long, tier string"
    )
    truth = rows.filter(F.col("tier") == "truth").select(
        "query_id", "neighbor_id"
    )
    ivf = rows.filter(F.col("tier") == "ivf").select("query_id", "neighbor_id")
    hits = ivf.join(truth, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits")
    )
    return (
        truth.agg(
            F.count_distinct("query_id").cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_truth"),
        )
        .crossJoin(F.broadcast(hits))
        .select(
            "n_queries",
            "n_truth",
            "n_hits",
            (
                F.floor(
                    (F.col("n_hits").cast("double") / F.col("n_truth"))
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias(f"recall_at_{TOP_K}"),
        )
    )


def _ivf_gen(art_bc):
    """mapInPandas generator over panel-query batches — the lean
    coarse-only sibling of `_ivfpq_gen` (no PQ LUT/ADC work): per
    query, probe the NPROBE nearest coarse centroids, rank the probed
    inverted lists' members by exact int64 L2 ('ivf'), and emit the
    exact full-corpus truth ('truth') for the recall denominators.
    Stable sorts keep every tie on the lowest id — byte-identical to
    the oracle's `ORDER BY d, cid` / `ORDER BY d, neighbor_id`."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, Q, assign, _codes, cids, C, _wids, _W = art_bc.value
        BIG = np.int64(1 << 62)
        for pdf in batches:
            if not len(pdf):
                continue
            ia = pdf["vec_id"].to_numpy()
            pos = np.searchsorted(ids, ia)
            qa = Q[pos]
            dq = (
                (qa * qa).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (qa @ C.T)
            )
            # stable argsort: ties keep position order = ascending cid
            probes = cids[np.argsort(dq, axis=1, kind="stable")[:, :NPROBE]]
            dt = (
                (qa * qa).sum(axis=1)[:, None]
                + (Q * Q).sum(axis=1)[None, :]
                - 2 * (qa @ Q.T)
            )
            dt = np.where(ia[:, None] == ids[None, :], BIG, dt)
            out_q, out_n, out_t = [], [], []

            def take(q_id, nbr, tier):
                out_q.extend([q_id] * len(nbr))
                out_n.extend(int(v) for v in nbr)
                out_t.extend([tier] * len(nbr))

            for r in range(len(ia)):
                cand = np.isin(assign, probes[r])
                cand[pos[r]] = False
                cidx = np.nonzero(cand)[0]
                nbr = ids[cidx]
                de = dt[r][cidx]
                take(int(ia[r]), nbr[np.lexsort((nbr, de))[:TOP_K]], "ivf")
                take(
                    int(ia[r]),
                    ids[np.lexsort((ids, dt[r]))[:TOP_K]],
                    "truth",
                )
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "tier": out_t}
            )

    return gen


IVFPQ_CW_STRIDE = 100  # coarser PQ codebook than the flat-PQ tier's
# {PQ_STRIDE}: the composed audit re-ranks only the probed inverted
# lists, so the codebook can be 10x smaller and the oracle's encode
# CTE stays tractable at sf0.1 (|corpus/100| codewords per subspace).


def _clv_int8_corpus(bc):
    """Numpy replica of the RELATIONAL cluster plant (`_CLV_SQL_CTES`):
    56-bit md5-slice cluster assignment over nc = max(16, n/8)
    clusters, centroid = the MIN-vec_id member (ids ascending, so the
    first occurrence of each cluster), 0.75/0.25 IEEE double mix in
    the same per-element op order, shared max-abs int8 quantization —
    bit-identical to the `qc` CTE both engines certify, so every
    int64 kernel downstream lands in the oracle hash. Distinct from
    `_clustered_matrix` (the bounds-form plant: full-md5 assignment,
    first-NC centroids), which is NOT SQL-reproducible."""
    import hashlib

    import numpy as np

    bids, bmat, _ = bc.value
    order = np.argsort(bids, kind="stable")
    ids = bids[order]
    M = bmat[order]
    nc = max(16, len(ids) // CLUSTER_MEMBERS)
    cl = np.array(
        [
            int(hashlib.md5(str(int(i)).encode()).hexdigest()[:14], 16) % nc
            for i in ids
        ],
        dtype=np.int64,
    )
    first: dict = {}
    for pos, c in enumerate(cl):
        if int(c) not in first:
            first[int(c)] = pos
    cent_idx = np.array([first[int(c)] for c in cl], dtype=np.int64)
    M2 = 0.75 * M[cent_idx] + 0.25 * M
    max_abs = _quant_max_abs(M2)
    Q = np.clip(np.floor(M2 * 127.0 / max_abs + 0.5), -127, 127).astype(
        np.int64
    )
    return ids, Q


def _ivfpq_artifacts(bc):
    """Fit-once/broadcast-artifacts (the round-8 trained-PQ lesson):
    the IVF assignment of every corpus vector and its PQ codes over
    the stride codebook are pure functions of the corpus — computing
    them once driver-side and shipping (ids, Q, assign, codes, cids,
    C, wids, W) beats re-deriving them inside every scan task. All
    int64 matmul-identity arithmetic (q² + c² − 2qc — exact for
    int8-range values), argmin first-tie = lowest id because both the
    centroid and codeword arrays are ascending-id slices."""
    import numpy as np

    ids, Q = _clv_int8_corpus(bc)
    cmask = ids % CENTROID_STRIDE == 0
    if not cmask.any():
        raise ValueError(
            "ivfpq audit: no stride centroids (no vec_id % "
            f"{CENTROID_STRIDE} == 0) — corpus too small for the IVF tier"
        )
    cids, C = ids[cmask], Q[cmask]
    d = (
        (Q * Q).sum(axis=1)[:, None]
        + (C * C).sum(axis=1)[None, :]
        - 2 * (Q @ C.T)
    )
    assign = cids[d.argmin(axis=1)]
    wmask = ids % IVFPQ_CW_STRIDE == 0
    if not wmask.any():
        raise ValueError(
            "ivfpq audit: no PQ codewords (no vec_id % "
            f"{IVFPQ_CW_STRIDE} == 0) — corpus too small for the PQ tier"
        )
    wids, W = ids[wmask], Q[wmask]
    codes = np.empty((len(ids), PQ_M), dtype=np.int64)
    for m in range(PQ_M):
        lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
        Qm, Wm = Q[:, lo:hi], W[:, lo:hi]
        dm = (
            (Qm * Qm).sum(axis=1)[:, None]
            + (Wm * Wm).sum(axis=1)[None, :]
            - 2 * (Qm @ Wm.T)
        )
        codes[:, m] = dm.argmin(axis=1)
    return ids, Q, assign, codes, cids, C, wids, W


def _ivfpq_gen(art_bc):
    """mapInPandas generator over panel-query batches: per query,
    probe the NPROBE nearest coarse centroids, gather their inverted
    lists as candidates, rank candidates BOTH ways — exact int64 L2
    ('ivf') and the PQ ADC lookup-table sum ('ivfpq') — and emit the
    exact full-corpus truth ('truth') for the recall denominators."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, Q, assign, codes, cids, C, wids, W = art_bc.value
        BIG = np.int64(1 << 62)
        for pdf in batches:
            if not len(pdf):
                continue
            ia = pdf["vec_id"].to_numpy()
            pos = np.searchsorted(ids, ia)
            qa = Q[pos]
            dq = (
                (qa * qa).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (qa @ C.T)
            )
            # stable argsort: ties keep position order = ascending cid
            probes = cids[
                np.argsort(dq, axis=1, kind="stable")[:, :NPROBE]
            ]
            luts = []
            for m in range(PQ_M):
                lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
                qm, Wm = qa[:, lo:hi], W[:, lo:hi]
                luts.append(
                    (qm * qm).sum(axis=1)[:, None]
                    + (Wm * Wm).sum(axis=1)[None, :]
                    - 2 * (qm @ Wm.T)
                )
            dt = (
                (qa * qa).sum(axis=1)[:, None]
                + (Q * Q).sum(axis=1)[None, :]
                - 2 * (qa @ Q.T)
            )
            dt = np.where(ia[:, None] == ids[None, :], BIG, dt)
            out_q, out_n, out_t = [], [], []

            def take(q_id, nbr, tier):
                out_q.extend([q_id] * len(nbr))
                out_n.extend(int(v) for v in nbr)
                out_t.extend([tier] * len(nbr))

            for r in range(len(ia)):
                cand = np.isin(assign, probes[r])
                cand[pos[r]] = False
                cidx = np.nonzero(cand)[0]
                nbr = ids[cidx]
                adc = np.zeros(len(cidx), dtype=np.int64)
                for m in range(PQ_M):
                    adc += luts[m][r][codes[cidx, m]]
                take(int(ia[r]), nbr[np.lexsort((nbr, adc))[:TOP_K]], "ivfpq")
                de = dt[r][cidx]
                take(int(ia[r]), nbr[np.lexsort((nbr, de))[:TOP_K]], "ivf")
                take(
                    int(ia[r]),
                    ids[np.lexsort((ids, dt[r]))[:TOP_K]],
                    "truth",
                )
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "tier": out_t}
            )

    return gen


@query(
    "sim_ivfpq_recall_clustered",
    oracle=f"""
    WITH {_CLV_SQL_CTES},
    cent AS (
      SELECT vec_id AS cid, qv AS cqv FROM qc
      WHERE vec_id % {CENTROID_STRIDE} = 0
    ),
    panel AS (
      SELECT vec_id, qv FROM (
        SELECT vec_id, qv,
               ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pr
        FROM qc
      ) WHERE pr <= {PQ_PANEL_N}
    ),
    adist AS (
      SELECT q.vec_id, c.cid,
             CAST(list_sum(list_transform(range(len(q.qv)), j ->
               (q.qv[j+1] - c.cqv[j+1]) * (q.qv[j+1] - c.cqv[j+1])))
             AS BIGINT) AS d
      FROM qc q, cent c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM adist
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT a.vec_id AS query_id, a.cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM adist
      ) a JOIN panel p ON p.vec_id = a.vec_id
      WHERE a.rn <= {NPROBE}
    ),
    icand AS (
      SELECT pr.query_id, asg.vec_id AS neighbor_id
      FROM probes pr JOIN assign asg ON asg.cid = pr.cid
      WHERE asg.vec_id <> pr.query_id
    ),
    sub AS (SELECT UNNEST(range({PQ_M})) AS m),
    cw AS (SELECT vec_id AS wid, qv AS wqv FROM qc
           WHERE vec_id % {IVFPQ_CW_STRIDE} = 0),
    nn AS (SELECT DISTINCT neighbor_id FROM icand),
    nsub AS (
      SELECT q.vec_id, sub.m, cw.wid,
             CAST(list_sum(list_transform(range({PQ_SUB}), i ->
               (q.qv[sub.m * {PQ_SUB} + i + 1]
                - cw.wqv[sub.m * {PQ_SUB} + i + 1])
               * (q.qv[sub.m * {PQ_SUB} + i + 1]
                  - cw.wqv[sub.m * {PQ_SUB} + i + 1])))
             AS BIGINT) AS d
      FROM nn JOIN qc q ON q.vec_id = nn.neighbor_id, sub, cw
    ),
    codes AS (
      SELECT vec_id, m, wid FROM (
        SELECT vec_id, m, wid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, wid) AS rn
        FROM nsub
      ) WHERE rn = 1
    ),
    qsub AS (
      SELECT p.vec_id, sub.m, cw.wid,
             CAST(list_sum(list_transform(range({PQ_SUB}), i ->
               (p.qv[sub.m * {PQ_SUB} + i + 1]
                - cw.wqv[sub.m * {PQ_SUB} + i + 1])
               * (p.qv[sub.m * {PQ_SUB} + i + 1]
                  - cw.wqv[sub.m * {PQ_SUB} + i + 1])))
             AS BIGINT) AS d
      FROM panel p, sub, cw
    ),
    adc AS (
      SELECT ic.query_id, ic.neighbor_id,
             CAST(SUM(qs.d) AS BIGINT) AS adc_d
      FROM icand ic
      JOIN codes c ON c.vec_id = ic.neighbor_id
      JOIN qsub qs ON qs.vec_id = ic.query_id
                  AND qs.m = c.m AND qs.wid = c.wid
      GROUP BY 1, 2
    ),
    pqtop AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_d, neighbor_id) AS rk
        FROM adc
      ) WHERE rk <= {TOP_K}
    ),
    iscored AS (
      SELECT c.query_id, c.neighbor_id,
             CAST(list_sum(list_transform(range(len(qa.qv)), j ->
               (qa.qv[j+1] - qb.qv[j+1]) * (qa.qv[j+1] - qb.qv[j+1])))
             AS BIGINT) AS d
      FROM icand c
      JOIN qc qa ON qa.vec_id = c.query_id
      JOIN qc qb ON qb.vec_id = c.neighbor_id
    ),
    ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY d, neighbor_id) AS rank
        FROM iscored
      ) WHERE rank <= {TOP_K}
    ),
    brute AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM panel p JOIN qc b ON b.vec_id <> p.vec_id
      ) WHERE rank <= {TOP_K}
    )
    SELECT (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM brute)
             AS n_queries,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM brute) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ivf JOIN brute
              USING (query_id, neighbor_id)) AS n_hits_ivf,
           floor((CAST((SELECT COUNT(*) FROM ivf JOIN brute
                          USING (query_id, neighbor_id)) AS DOUBLE)
                  / (SELECT COUNT(*) FROM brute)) * 1000000 + 0.5)
             / 1000000 AS recall_ivf_at_{TOP_K},
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pqtop JOIN brute
              USING (query_id, neighbor_id)) AS n_hits_ivfpq,
           floor((CAST((SELECT COUNT(*) FROM pqtop JOIN brute
                          USING (query_id, neighbor_id)) AS DOUBLE)
                  / (SELECT COUNT(*) FROM brute)) * 1000000 + 0.5)
             / 1000000 AS recall_ivfpq_at_{TOP_K}
    """,
)
def sim_ivfpq_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT VALUE-certified recall@{TOP_K} of the COMPOSED IVF-PQ
    index — the actual production ANN shape (a coarse quantizer prunes
    to NPROBE inverted lists, product-quantized codes rank the
    survivors) — on the SQL-reproducible planted-cluster corpus. Two
    recalls side by side from the SAME probed candidate set: 'ivf'
    ranks candidates by exact int64 L2 (the ceiling the probe list
    allows — `sim_ivf_recall_clustered`'s number) and 'ivfpq' ranks
    them by the {PQ_M}-subspace ADC lookup-table sum over a
    {IVFPQ_CW_STRIDE}-stride codebook; the gap IS the compression
    cost, measured inside the exact same candidate generation. By
    construction recall_ivfpq <= recall_ivf (the exact ranking of a
    candidate set maximizes truth hits over any re-ranking of it) —
    `tests/test_round11_pending.py` asserts the invariant.

    Everything after the shared int8 quantization is int64 (matmul
    identity q² + c² − 2qc, argmin ties to the lowest id), so encode,
    probing, ADC, and the exact truth reproduce bit-identically in
    DuckDB and the recalls land in the hash. Queries are the fixed
    {PQ_PANEL_N}-vector md5-order panel (truth O(panel·corpus)).

    Scale shape: the round-8 "fit once, broadcast the model" rule —
    IVF assignment and PQ codes are computed ONCE driver-side from
    the shared corpus broadcast (O(corpus·centroids) +
    O(corpus·codewords) integer kernels, the same artifacts a real
    index build materializes) and shipped to the panel's scan tasks,
    which then do only per-query work: probe selection, a
    {PQ_M}×|codewords| LUT, ADC gathers over ~|corpus|/|centroids|
    × NPROBE candidates, and the panel-bounded truth row.

    Reference basis: none; contract F10/F14 ANN audit family — the
    composition rung above `sim_ivf_recall_clustered` (coarse-only)
    and `sim_pq_adc_recall` (PQ-only, unpruned)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    panel = (
        emb.withColumn("_pk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_pk", "vec_id")
        .limit(PQ_PANEL_N)
        .select("vec_id")
    )
    rows = fan_out(panel, spark).mapInPandas(
        _ivfpq_gen(art), schema="query_id long, neighbor_id long, tier string"
    )
    truth = rows.filter(F.col("tier") == "truth").select(
        "query_id", "neighbor_id"
    )
    ivf = rows.filter(F.col("tier") == "ivf").select(
        "query_id", "neighbor_id"
    )
    pq = rows.filter(F.col("tier") == "ivfpq").select(
        "query_id", "neighbor_id"
    )
    hits_i = ivf.join(truth, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits_ivf")
    )
    hits_p = pq.join(truth, ["query_id", "neighbor_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits_ivfpq")
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        truth.agg(
            F.count_distinct("query_id").cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_truth"),
        )
        .crossJoin(F.broadcast(hits_i))
        .crossJoin(F.broadcast(hits_p))
        .select(
            "n_queries",
            "n_truth",
            "n_hits_ivf",
            r6(F.col("n_hits_ivf").cast("double") / F.col("n_truth")).alias(
                f"recall_ivf_at_{TOP_K}"
            ),
            "n_hits_ivfpq",
            r6(
                F.col("n_hits_ivfpq").cast("double") / F.col("n_truth")
            ).alias(f"recall_ivfpq_at_{TOP_K}"),
        )
    )


INGEST_REJECT_FACTOR = 4  # reject when min_adc is > 4x below the
# query's own mean candidate ADC distance (cross-multiplied integer
# form) — per-query adaptive, so the rule stays non-trivial at every
# corpus density (a fixed distance threshold saturates as the corpus
# grows denser; measured 4/50, 4/50, 23/200 rejections at the three
# fixture SFs)


def _ingest_gen(art_bc):
    """mapInPandas generator over new-batch vectors: per vector, probe
    the NPROBE nearest coarse centroids, ADC-score the probed
    inverted lists' EXISTING members (vec_id % 10 != 9) via the PQ
    codes, and emit the admission verdict row. Stable sorts keep
    probe ties on the lowest cid — byte-identical to the oracle."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, Q, assign, codes, cids, C, wids, W = art_bc.value
        existing = ids % 10 != 9
        # Once per task: existing member row-indices per inverted list.
        # The old per-row `np.isin(assign, probes[r])` re-scanned the
        # whole corpus assignment per new vector (O(batch × corpus) plus
        # a Python loop of numpy-call overhead); gathering precomputed
        # member lists and segment-reducing the flattened ADC stream is
        # the same arithmetic over the same candidates (min/sum/len are
        # order-insensitive), verdict bit-identical (int64 throughout;
        # FACTOR·min·n ≲ 2e11 at int8-range quantization, far under
        # int64). Pinned against the loop form by
        # tests/test_streaming.py::test_ingest_gen_vectorized_matches_loop.
        members = [
            np.nonzero((assign == c) & existing)[0].astype(np.int64)
            for c in cids
        ]
        mlen = np.array([len(a) for a in members], dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ia = pdf["vec_id"].to_numpy()
            pos = np.searchsorted(ids, ia)
            qa = Q[pos]
            dq = (
                (qa * qa).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (qa @ C.T)
            )
            order = np.argsort(dq, axis=1, kind="stable")
            probes = cids[order[:, :NPROBE]]
            luts = []
            for m in range(PQ_M):
                lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
                qm, Wm = qa[:, lo:hi], W[:, lo:hi]
                luts.append(
                    (qm * qm).sum(axis=1)[:, None]
                    + (Wm * Wm).sum(axis=1)[None, :]
                    - 2 * (qm @ Wm.T)
                )
            nrows = len(ia)
            pidx = np.searchsorted(cids, probes)  # (nrows, NPROBE)
            lens = mlen[pidx].sum(axis=1)
            flat_parts = [members[j] for j in pidx.ravel()]
            flat = (
                np.concatenate(flat_parts)
                if flat_parts
                else np.empty(0, dtype=np.int64)
            )
            rep = np.repeat(np.arange(nrows), lens)
            adc = np.zeros(flat.shape[0], dtype=np.int64)
            for m in range(PQ_M):
                adc += luts[m][rep, codes[flat, m]]
            offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
            nz = lens > 0
            mn = np.full(nrows, -1, dtype=np.int64)
            sm = np.zeros(nrows, dtype=np.int64)
            if flat.size and nz.any():
                starts = offs[nz]
                mn[nz] = np.minimum.reduceat(adc, starts)
                sm[nz] = np.add.reduceat(adc, starts)
            adm = np.where(
                nz, INGEST_REJECT_FACTOR * mn * lens >= sm, True
            )
            yield pd.DataFrame(
                {
                    "vec_id": ia.astype(np.int64),
                    "cid": probes[:, 0].astype(np.int64),
                    "n_cand": lens,
                    "min_adc": mn,
                    "sum_adc": sm,
                    "admitted": adm.astype(np.int64),
                }
            )

    return gen


_INGEST_CTES = f"""
    WITH {_CLV_SQL_CTES},
    cent AS (
      SELECT vec_id AS cid, qv AS cqv FROM qc
      WHERE vec_id % {CENTROID_STRIDE} = 0
    ),
    adist AS (
      SELECT q.vec_id, c.cid,
             CAST(list_sum(list_transform(range(len(q.qv)), j ->
               (q.qv[j+1] - c.cqv[j+1]) * (q.qv[j+1] - c.cqv[j+1])))
             AS BIGINT) AS d
      FROM qc q, cent c
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM adist
      ) WHERE rn = 1
    ),
    batch AS (SELECT vec_id, qv FROM qc WHERE vec_id % 10 = 9),
    branked AS (
      SELECT a.vec_id AS query_id, a.cid, a.rn FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM adist
      ) a JOIN batch p ON p.vec_id = a.vec_id
      WHERE a.rn <= {NPROBE}
    ),
    bcid AS (SELECT query_id, cid FROM branked WHERE rn = 1),
    icand AS (
      SELECT pr.query_id, asg.vec_id AS neighbor_id
      FROM branked pr JOIN assign asg ON asg.cid = pr.cid
      WHERE asg.vec_id % 10 <> 9
    ),
    sub AS (SELECT UNNEST(range({PQ_M})) AS m),
    cw AS (SELECT vec_id AS wid, qv AS wqv FROM qc
           WHERE vec_id % {IVFPQ_CW_STRIDE} = 0),
    nn AS (SELECT DISTINCT neighbor_id FROM icand),
    nsub AS (
      SELECT q.vec_id, sub.m, cw.wid,
             CAST(list_sum(list_transform(range({PQ_SUB}), i ->
               (q.qv[sub.m * {PQ_SUB} + i + 1]
                - cw.wqv[sub.m * {PQ_SUB} + i + 1])
               * (q.qv[sub.m * {PQ_SUB} + i + 1]
                  - cw.wqv[sub.m * {PQ_SUB} + i + 1])))
             AS BIGINT) AS d
      FROM nn JOIN qc q ON q.vec_id = nn.neighbor_id, sub, cw
    ),
    codes AS (
      SELECT vec_id, m, wid FROM (
        SELECT vec_id, m, wid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                  ORDER BY d, wid) AS rn
        FROM nsub
      ) WHERE rn = 1
    ),
    qsub AS (
      SELECT p.vec_id, sub.m, cw.wid,
             CAST(list_sum(list_transform(range({PQ_SUB}), i ->
               (p.qv[sub.m * {PQ_SUB} + i + 1]
                - cw.wqv[sub.m * {PQ_SUB} + i + 1])
               * (p.qv[sub.m * {PQ_SUB} + i + 1]
                  - cw.wqv[sub.m * {PQ_SUB} + i + 1])))
             AS BIGINT) AS d
      FROM batch p, sub, cw
    ),
    adc AS (
      SELECT ic.query_id, ic.neighbor_id,
             CAST(SUM(qs.d) AS BIGINT) AS adc_d
      FROM icand ic
      JOIN codes c ON c.vec_id = ic.neighbor_id
      JOIN qsub qs ON qs.vec_id = ic.query_id
                  AND qs.m = c.m AND qs.wid = c.wid
      GROUP BY 1, 2
    ),
    st AS (
      SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_cand,
             CAST(MIN(adc_d) AS BIGINT) AS min_adc,
             CAST(SUM(adc_d) AS BIGINT) AS sum_adc
      FROM adc GROUP BY 1
    )"""


@query(
    "pipeline_vector_index_ingest",
    oracle=_INGEST_CTES
    + f"""
    SELECT b.vec_id, bc.cid,
           COALESCE(st.n_cand, 0) AS n_cand,
           COALESCE(st.min_adc, -1) AS min_adc,
           COALESCE(st.sum_adc, 0) AS sum_adc,
           CAST(CASE WHEN st.n_cand IS NULL THEN 1
                     WHEN {INGEST_REJECT_FACTOR} * st.min_adc * st.n_cand
                          < st.sum_adc THEN 0
                     ELSE 1 END AS BIGINT) AS admitted
    FROM batch b
    JOIN bcid bc ON bc.query_id = b.vec_id
    LEFT JOIN st ON st.query_id = b.vec_id
    ORDER BY b.vec_id
    """,
)
def pipeline_vector_index_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The IVF-PQ NIGHTLY-INGEST arm (round-10 verdict item #6a) — the
    vector-index sibling of `pipeline_semantic_ingest` (which probes
    the SRP band index): a new batch of vectors (vec_id % 10 == 9,
    the repo's ingest stand-in) is admitted against the PERSISTED
    composed index — the same driver-fit `_ivfpq_artifacts` the
    recall audit certifies (IVF assignment + PQ codes, fit once,
    broadcast) — by probing each new vector's {NPROBE} nearest
    inverted lists and ADC-scoring ONLY the lists' existing members
    via the PQ codes: per-ingest cost is O(batch * list), independent
    of corpus size, and no full vector is fetched at decision time —
    exactly what the compressed index is for.

    Admission is per-query ADAPTIVE and all-integer: a new vector is
    rejected as a semantic near-duplicate iff its nearest candidate
    is a distance OUTLIER within its own candidate set —
    {INGEST_REJECT_FACTOR} * min_adc * n_cand < sum_adc (the
    cross-multiplied form of min < mean/{INGEST_REJECT_FACTOR}) — so
    the rule keeps rejecting the planted near-dups as the corpus
    densifies (a fixed distance threshold saturates; measured 8%, 8%,
    11.5% rejection across the three fixture SFs). A batch vector
    whose probed lists are empty admits with (n_cand 0, min_adc -1).
    Every emitted integer (probe cid, counts, min/sum ADC) lands in
    the oracle hash bit-identically via the same int64 matmul-
    identity arithmetic as the certified recall audit.

    Scale shape: artifacts broadcast once (the round-8 rule); the
    batch fans out through mapInPandas doing per-query work only; the
    admitted rows' (vec_id, cid, codes) are precisely the index
    update a real ingest appends.

    Reference basis: none; contract F10/F14 ANN family — the ingest
    rung above `sim_ivfpq_recall_clustered`."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    batch = emb.filter(F.col("vec_id") % 10 == 9).select("vec_id")
    return (
        fan_out(batch, spark)
        .mapInPandas(
            _ingest_gen(art),
            schema=(
                "vec_id long, cid long, n_cand long, min_adc long,"
                " sum_adc long, admitted long"
            ),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Round-13 debut queue: the IVF REBALANCE EXECUTOR (verdict -> action).
# ---------------------------------------------------------------------------

_REBALANCE_CTES = (
    _INGEST_CTES
    + f""",
    adm AS MATERIALIZED (
      SELECT b.vec_id, bc.cid,
             CAST(CASE WHEN st.n_cand IS NULL THEN 1
                       WHEN {INGEST_REJECT_FACTOR} * st.min_adc * st.n_cand
                            < st.sum_adc THEN 0
                       ELSE 1 END AS BIGINT) AS admitted
      FROM batch b
      JOIN bcid bc ON bc.query_id = b.vec_id
      LEFT JOIN st ON st.query_id = b.vec_id
    ),
    mem AS MATERIALIZED (
      SELECT vec_id, cid AS list_id FROM assign WHERE vec_id % 10 <> 9
      UNION ALL
      SELECT vec_id, cid AS list_id FROM adm WHERE admitted = 1
    ),
    occ AS MATERIALIZED (
      SELECT list_id, CAST(COUNT(*) AS BIGINT) AS n_total
      FROM mem GROUP BY 1
    ),
    rtot AS MATERIALIZED (
      SELECT CAST(SUM(n_total) AS BIGINT) AS grand,
             CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM occ
    ),
    verd AS MATERIALIZED (
      SELECT occ.list_id, occ.n_total,
             CASE WHEN 2 * occ.n_total * rtot.n_lists > 3 * rtot.grand
                  THEN 1 ELSE 0 END AS do_split,
             CASE WHEN 4 * occ.n_total * rtot.n_lists < rtot.grand
                  THEN 1 ELSE 0 END AS do_merge
      FROM occ, rtot
    ),
    memd AS MATERIALIZED (
      SELECT m.vec_id, m.list_id,
             CAST(list_sum(list_transform(range(len(q.qv)), j ->
               (q.qv[j+1] - c.cqv[j+1]) * (q.qv[j+1] - c.cqv[j+1])))
             AS BIGINT) AS dpar
      FROM mem m
      JOIN verd v ON v.list_id = m.list_id AND v.do_split = 1
      JOIN qc q ON q.vec_id = m.vec_id
      JOIN cent c ON c.cid = m.list_id
    ),
    seed AS MATERIALIZED (
      SELECT list_id, vec_id AS seed_id FROM (
        SELECT list_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY list_id
                                  ORDER BY dpar DESC, vec_id) AS rn
        FROM memd WHERE vec_id <> list_id
      ) WHERE rn = 1
    ),
    sassign AS MATERIALIZED (
      SELECT md.vec_id, md.list_id,
             CASE WHEN CAST(list_sum(list_transform(range(len(q.qv)), j ->
                    (q.qv[j+1] - sq.qv[j+1]) * (q.qv[j+1] - sq.qv[j+1])))
                  AS BIGINT) < md.dpar
                  THEN s.seed_id ELSE md.list_id END AS new_list
      FROM memd md
      JOIN seed s USING (list_id)
      JOIN qc q ON q.vec_id = md.vec_id
      JOIN qc sq ON sq.vec_id = s.seed_id
    ),
    cdist AS MATERIALIZED (
      SELECT a.cid AS m_cid, b.cid AS r_cid,
             CAST(list_sum(list_transform(range(len(a.cqv)), j ->
               (a.cqv[j+1] - b.cqv[j+1]) * (a.cqv[j+1] - b.cqv[j+1])))
             AS BIGINT) AS d
      FROM cent a
      JOIN verd vm ON vm.list_id = a.cid AND vm.do_merge = 1,
      cent b
      JOIN verd vr ON vr.list_id = b.cid AND vr.do_merge = 0
    ),
    recv AS MATERIALIZED (
      SELECT m_cid, r_cid FROM (
        SELECT m_cid, r_cid,
               ROW_NUMBER() OVER (PARTITION BY m_cid
                                  ORDER BY d, r_cid) AS rn
        FROM cdist
      ) WHERE rn = 1
    ),
    moved AS MATERIALIZED (
      SELECT m.vec_id,
             COALESCE(r.r_cid, sa.new_list, m.list_id) AS new_list
      FROM mem m
      LEFT JOIN recv r ON r.m_cid = m.list_id
      LEFT JOIN sassign sa ON sa.vec_id = m.vec_id
                          AND sa.list_id = m.list_id
    ),
    after AS MATERIALIZED (
      SELECT new_list, CAST(COUNT(*) AS BIGINT) AS n_after
      FROM moved GROUP BY 1
    )"""
)

_REBALANCE_ORACLE = (
    _REBALANCE_CTES
    + """
    SELECT * FROM (
      SELECT v.list_id, v.n_total AS n_before,
             CASE WHEN v.do_merge = 1 THEN CAST(0 AS BIGINT)
                  ELSE COALESCE(a.n_after, CAST(0 AS BIGINT)) END
               AS n_after,
             CASE WHEN v.do_merge = 1 THEN 'merged_away'
                  WHEN v.do_split = 1 AND s.seed_id IS NOT NULL
                    THEN 'split_parent'
                  ELSE 'kept' END AS action
      FROM verd v
      LEFT JOIN after a ON a.new_list = v.list_id
      LEFT JOIN seed s ON s.list_id = v.list_id
      UNION ALL
      SELECT s.seed_id AS list_id, CAST(0 AS BIGINT) AS n_before,
             COALESCE(a.n_after, CAST(0 AS BIGINT)) AS n_after,
             'split_child' AS action
      FROM seed s LEFT JOIN after a ON a.new_list = s.seed_id
    ) ORDER BY list_id
    """
)


def _assign_lookup_gen(art_bc):
    """mapInPandas generator: (vec_id) -> (vec_id, list_id) by direct
    lookup into the broadcast artifact's fitted IVF assignment — a
    distributed O(1)-per-row probe of the persisted index, never a
    re-scoring pass."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, _Q, assign, *_rest = art_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            pos = np.searchsorted(ids, pdf["vec_id"].to_numpy())
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "list_id": assign[pos]}
            )

    return gen


def _rebalance_move_gen(art_bc, split_seed, merge_recv):
    """mapInPandas generator applying the rebalance decision table to
    every index member: members of merged lists move to the receiver;
    members of split lists re-score against {parent centroid, seed}
    (integer distances, ties keep the parent); everyone else stays.
    ``split_seed``/``merge_recv`` are |lists|-bounded dicts captured
    from the verdict stage."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, Q, _assign, _codes, cids, C, *_rest = art_bc.value
        cpos = {int(c): i for i, c in enumerate(cids)}
        spos = {
            int(lst): int(np.searchsorted(ids, sd))
            for lst, sd in split_seed.items()
        }
        for pdf in batches:
            if not len(pdf):
                continue
            va = pdf["vec_id"].to_numpy()
            la = pdf["list_id"].to_numpy()
            pos = np.searchsorted(ids, va)
            out = np.array(la)
            for r in range(len(va)):
                lst = int(la[r])
                if lst in merge_recv:
                    out[r] = merge_recv[lst]
                elif lst in split_seed:
                    v = Q[pos[r]]
                    dp = int(((v - C[cpos[lst]]) ** 2).sum())
                    ds = int(((v - Q[spos[lst]]) ** 2).sum())
                    if ds < dp:
                        out[r] = split_seed[lst]
            yield pd.DataFrame({"vec_id": va, "new_list": out})

    return gen


def _merge_receivers(C, cindex, merge_ids, keep_ids):
    """Nearest keep centroid per merging list — exact int64 squared
    distance, ties -> lowest keep id. Chunked numpy broadcast over the
    ascending keep axis (argmin first-hit = lowest id): identical
    values to the naive |merge|x|keep| Python scan but C-speed and
    memory-bounded (<= ~64 MB per chunk), so a fixture that ties
    |lists| to corpus/8 stays sub-second on the driver (round-12
    verdict item #6)."""
    import numpy as np

    if not merge_ids:
        return {}
    if not keep_ids:
        raise ValueError(
            "ivf rebalance: every list is a merge candidate — no keep"
            " centroid can receive the merged postings"
        )
    keep_ids = sorted(int(r) for r in keep_ids)
    K = C[[cindex[r] for r in keep_ids]]
    keep_arr = np.asarray(keep_ids, dtype=np.int64)
    out: dict[int, int] = {}
    chunk = max(1, 8_388_608 // max(1, K.shape[0] * K.shape[1]))
    for lo in range(0, len(merge_ids), chunk):
        ms = merge_ids[lo : lo + chunk]
        M = C[[cindex[m] for m in ms]]
        D = ((M[:, None, :] - K[None, :, :]) ** 2).sum(axis=2)
        near = keep_arr[D.argmin(axis=1)]
        for m, r in zip(ms, near):
            out[int(m)] = int(r)
    return out


@query("pipeline_vector_index_rebalance", oracle=_REBALANCE_ORACLE)
def pipeline_vector_index_rebalance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The IVF REBALANCE EXECUTOR — the action tier that APPLIES the
    split/merge verdicts `stream_ivf_list_maintenance` emits, closing
    the index lifecycle loop (probe -> admit -> observe occupancy ->
    rebalance): over the post-ingest membership (existing assignment
    plus the certified admission decisions, the exact `n_total` the
    maintenance verdict scored),

    - a list flagged `do_split` (occupancy > 1.5x the mean, exact
      cross-multiplied form) splits around a SEED — its member
      farthest from the parent centroid in exact int64 distance, ties
      to the lowest vec_id; every member then re-scores against
      {parent centroid, seed} and moves to the seed only when
      STRICTLY closer (ties keep the parent), so the child list is
      non-empty by construction (the seed itself moves: d=0);
    - a list flagged `do_merge` (occupancy < a quarter of the mean)
      dissolves into its nearest NON-MERGING list by exact
      centroid-centroid distance, ties to the lowest cid — a receiver
      always exists because at least one list sits at/above the mean;
      members attach to the receiver's PARENT list without
      re-scoring (rebalance actions are computed on one occupancy
      snapshot, not cascaded);
    - everything else keeps its members and may receive merges.

    Output: one row per POST-rebalance list — (list_id, n_before,
    n_after, action in {{kept, split_parent, split_child,
    merged_away}}) — with sum(n_after) == sum(n_before) (member
    conservation, pinned by the crafted suite). A split list whose
    only member is its own centroid has no seed and degrades to
    `kept` (can't fire under the occupancy rule, but the degenerate
    case is defined, not undefined).

    Scale shape: per-member work is a broadcast-artifact lookup (kept
    members) or a 2-candidate re-score (split members) inside
    mapInPandas — O(members) with no corpus×corpus term; the verdict
    table, seed map, and receiver map are |lists|-bounded (the
    index's own cardinality, the same bound the maintenance op's
    driver-side occupancy read carries). The 100 TB shape is exactly
    this: rebalance touches flagged lists' postings, not the corpus.

    Reference basis: none; contract F10/F14 ANN family — the action
    rung above `stream_ivf_list_maintenance` (round-11 verdict item
    #6a completes here)."""
    from ._shared import shared_df

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )

    batch = emb.filter(F.col("vec_id") % 10 == 9).select("vec_id")
    adm = (
        fan_out(batch, spark)
        .mapInPandas(
            _ingest_gen(art),
            schema=(
                "vec_id long, cid long, n_cand long, min_adc long,"
                " sum_adc long, admitted long"
            ),
        )
        .filter(F.col("admitted") == 1)
        .select("vec_id", F.col("cid").alias("list_id"))
    )
    existing = (
        fan_out(emb.filter(F.col("vec_id") % 10 != 9), spark)
        .select("vec_id")
        .mapInPandas(_assign_lookup_gen(art), "vec_id long, list_id long")
    )
    members = shared_df(
        "ivf_rebalance_members",
        sf_dir,
        spark,
        lambda: existing.unionByName(adm),
        materialize=True,
    )

    occ = members.groupBy("list_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    rtot = occ.agg(
        F.sum("n_total").cast("long").alias("grand"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    verd = occ.crossJoin(F.broadcast(rtot)).select(
        "list_id",
        "n_total",
        F.when(
            2 * F.col("n_total") * F.col("n_lists") > 3 * F.col("grand"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("do_split"),
        F.when(
            4 * F.col("n_total") * F.col("n_lists") < F.col("grand"), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("do_merge"),
    )

    # ---- decision tables: |lists|-bounded driver reads (the same
    # bound the maintenance op's occupancy read carries) ----
    vrows = verd.collect()
    split_ids = sorted(int(r.list_id) for r in vrows if r.do_split == 1)
    merge_ids = sorted(int(r.list_id) for r in vrows if r.do_merge == 1)
    keep_ids = sorted(
        int(r.list_id) for r in vrows if r.do_merge == 0
    )

    # split seeds: farthest member from the parent centroid, exact
    # int64, ties -> lowest vec_id (distributed argmax over members)
    split_seed: dict[int, int] = {}
    if split_ids:
        smem = members.filter(F.col("list_id").isin(split_ids))
        smd = fan_out(smem, spark).mapInPandas(
            _split_dist_gen(art), "vec_id long, list_id long, dpar long"
        )
        seeds = (
            smd.filter(F.col("vec_id") != F.col("list_id"))
            .groupBy("list_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("dpar").alias("d"),
                        (-F.col("vec_id")).alias("nv"),
                    )
                ).alias("mx")
            )
            .select("list_id", (-F.col("mx.nv")).alias("seed_id"))
        )
        split_seed = {
            int(r.list_id): int(r.seed_id) for r in seeds.collect()
        }

    # merge receivers: nearest non-merging centroid, driver-side over
    # the |lists| x |lists| integer distance table
    merge_recv: dict[int, int] = {}
    if merge_ids:
        _ids_a, _Q, _assign, _codes, cids, C, _w, _W = art.value
        cindex = {int(c): i for i, c in enumerate(cids)}
        merge_recv = _merge_receivers(C, cindex, merge_ids, keep_ids)

    moved = fan_out(members, spark).mapInPandas(
        _rebalance_move_gen(art, split_seed, merge_recv),
        "vec_id long, new_list long",
    )
    after = moved.groupBy("new_list").agg(
        F.count(F.lit(1)).cast("long").alias("n_after")
    )

    z = F.lit(0).cast("long")
    seed_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in sorted(split_seed.items())]
        or [(None, None)],
        "list_id long, seed_id long",
    ).filter(F.col("list_id").isNotNull())
    parents = (
        verd.join(after, verd.list_id == after.new_list, "left")
        .join(seed_df, "list_id", "left")
        .select(
            "list_id",
            F.col("n_total").alias("n_before"),
            F.when(F.col("do_merge") == 1, z)
            .otherwise(F.coalesce("n_after", z))
            .cast("long")
            .alias("n_after"),
            F.when(F.col("do_merge") == 1, F.lit("merged_away"))
            .when(
                (F.col("do_split") == 1) & F.col("seed_id").isNotNull(),
                F.lit("split_parent"),
            )
            .otherwise(F.lit("kept"))
            .alias("action"),
        )
    )
    children = (
        seed_df.select(F.col("seed_id").alias("list_id"))
        .join(after, F.col("list_id") == F.col("new_list"), "left")
        .select(
            "list_id",
            z.alias("n_before"),
            F.coalesce("n_after", z).cast("long").alias("n_after"),
            F.lit("split_child").alias("action"),
        )
    )
    return parents.unionByName(children).orderBy("list_id")


def _split_dist_gen(art_bc):
    """mapInPandas generator: (vec_id, list_id) -> + exact int64
    distance to the parent centroid, for split-seed selection."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, Q, _assign, _codes, cids, C, *_rest = art_bc.value
        cpos = {int(c): i for i, c in enumerate(cids)}
        for pdf in batches:
            if not len(pdf):
                continue
            va = pdf["vec_id"].to_numpy()
            la = pdf["list_id"].to_numpy()
            pos = np.searchsorted(ids, va)
            d = np.empty(len(va), dtype=np.int64)
            for r in range(len(va)):
                diff = Q[pos[r]] - C[cpos[int(la[r])]]
                d[r] = int((diff * diff).sum())
            yield pd.DataFrame(
                {"vec_id": va, "list_id": la, "dpar": d}
            )

    return gen


def _rebalance_plan(art):
    """Driver-side numpy replica of the certified rebalance decision
    chain (admission -> occupancy -> verdicts -> seeds/receivers ->
    moves) over the broadcast `_ivfpq_artifacts` — the "fit once,
    broadcast the model" rule applied to the POST-rebalance index so
    the recall re-audit's scan tasks do per-query work only. Returns
    (member_ids, member_before, member_after, acent_ids, acent_vecs):
    index members with their pre/post-rebalance list ids, plus the
    post-rebalance probeable centroid table (survivors keep their
    centroid vector, split children use the seed's vector, merged
    lists are gone) sorted ascending by list id for tie stability.
    Certified against the rebalance op's own output by the crafted
    suite and against the SQL oracle by the driver gate."""
    import numpy as np

    ids, Q, assign, codes, cids, C, wids, W = art
    existing = ids % 10 != 9
    bidx = np.nonzero(~existing)[0]

    # admission (the _ingest_gen rule, vectorized)
    adm_pos, adm_list = [], []
    if len(bidx):
        qa = Q[bidx]
        dq = (
            (qa * qa).sum(axis=1)[:, None]
            + (C * C).sum(axis=1)[None, :]
            - 2 * (qa @ C.T)
        )
        order = np.argsort(dq, axis=1, kind="stable")
        probes = cids[order[:, :NPROBE]]
        luts = []
        for m in range(PQ_M):
            lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
            qm, Wm = qa[:, lo:hi], W[:, lo:hi]
            luts.append(
                (qm * qm).sum(axis=1)[:, None]
                + (Wm * Wm).sum(axis=1)[None, :]
                - 2 * (qm @ Wm.T)
            )
        for r in range(len(bidx)):
            cand = np.isin(assign, probes[r]) & existing
            cidx = np.nonzero(cand)[0]
            adc = np.zeros(len(cidx), dtype=np.int64)
            for m in range(PQ_M):
                adc += luts[m][r][codes[cidx, m]]
            n = len(cidx)
            if n:
                mn, sm = int(adc.min()), int(adc.sum())
                admitted = not (INGEST_REJECT_FACTOR * mn * n < sm)
            else:
                admitted = True
            if admitted:
                adm_pos.append(int(bidx[r]))
                adm_list.append(int(probes[r][0]))

    member_pos = np.concatenate(
        [np.nonzero(existing)[0], np.array(adm_pos, dtype=np.int64)]
    ).astype(np.int64)
    member_before = np.concatenate(
        [assign[existing], np.array(adm_list, dtype=np.int64)]
    ).astype(np.int64)
    member_ids = ids[member_pos]

    # occupancy + verdicts (exact cross-multiplied maintenance rules)
    occ_ids, occ_n = np.unique(member_before, return_counts=True)
    grand, n_lists = int(occ_n.sum()), len(occ_ids)
    do_split = 2 * occ_n * n_lists > 3 * grand
    do_merge = 4 * occ_n * n_lists < grand
    cpos = {int(c): i for i, c in enumerate(cids)}

    split_seed: dict[int, int] = {}
    for li, flag in zip(occ_ids, do_split):
        if not flag:
            continue
        lst = int(li)
        sel = (member_before == lst) & (member_ids != lst)
        if not sel.any():
            continue
        mp = member_pos[sel]
        diff = Q[mp] - C[cpos[lst]]
        d = (diff * diff).sum(axis=1)
        mids = member_ids[sel]
        best = np.lexsort((mids, -d))[0]
        split_seed[lst] = int(mids[best])

    merge_recv: dict[int, int] = {}
    keep = [int(li) for li, f in zip(occ_ids, do_merge) if not f]
    for li, flag in zip(occ_ids, do_merge):
        if not flag:
            continue
        m = int(li)
        best = None
        for r in keep:
            d = int(((C[cpos[m]] - C[cpos[r]]) ** 2).sum())
            if best is None or (d, r) < best:
                best = (d, r)
        merge_recv[m] = best[1]

    member_after = member_before.copy()
    sidpos = {
        lst: int(np.searchsorted(ids, sd)) for lst, sd in split_seed.items()
    }
    for i in range(len(member_ids)):
        lst = int(member_before[i])
        if lst in merge_recv:
            member_after[i] = merge_recv[lst]
        elif lst in split_seed:
            v = Q[member_pos[i]]
            dp = int(((v - C[cpos[lst]]) ** 2).sum())
            ds = int(((v - Q[sidpos[lst]]) ** 2).sum())
            if ds < dp:
                member_after[i] = split_seed[lst]

    acent = [
        (int(li), C[cpos[int(li)]])
        for li, f in zip(occ_ids, do_merge)
        if not f
    ] + [(sd, Q[sidpos[lst]]) for lst, sd in split_seed.items()]
    acent.sort(key=lambda t: t[0])
    acent_ids = np.array([t[0] for t in acent], dtype=np.int64)
    acent_vecs = np.stack([t[1] for t in acent]) if acent else np.zeros((0, Q.shape[1]), dtype=np.int64)
    return member_ids, member_before, member_after, acent_ids, acent_vecs


def _ivf_rebal_gen(art_bc, plan_bc):
    """mapInPandas generator for the rebalanced-recall audit: per panel
    query emit exact truth over the index members plus the coarse-IVF
    top-k under the BEFORE (original lists/centroids) and AFTER
    (rebalanced lists/centroid table) index states. Stable sorts keep
    every tie on the lowest id — byte-identical to the oracle."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, Q, _assign, _codes, cids, C, _wids, _W = art_bc.value
        member_ids, mb, ma, aids, avecs = plan_bc.value
        mpos = np.searchsorted(ids, member_ids)
        Qm = Q[mpos]
        BIG = np.int64(1 << 62)
        for pdf in batches:
            if not len(pdf):
                continue
            ia = pdf["vec_id"].to_numpy()
            pos = np.searchsorted(ids, ia)
            qa = Q[pos]
            db = (
                (qa * qa).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (qa @ C.T)
            )
            pb = cids[np.argsort(db, axis=1, kind="stable")[:, :NPROBE]]
            da = (
                (qa * qa).sum(axis=1)[:, None]
                + (avecs * avecs).sum(axis=1)[None, :]
                - 2 * (qa @ avecs.T)
            )
            pa = aids[np.argsort(da, axis=1, kind="stable")[:, :NPROBE]]
            dm = (
                (qa * qa).sum(axis=1)[:, None]
                + (Qm * Qm).sum(axis=1)[None, :]
                - 2 * (qa @ Qm.T)
            )
            dm = np.where(ia[:, None] == member_ids[None, :], BIG, dm)
            out_q, out_n, out_t = [], [], []

            def take(q_id, nbr, tier):
                out_q.extend([q_id] * len(nbr))
                out_n.extend(int(v) for v in nbr)
                out_t.extend([tier] * len(nbr))

            for r in range(len(ia)):
                take(
                    int(ia[r]),
                    member_ids[np.lexsort((member_ids, dm[r]))[:TOP_K]],
                    "truth",
                )
                for tier, probes, lists in (
                    ("before", pb[r], mb),
                    ("after", pa[r], ma),
                ):
                    cand = np.isin(lists, probes) & (member_ids != ia[r])
                    cidx = np.nonzero(cand)[0]
                    nbr = member_ids[cidx]
                    de = dm[r][cidx]
                    take(
                        int(ia[r]),
                        nbr[np.lexsort((nbr, de))[:TOP_K]],
                        tier,
                    )
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "tier": out_t}
            )

    return gen


_REBAL_RECALL_ORACLE = (
    _REBALANCE_CTES
    + f""",
    panel AS MATERIALIZED (
      SELECT vec_id, qv FROM (
        SELECT vec_id, qv,
               ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pr
        FROM qc
      ) WHERE pr <= {PQ_PANEL_N}
    ),
    memq AS MATERIALIZED (
      SELECT m.vec_id, m.list_id AS before_list, mv.new_list AS after_list,
             q.qv
      FROM mem m
      JOIN moved mv USING (vec_id)
      JOIN qc q ON q.vec_id = m.vec_id
    ),
    rtruth AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM panel p JOIN memq b ON b.vec_id <> p.vec_id
      ) WHERE rank <= {TOP_K}
    ),
    acent AS MATERIALIZED (
      SELECT v.list_id, c.cqv AS cv
      FROM verd v JOIN cent c ON c.cid = v.list_id
      WHERE v.do_merge = 0
      UNION ALL
      SELECT s.seed_id AS list_id, q.qv AS cv
      FROM seed s JOIN qc q ON q.vec_id = s.seed_id
    ),
    pr_b AS MATERIALIZED (
      SELECT query_id, cid FROM (
        SELECT p.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - c.cqv[j+1]) * (p.qv[j+1] - c.cqv[j+1])))
                 AS BIGINT), c.cid) AS rn
        FROM panel p, cent c
      ) WHERE rn <= {NPROBE}
    ),
    pr_a AS MATERIALIZED (
      SELECT query_id, list_id FROM (
        SELECT p.vec_id AS query_id, a.list_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - a.cv[j+1]) * (p.qv[j+1] - a.cv[j+1])))
                 AS BIGINT), a.list_id) AS rn
        FROM panel p, acent a
      ) WHERE rn <= {NPROBE}
    ),
    ivb AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT pb.query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY pb.query_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM pr_b pb
        JOIN panel p ON p.vec_id = pb.query_id
        JOIN memq b ON b.before_list = pb.cid AND b.vec_id <> pb.query_id
      ) WHERE rank <= {TOP_K}
    ),
    iva AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT pa.query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY pa.query_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM pr_a pa
        JOIN panel p ON p.vec_id = pa.query_id
        JOIN memq b ON b.after_list = pa.list_id AND b.vec_id <> pa.query_id
      ) WHERE rank <= {TOP_K}
    )
    SELECT * FROM (
      SELECT 'after' AS tier,
             (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM rtruth)
               AS n_queries,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM rtruth) AS n_truth,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM iva JOIN rtruth
                USING (query_id, neighbor_id)) AS n_hits,
             floor((CAST((SELECT COUNT(*) FROM iva JOIN rtruth
                            USING (query_id, neighbor_id)) AS DOUBLE)
                    / (SELECT COUNT(*) FROM rtruth)) * 1000000 + 0.5)
               / 1000000 AS recall_at_{TOP_K}
      UNION ALL
      SELECT 'before' AS tier,
             (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM rtruth)
               AS n_queries,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM rtruth) AS n_truth,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM ivb JOIN rtruth
                USING (query_id, neighbor_id)) AS n_hits,
             floor((CAST((SELECT COUNT(*) FROM ivb JOIN rtruth
                            USING (query_id, neighbor_id)) AS DOUBLE)
                    / (SELECT COUNT(*) FROM rtruth)) * 1000000 + 0.5)
               / 1000000 AS recall_at_{TOP_K}
    ) ORDER BY tier
    """
)


@query("sim_ivf_rebalanced_recall", oracle=_REBAL_RECALL_ORACLE)
def sim_ivf_rebalanced_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@{TOP_K} of the coarse IVF tier BEFORE vs AFTER the
    rebalance executor's actions — the re-certification rung that
    closes the maintenance loop (round-11 verdict item #6a): verdicts
    (`stream_ivf_list_maintenance`) -> action
    (`pipeline_vector_index_rebalance`) -> THIS audit proving the
    rebalanced index still finds what the pre-rebalance index found,
    over the identical {PQ_PANEL_N}-query md5-order panel and the
    identical exact-truth denominators.

    Both index states search the SAME post-ingest membership
    (existing assignment + certified admissions), so the only moving
    part is the list geometry: 'before' probes the original stride
    centroids with members on their fitted lists; 'after' probes the
    post-rebalance centroid table (survivors keep their centroid
    vector, split children are probed AT the seed vector, merged
    lists are gone) with members on their moved lists. Exact int64
    arithmetic end to end; ties to the lowest id via stable sorts —
    the recall values land in the oracle hash bit-identically.

    Scale shape: the rebalance plan is fitted once driver-side from
    the SHARED `ivfpq_artifacts` broadcast (`_rebalance_plan` — the
    same admission/verdict/seed arithmetic the executor certifies,
    |lists|-bounded decision tables) and broadcast; panel scan tasks
    do per-query work only — two probe selections and
    inverted-list-bounded candidate ranking, O(panel * members) worst
    case on the exact-truth row, identical to the certified
    `sim_ivf_recall_clustered` shape.

    Reference basis: none; contract F10/F14 ANN audit family."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    plan = shared_broadcast(
        "ivf_rebalance_plan",
        sf_dir,
        spark,
        lambda: _rebalance_plan(art.value),
    )
    panel = (
        emb.withColumn("_pk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_pk", "vec_id")
        .limit(PQ_PANEL_N)
        .select("vec_id")
    )
    rows = fan_out(panel, spark).mapInPandas(
        _ivf_rebal_gen(art, plan),
        schema="query_id long, neighbor_id long, tier string",
    )
    truth = rows.filter(F.col("tier") == "truth").select(
        "query_id", "neighbor_id"
    )
    denom = truth.agg(
        F.count_distinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("n_truth"),
    )
    tiers = rows.filter(F.col("tier") != "truth")
    hits = (
        tiers.join(truth, ["query_id", "neighbor_id"])
        .groupBy("tier")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    # a tier with zero hits still needs its row
    base = tiers.select("tier").distinct()
    return (
        base.join(hits, "tier", "left")
        .crossJoin(F.broadcast(denom))
        .select(
            "tier",
            "n_queries",
            "n_truth",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (
                F.floor(
                    (
                        F.coalesce("n_hits", F.lit(0)).cast("double")
                        / F.col("n_truth")
                    )
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias(f"recall_at_{TOP_K}"),
        )
        .orderBy("tier")
    )


# ---------------------------------------------------------------------------
# Round-13 debut queue: DELETE + COMPACT over the vector index (the
# lifecycle rung after ingest/maintain/rebalance).
# ---------------------------------------------------------------------------

DELETE_MOD = 25  # tombstone rule: members with vec_id % 25 == 3

_DELETE_COMPACT_ORACLE = (
    _INGEST_CTES
    + f""",
    adm AS (
      SELECT b.vec_id, bc.cid,
             CAST(CASE WHEN st.n_cand IS NULL THEN 1
                       WHEN {INGEST_REJECT_FACTOR} * st.min_adc * st.n_cand
                            < st.sum_adc THEN 0
                       ELSE 1 END AS BIGINT) AS admitted
      FROM batch b
      JOIN bcid bc ON bc.query_id = b.vec_id
      LEFT JOIN st ON st.query_id = b.vec_id
    ),
    mem AS MATERIALIZED (
      SELECT vec_id, cid AS list_id FROM assign WHERE vec_id % 10 <> 9
      UNION ALL
      SELECT vec_id, cid AS list_id FROM adm WHERE admitted = 1
    ),
    dstat AS (
      SELECT list_id,
             CAST(COUNT(*) AS BIGINT) AS n_before,
             CAST(COALESCE(SUM(CASE WHEN vec_id % {DELETE_MOD} = 3
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_deleted
      FROM mem GROUP BY 1
    )
    SELECT list_id, n_before, n_deleted,
           CAST(n_before - n_deleted AS BIGINT) AS n_live,
           CAST(CASE WHEN 4 * n_deleted >= n_before THEN 1 ELSE 0 END
                AS BIGINT) AS do_compact,
           CAST(CASE WHEN 4 * n_deleted >= n_before THEN n_deleted
                     ELSE 0 END AS BIGINT) AS n_reclaimed,
           CAST(CASE WHEN 4 * n_deleted >= n_before THEN 0
                     ELSE n_deleted END AS BIGINT) AS n_tombstones
    FROM dstat
    ORDER BY list_id
    """
)


@query(
    "pipeline_vector_index_delete_compact", oracle=_DELETE_COMPACT_ORACLE
)
def pipeline_vector_index_delete_compact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETE + COMPACT over the vector index — the lifecycle rung
    that completes the family (probe -> admit -> observe -> rebalance
    -> now retire): a deterministic tombstone set (members with
    vec_id % {DELETE_MOD} == 3 — the repo's deletion stand-in, e.g.
    docs pulled for takedown or dedup) marks rows dead across the
    POST-ingest membership (existing assignment + certified
    admissions — the same `mem` the rebalance executor certifies),
    and each inverted list gets the nightly compaction decision: a
    list REWRITES (reclaiming its dead postings) iff at least a
    quarter of it is dead (exact integer 4·deleted >= before);
    otherwise the tombstones stay in place and the probe path keeps
    filtering them — the classic write-amplification vs read-overhead
    trade, decided per list, not globally.

    Per list: members before, deleted, live, the compaction verdict,
    and the reclaimed vs still-tombstoned split (one of the two is
    always zero — pinned by the crafted suite). Conservation:
    Σ n_deleted == Σ n_reclaimed + Σ n_tombstones.

    Scale shape: ONE groupBy over the shared session-materialized
    membership artifact (`ivf_rebalance_members` — computed once,
    read by the rebalance executor AND this op); the verdict is
    |lists| rows of integer arithmetic. No corpus rescans, no
    re-scoring — deletion never touches vectors, only postings.

    Reference basis: none; contract F10/F14 ANN family — the
    retirement rung beside `pipeline_vector_index_rebalance`."""
    from ._shared import shared_df

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    batch = emb.filter(F.col("vec_id") % 10 == 9).select("vec_id")
    adm = (
        fan_out(batch, spark)
        .mapInPandas(
            _ingest_gen(art),
            schema=(
                "vec_id long, cid long, n_cand long, min_adc long,"
                " sum_adc long, admitted long"
            ),
        )
        .filter(F.col("admitted") == 1)
        .select("vec_id", F.col("cid").alias("list_id"))
    )
    existing = (
        fan_out(emb.filter(F.col("vec_id") % 10 != 9), spark)
        .select("vec_id")
        .mapInPandas(_assign_lookup_gen(art), "vec_id long, list_id long")
    )
    members = shared_df(
        "ivf_rebalance_members",
        sf_dir,
        spark,
        lambda: existing.unionByName(adm),
        materialize=True,
    )
    dead = F.when(F.col("vec_id") % DELETE_MOD == 3, 1).otherwise(0)
    stat = members.groupBy("list_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(dead).cast("long").alias("n_deleted"),
    )
    compact = 4 * F.col("n_deleted") >= F.col("n_before")
    z = F.lit(0).cast("long")
    return stat.select(
        "list_id",
        "n_before",
        "n_deleted",
        (F.col("n_before") - F.col("n_deleted")).cast("long").alias("n_live"),
        F.when(compact, 1).otherwise(0).cast("long").alias("do_compact"),
        F.when(compact, F.col("n_deleted")).otherwise(z)
        .cast("long")
        .alias("n_reclaimed"),
        F.when(compact, z).otherwise(F.col("n_deleted"))
        .cast("long")
        .alias("n_tombstones"),
    ).orderBy("list_id")


# ---------------------------------------------------------------------------
# Round-14 debut queue: the COMPACTION EXECUTOR + post-compaction
# recall re-audit + the lifecycle decision report (closing the index
# family: probe -> admit -> observe -> rebalance -> retire -> compact
# -> re-certify).
# ---------------------------------------------------------------------------

_MEM_CTES = (
    _INGEST_CTES
    + f""",
    adm AS (
      SELECT b.vec_id, bc.cid,
             CAST(CASE WHEN st.n_cand IS NULL THEN 1
                       WHEN {INGEST_REJECT_FACTOR} * st.min_adc * st.n_cand
                            < st.sum_adc THEN 0
                       ELSE 1 END AS BIGINT) AS admitted
      FROM batch b
      JOIN bcid bc ON bc.query_id = b.vec_id
      LEFT JOIN st ON st.query_id = b.vec_id
    ),
    mem AS MATERIALIZED (
      SELECT vec_id, cid AS list_id FROM assign WHERE vec_id % 10 <> 9
      UNION ALL
      SELECT vec_id, cid AS list_id FROM adm WHERE admitted = 1
    )"""
)

_COMPACTION_ORACLE = (
    _MEM_CTES
    + f""",
    dstat AS MATERIALIZED (
      SELECT list_id,
             CAST(COUNT(*) AS BIGINT) AS n_before,
             CAST(COALESCE(SUM(CASE WHEN vec_id % {DELETE_MOD} = 3
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_deleted
      FROM mem GROUP BY 1
    ),
    dig AS MATERIALIZED (
      SELECT list_id,
             md5(string_agg(CAST(vec_id AS VARCHAR), ','
                            ORDER BY vec_id)) AS live_md5
      FROM mem WHERE vec_id % {DELETE_MOD} <> 3 GROUP BY 1
    )
    SELECT d.list_id,
           d.n_before AS n_postings_before,
           CAST(CASE WHEN 4 * d.n_deleted >= d.n_before THEN 1 ELSE 0 END
                AS BIGINT) AS compacted,
           CAST(CASE WHEN 4 * d.n_deleted >= d.n_before
                     THEN d.n_before - d.n_deleted
                     ELSE d.n_before END AS BIGINT) AS n_postings_after,
           CAST(d.n_before - d.n_deleted AS BIGINT) AS n_live,
           g.live_md5
    FROM dstat d LEFT JOIN dig g USING (list_id)
    ORDER BY d.list_id
    """
)


@query("pipeline_vector_index_compaction", oracle=_COMPACTION_ORACLE)
def pipeline_vector_index_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The COMPACTION EXECUTOR — applies the per-list verdicts
    `pipeline_vector_index_delete_compact` emits (round-12 verdict
    item #7): lists where at least a quarter of the postings are dead
    (exact integer 4·deleted >= before) are REWRITTEN — their posting
    count drops to the live count — while under-threshold lists keep
    their tombstones in place (postings_after == postings_before, the
    probe path keeps filtering). The rewrite is certified by CONTENT,
    not just counts: `live_md5` is the md5 over the list's ascending
    live member ids (','-joined, the canonical posting-file rendering)
    — the digest a storage layer would record beside the rewritten
    segment, and the value the re-audit (`sim_ivf_compacted_recall`)
    implicitly searches. A list can never go fully dead on a stride
    corpus (its centroid is structurally live: multiples of the
    50-stride are never ≡ 3 mod {DELETE_MOD}), so the LEFT JOIN's
    NULL live_md5 arm is defensive, not reachable — pinned by the
    singleton-survivor crafted test.

    Scale shape: ONE groupBy over the shared session-materialized
    membership artifact (`ivf_rebalance_members`) for the stats plus
    one live-only groupBy for the digests — both |members|-linear
    with |lists|-row outputs; the digest aggregate is the only
    collect_list and it is list-bounded (a posting list by
    construction fits a worker — the same bound the index itself
    requires). No vector ever moves: compaction touches postings
    only.

    Reference basis: none; contract F10/F14 ANN family — completes
    retire the way `pipeline_vector_index_rebalance` completed
    occupancy."""
    from ._shared import shared_df

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    batch = emb.filter(F.col("vec_id") % 10 == 9).select("vec_id")
    adm = (
        fan_out(batch, spark)
        .mapInPandas(
            _ingest_gen(art),
            schema=(
                "vec_id long, cid long, n_cand long, min_adc long,"
                " sum_adc long, admitted long"
            ),
        )
        .filter(F.col("admitted") == 1)
        .select("vec_id", F.col("cid").alias("list_id"))
    )
    existing = (
        fan_out(emb.filter(F.col("vec_id") % 10 != 9), spark)
        .select("vec_id")
        .mapInPandas(_assign_lookup_gen(art), "vec_id long, list_id long")
    )
    members = shared_df(
        "ivf_rebalance_members",
        sf_dir,
        spark,
        lambda: existing.unionByName(adm),
        materialize=True,
    )
    dead = F.col("vec_id") % DELETE_MOD == 3
    stat = members.groupBy("list_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(F.when(dead, 1).otherwise(0)).cast("long").alias("n_deleted"),
    )
    dig = (
        members.filter(~dead)
        .groupBy("list_id")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("vec_id")),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("live_md5")
        )
    )
    compact = 4 * F.col("n_deleted") >= F.col("n_before")
    return (
        stat.join(dig, "list_id", "left")
        .select(
            "list_id",
            F.col("n_before").alias("n_postings_before"),
            F.when(compact, 1).otherwise(0).cast("long").alias("compacted"),
            F.when(compact, F.col("n_before") - F.col("n_deleted"))
            .otherwise(F.col("n_before"))
            .cast("long")
            .alias("n_postings_after"),
            (F.col("n_before") - F.col("n_deleted"))
            .cast("long")
            .alias("n_live"),
            "live_md5",
        )
        .orderBy("list_id")
    )


def _ivf_compact_gen(art_bc, plan_bc):
    """mapInPandas generator for the post-compaction recall audit: per
    panel query emit exact truth + coarse-IVF top-k under the BEFORE
    (full membership, tombstones still probed) and AFTER (live-only
    membership — what the compacted/tombstone-filtered probe path
    returns) index states. Same stable-sort lowest-id tie discipline
    as `_ivf_rebal_gen` — byte-identical to the oracle."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        ids, Q, _assign, _codes, cids, C, _wids, _W = art_bc.value
        member_ids, mb, _ma, _aids, _avecs = plan_bc.value
        mpos = np.searchsorted(ids, member_ids)
        Qm = Q[mpos]
        live = member_ids % DELETE_MOD != 3
        BIG = np.int64(1 << 62)
        for pdf in batches:
            if not len(pdf):
                continue
            ia = pdf["vec_id"].to_numpy()
            pos = np.searchsorted(ids, ia)
            qa = Q[pos]
            db = (
                (qa * qa).sum(axis=1)[:, None]
                + (C * C).sum(axis=1)[None, :]
                - 2 * (qa @ C.T)
            )
            pb = cids[np.argsort(db, axis=1, kind="stable")[:, :NPROBE]]
            dm = (
                (qa * qa).sum(axis=1)[:, None]
                + (Qm * Qm).sum(axis=1)[None, :]
                - 2 * (qa @ Qm.T)
            )
            dm = np.where(ia[:, None] == member_ids[None, :], BIG, dm)
            out_q, out_n, out_t = [], [], []

            def take(q_id, nbr, tier):
                out_q.extend([q_id] * len(nbr))
                out_n.extend(int(v) for v in nbr)
                out_t.extend([tier] * len(nbr))

            for r in range(len(ia)):
                probed = np.isin(mb, pb[r]) & (member_ids != ia[r])
                for tier_t, tier_i, mask in (
                    ("truth_before", "before", np.ones_like(live)),
                    ("truth_after", "after", live),
                ):
                    tm = mask & (member_ids != ia[r])
                    tidx = np.nonzero(tm)[0]
                    nbr, de = member_ids[tidx], dm[r][tidx]
                    take(
                        int(ia[r]),
                        nbr[np.lexsort((nbr, de))[:TOP_K]],
                        tier_t,
                    )
                    cidx = np.nonzero(probed & mask)[0]
                    nbr, de = member_ids[cidx], dm[r][cidx]
                    take(
                        int(ia[r]),
                        nbr[np.lexsort((nbr, de))[:TOP_K]],
                        tier_i,
                    )
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "tier": out_t}
            )

    return gen


_COMPACT_RECALL_ORACLE = (
    _MEM_CTES
    + f""",
    panel AS MATERIALIZED (
      SELECT vec_id, qv FROM (
        SELECT vec_id, qv,
               ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pr
        FROM qc
      ) WHERE pr <= {PQ_PANEL_N}
    ),
    memq AS MATERIALIZED (
      SELECT m.vec_id, m.list_id,
             CAST(m.vec_id % {DELETE_MOD} <> 3 AS BIGINT) AS is_live,
             q.qv
      FROM mem m JOIN qc q ON q.vec_id = m.vec_id
    ),
    tr_b AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM panel p JOIN memq b ON b.vec_id <> p.vec_id
      ) WHERE rank <= {TOP_K}
    ),
    tr_a AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM panel p JOIN memq b ON b.vec_id <> p.vec_id
                     AND b.is_live = 1
      ) WHERE rank <= {TOP_K}
    ),
    prq AS MATERIALIZED (
      SELECT query_id, cid FROM (
        SELECT p.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - c.cqv[j+1]) * (p.qv[j+1] - c.cqv[j+1])))
                 AS BIGINT), c.cid) AS rn
        FROM panel p, cent c
      ) WHERE rn <= {NPROBE}
    ),
    iv_b AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT pq.query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY pq.query_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM prq pq
        JOIN panel p ON p.vec_id = pq.query_id
        JOIN memq b ON b.list_id = pq.cid AND b.vec_id <> pq.query_id
      ) WHERE rank <= {TOP_K}
    ),
    iv_a AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT pq.query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY pq.query_id ORDER BY
                 CAST(list_sum(list_transform(range(len(p.qv)), j ->
                   (p.qv[j+1] - b.qv[j+1]) * (p.qv[j+1] - b.qv[j+1])))
                 AS BIGINT), b.vec_id) AS rank
        FROM prq pq
        JOIN panel p ON p.vec_id = pq.query_id
        JOIN memq b ON b.list_id = pq.cid AND b.vec_id <> pq.query_id
                   AND b.is_live = 1
      ) WHERE rank <= {TOP_K}
    )
    SELECT * FROM (
      SELECT 'after' AS tier,
             (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM tr_a)
               AS n_queries,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tr_a) AS n_truth,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM iv_a JOIN tr_a
                USING (query_id, neighbor_id)) AS n_hits,
             floor((CAST((SELECT COUNT(*) FROM iv_a JOIN tr_a
                            USING (query_id, neighbor_id)) AS DOUBLE)
                    / (SELECT COUNT(*) FROM tr_a)) * 1000000 + 0.5)
               / 1000000 AS recall_at_{TOP_K}
      UNION ALL
      SELECT 'before' AS tier,
             (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM tr_b)
               AS n_queries,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM tr_b) AS n_truth,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM iv_b JOIN tr_b
                USING (query_id, neighbor_id)) AS n_hits,
             floor((CAST((SELECT COUNT(*) FROM iv_b JOIN tr_b
                            USING (query_id, neighbor_id)) AS DOUBLE)
                    / (SELECT COUNT(*) FROM tr_b)) * 1000000 + 0.5)
               / 1000000 AS recall_at_{TOP_K}
    ) ORDER BY tier
    """
)


@query("sim_ivf_compacted_recall", oracle=_COMPACT_RECALL_ORACLE)
def sim_ivf_compacted_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Recall@{TOP_K} BEFORE vs AFTER delete+compaction — the
    re-certification rung that closes the retirement loop the way
    `sim_ivf_rebalanced_recall` closed rebalance (round-12 verdict
    item #7): 'before' is the original index over the full post-ingest
    membership with truth over that membership; 'after' is the
    compacted/tombstone-filtered probe path — live members only — with
    truth over the LIVE corpus (deletions shrink the answer set, so
    the honest denominator shrinks with it). A green row certifies
    both halves of the deletion contract: no dead posting is ever
    returned, and coarse recall over the surviving corpus is
    preserved. List geometry is identical across tiers (compaction
    never moves a vector), so any recall delta is attributable to the
    membership change alone.

    Exact int64 arithmetic end to end; ties to the lowest id via
    stable sorts — the recall values land in the oracle hash
    bit-identically.

    Scale shape: identical to `sim_ivf_rebalanced_recall` — fitted
    artifacts broadcast once (the SHARED `ivf_rebalance_plan`
    supplies the membership; only its before-lists leg is read),
    panel scan tasks do per-query work only, O(panel · members) worst
    case on the exact-truth rows, recall pinned to the fixed
    {PQ_PANEL_N}-query md5 panel (the round-8 quadratic-truth fix).

    Reference basis: none; contract F10/F14 ANN audit family."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    plan = shared_broadcast(
        "ivf_rebalance_plan",
        sf_dir,
        spark,
        lambda: _rebalance_plan(art.value),
    )
    panel = (
        emb.withColumn("_pk", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_pk", "vec_id")
        .limit(PQ_PANEL_N)
        .select("vec_id")
    )
    rows = fan_out(panel, spark).mapInPandas(
        _ivf_compact_gen(art, plan),
        schema="query_id long, neighbor_id long, tier string",
    )
    out = []
    for tier, truth_tier in (("after", "truth_after"), ("before", "truth_before")):
        truth = rows.filter(F.col("tier") == truth_tier).select(
            "query_id", "neighbor_id"
        )
        denom = truth.agg(
            F.count_distinct("query_id").cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_truth"),
        )
        hits = (
            rows.filter(F.col("tier") == tier)
            .join(truth, ["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        out.append(
            denom.crossJoin(F.broadcast(hits)).select(
                F.lit(tier).alias("tier"),
                "n_queries",
                "n_truth",
                "n_hits",
                (
                    F.floor(
                        (F.col("n_hits").cast("double") / F.col("n_truth"))
                        * 1000000
                        + F.lit(0.5)
                    )
                    / 1000000
                ).alias(f"recall_at_{TOP_K}"),
            )
        )
    return out[0].unionByName(out[1]).orderBy("tier")


_LIFECYCLE_ORACLE = (
    _MEM_CTES
    + f""",
    occ AS MATERIALIZED (
      SELECT list_id,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COALESCE(SUM(CASE WHEN vec_id % {DELETE_MOD} = 3
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_deleted
      FROM mem GROUP BY 1
    ),
    rtot AS (
      SELECT CAST(SUM(n_total) AS BIGINT) AS grand,
             CAST(COUNT(*) AS BIGINT) AS n_lists
      FROM occ
    )
    SELECT occ.list_id, occ.n_total, occ.n_deleted,
           CAST(CASE WHEN 2 * occ.n_total * rtot.n_lists > 3 * rtot.grand
                THEN 1 ELSE 0 END AS BIGINT) AS do_split,
           CAST(CASE WHEN 4 * occ.n_total * rtot.n_lists < rtot.grand
                THEN 1 ELSE 0 END AS BIGINT) AS do_merge,
           CAST(CASE WHEN 4 * occ.n_deleted >= occ.n_total
                THEN 1 ELSE 0 END AS BIGINT) AS do_compact,
           CASE
             WHEN 2 * occ.n_total * rtot.n_lists > 3 * rtot.grand
               THEN 'split'
             WHEN 4 * occ.n_total * rtot.n_lists < rtot.grand
               THEN 'merge'
             WHEN 4 * occ.n_deleted >= occ.n_total THEN 'compact'
             ELSE 'none'
           END AS action
    FROM occ, rtot
    ORDER BY occ.list_id
    """
)


@query("pipeline_index_lifecycle_report", oracle=_LIFECYCLE_ORACLE)
def pipeline_index_lifecycle_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The index LIFECYCLE REPORT — the nightly decision table that
    unifies the three maintenance verdicts over one membership scan:
    occupancy split/merge (the `stream_ivf_list_maintenance` /
    `pipeline_vector_index_rebalance` rule: split when a list holds
    >1.5x the mean, merge when <0.25x — exact integer cross-products,
    no division) and the compaction verdict (a quarter of the postings
    dead). One ACTION per list with the precedence an operator
    schedules by: split > merge > compact > none — a list being split
    resolves its occupancy before any space reclaim matters, and a
    merging list's postings move anyway so compacting it first would
    be wasted I/O.

    This is the report the executors consume: `..._rebalance` applies
    the split/merge rows, `..._compaction` the compact rows, and the
    two recall re-audits certify each application — the family's
    capstone view (round-12 verdict item #7, lifecycle close).

    Scale shape: ONE groupBy over the shared session-materialized
    membership artifact + a 1-row broadcast total; |lists| rows of
    integer arithmetic, no corpus rescans.

    Reference basis: none; contract F10/F14 ANN family."""
    from ._shared import shared_df

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
    art = shared_broadcast(
        "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
    )
    batch = emb.filter(F.col("vec_id") % 10 == 9).select("vec_id")
    adm = (
        fan_out(batch, spark)
        .mapInPandas(
            _ingest_gen(art),
            schema=(
                "vec_id long, cid long, n_cand long, min_adc long,"
                " sum_adc long, admitted long"
            ),
        )
        .filter(F.col("admitted") == 1)
        .select("vec_id", F.col("cid").alias("list_id"))
    )
    existing = (
        fan_out(emb.filter(F.col("vec_id") % 10 != 9), spark)
        .select("vec_id")
        .mapInPandas(_assign_lookup_gen(art), "vec_id long, list_id long")
    )
    members = shared_df(
        "ivf_rebalance_members",
        sf_dir,
        spark,
        lambda: existing.unionByName(adm),
        materialize=True,
    )
    occ = members.groupBy("list_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("vec_id") % DELETE_MOD == 3, 1).otherwise(0))
        .cast("long")
        .alias("n_deleted"),
    )
    rtot = occ.agg(
        F.sum("n_total").cast("long").alias("grand"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    split = 2 * F.col("n_total") * F.col("n_lists") > 3 * F.col("grand")
    merge = 4 * F.col("n_total") * F.col("n_lists") < F.col("grand")
    compact = 4 * F.col("n_deleted") >= F.col("n_total")
    return (
        occ.crossJoin(F.broadcast(rtot))
        .select(
            "list_id",
            "n_total",
            "n_deleted",
            F.when(split, 1).otherwise(0).cast("long").alias("do_split"),
            F.when(merge, 1).otherwise(0).cast("long").alias("do_merge"),
            F.when(compact, 1).otherwise(0).cast("long").alias("do_compact"),
            F.when(split, "split")
            .when(merge, "merge")
            .when(compact, "compact")
            .otherwise("none")
            .alias("action"),
        )
        .orderBy("list_id")
    )


# ---------------------------------------------------------------------------
# STORAGE LEG of compaction (round-13 verdict item #6): apply the
# compaction verdicts to a PERSISTED posting store through the 2PC
# `sheetdir` sink, re-open it, and certify the store's content against
# the verdict digests. Test-driven (tests/test_round15_pending.py) —
# not a registered query, the same discipline as the corpus-release
# 2PC export leg (tests/test_round11_pending.py).
# ---------------------------------------------------------------------------


def pipeline_index_store_persist(
    spark: SparkSession, sf_dir: str, store_dir: str
) -> DataFrame:
    """Persist the post-compaction posting lists and VERIFY the store:
    the compaction verdicts (`pipeline_vector_index_compaction`) say
    which lists rewrite to live-only postings and record `live_md5` —
    the content digest of the rewritten segment. This leg makes that
    digest REAL: compacted lists write only their live postings,
    uncompacted lists keep their tombstones in place, the whole store
    lands through the two-phase-commit ``sheetdir`` sink (staged
    files, atomic driver-side promote + ``_SUCCESS`` manifest — a
    reader can never observe a half-written store), and the store is
    then RE-OPENED through the same source, its live digests
    re-derived from the persisted bytes, and joined back against the
    verdict table. A row verifies iff the persisted posting count
    equals the verdict's `n_postings_after` AND the re-derived live
    digest byte-matches `live_md5`.

    Scale shape: the posting write is one |members|-linear pass
    partitioned by list (a posting list fits a worker by the index's
    own bound); verification is one groupBy over the re-opened store
    plus a |lists|-row join. At 100 TB the sink's promote-by-rename
    becomes the manifest-commit variant the writer already documents
    (readers trust the manifest; see `_SheetDirWriter`).

    Reference basis: none; contract F10/F14 ANN family — the storage
    rung that turns `live_md5` from a certificate into posting files.
    """
    from ..sources.pydatasource import SheetDirDataSource
    from ._shared import shared_df

    spark.dataSource.register(SheetDirDataSource)
    verdict = pipeline_vector_index_compaction(spark, sf_dir)

    def _members_builder():
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        bc = shared_matrix_broadcast("embeddings_matrix", sf_dir, spark, emb)
        art = shared_broadcast(
            "ivfpq_artifacts", sf_dir, spark, lambda: _ivfpq_artifacts(bc)
        )
        batch = emb.filter(F.col("vec_id") % 10 == 9).select("vec_id")
        adm = (
            fan_out(batch, spark)
            .mapInPandas(
                _ingest_gen(art),
                schema=(
                    "vec_id long, cid long, n_cand long, min_adc long,"
                    " sum_adc long, admitted long"
                ),
            )
            .filter(F.col("admitted") == 1)
            .select("vec_id", F.col("cid").alias("list_id"))
        )
        existing = (
            fan_out(emb.filter(F.col("vec_id") % 10 != 9), spark)
            .select("vec_id")
            .mapInPandas(_assign_lookup_gen(art), "vec_id long, list_id long")
        )
        return existing.unionByName(adm)

    members = shared_df(
        "ivf_rebalance_members", sf_dir, spark, _members_builder,
        materialize=True,
    )
    # Fresh aliases break the shared checkpoint-scan lineage between
    # the members table and the verdict rows derived from it.
    vflag = verdict.select(
        F.col("list_id").alias("v_lid"), F.col("compacted").alias("v_comp")
    )
    keep = (
        members.join(vflag, F.col("list_id") == F.col("v_lid"))
        .filter(
            (F.col("v_comp") == 0)
            | (F.col("vec_id") % DELETE_MOD != 3)
        )
        .select("list_id", "vec_id")
    )
    keep.repartition("list_id").write.format("sheetdir").mode(
        "overwrite"
    ).save(store_dir)

    rb = (
        spark.read.format("sheetdir")
        .load(store_dir)
        .select(
            F.col("list_id").cast("long").alias("list_id"),
            F.col("vec_id").cast("long").alias("vec_id"),
        )
    )
    n_store = rb.groupBy("list_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_postings_store")
    )
    dig = (
        rb.filter(F.col("vec_id") % DELETE_MOD != 3)
        .groupBy("list_id")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("vec_id")),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("store_md5"),
            F.count(F.lit(1)).cast("long").alias("n_live_store"),
        )
    )
    ok = (F.col("n_postings_store") == F.col("n_postings_after")) & (
        F.col("store_md5") == F.col("live_md5")
    )
    return (
        verdict.join(n_store, "list_id")
        .join(dig, "list_id", "left")
        .select(
            "list_id",
            "compacted",
            "n_postings_after",
            "n_postings_store",
            "n_live_store",
            "live_md5",
            "store_md5",
            F.when(ok, 1).otherwise(0).cast("long").alias("verified"),
        )
        .orderBy("list_id")
    )
