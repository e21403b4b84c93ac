"""fan_out: small-file inputs spread to cluster parallelism before
heavy per-row work; many-split inputs pass through untouched."""

from __future__ import annotations

from pyspark.sql import functions as F

from catme_etl_spark.operators._shared import clear_shared, fan_out
from catme_etl_spark.plans.explain import count_shuffles
from catme_etl_spark.sources.tables import load_table


def test_fan_out_spreads_single_split_input(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    assert d.rdd.getNumPartitions() == 1  # fixture is one row group
    target = spark.sparkContext.defaultParallelism
    assert fan_out(d, spark).rdd.getNumPartitions() == target
    assert fan_out(d, spark, "doc_id").rdd.getNumPartitions() == target


def test_fan_out_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(target)
    # identity, not a new repartition: at real scale the input arrives
    # as thousands of splits and an extra shuffle would be pure harm
    assert fan_out(df, spark) is df
    assert fan_out(df, spark, "id") is df


def test_keyed_fan_out_replaces_aggregation_exchange(spark, sf_dir):
    """Keyed by the groupBy column, the fan-out hash partitioning
    satisfies the aggregation's required distribution — one exchange
    total, not fan-out + aggregation shuffle."""
    d = load_table(spark, sf_dir, "documents")
    agg = fan_out(d, spark, "doc_id").groupBy("doc_id").count()
    assert count_shuffles(agg) == 1


def test_sized_fan_out_derives_target_from_input_bytes(spark, sf_dir):
    """bytes_per_task makes the target scale-adaptive: a kilobyte-scale
    input gets a handful of tasks, not one per core; a huge
    bytes-per-task collapses to 1; and the defaultParallelism clamp
    means big inputs behave exactly like the classic form."""
    d = load_table(spark, sf_dir, "embeddings")
    target = spark.sparkContext.defaultParallelism
    classic = fan_out(d, spark).rdd.getNumPartitions()
    assert classic == target
    sized = fan_out(d, spark, bytes_per_task=128 << 10).rdd.getNumPartitions()
    assert 1 <= sized <= target
    # the sf0.001/0.01 fixture is well under cores x 128 KiB, so the
    # sized target must actually be smaller than the core count
    assert sized < target
    assert (
        fan_out(d, spark, bytes_per_task=1 << 40).rdd.getNumPartitions()
        == 1
    )
    # tiny bytes_per_task -> estimate/bpt exceeds the clamp -> classic
    assert (
        fan_out(d, spark, bytes_per_task=1).rdd.getNumPartitions()
        == target
    )


def test_similarity_fan_out_is_sized(spark, sf_dir):
    """The similarity module's wrapper routes every vector kernel
    through the sized form (its results are partition-independent;
    certified by the oracle sweep)."""
    from catme_etl_spark.operators import similarity as sim

    d = load_table(spark, sf_dir, "embeddings")
    assert (
        sim.fan_out(d, spark).rdd.getNumPartitions()
        < spark.sparkContext.defaultParallelism
    )


def test_clear_shared_forces_rebuild(spark, sf_dir):
    from catme_etl_spark.operators._shared import _DF_CACHE, shared_df

    calls = []

    def build():
        calls.append(1)
        return load_table(spark, sf_dir, "nation")

    shared_df("test_clear_shared", sf_dir, spark, build)
    shared_df("test_clear_shared", sf_dir, spark, build)
    assert len(calls) == 1  # second call served from cache
    clear_shared()
    assert not _DF_CACHE
    shared_df("test_clear_shared", sf_dir, spark, build)
    assert len(calls) == 2  # rebuilt after eviction
    clear_shared()
