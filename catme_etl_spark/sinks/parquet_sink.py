"""Partitioned parquet sink — the layout side of the 100 TB story.

The reference's only sink is local JSON (`unified_code.py:343-362`);
at target scale the publish step IS the performance knob for every
later reader, so the writer controls three things:

- **directory partitioning** (`partitionBy`): readers with a filter on
  the partition column scan only matching directories (partition
  pruning — verified in tests/test_partition_pruning.py);
- **in-file ordering** (`sortWithinPartitions`): parquet writes
  min/max stats per row group, so sorting by the secondary filter key
  turns row groups into a coarse index (row-group skipping) without
  any global sort;
- **file count** (`repartition` on the partition columns): one shuffle
  so each output directory is written by few tasks — unmanaged, every
  task writes to every partition and a 4000-task job emits millions of
  tiny files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partitioned parquet dataset.

    ``repartition(partition_by)`` routes all rows of one output
    partition to the same task(s); ``sortWithinPartitions`` then orders
    rows inside each file so row-group stats are selective on the sort
    keys. ``files_per_partition > 1`` salts the repartition for hot
    partitions (same mechanism as skew.py's salted joins).
    """
    from pyspark.sql import functions as F

    if files_per_partition > 1:
        salt = (F.rand(seed=42) * files_per_partition).cast("int").alias("_salt")
        out = df.withColumn("_salt", salt).repartition(
            *[F.col(c) for c in partition_by], F.col("_salt")
        ).drop("_salt")
    else:
        out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_within:
        # partition columns lead the sort: FileFormatWriter requires
        # rows grouped by partition value and would otherwise insert its
        # own partition-column sort, destroying the secondary order
        out = out.sortWithinPartitions(*partition_by, *sort_within)
    out.write.partitionBy(*partition_by).mode(mode).parquet(path)
