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


def zorder_key(cols: list[str], bits: int = 16) -> "object":
    """Z-order (Morton) interleave of N numeric columns into one long
    sort key — multi-dimensional data clustering for row-group
    skipping when readers filter on EITHER column (a plain sort is
    selective only on its leading key).

    Each column is rank-normalized into ``bits`` levels upstream or
    passed as an already-bounded non-negative int; this helper just
    interleaves bits. Built as ONE SQL expression for ``F.expr`` (a
    Column-operator loop would issue 2·bits·N py4j calls).

    The precondition is ENFORCED, not just documented: a negative
    value would sign-extend through ``>>`` and a value >= 2^bits would
    silently drop its high bits — both yield misclustered output with
    no visible error, so out-of-contract input raises per-row via
    ``raise_error`` instead of degrading clustering.
    """
    from pyspark.sql import functions as F

    terms = []
    for c in cols:
        # contributes 0 for in-contract values; raises otherwise
        terms.append(
            f"(CASE WHEN CAST({c} AS BIGINT) >= 0 "
            f"AND (CAST({c} AS BIGINT) >> {bits}) = 0 THEN 0 "
            f"ELSE CAST(raise_error('zorder_key: column {c} out of "
            f"contract (need 0 <= {c} < 2^{bits}); rank/bucketize "
            f"upstream') AS BIGINT) END)"
        )
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of column i lands at interleaved position b*N + i
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {b}) & 1) << {b * len(cols) + i})"
            )
    return F.expr(" + ".join(terms))


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by a Z-order key over ``zorder_by``
    (numeric, non-negative; callers bucketize/rank first if needed).

    ``repartitionByRange`` on the key splits the curve into contiguous
    segments (one shuffle with range sampling); sorting within each
    file gives every row group a tight min/max envelope on the curve,
    so a reader filtering on any z-ordered dimension skips most row
    groups — the open-format equivalent of Delta/Iceberg OPTIMIZE
    ZORDER, from nothing but public Spark primitives.
    """
    from pyspark.sql import functions as F

    key = zorder_key(zorder_by, bits=bits).alias("_z")
    out = (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    # note: _z is dropped before the write; the clustering survives as
    # physical row order, which is all row-group stats need
    out.write.mode(mode).parquet(path)
