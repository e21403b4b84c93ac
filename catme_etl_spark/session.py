"""SparkSession factory with scale-ready defaults.

Local tests run on ``local[N]`` but every knob here is chosen so the
same code is correct and fast on a multi-executor cluster:

- AQE on (runtime re-planning, skew-join handling, partition coalescing)
- Arrow on (any pandas interchange is vectorized, never per-row pickle)
- UTC session timezone (deterministic timestamp semantics; matches the
  DuckDB oracle which uses naive/UTC timestamps)
- shuffle partitions sized for the test scale but overridable; on a real
  cluster AQE coalesces post-shuffle partitions anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "catme_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is supplied — on a real deployment the
    caller's spark-submit master wins because an existing session is
    reused as-is.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast threshold: dims (region/nation/supplier/part at test
        # scale) broadcast automatically; at 100 TB the fact tables never
        # qualify, so plans stay correct.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # UI off by default for headless runs; SPARK_GRAFT_UI=1 enables
        # it for interactive plan/stage inspection (I5 progress surface)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
    )
    # Driver logging profile: default console layout + a named-logger
    # override silencing the deliberate localCheckpoint-unpersist WARN
    # (see conf/log4j2-driver.properties for the why). Only effective
    # when this call actually launches the JVM — a reused session keeps
    # whatever profile it started with.
    log_conf = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "conf",
        "log4j2-driver.properties",
    )
    if os.path.exists(log_conf):
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Dlog4j.configurationFile=file:{log_conf}",
        )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
