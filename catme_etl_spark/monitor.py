"""Resource monitoring parity (SURVEY §2.9 I3; reference
``SystemMonitor``, `unified_code.py:75-93`): warn-only CPU/memory
checks, no throttling — plus a Spark-side job/executor snapshot.

On a real cluster this is the Spark metrics system's job; these helpers
exist for single-process parity and for driver-side scripts that want
the reference's warn-at-90% behavior.
"""

from __future__ import annotations

import os

try:  # psutil is optional; fall back to /proc + loadavg
    import psutil

    _HAS_PSUTIL = True
except ImportError:
    _HAS_PSUTIL = False

DEFAULT_CPU_THRESHOLD = 90.0  # `unified_code.py:76`
DEFAULT_MEMORY_THRESHOLD = 90.0


def resource_snapshot() -> dict:
    """Current CPU and memory utilization percentages."""
    if _HAS_PSUTIL:
        return {
            "cpu_percent": psutil.cpu_percent(interval=0.1),
            "memory_percent": psutil.virtual_memory().percent,
        }
    # fallback: 1-min loadavg normalized by cores; MemAvailable ratio
    cores = os.cpu_count() or 1
    cpu = min(100.0, 100.0 * os.getloadavg()[0] / cores)
    total = avail = None
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1])
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1])
    mem = 100.0 * (1 - avail / total) if total and avail is not None else 0.0
    return {"cpu_percent": round(cpu, 1), "memory_percent": round(mem, 1)}


def check_resources(
    threshold_cpu: float = DEFAULT_CPU_THRESHOLD,
    threshold_memory: float = DEFAULT_MEMORY_THRESHOLD,
) -> list[str]:
    """Warn-only check (`unified_code.py:85-93`): returns warning
    strings when utilization crosses the thresholds; never throttles
    (`unified_code.py:463-468` only logs)."""
    snap = resource_snapshot()
    warnings = []
    if snap["cpu_percent"] > threshold_cpu:
        warnings.append(f"CPU usage critical: {snap['cpu_percent']:.1f}%")
    if snap["memory_percent"] > threshold_memory:
        warnings.append(f"Memory usage critical: {snap['memory_percent']:.1f}%")
    return warnings


def spark_job_snapshot(spark) -> dict:
    """Driver-side view of the running Spark app: active jobs/stages
    and executor count via the status tracker (the programmatic slice
    of what the Spark UI shows — SURVEY §2.9 I5)."""
    st = spark.sparkContext.statusTracker()
    return {
        "active_jobs": len(st.getActiveJobsIds()),
        "active_stages": len(st.getActiveStageIds()),
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }


def run_with_progress(spark, action, on_progress=None, interval: float = 0.2):
    """Run a blocking Spark ``action`` while sampling task-level
    progress from the status tracker (SURVEY §2.9 I5 — the reference's
    per-chunk progress prints, re-expressed as the driver-side view of
    a distributed job).

    ``action`` is a zero-arg callable executing Spark jobs (a count, a
    write). It runs in a worker thread inside its own job group so the
    poller only sees this action's stages; the main thread samples
    ``(completed_tasks, total_tasks)`` across active stages every
    ``interval`` seconds and invokes ``on_progress(done, total)``.

    Returns ``(result, samples)`` where ``samples`` is the list of
    ``(done, total)`` tuples observed. Works identically on a real
    cluster — the status tracker is the same API the Spark UI reads.
    """
    import threading
    import uuid

    sc = spark.sparkContext
    group = f"progress-{uuid.uuid4().hex[:8]}"
    result: list = [None]
    error: list = [None]

    def target():
        sc.setJobGroup(group, "run_with_progress", interruptOnCancel=False)
        try:
            result[0] = action()
        except BaseException as exc:  # re-raised on the caller's thread
            error[0] = exc
        finally:
            sc.setJobGroup(None, None)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    st = sc.statusTracker()
    samples: list[tuple[int, int]] = []
    while t.is_alive():
        t.join(interval)
        done = total = 0
        for jid in st.getJobIdsForGroup(group):
            jinfo = st.getJobInfo(jid)
            if jinfo is None:
                continue
            for sid in jinfo.stageIds:
                sinfo = st.getStageInfo(sid)
                if sinfo is not None:
                    done += sinfo.numCompletedTasks
                    total += sinfo.numTasks
        if total:
            samples.append((done, total))
            if on_progress is not None:
                on_progress(done, total)
    if error[0] is not None:
        raise error[0]
    return result[0], samples


def observe_counts(df, *metrics, name: str = "pipeline"):
    """Attach single-pass observation metrics to a DataFrame (I5
    companion; reference parity: per-chunk processed-row logging,
    `unified_code.py:447-453,465-472`).

    The reference counts rows per chunk as a side effect of processing;
    Spark's ``Observation`` API is the same free-of-charge metric — the
    aggregates are computed DURING the action that consumes the
    returned DataFrame, no second job, no extra scan. Returns
    ``(observed_df, observation)``; read ``observation.get`` after an
    action completes.

    Default metric is the processed-row count; pass any aggregate
    Columns to extend (e.g. ``F.sum("n_chars")``, null counters for
    quality gates).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    cols = list(metrics) or [F.count(F.lit(1)).alias("rows")]
    return df.observe(obs, *cols), obs
