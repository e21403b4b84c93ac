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
