"""Per-process file logging (SURVEY §2.9 I4; reference
``MultiProcessLogger``, `unified_code.py:50-72`).

Two layers, matching how logging actually works on a Spark cluster:

- **JVM executors** log through log4j2 — ship
  ``conf/log4j2-executor.properties`` (per-executor file layout via
  the process id in the file name) with
  ``spark-submit --files conf/log4j2-executor.properties
  --conf spark.executor.extraJavaOptions=
  -Dlog4j.configurationFile=log4j2-executor.properties``.
- **Python workers** (pandas UDFs, ``mapInPandas``, DataSource
  readers) are separate OS processes with no log4j — that is exactly
  the reference's multiprocess situation, and :func:`per_process_logger`
  reproduces its contract: one ``{name}_{pid}.log`` file per process,
  create-once per process, safe to call from every batch.
"""

from __future__ import annotations

import logging
import os

_CONFIGURED: dict[tuple[str, int], logging.Logger] = {}


def per_process_logger(
    name: str = "catme_etl",
    log_dir: str = "logs",
    level: int = logging.INFO,
) -> logging.Logger:
    """Logger writing to ``{log_dir}/{name}_{pid}.log`` — the
    reference's per-process file layout (`unified_code.py:56-66`:
    ``logs/{name}_{pid}.log``, formatter ``%(asctime)s - %(name)s -
    %(levelname)s - %(message)s``). Idempotent per (name, pid): calling
    it from every Arrow batch attaches exactly one handler, and a
    forked/respawned worker (new pid) gets its own file, never a
    contended shared one."""
    pid = os.getpid()
    key = (name, pid)
    logger = _CONFIGURED.get(key)
    if logger is not None:
        return logger
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"{name}.{pid}")
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.FileHandler(
            os.path.join(log_dir, f"{name}_{pid}.log"), encoding="utf-8"
        )
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
        logger.addHandler(handler)
    logger.propagate = False
    _CONFIGURED[key] = logger
    return logger
