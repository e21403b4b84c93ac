"""Format-dispatch writer — the sink-side mirror of ``read_auto``
(SURVEY §2.1 S8; the reference dispatches INPUT formats only and can
emit nothing but JSON, `unified_code.py:499-506`).

All formats write through the same DataFrameWriter machinery, so
``mode``/``partitionBy`` semantics are uniform; every format here is
splittable-on-read except XML and single JSON arrays (which stay in
``json_sink.py`` as the bounded reference-parity path).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_FORMATS = ("parquet", "orc", "csv", "json", "xml")


def write_auto(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Write ``df`` to ``path`` in ``fmt`` (or the extension-suffix of
    ``path``). CSV defaults to a header; XML defaults to ``row`` tags.
    Partition columns lay the directory out for pruning exactly as in
    ``sinks/parquet_sink.py``."""
    if fmt is None:
        fmt = os.path.splitext(path)[1].lstrip(".").lower()
    if fmt == "jsonl":
        fmt = "json"
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported sink format {fmt!r}; supported: {_FORMATS}")
    w = df.write.mode(mode)
    if fmt == "csv" and "header" not in options:
        options["header"] = True
    if fmt == "xml" and "rowTag" not in options:
        options["rowTag"] = "row"
    for k, v in options.items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)
