"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
``sheetdir`` — a directory of per-sheet CSV files exposed as ONE
DataFrame with a ``_sheet`` column, one input partition per sheet.

This is the Spark-native shape of the reference's workbook model: a
file is a collection of named sheets iterated sheet-by-sheet
(`unified_code.py:182-191,426`), and every sheet's chunks are
processed independently (`unified_code.py:435-453`). Here each sheet
IS an ``InputPartition``, so Spark schedules sheets exactly like the
reference's process pool scheduled chunk tasks — except retries,
locality, and result collection come from the engine.

The same class is the template for an Excel source when an xlsx
engine (openpyxl) is present: replace the csv module with
``openpyxl.load_workbook(read_only=True)`` per partition — partition
planning and scheduling are identical. (This container has no xlsx
engine, so the CSV-sheet form keeps the path fully tested;
``files.read_excel_many`` covers the pandas-bridge variant.)

Scale notes: partition planning reads only directory listings and one
header line; actual rows are parsed executor-side per partition. A
giant single sheet should be split upstream (or use the native CSV
reader, which splits by byte ranges) — the Python DataSource API
v1 deliberately trades raw speed for arbitrary-source flexibility, so
it is the right tool for *format* gaps, not a replacement for native
scans.
"""

from __future__ import annotations

import csv
import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _SheetPartition(InputPartition):
    def __init__(self, path: str, sheet: str):
        self.path = path
        self.sheet = sheet


class _SheetDirReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_names = [f.name for f in schema.fields]
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("sheetdir: pass the directory via .load(path)")

    def partitions(self):
        files = sorted(glob.glob(os.path.join(self.dir, "*.csv")))
        if not files:
            raise ValueError(f"sheetdir: no *.csv in {self.dir!r}")
        return [
            _SheetPartition(p, os.path.splitext(os.path.basename(p))[0])
            for p in files
        ]

    def read(self, partition: _SheetPartition):
        data_cols = [c for c in self.schema_names if c != "_sheet"]
        with open(partition.path, newline="") as f:
            rdr = csv.DictReader(f)
            for rec in rdr:
                yield tuple(rec.get(c) for c in data_cols) + (partition.sheet,)


def sheetdir_metadata(spark, path: str) -> dict:
    """Per-sheet ``{sheet: {rows, columns, dtypes}}`` over a registered
    ``sheetdir`` source — the S2 metadata catalog for the workbook
    model (`unified_code.py:183-191`), computed distributed: one
    groupBy over the ``_sheet`` partition column counts every sheet in
    a single job instead of parsing sheets one by one on the driver."""
    from pyspark.sql import functions as F

    df = spark.read.format("sheetdir").load(path)
    cols = [c for c in df.columns if c != "_sheet"]
    dtypes = {c: t for c, t in df.dtypes if c != "_sheet"}
    counts = df.groupBy("_sheet").agg(F.count(F.lit(1)).alias("rows")).collect()
    return {
        r["_sheet"]: {"rows": r["rows"], "columns": cols, "dtypes": dtypes}
        for r in counts
    }


class SheetDirDataSource(DataSource):
    """``spark.read.format("sheetdir").load(dir)`` after registration
    via ``spark.dataSource.register(SheetDirDataSource)``; the write
    side (``df.write.format("sheetdir").save(dir)``) is
    :class:`_SheetDirWriter` below — a two-phase-commit CSV-per-task
    sink."""

    @classmethod
    def name(cls) -> str:
        return "sheetdir"

    def schema(self) -> str:
        # all-string columns from the first sheet's header + _sheet;
        # callers cast downstream (one explicit schema per source kills
        # the reference's per-chunk re-inference drift, SURVEY §1.2)
        path = self.options.get("path")
        files = sorted(glob.glob(os.path.join(path, "*.csv"))) if path else []
        if not files:
            raise ValueError(f"sheetdir: no *.csv in {path!r}")
        with open(files[0], newline="") as f:
            header = next(csv.reader(f))
        cols = ", ".join(f"`{c}` string" for c in header)
        return f"{cols}, `_sheet` string"

    def reader(self, schema) -> _SheetDirReader:
        return _SheetDirReader(schema, self.options)

    def writer(self, schema, overwrite: bool):
        return _SheetDirWriter(schema, self.options, overwrite)


# ---------------------------------------------------------------------------
# Streaming Python DataSource (Spark 4 `SimpleDataSourceStreamReader`):
# ``sheetfeed`` — the same sheet directory consumed INCREMENTALLY, one
# sheet per micro-batch. The streaming shape of the reference's
# sheet-by-sheet iteration (`unified_code.py:182-191,426`): each new
# sheet arriving in a drop directory is one batch of rows.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class _SheetFeedStreamReader(SimpleDataSourceStreamReader):
    """Offset = CONTENT-ADDRESSED consumption point (JSON dict,
    checkpointable): ``{"sheets": <count>, "last": <basename>}``.

    Files are selected by NAME COMPARISON against ``last``, not by
    positional index into the current listing — a positional offset
    silently remaps when a file arrives whose name sorts before an
    already-committed file (or one is removed), skipping/re-reading
    sheets and replaying different rows than were committed. Here the
    committed prefix is re-validated on every read: if the set of
    files sorting at-or-before ``last`` no longer has exactly
    ``sheets`` members, the directory mutated non-monotonically under
    a committed offset and the reader FAILS LOUDLY instead of
    corrupting the 'files are the WAL' replay contract.

    ``read(start)`` consumes the next unread sheet (or reports no new
    data by returning the same offset); ``readBetweenOffsets`` replays
    a committed range deterministically after restart — by name range
    ``(start.last, end.last]``, so later arrivals outside the range
    can never shift it. NOTE (honest scale caveat, per the API docs):
    the *Simple* stream reader reads on the DRIVER and is the
    prototyping tier — a partition-planning ``DataSourceStreamReader``
    (executor-side reads, like the batch ``sheetdir`` above) is the
    high-throughput form; offsets and semantics carry over unchanged.
    """

    def __init__(self, schema, options):
        self.schema_names = [f.name for f in schema.fields]
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("sheetfeed: pass the directory via .load(path)")

    def _files(self):
        return sorted(glob.glob(os.path.join(self.dir, "*.csv")))

    def _rows(self, path):
        sheet = os.path.splitext(os.path.basename(path))[0]
        data_cols = [c for c in self.schema_names if c != "_sheet"]
        with open(path, newline="") as f:
            for rec in csv.DictReader(f):
                yield tuple(rec.get(c) for c in data_cols) + (sheet,)

    def initialOffset(self):
        return {"sheets": 0, "last": ""}

    @staticmethod
    def _base(path):
        return os.path.basename(path)

    def _check_prefix(self, files, offset):
        """Delegates to the module-level WAL invariant shared with the
        partition-planning tier (``_check_committed_prefix``, defined
        below it) — one contract, two throughput tiers."""
        _check_committed_prefix(files, offset, "sheetfeed")

    def read(self, start):
        files = self._files()
        self._check_prefix(files, start)
        last = start.get("last", "")
        pending = [f for f in files if self._base(f) > last]
        if not pending:
            return iter([]), start  # no new data this trigger
        nxt = pending[0]
        end = {"sheets": start["sheets"] + 1, "last": self._base(nxt)}
        return iter(list(self._rows(nxt))), end

    def readBetweenOffsets(self, start, end):
        files = self._files()
        lo, hi = start.get("last", ""), end.get("last", "")
        span = [f for f in files if lo < self._base(f) <= hi]
        expected = end["sheets"] - start["sheets"]
        if len(span) != expected:
            raise RuntimeError(
                f"sheetfeed: replay of committed range ({lo!r}, {hi!r}] "
                f"expects {expected} sheet(s) but found {len(span)} — the "
                "WAL files changed after commit; cannot replay "
                "deterministically."
            )
        out = []
        for f in span:
            out.extend(self._rows(f))
        return iter(out)


class SheetFeedDataSource(DataSource):
    """``spark.readStream.format("sheetfeed").load(dir)`` after
    ``spark.dataSource.register(SheetFeedDataSource)``. Schema logic is
    shared with the batch ``sheetdir`` source: all-string columns from
    the first sheet's header plus the ``_sheet`` lineage column."""

    @classmethod
    def name(cls) -> str:
        return "sheetfeed"

    def schema(self) -> str:
        path = self.options.get("path")
        files = sorted(glob.glob(os.path.join(path, "*.csv"))) if path else []
        if not files:
            raise ValueError(f"sheetfeed: no *.csv in {path!r}")
        with open(files[0], newline="") as f:
            header = next(csv.reader(f))
        cols = ", ".join(f"`{c}` string" for c in header)
        return f"{cols}, `_sheet` string"

    def simpleStreamReader(self, schema) -> _SheetFeedStreamReader:
        return _SheetFeedStreamReader(schema, self.options)


# ---------------------------------------------------------------------------
# Partition-planning streaming source (`sheetfeed_dist`): the
# HIGH-THROUGHPUT tier of `sheetfeed`. Same content-addressed offsets
# and WAL-replay contract, but the driver only PLANS (lists file names
# between offsets); each sheet becomes an InputPartition whose rows are
# parsed on an EXECUTOR — many new sheets in one trigger parse in
# parallel across the cluster instead of serially on the driver.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamReader,
    InputPartition,
)


class _SheetFeedPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _check_committed_prefix(files, offset, what: str) -> None:
    """Shared WAL invariant: the committed prefix must still be exactly
    the ``sheets`` files sorting at-or-before ``last`` — otherwise a
    file arrived out of name order (or was removed) under a committed
    offset and positional replay would diverge."""
    last = offset.get("last", "")
    n_committed = offset["sheets"]
    if n_committed and not last:
        # Pre-content-addressed checkpoints ({'sheets': n} only) can't
        # be replayed by name range; fail with the real diagnosis
        # instead of a misleading out-of-order error.
        raise RuntimeError(
            f"{what}: committed offset {{'sheets': {n_committed}}} has no "
            "'last' key — a legacy positional checkpoint from before the "
            "content-addressed offset format. Reset the checkpoint "
            "directory (or rewrite the offset with 'last' set to the "
            f"basename of the {n_committed}th sorted sheet) to resume."
        )
    prefix = [f for f in files if os.path.basename(f) <= last]
    if len(prefix) != n_committed:
        raise RuntimeError(
            f"{what}: committed offset covers {n_committed} sheet(s) up "
            f"to {last!r}, but the directory now holds {len(prefix)} "
            "file(s) sorting at-or-before it — a file arrived out of "
            "name order or was removed under a committed offset. The "
            "files are the WAL: deliver new sheets with names sorting "
            "after the last committed one, or reset the checkpoint."
        )


class _SheetFeedDistStreamReader(DataSourceStreamReader):
    """Executor-side sheetfeed. Offsets are the same content-addressed
    ``{"sheets": n, "last": basename}`` dicts as the Simple tier (and
    validated the same way — out-of-order arrivals under a committed
    offset fail loudly); ``partitions(start, end)`` maps the committed
    name range to one partition per sheet, so replay after restart
    re-parses exactly the committed files. Unlike the Simple tier (one
    sheet per trigger, driver-parsed), every pending sheet is planned
    into the SAME micro-batch and parsed concurrently by executors —
    the shape that keeps up with a heavy drop directory."""

    def __init__(self, schema, options):
        self.schema_names = [f.name for f in schema.fields]
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("sheetfeed_dist: pass the directory via .load(path)")

    def _files(self):
        return sorted(glob.glob(os.path.join(self.dir, "*.csv")))

    def initialOffset(self):
        return {"sheets": 0, "last": ""}

    def latestOffset(self):
        files = self._files()
        if not hasattr(self, "_last_committed"):
            self._last_committed = self.initialOffset()
        _check_committed_prefix(files, self._last_committed, "sheetfeed_dist")
        if not files:
            return self._last_committed
        return {
            "sheets": len(files),
            "last": os.path.basename(files[-1]),
        }

    def partitions(self, start, end):
        files = self._files()
        lo, hi = start.get("last", ""), end.get("last", "")
        span = [f for f in files if lo < os.path.basename(f) <= hi]
        expected = end["sheets"] - start["sheets"]
        if len(span) != expected:
            raise RuntimeError(
                f"sheetfeed_dist: range ({lo!r}, {hi!r}] expects "
                f"{expected} sheet(s) but found {len(span)} — WAL files "
                "changed under a planned batch; cannot replay "
                "deterministically."
            )
        return [_SheetFeedPartition(f) for f in span]

    def read(self, partition):
        # Runs ON AN EXECUTOR: self was pickled there; parse one sheet.
        sheet = os.path.splitext(os.path.basename(partition.path))[0]
        data_cols = [c for c in self.schema_names if c != "_sheet"]
        with open(partition.path, newline="") as f:
            for rec in csv.DictReader(f):
                yield tuple(rec.get(c) for c in data_cols) + (sheet,)

    def commit(self, end):
        self._last_committed = end


class SheetFeedDistDataSource(DataSource):
    """``spark.readStream.format("sheetfeed_dist").load(dir)`` after
    ``spark.dataSource.register(SheetFeedDistDataSource)``. Schema is
    shared with ``sheetdir``/``sheetfeed``: all-string columns from the
    first sheet plus the ``_sheet`` lineage column."""

    @classmethod
    def name(cls) -> str:
        return "sheetfeed_dist"

    def schema(self) -> str:
        path = self.options.get("path")
        files = sorted(glob.glob(os.path.join(path, "*.csv"))) if path else []
        if not files:
            raise ValueError(f"sheetfeed_dist: no *.csv in {path!r}")
        with open(files[0], newline="") as f:
            header = next(csv.reader(f))
        cols = ", ".join(f"`{c}` string" for c in header)
        return f"{cols}, `_sheet` string"

    def streamReader(self, schema) -> _SheetFeedDistStreamReader:
        return _SheetFeedDistStreamReader(schema, self.options)


# ---------------------------------------------------------------------------
# Custom Python SINK (`sheetdir` writer): df.write.format("sheetdir")
# .mode("overwrite"|"append").save(dir). The write side of the workbook
# model, with the two-phase commit the reference's chunk writer lacked
# (S9/S10, `unified_code.py:346-366`: it wrote chunk files directly and
# merged whatever glob found — a crashed job left partial output
# indistinguishable from a complete one).
# ---------------------------------------------------------------------------

import shutil  # noqa: E402
import uuid  # noqa: E402
from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402


@dataclass
class _StagedSheet(WriterCommitMessage):
    staged: str
    rows: int


class _SheetDirWriter(DataSourceWriter):
    """Each task streams its partition to a staging file under
    ``<dir>/_wip_<job>/`` (executor-side); ONLY the driver's
    ``commit`` — which runs iff every task succeeded — promotes staged
    files into the target directory under deterministic names
    (``part_00000.csv``, ordered by staged name) and publishes a
    ``_SUCCESS`` manifest listing them with row counts. ``abort``
    removes the staging directory, leaving the target untouched —
    readers can never observe a half-written job.

    Scale caveat (honest): promote-by-rename assumes a rename-capable
    store (local/HDFS). On object stores rename is a copy; the
    manifest-commit pattern (readers trust ``_SUCCESS``'s file list,
    stage files live in place) is the production variant — the
    manifest is already written here, so switching is a reader-side
    policy change, not a protocol change."""

    def __init__(self, schema, options, overwrite: bool):
        self.cols = [f.name for f in schema.fields]
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("sheetdir write: pass the directory via .save(path)")
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex  # driver-side; pickled into tasks

    @property
    def _staging(self) -> str:
        return os.path.join(self.dir, f"_wip_{self.job_id}")

    def write(self, iterator):
        os.makedirs(self._staging, exist_ok=True)
        tmp = os.path.join(self._staging, f"task-{uuid.uuid4().hex}.csv")
        n = 0
        with open(tmp, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(self.cols)
            for row in iterator:
                wr.writerow(["" if v is None else str(v) for v in row])
                n += 1
        if n == 0:  # no headerless/empty sheets in the output
            os.remove(tmp)
            # Spark 4's Python DataSource API requires a
            # WriterCommitMessage from every task — a zero-row
            # sentinel; commit() drops it before promotion.
            return _StagedSheet(staged="", rows=0)
        return _StagedSheet(staged=tmp, rows=n)

    def commit(self, messages):
        staged = sorted(
            (m for m in messages if m is not None and m.rows > 0),
            key=lambda m: m.staged,
        )
        os.makedirs(self.dir, exist_ok=True)
        manifest = []
        if self.overwrite:
            for old in glob.glob(os.path.join(self.dir, "*.csv")):
                os.remove(old)
        else:
            # Append must carry prior published entries forward: the
            # manifest is the full listing manifest-trusting readers
            # rely on, so dropping earlier jobs' files from it would
            # silently unpublish their data.
            prior = os.path.join(self.dir, "_SUCCESS")
            if os.path.exists(prior):
                with open(prior) as f:
                    manifest = [ln for ln in f.read().splitlines() if ln]
        # Next part index = max existing index + 1, NOT the file count:
        # with gaps (a published part removed out-of-band) a count-based
        # name could collide with a live file and os.replace would
        # silently overwrite published data.
        indices = []
        for p in glob.glob(os.path.join(self.dir, "part_*.csv")):
            stem = os.path.splitext(os.path.basename(p))[0]
            suffix = stem.split("_", 1)[1]
            if suffix.isdigit():
                indices.append(int(suffix))
        nxt = max(indices) + 1 if indices else 0
        for i, m in enumerate(staged):
            name = f"part_{nxt + i:05d}.csv"
            os.replace(m.staged, os.path.join(self.dir, name))
            manifest.append(f"{name},{m.rows}")
        # Manifest commit is itself atomic (temp + rename): a crash
        # mid-commit leaves either the old complete manifest or the new
        # one, never a torn file beside promoted parts.
        tmp = os.path.join(self.dir, f"_SUCCESS._wip_{self.job_id}")
        with open(tmp, "w") as f:
            f.write("\n".join(manifest) + ("\n" if manifest else ""))
        os.replace(tmp, os.path.join(self.dir, "_SUCCESS"))
        shutil.rmtree(self._staging, ignore_errors=True)

    def abort(self, messages):
        shutil.rmtree(self._staging, ignore_errors=True)
