"""Multimodal columns (driver contract "multimodal columns"; SURVEY
§2.10 F12): image/audio/video as opaque ``binary`` columns with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no codec libraries, so the DECODE KERNEL is swappable:

- :func:`fake_decode` — deterministic stand-in (derives width/height/
  frame-count from the payload's md5) used by the registered queries,
  which makes the full pipeline — binary payload → per-batch Python
  decode → typed feature columns → downstream relational ops —
  oracle-checkable end to end;
- :func:`decode_image` / :func:`decode_audio` — the real-codec entry
  points, stubbed behind import guards (``NotImplementedError`` with
  the dependency named) so swapping PIL/librosa in changes one
  function, not the plumbing.

Payloads here are the documents' utf-8 bytes posing as media blobs; at
100 TB the payload column is real bytes in parquet and everything below
is unchanged: binary columns scan as opaque byte arrays, Arrow moves
them zero-copy into the Python workers batch-by-batch, and the decode
is embarrassingly parallel per partition (no shuffle until the
analytical groupBy at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

try:  # real image codec — absent in this container by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(payload: bytes) -> dict:
    """Real image decode (PIL). Stub: raises until a codec is present."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; install PIL or use fake_decode"
        )
    raise NotImplementedError("wire PIL Image.open(BytesIO(payload)) here")


def decode_audio(payload: bytes) -> dict:
    """Real audio decode (librosa/soundfile). Stub until present."""
    raise NotImplementedError("audio decode requires librosa/soundfile")


def fake_decode(payload: bytes) -> dict:
    """Deterministic decode stand-in: metadata derived from the
    payload's md5 (so any engine can reproduce it)."""
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return {
        "width": 16 + int(h[0:2], 16),
        "height": 16 + int(h[2:4], 16),
        "n_frames": 1 + int(h[4:5], 16),
    }


def _sql_hex_int(expr: str, start: int, n: int) -> str:
    """DuckDB SQL: int value of ``n`` hex chars of ``expr`` from
    1-based ``start`` (mirrors ``int(h[start-1:start-1+n], 16)``)."""
    terms = [
        f"(strpos('0123456789abcdef', substring({expr}, {start + j}, 1)) - 1)"
        f" * {16 ** (n - 1 - j)}"
        for j in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


# media_type assignment: deterministic from the source column
_MEDIA_CASE = """CASE WHEN source IN ('src0', 'src1') THEN 'image'
         WHEN source IN ('src2', 'src3') THEN 'audio'
         ELSE 'video' END"""


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``documents`` recast as a media table: opaque binary ``payload``
    + typed metadata columns — the multimodal storage schema."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.expr(_MEDIA_CASE.replace("\n", " ")).alias("media_type"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


@query(
    "multimodal_manifest",
    oracle=f"""
    SELECT doc_id,
           {_MEDIA_CASE} AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed manifest over binary payloads: id, modality, size, digest —
    the catalog scan of a multimodal lake (pure JVM, no decode)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id", "media_type", "n_bytes", F.md5("payload").alias("content_md5")
    )


_DECODE_SCHEMA = (
    "doc_id long, media_type string, width long, height long, n_frames long"
)


@query(
    "multimodal_decode_features",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_MEDIA_CASE} AS media_type, md5(text) AS hx
               FROM documents)
    SELECT doc_id, media_type,
           CAST(16 + {_sql_hex_int('hx', 1, 2)} AS BIGINT) AS width,
           CAST(16 + {_sql_hex_int('hx', 3, 2)} AS BIGINT) AS height,
           CAST(1 + {_sql_hex_int('hx', 5, 1)} AS BIGINT) AS n_frames
    FROM h
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode fan-out: binary payload → Python kernel per Arrow
    batch → typed feature columns. ``fake_decode`` stands in for the
    codec; the plumbing (schema, batching, partition parallelism) is
    the real thing."""
    import pandas as pd

    m = media_table(spark, sf_dir).select("doc_id", "media_type", "payload")

    def decode_batches(batches):
        for pdf in batches:
            feats = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )

    return m.mapInPandas(decode_batches, schema=_DECODE_SCHEMA)


@query(
    "multimodal_resize_plan",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_MEDIA_CASE} AS media_type, md5(text) AS hx
               FROM documents),
    f AS (
      SELECT doc_id, media_type,
             16 + {_sql_hex_int('hx', 1, 2)} AS w,
             16 + {_sql_hex_int('hx', 3, 2)} AS h
      FROM h WHERE media_type = 'image'
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST((w * 64) // GREATEST(w, h) AS BIGINT) AS resized_w,
           CAST((h * 64) // GREATEST(w, h) AS BIGINT) AS resized_h
    FROM f
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning: target dims fitting a 64×64 box preserving
    aspect ratio, in exact integer math (floor((d·64)/max_dim)) — the
    JVM-side metadata step before the (stubbed) pixel resample, which
    would run in the same mapInPandas kernel as decode. Planning
    separately from decoding lets the expensive kernel receive its
    output geometry and batch accordingly."""
    f = multimodal_decode_features(spark, sf_dir).filter(
        F.col("media_type") == "image"
    )
    mx = F.greatest(F.col("width"), F.col("height"))
    return f.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * 64 / mx).cast("long").alias("resized_w"),
        F.floor(F.col("height") * 64 / mx).cast("long").alias("resized_h"),
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH h AS (SELECT doc_id, {_MEDIA_CASE} AS media_type, md5(text) AS hx
               FROM documents),
    f AS (
      SELECT doc_id, media_type,
             1 + {_sql_hex_int('hx', 5, 1)} AS n_frames
      FROM h WHERE media_type = 'video'
    )
    SELECT doc_id, n_frames,
           CAST(unnest(range(0, n_frames, GREATEST(1, n_frames // 4))) AS BIGINT)
               AS frame_idx
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame (~4 per clip,
    stride n/4). The explode happens JVM-side AFTER the decode kernel —
    typical shape: cheap metadata decode first, expensive per-frame
    work on the exploded (and freely repartitionable) rows after."""
    f = multimodal_decode_features(spark, sf_dir).filter(
        F.col("media_type") == "video"
    )
    stride = F.greatest(F.lit(1), (F.col("n_frames") / 4).cast("long"))
    return f.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, stride)
        ).alias("frame_idx"),
    )


@query(
    "multimodal_arrow_checksum",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           {_sql_hex_int("md5(text)", 1, 14)} AS digest56
    FROM documents
    """,
)
def multimodal_arrow_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` payload integrity kernel — the ARROW-NATIVE rung
    below ``mapInPandas``: RecordBatches in, RecordBatches out, no
    pandas conversion at all. For opaque binary columns that is the
    right tier — pandas would box every payload into Python objects twice
    for nothing, while Arrow hands the kernel zero-copy buffers.

    Computes per-payload byte length and a 56-bit md5 prefix — the
    checksum side of an integrity audit over a multimodal lake (pairs
    with ``multimodal_manifest``); md5 keeps the kernel
    oracle-reproducible from the text the payload encodes."""
    import hashlib

    import pyarrow as pa

    m = media_table(spark, sf_dir).select("doc_id", "payload")

    def kernel(batches):
        for batch in batches:
            pays = batch.column(1)
            n = pa.array(
                [len(p.as_py()) for p in pays], type=pa.int64()
            )
            dg = pa.array(
                [
                    int(hashlib.md5(p.as_py()).hexdigest()[:14], 16)
                    for p in pays
                ],
                type=pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), n, dg], ["doc_id", "n_bytes", "digest56"]
            )

    return m.mapInArrow(kernel, "doc_id long, n_bytes long, digest56 long")
