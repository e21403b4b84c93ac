"""Multimodal plumbing tests: stub gating, deterministic fake decode,
binary schema."""

from __future__ import annotations

import pytest

from catme_etl_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    fake_decode,
    media_table,
)


def test_real_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF...")


def test_fake_decode_deterministic_and_bounded():
    a = fake_decode(b"hello")
    assert a == fake_decode(b"hello")
    assert 16 <= a["width"] <= 271 and 16 <= a["height"] <= 271
    assert 1 <= a["n_frames"] <= 16
    assert fake_decode(b"other") != a


def test_media_table_schema(spark, sf_dir):
    m = media_table(spark, sf_dir)
    assert dict(m.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "n_bytes": "bigint",
    }
    row = m.first()
    assert isinstance(row.payload, (bytes, bytearray)) and row.n_bytes == len(
        row.payload
    )
