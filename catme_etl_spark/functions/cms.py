"""Pure-Python reader for Apache Spark's serialized CountMinSketch.

``F.count_min_sketch(...)`` emits the byte format written by
``org.apache.spark.util.sketch.CountMinSketchImpl.writeTo`` (public
Spark, stable since 2.x — version field guards drift). Decoding it here
removes the package's only use of the private ``SparkContext._jvm``
gateway: the bytes are data, so any process (executor-side pandas UDF,
driver, a plain Python audit script with no JVM at all) can read them.

Layout (all big-endian, DataOutputStream):

    int32   version            (1)
    int64   totalCount         (sum of all added counts)
    int32   depth              (rows;  ceil(-ln(1-confidence)/ln 2))
    int32   width              (cols;  ceil(2/eps))
    int64[] hashA[depth]       (row-hash multipliers — Java
                                Random(seed).nextInt(Integer.MAX_VALUE))
    int64[] table[depth*width] (row-major counters)

Long-item estimation is the classic Carter–Wegman scheme the impl
uses: per row d, ``h = hashA[d]*item; h += h >> 32`` in 64-bit signed
Java arithmetic, bucket = ``(h & (2^31-1)) % width``; the estimate is
the min counter across rows. Verified bit-identical to the JVM's
``estimateCount`` (tests/test_round5_fixes.py cross-checks through the
public JVM class).

Only the long-item path is implemented — it is the only one the repo
uses; string items hash through Murmur3 over UTF-8 bytes and would be
added the same way.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_MASK64 = (1 << 64) - 1
_PRIME_MODULUS = (1 << 31) - 1  # Mersenne prime used by the impl


def _signed64(x: int) -> int:
    x &= _MASK64
    return x - (1 << 64) if x & (1 << 63) else x


@dataclass(frozen=True)
class CountMinSketch:
    """Decoded sketch: header fields plus the counter table."""

    total_count: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: tuple[tuple[int, ...], ...]

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        version, total, depth, width = struct.unpack_from(">iqii", b, 0)
        if version != 1:
            raise ValueError(
                f"CountMinSketch: unsupported serialization version "
                f"{version} (this reader implements v1)"
            )
        off = 20
        hash_a = struct.unpack_from(f">{depth}q", b, off)
        off += depth * 8
        table = []
        for _ in range(depth):
            table.append(struct.unpack_from(f">{width}q", b, off))
            off += width * 8
        if off != len(b):
            raise ValueError(
                f"CountMinSketch: trailing {len(b) - off} byte(s) after "
                "table — layout mismatch"
            )
        return cls(total, depth, width, tuple(hash_a), tuple(table))

    def estimate_count(self, item: int) -> int:
        """Point estimate for a LONG item — min counter across rows.

        Guarantee (the one `agg_cms_heavy_hitters` asserts in-result):
        true_count ≤ estimate ≤ true_count + ⌈eps·N⌉ with the
        configured confidence."""
        res = None
        for d in range(self.depth):
            h = _signed64(self.hash_a[d] * item)
            h = _signed64(h + (h >> 32))
            bucket = (h & _PRIME_MODULUS) % self.width
            v = self.table[d][bucket]
            res = v if res is None else min(res, v)
        return res if res is not None else 0
