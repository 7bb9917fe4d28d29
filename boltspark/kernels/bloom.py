"""Per-block Bloom filters for equality zone checks.

The parquet bloom-filter analog for the blocks format: an encode-time
filter over a block's DISTINCT byte values lets ``BytesEqPredicate``
return a ``none`` zone verdict for blocks whose min/max range overlaps
the needle but which don't actually contain it — the case range zone
maps cannot prune.  No false negatives by construction (the filter is
built over every distinct value, double-hashed crc32); false positives
just decode a block that a perfect filter would skip.

Size: 1 KiB per (block, column), only written when the block has at
most ``MAX_DISTINCT`` distinct values (a saturated filter prunes
nothing and wastes stats bytes).
"""

from __future__ import annotations

import zlib

M_BITS = 8192          # 1 KiB filter
K = 4                  # probes (double hashing)
MAX_DISTINCT = 4096    # beyond this the filter saturates — omit it


def _hashes(value: bytes) -> tuple[int, int]:
    h1 = zlib.crc32(value)
    h2 = zlib.crc32(value, 0x9E3779B9 & 0xFFFFFFFF) | 1  # odd: full cycle
    return h1, h2


def build(values) -> bytes:
    """Bloom bytes over an iterable of distinct byte values."""
    bits = bytearray(M_BITS // 8)
    for v in values:
        h1, h2 = _hashes(v)
        for i in range(K):
            p = (h1 + i * h2) % M_BITS
            bits[p >> 3] |= 1 << (p & 7)
    return bytes(bits)


def maybe_contains(bloom: bytes, value: bytes) -> bool:
    h1, h2 = _hashes(value)
    for i in range(K):
        p = (h1 + i * h2) % M_BITS
        if not (bloom[p >> 3] >> (p & 7)) & 1:
            return False
    return True
