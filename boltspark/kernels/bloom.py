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
    """Bloom bytes over an iterable of distinct byte values.

    Bit-identical to the round-2 per-value loop (the double-hash layout
    is an on-disk contract — old checkpoints' filters must keep
    answering probes), but the K probe positions and the bit scatter
    are vectorized in numpy; only the crc32 calls stay per value.
    h1 + i*h2 < 2^34 (both hashes are 32-bit, i <= 3), so uint64
    arithmetic never wraps and matches the unbounded-int original."""
    import numpy as np

    vals = list(values)
    if not vals:
        return bytes(M_BITS // 8)
    n = len(vals)
    h1 = np.fromiter((zlib.crc32(v) for v in vals), np.uint64, count=n)
    h2 = np.fromiter(
        (zlib.crc32(v, 0x9E3779B9 & 0xFFFFFFFF) for v in vals),
        np.uint64, count=n) | np.uint64(1)
    pos = ((h1[:, None] + np.arange(K, dtype=np.uint64)[None, :] * h2[:, None])
           % np.uint64(M_BITS)).ravel()
    bits = np.zeros(M_BITS // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                     (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
    return bits.tobytes()


def maybe_contains(bloom: bytes, value: bytes) -> bool:
    h1, h2 = _hashes(value)
    for i in range(K):
        p = (h1 + i * h2) % M_BITS
        if not (bloom[p >> 3] >> (p & 7)) & 1:
            return False
    return True
