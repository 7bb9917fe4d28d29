"""Prefix front-coding for sorted byte-array columns (DELTA_BYTE_ARRAY
analog — named in the reference's Thrift model,
/root/reference/src/metadata/parquet_metadata_thrift.rs:386-401, never
implemented there).

Each row stores only the length of the byte prefix it shares with the
PREVIOUS row plus its remaining suffix.  Partitions arrive sorted by
the key columns (engine/partitioner.py sortWithinPartitions), so a
``path`` column inside one repo shares long prefixes row-to-row — the
exact shape this codec collapses.

Layout (after the block CRC's coverage, like every codec payload):

    u8  pwidth            bit width of the prefix-length stream
    u8  swidth            bit width of the suffix-length stream
    bitpack(prefix_lens)  n values at pwidth
    bitpack(suffix_lens)  n values at swidth
    suffix blob           concatenated suffixes

Both directions are vectorized column-position-wise (no per-row
Python): encode walks byte position j with a shrinking "still equal"
row set (total work = shared-prefix bytes), decode scatters all
suffixes in one gather, then resolves inherited bytes one position at
a time with ``np.maximum.accumulate`` finding each row's most recent
literal source — by the time position j is resolved, every source byte
already sits in the output blob, so each pass is a pure gather.
"""

from __future__ import annotations

import struct

import numpy as np

from . import bitpack
from .strings import StringColumn
from .varint import CorruptBlockError

# encode-side cap on the stored prefix length: both the encode LCP walk
# and the decode resolve loop iterate one byte POSITION per pass, so an
# uncapped prefix (two adjacent multi-KB duplicate rows) would turn
# them into thousands of passes.  255 covers key-like columns (paths,
# ids, hashes) entirely; byte 256+ of a longer shared prefix is left
# for the outer compressor, which eats long repeats anyway.  Decode
# accepts ANY stored p (the cap is not part of the format).
PMAX = 255


def _prefix_lengths(col: StringColumn) -> np.ndarray:
    """Vectorized LCP of each row with its predecessor (row 0 -> 0).

    Column-position loop with a shrinking active set: iteration j keeps
    only rows whose first j bytes all matched, so total comparisons =
    sum of the prefix lengths actually found, not n * max_len.
    """
    n = len(col)
    p = np.zeros(n, dtype=np.int64)
    if n <= 1 or not len(col.data):
        return p
    data = np.frombuffer(col.data, dtype=np.uint8)
    starts = col.offsets[:-1]
    prev_starts = np.empty(n, dtype=np.int64)
    prev_starts[1:] = starts[:-1]
    prev_starts[0] = 0
    lens = col.lengths()
    cap = np.empty(n, dtype=np.int64)
    cap[1:] = np.minimum(lens[1:], lens[:-1])
    cap[0] = 0
    np.minimum(cap, PMAX, out=cap)
    active = np.nonzero(cap > 0)[0]
    j = 0
    while len(active):
        eq = data[starts[active] + j] == data[prev_starts[active] + j]
        matched = active[eq]
        p[matched] += 1
        j += 1
        active = matched[cap[matched] > j]
    return p


def encode(col: StringColumn, tag: str) -> tuple[bytes, dict]:
    if tag != "bytes":
        raise TypeError(f"prefix codec only applies to byte arrays, got {tag}")
    n = len(col)
    lens = col.lengths()
    p = _prefix_lengths(col)
    s = lens - p
    pwidth = bitpack.min_bit_width(int(p.max()) if n else 0)
    swidth = bitpack.min_bit_width(int(s.max()) if n else 0)
    # gather the suffixes (tail of each row) into one blob
    data = np.frombuffer(col.data, dtype=np.uint8)
    total = int(s.sum())
    if total:
        out_base = np.repeat(col.offsets[:-1] + p
                             - np.concatenate(([0], np.cumsum(s)[:-1])), s)
        blob = data[out_base + np.arange(total, dtype=np.int64)].tobytes()
    else:
        blob = b""
    payload = (
        struct.pack("<BB", pwidth, swidth)
        + bitpack.pack(p.astype(np.uint64), pwidth)
        + bitpack.pack(s.astype(np.uint64), swidth)
        + blob
    )
    return payload, {}


def decode(payload: bytes, meta: dict, n: int, tag: str) -> StringColumn:
    if n == 0:
        return StringColumn(np.zeros(1, dtype=np.int64), b"")
    if len(payload) < 2:
        raise CorruptBlockError("prefix: truncated header")
    pwidth, swidth = struct.unpack_from("<BB", payload, 0)
    pos = 2
    nb = bitpack.packed_size(n, pwidth)
    p = bitpack.unpack(payload[pos : pos + nb], pwidth, n).astype(np.int64)
    pos += nb
    nb = bitpack.packed_size(n, swidth)
    s = bitpack.unpack(payload[pos : pos + nb], swidth, n).astype(np.int64)
    pos += nb
    if p[0] != 0:
        raise CorruptBlockError("prefix: first row claims a shared prefix")
    lens = p + s
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total_s = int(s.sum())
    blob = payload[pos : pos + total_s]
    if len(blob) != total_s:
        raise CorruptBlockError("prefix: truncated suffix blob")
    # prefixes must chain: row i can only inherit bytes its predecessor
    # actually has (p[i] <= len(i-1)); violated => corruption
    if n > 1 and (p[1:] > lens[:-1]).any():
        raise CorruptBlockError("prefix: prefix length exceeds previous row")
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    # 1) scatter every suffix into its final position (one gather)
    if total_s:
        src = np.frombuffer(blob, dtype=np.uint8)
        dst_base = np.repeat(offsets[:-1] + p
                             - np.concatenate(([0], np.cumsum(s)[:-1])), s)
        out[dst_base + np.arange(total_s, dtype=np.int64)] = src
    # 2) resolve inherited bytes position-by-position: byte j of row i
    #    is byte j of the most recent row k <= i with p[k] <= j (where
    #    it was literal and is therefore already in `out`)
    starts = offsets[:-1]
    rows = np.arange(n, dtype=np.int64)
    max_p = int(p.max())
    for j in range(max_p):
        need = p > j  # rows inheriting byte j
        lit = np.where((p <= j) & (lens > j), rows, -1)
        src_row = np.maximum.accumulate(lit)[need]
        if (src_row < 0).any():
            raise CorruptBlockError("prefix: no literal source for inherited byte")
        out[starts[need] + j] = out[starts[src_row] + j]
    return StringColumn(offsets, out.tobytes())
