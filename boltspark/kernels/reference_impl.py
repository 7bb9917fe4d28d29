"""Slow, obviously-correct pure-Python codec implementations.

Dual-path pinning (SURVEY.md §5, mirroring the reference's habit of
running every page test through both DirectByteBuffer and
StreamingByteBuffer and asserting identical results): the vectorized
numpy kernels must agree bit-for-bit with these loops on every input.
Never used in the hot path.
"""

from __future__ import annotations

import numpy as np

from .strings import StringColumn


def bitpack_pack(values, width: int) -> bytes:
    bits = []
    for v in values:
        v = int(v)
        for k in range(width):
            bits.append((v >> k) & 1)
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def bitpack_unpack(buf: bytes, width: int, n: int) -> list[int]:
    out = []
    for i in range(n):
        v = 0
        for k in range(width):
            bit_index = i * width + k
            if buf[bit_index // 8] >> (bit_index % 8) & 1:
                v |= 1 << k
        out.append(v)
    return out


def varint_encode(values) -> bytes:
    out = bytearray()
    for v in values:
        v = int(v)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    return bytes(out)


def hybrid_decode(buf: bytes, width: int, n: int) -> list[int]:
    """Sequential hybrid RLE/BP decode, mirroring rle_bp.rs:30-98."""
    out: list[int] = []
    pos = 0
    vb = (width + 7) // 8
    while len(out) < n:
        header = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            header |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if header & 1:
            count = (header >> 1) * 8
            vals = bitpack_unpack(buf[pos : pos + (count * width + 7) // 8], width, count)
            pos += (count * width + 7) // 8
            out.extend(vals[: n - len(out)])
        else:
            run = header >> 1
            value = int.from_bytes(buf[pos : pos + vb], "little")
            pos += vb
            out.extend([value] * min(run, n - len(out)))
    return out


def fsst_greedy_encode_size(table: list[bytes], data: bytes) -> int:
    """Sequential left-to-right greedy FSST parse; returns encoded byte
    count (1/code, 2/literal) for compressing-quality comparison."""
    lookup = set(table)
    pos = 0
    size = 0
    while pos < len(data):
        for l in range(min(8, len(data) - pos), 0, -1):
            if data[pos : pos + l] in lookup:
                size += 1
                pos += l
                break
        else:
            size += 2
            pos += 1
    return size


def strings_plain_decode(payload: bytes, n: int) -> StringColumn:
    offsets = [
        int.from_bytes(payload[i * 8 : i * 8 + 8], "little") for i in range(n + 1)
    ]
    data = payload[(n + 1) * 8 :][: offsets[-1]]
    return StringColumn(np.array(offsets, dtype=np.int64), data)
