"""LEB128 unsigned varint encode/decode, scalar and vectorized.

Capability parity with the reference's varint kernel
(/root/reference/src/utils/encoding/varint.rs:36-75): little-endian
base-128, continuation bit 0x80, max 10 bytes for u64.  The vectorized
array forms are new (the reference only decodes one value at a time);
they are used for length/header streams inside encoded blocks.
"""

from __future__ import annotations

import numpy as np

MAX_VARINT_LEN = 10  # ceil(64 / 7)


class CorruptBlockError(ValueError):
    """Raised when encoded bytes cannot be decoded safely."""


def encode_one(value: int) -> bytes:
    """Encode a single unsigned int (< 2**64) as LEB128 bytes."""
    if value < 0 or value >= 1 << 64:
        raise ValueError(f"varint out of range: {value}")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_one(buf: bytes, pos: int = 0) -> tuple[int, int]:
    """Decode one varint from ``buf[pos:]``; returns (value, next_pos).

    Mirrors the reference's bounds/corruption behavior
    (varint.rs: too-long and truncated streams error out).
    """
    result = 0
    shift = 0
    for i in range(MAX_VARINT_LEN):
        if pos + i >= len(buf):
            raise CorruptBlockError("varint: truncated stream")
        b = buf[pos + i]
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            if result >= 1 << 64:
                raise CorruptBlockError("varint: value overflows u64")
            return result, pos + i + 1
        shift += 7
    raise CorruptBlockError("varint: more than 10 bytes")


def encode_array(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    for _ in range(MAX_VARINT_LEN):
        mask = tmp != 0
        if not mask.any():
            break
        nbits[mask] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    # write 7-bit groups, round k covers values with nbytes > k
    active = np.arange(n)
    shifted = v.copy()
    k = 0
    while len(active):
        sel = nbytes[active] > k
        active = active[sel]
        shifted = shifted[sel]
        if not len(active):
            break
        byte = (shifted & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[active] > k + 1).astype(np.uint8) << 7
        out[starts[active] + k] = byte | cont
        shifted = shifted >> np.uint64(7)
        k += 1
    return out.tobytes()


def decode_array(buf: bytes, n: int) -> tuple[np.ndarray, int]:
    """Vectorized LEB128 decode of ``n`` values; returns (values, bytes_consumed)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64), 0
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_cont = (raw & 0x80) != 0
    # token k starts right after the (k-1)-th terminator byte
    term_pos = np.nonzero(~is_cont)[0]
    if len(term_pos) < n:
        raise CorruptBlockError("varint: truncated stream")
    ends = term_pos[:n] + 1
    starts = np.concatenate(([0], ends[:-1]))
    lengths = ends - starts
    if (lengths > MAX_VARINT_LEN).any():
        raise CorruptBlockError("varint: more than 10 bytes")
    values = np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    for k in range(maxlen):
        sel = lengths > k
        b = raw[starts[sel] + k].astype(np.uint64)
        values[sel] |= (b & np.uint64(0x7F)) << np.uint64(7 * k)
    return values, int(ends[-1])
