"""Vectorized LSB-first bit-packing of unsigned integers.

Capability parity with the reference's bit-packed groups inside the
hybrid RLE/BP format (/root/reference/src/utils/encoding/rle_bp.rs:30-98)
and its boolean bit-unpack reader
(/root/reference/src/page_reader/data_page_v1/boolean_data_page_v1.rs:175-263):
values are laid out little-endian, LSB-first, ``width`` bits each,
byte-padded at the end.  numpy ``packbits/unpackbits(bitorder='little')``
is the vectorized engine (numpy is our SIMD).
"""

from __future__ import annotations

import numpy as np

from .varint import CorruptBlockError

# chunk size bounds the (n, width) uint8 bit-matrix scratch memory
_CHUNK = 1 << 20


def min_bit_width(max_value: int) -> int:
    """Minimum bits to represent ``max_value`` (0 -> 0 bits).

    Mirrors ``get_minimum_required_bits`` (rle_bp.rs).
    """
    if max_value < 0:
        raise ValueError("bitpack requires non-negative values")
    return int(max_value).bit_length()


def packed_size(n: int, width: int) -> int:
    return (n * width + 7) // 8


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack a non-negative integer array into ``width``-bit little-endian codes.

    Group-of-8 word method (FastLanes-flavored): 8 values occupy exactly
    ``width`` bytes, and within a group each lane's bit offset is fixed
    (lane j starts at bit j*width), so every lane's byte contributions
    land at constant byte positions across ALL groups — each is one
    vectorized shift+OR over the group axis (~width+8 element-ops per
    8 values, vs width per value for a bit-matrix).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if width == 0:
        if n and v.max() != 0:
            raise ValueError("width 0 but non-zero values")
        return b""
    if width < 0 or width > 64:
        raise ValueError(f"invalid bit width {width}")
    if n == 0:
        return b""
    if int(v.max()) >> width:
        raise ValueError("value does not fit in bit width")
    pad = (-n) % 8
    if pad:
        v = np.concatenate((v, np.zeros(pad, np.uint64)))
    g = len(v) // 8
    lanes = v.reshape(g, 8)
    out = np.zeros((g, width), dtype=np.uint8)
    for j in range(8):
        start_bit = j * width
        byte0 = start_bit >> 3
        shift = start_bit & 7
        # lane j spans ceil((width + shift) / 8) bytes from byte0
        nbytes = (width + shift + 7) >> 3
        lane = lanes[:, j]
        for k in range(nbytes):
            if k == 0:
                b = (lane << np.uint64(shift)) & np.uint64(0xFF)
            else:
                b = (lane >> np.uint64(8 * k - shift)) & np.uint64(0xFF)
            if byte0 + k < width:
                out[:, byte0 + k] |= b.astype(np.uint8)
    full = out.reshape(-1)
    return full[: packed_size(n, width)].tobytes()


def unpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Unpack ``n`` ``width``-bit little-endian codes (inverse of pack)."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width < 0 or width > 64:
        raise CorruptBlockError(f"invalid bit width {width}")
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    need = packed_size(n, width)
    if len(buf) < need:
        raise CorruptBlockError(
            f"bitpack: need {need} bytes for {n}x{width}b, have {len(buf)}"
        )
    g = (n + 7) // 8
    padded = np.zeros(g * width, dtype=np.uint8)
    padded[:need] = np.frombuffer(buf, dtype=np.uint8, count=need)
    mat = padded.reshape(g, width)
    lanes = np.zeros((g, 8), dtype=np.uint64)
    mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    for j in range(8):
        start_bit = j * width
        byte0 = start_bit >> 3
        shift = start_bit & 7
        nbytes = (width + shift + 7) >> 3
        acc = np.zeros(g, dtype=np.uint64)
        for k in range(nbytes):
            if byte0 + k >= width:
                break
            b = mat[:, byte0 + k].astype(np.uint64)
            if k == 0:
                acc |= b >> np.uint64(shift)
            else:
                acc |= b << np.uint64(8 * k - shift)
        lanes[:, j] = acc & mask
    return lanes.reshape(-1)[:n]


def pack_bools(values: np.ndarray) -> bytes:
    """Boolean bit-pack (validity bitmaps, boolean columns)."""
    return np.packbits(
        np.ascontiguousarray(values, dtype=np.uint8), bitorder="little"
    ).tobytes()


def unpack_bools(buf: bytes, n: int) -> np.ndarray:
    if len(buf) < (n + 7) // 8:
        raise CorruptBlockError("bool bitmap: truncated")
    return np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little"
    ).astype(bool)
