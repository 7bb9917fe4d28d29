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
    """Pack a non-negative integer array into ``width``-bit little-endian codes."""
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
    if n and int(v.max()) >> width:
        raise ValueError("value does not fit in bit width")
    shifts = np.arange(width, dtype=np.uint64)
    # process in chunks whose bit counts are byte-aligned (CHUNK*width % 8 == 0)
    out = []
    for lo in range(0, n, _CHUNK):
        chunk = v[lo : lo + _CHUNK]
        bits = ((chunk[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        out.append(np.packbits(bits.reshape(-1), bitorder="little").tobytes())
    return b"".join(out)


def unpack(buf: bytes, width: int, n: int) -> np.ndarray:
    """Unpack ``n`` ``width``-bit little-endian codes into a uint64 array."""
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
    raw = np.frombuffer(buf, dtype=np.uint8, count=need)
    shifts = np.arange(width, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    # chunk on the same boundary as pack(): _CHUNK values = _CHUNK*width bits,
    # byte-aligned because _CHUNK is a multiple of 8
    bytes_per_chunk = _CHUNK * width // 8
    for i, lo in enumerate(range(0, n, _CHUNK)):
        cnt = min(_CHUNK, n - lo)
        seg = raw[i * bytes_per_chunk : i * bytes_per_chunk + (cnt * width + 7) // 8]
        bits = np.unpackbits(seg, count=cnt * width, bitorder="little")
        out[lo : lo + cnt] = (
            bits.reshape(cnt, width).astype(np.uint64) << shifts
        ).sum(axis=1, dtype=np.uint64)
    return out


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
