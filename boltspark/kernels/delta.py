"""Delta codec for sorted / near-sorted integer columns.

The reference's Thrift model names DELTA_BINARY_PACKED but implements
no kernel for it (/root/reference/src/metadata/parquet_metadata_thrift.rs:386-401
vs primitive_column_reader.rs:559-562) — this is the encode+decode
kernel, simplified to one frame: store the first value, then
frame-of-reference over the CONSECUTIVE DIFFERENCES (``d_i = v_{i+1} -
v_i``), bit-packed at the minimal width for ``d - min(d)``.

Timestamps, auto-increment ids and row-order sequence numbers — the
columns a source-code corpus sorts by — have tiny delta ranges even
when the absolute values need 40+ bits, so this beats plain FoR by the
ratio of the value range to the step range.

Overflow discipline: encode REFUSES (ValueError) any input whose value
span or delta span reaches 2^63 — the engine's per-partition fallback
turns that into a plain block (engine/encode.py catches
TypeError/ValueError), so the codec is never silently wrong on
adversarial data; everything it does accept reconstructs bit-exact in
int64 arithmetic.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .types import dtype_of
from .varint import CorruptBlockError


def encode(values: np.ndarray, tag: str) -> tuple[bytes, dict]:
    if tag not in ("i32", "i64"):
        raise TypeError(f"delta codec only applies to integers, got {tag}")
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b"", {"first": 0, "dref": 0, "width": 0}
    # spans computed in Python ints (no wraparound) BEFORE np.diff runs,
    # so the vectorized subtraction below can never overflow silently
    if int(v.max()) - int(v.min()) >= 1 << 62:
        raise ValueError("delta: value span too wide for int64 delta math")
    if n == 1:
        return b"", {"first": int(v[0]), "dref": 0, "width": 0}
    d = np.diff(v)
    dmin, dmax = int(d.min()), int(d.max())
    if dmax - dmin >= 1 << 62:
        raise ValueError("delta: delta span too wide to frame")
    width = bitpack.min_bit_width(dmax - dmin)
    payload = bitpack.pack((d - dmin).astype(np.uint64), width)
    return payload, {"first": int(v[0]), "dref": dmin, "width": width}


def decode(payload: bytes, meta: dict, n: int, tag: str) -> np.ndarray:
    dt = dtype_of(tag)
    if n == 0:
        return np.zeros(0, dtype=dt)
    first = int(meta["first"])
    width = int(meta["width"])
    dref = int(meta["dref"])
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n > 1:
        d = bitpack.unpack(payload, width, n - 1).astype(np.int64) + dref
        np.cumsum(d, out=out[1:])
        out[1:] += first
    if tag == "i32":
        if (out.max(initial=0) > np.iinfo(np.int32).max
                or out.min(initial=0) < np.iinfo(np.int32).min):
            raise CorruptBlockError("delta: decoded value overflows i32")
        return out.astype(dt)
    return out
