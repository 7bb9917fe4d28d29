"""Frame-of-reference codec for integer columns.

North-rule codec with no reference analog (the reference's Thrift model
names DELTA_BINARY_PACKED but implements no kernel for it —
/root/reference/src/metadata/parquet_metadata_thrift.rs:386-401 vs
primitive_column_reader.rs:559-562).  Layout: reference value = column
min; payload = bit-packed unsigned deltas ``value - min``.
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .types import dtype_of
from .varint import CorruptBlockError


def encode(values: np.ndarray, tag: str) -> tuple[bytes, dict]:
    if tag not in ("i32", "i64"):
        raise TypeError(f"frame-of-reference only applies to integers, got {tag}")
    v = np.ascontiguousarray(values)
    n = len(v)
    if n == 0:
        return b"", {"ref": 0, "width": 0}
    lo = int(v.min())
    hi = int(v.max())
    width = bitpack.min_bit_width(hi - lo)
    deltas = (v.astype(np.int64) - lo).astype(np.uint64)
    return bitpack.pack(deltas, width), {"ref": lo, "width": width}


def decode(payload: bytes, meta: dict, n: int, tag: str) -> np.ndarray:
    width = int(meta["width"])
    ref = int(meta["ref"])
    deltas = bitpack.unpack(payload, width, n)
    out = deltas.astype(np.int64) + ref
    dt = dtype_of(tag)
    if tag == "i32":
        if n and (out.max(initial=0) > np.iinfo(np.int32).max or
                  out.min(initial=0) < np.iinfo(np.int32).min):
            raise CorruptBlockError("frame-of-reference: decoded value overflows i32")
        return out.astype(dt)
    return out.astype(dt)
