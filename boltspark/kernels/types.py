"""Physical type tags for encoded blocks.

Parity with the reference's ``PhysicalDataType``
(/root/reference/src/column_reader/column_reader_base.rs:20-28):
Boolean, Int32, Int64, Float32, Float64, ByteArray.  Strings are opaque
byte arrays end-to-end (byte_array_bridge.rs:30) — the engine never
routes ``content`` through Python ``str`` so round-trips stay
bit-identical.
"""

from __future__ import annotations

import numpy as np

# physical type tag -> numpy dtype (BYTES handled separately)
BOOL = "bool"
INT32 = "i32"
INT64 = "i64"
FLOAT32 = "f32"
FLOAT64 = "f64"
BYTES = "bytes"

NUMPY_DTYPES = {
    BOOL: np.dtype(np.bool_),
    INT32: np.dtype("<i4"),
    INT64: np.dtype("<i8"),
    FLOAT32: np.dtype("<f4"),
    FLOAT64: np.dtype("<f8"),
}

# decimal(19..38): 128-bit two's-complement as an (n, 2) int64 array of
# (lo, hi) word pairs — numpy has no int128, so the pair IS the value
D128 = "d128"

FIXED_TAGS = tuple(NUMPY_DTYPES)
# list-of-fixed tags (kernels/lists.py) appended AFTER the originals so
# stored tag ids stay stable
LIST_TAG_NAMES = ("li32", "li64", "lf32", "lf64")
# "lbytes" (list<string|binary>) appended in round 3, "d128" in round 4
# — always AFTER the existing tags so stored tag ids stay stable
ALL_TAGS = FIXED_TAGS + (BYTES,) + LIST_TAG_NAMES + ("lbytes", D128)


def tag_of(arr) -> str:
    """Physical tag for a numpy array or a StringColumn."""
    if hasattr(arr, "offsets"):  # StringColumn duck-type
        return BYTES
    a = np.asarray(arr)
    if a.ndim == 2 and a.shape[1] == 2 and a.dtype == NUMPY_DTYPES[INT64]:
        return D128
    dt = a.dtype
    for tag, np_dt in NUMPY_DTYPES.items():
        if dt == np_dt:
            return tag
    raise TypeError(f"unsupported physical dtype {dt} "
                    "(reference rejects INT96/FLBA the same way: "
                    "primitive_column_reader.rs:450-455)")


def dtype_of(tag: str) -> np.dtype:
    try:
        return NUMPY_DTYPES[tag]
    except KeyError:
        raise TypeError(f"unsupported physical tag {tag!r}") from None
