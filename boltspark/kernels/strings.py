"""Arrow-layout byte-array columns: (offsets, data) pairs.

The engine's string representation mirrors the reference's plain
byte-array page (u32-length-prefixed strings,
/root/reference/src/page_reader/data_page_v1/plain_data_page_byte_array_v1.rs:158-263)
but uses the Arrow offsets layout (n+1 int64 offsets + one data blob) so
conversion to/from pyarrow is zero-copy and every kernel stays
vectorized.  Values are opaque bytes — never Python ``str`` — to keep
round-trips bit-identical (byte_array_bridge.rs:30: strings are Vec<u8>).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from .varint import CorruptBlockError


@dataclass(frozen=True)
class StringColumn:
    """Dense byte-array column: offsets (int64, len n+1) + data blob."""

    offsets: np.ndarray  # int64, monotonically non-decreasing, offsets[0] == 0
    data: bytes

    def __len__(self) -> int:
        return len(self.offsets) - 1

    @property
    def nbytes(self) -> int:
        return len(self.data) + self.offsets.nbytes

    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def __getitem__(self, i: int) -> bytes:
        return self.data[self.offsets[i] : self.offsets[i + 1]]

    def to_pylist(self) -> list[bytes]:
        o = self.offsets
        d = self.data
        return [d[o[i] : o[i + 1]] for i in range(len(self))]


def from_pylist(values: list[bytes]) -> StringColumn:
    lengths = np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))
    offsets = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return StringColumn(offsets, b"".join(values))


def from_arrow(arr: pa.Array) -> StringColumn:
    """Zero-copy-ish conversion from a pyarrow (large_)string/binary array.

    Nulls must be handled by the caller (block layer strips them first).
    """
    if arr.null_count:
        raise ValueError("from_arrow expects a dense (null-free) array")
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif not pa.types.is_large_binary(arr.type):
        raise TypeError(f"not a string/binary array: {arr.type}")
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data_buf = buffers[2]
    if data_buf is None:
        data = b""
        if len(offsets) and offsets[0] != 0:
            offsets = offsets - offsets[0]
    elif offsets[0] != 0:
        # sliced array: copy ONLY the slice's bytes (a to_pybytes of the
        # whole buffer followed by a slice would copy the data twice)
        base = int(offsets[0])
        data = bytes(memoryview(data_buf)[base : int(offsets[-1])])
        offsets = offsets - base
    else:
        data = bytes(memoryview(data_buf)[: int(offsets[-1])])
    return StringColumn(np.ascontiguousarray(offsets), data)


def to_arrow(col: StringColumn) -> pa.Array:
    """Zero-copy conversion to a pyarrow large_binary array."""
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(col),
        [None, pa.py_buffer(np.ascontiguousarray(col.offsets, dtype=np.int64)), pa.py_buffer(col.data)],
    )


def take(col: StringColumn, indices: np.ndarray) -> StringColumn:
    """Vectorized gather via Arrow's C++ take kernel: col[indices]."""
    import pyarrow.compute as pc

    taken = pc.take(to_arrow(col), pa.array(np.ascontiguousarray(indices)))
    return from_arrow(taken.combine_chunks() if isinstance(taken, pa.ChunkedArray) else taken)


def gather_slices(data: bytes, starts: np.ndarray, lens: np.ndarray) -> bytes:
    """Concatenate data[starts[i]:starts[i]+lens[i]] for all i, vectorized.

    Standard repeat/cumsum trick: build the source index array for every
    output byte without a Python loop.
    """
    total = int(lens.sum())
    if total == 0:
        return b""
    src = np.frombuffer(data, dtype=np.uint8)
    # idx = concat(arange(starts[i], starts[i]+lens[i]))
    out_pos = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    idx = out_pos + np.arange(total, dtype=np.int64)
    return src[idx].tobytes()


def encode_plain(col: StringColumn) -> tuple[bytes, dict]:
    """Plain byte-array block: bit-width-minimal offsets would complicate
    zero-copy, so offsets are raw little-endian int64 + blob."""
    payload = (
        np.ascontiguousarray(col.offsets, dtype="<i8").tobytes() + col.data
    )
    return payload, {"n": len(col)}


def decode_plain(payload: bytes, n: int) -> StringColumn:
    off_bytes = (n + 1) * 8
    if len(payload) < off_bytes:
        raise CorruptBlockError("plain-bytes: truncated offsets")
    offsets = np.frombuffer(payload, dtype="<i8", count=n + 1).astype(np.int64)
    if n >= 0 and (offsets[0] != 0 or (np.diff(offsets) < 0).any()):
        raise CorruptBlockError("plain-bytes: non-monotonic offsets")
    data = payload[off_bytes:]
    if len(data) < offsets[-1]:
        raise CorruptBlockError("plain-bytes: truncated data blob")
    return StringColumn(offsets, data[: offsets[-1]])
