"""Run-length encoding: hybrid RLE/bit-pack stream + vectorized array RLE.

Two formats:

1. ``encode_hybrid``/``decode_hybrid`` — the Parquet-style hybrid
   RLE/bit-packing stream, capability parity with the reference's
   decoder (/root/reference/src/utils/encoding/rle_bp.rs:30-98): each
   segment starts with a varint header; LSB 0 => RLE run (``header >> 1``
   repeats of one little-endian value in ``ceil(width/8)`` bytes),
   LSB 1 => ``header >> 1`` bit-packed groups of 8 values.  The
   reference only decodes (encode exists just in its tests); we
   implement both directions.  Used for dictionary code streams.

2. ``runs_of``/``encode_runs`` — plain (values, lengths) run
   decomposition used by the standalone RLE codec: run values stored
   as a typed plain sub-block, run lengths bit-packed.  Decode is a
   single ``np.repeat`` — the fully vectorized path.
"""

from __future__ import annotations

import numpy as np

from . import bitpack, varint
from .varint import CorruptBlockError

# runs shorter than this are folded into bit-packed spans (Parquet uses 8)
_MIN_RLE_RUN = 8


def runs_of(values: np.ndarray,
            detect: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Decompose an array into (run_values, run_lengths); vectorized.

    ``detect`` supplies the array compared for change points (defaults to
    ``values``).  Float callers pass the uint bit view so -0.0/0.0 and
    distinct NaN payloads never merge into one run (bit-identical decode
    invariant); run VALUES are still taken from ``values`` at the run
    starts, so the stored bytes are the original bit patterns.
    """
    n = len(values)
    if n == 0:
        return values[:0], np.zeros(0, dtype=np.int64)
    d = values if detect is None else detect
    change = np.nonzero(d[1:] != d[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    bounds = np.concatenate((starts, [n]))
    return values[starts], np.diff(bounds)


def mean_run_length(values: np.ndarray) -> float:
    n = len(values)
    if n == 0:
        return 0.0
    n_runs = 1 + int(np.count_nonzero(values[1:] != values[:-1]))
    return n / n_runs


# ---------------------------------------------------------------------------
# hybrid RLE / bit-packing (Parquet-compatible layout, rle_bp.rs parity)
# ---------------------------------------------------------------------------


def _value_bytes(width: int) -> int:
    return (width + 7) // 8


def encode_hybrid(values: np.ndarray, width: int) -> bytes:
    """Encode non-negative ints < 2**width as a hybrid RLE/BP stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if width == 0:
        # single RLE run of the zero value, zero value bytes
        return varint.encode_one(n << 1)
    run_vals, run_lens = runs_of(v)
    out = bytearray()
    vb = _value_bytes(width)
    n_runs = len(run_vals)
    is_rle_mask = run_lens >= _MIN_RLE_RUN
    n_rle = int(is_rle_mask.sum())
    # segment emission is a Python loop (one iteration per RLE run / BP
    # span); when the data is run-poor, size won is tiny but the loop is
    # long — emit one bit-packed span instead and skip the loop entirely
    if n_rle > max(4096, n >> 6):
        bp_size = bitpack.packed_size(n, width)
        rle_saved = int(run_lens[is_rle_mask].sum()) * width // 8 - n_rle * (2 + vb)
        if rle_saved < bp_size // 8:
            pad = (-n) % 8
            span = v if not pad else np.concatenate(
                (v, np.full(pad, v[-1], np.uint64)))
            out += varint.encode_one(((len(span) // 8) << 1) | 1)
            out += bitpack.pack(span, width)
            return bytes(out)

    def flush_bp(lo: int, hi: int) -> None:
        # [lo, hi) is 8-aligned in count except possibly at stream end,
        # where the decoder trims the padding (it never reads past n)
        span = v[lo:hi]
        pad = (-len(span)) % 8
        if pad:
            assert hi == n, "bit-packed span must be 8-aligned mid-stream"
            span = np.concatenate((span, np.full(pad, span[-1], np.uint64)))
        groups = len(span) // 8
        out.extend(varint.encode_one((groups << 1) | 1))
        out.extend(bitpack.pack(span, width))

    # walk only the RLE-worthy runs (short runs merge into bit-packed
    # spans implicitly): O(#long runs) Python iterations, not O(#runs)
    starts = np.zeros(n_runs + 1, dtype=np.int64)
    np.cumsum(run_lens, out=starts[1:])
    pos = 0  # absolute index of next unencoded value
    for ri in np.nonzero(is_rle_mask)[0]:
        run_start = int(starts[ri])
        length = int(run_lens[ri])
        if run_start < pos:  # swallowed by an earlier span's alignment
            continue
        if run_start > pos:
            # steal from this run's head to 8-align the pending span
            steal = (-(run_start - pos)) % 8
            if length - steal < _MIN_RLE_RUN:
                continue  # too short after stealing: absorb into the span
            flush_bp(pos, run_start + steal)
            pos = run_start + steal
            length -= steal
        out += varint.encode_one(length << 1)
        out += int(run_vals[ri]).to_bytes(vb, "little")
        pos += length
    if pos < n:
        flush_bp(pos, n)
    return bytes(out)


def decode_hybrid(buf: bytes, width: int, n: int) -> np.ndarray:
    """Decode ``n`` values from a hybrid RLE/BP stream (rle_bp.rs:30-98)."""
    out = np.empty(n, dtype=np.uint64)
    filled = 0
    pos = 0
    vb = _value_bytes(width)
    while filled < n:
        header, pos = varint.decode_one(buf, pos)
        if header & 1:
            groups = header >> 1
            count = groups * 8
            nbytes = bitpack.packed_size(count, width)
            vals = bitpack.unpack(buf[pos : pos + nbytes], width, count)
            pos += nbytes
            take = min(count, n - filled)
            out[filled : filled + take] = vals[:take]
            filled += take
        else:
            run = header >> 1
            if run == 0:
                raise CorruptBlockError("rle: zero-length run")
            if pos + vb > len(buf):
                raise CorruptBlockError("rle: truncated run value")
            value = int.from_bytes(buf[pos : pos + vb], "little")
            if width < 64 and value >> width:
                raise CorruptBlockError("rle: run value exceeds bit width")
            pos += vb
            take = min(run, n - filled)
            out[filled : filled + take] = value
            filled += take
    return out
