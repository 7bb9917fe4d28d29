"""Sampled-statistics codec auto-selection.

Absent in the reference (its decoder accepts whatever encoding the file
declares — SURVEY.md §4 last row); required by the north rule.  Per
(partition, column): compute cheap stats on a bounded sample
(cardinality ratio, mean run length, byte entropy, value range), derive
a candidate shortlist from a decision table, then *trial-encode the
sample* with each candidate and pick the smallest — estimates never
disagree with reality that way, and plain is always in the running so
the selector can never lose to no-compression.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import block, rle, strings
from .types import BOOL, BYTES, D128

SAMPLE_VALUES = 1024
# fixed-width samples are cheap; a big sample (256-512 KB) is needed for
# the OUTER trial to reflect real-block zstd behavior — zstd's ratio on
# byte-plane data keeps improving past 64 KB inputs, so small samples
# bias the decision toward plain/'none' (measured: split+zstd on f32
# noise is 0.93 at 16 Ki values but 0.86-0.88 at >=64 Ki, matching real
# 4 MB blocks).  The trial runs once per (partition, column).
SAMPLE_FIXED_VALUES = 65536
SAMPLE_BLOB_BYTES = 64 << 10
DEFAULT_OUTER = "zstd"
# outer compression must win by this factor on the sample to be applied
OUTER_MIN_GAIN = 0.9
# encode-cost penalties: a slower codec must beat the alternatives by
# this factor on size to be chosen (fsst encode is ~100x slower than
# plain+zstd, so a marginal size win is a bad trade; prefix decode is
# a position-wise resolve loop, slower than plain's zero-copy view)
COST_PENALTY = {"fsst": 1.25, "prefix": 1.1}


@dataclass
class ColumnStats:
    n: int
    n_distinct: int
    distinct_ratio: float
    mean_run_length: float
    avg_len: float  # bytes columns only (0 otherwise)
    entropy: float  # bytes columns only: bits/byte on sample
    vmin: float | None = None
    vmax: float | None = None


@dataclass
class CodecChoice:
    codec: str
    outer: str
    stats: ColumnStats
    est_ratio: float  # sample encoded bytes / sample raw bytes


def _sample_fixed(values: np.ndarray, n: int = SAMPLE_FIXED_VALUES) -> np.ndarray:
    if len(values) <= n:
        return values
    step = len(values) // n
    return values[::step][:n]


def _sample_bytes(col: strings.StringColumn) -> strings.StringColumn:
    n = len(col)
    if n <= SAMPLE_VALUES and len(col.data) <= SAMPLE_BLOB_BYTES:
        return col
    step = max(1, n // SAMPLE_VALUES)
    idx = np.arange(0, n, step, dtype=np.int64)[:SAMPLE_VALUES]
    out = strings.take(col, idx)
    if len(out.data) > SAMPLE_BLOB_BYTES:
        # trim rows until blob bound holds
        keep = int(np.searchsorted(out.offsets, SAMPLE_BLOB_BYTES))
        keep = max(1, min(keep, len(out)))
        out = strings.StringColumn(out.offsets[: keep + 1].copy(), out.data[: int(out.offsets[keep])])
    return out


def _entropy(buf: np.ndarray) -> float:
    if len(buf) == 0:
        return 0.0
    counts = np.bincount(buf, minlength=256)
    p = counts[counts > 0] / len(buf)
    return float(-(p * np.log2(p)).sum())


def compute_stats(values, tag: str) -> ColumnStats:
    if tag == D128:
        # 128-bit pairs: plain (word-plane) + outer is the only codec;
        # runs/distincts over (n, 2) rows aren't meaningful to the
        # 1-D codecs, so skip the sampling arithmetic entirely
        n = len(values)
        return ColumnStats(n=n, n_distinct=n, distinct_ratio=1.0,
                           mean_run_length=1.0, avg_len=0.0, entropy=0.0)
    if tag == BYTES:
        s = _sample_bytes(values)
        lens = s.lengths()
        # distinct on sampled rows via hashing the bytes
        arr = strings.to_arrow(s)
        import pyarrow.compute as pc

        nd = len(pc.unique(arr))
        n = len(s)
        # run length over the sampled rows (consecutive equal values)
        runs = 1
        if n > 1:
            eq = np.asarray(pc.equal(arr.slice(1), arr.slice(0, n - 1)).fill_null(False))
            runs = 1 + int((~eq).sum())
        return ColumnStats(
            n=n, n_distinct=nd,
            distinct_ratio=nd / n if n else 1.0,
            mean_run_length=n / runs if runs else 0.0,
            avg_len=float(lens.mean()) if n else 0.0,
            entropy=_entropy(np.frombuffer(s.data, np.uint8)),
        )
    v = _sample_fixed(np.ascontiguousarray(values))
    n = len(v)
    nd = len(np.unique(v)) if n else 0
    return ColumnStats(
        n=n, n_distinct=nd,
        distinct_ratio=nd / n if n else 1.0,
        mean_run_length=rle.mean_run_length(v),
        avg_len=0.0, entropy=0.0,
        vmin=float(v.min()) if n else None,
        vmax=float(v.max()) if n else None,
    )


def candidate_codecs(stats: ColumnStats, tag: str) -> list[str]:
    cands = ["plain"]
    if tag == D128:
        return cands  # word-plane plain + outer only
    if tag == BYTES:
        if stats.distinct_ratio <= 0.6:
            cands.append("dict")
        if stats.avg_len >= 4 and stats.entropy <= 7.2:
            cands.append("fsst")
        if 8 <= stats.avg_len <= 512:
            # front coding: pays on sorted KEY-LIKE columns (paths, ids)
            # — the trial decides on final size like everything else.
            # Long-text columns are excluded outright: their row-to-row
            # shared prefixes are the outer compressor's job, and the
            # position-wise decode loop scales with prefix length
            cands.append("prefix")
        return cands
    if tag == BOOL:
        if stats.mean_run_length >= 4:
            cands.append("rle")
        return cands
    if stats.mean_run_length >= 3:
        cands.append("rle")
    if stats.distinct_ratio <= 0.5 and stats.n_distinct <= 1 << 18:
        cands.append("dict")
    if tag in ("i32", "i64"):
        cands.append("for")
        # delta: pays when consecutive steps are narrow (sorted
        # timestamps/ids); strided sampling preserves sortedness so the
        # trial sees the real shape
        cands.append("delta")
        if stats.vmin is not None and stats.vmin >= 0:
            cands.append("bitpack")
    if tag in ("f32", "f64"):
        # byte-stream split only pays THROUGH the outer compressor; the
        # trial measures final (post-outer) sizes, so it competes fairly
        cands.append("split")
    return cands


def _raw_size(values, tag: str) -> int:
    if tag == BYTES:
        return len(values.data) + max(len(values), 1)  # blob + ~1B/len overhead
    return np.ascontiguousarray(values).nbytes


def choose(values, tag: str, outer: str | None = DEFAULT_OUTER,
           stats: ColumnStats | None = None,
           fsst_table: list[bytes] | None = None,
           cost_penalty: dict[str, float] | None = None,
           outer_level: int | None = None,
           exclude: tuple[str, ...] = ()) -> CodecChoice:
    """Pick (codec, outer) by trial-encoding a sample.

    ``fsst_table`` reuses a prebuilt symbol table for the fsst trial
    (the engine builds one per column ON THE DRIVER and ships it in the
    encoder closure — table construction is the expensive part of fsst,
    measured 77% of a task's encode CPU before round 4).
    ``cost_penalty`` overrides the default encode-cost weights (e.g.
    ``{"fsst": 1.0}`` to pick purely on size when encode CPU is cheap
    relative to storage).  ``exclude`` removes codecs from the trial
    entirely — the engine passes ``("fsst",)`` when no prebuilt table
    exists, because a table-less fsst trial would silently rebuild a
    table per call."""
    penalties = COST_PENALTY if cost_penalty is None else cost_penalty
    if stats is None:
        stats = compute_stats(values, tag)
    sample = _sample_bytes(values) if tag == BYTES else _sample_fixed(
        np.ascontiguousarray(values))
    raw = max(_raw_size(sample, tag), 1)
    # compare candidates on their FINAL size (after outer compression),
    # weighted by encode cost: zstd interacts differently with each inner
    # codec — e.g. plain+zstd often beats fsst+zstd because fsst
    # tokenization hides long matches
    best = None  # (scored, codec, outer, size)
    for codec in candidate_codecs(stats, tag):
        if codec in exclude:
            continue
        try:
            payload, _ = block.encode_values(sample, tag, codec,
                                             fsst_table=fsst_table)
        except (TypeError, ValueError):
            continue
        size, out_name = len(payload), "none"
        if outer and outer != "none" and size:
            # trial at the SAME level blocks will be stored with, or the
            # outer on/off gate is decided against the wrong compressor
            comp = len(block._outer_compress(payload, outer, outer_level))
            if comp < OUTER_MIN_GAIN * size:
                size, out_name = comp, outer
        scored = size * penalties.get(codec, 1.0)
        if best is None or scored < best[0]:
            best = (scored, codec, out_name, size)
    if best is None:
        return CodecChoice("plain", "none", stats, 1.0)
    return CodecChoice(best[1], best[2], stats, best[3] / raw)
