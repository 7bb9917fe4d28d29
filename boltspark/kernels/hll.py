"""HyperLogLog sketch (Flajolet et al. 2007) — numpy, Spark-free.

Why it exists here: ``agg.column_distinct`` ships per-block distinct
SETS through the shuffle, which is exactly right for low-cardinality
columns (a dictionary block's uniques are already computed) and
degenerates to n_rows shuffled values on high-cardinality ones.  The
sketch caps the per-task payload at m = 2^p bytes regardless of
cardinality — the constant-size partial a 100 TB COUNT(DISTINCT)
needs.  Standard error ~ 1.04 / sqrt(m) (p=14 -> ~0.8%).

The reference has no sketches at all; this follows the published
algorithm (the task brief's "novel sketch" slot).  Hashing: 64-bit
values mix through splitmix64 (public constant set, Steele et al.);
byte values hash with blake2b-8 over the block's UNIQUES only (distinct
counting lets us dedupe BEFORE hashing, so the per-row Python cost is
bounded by per-block distinct count, and dictionary blocks hand their
uniques over for free).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — a full-avalanche
    64-bit mix (public-domain constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def hash_fixed(values: np.ndarray) -> np.ndarray:
    """64-bit hashes of a fixed-width numeric array (any dtype <= 8 B):
    reinterpret the value bits as uint64 and mix."""
    v = np.asarray(values)
    if v.dtype.itemsize < 8:
        # widen via the integer value (floats first through their bits)
        if v.dtype.kind == "f":
            v = v.astype(np.float64)
            u = v.view(np.uint64)
        else:
            u = v.astype(np.int64).view(np.uint64)
    elif v.dtype.kind == "f":
        u = v.view(np.uint64)
    else:
        u = v.view(np.uint64) if v.dtype != np.uint64 else v
    return splitmix64(np.ascontiguousarray(u))


def hash_bytes(uniques) -> np.ndarray:
    """64-bit blake2b hashes of an iterable of byte strings (call with a
    block's UNIQUES, never its rows)."""
    out = np.empty(len(uniques), dtype=np.uint64)
    for i, b in enumerate(uniques):
        out[i] = int.from_bytes(
            hashlib.blake2b(b, digest_size=8).digest(), "little")
    return out


def empty_registers(p: int) -> np.ndarray:
    if not 4 <= p <= 18:
        raise ValueError(f"HLL precision must be 4..18, got {p}")
    return np.zeros(1 << p, dtype=np.uint8)


def update(registers: np.ndarray, hashes: np.ndarray) -> None:
    """Fold 64-bit hashes into the registers in place: top p bits pick
    the register, rho = leading-zero count of the remaining 64-p bits
    plus one."""
    m = len(registers)
    p = int(m).bit_length() - 1
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) & _MASK
    # rho: position of the highest set bit from the left, 1-based;
    # all-zero rest -> 64 - p + 1
    nz = rest != 0
    rho = np.full(len(hashes), 64 - p + 1, dtype=np.uint8)
    if nz.any():
        # exact clz64 via 32-bit halves: float64 represents every 32-bit
        # int exactly, so floor(log2) is safe (uint64 -> float64 is NOT:
        # values near 2^64 round across the power-of-two boundary)
        r = rest[nz]
        hi = (r >> np.uint64(32)).astype(np.float64)
        lo = (r & np.uint64(0xFFFFFFFF)).astype(np.float64)
        clz = np.where(
            hi > 0,
            31 - np.floor(np.log2(np.maximum(hi, 1.0))),
            32 + (31 - np.floor(np.log2(np.maximum(lo, 1.0)))))
        rho[nz] = (clz + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rho)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) != len(b):
        raise ValueError("register width mismatch")
    return np.maximum(a, b)


def estimate(registers: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range correction
    (linear counting when E <= 2.5m and empty registers exist)."""
    m = len(registers)
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.709
    e = alpha * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    zeros = int(np.count_nonzero(registers == 0))
    if e <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(e)
