"""HyperLogLog kernel tests (Spark-free): rho exactness against a pure-
Python reference, merge semantics, duplicate invariance, and estimate
accuracy at small (linear-counting) and large (raw-HLL) cardinalities."""

from __future__ import annotations

import numpy as np
import pytest

from boltspark.kernels import hll

MASK = (1 << 64) - 1


def _registers_ref(hashes: list[int], p: int) -> np.ndarray:
    """Bit-exact reference: per-hash register index + rho via Python int
    arithmetic (no float anywhere)."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    for h in hashes:
        idx = h >> (64 - p)
        rest = (h << p) & MASK
        rho = (64 - p + 1) if rest == 0 else (64 - rest.bit_length() + 1)
        regs[idx] = max(regs[idx], rho)
    return regs


@pytest.mark.parametrize("p", [4, 10, 14])
def test_update_matches_python_reference(p, rng):
    edge = np.array(
        [0, 1, 2, 3, 1 << 63, (1 << 64) - 1, (1 << 64) - 2,
         1 << (63 - p), (1 << (63 - p)) - 1, (1 << p) - 1,
         0xFFFFFFFF00000000, 0x00000000FFFFFFFF, 1 << 32, (1 << 32) - 1],
        dtype=np.uint64)
    rand = rng.integers(0, 1 << 64, size=5000, dtype=np.uint64)
    hashes = np.concatenate([edge, rand])
    regs = hll.empty_registers(p)
    hll.update(regs, hashes)
    ref = _registers_ref([int(h) for h in hashes], p)
    assert np.array_equal(regs, ref)


def test_merge_equals_single_pass(rng):
    h = hll.splitmix64(np.arange(20000, dtype=np.uint64))
    a = hll.empty_registers(12)
    b = hll.empty_registers(12)
    both = hll.empty_registers(12)
    hll.update(a, h[:9000])
    hll.update(b, h[9000:])
    hll.update(both, h)
    assert np.array_equal(hll.merge(a, b), both)
    with pytest.raises(ValueError):
        hll.merge(a, hll.empty_registers(11))


def test_duplicates_do_not_move_the_estimate():
    h = hll.hash_fixed(np.arange(1000, dtype=np.int64))
    once = hll.empty_registers(14)
    hll.update(once, h)
    many = hll.empty_registers(14)
    for _ in range(5):
        hll.update(many, np.tile(h, 3))
    assert np.array_equal(once, many)


@pytest.mark.parametrize("n,rel", [(300, 0.01), (5000, 0.02), (200000, 0.02)])
def test_estimate_accuracy(n, rel):
    regs = hll.empty_registers(14)
    hll.update(regs, hll.hash_fixed(np.arange(n, dtype=np.int64)))
    assert hll.estimate(regs) == pytest.approx(n, rel=rel)


def test_estimate_empty_and_bounds():
    assert hll.estimate(hll.empty_registers(10)) == 0.0
    with pytest.raises(ValueError):
        hll.empty_registers(3)
    with pytest.raises(ValueError):
        hll.empty_registers(19)


def test_hash_fixed_widening_consistency():
    v = np.array([0, 1, -5, 1000, 2**31 - 1], dtype=np.int32)
    assert np.array_equal(hll.hash_fixed(v),
                          hll.hash_fixed(v.astype(np.int64)))
    f = np.array([0.5, -1.25, 3e8], dtype=np.float32)
    assert np.array_equal(hll.hash_fixed(f),
                          hll.hash_fixed(f.astype(np.float64)))


def test_hash_bytes_distinct_and_deterministic():
    vals = [b"", b"a", b"b", b"ab", b"a\x00b"]
    h1 = hll.hash_bytes(vals)
    h2 = hll.hash_bytes(vals)
    assert np.array_equal(h1, h2)
    assert len(set(h1.tolist())) == len(vals)
