"""Quantile-summary kernel tests (Spark-free): exactness below k
distinct, rank-error bounds after two-level merge, weighted (rle-shape)
inputs, weight conservation, determinism, and edge cases."""

from __future__ import annotations

import numpy as np
import pytest

from boltspark.kernels import quantile as q


def test_exact_when_distinct_below_k():
    v, w = q.summarize(np.array([5, 1, 3, 1, 5, 5]), k=16)
    assert list(v) == [1, 3, 5]
    assert list(w) == [2, 1, 3]


def test_weight_is_conserved(rng):
    data = rng.normal(size=50_000)
    v, w = q.summarize(data, k=256)
    assert len(v) <= 256
    assert w.sum() == pytest.approx(50_000)
    wts = rng.integers(1, 100, size=1000).astype(np.float64)
    v, w = q.summarize(rng.normal(size=1000), wts, k=64)
    assert w.sum() == pytest.approx(wts.sum())


@pytest.mark.parametrize("p", [0.01, 0.25, 0.5, 0.9, 0.99])
def test_rank_error_after_two_level_merge(rng, p):
    data = rng.normal(size=200_000)
    summaries = [q.summarize(b, k=256) for b in np.array_split(data, 98)]
    mid = q.merge(summaries, k=4096)  # task-level compaction
    v, w = q.merge([mid], k=None)     # final fold
    est = q.quantile(v, w, p)[0]
    rank = (data <= est).mean()
    assert abs(rank - p) < 0.01


def test_weighted_rle_shape_is_exact():
    vals = np.array([10.0, 20.0, 30.0])
    wts = np.array([100.0, 300.0, 600.0])
    v, w = q.summarize(vals, wts, k=16)
    # cum weights 100, 400, 1000; rank 0.5 * 1000 = 500 -> value 30
    assert q.quantile(v, w, [0.1, 0.4, 0.5])[0] == 10.0
    assert q.quantile(v, w, 0.4)[0] == 20.0
    assert q.quantile(v, w, 0.5)[0] == 30.0


def test_merge_and_summarize_deterministic(rng):
    data = rng.normal(size=5000)
    a = q.summarize(data, k=64)
    b = q.summarize(data.copy(), k=64)
    assert np.array_equal(a[0], b[0])
    assert np.array_equal(a[1], b[1])


def test_edges():
    v, w = q.summarize(np.array([]), k=4)
    assert len(v) == 0
    assert np.isnan(q.quantile(v, w, 0.5)[0])
    assert len(q.merge([])[0]) == 0
    with pytest.raises(ValueError):
        q.summarize(np.array([1.0]), k=0)
    with pytest.raises(ValueError):
        q.quantile(np.array([1.0]), np.array([1.0]), 1.5)
    with pytest.raises(ValueError):
        q.summarize(np.array([1.0, 2.0]), np.array([1.0]), k=4)
    # single value answers every probability
    v, w = q.summarize(np.array([42.0]), k=4)
    assert (q.quantile(v, w, [0.0, 0.5, 1.0]) == 42.0).all()
