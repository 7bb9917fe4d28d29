"""memutil.trimmed contract: batches pass through untouched and the
trim runs exactly once per task stream — on exhaustion AND on error."""

from __future__ import annotations

import pytest

from boltspark.engine import memutil


def test_trimmed_passes_batches_and_trims_once(monkeypatch):
    calls = []
    monkeypatch.setattr(memutil, "trim_task_memory", lambda: calls.append(1))

    @memutil.trimmed
    def gen(batches):
        for b in batches:
            yield b * 2

    out = list(gen([1, 2, 3]))
    assert out == [2, 4, 6]
    assert calls == [1]


def test_trimmed_trims_on_error(monkeypatch):
    calls = []
    monkeypatch.setattr(memutil, "trim_task_memory", lambda: calls.append(1))

    @memutil.trimmed
    def gen(batches):
        yield next(iter(batches))
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        list(gen([1]))
    assert calls == [1]


def test_trim_task_memory_is_callable_and_safe():
    # must never raise, whatever the platform provides
    memutil.trim_task_memory()
    memutil.trim_task_memory()
