"""Task-memory hygiene for reused Python workers.

Spark reuses Python workers across tasks (``spark.python.worker.reuse``
default true), so each decode/encode task's peak allocations linger as
free-but-resident glibc arenas and Arrow memory-pool slabs in up to
``cores`` idle workers.  Measured on the bench host: 32 idle workers
held 5.7 GB aggregate RSS after one full-corpus decode, which pushed
the machine into its parallel-memcpy collapse envelope
(BENCH/BASELINE.md) and slowed an UNRELATED JVM-side parquet write
13x.  On a memory-capped multi-executor cluster the same residue eats
container headroom and invites the OOM killer between Python stages.

``trimmed`` wraps a ``mapInArrow`` generator so the worker hands freed
memory back to the OS the moment its task stream ends: Arrow pool
first (jemalloc retains freed slabs by design), then glibc
``malloc_trim``.  Cost: one pool sweep + one libc call per TASK (not
per batch) — microseconds against a multi-second task.
"""

from __future__ import annotations

import functools

_libc = None


def _get_libc():
    global _libc
    if _libc is None:
        try:
            import ctypes

            _libc = ctypes.CDLL("libc.so.6")
        except OSError:  # non-glibc platform: Arrow trim still applies
            _libc = False
    return _libc


def trim_task_memory() -> None:
    """Release freed-but-resident memory back to the OS (best effort)."""
    try:
        import pyarrow as pa

        pa.default_memory_pool().release_unused()
    except Exception:
        pass
    libc = _get_libc()
    if libc:
        try:
            libc.malloc_trim(0)
        except Exception:
            pass


def trimmed(gen_fn):
    """Wrap a mapInArrow generator: trim worker memory when the task's
    batch stream ends (including on error), so reused workers do not
    accumulate resident arenas across tasks."""

    @functools.wraps(gen_fn)
    def _gen(batches):
        try:
            yield from gen_fn(batches)
        finally:
            trim_task_memory()

    return _gen
