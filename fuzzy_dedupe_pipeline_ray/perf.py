"""Process-local performance tuning.

``tune_allocator()`` raises glibc's mmap + trim thresholds so large numpy
temporaries are served from the (page-warm) heap instead of fresh
``mmap``/``munmap`` pairs. On this class of VM a first-touch page fault
costs ~0.25 ms in a process with a large memory map, and glibc's default
behavior (mmap every allocation > 128 KB, return it on free) makes EVERY
vectorized driver-side pass re-fault its working set — observed 10-30×
slowdowns of pure-numpy kernels after the object store has grown. Keeping
the pages resident turns repeated multi-MB temporaries into ~ms work.

Safe no-op on non-glibc platforms. Idempotent.
"""

from __future__ import annotations

_TUNED = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_allocator(threshold_bytes: int = 1 << 30) -> bool:
    """Idempotently raise glibc malloc thresholds; returns True if applied.

    Also pins numpy's ``over="ignore"`` errstate for the process (see
    ``hashing.pin_overflow_ignore`` — removes the per-kernel-call errstate
    enter/exit, a measured 28% of the fingerprint hot loop)."""
    from fuzzy_dedupe_pipeline_ray.functions.hashing import pin_overflow_ignore

    pin_overflow_ignore()
    global _TUNED
    if _TUNED:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, threshold_bytes) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, threshold_bytes) == 1)
    except Exception:  # noqa: BLE001 — musl/macOS/etc: silently skip
        ok = False
    _TUNED = ok
    return ok


def host_phase_probe(size_mb: int = 400) -> float:
    """Seconds to first-touch ``size_mb`` of FRESH anonymous memory — the
    host-phase signal BASELINE.md's measurement methodology is built on
    (calm < ~2 s; degraded phases observed up to 120 s on this VM class).

    Uses ``mmap`` directly so the probe bypasses the (deliberately
    heap-retaining, see ``tune_allocator``) malloc pools and always pays
    the first-touch fault per page. Pages are returned on close, so the
    probe does not perturb what it measures."""
    import mmap
    import time

    n = size_mb << 20
    m = mmap.mmap(-1, n)
    try:
        t0 = time.perf_counter()
        for off in range(0, n, 4096):  # one write per page
            m[off] = 1
        return time.perf_counter() - t0
    finally:
        m.close()
