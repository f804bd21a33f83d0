"""Transient-backend-failure detection and retry.

The reference has no failure handling at all (SURVEY §5: "no retry, no
watchdog").  On remote-attached TPU backends it is load-bearing: a single
dropped RPC during a cold compile (observed: ``INTERNAL: remote_compile:
response body closed``) otherwise kills a multi-minute run.  This module
classifies such errors and retries a rebuildable unit of work.

Used by bench.py (the judged benchmark) and run.py (full runs).
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Optional, TypeVar

T = TypeVar("T")

# substrings that mark an error as a transient backend/RPC failure rather
# than a real program bug.  Matched against "TypeName: message".
_TRANSIENT_MARKERS = (
    "remote_compile",
    "response body closed",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED: Attempting to reserve",  # transient HBM contention
    "Connection reset",
    "Broken pipe",
    "Socket closed",
    "connection closed",
    "stream removed",
    "EOF occurred",
    "failed to connect",
    "INTERNAL: ",  # backend-internal faults (incl. remote-compile drops)
)


def is_transient(exc: BaseException) -> bool:
    """True if `exc` looks like a transient backend/RPC failure worth a
    retry (vs a deterministic program error that would fail again)."""
    text = f"{type(exc).__name__}: {exc}"
    # deterministic JAX user errors never qualify, even if the message
    # happens to contain a marker
    det = ("TracerArrayConversionError", "ConcretizationTypeError",
           "TypeError", "ValueError", "KeyError", "AssertionError")
    if type(exc).__name__ in det:
        return False
    return any(m in text for m in _TRANSIENT_MARKERS)


def retry_transient(fn: Callable[[], T], attempts: int = 3,
                    sleep_s: float = 5.0,
                    cleanup: Optional[Callable[[], None]] = None,
                    label: str = "operation") -> T:
    """Run `fn()`; on a transient failure, run `cleanup()` (if given),
    sleep, and retry up to `attempts` total tries.  Non-transient errors
    and the final failure propagate.

    `fn` must be safe to re-run from scratch (it should rebuild any state
    that the failed attempt may have left donated/partial)."""
    last: Optional[BaseException] = None
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except BaseException as e:  # noqa: BLE001 — classified below
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                raise
            if attempt >= attempts or not is_transient(e):
                raise
            last = e
            print(f"[retry] transient backend failure in {label} "
                  f"(attempt {attempt}/{attempts}): "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
            if cleanup is not None:
                try:
                    cleanup()
                except Exception:
                    pass
            time.sleep(sleep_s * attempt)
    raise last  # pragma: no cover — unreachable (final attempt raises)
