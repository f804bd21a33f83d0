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
# than a real program bug.  Matched against "TypeName: message".  Every
# entry is a marker of the transport/RPC layer specifically — a bare
# "INTERNAL: " prefix is NOT enough (XLA miscompiles and backend bugs also
# carry it, and retrying those burns minutes-long warmups 3x before
# surfacing a deterministic failure).
_TRANSIENT_MARKERS = (
    # observed on the axon tunnel (round 2/3): RPC dropped mid-compile
    "remote_compile",
    "response body closed",
    # gRPC/stream transport failures
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED: Attempting to reserve",  # transient HBM contention
    "Connection reset",
    "Broken pipe",
    "Socket closed",
    "socket closed",
    "connection closed",
    "connection reset",
    "stream removed",
    "RST_STREAM",
    "GOAWAY",
    "EOF occurred",
    "failed to connect",
    "Transport closed",
    "premature end of stream",
)


def _deterministic_classes():
    """Exception classes that are always program bugs, never transient —
    matched by isinstance (not name) so subclasses are covered too."""
    classes = [TypeError, ValueError, KeyError, IndexError, AttributeError,
               AssertionError, NotImplementedError]
    try:  # jax trace-time user errors (ConcretizationTypeError,
        # TracerArrayConversionError, ... all subclass JAXTypeError).
        # jax runtime errors are NOT listed — those can be transport drops.
        import jax.errors
        classes.append(jax.errors.JAXTypeError)
    except Exception:  # pragma: no cover — jax is always present here
        pass
    return tuple(classes)


def is_transient(exc: BaseException) -> bool:
    """True if `exc` looks like a transient backend/RPC failure worth a
    retry (vs a deterministic program error that would fail again)."""
    if isinstance(exc, _deterministic_classes()):
        return False
    text = f"{type(exc).__name__}: {exc}"
    return any(m in text for m in _TRANSIENT_MARKERS)


def retry_transient(fn: Callable[[], T], attempts: int = 3,
                    sleep_s: float = 5.0,
                    cleanup: Optional[Callable[[], None]] = None,
                    label: str = "operation",
                    stats: Optional[dict] = None) -> T:
    """Run `fn()`; on a transient failure, run `cleanup()` (if given),
    sleep, and retry up to `attempts` total tries.  Non-transient errors
    and the final failure propagate.

    `fn` must be safe to re-run from scratch (it should rebuild any state
    that the failed attempt may have left donated/partial).

    If `stats` is given, it is filled with {"attempts": tries used,
    "transient_errors": [str, ...]} — bench.py records this in its JSON so
    a "passed on retry" run is distinguishable from a clean one."""
    last: Optional[BaseException] = None
    errors: list = []
    if stats is not None:
        stats["attempts"] = 0
        stats["transient_errors"] = errors
    for attempt in range(1, attempts + 1):
        if stats is not None:
            stats["attempts"] = attempt
        try:
            return fn()
        except BaseException as e:  # noqa: BLE001 — classified below
            if isinstance(e, (KeyboardInterrupt, SystemExit)):
                raise
            if attempt >= attempts or not is_transient(e):
                raise
            last = e
            errors.append(f"{type(e).__name__}: {e}"[:300])
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
