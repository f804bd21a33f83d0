"""Transient-failure retry (nice_slam_tpu/utils/retry.py) — the failure
class that killed round 2's benchmark artifact (a remote_compile RPC drop).
The reference has no failure handling (SURVEY §5)."""

import pytest

from nice_slam_tpu.utils.retry import is_transient, retry_transient


class FakeJaxRuntimeError(Exception):
    pass


def test_remote_compile_drop_is_transient():
    e = FakeJaxRuntimeError(
        "INTERNAL: remote_compile: response body closed")
    assert is_transient(e)


@pytest.mark.parametrize("msg", [
    "UNAVAILABLE: socket closed",
    "DEADLINE_EXCEEDED: timed out waiting for compile",
    "Connection reset by peer",
])
def test_rpc_failures_are_transient(msg):
    assert is_transient(FakeJaxRuntimeError(msg))


def test_program_errors_are_not_transient():
    assert not is_transient(ValueError("bad shape"))
    assert not is_transient(TypeError("INTERNAL: looks scary but typed"))
    assert not is_transient(FakeJaxRuntimeError("NaN encountered in loss"))


@pytest.mark.parametrize("msg", [
    # a bare INTERNAL prefix is no longer a transient marker: XLA
    # miscompiles / backend bugs carry it too, and retrying those burns
    # minutes-long warmups before surfacing a deterministic failure
    "INTERNAL: Generated function failed: CpuCallback error",
    "INTERNAL: during context [hlo verifier]: unexpected shape",
    "INTERNAL: RET_CHECK failure in tiling assignment",
])
def test_internal_miscompiles_are_not_transient(msg):
    assert not is_transient(FakeJaxRuntimeError(msg))


def test_deterministic_classes_win_over_markers():
    # isinstance-based, not name-based: subclasses of deterministic error
    # classes stay non-transient even when the message carries a marker
    class ShapeBug(ValueError):
        pass

    assert not is_transient(ShapeBug("UNAVAILABLE: socket closed"))
    import jax.errors
    assert not is_transient(
        jax.errors.ConcretizationTypeError.__new__(
            jax.errors.ConcretizationTypeError))


def test_retry_stats_recorded():
    calls = {"n": 0}
    stats = {}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise FakeJaxRuntimeError("UNAVAILABLE: stream removed")
        return "ok"

    assert retry_transient(flaky, attempts=3, sleep_s=0.0,
                           stats=stats) == "ok"
    assert stats["attempts"] == 2
    assert len(stats["transient_errors"]) == 1
    assert "stream removed" in stats["transient_errors"][0]


def test_retry_recovers_after_transient_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise FakeJaxRuntimeError(
                "INTERNAL: remote_compile: response body closed")
        return "ok"

    assert retry_transient(flaky, attempts=3, sleep_s=0.0) == "ok"
    assert calls["n"] == 3


def test_retry_runs_cleanup_between_attempts():
    cleaned = []

    def flaky():
        if not cleaned:
            raise FakeJaxRuntimeError("UNAVAILABLE: stream removed")
        return 42

    assert retry_transient(flaky, attempts=2, sleep_s=0.0,
                           cleanup=lambda: cleaned.append(1)) == 42
    assert cleaned == [1]


def test_retry_propagates_non_transient_immediately():
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise ValueError("real bug")

    with pytest.raises(ValueError):
        retry_transient(broken, attempts=3, sleep_s=0.0)
    assert calls["n"] == 1


def test_retry_gives_up_after_max_attempts():
    calls = {"n": 0}

    def always_down():
        calls["n"] += 1
        raise FakeJaxRuntimeError("UNAVAILABLE: backend gone")

    with pytest.raises(FakeJaxRuntimeError):
        retry_transient(always_down, attempts=3, sleep_s=0.0)
    assert calls["n"] == 3
