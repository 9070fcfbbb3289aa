"""bench.py tunnel-outage resilience (VERDICT r3 item 2 / weak #4).

Round-3 postmortem: the driver's bench run landed inside a tunnel outage
and bench.py died on its first backend touch, leaving BENCH_r03.json
empty.  wait_for_backend() is the fix: a bounded subprocess-probe retry
loop ahead of any in-process device contact.  These tests simulate the
failure modes (probe failures, total outage) with injected probe/sleep/
clock so no device is needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, dt):
        self.t += dt


def test_immediate_success_no_sleep():
    clock = FakeClock()
    calls = []

    def probe():
        calls.append(clock.t)
        return True

    assert bench.wait_for_backend(
        probe=probe, max_wait_s=100, interval_s=10, sleep=clock.sleep, clock=clock
    )
    assert calls == [0.0]


def test_retry_then_success():
    # Backend-init failure twice, then the tunnel returns: the loop must
    # survive the failures and report success without exhausting budget.
    clock = FakeClock()
    outcomes = iter([False, False, True])
    attempts = []

    def probe():
        attempts.append(clock.t)
        return next(outcomes)

    assert bench.wait_for_backend(
        probe=probe, max_wait_s=3600, interval_s=720, sleep=clock.sleep, clock=clock
    )
    assert attempts == [0.0, 720.0, 1440.0]


def test_bounded_give_up():
    # Total outage: must return False once the budget is exhausted, with
    # attempts spaced at interval_s (never busy-looping).
    clock = FakeClock()
    attempts = []

    def probe():
        attempts.append(clock.t)
        return False

    assert not bench.wait_for_backend(
        probe=probe, max_wait_s=1800, interval_s=720, sleep=clock.sleep, clock=clock
    )
    # attempts at 0, 720, 1440; remaining 360 < interval, final short
    # sleep lands exactly on the deadline and the loop exits False.
    assert attempts == [0.0, 720.0, 1440.0, 1800.0]
    assert clock.t == 1800.0


def test_main_aborts_when_backend_unreachable(monkeypatch):
    # Simulated backend-unavailable run: JAX_PLATFORMS unset (the driver
    # environment presets axon) + probe always failing => SystemExit(1)
    # BEFORE any jax import/device touch.
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(bench, "wait_for_backend", lambda: False)
    try:
        bench.main()
    except SystemExit as e:
        assert e.code == 1
    else:
        raise AssertionError("main() should abort when the backend is unreachable")
