"""Driver entry-point plumbing that must not depend on a live TPU.

``dryrun_multichip`` probes ``len(jax.devices())`` to decide between the
in-process mesh and the virtual-CPU subprocess path.  On this machine
that call initializes the remote-TPU backend and blocks FOREVER when the
tunnel is down (observed multi-hour outage 2026-08-17/18), so the probe
runs behind a daemon-thread timeout — these tests pin that behavior.
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

import __graft_entry__ as graft  # noqa: E402


def test_probe_returns_device_count(monkeypatch):
    monkeypatch.setattr(jax, "devices", lambda: [object()] * 3)
    assert graft._probe_device_count(timeout_s=5.0) == 3


def test_probe_times_out_on_hung_backend(monkeypatch):
    def hang():
        time.sleep(60)
        return [object()]

    monkeypatch.setattr(jax, "devices", hang)
    t0 = time.monotonic()
    assert graft._probe_device_count(timeout_s=0.3) == 0
    assert time.monotonic() - t0 < 5.0  # returned at the timeout, no hang


def test_probe_swallows_backend_errors(monkeypatch):
    def boom():
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    monkeypatch.setattr(jax, "devices", boom)
    assert graft._probe_device_count(timeout_s=5.0) == 0
