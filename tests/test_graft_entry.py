"""Driver entry-point plumbing that must not depend on a live TPU.

``dryrun_multichip`` probes the default-platform device count to decide
between the in-process mesh and the virtual-CPU subprocess path.  On
this machine an in-process ``jax.devices()`` initializes the remote-TPU
backend and blocks FOREVER when the tunnel is down (observed multi-hour
outage 2026-08-17/18) — and it blocks while holding jax's backend lock,
so even a daemon-thread probe would wedge every later jax call in the
process.  The probe therefore runs in a SUBPROCESS unless the CPU
platform is already forced; these tests pin that contract.
"""

import subprocess
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

import __graft_entry__ as graft  # noqa: E402


def test_probe_in_process_when_cpu_forced(monkeypatch):
    # conftest forces JAX_PLATFORMS=cpu, so the in-process branch is the
    # live one here; it must not spawn a subprocess
    def no_subprocess(*a, **k):
        raise AssertionError("cpu-forced probe must stay in-process")

    monkeypatch.setattr(graft.subprocess, "run", no_subprocess)
    monkeypatch.setattr(jax, "devices", lambda: [object()] * 3)
    assert graft._cpu_forced()
    assert graft._probe_device_count(timeout_s=5.0) == 3


def test_probe_subprocess_parses_count(monkeypatch):
    monkeypatch.setattr(graft, "_cpu_forced", lambda: False)

    def fake_run(cmd, **kw):
        return subprocess.CompletedProcess(
            cmd, 0, stdout="some backend warning\nNDEV 4\n", stderr="")

    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    assert graft._probe_device_count(timeout_s=5.0) == 4


def test_probe_times_out_on_hung_backend(monkeypatch):
    # a dead tunnel hangs the probe subprocess; the probe must report 0
    # (-> virtual-CPU path) instead of hanging the caller
    monkeypatch.setattr(graft, "_cpu_forced", lambda: False)

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    assert graft._probe_device_count(timeout_s=0.3) == 0


def test_probe_swallows_backend_errors(monkeypatch):
    monkeypatch.setattr(graft, "_cpu_forced", lambda: False)

    def fake_run(cmd, **kw):
        return subprocess.CompletedProcess(
            cmd, 1, stdout="", stderr="FAILED_PRECONDITION: TPU error")

    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    assert graft._probe_device_count(timeout_s=5.0) == 0
