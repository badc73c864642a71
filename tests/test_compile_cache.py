"""Persistent XLA compilation cache (ast_tpu/utils/compile_cache.py).

The reference recompiles everything per process (Chainer define-by-run
has no cross-process compile artifact at all); here re-runs / resumes /
post-training decode passes reload compiled executables from
``extras.compile_cache``.  These tests pin the resolution rules
in-process and the actual cross-process reload in subprocesses.
"""

import os
import subprocess
import sys

import pytest

import ast_tpu.utils.compile_cache as cc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _reset_module_state(monkeypatch):
    monkeypatch.setattr(cc, "_enabled_dir", None)
    monkeypatch.delenv("AST_TPU_COMPILE_CACHE", raising=False)
    yield
    # do not leave the session-wide jax config pointing into a tmpdir
    import jax
    jax.config.update("jax_compilation_cache_dir", None)


def test_disabled_by_setting(tmp_path):
    # opt-in: the no-argument call (and explicit disables) never touch jax
    assert cc.enable_compile_cache() is None
    assert cc.enable_compile_cache(False) is None
    assert cc.enable_compile_cache("off") is None
    assert cc.enable_compile_cache("") is None


def test_env_disable_wins_over_config(tmp_path, monkeypatch):
    monkeypatch.setenv("AST_TPU_COMPILE_CACHE", "0")
    assert cc.enable_compile_cache(str(tmp_path / "cfg")) is None


def test_env_path_wins_over_config(tmp_path, monkeypatch):
    env_dir = tmp_path / "envdir"
    monkeypatch.setenv("AST_TPU_COMPILE_CACHE", str(env_dir))
    got = cc.enable_compile_cache(str(tmp_path / "cfgdir"))
    assert got == str(env_dir)
    assert env_dir.is_dir()

    import jax
    assert jax.config.jax_compilation_cache_dir == str(env_dir)


def test_explicit_path_and_idempotence(tmp_path):
    d1 = str(tmp_path / "one")
    assert cc.enable_compile_cache(d1) == d1
    # second call (different path) keeps the first resolved dir
    assert cc.enable_compile_cache(str(tmp_path / "two")) == d1


def test_default_path_under_home(monkeypatch, tmp_path):
    monkeypatch.setenv("HOME", str(tmp_path))
    got = cc.enable_compile_cache(True)
    assert got == str(tmp_path / ".cache" / "ast_tpu" / "xla")
    assert os.path.isdir(got)


_CHILD = r"""
import logging, sys
logging.basicConfig(level=logging.DEBUG)
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from ast_tpu.utils.compile_cache import enable_compile_cache
assert enable_compile_cache() == {cache!r}
import jax.numpy as jnp
f = jax.jit(lambda x: (x @ x).sum() * 2.5)
print("RESULT", float(f(jnp.ones((32, 32)))))
"""


def test_cross_process_cache_hit(tmp_path):
    """Second process reloads the first process's compiled executable:
    the persistent-cache 'hit' log line appears for the jitted program
    and the numerical result is identical."""
    cache = str(tmp_path / "xla")
    env = dict(os.environ,
               AST_TPU_COMPILE_CACHE=cache,
               AST_TPU_COMPILE_CACHE_MIN_S="0")
    env.pop("JAX_PLATFORMS", None)
    script = _CHILD.format(repo=REPO, cache=cache)

    runs = []
    for _ in range(2):
        p = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=300)
        assert p.returncode == 0, p.stderr[-2000:]
        runs.append(p)

    assert os.listdir(cache), "first run must write cache entries"
    r0 = [l for l in runs[0].stdout.splitlines() if l.startswith("RESULT")]
    r1 = [l for l in runs[1].stdout.splitlines() if l.startswith("RESULT")]
    assert r0 == r1 == ["RESULT 81920.0"]
    assert "Persistent compilation cache hit for 'jit__lambda'" in (
        runs[1].stdout + runs[1].stderr), \
        "second process must reload the compiled lambda from the cache"
