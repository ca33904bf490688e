"""Tests for the shared benchmarking plumbing in scripts/_bench.py.

The benches drive the real TPU through the axon tunnel, whose backend
init can transiently fail; ``wait_for_backend`` is the retry shim that
keeps an end-of-round bench run from dying before doing any work (it
killed two round-4 ``bench_system`` attempts).  These tests pin the
retry policy without touching a backend: transient UNAVAILABLE errors
are retried, anything else re-raises immediately.
"""

import importlib.util
import os

import jax
import pytest


def _load_bench():
    path = os.path.join(
        os.path.dirname(__file__), os.pardir, "scripts", "_bench.py"
    )
    spec = importlib.util.spec_from_file_location("_bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_wait_for_backend_retries_transient_unavailable(monkeypatch):
    bench = _load_bench()
    calls = {"n": 0}

    def flaky_devices():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE: "
                "TPU backend setup/compile error (Unavailable)."
            )
        return ["dev0"]

    monkeypatch.setattr(jax, "devices", flaky_devices)
    assert bench.wait_for_backend(retries=5, sleep_s=0.0) == ["dev0"]
    assert calls["n"] == 3


def test_wait_for_backend_exhausts_retries(monkeypatch):
    bench = _load_bench()

    def always_down():
        raise RuntimeError("UNAVAILABLE: worker restarting")

    monkeypatch.setattr(jax, "devices", always_down)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench.wait_for_backend(retries=2, sleep_s=0.0)


def test_wait_for_backend_reraises_non_transient(monkeypatch):
    bench = _load_bench()
    calls = {"n": 0}

    def broken():
        calls["n"] += 1
        raise RuntimeError("INVALID_ARGUMENT: bad topology")

    monkeypatch.setattr(jax, "devices", broken)
    with pytest.raises(RuntimeError, match="INVALID_ARGUMENT"):
        bench.wait_for_backend(retries=5, sleep_s=0.0)
    assert calls["n"] == 1  # no retry on non-transient errors
