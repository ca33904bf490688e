"""Test env setup: run JAX on CPU with 8 fake devices.

Must run before the first ``import jax`` anywhere in the test session
(SURVEY.md §4d: the fake-device mesh substitutes for multi-chip
hardware; the driver separately dry-runs the multi-chip path).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # On this 1-core box a fake-device thread can miss XLA's default 30 s
    # collective rendezvous deadline under late-suite thread contention,
    # and XLA hard-exits the process ("Termination timeout ... exceeded.
    # Exiting to ensure a consistent program state.") — seen at
    # test_train::test_loss_decreases_on_fixed_batch in whole-suite runs.
    # Raise the deadline so starvation means slowness, not SIGABRT.
    _flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    )
os.environ["XLA_FLAGS"] = _flags
# Synchronous CPU dispatch: with async dispatch (the default), a fetch
# of one device's output lets the host enqueue the NEXT multi-device
# program while other device threads still run the previous one; late
# in the suite that overlap deadlocks XLA's in-process collective
# rendezvous (threads parked at different collectives, 0% CPU) and the
# 30 s rendezvous terminate SIGABRTs the whole run — the
# test_train::test_loss_decreases_on_fixed_batch whole-suite crash.
# One-core CPU meshes get no real overlap benefit anyway.
os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "0")

# The axon sitecustomize (TPU tunnel) can override JAX_PLATFORMS at
# interpreter startup; force the config back to CPU before any backend
# initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The env var above is read at jax-import time, and the axon
# sitecustomize imports jax at interpreter start — BEFORE this file
# runs — so the setting must also land through config.update (effective
# any time before the CPU client is created).  Honor an explicit env
# override (JAX_CPU_ENABLE_ASYNC_DISPATCH=1 reproduces the async-
# dispatch overlap for deadlock forensics).
jax.config.update(
    "jax_cpu_enable_async_dispatch",
    os.environ["JAX_CPU_ENABLE_ASYNC_DISPATCH"] == "1",
)

# Persistent XLA compile cache for the test mesh (gitignored): the
# suite is compile-bound on this 1-core box (~20-26 min fast profile,
# most of it XLA CPU compiles of near-identical train steps), and cache
# keys hash the post-jax-level HLO, so code changes miss cleanly.
# First run pays full price; repeat runs skip every >2 s compile.
# Disable with SPARSIFY_TEST_NO_CACHE=1 (e.g. to time a cold run).
if not os.environ.get("SPARSIFY_TEST_NO_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                              ".pytest_xla_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_ROOT = "/root/reference"

# --- whole-suite deadlock forensics (cheap; keep) -------------------
# Appends a per-module native/python thread census to
# $SPARSIFY_THREAD_CENSUS (no-op unless set).  Used to hunt pool-thread
# leaks that starve XLA's 8-way in-process collective rendezvous.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _thread_census(request):
    yield
    path = os.environ.get("SPARSIFY_THREAD_CENSUS")
    if not path:
        return
    import threading

    try:
        native = len(os.listdir("/proc/self/task"))
        names = ",".join(sorted(t.name for t in threading.enumerate()))
        with open(path, "a") as f:
            f.write(
                f"{request.module.__name__} native={native} "
                f"python={threading.active_count()} [{names}]\n"
            )
    except OSError:
        pass


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
