"""Persistent XLA compilation cache knob (compilation_cache_dir):
cli.enable_compilation_cache points jax at a disk cache so process
restarts skip recompiles (the 40-90 s/step lever on remote TPU)."""

import glob
import os

import jax
import jax.numpy as jnp

from sparsify_clip_tpu.cli import enable_compilation_cache
from sparsify_clip_tpu.config import ExperimentConfig


def _config(**kw):
    base = dict(
        model="tiny-test", batch_size=8, epochs=1, learning_rate=1e-3,
        loss_type="anchor", fp16=False,
    )
    base.update(kw)
    return ExperimentConfig.from_dict(base)


def test_disabled_by_default_is_noop():
    before = jax.config.jax_compilation_cache_dir
    enable_compilation_cache(_config())
    assert jax.config.jax_compilation_cache_dir == before


def test_enables_and_populates_cache(tmp_path):
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cache = str(tmp_path / "xla-cache")
    try:
        enable_compilation_cache(_config(compilation_cache_dir=cache))
        assert jax.config.jax_compilation_cache_dir == os.path.abspath(cache)
        assert os.path.isdir(cache)
        # tiny compiles are below the default write threshold
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

        @jax.jit
        def probe(x):
            return jnp.cos(x) * 9183.25 + x ** 2  # unique HLO for this test

        probe(jnp.arange(16.0)).block_until_ready()
        assert glob.glob(os.path.join(cache, "*")), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
