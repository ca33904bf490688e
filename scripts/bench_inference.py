#!/usr/bin/env python
"""Serving throughput: jitted encode_image / encode_text rates.

Measures the deployment path (`inference.CLIPEncoder`'s jitted
normalized-embedding encoders, eval mode / running BN stats) on
device-resident batches with a device->host fence, per model.

Usage: python scripts/bench_inference.py [--models ViT-B-32,RN50] [--batch 256]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _bench import timed  # noqa: E402  (shared fenced timing)


def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="ViT-B-32,RN50")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.inference import CLIPEncoder
    from sparsify_clip_tpu.models import create_model

    rng = np.random.default_rng(0)
    out = {"batch": args.batch, "backend": jax.default_backend(), "models": {}}

    for name in args.models.split(","):
        model, variables = create_model(name, dtype=jnp.bfloat16)
        size = model.cfg.image_size
        images = jnp.asarray(
            rng.standard_normal((args.batch, size, size, 3)), jnp.float32)
        tokens = rng.integers(
            1, model.cfg.vocab_size - 10,
            size=(args.batch, model.cfg.context_length)).astype(np.int32)
        tokens[:, 0] = model.cfg.vocab_size - 2
        tokens[:, -1] = model.cfg.vocab_size - 1
        tokens = jnp.asarray(tokens)

        # Drive the actual deployment path: CLIPEncoder's jitted
        # normalized-embedding encoders (tokenizer bypassed — tokens are
        # pre-built so only device work is timed).  The timed callables
        # reduce the (B, D) embedding to a scalar on device so the
        # timing fence transfers 4 bytes, not the whole embedding array
        # (the ~0.02-0.04 GB/s axon tunnel would otherwise sit inside
        # the timed window).
        encoder = CLIPEncoder(model, variables, tokenizer=None)

        @jax.jit
        def img_probe(v, x):
            return jnp.sum(encoder._encode_images(v, x).astype(jnp.float32))

        @jax.jit
        def txt_probe(v, t):
            return jnp.sum(encoder._encode_tokens(v, t).astype(jnp.float32))

        t_i = timed(img_probe, variables, images, steps=20, warmup=3)
        t_t = timed(txt_probe, variables, tokens, steps=20, warmup=3)
        out["models"][name] = {
            "encode_image_ms": round(t_i * 1e3, 2),
            "images_per_sec": round(args.batch / t_i, 1),
            "encode_text_ms": round(t_t * 1e3, 2),
            "texts_per_sec": round(args.batch / t_t, 1),
        }
        print(json.dumps({name: out["models"][name]}), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
