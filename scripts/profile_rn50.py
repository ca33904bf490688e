#!/usr/bin/env python
"""Per-stage forward AND backward profile of the RN50 vision tower.

Builds truncated towers via ``ModifiedResNet(stop_after=...)`` — the
REAL module, so model changes (BN fold, remat, stem tweaks) are always
reflected — and times forward and forward+backward for each;
successive differences attribute wall time per stage for both passes.
This is the measured evidence for where the RN50 step's backward
milliseconds go (the reference's default model,
experiment_*.yaml `model: "RN50"`).

Usage: python scripts/profile_rn50.py [--batch 256]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from _bench import fence, timed  # noqa: E402  (shared fenced timing)


def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--stem-only", action="store_true",
                    help="profile just the stem stage")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.models.resnet import ModifiedResNet

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((args.batch, 224, 224, 3)), jnp.float32)

    names = ["stem"] if args.stem_only else [
        "stem", "layer1", "layer2", "layer3", "layer4", "attnpool"]
    out = {"batch": args.batch, "backend": jax.default_backend(), "stages": {}}
    prev_f = prev_g = 0.0
    for upto, name in enumerate(names):
        model = ModifiedResNet(
            dtype=jnp.bfloat16,
            stop_after=None if upto >= 5 else upto,
        )
        variables = model.init(jax.random.PRNGKey(0), images[:2], train=True)

        @jax.jit
        def fwd(v, x, model=model):
            y, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def fwdbwd(v, x, model=model):
            def loss(p):
                y, _ = model.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(y.astype(jnp.float32))

            l, g = jax.value_and_grad(loss)(v["params"])
            return l + jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)), g,
                jnp.float32(0.0))

        tf = timed(fwd, variables, images, steps=args.steps)
        tg = timed(fwdbwd, variables, images, steps=args.steps)
        out["stages"][name] = {
            "fwd_cum_ms": round(tf * 1e3, 2),
            "fwdbwd_cum_ms": round(tg * 1e3, 2),
            "fwd_delta_ms": round((tf - prev_f) * 1e3, 2),
            "fwdbwd_delta_ms": round((tg - prev_g) * 1e3, 2),
        }
        prev_f, prev_g = tf, tg
        print(json.dumps({name: out["stages"][name]}), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
