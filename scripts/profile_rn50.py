#!/usr/bin/env python
"""Per-stage forward AND backward profile of the RN50 vision tower.

Builds truncated towers (stem, stem+layer1, ..., full+attnpool) and
times forward and forward+backward for each; successive differences
attribute wall time per stage for both passes.  This is the measured
evidence for where the RN50 step's backward milliseconds go (the
reference's default model, experiment_*.yaml `model: "RN50"`).

Usage: python scripts/profile_rn50.py [--batch 256] [--stages all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))


def fence(x):
    return float(np.asarray(x).ravel()[0])


def timed(fn, *args, steps=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--stem-only", action="store_true",
                    help="profile just the stem stage")
    args = ap.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.models.resnet import (
        AttentionPool2d,
        BatchNormHalf,
        Bottleneck,
    )

    dtype = jnp.bfloat16

    class Truncated(nn.Module):
        """ModifiedResNet truncated after `upto` stages.

        upto: 0=stem only, 1..4 = through layer{upto}, 5 = + attnpool.
        Mirrors models/resnet.py::ModifiedResNet exactly.
        """

        upto: int
        layers = (3, 4, 6, 3)
        width = 64

        @nn.compact
        def __call__(self, x, train=True):
            def bn(name):
                return BatchNormHalf(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=dtype, name=name,
                )

            x = x.astype(dtype)
            x = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=dtype, name="stem_conv1")(x)
            x = nn.relu(bn("stem_bn1")(x))
            x = nn.Conv(32, (3, 3), padding=1, use_bias=False,
                        dtype=dtype, name="stem_conv2")(x)
            x = nn.relu(bn("stem_bn2")(x))
            x = nn.Conv(64, (3, 3), padding=1, use_bias=False,
                        dtype=dtype, name="stem_conv3")(x)
            x = nn.relu(bn("stem_bn3")(x))
            x = nn.avg_pool(x, (2, 2), (2, 2))
            planes = 64
            for stage, blocks in enumerate(self.layers):
                if stage + 1 > self.upto:
                    return x
                stride = 1 if stage == 0 else 2
                for block in range(blocks):
                    x = Bottleneck(
                        planes=planes, stride=stride if block == 0 else 1,
                        dtype=dtype, name=f"layer{stage + 1}_block{block}",
                    )(x, train=train)
                planes *= 2
            if self.upto >= 5:
                x = AttentionPool2d(embed_dim=2048, num_heads=32,
                                    output_dim=1024, dtype=dtype,
                                    name="attnpool")(x)
            return x

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((args.batch, 224, 224, 3)), jnp.float32)

    names = ["stem"] if args.stem_only else [
        "stem", "layer1", "layer2", "layer3", "layer4", "attnpool"]
    out = {"batch": args.batch, "backend": jax.default_backend(), "stages": {}}
    prev_f = prev_g = 0.0
    for upto, name in enumerate(names):
        model = Truncated(upto=upto)
        variables = model.init(jax.random.PRNGKey(0), images[:2], train=True)

        @jax.jit
        def fwd(v, x):
            y, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def fwdbwd(v, x):
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
