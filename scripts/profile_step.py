#!/usr/bin/env python
"""Per-phase roofline profile of the flagship train step on the real chip.

Produces the measured evidence BASELINE.md's roofline table cites:

1. sustained bf16 matmul TFLOPs at the step's ACTUAL matmul shapes
   (ViT-B/32 @ bs256: M=B*L, K/N in {768, 3072} / {512, 2048});
2. XLA's own FLOP count for the compiled step (cost_analysis), which
   bounds the matmul-limited step time at each sustained rate;
3. wall times for forward-only, forward+backward, the full train step
   (incl. AdamW), and the loss block alone — all fenced with a
   device->host scalar read (axon: block_until_ready on donated
   buffers returns early).

Usage: python scripts/profile_step.py [--model ViT-B-32] [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from _bench import fence, timed  # noqa: E402  (shared fenced timing)


def matmul_sustained(jax, jnp, shapes, chain=8):
    """Sustained bf16 TFLOPs for an in-jit chain of same-shape matmuls."""
    results = {}
    for (m, k, n) in shapes:
        a = jnp.full((m, k), 1.0 / k, jnp.bfloat16)
        bs = [jnp.ones((k, n), jnp.bfloat16) for _ in range(chain)]

        @jax.jit
        def f(a, bs):
            acc = jnp.zeros((), jnp.float32)
            x = a
            for b in bs:
                x = x @ b  # (m,k)@(k,n); n==k keeps the chain square
                if x.shape[1] != a.shape[1]:
                    x = x @ b.T
                x = x * 0.5
            return x.sum() + acc

        t = timed(f, a, bs, steps=5, warmup=2)
        per_mm = 2 * m * k * n * (chain * (2 if n != k else 1))
        results[f"{m}x{k}x{n}"] = round(per_mm / t / 1e12, 1)
    return results


def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--remat", action="store_true",
                    help="per-block rematerialization (ViT-L-class memory)")
    ap.add_argument("--remat-policy", default="nothing",
                    help="selective remat policy when --remat is on "
                         "(nothing|dots|dots_no_batch|attn_out)")
    ap.add_argument("--loss", default=None,
                    help="override the exp6 loss_type (e.g. siglip — "
                         "A/Bs the loss block + full step under the "
                         "same tower)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.losses import LossContext, make_loss_fn
    from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from sparsify_clip_tpu.train import create_train_setup
    from sparsify_clip_tpu.utils.numerics import l2_normalize

    out = {"model": args.model, "batch": args.batch,
           "backend": jax.default_backend(),
           "remat": args.remat, "remat_policy": args.remat_policy,
           "loss": args.loss or "exp6"}

    # --- 1. sustained matmul rates at step-relevant shapes
    B, LV, LT = args.batch, 50, 77
    shapes = [
        (B * LV, 768, 768), (B * LV, 768, 3072),
        (B * LT, 512, 512), (B * LT, 512, 2048),
        (4096, 4096, 4096),
    ]
    out["sustained_tflops"] = matmul_sustained(jax, jnp, shapes)

    # --- 2. build the step
    from _bench import exp6_config, synthetic_batch

    loss_overrides = {}
    if args.loss:
        loss_overrides["loss_type"] = args.loss
        if args.loss == "siglip":
            # siglip carries its own learnables; exp6's warm phase and
            # temperature knobs don't apply
            loss_overrides.update(
                only_lunif_epochs=0, anchor_temperature_learnable=False)
    config = exp6_config(
        args.model, args.batch,
        remat=args.remat, remat_policy=args.remat_policy,
        **loss_overrides,
    )
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(config, steps_per_epoch=462, mesh=mesh)
    model, state = setup.model, setup.state

    size = model.cfg.image_size  # 288/384 for RN50x4/x16
    batch = shard_batch(synthetic_batch(args.batch, size), mesh)

    # --- 3. XLA's own FLOP count for the compiled full step
    try:
        cost = setup.train_step.lower(state, batch).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        if cost is None:  # axon backend: no cost model exposed
            raise AttributeError("cost_analysis returned None")
        out["xla_step_gflops"] = round(cost.get("flops", 0.0) / 1e9, 1)
        out["xla_step_hbm_gb"] = round(
            cost.get("bytes accessed", 0.0) / 1e9, 2)
    except Exception as exc:  # cost analysis is best-effort per backend
        out["xla_step_gflops"] = f"unavailable: {type(exc).__name__}"

    # --- 4. phase wall times
    has_bn = bool(state.batch_stats)
    variables = {"params": state.params}
    if has_bn:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def fwd(variables, images, tokens_):
        kw = dict(train=True)
        if has_bn:
            img, txt = model.apply(variables, images, tokens_,
                                   mutable=["batch_stats"], **kw)[0]
        else:
            img, txt = model.apply(variables, images, tokens_, **kw)
        return l2_normalize(img).sum() + l2_normalize(txt).sum()

    loss_fn = make_loss_fn(config.loss_type, use_pallas=True)
    ctx_extra = (
        {"logit_scale": jnp.float32(10.0), "logit_bias": jnp.float32(-10.0)}
        if config.loss_type == "siglip" else {}
    )

    def loss_of(variables, images, tokens_):
        kw = dict(train=True)
        if has_bn:
            (img, txt), _ = model.apply(variables, images, tokens_,
                                        mutable=["batch_stats"], **kw)
        else:
            img, txt = model.apply(variables, images, tokens_, **kw)
        ctx = LossContext(
            temperature=jnp.float32(0.1), beta=jnp.float32(0.0),
            alpha=jnp.float32(0.0), warm=jnp.array(False), **ctx_extra,
        )
        loss, _ = loss_fn(l2_normalize(img), l2_normalize(txt), ctx)
        return loss

    grad_fn = jax.jit(jax.grad(loss_of))

    @jax.jit
    def loss_block(img, txt):
        ctx = LossContext(
            temperature=jnp.float32(0.1), beta=jnp.float32(0.0),
            alpha=jnp.float32(0.0), warm=jnp.array(False), **ctx_extra,
        )
        loss, _ = loss_fn(img, txt, ctx)
        return loss

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.standard_normal((args.batch, 512)).astype(np.float32))
    img = img / jnp.linalg.norm(img, axis=1, keepdims=True)
    txt = jnp.roll(img, 1, axis=0)

    out["t_fwd_ms"] = round(
        timed(fwd, variables, batch["images"], batch["tokens"]) * 1e3, 2)
    t_grad = timed(
        lambda v: jax.tree_util.tree_leaves(
            grad_fn(v, batch["images"], batch["tokens"]))[0],
        variables)
    out["t_fwd_bwd_ms"] = round(t_grad * 1e3, 2)
    out["t_loss_block_ms"] = round(timed(loss_block, img, txt) * 1e3, 3)

    # full step rebinds state each call (donated buffers)
    s = state
    for _ in range(3):
        s, m = setup.train_step(s, batch)
    fence(m["train_loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        s, m = setup.train_step(s, batch)
    fence(m["train_loss"])
    t_full = (time.perf_counter() - t0) / 10
    out["t_full_step_ms"] = round(t_full * 1e3, 2)
    out["pairs_per_sec"] = round(args.batch / t_full, 1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
