#!/usr/bin/env python
"""Analytic FLOPs audit: XLA's own cost analysis of the REAL train step.

For each requested zoo model this lowers the exact experiment-6 train
step that the CLI runs (``create_train_setup``) on the CPU backend and
reads ``jax.stage.Lowered.cost_analysis()`` — the compiler's pre-
optimization FLOP count for the whole step (fwd + bwd + optimizer), no
hand-derived formulas.  Combined with a measured step time it yields
the sustained TFLOP/s and the fraction of bf16 peak — the per-model
MFU column in BASELINE.md's "Speed-of-light summary".

Runs entirely on host (no chip needed): the count is a property of the
traced computation, not of where it executes.  The Pallas fused paths
are backend-gated to TPU, so the CPU lowering counts their XLA twins —
the same math (tests/test_pallas_* pin the equivalence).

Usage:
  python scripts/flops_audit.py                         # whole zoo
  python scripts/flops_audit.py --models ViT-B-32,RN50 \
      --step-ms 99.5,148.5 --batch 256,256              # + sustained TF/s

Reference anchor: the per-pair FLOP framing matches BASELINE.md's
roofline sections; the reference itself publishes no FLOPs
(/root/reference/README.md:1-49).
"""

from __future__ import annotations

import argparse
import json

import _bench  # noqa: F401  (side effect: repo root on sys.path)

# v5e bf16 peak, TFLOP/s — the denominator for the MFU column.
BF16_PEAK_TFLOPS = 197.0


def audit_model(model: str, batch: int, mesh_model: int = 1, fsdp_data: int = 1):
    import jax

    from _bench import exp6_config, synthetic_batch
    from sparsify_clip_tpu.models.clip import MODEL_REGISTRY
    from sparsify_clip_tpu.parallel.mesh import create_mesh
    from sparsify_clip_tpu.train import create_train_setup

    config = exp6_config(
        model, batch,
        mesh_model=mesh_model, mesh_data=fsdp_data, fsdp=fsdp_data > 1,
    )
    mesh = create_mesh(data=fsdp_data, model=mesh_model)
    setup = create_train_setup(config, steps_per_epoch=462, mesh=mesh)

    size = MODEL_REGISTRY[model].image_size
    batch_d = synthetic_batch(batch, size)

    # the setup's step is already jitted; the _jitted hook exposes the
    # AOT surface (train.py) — lower under the mesh like the live path
    jitted = getattr(setup.train_step, "_jitted", setup.train_step)
    with jax.sharding.set_mesh(mesh):
        lowered = jitted.lower(setup.state, batch_d)
    cost = lowered.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older JAX returns one per device
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    return {
        "batch": batch,
        "step_gflops": round(flops / 1e9, 1),
        "gflops_per_pair": round(flops / batch / 1e9, 2),
    }


def audit_encode(model: str, batch: int):
    """XLA-counted FLOPs of the serving path: CLIPEncoder's jitted
    normalized-embedding encoders (inference.py).

    Variables are ABSTRACT (``jax.eval_shape`` init): ``lower()``
    accepts ShapeDtypeStructs and the cost analysis is a property of
    the traced computation, so billion-param towers (ViT-g/bigG) audit
    without allocating a byte of weights."""
    import jax
    import jax.numpy as jnp

    from sparsify_clip_tpu.inference import CLIPEncoder
    from sparsify_clip_tpu.models.clip import CLIP, MODEL_REGISTRY

    cfg = MODEL_REGISTRY[model]
    model_m = CLIP(cfg=cfg, dtype=jnp.bfloat16)
    size = cfg.image_size
    variables = jax.eval_shape(
        lambda: model_m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32), train=False,
        )
    )
    images = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    tokens = jax.ShapeDtypeStruct(
        (batch, cfg.context_length), jnp.int32)
    encoder = CLIPEncoder(model_m, variables, tokenizer=None)

    def flops_of(fn, *xs):
        cost = jax.jit(fn).lower(variables, *xs).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))

    img = flops_of(lambda v, x: encoder._encode_images(v, x), images)
    txt = flops_of(lambda v, t: encoder._encode_tokens(v, t), tokens)
    return {
        "batch": batch,
        "encode_image_gflops_per_item": round(img / batch / 1e9, 2),
        "encode_text_gflops_per_item": round(txt / batch / 1e9, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models",
        default="ViT-B-32,ViT-B-16,ViT-L-14,RN50,RN101,RN50x4,RN50x16")
    ap.add_argument("--batch", default="256,256,128,256,256,128,64",
                    help="comma list matching --models (or one value)")
    ap.add_argument("--step-ms", default="",
                    help="optional comma list of measured step times; adds "
                         "sustained TFLOP/s and %%-of-bf16-peak columns")
    ap.add_argument("--encode", action="store_true",
                    help="audit the serving encode path instead of the "
                         "train step; --step-ms then takes "
                         "img_ms:txt_ms pairs per model")
    ap.add_argument("--mesh-model", type=int, default=1,
                    help="tensor-parallel degree: lowers the train step "
                         "TP-sharded over that many (virtual CPU) "
                         "devices — validates the sharding rules for "
                         "models that need TP to fit HBM (ViT-g/bigG)")
    ap.add_argument("--fsdp-data", type=int, default=1,
                    help="FSDP degree: lowers the train step with params "
                         "and moments sharded over a data axis of this "
                         "size (fsdp: true) — validates the fully-sharded "
                         "layout for the towers that exceed one chip's "
                         "HBM under plain DP (ViT-bigG on a v5e-8)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # axon override: CLAUDE.md
    n_dev = args.mesh_model * args.fsdp_data
    if n_dev > 1:
        jax.config.update("jax_num_cpu_devices", n_dev)

    models = args.models.split(",")
    batches = [int(b) for b in args.batch.split(",")]
    if len(batches) == 1:
        batches *= len(models)
    step_ms = [s for s in args.step_ms.split(",") if s]
    # loud on mispaired lists — zip truncation would silently report a
    # partial zoo as if it were complete
    if len(batches) != len(models):
        raise SystemExit(
            f"--batch has {len(batches)} entries for {len(models)} models")
    if step_ms and len(step_ms) != len(models):
        raise SystemExit(
            f"--step-ms has {len(step_ms)} entries for {len(models)} models")

    out = {}
    for i, (model, batch) in enumerate(zip(models, batches)):
        if args.encode:
            row = audit_encode(model, batch)
            if i < len(step_ms):
                img_ms, txt_ms = (float(v) for v in step_ms[i].split(":"))
                for kind, ms in (("image", img_ms), ("text", txt_ms)):
                    gf = row[f"encode_{kind}_gflops_per_item"] * batch
                    row[f"encode_{kind}_ms"] = ms
                    tf = gf / ms
                    row[f"encode_{kind}_tflops"] = round(tf, 1)
                    row[f"encode_{kind}_pct_peak"] = round(
                        100 * tf / BF16_PEAK_TFLOPS, 1)
        else:
            row = audit_model(
                model, batch, mesh_model=args.mesh_model,
                fsdp_data=args.fsdp_data,
            )
            if args.mesh_model > 1:
                row["mesh_model"] = args.mesh_model
            if args.fsdp_data > 1:
                row["fsdp_data"] = args.fsdp_data
            if i < len(step_ms):
                ms = float(step_ms[i])
                tf = row["step_gflops"] / ms  # GF / ms == TFLOP/s
                row["step_ms"] = ms
                row["sustained_tflops"] = round(tf, 1)
                row["pct_bf16_peak"] = round(100 * tf / BF16_PEAK_TFLOPS, 1)
        out[model] = row
        print(json.dumps({model: row}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
