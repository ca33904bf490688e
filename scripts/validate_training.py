#!/usr/bin/env python
"""Learning validation: overfit CLIP retrieval on a small synthetic set.

Trains a real (ViT-B/32-architecture, 64px) two-tower model on 128
fixed image-caption pairs with the anchor loss and evaluates retrieval
on those same pairs — R@1 must climb from chance (~0.8%) toward 100%,
demonstrating the full stack (data → tokenizer → towers → loss → optim
→ eval) genuinely learns.  Run on TPU: ~5 min including compiles.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from sparsify_clip_tpu.config import ExperimentConfig
from sparsify_clip_tpu.data.loader import DataLoader
from sparsify_clip_tpu.data.synthetic import SyntheticCaptions
from sparsify_clip_tpu.eval import evaluate_model
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
from sparsify_clip_tpu.text import get_tokenizer
from sparsify_clip_tpu.train import create_train_setup

MODEL_REGISTRY.setdefault(
    "ViT-B-32-64px",
    CLIPConfig(
        name="ViT-B-32-64px", embed_dim=512, vision_kind="vit", image_size=64,
        vision_width=768, vision_layers=(12,), vision_heads=12, patch_size=16,
    ),
)
# The reference's default model family at 64px (BatchNorm towers,
# anti-aliased downsampling, attention pool) for learning validation
# of the conv path.
MODEL_REGISTRY.setdefault(
    "RN50-64px",
    CLIPConfig(
        name="RN50-64px", embed_dim=1024, vision_kind="resnet", image_size=64,
        vision_width=64, vision_layers=(3, 4, 6, 3), vision_heads=32,
    ),
)

N_PAIRS = 128
BATCH = 64
STEPS = 150
EVAL_EVERY = 30


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["vit", "rn50"], default="vit")
    ap.add_argument("--steps", type=int, default=STEPS)
    args = ap.parse_args()
    name = {"vit": "ViT-B-32-64px", "rn50": "RN50-64px"}[args.model]
    lr = {"vit": 5e-5, "rn50": 2e-4}[args.model]
    steps_target = args.steps
    config = ExperimentConfig.from_dict({
        "model": name, "batch_size": BATCH, "epochs": 100,
        "learning_rate": lr, "loss_type": "anchor",
        "anchor_temperature": 0.1, "fp16": True, "seed": 0,
    })
    mesh = create_mesh(data=1, model=1)
    setup = create_train_setup(config, steps_per_epoch=2, mesh=mesh)

    dataset = SyntheticCaptions(N_PAIRS, seed=0, image_size=64)
    tokenizer = get_tokenizer(config.model)
    loader = DataLoader(
        dataset, BATCH, tokenizer, train=False,  # deterministic transform:
        shuffle=True, seed=0, image_size=64,     # fixed pairs, shuffled order
    )
    eval_batches = list(
        DataLoader(dataset, BATCH, tokenizer, train=False, shuffle=False,
                   seed=0, image_size=64).epoch(0)
    )

    state = setup.state

    def eval_r1(state):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        metrics = evaluate_model(setup.model, variables, eval_batches)
        return metrics["backward_r1"], metrics["forward_r1"]

    b_r1, f_r1 = eval_r1(state)
    print(f"step 0: backward_r1={b_r1:.2f} forward_r1={f_r1:.2f} (chance={100/N_PAIRS:.2f})",
          flush=True)

    step = 0
    history = [(0, b_r1)]
    while step < steps_target:
        for batch in loader.epoch(step):
            dev_batch = shard_batch(
                {"images": batch["images"], "tokens": batch["tokens"]}, mesh
            )
            state, metrics = setup.train_step(state, dev_batch)
            step += 1
            if step % EVAL_EVERY == 0:
                b_r1, f_r1 = eval_r1(state)
                loss = float(metrics["train_loss"])
                print(f"step {step}: loss={loss:.4f} backward_r1={b_r1:.2f} "
                      f"forward_r1={f_r1:.2f}", flush=True)
                history.append((step, b_r1))
            if step >= steps_target:
                break

    first, last = history[0][1], history[-1][1]
    ok = last > max(20.0, first * 5)
    print(f"RESULT: backward_r1 {first:.2f} -> {last:.2f}  "
          f"{'LEARNING OK' if ok else 'NOT LEARNING'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
