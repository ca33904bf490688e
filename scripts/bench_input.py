#!/usr/bin/env python
"""Input-pipeline throughput: images/s and tokens/s on THIS host, plus
an optional loader-in-the-loop synthetic epoch on the chip.

Measures the host data plane the framework actually ships:

* **imaging**: JPEG decode + RandomResizedCrop/flip/CLIP-normalize,
  PIL golden path (`data/transforms.py`) vs the C++ core
  (`native/imaging`, libjpeg row-skipping decode + fused transform),
  same crop/flip parameters;
* **tokenize**: caption → 77-token ids, Python golden
  (`text/tokenizer.py`) vs the C++ BPE core (`native/tokenizer`);
* **epoch** (`--epoch`, needs the chip): one synthetic-data epoch with
  the threaded loader IN the loop — loader → device → jit'd train step
  — vs the device-resident step rate, quantifying what the data plane
  costs end to end.  NB through the axon tunnel host→device runs at
  0.02-0.04 GB/s (BASELINE.md "Environment artifact"), so the epoch
  number here is tunnel-dominated; on a sane host the imaging/token
  rates are the binding figures.

Replaces the reference's DataLoader worker pipeline measurement
surface (sparsify_clip.py:1060-1063).

Usage: python scripts/bench_input.py [--images 96] [--epoch]
"""

from __future__ import annotations

import argparse
import io
import json
import time

import numpy as np

import _bench  # noqa: F401  (side effect: repo root on sys.path)


def bench_imaging(n_images: int):
    from PIL import Image

    from sparsify_clip_tpu.data import native_imaging, transforms

    rng = np.random.default_rng(0)
    jpegs = []
    for _ in range(n_images):
        arr = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=90)
        jpegs.append(buf.getvalue())

    def pil_pass():
        r = np.random.default_rng(1)
        for data in jpegs:
            img = Image.open(io.BytesIO(data)).convert("RGB")
            transforms.train_transform(img, r, size=224)

    t0 = time.perf_counter()
    pil_pass()
    pil_s = time.perf_counter() - t0
    out = {"pil_images_per_sec": round(n_images / pil_s, 1)}

    pipe = native_imaging.get_pipeline()
    if pipe is None:
        out["native_images_per_sec"] = None
        out["note"] = "native imaging core not built"
        return out

    def native_pass():
        r = np.random.default_rng(1)
        for data in jpegs:
            h, w = pipe.dims(data)
            top, left, ch, cw = transforms.sample_resized_crop_params(h, w, r)
            pipe.transform(
                data, 224, crop=(top, left, ch, cw), flip=bool(r.random() < 0.5)
            )

    t0 = time.perf_counter()
    native_pass()
    nat_s = time.perf_counter() - t0
    out["native_images_per_sec"] = round(n_images / nat_s, 1)
    out["native_speedup"] = round(pil_s / nat_s, 2)
    return out


def bench_tokenize(n_captions: int = 2000):
    from sparsify_clip_tpu.text import native as native_tok
    from sparsify_clip_tpu.text.tokenizer import CLIPTokenizer

    words = ("a photo of cat dog person riding bicycle on street with "
             "red umbrella near water and trees".split())
    rng = np.random.default_rng(2)
    captions = [
        " ".join(rng.choice(words, size=rng.integers(6, 14)))
        for _ in range(n_captions)
    ]
    tok = CLIPTokenizer()
    t0 = time.perf_counter()
    tok(captions)
    py_s = time.perf_counter() - t0
    out = {"python_captions_per_sec": round(n_captions / py_s, 1),
           "vocab_kind": tok.vocab_kind}
    if native_tok.ensure_built() is None:
        out["native_captions_per_sec"] = None
        return out
    ntok = native_tok.NativeCLIPTokenizer()
    ntok(captions[:8])  # warm caches
    t0 = time.perf_counter()
    ntok(captions)
    nat_s = time.perf_counter() - t0
    out["native_captions_per_sec"] = round(n_captions / nat_s, 1)
    out["native_speedup"] = round(py_s / nat_s, 2)
    return out


def bench_epoch(batch: int = 256, batches: int = 8):
    """Loader-in-the-loop synthetic epoch vs device-resident step rate."""
    import jax

    from sparsify_clip_tpu.config import ExperimentConfig
    from sparsify_clip_tpu.data import dataset_loader
    from sparsify_clip_tpu.parallel.mesh import create_mesh, shard_batch
    from sparsify_clip_tpu.train import create_train_setup

    config = ExperimentConfig.from_dict({
        "model": "ViT-B-32", "batch_size": batch, "epochs": 1,
        "learning_rate": 1e-4, "loss_type": "anchor", "fp16": True,
        "dataset": "synthetic", "num_train_samples": batch * batches,
        "num_test_samples": batch,
    })
    mesh = create_mesh(data=1, model=1)
    train_loader, _ = dataset_loader(config, image_size=224)
    setup = create_train_setup(
        config, steps_per_epoch=len(train_loader), mesh=mesh)

    # warm: one epoch to compile + fill caches
    state = setup.state
    for b in train_loader.epoch(0):
        dev = shard_batch({"images": b["images"], "tokens": b["tokens"]}, mesh)
        state, metrics = setup.train_step(state, dev)
    float(metrics["train_loss"])

    t0 = time.perf_counter()
    n = 0
    for b in train_loader.epoch(1):
        dev = shard_batch({"images": b["images"], "tokens": b["tokens"]}, mesh)
        state, metrics = setup.train_step(state, dev)
        n += batch
    float(metrics["train_loss"])
    loop_s = time.perf_counter() - t0

    # device-resident steady state for the same step
    dev = shard_batch({"images": b["images"], "tokens": b["tokens"]}, mesh)

    def one(s):
        return setup.train_step(s, dev)

    for _ in range(2):
        state, metrics = one(state)
    float(metrics["train_loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = one(state)
    float(metrics["train_loss"])
    resident_s = (time.perf_counter() - t0) / 5

    loop_rate = n / loop_s
    resident_rate = batch / resident_s
    return {
        "loader_in_loop_pairs_per_sec": round(loop_rate, 1),
        "device_resident_pairs_per_sec": round(resident_rate, 1),
        "data_plane_overhead_pct": round(100 * (1 - loop_rate / resident_rate), 1),
    }


def main():
    from _bench import wait_for_backend
    wait_for_backend()  # ride out transient axon backend-init errors

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--captions", type=int, default=2000)
    ap.add_argument("--epoch", action="store_true",
                    help="also run the loader-in-the-loop epoch on the chip")
    args = ap.parse_args()

    out = {"imaging": bench_imaging(args.images)}
    print(json.dumps({"imaging": out["imaging"]}), flush=True)
    out["tokenize"] = bench_tokenize(args.captions)
    print(json.dumps({"tokenize": out["tokenize"]}), flush=True)
    if args.epoch:
        out["epoch"] = bench_epoch()
        print(json.dumps({"epoch": out["epoch"]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
