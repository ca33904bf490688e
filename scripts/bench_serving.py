#!/usr/bin/env python
"""Online-serving bench: the dynamic batcher vs per-request dispatch.

Unlike bench_inference.py (device-resident batches, 4-byte fences —
the pure device rate), this measures the END-TO-END request path of
``serving.BatchingEncoderServer``: host-side single items in, padded
batches to the device, per-request futures out.  Host->device
transfer is part of the product here, so it stays inside the
measurement — on the axon tunnel (0.02-0.04 GB/s) that makes the
IMAGE numbers transfer-bound environment artifacts (each 224^2 fp32
image is ~600 KB); the TEXT numbers (308 B/request) are clean.

Phases per modality:
  1. naive closed loop — one request at a time through the bs-1
     program (what a deployment without a batcher does);
  2. batched closed loop — N submitter threads against the server.

Usage: python scripts/bench_serving.py [--model ViT-B-32]
         [--threads 64] [--seconds 15] [--buckets 1,32,256]
         [--skip-images]
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import threading
import time

import numpy as np

# if a phase wedges (axon stalls happen), show where — every 180 s
faulthandler.dump_traceback_later(180, repeat=True)

import _bench  # noqa: F401  (side effect: repo root on sys.path)
from _bench import wait_for_backend


def closed_loop(submit_one, n_threads: int, seconds: float):
    """n_threads submit->wait loops for `seconds`; -> (reqs/s, lat list)."""
    stop = time.monotonic() + seconds
    latencies, counts = [], [0] * n_threads
    lock = threading.Lock()

    def worker(i):
        mine = []
        while time.monotonic() < stop:
            t0 = time.monotonic()
            submit_one()
            mine.append(time.monotonic() - t0)
            counts[i] += 1
        with lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    return sum(counts) / wall, sorted(latencies)


def pct(lat, p):
    return 1e3 * lat[min(len(lat) - 1, int(p * len(lat)))] if lat else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--threads", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--naive-seconds", type=float, default=10.0)
    ap.add_argument("--max-wait-ms", type=float, default=5.0)
    ap.add_argument("--buckets", default="1,32,256",
                    help="pad ladder; keep it short — every bucket is a compile")
    ap.add_argument("--skip-images", action="store_true",
                    help="text only (image batches are tunnel-transfer-bound here)")
    ap.add_argument("--skip-text", action="store_true")
    ap.add_argument("--compile-cache", default="/tmp/sparsify_xla_cache",
                    help="persistent XLA compile cache dir ('' to disable)")
    args = ap.parse_args()

    wait_for_backend()
    import jax
    import jax.numpy as jnp

    if args.compile_cache:
        os.makedirs(args.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)

    from sparsify_clip_tpu.inference import CLIPEncoder
    from sparsify_clip_tpu.models import create_model
    from sparsify_clip_tpu.serving import BatchingEncoderServer

    buckets = [int(b) for b in args.buckets.split(",")]
    model, variables = create_model(args.model, dtype=jnp.bfloat16)
    cfg = model.cfg
    encoder = CLIPEncoder(model, variables, tokenizer=None)

    rng = np.random.default_rng(0)
    image = rng.standard_normal((cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    tokens = rng.integers(1, cfg.vocab_size - 10, size=(cfg.context_length,)).astype(np.int32)
    tokens[0] = cfg.vocab_size - 2
    tokens[-1] = cfg.vocab_size - 1

    out = {
        "model": args.model, "backend": jax.default_backend(),
        "threads": args.threads, "buckets": buckets,
        "max_wait_ms": args.max_wait_ms,
    }

    server = BatchingEncoderServer(
        encoder, max_batch=buckets[-1], max_wait_ms=args.max_wait_ms,
        buckets=buckets,
    )
    print(f"warmup: compiling {len(buckets)} buckets x 2 modalities ...", flush=True)
    t0 = time.monotonic()
    server.warmup((cfg.image_size, cfg.image_size, 3), cfg.context_length)
    out["warmup_s"] = round(time.monotonic() - t0, 1)
    print(f"warmup done in {out['warmup_s']} s", flush=True)

    def run(kind, submit_naive, submit_batched):
        print(f"{kind}: naive closed loop ...", flush=True)
        rate_n, lat_n = closed_loop(submit_naive, 1, args.naive_seconds)
        print(f"{kind}: batched closed loop x{args.threads} ...", flush=True)
        hist_before = dict(server.stats().batch_histogram)
        rate_b, lat_b = closed_loop(submit_batched, args.threads, args.seconds)
        hist_after = server.stats().batch_histogram
        hist = {
            b: n - hist_before.get(b, 0)
            for b, n in hist_after.items()
            if n - hist_before.get(b, 0)
        }
        res = {
            "naive_reqs_per_s": round(rate_n, 1),
            "naive_p50_ms": round(pct(lat_n, 0.5), 2),
            "batched_reqs_per_s": round(rate_b, 1),
            "batched_p50_ms": round(pct(lat_b, 0.5), 2),
            "batched_p99_ms": round(pct(lat_b, 0.99), 2),
            "speedup": round(rate_b / rate_n, 1) if rate_n else None,
            "batch_histogram": hist,
        }
        out[kind] = res
        print(json.dumps({kind: res}), flush=True)

    # --- text ----------------------------------------------------------
    if not args.skip_text:
        run(
            "text",
            lambda: np.asarray(
                encoder._encode_tokens(variables, jnp.asarray(tokens[None]))
            )[0],
            lambda: server.submit_tokens(tokens).result(120),
        )

    # --- images --------------------------------------------------------
    if not args.skip_images:
        run(
            "image",
            lambda: np.asarray(
                encoder._encode_images(variables, jnp.asarray(image[None]))
            )[0],
            lambda: server.submit_image(image).result(300),
        )

        # raw-uint8 path: device-side normalize, 4x smaller transfers
        image_u8 = (np.clip(image, 0, 1) * 255).astype(np.uint8)
        print("image_u8: compiling buckets ...", flush=True)
        server.warmup(
            (cfg.image_size, cfg.image_size, 3), cfg.context_length,
            include_u8=True,
        )
        run(
            "image_u8",
            lambda: np.asarray(
                encoder._encode_images_u8(variables, jnp.asarray(image_u8[None]))
            )[0],
            lambda: server.submit_image_u8(image_u8).result(300),
        )

    server.close()
    out["server_stats"] = server.stats().__dict__
    print(json.dumps(out, indent=1, default=str))


if __name__ == "__main__":
    main()
