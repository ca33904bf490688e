"""Online serving runtime: dynamic batching over the jitted encoders.

The reference has no serving story at all (its only inference is the
eval loop, sparsify_clip.py:534-676).  This module is the piece a
production deployment needs between a request stream and the chip:

* **Dynamic batching** — single-item requests are coalesced into
  device batches (up to ``max_batch``, waiting at most ``max_wait_ms``
  from the first queued item), because per-item dispatch wastes the
  MXU: one chip encodes ~13k images/s at bs256 but only ~1/(3 ms
  dispatch) ≈ 330/s at bs1 through a tunnel-attached device.
* **Bucket padding** — batches are zero-padded up to a fixed ladder of
  power-of-two sizes so XLA compiles a handful of programs, not one
  per observed batch size.  On TPU a fresh shape is a fresh compile
  (40-90 s through the axon remote compiler); the ladder caps the
  compiled surface at ``log2(max_batch)+1`` programs per modality.
* **Backend-agnostic** — serves a live :class:`~sparsify_clip_tpu.\
inference.CLIPEncoder` or a deserialized
  :class:`~sparsify_clip_tpu.export.ExportedEncoder` artifact (the
  batch-polymorphic export still recompiles per concrete shape at run
  time, so bucketing pays there too).
* **Observable** — per-request latency percentiles and the realized
  batch-size histogram, the two numbers that tell an operator whether
  the batcher (not the model) is the bottleneck.

* **Multi-chip** — pass a LIST of encoders (one per device, e.g. from
  :func:`replicate_clip_encoder`) and batches fan out across replicas:
  one runner thread per replica pulls from a shared batch queue
  (work-stealing, so a slow replica never stalls the others).  This is
  data-parallel serving over a pod host's chips with zero collective
  traffic — each request touches exactly one device.

The hot path stays on device; the runtime around it is a dispatcher
thread + condition variable forming batches and R runner threads
executing them (requests are numpy arrays and futures — there is no
tensor work on the Python side beyond the pad).

Usage::

    server = BatchingEncoderServer(encoder, tokenizer=tok)
    fut = server.submit_image(pixels)        # (H, W, 3) float32
    emb = fut.result()                       # (D,) unit fp32
    server.close()
"""

from __future__ import annotations

import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "BatchingEncoderServer",
    "ServerStats",
    "bucket_ladder",
    "replicate_clip_encoder",
]


def replicate_clip_encoder(model, variables, tokenizer=None, devices=None):
    """One :class:`~sparsify_clip_tpu.inference.CLIPEncoder` per device,
    each with its own device-committed copy of the variables — the
    replica list for data-parallel serving on a multi-chip host::

        server = BatchingEncoderServer(
            replicate_clip_encoder(model, variables), tokenizer=tok)

    ``devices`` defaults to every local device.  Each replica's jitted
    programs dispatch to its variables' device (host batches are
    uncommitted, so placement follows the committed operand).
    """
    import jax

    from sparsify_clip_tpu.inference import CLIPEncoder

    devices = list(devices) if devices is not None else jax.local_devices()
    return [
        CLIPEncoder(model, jax.device_put(variables, dev), tokenizer)
        for dev in devices
    ]


def bucket_ladder(max_batch: int) -> List[int]:
    """Power-of-two pad targets up to ``max_batch`` (always included)."""
    ladder, b = [], 1
    while b < max_batch:
        ladder.append(b)
        b *= 2
    ladder.append(max_batch)
    return ladder


@dataclass
class _Request:
    kind: str  # "image" | "tokens"
    payload: np.ndarray  # (H, W, 3) or (context_length,)
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.monotonic)


@dataclass
class ServerStats:
    """Snapshot of the server's counters (see :meth:`stats`)."""

    requests: int
    batches: int
    mean_batch: float
    batch_histogram: Dict[int, int]  # padded bucket size -> count
    latency_p50_ms: float
    latency_p99_ms: float
    errors: int
    replica_batches: List[int] = field(default_factory=list)


class BatchingEncoderServer:
    """Coalesce single-item encode requests into padded device batches.

    ``encoder`` — one encoder, or a list of replicas (one per device;
    see :func:`replicate_clip_encoder`).  Each needs
    ``encode_images((B,H,W,3) np) -> (B,D)`` and one of
    ``encode_tokens((B,T) int np) -> (B,D)`` (ExportedEncoder) or a
    jitted token path reachable via ``encode_texts`` (CLIPEncoder —
    wrapped here through its ``_encode_tokens``).  Raw strings are
    tokenized on the submit thread (host-side, C++ BPE capable), so
    the dispatcher only ever moves fixed-shape arrays.

    One dispatcher thread serves both modalities, always working the
    queue whose head request has waited longest — FIFO across
    modalities, batches within one.  Formed batches land on a shared
    queue drained by one runner thread per replica, so R devices
    encode R batches concurrently.
    """

    def __init__(
        self,
        encoder: Any,
        tokenizer: Optional[Callable[[List[str]], np.ndarray]] = None,
        max_batch: int = 256,
        max_wait_ms: float = 5.0,
        buckets: Optional[Sequence[int]] = None,
        latency_window: int = 16384,
    ):
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        encoders = list(encoder) if isinstance(encoder, (list, tuple)) else [encoder]
        if not encoders:
            raise ValueError("need at least one encoder replica")
        self._replicas = [
            {
                "image": enc.encode_images,
                "tokens": self._resolve_token_fn(enc),
                # raw-uint8 path (device-side normalize, 4x smaller
                # transfers) when the backend has one (CLIPEncoder does;
                # serialized exports don't)
                "image_u8": getattr(enc, "encode_images_u8", None),
            }
            for enc in encoders
        ]
        self.tokenizer = tokenizer if tokenizer is not None else getattr(
            encoders[0], "tokenizer", None
        )
        # expected request shapes, when the backend can tell us: one
        # wrong-sized payload must fail ITS request at submit time, not
        # every co-batched request at np.stack time.  (Fixed sizes are
        # also the right serving default — each distinct shape is a
        # fresh XLA compile; resize on the client or use CLIPEncoder's
        # u8 device resize behind a constant staging shape.)
        meta = getattr(encoders[0], "meta", None)
        cfg = getattr(getattr(encoders[0], "model", None), "cfg", None)
        if meta is not None:
            self.image_size = meta.get("image_size")
            self.context_length = meta.get("context_length")
        elif cfg is not None:
            self.image_size = getattr(cfg, "image_size", None)
            self.context_length = getattr(cfg, "context_length", None)
        else:
            self.image_size = None
            self.context_length = None
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.buckets = sorted(set(int(b) for b in buckets)) if buckets else (
            bucket_ladder(self.max_batch)
        )
        if self.buckets[-1] < self.max_batch:
            raise ValueError(
                f"largest bucket {self.buckets[-1]} < max_batch {self.max_batch}"
            )

        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        # queue key = modality for the fixed-shape paths; uint8 images
        # queue per staging (H, W) so every formed batch is stackable —
        # the u8 path resizes on DEVICE, so arbitrary client shapes are
        # legal, but mixed shapes can never share one np.stack
        self._queues: Dict[Any, deque] = {"image": deque(), "tokens": deque()}
        self._stopped = False
        self._n_requests = 0
        self._n_batches = 0
        self._n_items_batched = 0
        self._n_errors = 0
        self._batch_hist: Dict[int, int] = {}
        self._replica_batches = [0] * len(self._replicas)
        self._latencies = deque(maxlen=int(latency_window))
        import queue as _queue

        self._batch_q: "_queue.Queue" = _queue.Queue()
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="encoder-batcher", daemon=True
        )
        self._runners = [
            threading.Thread(
                target=self._runner_loop, args=(i,),
                name=f"encoder-replica-{i}", daemon=True,
            )
            for i in range(len(self._replicas))
        ]
        self._thread.start()
        for r in self._runners:
            r.start()

    @staticmethod
    def _resolve_token_fn(encoder):
        fn = getattr(encoder, "encode_tokens", None)
        if fn is not None:
            return fn
        # CLIPEncoder: jitted (variables, tokens) closure + bound variables
        inner = getattr(encoder, "_encode_tokens", None)
        variables = getattr(encoder, "variables", None)
        if inner is not None and variables is not None:
            return lambda tokens: inner(variables, tokens)
        raise TypeError(
            "encoder exposes neither encode_tokens nor a CLIPEncoder-style "
            "_encode_tokens/variables pair"
        )

    # ------------------------------------------------------------- API

    def submit_image(self, image: np.ndarray) -> Future:
        """Queue one (H, W, 3) float32 normalized-pixel image → Future[(D,)]."""
        image = np.asarray(image, np.float32)
        if image.ndim != 3:
            raise ValueError(f"expected one (H, W, 3) image, got {image.shape}")
        self._check_image_shape(image.shape)
        return self._submit("image", image)

    def submit_image_u8(self, image_u8: np.ndarray) -> Future:
        """Queue one (H, W, 3) uint8 RAW-pixel image → Future[(D,)].
        CLIP normalization (and resize if needed) runs on device —
        4× less host→device traffic than the fp32 path."""
        if self._replicas[0]["image_u8"] is None:
            raise ValueError(
                "this backend has no uint8 path (serialized exports take "
                "normalized fp32 pixels; use submit_image)"
            )
        image_u8 = np.asarray(image_u8)
        if image_u8.dtype != np.uint8 or image_u8.ndim != 3:
            raise ValueError(
                f"expected one (H, W, 3) uint8 image, got "
                f"{image_u8.dtype} {image_u8.shape}"
            )
        # any (H, W) is legal — the device program resizes — but each
        # distinct staging shape batches (and compiles) separately
        return self._submit(
            ("image_u8", image_u8.shape[0], image_u8.shape[1]), image_u8
        )

    def submit_tokens(self, tokens: np.ndarray) -> Future:
        """Queue one (T,) int32 token row → Future[(D,)]."""
        tokens = np.asarray(tokens, np.int32)
        if tokens.ndim != 1:
            raise ValueError(f"expected one (T,) token row, got {tokens.shape}")
        if (
            self.context_length is not None
            and tokens.shape[0] != self.context_length
        ):
            raise ValueError(
                f"expected a ({self.context_length},) token row, got "
                f"{tokens.shape} — pad/truncate to the model's context length"
            )
        return self._submit("tokens", tokens)

    def _check_image_shape(self, shape) -> None:
        if self.image_size is None:
            return
        expected = (self.image_size, self.image_size, 3)
        if tuple(shape) != expected:
            raise ValueError(
                f"expected a {expected} image, got {tuple(shape)} — resize "
                "on the client (each distinct shape would be a fresh XLA "
                "compile, and mixed shapes cannot share a batch)"
            )

    def submit_text(self, text: str) -> Future:
        """Tokenize on the calling thread, then queue the token row."""
        if self.tokenizer is None:
            raise ValueError("pass a tokenizer to submit raw strings")
        row = np.asarray(self.tokenizer([text]))[0]
        return self._submit("tokens", row.astype(np.int32))

    def encode_image(self, image: np.ndarray, timeout: Optional[float] = None):
        """Blocking single-image convenience wrapper."""
        return self.submit_image(image).result(timeout)

    def encode_text(self, text: str, timeout: Optional[float] = None):
        return self.submit_text(text).result(timeout)

    def warmup(
        self,
        image_shape: Sequence[int],
        context_length: int,
        include_u8: bool = False,
    ) -> None:
        """Compile every bucket size for both modalities on every
        replica up front (one dummy batch per (modality, bucket,
        replica)); serving then never pays a compile on the request
        path.  ``include_u8`` also precompiles the raw-uint8 image
        path (skipped by default — every bucket is a compile)."""
        for fns in self._replicas:
            for b in self.buckets:
                fns["image"](np.zeros((b, *image_shape), np.float32))
                fns["tokens"](np.zeros((b, context_length), np.int32))
                if include_u8 and fns["image_u8"] is not None:
                    fns["image_u8"](np.zeros((b, *image_shape), np.uint8))

    def stats(self) -> ServerStats:
        with self._lock:
            lat = sorted(self._latencies)
            batches = self._n_batches

            def pct(p):
                if not lat:
                    return 0.0
                return 1e3 * lat[min(len(lat) - 1, int(p * len(lat)))]

            return ServerStats(
                requests=self._n_requests,
                batches=batches,
                mean_batch=(self._n_items_batched / batches) if batches else 0.0,
                batch_histogram=dict(sorted(self._batch_hist.items())),
                latency_p50_ms=pct(0.50),
                latency_p99_ms=pct(0.99),
                errors=self._n_errors,
                replica_batches=list(self._replica_batches),
            )

    def close(self, timeout: float = 30.0) -> None:
        """Stop accepting work, flush queued requests, join the threads.

        The dispatcher posts the runners' stop sentinels itself when it
        finishes flushing, so a batch can never land behind a sentinel
        (which would strand its futures unresolved forever)."""
        with self._cond:
            self._stopped = True
            self._cond.notify_all()
        self._thread.join(timeout)  # flushes request queues into _batch_q
        for r in self._runners:
            r.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ------------------------------------------------------ dispatcher

    def _submit(self, key: Any, payload: np.ndarray) -> Future:
        req = _Request(key[0] if isinstance(key, tuple) else key, payload)
        with self._cond:
            if self._stopped:
                raise RuntimeError("server is closed")
            self._queues.setdefault(key, deque()).append(req)
            self._n_requests += 1
            self._cond.notify_all()
        return req.future

    def _pick_kind_locked(self) -> Optional[Any]:
        heads = [
            (q[0].t_submit, i, key)
            for i, (key, q) in enumerate(self._queues.items())
            if q
        ]
        return min(heads)[2] if heads else None

    def _dispatch_loop(self) -> None:
        try:
            self._dispatch_until_stopped()
        finally:
            # the dispatcher owns the runner sentinels: they are posted
            # only after every queued request has been flushed into
            # _batch_q, so runners always drain the real work first
            for _ in self._runners:
                self._batch_q.put(None)

    def _dispatch_until_stopped(self) -> None:
        while True:
            with self._cond:
                kind = self._pick_kind_locked()
                while kind is None and not self._stopped:
                    self._cond.wait(0.05)
                    kind = self._pick_kind_locked()
                if kind is None and self._stopped:
                    return
                queue = self._queues[kind]
                # wait out the batching window (deadline set by the
                # oldest request) unless the batch is already full
                deadline = queue[0].t_submit + self.max_wait_s
                while (
                    len(queue) < self.max_batch
                    and not self._stopped
                    and (remaining := deadline - time.monotonic()) > 0
                ):
                    self._cond.wait(remaining)
                take = [queue.popleft() for _ in range(min(len(queue), self.max_batch))]
                if not queue and isinstance(kind, tuple):
                    del self._queues[kind]  # dynamic per-shape u8 queue
            self._batch_q.put((kind, take))

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _runner_loop(self, replica: int) -> None:
        while True:
            item = self._batch_q.get()
            if item is None:
                return
            self._run_batch(replica, *item)

    def _run_batch(self, replica: int, key: Any, reqs: List[_Request]) -> None:
        kind = key[0] if isinstance(key, tuple) else key
        # claim every future first: a client-side fut.cancel() between
        # submit and here wins (the request is dropped), and a claimed
        # future can no longer be cancelled — so the set_result /
        # set_exception calls below cannot raise InvalidStateError and
        # kill the runner thread
        reqs = [r for r in reqs if r.future.set_running_or_notify_cancel()]
        if not reqs:
            return
        n = len(reqs)
        padded = self._bucket(n)
        stacked = np.stack([r.payload for r in reqs])
        if padded > n:
            pad = np.zeros((padded - n, *stacked.shape[1:]), stacked.dtype)
            stacked = np.concatenate([stacked, pad])
        try:
            fn = self._replicas[replica][kind]
            out = np.asarray(fn(stacked))[:n]
        except Exception as exc:  # propagate to every waiter in the batch
            with self._lock:
                self._n_errors += n
            for r in reqs:
                r.future.set_exception(exc)
            return
        done = time.monotonic()
        with self._lock:
            self._n_batches += 1
            self._n_items_batched += n
            self._batch_hist[padded] = self._batch_hist.get(padded, 0) + 1
            self._replica_batches[replica] += 1
            for r in reqs:
                self._latencies.append(done - r.t_submit)
        for r, row in zip(reqs, out):
            r.future.set_result(row)
