"""Dynamic-batching serving runtime (sparsify_clip_tpu/serving.py):
correctness vs direct encode, bucket padding, concurrency, error
propagation, stats, and the ExportedEncoder backend."""

import threading

import numpy as np
import jax.numpy as jnp
import pytest

from sparsify_clip_tpu.inference import CLIPEncoder
from sparsify_clip_tpu.models import create_model
from sparsify_clip_tpu.models.clip import CLIPConfig, MODEL_REGISTRY
from sparsify_clip_tpu.serving import BatchingEncoderServer, bucket_ladder

TINY = CLIPConfig(
    name="serve-tiny", embed_dim=16, vision_kind="vit", image_size=32,
    vision_width=32, vision_layers=(2,), vision_heads=2, patch_size=16,
    vocab_size=256, context_length=12, text_width=16, text_heads=2, text_layers=2,
)
MODEL_REGISTRY.setdefault("serve-tiny", TINY)

RNG = np.random.default_rng(7)


class _CountingEncoder:
    """Wraps an encoder, recording every batch shape it is asked for."""

    def __init__(self, encoder):
        self._enc = encoder
        self.image_shapes = []
        self.token_shapes = []

    def encode_images(self, images):
        self.image_shapes.append(tuple(images.shape))
        return self._enc.encode_images(images)

    def encode_tokens(self, tokens):
        self.token_shapes.append(tuple(tokens.shape))
        return self._enc._encode_tokens(self._enc.variables, jnp.asarray(tokens))


@pytest.fixture(scope="module")
def encoder():
    model, variables = create_model("serve-tiny", dtype=jnp.float32)
    return CLIPEncoder(model, variables, tokenizer=None)


def _images(n):
    return RNG.standard_normal((n, 32, 32, 3)).astype(np.float32)


def _token_rows(n):
    rows = RNG.integers(1, 250, size=(n, TINY.context_length)).astype(np.int32)
    rows[:, 0] = 254
    rows[:, -1] = 255
    return rows


def test_bucket_ladder():
    assert bucket_ladder(256) == [1, 2, 4, 8, 16, 32, 64, 128, 256]
    assert bucket_ladder(48) == [1, 2, 4, 8, 16, 32, 48]
    assert bucket_ladder(1) == [1]


def test_single_requests_match_direct_encode(encoder):
    images = _images(5)
    tokens = _token_rows(3)
    want_img = np.asarray(encoder.encode_images(images))
    want_txt = np.asarray(encoder._encode_tokens(encoder.variables, jnp.asarray(tokens)))
    with BatchingEncoderServer(encoder, max_batch=8, max_wait_ms=10.0) as server:
        img_futs = [server.submit_image(im) for im in images]
        txt_futs = [server.submit_tokens(t) for t in tokens]
        got_img = np.stack([f.result(30) for f in img_futs])
        got_txt = np.stack([f.result(30) for f in txt_futs])
    # zero-padded rows share the batch but must not change the real
    # rows' embeddings (batch-independent encoders)
    np.testing.assert_allclose(got_img, want_img, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(got_txt, want_txt, rtol=2e-5, atol=2e-6)


def test_batches_are_padded_to_buckets(encoder):
    counting = _CountingEncoder(encoder)
    with BatchingEncoderServer(counting, max_batch=8, max_wait_ms=40.0) as server:
        futs = [server.submit_image(im) for im in _images(5)]
        for f in futs:
            f.result(30)
        futs = [server.submit_tokens(t) for t in _token_rows(3)]
        for f in futs:
            f.result(30)
    allowed = set(bucket_ladder(8))
    assert counting.image_shapes and counting.token_shapes
    for shape in counting.image_shapes:
        assert shape[0] in allowed, shape
        assert shape[1:] == (32, 32, 3)
    for shape in counting.token_shapes:
        assert shape[0] in allowed, shape
    # 5 images in one window -> one padded-8 batch (not five bs1 calls)
    assert len(counting.image_shapes) < 5


def test_full_batch_dispatches_before_deadline(encoder):
    counting = _CountingEncoder(encoder)
    # huge window: only the max_batch=4 fill should trigger dispatch
    with BatchingEncoderServer(counting, max_batch=4, max_wait_ms=5000.0) as server:
        futs = [server.submit_image(im) for im in _images(4)]
        got = [f.result(30) for f in futs]
    assert len(got) == 4
    assert counting.image_shapes[0][0] == 4


def test_concurrent_submitters_get_their_own_results(encoder):
    images = _images(24)
    want = np.asarray(encoder.encode_images(images))
    results = {}
    errors = []

    with BatchingEncoderServer(encoder, max_batch=8, max_wait_ms=2.0) as server:
        def worker(idx):
            try:
                results[idx] = np.asarray(server.submit_image(images[idx]).result(60))
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        stats = server.stats()

    assert not errors
    for i in range(24):
        np.testing.assert_allclose(results[i], want[i], rtol=2e-5, atol=2e-6)
    assert stats.requests == 24
    assert stats.batches >= 1
    assert sum(stats.batch_histogram.values()) == stats.batches
    assert stats.latency_p99_ms >= stats.latency_p50_ms >= 0.0


def test_error_propagates_to_every_waiter(encoder):
    class Exploding:
        def encode_images(self, images):
            raise RuntimeError("boom")

        def encode_tokens(self, tokens):
            raise RuntimeError("boom")

    with BatchingEncoderServer(Exploding(), max_batch=4, max_wait_ms=5.0) as server:
        futs = [server.submit_image(im) for im in _images(3)]
        for f in futs:
            with pytest.raises(RuntimeError, match="boom"):
                f.result(30)
        assert server.stats().errors == 3


def test_close_rejects_new_work_and_flushes(encoder):
    server = BatchingEncoderServer(encoder, max_batch=8, max_wait_ms=5000.0)
    futs = [server.submit_image(im) for im in _images(3)]
    server.close()  # must flush the queued requests despite the long window
    for f in futs:
        assert f.result(1).shape == (TINY.embed_dim,)
    with pytest.raises(RuntimeError):
        server.submit_image(_images(1)[0])


def test_text_submission_via_tokenizer(encoder):
    def fake_tokenizer(texts):
        rows = np.zeros((len(texts), TINY.context_length), np.int32)
        for i, t in enumerate(texts):
            rows[i, 0] = 254
            rows[i, 1] = (len(t) % 250) + 1
            rows[i, -1] = 255
        return rows

    with BatchingEncoderServer(
        encoder, tokenizer=fake_tokenizer, max_batch=4, max_wait_ms=5.0
    ) as server:
        emb = server.encode_text("a photo of a dog")
    want = encoder._encode_tokens(
        encoder.variables, jnp.asarray(fake_tokenizer(["a photo of a dog"]))
    )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(want)[0], rtol=2e-5, atol=2e-6)


def test_exported_encoder_backend(encoder, tmp_path):
    """The server runs over a deserialized jax.export artifact too."""
    from sparsify_clip_tpu.export import ExportedEncoder, save_exported

    model, variables = create_model("serve-tiny", dtype=jnp.float32)
    out = str(tmp_path / "art")
    save_exported(model, variables, out, model_name="serve-tiny")
    served = ExportedEncoder(out)
    live = CLIPEncoder(model, variables, tokenizer=None)

    images = _images(3)
    want = np.asarray(live.encode_images(images))
    with BatchingEncoderServer(served, max_batch=4, max_wait_ms=5.0) as server:
        got = np.stack([server.submit_image(im).result(30) for im in images])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_u8_path_matches_host_normalized_fp32(encoder):
    """submit_image_u8 (device-side CLIP normalize) == submit_image of
    the host-normalized pixels, same underlying uint8 payload."""
    from sparsify_clip_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    raw = RNG.integers(0, 256, size=(3, 32, 32, 3)).astype(np.uint8)
    host_norm = ((raw.astype(np.float32) / 255.0) - CLIP_MEAN) / CLIP_STD
    with BatchingEncoderServer(encoder, max_batch=4, max_wait_ms=5.0) as server:
        got_u8 = np.stack([server.submit_image_u8(r).result(30) for r in raw])
        got_f32 = np.stack(
            [server.submit_image(h).result(30) for h in host_norm]
        )
    np.testing.assert_allclose(got_u8, got_f32, rtol=2e-4, atol=2e-5)


def test_u8_resizes_on_device(encoder):
    """A non-native-size uint8 image is squash-resized on device (the
    eval transform) before encode — shape contract only."""
    raw = RNG.integers(0, 256, size=(48, 64, 3)).astype(np.uint8)
    with BatchingEncoderServer(encoder, max_batch=2, max_wait_ms=5.0) as server:
        emb = server.submit_image_u8(raw).result(30)
    assert emb.shape == (TINY.embed_dim,)
    assert np.isclose(np.linalg.norm(emb), 1.0, rtol=1e-5)


def test_u8_rejected_for_backends_without_the_path(encoder, tmp_path):
    from sparsify_clip_tpu.export import ExportedEncoder, save_exported

    model, variables = create_model("serve-tiny", dtype=jnp.float32)
    out = str(tmp_path / "art")
    save_exported(model, variables, out, model_name="serve-tiny")
    with BatchingEncoderServer(ExportedEncoder(out), max_batch=2) as server:
        with pytest.raises(ValueError, match="no uint8 path"):
            server.submit_image_u8(np.zeros((32, 32, 3), np.uint8))
        with pytest.raises(ValueError, match="uint8"):
            server.submit_image_u8(np.zeros((32, 32, 3), np.float32))


def test_replicas_share_the_load():
    """max_batch=1 + slow replicas: both runner threads take batches."""
    import time as _time

    class Slow:
        def __init__(self):
            self.calls = 0

        def encode_images(self, images):
            self.calls += 1
            _time.sleep(0.05)
            return np.ones((images.shape[0], 4), np.float32)

        def encode_tokens(self, tokens):
            return np.ones((tokens.shape[0], 4), np.float32)

    a, b = Slow(), Slow()
    with BatchingEncoderServer([a, b], max_batch=1, max_wait_ms=0.1) as server:
        futs = [server.submit_image(im) for im in _images(6)]
        for f in futs:
            f.result(30)
        stats = server.stats()
    assert sum(stats.replica_batches) == 6
    assert all(n >= 1 for n in stats.replica_batches), stats.replica_batches
    assert a.calls + b.calls == 6 and a.calls >= 1 and b.calls >= 1


def test_replicate_clip_encoder_multi_device():
    """Data-parallel serving over 2 fake devices: per-device variable
    copies, correct embeddings from both replicas."""
    import jax

    from sparsify_clip_tpu.serving import replicate_clip_encoder

    devices = jax.devices()[:2]
    assert len(devices) == 2
    model, variables = create_model("serve-tiny", dtype=jnp.float32)
    replicas = replicate_clip_encoder(model, variables, devices=devices)
    live = CLIPEncoder(model, variables, tokenizer=None)

    images = _images(8)
    want = np.asarray(live.encode_images(images))
    with BatchingEncoderServer(replicas, max_batch=2, max_wait_ms=1.0) as server:
        futs = [server.submit_image(im) for im in images]
        got = np.stack([f.result(60) for f in futs])
        stats = server.stats()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
    assert sum(stats.replica_batches) == stats.batches


def test_warmup_compiles_every_bucket(encoder):
    counting = _CountingEncoder(encoder)
    with BatchingEncoderServer(counting, max_batch=4, max_wait_ms=1.0) as server:
        server.warmup((32, 32, 3), TINY.context_length)
    assert [s[0] for s in counting.image_shapes] == [1, 2, 4]
    assert [s[0] for s in counting.token_shapes] == [1, 2, 4]


def test_cancelled_future_is_skipped_not_fatal(encoder):
    """A client-side cancel() must drop that request only — not crash
    the runner thread with InvalidStateError and wedge the server."""
    ims = _images(2)
    with BatchingEncoderServer(encoder, max_batch=4, max_wait_ms=200.0) as server:
        doomed = server.submit_image(ims[0])
        assert doomed.cancel()  # still queued: cancel wins the race
        live = server.submit_image(ims[1])
        out = live.result(30)
        assert out.shape == (TINY.embed_dim,)
        # the runner thread survived; later batches still work
        later = server.submit_image(ims[0]).result(30)
        assert later.shape == (TINY.embed_dim,)
    assert doomed.cancelled()


def test_wrong_shapes_rejected_at_submit_time(encoder):
    """One wrong-sized payload fails ITS submit, not every co-batched
    request at np.stack time."""
    with BatchingEncoderServer(encoder, max_batch=4, max_wait_ms=5.0) as server:
        with pytest.raises(ValueError, match="resize"):
            server.submit_image(np.zeros((16, 16, 3), np.float32))
        with pytest.raises(ValueError, match="context length"):
            server.submit_tokens(np.zeros((5,), np.int32))
        good = server.submit_image(
            np.zeros((TINY.image_size, TINY.image_size, 3), np.float32)
        )
        assert good.result(30).shape == (TINY.embed_dim,)


def test_u8_mixed_shapes_batch_separately(encoder):
    """Arbitrary u8 staging shapes stay legal (device resize) but never
    share a np.stack: each distinct (H, W) forms its own batches."""
    a = RNG.integers(0, 256, size=(48, 64, 3)).astype(np.uint8)
    b = RNG.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    with BatchingEncoderServer(encoder, max_batch=4, max_wait_ms=50.0) as server:
        futs = [server.submit_image_u8(x) for x in (a, b, a, b)]
        outs = [f.result(30) for f in futs]
    for out in outs:
        assert out.shape == (TINY.embed_dim,)
        assert np.isclose(np.linalg.norm(out), 1.0, rtol=1e-5)
