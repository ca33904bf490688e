"""ctypes binding for the native (C++) image pipeline.

Loads ``native/imaging/libclip_image.so`` (built by the Makefile there;
:func:`ensure_built` shells out to ``make`` on first use).  Provides
JPEG decode + crop + Pillow-compatible antialiased bilinear resize +
flip + CLIP normalization in one native call — the host pixel path the
reference delegates to PIL/libjpeg + torchvision's C++ transforms
(sparsify_clip.py:1007-1018).

The Python transforms (:mod:`sparsify_clip_tpu.data.transforms`) stay
the behavioral golden; random crop/flip parameters are sampled in
Python with the same per-(seed, epoch, index) streams either way, so
switching backends never changes data order or caption choice — only
the resize arithmetic (native differs from PIL by ~1/255 per channel;
pinned by tests/test_native_imaging.py).

Thread-safety: every function is reentrant; ctypes releases the GIL
during calls, so the loader's worker threads decode in parallel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "imaging",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclip_image.so")


def ensure_built(quiet: bool = True) -> Optional[str]:
    """Build the shared library if missing; returns its path or None."""
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return None
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=quiet
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB_PATH if os.path.exists(_LIB_PATH) else None


class NativeImagePipeline:
    """Native decode/transform for JPEG bytes."""

    def __init__(self, lib_path: Optional[str] = None):
        path = lib_path or ensure_built()
        if path is None:
            raise RuntimeError(
                "native imaging library unavailable (build failed or no toolchain)"
            )
        lib = ctypes.CDLL(path)
        lib.clip_jpeg_dims.restype = ctypes.c_int
        lib.clip_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.clip_decode_transform.restype = ctypes.c_int
        lib.clip_decode_transform.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        self._lib = lib

    def dims(self, jpeg: bytes) -> Tuple[int, int]:
        """(height, width) from the JPEG header only."""
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        rc = self._lib.clip_jpeg_dims(
            jpeg, len(jpeg), ctypes.byref(w), ctypes.byref(h)
        )
        if rc:
            raise ValueError("not a decodable JPEG")
        return h.value, w.value

    def transform(
        self,
        jpeg: bytes,
        size: int,
        crop: Optional[Tuple[int, int, int, int]] = None,
        flip: bool = False,
        uint8: bool = False,
    ) -> np.ndarray:
        """Decode → crop (top, left, h, w; None = full frame squash) →
        resize to (size, size) → optional hflip → (S, S, 3) float32
        CLIP-normalized (or raw uint8 with ``uint8=True``)."""
        top, left, ch, cw = crop if crop is not None else (0, 0, -1, -1)
        out = np.empty(
            (size, size, 3), dtype=np.uint8 if uint8 else np.float32
        )
        rc = self._lib.clip_decode_transform(
            jpeg, len(jpeg), top, left, ch, cw, size,
            int(flip), 1 if uint8 else 0,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc == 1:
            raise ValueError("JPEG decode failed")
        if rc == 2:
            raise ValueError(f"crop window {crop} outside image")
        return out


_pipeline: Optional[NativeImagePipeline] = None


def get_pipeline() -> Optional[NativeImagePipeline]:
    """Singleton accessor; None when the library can't be built."""
    global _pipeline
    if _pipeline is None:
        try:
            _pipeline = NativeImagePipeline()
        except RuntimeError:
            return None
    return _pipeline
