"""ctypes binding for the native (C++) CLIP BPE tokenizer.

Loads ``native/tokenizer/libclip_bpe.so`` (built by the Makefile
there; :func:`ensure_built` shells out to ``make`` on first use when a
compiler is available).  Interface-compatible with
:class:`sparsify_clip_tpu.text.tokenizer.CLIPTokenizer`, which remains
the behavioral golden — parity is enforced by tests on ASCII corpora
(the native scanner treats non-ASCII byte-level; see clip_bpe.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Union

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "tokenizer",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclip_bpe.so")


def ensure_built(quiet: bool = True) -> Optional[str]:
    """Build the shared library if missing; returns its path or None."""
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return None
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return _LIB_PATH if os.path.exists(_LIB_PATH) else None


class NativeCLIPTokenizer:
    """Batch tokenizer backed by the C++ core."""

    def __init__(
        self,
        merges_path: Optional[str] = None,
        context_length: int = 77,
        lib_path: Optional[str] = None,
    ):
        path = lib_path or ensure_built()
        if path is None:
            raise RuntimeError(
                "native tokenizer library unavailable (build failed or no toolchain)"
            )
        from sparsify_clip_tpu.text.tokenizer import default_bpe_path

        merges_path = merges_path or default_bpe_path()
        self._lib = ctypes.CDLL(path)
        self._lib.clip_bpe_create.restype = ctypes.c_void_p
        self._lib.clip_bpe_create.argtypes = [ctypes.c_char_p]
        self._lib.clip_bpe_destroy.argtypes = [ctypes.c_void_p]
        self._lib.clip_bpe_encode_batch.restype = ctypes.c_int
        self._lib.clip_bpe_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        # The C++ core reads plain-text merges; gunzip the canonical
        # bpe_simple_vocab_16e6.txt.gz to a temp file transparently.
        if merges_path and merges_path.endswith(".gz") and os.path.exists(merges_path):
            import gzip
            import tempfile

            with gzip.open(merges_path, "rt", encoding="utf-8") as fh:
                data = fh.read()
            tmp = tempfile.NamedTemporaryFile(
                "w", suffix=".txt", delete=False, encoding="utf-8"
            )
            tmp.write(data)
            tmp.close()
            merges_path = tmp.name
        merges = (merges_path or "").encode()
        self._handle = self._lib.clip_bpe_create(merges)
        if not self._handle:
            raise RuntimeError("clip_bpe_create failed")
        self.context_length = context_length
        self.sot_id = 49406
        self.eot_id = 49407
        self.vocab_size = 49408

    def __call__(
        self, texts: Union[str, Sequence[str]], context_length: Optional[int] = None
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        ctx = context_length or self.context_length
        n = len(texts)
        out = np.zeros((n, ctx), dtype=np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        rc = self._lib.clip_bpe_encode_batch(
            self._handle, arr, n, ctx,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError(f"clip_bpe_encode_batch failed: rc={rc}")
        return out

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.clip_bpe_destroy(self._handle)
        except Exception:
            pass
