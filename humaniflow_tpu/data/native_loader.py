"""ctypes binding for the native C++ data-loading runtime
(native/dataloader.cc): threaded JPEG decode + bilinear resize straight into
a caller-owned float32 NHWC buffer.

Replaces the reference's torch DataLoader worker processes for background
image loading (train_humaniflow.py:43-54).  Built on demand with g++ (cached
in native/); falls back to cv2 when the toolchain or libjpeg is unavailable.
"""

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "dataloader.cc")
_LIB = os.path.join(_NATIVE_DIR, "libhfdataloader.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC,
                     "-ljpeg", "-lpthread"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.hf_decode_jpeg_batch.restype = ctypes.c_int
        lib.hf_decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_library() is not None


def decode_jpeg_batch(
    paths: List[str], out_wh: int, num_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode + resize a batch of JPEGs → (N, out_wh, out_wh, 3) f32 in [0,1].

    Uses the native threaded decoder when available, else cv2.
    """
    n = len(paths)
    if out is None:
        out = np.empty((n, out_wh, out_wh, 3), np.float32)
    lib = _load_library()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lib.hf_decode_jpeg_batch(
            c_paths, n, out_wh, out_wh,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
        )
        return out

    import cv2

    for i, p in enumerate(paths):
        img = cv2.imread(p)
        if img is None:
            out[i] = 0.0
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        out[i] = (
            cv2.resize(img, (out_wh, out_wh), interpolation=cv2.INTER_LINEAR)
            / 255.0
        )
    return out


class PrefetchingLoader:
    """Double-buffered background prefetcher over an index-batched sampler:
    decodes batch i+1 on a worker thread while batch i is on device — the
    framework's DataLoader-pipelining equivalent."""

    def __init__(self, make_batch_fn, num_batches: int):
        self._make = make_batch_fn
        self._num = num_batches

    def __iter__(self):
        
        q: "queue.Queue" = __import__("queue").Queue(maxsize=2)

        def producer():
            for i in range(self._num):
                q.put(self._make(i))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
