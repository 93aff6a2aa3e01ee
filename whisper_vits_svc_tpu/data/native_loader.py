"""ctypes bindings for the native C++ loader (native/svc_loader.cc).

Auto-builds libsvc_loader.so with g++ on first use (cached); every entry point
has a pure-numpy fallback so the framework works without a toolchain. Used by
the data pipeline as the fast path for the per-item wav + 5-npy reads.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsvc_loader.so"))
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Returns the loaded CDLL or None (fallback mode)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.svc_load_wav.restype = ctypes.c_int
        lib.svc_load_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.svc_load_npy_f32.restype = ctypes.c_int
        lib.svc_load_npy_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.svc_load_npy_many.restype = None
        lib.svc_load_npy_many.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def load_wav_native(path: str, max_seconds: float = 600.0, sr_hint: int = 32000):
    """-> (float32 audio, sr) or None on any failure (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    # buffer sized from the file, not the 600 s worst case: a 16-bit PCM
    # wav has <= size/2 samples (a 76 MB empty-alloc per read measurably
    # dominated the batch-build path)
    try:
        max_len = min(int(max_seconds * sr_hint),
                      os.path.getsize(path) // 2 + 16)
    except OSError:
        return None
    buf = np.empty(max_len, np.float32)
    out_len = ctypes.c_int64(0)
    out_sr = ctypes.c_int32(0)
    rc = lib.svc_load_wav(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, ctypes.byref(out_len), ctypes.byref(out_sr),
    )
    if rc != 0:
        return None
    n = min(out_len.value, max_len)
    return buf[:n].copy(), int(out_sr.value)


def load_npy_native(path: str, max_elems: int = 1 << 26):
    lib = get_lib()
    if lib is None:
        return None
    try:  # size the buffer from the file, not the worst case
        max_elems = min(max_elems, os.path.getsize(path) // 4 + 16)
    except OSError:
        return None
    buf = np.empty(max_elems, np.float32)
    shape = np.zeros(4, np.int64)
    ndim = ctypes.c_int32(0)
    rc = lib.svc_load_npy_f32(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_elems, shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.byref(ndim),
    )
    if rc != 0:
        return None
    shp = tuple(int(s) for s in shape[: ndim.value])
    total = int(np.prod(shp))
    if total > max_elems:
        return None
    return buf[:total].reshape(shp).copy()


def load_npy_batch(paths: list[str], max_elems_each: int = 1 << 24,
                   n_threads: int = 0) -> list[np.ndarray | None]:
    """Thread-pooled batch load; returns None entries for failures.

    Each destination buffer is sized from its file (f32 npy data bytes <=
    file size), capped at max_elems_each — exact-size allocs, not
    worst-case ones."""
    lib = get_lib()
    if lib is None:
        return [None] * len(paths)
    n = len(paths)

    def _cap(p):
        # unreadable/missing paths get a token buffer; the loader reports
        # them per-path via status (callers expect None for just that entry)
        try:
            return min(max_elems_each, os.path.getsize(p) // 4 + 16)
        except OSError:
            return 16

    caps = [_cap(p) for p in paths]
    bufs = [np.empty(c, np.float32) for c in caps]
    shapes = np.zeros(n * 4, np.int64)
    ndims = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in bufs]
    )
    c_max = (ctypes.c_int64 * n)(*caps)
    lib.svc_load_npy_many(
        c_paths, c_outs, c_max,
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ndims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, n_threads,
    )
    out = []
    for i in range(n):
        if status[i] != 0:
            out.append(None)
            continue
        shp = tuple(int(s) for s in shapes[4 * i : 4 * i + ndims[i]])
        total = int(np.prod(shp))
        if total > caps[i]:
            # declared element count exceeds the buffer: the C side truncated
            # the data but still reported status 0 — treat as a per-entry
            # failure like load_npy_native does
            out.append(None)
            continue
        out.append(bufs[i][:total].reshape(shp).copy())
    return out
