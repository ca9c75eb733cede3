"""ctypes binding for the native JPEG decode worker (``native/``).

TPU-native answer to the reference's native decode dependencies (mmcv
imfrombytes / decord, reference
``codes/datasets/pipelines/loading.py:282-475``). Loads
``libmvf_native.so`` when built (``make -C native``); FrameSelector
falls back to cv2 when absent, so the native path is a pure accelerator.
Batch decode releases the GIL for the whole batch and fans out over a C++
thread pool.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), '..', '..', 'native', 'build',
                 'libmvf_native.so'),
    os.environ.get('MVF_NATIVE_LIB', ''),
]


def _load_lib() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        if p and os.path.exists(p):
            lib = ctypes.CDLL(os.path.abspath(p))
            lib.mvf_jpeg_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.mvf_jpeg_probe.restype = ctypes.c_int
            lib.mvf_jpeg_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int)]
            lib.mvf_jpeg_decode.restype = ctypes.c_int
            lib.mvf_jpeg_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
                ctypes.POINTER(ctypes.c_long),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            lib.mvf_jpeg_decode_batch.restype = ctypes.c_int
            if hasattr(lib, 'mvf_video_probe'):
                lib.mvf_video_probe.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
                lib.mvf_video_probe.restype = ctypes.c_int
                lib.mvf_video_decode.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                    ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
                    ctypes.c_long, ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int)]
                lib.mvf_video_decode.restype = ctypes.c_int
            return lib
    return None


_lib: Optional[ctypes.CDLL] = None


def _get_lib() -> Optional[ctypes.CDLL]:
    """Lazily load (and retry) the native library.

    Loading must not be cached at import time: the ``.so`` may be built
    after this module is first imported (e.g. by a test fixture running
    ``make -C native`` mid-suite). A successful load is cached; a miss is
    re-probed on every call — the probe is just ``os.path.exists``.
    """
    global _lib
    if _lib is None:
        _lib = _load_lib()
    return _lib


def available() -> bool:
    return _get_lib() is not None


class NativeImageLoader:
    """Per-image and batch JPEG decoding through the native worker."""

    def __init__(self, num_threads: Optional[int] = None):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError('native library not built '
                               '(run: make -C native)')
        self.lib = lib
        self.num_threads = num_threads or min(os.cpu_count() or 1, 8)

    def probe(self, path: str):
        h = ctypes.c_int()
        w = ctypes.c_int()
        c = ctypes.c_int()
        rc = self.lib.mvf_jpeg_probe(path.encode(), ctypes.byref(h),
                                     ctypes.byref(w), ctypes.byref(c))
        if rc != 0:
            return None
        return int(h.value), int(w.value), int(c.value)

    def load(self, path: str) -> Optional[np.ndarray]:
        shape = self.probe(path)
        if shape is None:
            return None
        h, w, c = shape
        out = np.empty((h, w, 3), np.uint8)
        oh = ctypes.c_int()
        ow = ctypes.c_int()
        rc = self.lib.mvf_jpeg_decode(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out.nbytes, ctypes.byref(oh), ctypes.byref(ow))
        if rc != 0:
            return None
        return out

    def load_batch(self, paths: Sequence[str]) -> Optional[List[np.ndarray]]:
        n = len(paths)
        shapes = [self.probe(p) for p in paths]
        if any(s is None for s in shapes):
            return None
        bufs = [np.empty((h, w, 3), np.uint8) for h, w, _ in shapes]
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        c_outs = (ctypes.POINTER(ctypes.c_ubyte) * n)(
            *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
              for b in bufs])
        c_caps = (ctypes.c_long * n)(*[b.nbytes for b in bufs])
        c_hs = (ctypes.c_int * n)()
        c_ws = (ctypes.c_int * n)()
        c_rc = (ctypes.c_int * n)()
        rc = self.lib.mvf_jpeg_decode_batch(
            c_paths, n, c_outs, c_caps, c_hs, c_ws, c_rc, self.num_threads)
        if rc != 0:
            return None
        return bufs


class NativeVideoDecoder:
    """FFmpeg-backed container decode through the native worker
    (``native/video_decoder.cpp``)."""

    def __init__(self):
        lib = _get_lib()
        if lib is None or not hasattr(lib, 'mvf_video_probe'):
            raise RuntimeError('native video decoder not built '
                               '(run: make -C native)')
        self.lib = lib

    def probe(self, path: str):
        n = ctypes.c_long()
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self.lib.mvf_video_probe(path.encode(), ctypes.byref(n),
                                      ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            return None
        return int(n.value), int(h.value), int(w.value)

    def decode(self, path: str, frame_inds) -> Optional[List[np.ndarray]]:
        meta = self.probe(path)
        if meta is None:
            return None
        _, h, w = meta
        inds = np.asarray(frame_inds, np.int64).reshape(-1)
        n = len(inds)
        out = np.empty((n, h, w, 3), np.uint8)
        ow = ctypes.c_int()
        oh = ctypes.c_int()
        rc = self.lib.mvf_video_decode(
            path.encode(),
            inds.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out.nbytes, ctypes.byref(ow), ctypes.byref(oh))
        if rc != 0:
            return None
        return [out[i] for i in range(n)]
