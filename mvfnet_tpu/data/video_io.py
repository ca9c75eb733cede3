"""Video container decoding (host side).

The reference leans on native decoders — decord / PyAV / OpenCV / PIMS
(``/root/reference/codes/datasets/pipelines/loading.py:134-372``). This build
uses cv2 (FFmpeg-backed) as the universal decoder, with the same two modes
the reference exposes:

- accurate: sequential decode up to the max requested index (PyAVDecode
  ``accurate=True`` semantics) — exact frames, slower
- fast: per-index seek (PyAVDecode ``accurate=False`` / OpenCVDecode
  semantics) — constant-time per frame, may land on nearest keyframe chains

Decode failures return ``None`` so ``Compose`` can abort the sample and the
dataset's retry logic can resample (reference ``loading.py:222-225``,
``video_dataset.py:57-76``).
"""

from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np


def probe_num_frames(filename: str) -> int:
    dec = _native_decoder()
    if dec is not None:
        meta = dec.probe(filename)
        if meta is not None and meta[0] > 0:
            return meta[0]
    cap = cv2.VideoCapture(filename)
    try:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()
    if n <= 0:
        raise IOError(f'cannot probe frame count of {filename}')
    return n


_NATIVE_DECODER = None
_NATIVE_TRIED = False


def _native_decoder():
    global _NATIVE_DECODER, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from .native_io import NativeVideoDecoder
            _NATIVE_DECODER = NativeVideoDecoder()
        except Exception:
            _NATIVE_DECODER = None
    return _NATIVE_DECODER


def decode_frames_accurate(filename: str,
                           frame_inds: np.ndarray) -> Optional[List]:
    """Sequential decode to max index, then gather (BGR HWC uint8).

    Prefers the native FFmpeg worker (``native/video_decoder.cpp``); falls
    back to cv2 when the library is not built or the decode fails."""
    dec = _native_decoder()
    if dec is not None:
        frames = dec.decode(filename, frame_inds)
        if frames is not None:
            return frames
    cap = cv2.VideoCapture(filename)
    try:
        if not cap.isOpened():
            return None
        max_ind = int(np.max(frame_inds))
        frames = {}
        wanted = set(int(i) for i in frame_inds)
        for i in range(max_ind + 1):
            ok, frame = cap.read()
            if not ok:
                break
            if i in wanted:
                frames[i] = frame
        if not frames:
            return None
        last = max(frames)
        return [frames.get(min(int(i), last), frames[last])
                for i in frame_inds]
    finally:
        cap.release()


def decode_frames_seek(filename: str,
                       frame_inds: np.ndarray) -> Optional[List]:
    """Per-index seek decode with the reference's None-frame backoff
    (OpenCVDecode, ``loading.py:337-372``): on a failed read, step back up
    to 30 frames until one decodes."""
    cap = cv2.VideoCapture(filename)
    try:
        if not cap.isOpened():
            return None
        out = []
        # Decode unique indices once; reuse for duplicates.
        cache = {}
        for idx in frame_inds:
            idx = int(idx)
            if idx in cache:
                out.append(cache[idx])
                continue
            frame = None
            for back in range(30):
                cap.set(cv2.CAP_PROP_POS_FRAMES, max(idx - back, 0))
                ok, f = cap.read()
                if ok and f is not None:
                    frame = f
                    break
            if frame is None:
                return None
            cache[idx] = frame
            out.append(frame)
        return out
    finally:
        cap.release()
