"""Frame/video loading pipeline ops.

Covers the reference's loader vocabulary
(``/root/reference/codes/datasets/pipelines/loading.py:134-475``):
FrameSelector (raw JPEG frames), video decoders (PyAV/decord/OpenCV/PIMS all
map onto the cv2/FFmpeg decoder here, keeping their config names), and
PklLoader. The optional C++ decode worker (``native/``) plugs in underneath
``FrameSelector``/decoders transparently when built.
"""

from __future__ import annotations

import os.path as osp
import pickle
from typing import List, Optional

import cv2
import numpy as np

from .builder import PIPELINES
from .video_io import decode_frames_accurate, decode_frames_seek


def _imfrombytes(buf: bytes, flag: str = 'color') -> Optional[np.ndarray]:
    arr = np.frombuffer(buf, dtype=np.uint8)
    cv_flag = cv2.IMREAD_COLOR if flag == 'color' else cv2.IMREAD_GRAYSCALE
    return cv2.imdecode(arr, cv_flag)


def _load_image_file(filepath: str, flag: str = 'color'
                     ) -> Optional[np.ndarray]:
    try:
        with open(filepath, 'rb') as f:
            return _imfrombytes(f.read(), flag)
    except Exception:
        return None


@PIPELINES.register_module
class FrameSelector:
    """Load raw frames by index (reference ``loading.py:417-475``).

    Frame filenames are 1-based (``filename_tmpl.format(frame_idx + 1)``).
    A corrupt image falls back to the first successfully-loaded frame
    (reference ``loading.py:434-437``).
    """

    def __init__(self, io_backend: str = 'disk', use_native: bool = True,
                 **kwargs):
        from ..utils.file_client import FileClient
        self.io_backend = io_backend
        self.file_client = FileClient(io_backend, **kwargs)
        # The native C++ batch decoder reads from the local filesystem; it
        # only applies when frames live on disk.
        self.use_native = use_native and io_backend == 'disk'
        self._native = None
        if self.use_native:
            try:
                from .native_io import NativeImageLoader
                self._native = NativeImageLoader()
            except Exception:
                self._native = None
        self.backup = None

    def _load(self, filepath: str, flag: str = 'color'):
        if self._native is not None and flag == 'color':
            img = self._native.load(filepath)
            if img is not None:
                return img
        if self.io_backend == 'disk':
            img = _load_image_file(filepath, flag)
        else:
            # reference wires FileClient into frame loading
            # (loading.py:425-431): fetch bytes from the backend, decode here
            try:
                img = _imfrombytes(self.file_client.get(filepath), flag)
            except Exception:
                img = None
        if img is None:
            img = self.backup
        return img

    def __call__(self, results):
        directory = results['filename']
        tmpl = results['filename_tmpl']
        inds = np.asarray(results['frame_inds']).reshape(-1)
        imgs: List[np.ndarray] = []
        modality = results.get('modality', 'RGB')
        if self._native is not None and modality in ('RGB', 'RGBDiff'):
            # One native call decodes the whole clip on the C++ thread pool.
            paths = [osp.join(directory, tmpl.format(int(i) + 1))
                     for i in inds]
            batch = self._native.load_batch(paths)
            if batch is not None:
                results['img_group'] = batch
                results['ori_shape'] = batch[0].shape
                return results
            # fall through to the per-frame path (handles corrupt frames)
        for frame_idx in inds:
            frame_idx = int(frame_idx)
            if modality in ('RGB', 'RGBDiff'):
                cur = [self._load(osp.join(directory,
                                           tmpl.format(frame_idx + 1)))]
            elif modality == 'Flow':
                x = self._load(osp.join(
                    directory, tmpl.format('x', frame_idx + 1)), 'grayscale')
                y = self._load(osp.join(
                    directory, tmpl.format('y', frame_idx + 1)), 'grayscale')
                cur = [x, y]
            else:
                raise ValueError(f'unsupported modality {modality}')
            if any(c is None for c in cur):
                return None  # unrecoverable; let dataset retry
            imgs.extend(cur)
            if self.backup is None:
                self.backup = cur[0]
        results['img_group'] = imgs
        results['ori_shape'] = imgs[0].shape
        return results


class _VideoDecodeBase:
    """Shared video-decode op: exceptions/failures return None so the
    dataset retry loop can resample (reference ``loading.py:222-225``)."""

    accurate = True

    def __call__(self, results):
        inds = np.asarray(results['frame_inds']).reshape(-1)
        try:
            if self.accurate:
                frames = decode_frames_accurate(results['filename'], inds)
            else:
                frames = decode_frames_seek(results['filename'], inds)
        except Exception:
            frames = None
        if frames is None:
            return None
        results['img_group'] = frames
        results['ori_shape'] = frames[0].shape
        return results


@PIPELINES.register_module
class PyAVDecode(_VideoDecodeBase):
    """Config-compatible with reference PyAVDecode (``loading.py:134-231``);
    decoding runs on cv2/FFmpeg."""

    def __init__(self, multi_thread: bool = False, accurate: bool = True):
        self.multi_thread = multi_thread
        self.accurate = accurate


@PIPELINES.register_module
class DecordDecode(_VideoDecodeBase):
    """Config-compatible with reference DecordDecode (``loading.py:282-334``)."""

    def __init__(self, **kwargs):
        self.accurate = True


@PIPELINES.register_module
class OpenCVDecode(_VideoDecodeBase):
    """Reference OpenCVDecode (``loading.py:337-372``): seek-based access."""

    def __init__(self, **kwargs):
        self.accurate = False


@PIPELINES.register_module
class PIMSDecode(_VideoDecodeBase):
    """Config-compatible with reference PIMSDecode (``loading.py:234-279``)."""

    def __init__(self, **kwargs):
        self.accurate = True


@PIPELINES.register_module
class PklLoader:
    """Decode JPEG bytes from a pickled list (reference ``loading.py:375-414``)."""

    def __call__(self, results):
        with open(results['filename'], 'rb') as f:
            container = pickle.load(f)
        inds = np.asarray(results['frame_inds']).reshape(-1)
        img_group = []
        for frame_idx in inds:
            img = _imfrombytes(container[int(frame_idx)])
            if img is None:
                return None
            img_group.append(img)
        results['img_group'] = img_group
        results['ori_shape'] = img_group[0].shape
        return results
