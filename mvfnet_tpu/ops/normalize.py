"""On-device input normalization.

Companion of ``Normalize(device=True)`` (``data/transforms.py``): the host
pipeline ships uint8 BGR frames; this op runs inside the jitted step —
cast, optional /255, BGR->RGB channel flip, mean/std affine — and fuses
into the stem convolution's input processing. Matches the host-side
Normalize math exactly (reference
``codes/datasets/pipelines/augmentations.py:343-396`` semantics).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


def device_normalize(imgs: jnp.ndarray,
                     norm_cfg: Dict[str, Any],
                     compute_dtype: Optional[Any] = None) -> jnp.ndarray:
    """imgs: (..., C) uint8 (or float) channels-last; returns normalized
    float array (compute_dtype or float32)."""
    out_dtype = compute_dtype or jnp.float32
    x = imgs.astype(jnp.float32)
    if norm_cfg.get('div_255'):
        x = x / 255.0
    if norm_cfg.get('to_rgb') and x.shape[-1] == 3:
        x = x[..., ::-1]
    mean = jnp.asarray(np.asarray(norm_cfg['mean'], np.float32))
    std = jnp.asarray(np.asarray(norm_cfg['std'], np.float32))
    return ((x - mean) / std).astype(out_dtype)


def maybe_device_normalize(imgs, norm_cfg, compute_dtype=None):
    """Apply only when the pipeline deferred normalization to the device."""
    if norm_cfg and norm_cfg.get('device'):
        return device_normalize(imgs, norm_cfg, compute_dtype)
    if compute_dtype is not None:
        return imgs.astype(compute_dtype)
    return imgs
