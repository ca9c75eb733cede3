"""Segmental consensus functions/modules.

- SimpleConsensus: mean over the segment axis (reference
  ``codes/models/heads/segmental_consensuses/simple_consensus.py:41-62``).
- TRN / TRNmultiscale: Temporal Relation Network consensus (reference
  ``relation_consensus.py:7-183``): per-scale frame-subset MLPs over
  concatenated frame features, summed over sampled subsets.
"""

from __future__ import annotations

import itertools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..builder import SEGMENTAL_CONSENSUSES


@SEGMENTAL_CONSENSUSES.register_module
class SimpleConsensus(nn.Module):
    """Mean over ``dim`` (the segment axis)."""
    consensus_type: str = 'avg'
    dim: int = 1

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.consensus_type == 'avg'
        return jnp.mean(x, axis=self.dim, keepdims=True)


def _relation_subsets(num_frames: int, scale: int,
                      max_subsets: int = 3) -> np.ndarray:
    """All ordered frame index subsets of size ``scale``; the reference
    samples min(3, len) of them per forward at train (``relation_consensus.py``
    uses a fixed random subsample at __init__). We fix the first
    ``max_subsets`` deterministic combinations for reproducibility."""
    combos = list(itertools.combinations(range(num_frames), scale))
    if len(combos) > max_subsets:
        idx = np.linspace(0, len(combos) - 1, max_subsets).astype(int)
        combos = [combos[i] for i in idx]
    return np.array(combos, dtype=np.int32)


class RelationModule(nn.Module):
    """Single-scale TRN: MLP over the concatenation of all frame features."""
    img_feature_dim: int
    num_frames: int
    num_classes: int
    num_bottleneck: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, num_frames, img_feature_dim)
        b = x.shape[0]
        h = x.reshape(b, self.num_frames * self.img_feature_dim)
        h = nn.relu(h)
        h = nn.Dense(self.num_bottleneck, dtype=self.dtype,
                     param_dtype=jnp.float32, name='fc1')(h)
        h = nn.relu(h)
        h = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=jnp.float32, name='fc2')(h)
        return h[:, None, :]


class RelationModuleMultiScale(nn.Module):
    """Multi-scale TRN: one relation MLP per scale in [num_frames..2],
    each summed over up to 3 frame subsets."""
    img_feature_dim: int
    num_frames: int
    num_classes: int
    num_bottleneck: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, num_frames, img_feature_dim)
        scales = list(range(self.num_frames, 1, -1))
        out = None
        for si, scale in enumerate(scales):
            # one shared MLP per scale, applied to every sampled subset
            fc1 = nn.Dense(self.num_bottleneck, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name=f'scale{scale}_fc1')
            fc2 = nn.Dense(self.num_classes, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name=f'scale{scale}_fc2')
            subsets = _relation_subsets(self.num_frames, scale)
            acc = None
            for subset in subsets:
                feats = x[:, np.asarray(subset), :].reshape(
                    x.shape[0], scale * self.img_feature_dim)
                h = fc2(nn.relu(fc1(nn.relu(feats))))
                acc = h if acc is None else acc + h
                if si == 0:
                    break  # full-scale relation has exactly one subset
            out = acc if out is None else out + acc
        return out[:, None, :]


def return_trn(relation_type: str, img_feature_dim: int, num_frames: int,
               num_classes: int, dtype: Any = jnp.float32) -> nn.Module:
    """Factory matching the reference's ``return_TRN``."""
    if relation_type == 'TRN':
        return RelationModule(img_feature_dim=img_feature_dim,
                              num_frames=num_frames, num_classes=num_classes,
                              dtype=dtype)
    if relation_type == 'TRNmultiscale':
        return RelationModuleMultiScale(img_feature_dim=img_feature_dim,
                                        num_frames=num_frames,
                                        num_classes=num_classes, dtype=dtype)
    raise ValueError(f'Unknown TRN type {relation_type}')
