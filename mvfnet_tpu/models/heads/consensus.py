"""Segmental consensus functions/modules.

- SimpleConsensus: mean over the segment axis (reference
  ``codes/models/heads/segmental_consensuses/simple_consensus.py:41-62``).
- TRN / TRNmultiscale: Temporal Relation Network consensus (reference
  ``relation_consensus.py:7-183``): per-scale frame-subset MLPs over
  concatenated frame features, summed over sampled subsets.
"""

from __future__ import annotations

import itertools
from typing import Any, Optional

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


def _all_relation_subsets(num_frames: int, scale: int) -> np.ndarray:
    """All ordered frame-index subsets of size ``scale`` (the reference's
    ``return_relationset``, ``relation_consensus.py:94-99``)."""
    combos = list(itertools.combinations(range(num_frames), scale))
    return np.array(combos, dtype=np.int32)


def _deterministic_pick(n_combos: int, k: int) -> np.ndarray:
    """Evenly-spaced subset choice used when no RNG is supplied (stable
    eval / test behavior)."""
    if n_combos <= k:
        return np.arange(n_combos, dtype=np.int32)
    return np.linspace(0, n_combos - 1, k).astype(np.int32)


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
    """Multi-scale TRN: one relation MLP per scale in [num_frames..2], each
    summed over min(3, |subsets|) frame subsets.

    Subset selection matches the reference (``relation_consensus.py:73-92``):
    the first (full) scale always uses its single subset; every other scale
    draws ``subsample_scales[i]`` subsets **randomly without replacement per
    forward pass** (``np.random.choice`` in the reference's ``forward``).
    Here the draw uses the flax RNG collection ``'subsets'`` when the caller
    provides it (training); without that RNG the choice falls back to a
    deterministic evenly-spaced pick, giving reproducible evaluation.
    """
    img_feature_dim: int
    num_frames: int
    num_classes: int
    num_bottleneck: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax
        # x: (B, num_frames, img_feature_dim)
        scales = list(range(self.num_frames, 1, -1))
        stochastic = self.has_rng('subsets')
        out = None
        for si, scale in enumerate(scales):
            # one shared MLP per scale, applied to every sampled subset.
            # Positional names mirror the reference's
            # ``fc_fusion_scales.{si}`` ModuleList indices
            # (relation_consensus.py:59-68) so the torch importer can map
            # them without knowing num_frames.
            fc1 = nn.Dense(self.num_bottleneck, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name=f'fc_fusion_{si}_fc1')
            fc2 = nn.Dense(self.num_classes, dtype=self.dtype,
                           param_dtype=jnp.float32,
                           name=f'fc_fusion_{si}_fc2')
            combos = _all_relation_subsets(self.num_frames, scale)
            k = 1 if si == 0 else min(3, len(combos))

            def relation(subset, fc1=fc1, fc2=fc2, scale=scale):
                # subset: (scale,) int32 frame indices (may be traced)
                feats = jnp.take(x, subset, axis=1).reshape(
                    x.shape[0], scale * self.img_feature_dim)
                return fc2(nn.relu(fc1(nn.relu(feats))))

            if si == 0:
                # the largest scale has exactly one subset (reference :75-79)
                acc = relation(jnp.asarray(combos[0]))
            elif stochastic and len(combos) > k:
                pick = jax.random.choice(
                    self.make_rng('subsets'), len(combos), (k,),
                    replace=False)
                subsets = jnp.take(jnp.asarray(combos), pick, axis=0)
                acc = None
                for j in range(k):
                    h = relation(subsets[j])
                    acc = h if acc is None else acc + h
            else:
                acc = None
                for ci in _deterministic_pick(len(combos), k):
                    h = relation(jnp.asarray(combos[int(ci)]))
                    acc = h if acc is None else acc + h
            out = acc if out is None else out + acc
        return out[:, None, :]


def return_trn(relation_type: str, img_feature_dim: int, num_frames: int,
               num_classes: int, dtype: Any = jnp.float32,
               name: Optional[str] = None) -> nn.Module:
    """Factory matching the reference's ``return_TRN``
    (``relation_consensus.py:173-183``).

    NOTE the reference's own TSNClsHead wiring of this factory is broken:
    ``tsn_clshead.py:42-44`` passes ``in_channels`` (e.g. 2048) as
    ``img_feature_dim`` while ``new_fc`` projects to 256
    (``tsn_clshead.py:63-65``), so the reference TRN head forward crashes on
    the ``view`` in ``RelationModule.forward`` (:30-31). We pass the
    projected dim (256) — the TSM/TRN-upstream intent — and pin it against
    the reference's consensus modules composed correctly
    (tests/test_reference_nl_trn_parity.py).
    """
    if relation_type == 'TRN':
        return RelationModule(img_feature_dim=img_feature_dim,
                              num_frames=num_frames, num_classes=num_classes,
                              dtype=dtype, name=name)
    if relation_type == 'TRNmultiscale':
        return RelationModuleMultiScale(img_feature_dim=img_feature_dim,
                                        num_frames=num_frames,
                                        num_classes=num_classes, dtype=dtype,
                                        name=name)
    raise ValueError(f'Unknown TRN type {relation_type}')
