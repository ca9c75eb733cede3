"""Inference / dense-testing loops.

Replaces the reference's single/multi-GPU test loops and their pickle-based
result gathering (``/root/reference/codes/core/test.py:12-185``): each
process infers its sampler shard through one jitted eval step; cross-host
collection is a ``process_allgather`` of score arrays (no pickle->CUDA-tensor
round trip). Results are re-interleaved rank-strided and truncated to
dataset length, exactly like ``collect_results_gpu`` (:147-185).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np

from ..data import DataLoader, ShardedSampler
from ..parallel.mesh import make_mesh, replicate
from .train_step import make_eval_step


def evaluate_dataset(model, variables, dataset, mesh=None,
                     videos_per_gpu: int = 1, workers_per_gpu: int = 2,
                     extract_feat: bool = False,
                     progress: bool = False,
                     norm_cfg=None) -> np.ndarray:
    """Run inference over the whole dataset; returns (N, K) scores in
    dataset order (or (N, C) features when ``extract_feat``)."""
    from ..models.common import check_quant_calibrated
    check_quant_calibrated(model, variables)
    mesh = mesh if mesh is not None else make_mesh()
    rank = jax.process_index()
    world = jax.process_count()
    sampler = ShardedSampler(len(dataset), world, rank, shuffle=False,
                             pad=True)
    loader = DataLoader(dataset, videos_per_gpu, sampler,
                        num_workers=workers_per_gpu, drop_last=False)

    step = _cached_eval_step(model, extract_feat, _freeze(norm_cfg))

    variables = replicate(variables, mesh)
    out: List[np.ndarray] = []
    n_batches = len(loader)

    def device_batches():
        # keep one transfer in flight ahead of compute (JAX transfers are
        # async; holding the next batch's device array overlaps H2D with
        # the current step)
        pending = None
        for batch in loader:
            nxt = jax.device_put(np.asarray(batch['img_group']))
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    for bi, imgs in enumerate(device_batches()):
        scores = step(variables, imgs)
        out.append(np.asarray(scores))
        if progress and rank == 0 and (bi % 20 == 0 or bi == n_batches - 1):
            print(f'\r[eval] {bi + 1}/{n_batches}', end='', flush=True)
    if progress and rank == 0:
        print()
    if not out:
        # pad=True guarantees every rank >=1 sample whenever the dataset is
        # non-empty, so an empty shard can only mean an empty dataset — fail
        # loudly instead of feeding a shapeless array to the reorder below.
        if len(dataset) == 0:
            return np.zeros((0, 0))
        raise RuntimeError(
            f'rank {rank}: produced no scores for a non-empty dataset '
            f'({len(dataset)} videos, shard {len(sampler)})')
    local = np.concatenate(out, axis=0)
    # every rank must contribute an identical shard size or the strided
    # (world, per_rank, K) reorder after allgather silently misassigns
    # scores (extract_feat yields a fixed number of rows per video, so
    # rows must be an exact multiple of the shard length)
    assert local.shape[0] % len(sampler) == 0, (
        f'shard size mismatch: got {local.shape[0]} rows for '
        f'{len(sampler)} sampler indices')

    if world > 1:
        from jax.experimental import multihost_utils
        gathered = multihost_utils.process_allgather(local)
        return reorder_rank_strided(gathered, world, len(dataset))
    return local[:len(dataset)]


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple, np.ndarray)):
        return tuple(_freeze(v) for v in obj)
    return obj


_EVAL_STEP_CACHE: Dict[Any, Any] = {}


def _cached_eval_step(model, extract_feat: bool, norm_key):
    """One jitted eval step per (model, mode, norm) — repeated
    mid-train evals reuse the compiled executable instead of re-jitting.

    The entry holds a strong reference to ``model``: the key uses
    ``id(model)``, and without the strong ref a new model allocated at a
    GC'd model's address would silently reuse the stale compiled step."""
    key = (id(model), extract_feat, norm_key)
    if key in _EVAL_STEP_CACHE:
        return _EVAL_STEP_CACHE[key][1]
    norm_cfg = ({k: (np.asarray(v) if isinstance(v, tuple) else v)
                 for k, v in norm_key} if norm_key else None)
    if extract_feat:
        from ..ops.normalize import maybe_device_normalize

        def fn(variables, imgs):
            imgs = maybe_device_normalize(imgs, norm_cfg)
            return model.apply(variables, imgs,
                               method=lambda m, a: m.forward_extract_feat(a))
        step = jax.jit(fn)
    else:
        step = make_eval_step(model, mesh=None, norm_cfg=norm_cfg)
    _EVAL_STEP_CACHE[key] = (model, step)
    return step


def reorder_rank_strided(gathered: np.ndarray, world: int,
                         n: int) -> np.ndarray:
    """Invert the rank-strided shard layout: global index i was evaluated by
    rank ``i % world`` at slot ``i // world`` (reference
    ``collect_results_gpu`` reorder + truncate, ``test.py:171-185``)."""
    per_rank = gathered.reshape(world, -1, gathered.shape[-1])
    interleaved = per_rank.transpose(1, 0, 2).reshape(-1, gathered.shape[-1])
    return interleaved[:n]
