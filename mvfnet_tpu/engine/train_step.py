"""The jitted train step + TrainState.

Replaces the reference's batch_processor + DistOptimizerHook pipeline
(``/root/reference/codes/core/train.py:52-60``,
``dist_utils.py:52-67``): forward, loss, backward, grad clip, and the SGD
update are one compiled XLA program. Data parallelism comes from sharding the
batch axis over the mesh — XLA inserts the gradient all-reduce (the
reference's NCCL ``allreduce_grads``) and keeps replicated params in sync.

BatchNorm note: by default, batch statistics are computed over the *global*
batch under jit (SyncBN semantics) — the numerically-stabler choice and the
standard JAX formulation. The reference trains with *per-GPU* statistics
(non-synced BN, ``/root/reference/codes/models/backbones/resnet.py:496-527``
builds plain ``nn.BatchNorm``); ``local_bn=True`` reproduces those
semantics exactly via ``jax.shard_map`` over the data axis: each mesh
shard normalizes with its own batch statistics and draws an independent
dropout stream (the per-GPU RNG of DDP), gradients are ``pmean``-averaged
(NCCL allreduce), and the stored running stats are the mean of the
per-shard EMAs (the reference keeps rank-0's local EMA; the mean is the
symmetric, launch-order-independent choice — equal in expectation).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import DATA_AXIS, batch_sharding, replicated_sharding


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        params = variables['params']
        return cls(params=params,
                   batch_stats=variables.get('batch_stats', {}),
                   opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))

    def variables(self) -> Dict[str, Any]:
        return {'params': self.params, 'batch_stats': self.batch_stats}


def make_train_step(model,
                    tx: optax.GradientTransformation,
                    mesh=None,
                    input_dtype: Optional[Any] = None,
                    remat: bool = False,
                    donate: bool = True,
                    norm_cfg: Optional[Dict[str, Any]] = None,
                    local_bn: bool = False) -> Callable:
    """Build train_step(state, imgs, labels, rng) -> (state, metrics).

    ``norm_cfg`` (from ``Normalize(device=True)``) moves input normalization
    on-device: the loader ships uint8 frames and the cast/affine fuses into
    the compiled step.

    ``local_bn=True`` (requires ``mesh``) computes BatchNorm batch
    statistics per mesh shard instead of over the global batch — the
    reference's per-GPU BN training semantics (see module docstring)."""
    from ..ops.normalize import maybe_device_normalize

    def loss_fn(params, batch_stats, imgs, labels, dropout_rng):
        apply = model.apply
        if remat:
            apply = jax.checkpoint(
                model.apply,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        losses, new_state = apply(
            {'params': params, 'batch_stats': batch_stats},
            imgs, labels, return_loss=True, train=True,
            rngs={'dropout': dropout_rng}, mutable=['batch_stats'])
        # reference parse_losses: total = sum of entries with 'loss' in key
        total = sum(v for k, v in losses.items() if 'loss' in k)
        return total, (new_state['batch_stats'], losses)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if local_bn:
        if mesh is None:
            raise ValueError('local_bn requires a device mesh')
        from jax.sharding import PartitionSpec as P

        def _pvary(tree):
            # Mark replicated inputs as device-varying BEFORE differentiating,
            # so AD inside the shard is purely local per-shard math and the
            # one explicit pmean below is the DDP gradient average. Without
            # this, in-region AD w.r.t. unvarying inputs inserts implicit
            # psums (grads would come back summed, not averaged).
            cast = getattr(jax.lax, 'pcast', None)
            if cast is not None:
                one = lambda x: cast(x, DATA_AXIS, to='varying')  # noqa: E731
            else:
                one = lambda x: jax.lax.pvary(x, DATA_AXIS)  # noqa: E731
            return jax.tree_util.tree_map(one, tree)

        def _shard_grads(params, batch_stats, imgs, labels, dropout_rng):
            # independent per-shard dropout stream (DDP's per-GPU RNG)
            rng = jax.random.fold_in(dropout_rng,
                                     jax.lax.axis_index(DATA_AXIS))
            (total, (new_bs, losses)), grads = grad_fn(
                _pvary(params), _pvary(batch_stats), imgs, labels, rng)
            pmean = lambda t: jax.lax.pmean(t, DATA_AXIS)  # noqa: E731
            return pmean(total), (pmean(new_bs), pmean(losses)), pmean(grads)

        grad_call = jax.shard_map(
            _shard_grads, mesh=mesh,
            in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), (P(), P()), P()))
    else:
        def grad_call(params, batch_stats, imgs, labels, dropout_rng):
            (total, aux), grads = grad_fn(params, batch_stats, imgs, labels,
                                          dropout_rng)
            return total, aux, grads

    def train_step(state: TrainState, imgs, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        imgs = maybe_device_normalize(imgs, norm_cfg, input_dtype)
        total, (new_bs, losses), grads = grad_call(
            state.params, state.batch_stats, imgs, labels, dropout_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {k: v for k, v in losses.items()}
        metrics['loss'] = total
        metrics['grad_norm'] = optax.global_norm(grads)
        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh=None,
                   norm_cfg: Optional[Dict[str, Any]] = None) -> Callable:
    """Build eval_step(variables, imgs) -> scores for dense testing."""
    from ..ops.normalize import maybe_device_normalize

    def eval_step(variables, imgs):
        imgs = maybe_device_normalize(imgs, norm_cfg)
        return model.apply(variables, imgs, None, return_loss=False)

    if mesh is None:
        return jax.jit(eval_step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(repl, data),
                   out_shardings=repl)
