"""Training orchestration — the framework's Runner equivalent.

The reference delegates its epoch engine to ``mmcv.runner.Runner``
(``/root/reference/codes/core/train.py:176-212``: batch_processor + LR hook +
DistOptimizerHook + checkpoint hook + logger hooks + DistSamplerSeedHook +
eval hook). Here the engine is explicit: a compiled train step in a plain
epoch loop with a small host-side hook protocol for logging, checkpointing,
and mid-train evaluation. LR scheduling and grad clipping live *inside* the
optax transform (compiled), not in hooks.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..data import build_dataloader, build_dataset
from ..parallel.mesh import make_mesh, replicate
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.logging import get_root_logger
from .optim import build_lr_schedule, build_optimizer
from .prefetch import prefetch_to_device
from .train_step import TrainState, make_train_step


class Hook:
    def before_run(self, loop): ...
    def before_epoch(self, loop): ...
    def after_iter(self, loop, metrics): ...
    def after_epoch(self, loop): ...
    def after_run(self, loop): ...


class TextLoggerHook(Hook):
    """Iteration logging (reference mmcv TextLoggerHook via ``log_config``)."""

    def __init__(self, interval: int = 20):
        self.interval = interval
        self._t0 = None
        self._count = 0

    def before_epoch(self, loop):
        self._t0 = time.time()
        self._count = 0

    def after_iter(self, loop, metrics):
        self._count += 1
        if loop.iter % self.interval == 0:
            dt = (time.time() - self._t0) / max(self._count, 1)
            self._t0, self._count = time.time(), 0
            lr = float(loop.lr_schedule(loop.state.step - 1))
            msg = ', '.join(f'{k}: {float(np.asarray(v)):.4f}'
                            for k, v in metrics.items())
            loop.logger.info(
                'Epoch [%d][%d/%d] lr: %.5f, time: %.3fs/iter, %s',
                loop.epoch + 1, loop.inner_iter + 1, loop.iters_per_epoch,
                lr, dt, msg)


class TensorboardLoggerHook(Hook):
    """TensorBoard scalars (reference log_config TensorboardLoggerHook).
    Uses tf.summary when TensorFlow is importable; silently disabled
    otherwise."""

    def __init__(self, interval: int = 20, log_dir: Optional[str] = None):
        self.interval = interval
        self.log_dir = log_dir
        self._writer = None

    def before_run(self, loop):
        if jax.process_index() != 0:
            return
        try:
            import tensorflow as tf
        except ImportError:
            loop.logger.warning('tensorflow unavailable; '
                                'TensorboardLoggerHook disabled')
            return
        log_dir = self.log_dir or os.path.join(loop.work_dir, 'tf_logs')
        self._writer = tf.summary.create_file_writer(log_dir)

    def after_iter(self, loop, metrics):
        if self._writer is None or loop.iter % self.interval != 0:
            return
        import tensorflow as tf
        step = int(loop.state.step)
        with self._writer.as_default():
            for k, v in metrics.items():
                tf.summary.scalar(f'train/{k}', float(np.asarray(v)),
                                  step=step)
            tf.summary.scalar('train/lr',
                              float(loop.lr_schedule(step - 1)), step=step)

    def after_run(self, loop):
        if self._writer is not None:
            self._writer.flush()


class CheckpointHook(Hook):
    """Epoch-interval checkpointing + ``latest`` symlink-equivalent
    (reference ``checkpoint_config`` + auto-resume convention)."""

    def __init__(self, interval: int = 10, out_dir: Optional[str] = None):
        self.interval = interval
        self.out_dir = out_dir

    def after_epoch(self, loop):
        if (loop.epoch + 1) % self.interval != 0 \
                and (loop.epoch + 1) != loop.total_epochs:
            return
        out = self.out_dir or loop.work_dir
        path = os.path.join(out, f'epoch_{loop.epoch + 1}.msgpack')
        meta = {'epoch': loop.epoch + 1, 'iter': int(loop.state.step)}
        save_checkpoint(path, loop.state.variables(),
                        opt_state=loop.state.opt_state, meta=meta)
        latest = os.path.join(out, 'latest.msgpack')
        save_checkpoint(latest, loop.state.variables(),
                        opt_state=loop.state.opt_state, meta=meta)
        loop.logger.info('saved checkpoint %s', path)


class EvalHook(Hook):
    """Mid-train top-k evaluation (reference DistEvalTopKAccuracyHook,
    ``eval_hooks.py:80-98``)."""

    def __init__(self, dataset_cfg: Dict, interval: int = 10,
                 k=(1, 5), videos_per_gpu: int = 1,
                 workers_per_gpu: int = 2):
        self.dataset_cfg = dataset_cfg
        self.interval = interval
        self.k = k
        self.videos_per_gpu = videos_per_gpu
        self.workers_per_gpu = workers_per_gpu
        self._dataset = None

    def after_epoch(self, loop):
        if (loop.epoch + 1) % self.interval != 0:
            return
        from .eval import evaluate_dataset
        if self._dataset is None:
            self._dataset = build_dataset(self.dataset_cfg)
        dataset = self._dataset
        results = evaluate_dataset(
            loop.model, loop.state.variables(), dataset,
            mesh=loop.mesh, videos_per_gpu=self.videos_per_gpu,
            workers_per_gpu=self.workers_per_gpu,
            norm_cfg=_device_norm_cfg(self.dataset_cfg.get('pipeline')))
        from ..utils.metrics import top_k_accuracy
        labels = [info['label'] for info in dataset.video_infos]
        accs = top_k_accuracy(results, labels, k=self.k)
        for kk, acc in zip(self.k, accs):
            loop.logger.info('Eval epoch %d: top-%d acc: %.4f',
                             loop.epoch + 1, kk, acc)
        loop.eval_history.append(
            {'epoch': loop.epoch + 1,
             **{f'top{kk}': a for kk, a in zip(self.k, accs)}})


def _device_norm_cfg(pipeline) -> Optional[Dict]:
    """Extract a Normalize(device=True) node's constants from a pipeline
    config, if present."""
    for op in pipeline or []:
        if isinstance(op, dict) and op.get('type') == 'Normalize' \
                and op.get('device'):
            return {k: v for k, v in op.items() if k != 'type'}
    return None


def _frozen_prefixes_from_backbone(backbone_cfg: Dict) -> tuple:
    """Translate the reference's stage-freezing flags
    (``resnet.py:496-527``: frozen_stages freezes stem+stages 1..k;
    norm_frozen freezes all BN affine params) into optimizer-mask prefixes
    on our param tree."""
    prefixes = []
    frozen_stages = backbone_cfg.get('frozen_stages', -1)
    if frozen_stages is not None and frozen_stages >= 0:
        prefixes += ['backbone_mod/conv1', 'backbone_mod/bn1',
                     'backbone_mod/stem_']
        for i in range(1, frozen_stages + 1):
            prefixes.append(f'backbone_mod/layer{i}_')
    if backbone_cfg.get('norm_frozen'):
        # handled leaf-wise: every bn scale/bias under the backbone
        prefixes.append('__norm_frozen__:backbone_mod')
    return tuple(prefixes)


class TrainLoop:
    def __init__(self, model, dataset, cfg, work_dir: Optional[str] = None,
                 validate: bool = False, logger=None, mesh=None,
                 input_dtype=None, seed: int = 0):
        self.model = model
        self.cfg = cfg
        self.work_dir = work_dir or cfg.get('work_dir', './work_dir')
        self.logger = logger or get_root_logger(cfg.get('log_level', 'INFO'))
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed
        self.eval_history: List[Dict] = []

        dist = jax.process_count() > 1
        n_mesh_devices = int(np.prod(self.mesh.devices.shape))
        local_chips = max(1, n_mesh_devices // jax.process_count())
        self.loader = build_dataloader(
            dataset, cfg.data['videos_per_gpu'], cfg.data['workers_per_gpu'],
            dist=dist, num_gpus=local_chips, shuffle=True, seed=seed)
        self.iters_per_epoch = len(self.loader)
        self.total_epochs = cfg['total_epochs']

        base_lr = cfg.optimizer['lr']
        self.lr_schedule = build_lr_schedule(
            dict(cfg.lr_config), base_lr, self.iters_per_epoch,
            self.total_epochs)
        grad_clip = (cfg.get('optimizer_config') or {}).get('grad_clip')
        frozen = tuple(cfg.get('frozen_param_prefixes', ()) or ())
        frozen += _frozen_prefixes_from_backbone(
            (cfg.get('model') or {}).get('backbone') or {})

        # init model (batch dim irrelevant to parameter shapes -> use 1)
        sample_shape = cfg.get('init_input_shape')
        if sample_shape is None:
            sample_shape = (1,) + dataset[0]['img_group'].shape
        import jax.numpy as jnp
        imgs0 = jnp.zeros(sample_shape, jnp.float32)
        labels0 = jnp.zeros((sample_shape[0],), jnp.int32)
        variables = model.init(jax.random.PRNGKey(seed), imgs0, labels0,
                               return_loss=True, train=False)

        # optional pretrained backbone import (.pth)
        pretrained = (cfg.model.get('backbone') or {}).get('pretrained') \
            if hasattr(cfg, 'model') else None
        if pretrained and os.path.exists(pretrained):
            from ..utils.checkpoint import (import_torch_weights,
                                            load_torch_state_dict)
            modality = cfg.model.get('modality', 'RGB')
            inflate = {'Flow': 10, 'RGBDiff': 15}.get(modality)
            sd = load_torch_state_dict(pretrained)
            variables = import_torch_weights(sd, variables,
                                             inflate_in_channels=inflate,
                                             logger=self.logger)
            self.logger.info('imported pretrained backbone from %s',
                             pretrained)

        self.tx = build_optimizer(variables['params'], dict(cfg.optimizer),
                                  self.lr_schedule, grad_clip, frozen)
        self.state = TrainState.create(variables, self.tx)
        norm_cfg = _device_norm_cfg(
            (cfg.data.get('train') or {}).get('pipeline', []))
        if norm_cfg:
            self.logger.info('device-side normalization enabled '
                             '(uint8 host->HBM transfer)')
        remat = bool(((cfg.get('model') or {}).get('backbone')
                      or {}).get('with_cp'))
        # local_bn=True reproduces the reference's per-GPU (non-synced)
        # BatchNorm training semantics (resnet.py:496-527); the default is
        # global-batch (SyncBN) statistics — documented deviation.
        local_bn = bool(cfg.get('local_bn', False)) and self.mesh is not None
        self.train_step = make_train_step(model, self.tx, mesh=self.mesh,
                                          input_dtype=input_dtype,
                                          norm_cfg=norm_cfg, remat=remat,
                                          local_bn=local_bn)
        self.hooks: List[Hook] = []
        self.epoch = 0
        self.inner_iter = 0
        self.iter = 0

        # resume / load (reference train.py:208-211)
        resume_from = cfg.get('resume_from')
        load_from = cfg.get('load_from')
        if resume_from and os.path.exists(resume_from):
            self.resume(resume_from)
        elif load_from and os.path.exists(load_from):
            self.load_weights(load_from)

    # ------------------------------------------------------------- plumbing
    def register_hook(self, hook: Hook) -> None:
        self.hooks.append(hook)

    def register_default_hooks(self) -> None:
        log_cfg = self.cfg.get('log_config') or {}
        interval = log_cfg.get('interval', 20)
        hook_types = [h.get('type') for h in log_cfg.get('hooks', [])]
        if not hook_types or 'TextLoggerHook' in hook_types:
            self.register_hook(TextLoggerHook(interval))
        if 'TensorboardLoggerHook' in hook_types:
            self.register_hook(TensorboardLoggerHook(interval))
        ckpt_cfg = self.cfg.get('checkpoint_config') or {}
        self.register_hook(CheckpointHook(ckpt_cfg.get('interval', 10)))

    def _call(self, name: str, *args) -> None:
        for h in self.hooks:
            getattr(h, name)(self, *args)

    def resume(self, path: str) -> None:
        from flax import serialization
        variables_sd, opt_sd, meta = load_checkpoint(path)
        self.state = TrainState(
            params=serialization.from_state_dict(self.state.params,
                                                 variables_sd['params']),
            batch_stats=serialization.from_state_dict(
                self.state.batch_stats, variables_sd['batch_stats']),
            opt_state=(serialization.from_state_dict(self.state.opt_state,
                                                     opt_sd)
                       if opt_sd else self.state.opt_state),
            step=jax.numpy.asarray(meta.get('iter', 0), jax.numpy.int32))
        self.epoch = meta.get('epoch', 0)
        self.logger.info('resumed from %s (epoch %d, iter %d)', path,
                         self.epoch, int(self.state.step))

    def load_weights(self, path: str) -> None:
        from flax import serialization
        variables_sd, _, _ = load_checkpoint(path)
        self.state = self.state.replace(
            params=serialization.from_state_dict(self.state.params,
                                                 variables_sd['params']),
            batch_stats=serialization.from_state_dict(
                self.state.batch_stats, variables_sd['batch_stats']))
        self.logger.info('loaded weights from %s', path)

    # ------------------------------------------------------------------ run
    def run(self) -> TrainState:
        os.makedirs(self.work_dir, exist_ok=True)
        self.state = replicate(self.state, self.mesh)
        rng = jax.random.PRNGKey(self.seed + 1)
        self._call('before_run')
        start_epoch = self.epoch
        for epoch in range(start_epoch, self.total_epochs):
            self.epoch = epoch
            self.loader.set_epoch(epoch)  # DistSamplerSeedHook equivalent
            self._call('before_epoch')
            for i, batch in enumerate(
                    prefetch_to_device(self.loader, self.mesh)):
                self.inner_iter = i
                self.state, metrics = self.train_step(
                    self.state, batch['img_group'], batch['label'], rng)
                self.iter += 1
                self._call('after_iter', metrics)
            self._call('after_epoch')
        self._call('after_run')
        return self.state


def train_network(model, dataset, cfg, validate: bool = False,
                  logger=None, extra_hooks=None, **kwargs) -> TrainLoop:
    """Reference-compatible facade (``codes/core/train.py:63-76``)."""
    loop = TrainLoop(model, dataset, cfg, validate=validate, logger=logger,
                     **kwargs)
    loop.register_default_hooks()
    for h in (extra_hooks or []):
        loop.register_hook(h)
    if validate and cfg.get('data') and cfg.data.get('val'):
        loop.register_hook(EvalHook(dict(cfg.data.val),
                                    interval=cfg.get('eval_interval', 10)))
    loop.run()
    return loop
