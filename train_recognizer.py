#!/usr/bin/env python3
"""Train CLI — same surface as the reference ``train_recognizer.py:14-112``.

Differences: ``--launcher`` selects the JAX multi-host bootstrap instead of
torch.distributed; ``--gpus`` is interpreted as the number of local devices
to use (all by default); ``--autoscale-lr`` scales by total chips / 8 like
the reference's linear rule.
"""

import argparse
import os


def parse_args():
    parser = argparse.ArgumentParser(description='Train an action recognizer')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--work_dir', help='dir to save logs and checkpoints')
    parser.add_argument('--resume_from', help='checkpoint to resume from')
    parser.add_argument('--validate', action='store_true',
                        help='run top-k evaluation during training')
    parser.add_argument('--gpus', type=int, default=None,
                        help='number of local devices to use (default: all)')
    parser.add_argument('--seed', type=int, default=None, help='random seed')
    parser.add_argument('--launcher', default='none',
                        choices=['none', 'env', 'slurm'],
                        help='multi-host launcher')
    parser.add_argument('--autoscale-lr', action='store_true',
                        help='scale lr by total devices / 8')
    parser.add_argument('--bf16', action='store_true', default=None,
                        help='force bfloat16 compute (default: config)')
    parser.add_argument('--profile', type=int, default=0, metavar='N',
                        help='capture a jax.profiler trace of the first N '
                             'iterations into WORK_DIR/profile')
    return parser.parse_args()


def main():
    args = parse_args()

    from mvfnet_tpu import Config
    from mvfnet_tpu.parallel import init_distributed, get_dist_info, make_mesh
    from mvfnet_tpu.utils import get_root_logger

    cfg = Config.fromfile(args.config)
    if args.work_dir is not None:
        cfg.work_dir = args.work_dir
    if args.resume_from is not None:
        cfg.resume_from = args.resume_from

    if args.launcher != 'none':
        init_distributed(args.launcher)

    import jax
    import jax.numpy as jnp
    devices = jax.devices()
    if args.gpus is not None and jax.process_count() == 1:
        devices = devices[:args.gpus]
    mesh = make_mesh(devices)

    if args.autoscale_lr:
        cfg.optimizer['lr'] = cfg.optimizer['lr'] * len(devices) / 8

    os.makedirs(cfg.work_dir, exist_ok=True)
    logger = get_root_logger(cfg.get('log_level', 'INFO'),
                             log_file=os.path.join(cfg.work_dir, 'train.log'))
    info = get_dist_info()
    logger.info('distributed info: %s', info)
    logger.info('config: %s', args.config)

    dtype_name = cfg.get('compute_dtype', 'float32')
    if args.bf16:
        dtype_name = 'bfloat16'
    compute_dtype = {'bfloat16': jnp.bfloat16,
                     'float32': jnp.float32}[dtype_name]

    from mvfnet_tpu.data import build_dataset
    from mvfnet_tpu.engine import train_network
    from mvfnet_tpu.models import build_recognizer

    model_cfg = dict(cfg.model)
    model_cfg['dtype'] = compute_dtype
    model = build_recognizer(model_cfg, train_cfg=cfg.get('train_cfg'),
                             test_cfg=cfg.get('test_cfg'))
    dataset = build_dataset(dict(cfg.data['train']))
    if args.seed is not None and hasattr(dataset, 'seed'):
        dataset.seed = args.seed
    logger.info('dataset: %d videos', len(dataset))

    if args.profile:
        from mvfnet_tpu.engine.train_loop import Hook

        class ProfileHook(Hook):
            def __init__(self, n, out_dir):
                self.n, self.out_dir = n, out_dir
                self._active = False

            def after_iter(self, loop, metrics):
                if loop.iter == 1 and not self._active:
                    jax.profiler.start_trace(self.out_dir)
                    self._active = True
                elif loop.iter == 1 + self.n and self._active:
                    jax.profiler.stop_trace()
                    self._active = False
                    logger.info('profiler trace written to %s', self.out_dir)

        extra_hooks = [ProfileHook(args.profile,
                                   os.path.join(cfg.work_dir, 'profile'))]
    else:
        extra_hooks = []

    loop = train_network(model, dataset, cfg, validate=args.validate,
                         logger=logger, mesh=mesh, seed=args.seed or 0,
                         extra_hooks=extra_hooks)


if __name__ == '__main__':
    main()
