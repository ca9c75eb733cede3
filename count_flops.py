#!/usr/bin/env python3
"""FLOPs CLI — reference ``count_flops.py:21-53``: build the model from a
config and report GMACs/params via XLA cost analysis (reference GFLOPs
columns count MACs)."""

import argparse


def parse_args():
    parser = argparse.ArgumentParser(description='Count model FLOPs')
    parser.add_argument('config', help='config file path')
    parser.add_argument('--shape', type=int, nargs='+', default=None,
                        help='input shape B S H W C (default: 1 clip_len '
                             '224 224 3)')
    return parser.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from mvfnet_tpu import Config
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.utils.flops import get_flop_stats

    cfg = Config.fromfile(args.config)
    model = build_recognizer(dict(cfg.model),
                             test_cfg=dict(average_clips=None))
    clip_len = cfg.get('clip_len', 8)
    shape = tuple(args.shape) if args.shape else (1, clip_len, 224, 224, 3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(shape, jnp.float32), None,
                           return_loss=False, train=False)
    stats = get_flop_stats(model, variables, shape)
    print(f'input shape: {shape}')
    print(f'params: {stats["params"] / 1e6:.2f} M')
    print(f'GFLOPs (MAC convention, vs reference): {stats["gmacs"]:.3f}')
    print(f'XLA flops: {stats["flops"] / 1e9:.3f} G, '
          f'bytes accessed: {stats["bytes_accessed"] / 1e9:.3f} GB')


if __name__ == '__main__':
    main()
