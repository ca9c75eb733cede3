#!/usr/bin/env python3
"""Convert a torch ``.pth`` checkpoint (torchvision ImageNet or reference
MVFNet release) into this framework's native msgpack format.

    python tools/convert_checkpoint.py CONFIG src.pth out.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    p = argparse.ArgumentParser(description='.pth -> native checkpoint')
    p.add_argument('config', help='model config (defines the target tree)')
    p.add_argument('src', help='torch .pth checkpoint')
    p.add_argument('out', help='output .msgpack path')
    p.add_argument('--modality', default=None,
                   help='override modality for stem inflation (Flow/RGBDiff)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from mvfnet_tpu import Config
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.utils import get_root_logger
    from mvfnet_tpu.utils.checkpoint import (import_torch_weights,
                                             load_torch_state_dict,
                                             save_checkpoint)

    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    model = build_recognizer(dict(cfg.model),
                             test_cfg=cfg.get('test_cfg')
                             or dict(average_clips='prob'))
    clip_len = cfg.get('clip_len', 8)
    is_3d = cfg.model['type'] in ('Recognizer3D', 'RecognizerC2D')
    shape = ((1, 1, clip_len, 64, 64, 3) if is_3d
             else (1, clip_len, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(shape, jnp.float32), None,
                           return_loss=False, train=False)
    modality = args.modality or cfg.model.get('modality', 'RGB')
    inflate = {'Flow': 10, 'RGBDiff': 15}.get(modality)
    sd = load_torch_state_dict(args.src)
    variables = import_torch_weights(sd, variables,
                                     inflate_in_channels=inflate,
                                     logger=logger)
    save_checkpoint(args.out, variables, meta={'converted_from': args.src})
    logger.info('wrote %s', args.out)


if __name__ == '__main__':
    main()
