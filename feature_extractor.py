#!/usr/bin/env python3
"""Feature-extraction CLI — reference ``feature_extractor.py:23-131``:
run the test pipeline with the head in extract_feat mode and dump
``{video_name: feature}`` JSON."""

import argparse
import json


def parse_args():
    parser = argparse.ArgumentParser(description='Extract video features')
    parser.add_argument('config', help='config file path')
    parser.add_argument('checkpoint', help='checkpoint file')
    parser.add_argument('--out', default='features.json')
    parser.add_argument('--fcn_testing', action='store_true')
    parser.add_argument('--videos_per_gpu', type=int, default=1)
    parser.add_argument('--launcher', default='none',
                        choices=['none', 'env', 'slurm'])
    return parser.parse_args()


def main():
    args = parse_args()
    from mvfnet_tpu import Config
    from mvfnet_tpu.data import build_dataset
    from mvfnet_tpu.engine import evaluate_dataset
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.parallel import init_distributed, make_mesh
    from mvfnet_tpu.utils import get_root_logger
    from test_recognizer import load_model_variables

    if args.launcher != 'none':
        init_distributed(args.launcher)
    cfg = Config.fromfile(args.config)
    logger = get_root_logger(cfg.get('log_level', 'INFO'))

    model_cfg = dict(cfg.model)
    model_cfg['fcn_testing'] = args.fcn_testing
    if 'cls_head' in model_cfg:
        model_cfg['cls_head'] = dict(model_cfg['cls_head'],
                                     fcn_testing=args.fcn_testing,
                                     extract_feat=True)
    model = build_recognizer(model_cfg, test_cfg=dict(average_clips=None))

    dataset = build_dataset(dict(cfg.data['test']))
    sample = dataset[0]
    init_shape = (1,) + sample['img_group'].shape
    variables = load_model_variables(model, args.checkpoint, init_shape,
                                     logger)

    from mvfnet_tpu.engine.train_loop import _device_norm_cfg
    mesh = make_mesh()
    feats = evaluate_dataset(model, variables, dataset, mesh=mesh,
                             videos_per_gpu=args.videos_per_gpu,
                             extract_feat=True, progress=True,
                             norm_cfg=_device_norm_cfg(
                                 cfg.data['test'].get('pipeline')))

    import jax
    if jax.process_index() == 0:
        out = {}
        for info, feat in zip(dataset.video_infos, feats):
            name = info['filename'].split('/')[-1]
            out[name] = [float(x) for x in feat.reshape(-1)]
        with open(args.out, 'w') as f:
            json.dump(out, f)
        logger.info('wrote %d features to %s', len(out), args.out)


if __name__ == '__main__':
    main()
