#!/usr/bin/env python3
"""One-command accuracy-parity runbook vs the published K400 numbers.

Takes a released checkpoint (torch ``.pth`` or native ``.msgpack``) plus a
user-prepared K400 validation datalist, runs the reference dense-test
protocol (ThreeCrop x 10 uniform clips, prob averaging, fcn testing —
``/root/reference/README.md:52-70``) through the existing eval engine, and
prints Top-1/Top-5 with a pass/fail verdict against the BASELINE.md budget
(published Top-1 within 0.2%).

    python tools/validate_k400.py --checkpoint mvf_R50_8x8.pth \
        --ann datalist/kinetics400/val_ffmpeg_fps30.txt --data-root /data/k400_val

Add ``--quant int8_static [--quant-stages 1 1 0 0]`` to validate the int8
eval path's accuracy on real data (calibrates on ``--calib-videos`` first).
Output: one JSON line {"top1": ..., "expected": ..., "pass": ...}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# Published dense-test Top-1 (BASELINE.md; reference README.md:52-57).
EXPECTED_TOP1 = {
    'mvf_kinetics400_r50_4x16_dense': 74.2,
    'mvf_kinetics400_r50_8x8_dense': 76.0,
    'mvf_kinetics400_r50_8x8_dense_v5e16': 76.0,
    'mvf_kinetics400_r50_16x4_dense': 77.0,
    'mvf_kinetics400_r101_8x8_dense': 77.4,
    'mvf_kinetics400_video_r50_4x16_dense': 74.2,
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='K400 accuracy parity runbook')
    p.add_argument('--checkpoint', required=True,
                   help='released .pth or native .msgpack')
    p.add_argument('--ann', required=True, help='K400 val datalist')
    p.add_argument('--data-root', required=True,
                   help='root of the extracted val rawframes (or videos)')
    p.add_argument('--config',
                   default='configs/mvf/k400/mvf_kinetics400_r50_8x8_dense.py')
    p.add_argument('--expected-top1', type=float, default=None,
                   help='override the published number (percent)')
    p.add_argument('--budget', type=float, default=0.2,
                   help='allowed Top-1 shortfall in percent (BASELINE.md)')
    p.add_argument('--quant', default=None, choices=['int8', 'int8_static'],
                   help='validate the int8 eval path instead of bf16/fp32')
    p.add_argument('--quant-stages', type=int, nargs=4, default=None,
                   metavar=('S1', 'S2', 'S3', 'S4'))
    p.add_argument('--calib-videos', type=int, default=8)
    p.add_argument('--max-videos', type=int, default=None,
                   help='evaluate only the first N videos (smoke runs)')
    p.add_argument('--videos-per-gpu', type=int, default=1)
    p.add_argument('--out', default=None, help='also write the JSON here')
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from test_recognizer import load_model_variables

    from mvfnet_tpu import Config
    from mvfnet_tpu.data import build_dataset
    from mvfnet_tpu.engine import evaluate_dataset
    from mvfnet_tpu.engine.train_loop import _device_norm_cfg
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.parallel import make_mesh
    from mvfnet_tpu.utils import (get_root_logger, mean_class_accuracy,
                                  top_k_accuracy)

    cfg = Config.fromfile(args.config)
    logger = get_root_logger(cfg.get('log_level', 'INFO'))

    model_cfg = dict(cfg.model, fcn_testing=True)
    if 'cls_head' in model_cfg:
        model_cfg['cls_head'] = dict(model_cfg['cls_head'], fcn_testing=True)
    if args.quant:
        model_cfg['backbone'] = dict(model_cfg['backbone'], quant=args.quant)
        if args.quant_stages:
            model_cfg['backbone']['quant_stages'] = tuple(args.quant_stages)
    test_cfg = dict(cfg.get('test_cfg') or {}, average_clips='prob')
    model = build_recognizer(model_cfg, train_cfg=None, test_cfg=test_cfg)

    data_cfg = dict(cfg.data['test'], ann_file=args.ann,
                    data_root=args.data_root)
    dataset = build_dataset(data_cfg)
    if args.max_videos:
        dataset.video_infos = dataset.video_infos[:args.max_videos]
    logger.info('validation dataset: %d videos', len(dataset))

    sample = dataset[0]
    variables = load_model_variables(
        model, args.checkpoint, (1,) + sample['img_group'].shape, logger)
    norm_cfg = _device_norm_cfg(data_cfg.get('pipeline'))

    if args.quant == 'int8_static':
        import jax.numpy as jnp
        import numpy as np
        from mvfnet_tpu.ops.normalize import maybe_device_normalize
        n_cal = min(args.calib_videos, len(dataset))
        logger.info('calibrating int8 scales on %d videos', n_cal)
        for i in range(n_cal):
            imgs = jnp.asarray(np.asarray(dataset[i]['img_group'])[None])
            imgs = maybe_device_normalize(imgs, norm_cfg)
            _, mut = model.apply(variables, imgs, None, return_loss=False,
                                 mutable=['quant_stats'])
            variables = dict(variables, **mut)

    scores = evaluate_dataset(
        model, variables, dataset, mesh=make_mesh(),
        videos_per_gpu=args.videos_per_gpu,
        workers_per_gpu=cfg.data.get('workers_per_gpu', 4),
        progress=True, norm_cfg=norm_cfg)

    import jax
    if jax.process_index() != 0:
        return 0
    labels = [info['label'] for info in dataset.video_infos]
    top1, top5 = top_k_accuracy(scores, labels, k=(1, 5))
    mca = mean_class_accuracy(scores, labels)

    key = os.path.splitext(os.path.basename(args.config))[0]
    expected = (args.expected_top1 if args.expected_top1 is not None
                else EXPECTED_TOP1.get(key))
    result = {
        'config': key,
        'checkpoint': os.path.basename(args.checkpoint),
        'quant': args.quant,
        'n_videos': len(dataset),
        'top1': round(top1 * 100, 2),
        'top5': round(top5 * 100, 2),
        'mean_class_acc': round(mca * 100, 2),
        'expected_top1': expected,
        'budget': args.budget,
        'pass': (bool(top1 * 100 >= expected - args.budget)
                 if expected is not None else None),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(line + '\n')
    if result['pass'] is False:
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
