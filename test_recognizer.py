#!/usr/bin/env python3
"""Test CLI — same surface as the reference ``test_recognizer.py:25-145``:
build model + dense test loader, run sharded inference, dump scores ``.pkl``,
print Top-1 / Top-5 / mean-class accuracy."""

import argparse
import pickle


def parse_args():
    parser = argparse.ArgumentParser(description='Test an action recognizer')
    parser.add_argument('config', help='config file path')
    parser.add_argument('checkpoint', help='checkpoint file '
                        '(.msgpack native or .pth torch)')
    parser.add_argument('--out', default=None, help='output pkl of scores')
    parser.add_argument('--fcn_testing', action='store_true',
                        help='fully-convolutional dense testing')
    parser.add_argument('--average-clips', default='prob',
                        choices=['prob', 'score'])
    parser.add_argument('--videos_per_gpu', type=int, default=1)
    parser.add_argument('--view_chunk', type=int, default=None,
                        help='run the dense-test view batch as unrolled '
                             'chunks of this many clips (overrides the '
                             "config's test_cfg; see DESIGN.md)")
    parser.add_argument('--calib_videos', type=int, default=8,
                        help="videos used to calibrate activation scales "
                             "when backbone.quant='int8_static'")
    parser.add_argument('--launcher', default='none',
                        choices=['none', 'env', 'slurm'])
    return parser.parse_args()


def load_model_variables(model, checkpoint, init_shape, logger):
    import jax
    import jax.numpy as jnp
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(init_shape, jnp.float32), None,
                           return_loss=False, train=False)
    if checkpoint.endswith('.pth'):
        from mvfnet_tpu.utils.checkpoint import (import_torch_weights,
                                                 load_torch_state_dict)
        sd = load_torch_state_dict(checkpoint)
        variables = import_torch_weights(sd, variables, logger=logger)
    else:
        from flax import serialization
        from mvfnet_tpu.utils.checkpoint import load_checkpoint
        variables_sd, _, _ = load_checkpoint(checkpoint)
        # restore collection-by-collection: the model may carry collections
        # absent from the checkpoint (e.g. 'quant_stats' calibration state
        # for quant='int8_static'), which keep their freshly-initialized
        # values and are re-calibrated downstream
        variables = {
            k: (serialization.from_state_dict(v, variables_sd[k])
                if k in variables_sd else v)
            for k, v in variables.items()}
    return variables


def main():
    args = parse_args()
    from mvfnet_tpu import Config
    from mvfnet_tpu.data import build_dataset
    from mvfnet_tpu.engine import evaluate_dataset
    from mvfnet_tpu.models import build_recognizer
    from mvfnet_tpu.parallel import init_distributed, make_mesh
    from mvfnet_tpu.utils import (get_root_logger, mean_class_accuracy,
                                  top_k_accuracy)

    if args.launcher != 'none':
        init_distributed(args.launcher)

    cfg = Config.fromfile(args.config)
    logger = get_root_logger(cfg.get('log_level', 'INFO'))

    model_cfg = dict(cfg.model)
    model_cfg['fcn_testing'] = args.fcn_testing
    if 'cls_head' in model_cfg:
        model_cfg['cls_head'] = dict(model_cfg['cls_head'],
                                     fcn_testing=args.fcn_testing)
    test_cfg = dict(cfg.get('test_cfg') or {})
    test_cfg['average_clips'] = args.average_clips
    if args.view_chunk:
        test_cfg['view_chunk'] = args.view_chunk
    model = build_recognizer(model_cfg, train_cfg=None, test_cfg=test_cfg)

    dataset = build_dataset(dict(cfg.data['test']))
    logger.info('test dataset: %d videos', len(dataset))

    sample = dataset[0]
    init_shape = (1,) + sample['img_group'].shape
    variables = load_model_variables(model, args.checkpoint, init_shape,
                                     logger)

    from mvfnet_tpu.engine.train_loop import _device_norm_cfg
    norm_cfg = _device_norm_cfg(cfg.data['test'].get('pipeline'))

    if (cfg.model.get('backbone') or {}).get('quant') == 'int8_static':
        # record per-conv activation abs-max into 'quant_stats' (DESIGN.md
        # "Int8 dense-test"); the dense-test path then reads the static
        # scales with no reduction on the hot path
        import jax.numpy as jnp
        import numpy as np
        from mvfnet_tpu.ops.normalize import maybe_device_normalize
        n_cal = min(args.calib_videos, len(dataset))
        logger.info('calibrating int8 activation scales on %d videos',
                    n_cal)
        for i in range(n_cal):
            sample = dataset[i]
            imgs = jnp.asarray(np.asarray(sample['img_group'])[None])
            imgs = maybe_device_normalize(imgs, norm_cfg)
            _, mut = model.apply(variables, imgs, None, return_loss=False,
                                 mutable=['quant_stats'])
            variables = dict(variables, **mut)

    mesh = make_mesh()
    scores = evaluate_dataset(model, variables, dataset, mesh=mesh,
                              videos_per_gpu=args.videos_per_gpu,
                              workers_per_gpu=cfg.data.get('workers_per_gpu',
                                                           4),
                              progress=True, norm_cfg=norm_cfg)

    import jax
    if jax.process_index() == 0:
        if args.out:
            with open(args.out, 'wb') as f:
                pickle.dump(list(scores), f)
            logger.info('scores written to %s', args.out)
        labels = [info['label'] for info in dataset.video_infos]
        top1, top5 = top_k_accuracy(scores, labels, k=(1, 5))
        mca = mean_class_accuracy(scores, labels)
        print(f'Top-1 Accuracy = {top1 * 100:.02f}')
        print(f'Top-5 Accuracy = {top5 * 100:.02f}')
        print(f'Mean Class Accuracy = {mca * 100:.02f}')


if __name__ == '__main__':
    main()
