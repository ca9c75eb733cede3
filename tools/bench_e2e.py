#!/usr/bin/env python3
"""End-to-end dense-test benchmark: real input pipeline -> real model.

Closes the gap between "model is fast" (bench.py, device-resident random
tensors) and "system is fast": JPEG rawframes on disk are decoded by the
threaded loader (native libjpeg pool / cv2), sampled (10 clips x 8
frames), resized + ThreeCrop'd, shipped uint8, normalized on device, and
pushed through the flagship R50-MVF dense test — one wall-clock clips/s
number, plus the host-only and device-only rates that bound it.

Synthetic data: a rawframes tree of ``--videos`` videos x ``--frames``
256x340 JPEGs written once under ``--data-dir`` (defaults to a cached
/tmp tree), so the benchmark needs no dataset download (zero-egress).

Prints ONE JSON line:
  {"metric": "r50_8x8_dense_e2e_clips_per_sec", "value": ..., "unit":
   "clips/sec/chip", "host_only_clips_per_sec": ..., "device_only_...": ,
   "workers": N}

``--train`` switches to the TRAIN hot loop (round-4 verdict item 4,
mirroring the reference's ``codes/core/train.py:249-264``): the train
pipeline (RandomResizedCrop 224 + Flip) feeds batches of ``--batch``
videos x 8 frames into the jitted train step (forward+backward+SGD,
bf16 compute) with one host->device transfer in flight. Reports the
sustained clips/s plus the host-only and device-only bounds and the
device-idle fraction.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_tree(root: str, videos: int, frames: int) -> str:
    import cv2
    import numpy as np
    ann = os.path.join(root, 'ann.txt')
    if os.path.exists(ann):
        # reuse only when the cached tree has the SAME geometry; a stale
        # smaller tree silently starves the loader (0 full batches)
        lines = [l.split() for l in open(ann) if l.strip()]
        if len(lines) == videos and int(lines[0][1]) == frames:
            return ann
    rng = np.random.RandomState(0)
    lines = []
    for v in range(videos):
        d = os.path.join(root, 'frames', f'vid{v:03d}')
        os.makedirs(d, exist_ok=True)
        # moderate-entropy frames: random blocks upscaled, JPEG-realistic
        base = rng.randint(0, 255, (32, 43, 3), np.uint8)
        for i in range(1, frames + 1):
            img = cv2.resize(base, (340, 256), interpolation=cv2.INTER_CUBIC)
            noise = rng.randint(0, 32, (256, 340, 3), np.uint8)
            cv2.imwrite(os.path.join(d, f'img_{i:05}.jpg'),
                        cv2.add(img, noise))
        lines.append(f'vid{v:03d} {frames} {v % 10}')
    with open(ann, 'w') as f:
        f.write('\n'.join(lines))
    return ann


def run_train(args, ann):
    """Train-mode system benchmark: loader+aug -> prefetch -> jitted
    forward/backward/SGD step. Mirrors the reference train hot loop
    (``/root/reference/codes/core/train.py:249-264``: DataLoader workers ->
    batch_processor -> backward/allreduce/clip/step)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvfnet_tpu.data import build_dataset
    from mvfnet_tpu.data.loader import DataLoader
    from mvfnet_tpu.data.sampler import ShardedSampler
    from mvfnet_tpu.engine.optim import build_lr_schedule, build_optimizer
    from mvfnet_tpu.engine.train_step import TrainState, make_train_step
    from mvfnet_tpu.models import build_recognizer

    norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True, device=True)
    pipeline = [
        dict(type='SampleFrames', clip_len=8, frame_interval=8, num_clips=1),
        dict(type='FrameSelector'),
        dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
        dict(type='RandomResizedCrop', input_size=224),
        dict(type='Flip', flip_ratio=0.5),
        dict(type='Normalize', div_255=False, **norm),
        dict(type='FormatShape', input_format='NHWC'),
        dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
    ]
    ds = build_dataset(dict(
        type='RawFramesDataset', ann_file=ann,
        data_root=os.path.join(args.data_dir, 'frames'),
        pipeline=pipeline, test_mode=False, modality='RGB',
        filename_tmpl='img_{:05}.jpg'))

    def fresh_loader():
        return DataLoader(ds, args.batch,
                          ShardedSampler(len(ds), shuffle=True, pad=True,
                                         seed=0),
                          num_workers=args.workers, drop_last=True)

    # --- host-only rate (decode + aug + collate, no device) ---
    for batch in fresh_loader():   # warm page cache / pools
        break
    t0 = time.perf_counter()
    n_b = 0
    for batch in fresh_loader():
        n_b += 1
    host_s = time.perf_counter() - t0
    if n_b == 0:
        raise SystemExit(f'loader yields 0 full batches '
                         f'({args.videos} videos / batch {args.batch}); '
                         f'raise --videos or lower --batch')
    result = {
        'metric': 'r50_8x8_train_e2e_clips_per_sec',
        'unit': 'clips/sec/chip',
        'workers': args.workers,
        'batch': args.batch,
        'host_only_clips_per_sec': round(n_b * args.batch / host_s, 2),
    }
    if args.host_only:
        result['value'] = result['host_only_clips_per_sec']
        print(json.dumps(result))
        return

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_recognizer(
        dict(type='Recognizer2D',
             backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                           norm_eval=False,
                           norm_cfg=dict(type='BN', requires_grad=True)),
             cls_head=dict(type='TSNClsHead', spatial_size=-1,
                           spatial_type='avg', dropout_ratio=0.5,
                           in_channels=2048, init_std=0.01,
                           num_classes=400),
             module_cfg=dict(type='MVF', n_segment=8, alpha=0.125,
                             mvf_freq=(0, 0, 1, 1), mode='THW'),
             dtype=dtype),
        test_cfg=dict(average_clips='prob'))

    first = next(iter(fresh_loader()))
    imgs0 = jax.device_put(np.asarray(first['img_group']))  # uint8
    labels0 = jax.device_put(np.asarray(first['label']))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 224, 224, 3), jnp.float32),
                           jnp.zeros((1,), jnp.int32),
                           return_loss=True, train=False)
    sched = build_lr_schedule(dict(policy='step', step=[90, 130],
                                   warmup='linear', warmup_iters=100,
                                   warmup_ratio=0.01), 0.015, 1000, 150)
    tx = build_optimizer(variables['params'],
                         dict(type='SGD', lr=0.015, momentum=0.9,
                              weight_decay=1e-4, nesterov=True),
                         sched, grad_clip=dict(max_norm=40, norm_type=2))
    state = TrainState.create(variables, tx)
    # donate=False: the e2e loop reuses `state` across a prefetch window
    step = make_train_step(model, tx, mesh=None, norm_cfg=norm,
                           input_dtype=dtype, donate=False)
    key = jax.random.PRNGKey(1)
    state, m = step(state, imgs0, labels0, key)   # compile
    jax.block_until_ready(m['loss'])

    # device-only rate (resident batch, loader excluded)
    reps = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = step(state, imgs0, labels0, key)
    jax.block_until_ready(m['loss'])
    dev_s = (time.perf_counter() - t0) / reps
    result['device_only_clips_per_sec'] = round(args.batch / dev_s, 2)

    # end to end: loader feeds the step with one transfer in flight;
    # several passes over the tree so loader startup amortizes
    t0 = time.perf_counter()
    n = 0
    pending = None
    for _ in range(args.epochs):
        for batch in fresh_loader():
            arr = jax.device_put(np.asarray(batch['img_group']))
            lab = jax.device_put(np.asarray(batch['label']))
            if pending is not None:
                state, m = step(state, *pending, key)
                jax.block_until_ready(m['loss'])
                n += 1
            pending = (arr, lab)
    if pending is not None:
        state, m = step(state, *pending, key)
        jax.block_until_ready(m['loss'])
        n += 1
    e2e_s = time.perf_counter() - t0
    result['host_cores'] = os.cpu_count()
    result['value'] = round(n * args.batch / e2e_s, 2)
    result['steps'] = n
    result['device_idle_frac'] = round(max(0.0, 1 - n * dev_s / e2e_s), 3)
    result['final_loss'] = round(float(m['loss']), 4)
    print(json.dumps(result))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--videos', type=int, default=8)
    p.add_argument('--frames', type=int, default=120)
    p.add_argument('--workers', type=int, default=os.cpu_count() or 4)
    p.add_argument('--data-dir', default='/tmp/mvfnet_e2e_tree')
    p.add_argument('--host-only', action='store_true',
                   help='skip the model; measure the input pipeline alone')
    p.add_argument('--train', action='store_true',
                   help='train hot loop instead of dense test (see module '
                        'docstring)')
    p.add_argument('--batch', type=int, default=12,
                   help='train videos per step (the recipe: 12/chip)')
    p.add_argument('--epochs', type=int, default=1,
                   help='passes over the synthetic tree in the e2e phase')
    args = p.parse_args()

    os.makedirs(args.data_dir, exist_ok=True)
    ann = make_tree(args.data_dir, args.videos, args.frames)

    if args.train:
        run_train(args, ann)
        return

    import numpy as np

    from mvfnet_tpu.data import build_dataset
    from mvfnet_tpu.data.loader import DataLoader
    from mvfnet_tpu.data.sampler import ShardedSampler

    norm = dict(mean=[123.675, 116.28, 103.53],
                std=[58.395, 57.12, 57.375], to_rgb=True, device=True)
    pipeline = [
        dict(type='SampleFrames', clip_len=8, frame_interval=8,
             num_clips=10),
        dict(type='FrameSelector'),
        dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
        dict(type='ThreeCrop', crop_size=256),
        dict(type='Flip', flip_ratio=0),
        dict(type='Normalize', div_255=False, **norm),
        dict(type='FormatShape', input_format='NHWC'),
        dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
    ]
    ds = build_dataset(dict(
        type='RawFramesDataset', ann_file=ann,
        data_root=os.path.join(args.data_dir, 'frames'),
        pipeline=pipeline, test_mode=True, modality='RGB',
        filename_tmpl='img_{:05}.jpg'))
    views = 30  # ThreeCrop x 10 clips

    def fresh_loader():
        return DataLoader(ds, 1, ShardedSampler(len(ds), shuffle=False,
                                                pad=True),
                          num_workers=args.workers, drop_last=False)

    # --- host-only rate (decode + aug + collate, no device) ---
    for batch in fresh_loader():   # warm page cache / pools
        break
    t0 = time.perf_counter()
    n = 0
    for batch in fresh_loader():
        n += 1
    host_s = time.perf_counter() - t0
    host_rate = n * views / host_s

    result = {
        'metric': 'r50_8x8_dense_e2e_clips_per_sec',
        'unit': 'clips/sec/chip',
        'workers': args.workers,
        'videos': n,
        'host_only_clips_per_sec': round(host_rate, 2),
    }

    if not args.host_only:
        import jax
        import jax.numpy as jnp
        from mvfnet_tpu.models import build_recognizer
        from mvfnet_tpu.ops.normalize import maybe_device_normalize

        on_tpu = jax.default_backend() == 'tpu'
        dtype = jnp.bfloat16 if on_tpu else jnp.float32
        model = build_recognizer(
            dict(type='Recognizer2D',
                 backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                               norm_eval=False,
                               norm_cfg=dict(type='BN', requires_grad=True)),
                 cls_head=dict(type='TSNClsHead', spatial_size=-1,
                               spatial_type='avg', dropout_ratio=0.5,
                               in_channels=2048, init_std=0.01,
                               num_classes=400),
                 module_cfg=dict(type='MVF', n_segment=8, alpha=0.125,
                                 mvf_freq=(0, 0, 1, 1), mode='THW'),
                 fcn_testing=True, dtype=dtype),
            test_cfg=dict(average_clips='prob'))

        @jax.jit
        def step(v, imgs):
            imgs = maybe_device_normalize(imgs, norm)
            return model.apply(v, imgs, None, return_loss=False)

        first = next(iter(fresh_loader()))
        imgs0 = jnp.asarray(np.asarray(first['img_group']))
        variables = model.init(jax.random.PRNGKey(0), imgs0, None,
                               return_loss=False, train=False)
        np.asarray(step(variables, imgs0))  # compile

        # device-only rate (same batch resident, loader excluded)
        t0 = time.perf_counter()
        reps = 10 if on_tpu else 1
        for _ in range(reps):
            s = step(variables, imgs0)
        np.asarray(s)
        dev_rate = reps * views / (time.perf_counter() - t0)
        result['device_only_clips_per_sec'] = round(dev_rate, 2)

        # host->device transfer rate for one uint8 video batch. On a real
        # TPU host this is PCIe/DMA (GB/s, negligible); through this dev
        # box's axon network tunnel it is ~MB/s and dominates the combined
        # number — report it so the e2e figure is interpretable.
        host_np = np.asarray(first['img_group'])
        jax.block_until_ready(jax.device_put(host_np))
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(host_np))
        dt = time.perf_counter() - t0
        result['h2d_gbytes_per_sec'] = round(host_np.nbytes / dt / 1e9, 3)
        result['transfer_limited'] = bool(
            host_np.nbytes / dt < 1e9)  # < 1 GB/s: not a real TPU host

        # end to end: loader feeds the jitted step, one transfer in flight
        t0 = time.perf_counter()
        n = 0
        pending = None
        for batch in fresh_loader():
            arr = jax.device_put(np.asarray(batch['img_group']))
            if pending is not None:
                np.asarray(step(variables, pending))
                n += 1
            pending = arr
        if pending is not None:
            np.asarray(step(variables, pending))
            n += 1
        e2e_s = time.perf_counter() - t0
        result['value'] = round(n * views / e2e_s, 2)
    else:
        result['value'] = round(host_rate, 2)

    print(json.dumps(result))


if __name__ == '__main__':
    main()
