#!/usr/bin/env python3
"""Headline benchmark: MVFNet-R50 8x8 dense-test inference throughput.

Measures per-chip clips/sec for the reference's headline inference config
(ThreeCrop(256) x 10 clips x 8 frames = 30 clip-views per video,
``/root/reference/configs/MVFNet/K400/mvf_kinetics400_2d_rgb_r50_dense.py:101-119``),
bf16 compute, fcn testing, on one device.

Baseline: the reference publishes no clips/sec. BASELINE.json's target is
">=3x per-chip clips/sec of the V100 reference"; we estimate the V100
reference at 170 clips/s (65.8 GFLOPs/clip at ~11 TFLOP/s effective fp32
with cuDNN, eval batch = one video's 30 clip-views) and report
``vs_baseline`` against that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

V100_BASELINE_CLIPS_PER_SEC = 170.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mvfnet_tpu.models import build_recognizer

    on_tpu = jax.default_backend() == 'tpu'
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    clip_len, num_clips, crops, size = 8, 10, 3, 256
    views = num_clips * crops  # 30 clip-views per video

    model = build_recognizer(
        dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                          norm_eval=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', dropout_ratio=0.5,
                          in_channels=2048, init_std=0.01, num_classes=400),
            module_cfg=dict(type='MVF', n_segment=clip_len, alpha=0.125,
                            mvf_freq=(0, 0, 1, 1), mode='THW'),
            fcn_testing=True,
            dtype=dtype,
        ),
        test_cfg=dict(average_clips='prob'))

    shape = (1, views * clip_len, size, size, 3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, None,
                           return_loss=False, train=False)

    @jax.jit
    def fwd(v, imgs):
        return model.apply(v, imgs, None, return_loss=False)

    # warmup / compile
    fwd(variables, x).block_until_ready()
    fwd(variables, x).block_until_ready()

    iters = 10 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, x)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    clips_per_sec = views / dt

    print(json.dumps({
        'metric': 'r50_8x8_dense_test_clips_per_sec_per_chip',
        'value': round(clips_per_sec, 2),
        'unit': 'clips/sec/chip',
        'vs_baseline': round(clips_per_sec / V100_BASELINE_CLIPS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
