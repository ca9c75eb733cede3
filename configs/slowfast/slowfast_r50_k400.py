"""SlowFast R50 K400 (tau=16, alpha=8, beta_inv=8).

Ships the tuned TPU execution form by default: ``fast_pack=8``
(time-to-channel packed fast pathway, ``ops/tpack.py``) on top of the
backbone-default ``stem_s2d='train'`` space-to-depth stems. Both are
exact reformulations — same param tree, checkpoints interchangeable,
eval scores bit-identical (tests/test_fast_pack.py,
tests/test_stem_s2d.py, tests/test_multichip_slowfast.py) — measured at
105.2 train clips/s/chip vs 55.7 unpacked (docs/DESIGN.md). Escape
hatch: ``--cfg-options model.backbone.fast_pack=0`` restores the
unpacked graph.

Reference recipe:
``/root/reference/codes/models/backbones/resnet_i3d_slowfast.py:83-207``.
"""
import os

model = dict(
    type='Recognizer3D',
    backbone=dict(type='ResNet_I3D_SlowFast', depth=50, tau=16, alpha=8,
                  beta_inv=8, fast_pack=8, out_indices=(3,),
                  slow_inflate_freq=(0, 0, 1, 1),
                  fast_inflate_freq=(1, 1, 1, 1), norm_eval=False,
                  norm_cfg=dict(type='BN3d', requires_grad=True)),
    cls_head=dict(type='I3DSlowFastClsHead', in_channels=2048 + 256,
                  dropout_ratio=0.5, num_classes=400),
)
test_cfg = dict(average_clips='prob')
compute_dtype = 'bfloat16'
root = os.environ.get('MVF_DATA_ROOT', '/data/')
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True, device=True)
train_pipeline = [
    dict(type='SampleFrames', clip_len=64, frame_interval=1, num_clips=1),
    dict(type='FrameSelector'),
    dict(type='RandomRescaledCrop', input_size=224),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NTHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
test_pipeline = [
    dict(type='SampleFrames', clip_len=64, frame_interval=1, num_clips=10),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='ThreeCrop', crop_size=256),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NTHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
data = dict(
    videos_per_gpu=8, workers_per_gpu=4,
    train=dict(type='RawFramesDataset',
               ann_file='datalist/kinetics400/train_ffmpeg_fps30.txt',
               data_root=root + 'k400_train_rgb_ffmpeg_fps30',
               pipeline=train_pipeline, test_mode=False, modality='RGB',
               filename_tmpl='img_{:05}.jpg'),
    test=dict(type='RawFramesDataset',
              ann_file='datalist/kinetics400/val_ffmpeg_fps30.txt',
              data_root=root + 'k400_val_rgb_ffmpeg_fps30',
              pipeline=test_pipeline, test_mode=True, modality='RGB',
              filename_tmpl='img_{:05}.jpg'))
optimizer = dict(type='SGD', lr=0.01, momentum=0.9, weight_decay=1e-4,
                 nesterov=True)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='cosine', warmup='linear', warmup_ratio=0.01,
                 warmup_iters=8000)
checkpoint_config = dict(interval=10)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
total_epochs = 196
log_level = 'INFO'
work_dir = './experiments/slowfast/k400_r50'
load_from = None
resume_from = None
eval_interval = 10
