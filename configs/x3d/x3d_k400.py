"""X3D K400 (unofficial variant matching the reference's FLOPs-comparison
implementation, resnet_x3d.py)."""
import os

model = dict(
    type='Recognizer3D',
    backbone=dict(type='ResNet_X3D', depth=50, ratio_width=1,
                  ratio_bottleneck=2.25, inflate_style='mobile',
                  norm_eval=False,
                  norm_cfg=dict(type='BN3d', requires_grad=True)),
    cls_head=dict(type='I3DClsHead', spatial_size=-1, temporal_size=-1,
                  dropout_ratio=0.5, in_channels=2048, num_classes=400),
)
test_cfg = dict(average_clips='prob')
compute_dtype = 'bfloat16'
root = os.environ.get('MVF_DATA_ROOT', '/data/')
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True, device=True)
train_pipeline = [
    dict(type='SampleFrames', clip_len=16, frame_interval=5, num_clips=1),
    dict(type='FrameSelector'),
    dict(type='RandomRescaledCrop', input_size=224),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NTHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
test_pipeline = [
    dict(type='SampleFrames', clip_len=16, frame_interval=5, num_clips=10),
    dict(type='FrameSelector'),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='ThreeCrop', crop_size=256),
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NTHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
data = dict(
    videos_per_gpu=16, workers_per_gpu=4,
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
optimizer = dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=5e-5,
                 nesterov=True)
optimizer_config = dict(grad_clip=dict(max_norm=40, norm_type=2))
lr_config = dict(policy='cosine', warmup='linear', warmup_ratio=0.01,
                 warmup_iters=4000)
checkpoint_config = dict(interval=10)
log_config = dict(interval=20, hooks=[dict(type='TextLoggerHook')])
total_epochs = 256
log_level = 'INFO'
work_dir = './experiments/x3d/k400'
load_from = None
resume_from = None
eval_interval = 10
