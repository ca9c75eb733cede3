"""MVFNet-R50 K400, 4x16 recipe decoding videos on the fly — TPU-native.

Inherits the 8x8 rawframes recipe; swaps in VideoDataset + PyAVDecode
(reference ``configs/MVFNet/K400/mvf_kinetics400_2d_video_r50_dense.py``)
and the 4x16 temporal sampling.
"""

import os

_base_ = './mvf_kinetics400_r50_8x8_dense.py'

clip_len = 4
frame_interval = 16

model = dict(module_cfg=dict(n_segment=clip_len))

root = os.environ.get('MVF_DATA_ROOT', '/data/')
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
_tail = [
    dict(type='Normalize', div_255=False, **img_norm_cfg),
    dict(type='FormatShape', input_format='NHWC'),
    dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
]
train_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=1),
    dict(type='PyAVDecode', accurate=False),
    dict(type='RandomResizedCrop', input_size=224),
    dict(type='Flip', flip_ratio=0.5),
] + _tail
val_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=1),
    dict(type='PyAVDecode', accurate=False),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='CenterCrop', crop_size=224),
    dict(type='Flip', flip_ratio=0),
] + _tail
test_pipeline = [
    dict(type='SampleFrames', clip_len=clip_len,
         frame_interval=frame_interval, num_clips=10),
    dict(type='PyAVDecode', accurate=False),
    dict(type='Resize', scale=(float('inf'), 256), keep_ratio=True),
    dict(type='ThreeCrop', crop_size=256),
    dict(type='Flip', flip_ratio=0),
] + _tail

dataset_type = 'VideoDataset'
data_root = root + 'k400_train_video'
data_root_val = root + 'k400_val_video'
ann_file_train = 'datalist/kinetics400/train_video.txt'
ann_file_val = 'datalist/kinetics400/val_video.txt'
ann_file_test = 'datalist/kinetics400/val_video.txt'

# _delete_: VideoDataset takes no filename_tmpl -> replace, don't merge
data = dict(
    train=dict(_delete_=True, type=dataset_type, ann_file=ann_file_train,
               data_root=data_root, pipeline=train_pipeline,
               test_mode=False, modality='RGB'),
    val=dict(_delete_=True, type=dataset_type, ann_file=ann_file_val,
             data_root=data_root_val, pipeline=val_pipeline,
             test_mode=True, modality='RGB'),
    test=dict(_delete_=True, type=dataset_type, ann_file=ann_file_test,
              data_root=data_root_val, pipeline=test_pipeline,
              test_mode=True, modality='RGB'))

work_dir = './experiments/mvfnet/k400_video_r50_%dx%d_dense' % (
    clip_len, frame_interval)
resume_file = os.path.join(work_dir, 'latest.msgpack')
resume_from = resume_file if os.path.exists(resume_file) else None
