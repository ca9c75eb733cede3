"""One-off: derive the reference's released checkpoint key inventories.

Executes the ACTUAL reference model constructors (/root/reference/codes)
under a minimal mmcv stub and records each architecture's full
``state_dict()`` name->shape inventory into tests/golden/release_vocab.json.
The committed fixture is what tests/test_release_vocab.py audits the
importer against — so a correlated misreading of the reference cannot pass.

Run from the repo root:  python tools/derive_release_vocab.py
"""

from __future__ import annotations

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = '/root/reference'


def _install_mmcv_stub():
    mmcv = types.ModuleType('mmcv')
    mmcv.__version__ = 'stub'
    mmcv.is_str = lambda x: isinstance(x, str)
    mmcv.mkdir_or_exist = lambda p: os.makedirs(p, exist_ok=True)

    cnn = types.ModuleType('mmcv.cnn')

    def constant_init(module, val, bias=0):
        import torch.nn as nn
        if hasattr(module, 'weight') and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, 'bias') and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def kaiming_init(module, a=0, mode='fan_out', nonlinearity='relu',
                     bias=0, distribution='normal'):
        import torch.nn as nn
        if hasattr(module, 'weight') and module.weight is not None:
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
        if hasattr(module, 'bias') and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def normal_init(module, mean=0, std=1, bias=0):
        import torch.nn as nn
        if hasattr(module, 'weight') and module.weight is not None:
            nn.init.normal_(module.weight, mean, std)
        if hasattr(module, 'bias') and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    cnn.constant_init = constant_init
    cnn.kaiming_init = kaiming_init
    cnn.normal_init = normal_init
    mmcv.cnn = cnn

    runner = types.ModuleType('mmcv.runner')
    runner.get_dist_info = lambda: (0, 1)
    runner.obj_from_dict = None

    class _Hook:  # base classes for the reference's hook subclasses
        def __init__(self, *a, **k):
            pass

    runner.Hook = _Hook
    runner.OptimizerHook = _Hook
    runner.Runner = _Hook
    runner.DistSamplerSeedHook = _Hook
    runner.master_only = lambda fn: fn
    mmcv.runner = runner

    parallel = types.ModuleType('mmcv.parallel')

    class _DC:
        def __init__(self, *a, **k):
            pass

    parallel.DataContainer = _DC
    mmcv.parallel = parallel
    # image/video helpers referenced at pipeline import time
    for attr in ('imread', 'imfrombytes', 'imrescale', 'imresize',
                 'imflip', 'imnormalize', 'impad', 'impad_to_multiple',
                 'imcrop', 'VideoReader', 'ProgressBar'):
        setattr(mmcv, attr, _DC)

    sys.modules['mmcv'] = mmcv
    sys.modules['mmcv.cnn'] = cnn
    sys.modules['mmcv.runner'] = runner
    sys.modules['mmcv.parallel'] = parallel

    # torchvision is only touched by the reference's checkpoint-zoo loader,
    # never by model construction
    tv = types.ModuleType('torchvision')
    tv.models = types.ModuleType('torchvision.models')
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.models'] = tv.models


def main():
    _install_mmcv_stub()
    sys.path.insert(0, REF)
    from codes.models import build_recognizer  # noqa: E402

    mvf_module = dict(type='MVF', n_segment=8, alpha=0.125,
                      mvf_freq=(0, 0, 1, 1), mode='THW')

    archs = {
        # the two released MVFNet checkpoints (README.md model zoo)
        'mvf_r50_8x8': dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=50, out_indices=(3,),
                          norm_eval=False, partial_norm=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            module_cfg=mvf_module,
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', with_avg_pool=False,
                          temporal_feature_size=1, spatial_feature_size=1,
                          dropout_ratio=0.5, in_channels=2048,
                          init_std=0.01, num_classes=400)),
        'mvf_r101_8x8': dict(
            type='Recognizer2D',
            backbone=dict(type='ResNet', depth=101, out_indices=(3,),
                          norm_eval=False, partial_norm=False,
                          norm_cfg=dict(type='BN', requires_grad=True)),
            module_cfg=mvf_module,
            cls_head=dict(type='TSNClsHead', with_avg_pool=False,
                          temporal_feature_size=1, spatial_feature_size=1,
                          dropout_ratio=0.5, in_channels=2048,
                          init_std=0.01, num_classes=400)),
        # mirror configs/i3d/i3d_r50_32x2_k400.py
        'i3d_r50': dict(
            type='Recognizer3D',
            backbone=dict(type='ResNet_I3D', depth=50, out_indices=(3,),
                          pretrained2d=False,
                          inflate_freq=(1, 1, 1, 1), inflate_style='3x1x1',
                          conv1_kernel=(5, 7, 7), conv1_stride_t=2,
                          pool1_stride_t=2, norm_eval=False,
                          norm_cfg=dict(type='BN3d', requires_grad=True)),
            cls_head=dict(type='I3DClsHead', spatial_size=-1,
                          temporal_size=-1, dropout_ratio=0.5,
                          in_channels=2048, num_classes=400)),
        # mirror configs/slowfast/slowfast_r50_k400.py
        'slowfast_r50': dict(
            type='Recognizer3D',
            backbone=dict(type='ResNet_I3D_SlowFast', depth=50,
                          tau=16, alpha=8, beta_inv=8, out_indices=(3,),
                          slow_inflate_freq=(0, 0, 1, 1),
                          fast_inflate_freq=(1, 1, 1, 1),
                          bn_eval=False),
            cls_head=dict(type='I3DSlowFastClsHead',
                          in_channels=2048 + 256, dropout_ratio=0.5,
                          num_classes=400)),
        'tsn_bninception': dict(
            type='Recognizer2D',
            backbone=dict(type='BNInception', bn_eval=False),
            module_cfg=None,
            cls_head=dict(type='TSNClsHead', spatial_size=-1,
                          spatial_type='avg', with_avg_pool=False,
                          temporal_feature_size=1, spatial_feature_size=1,
                          dropout_ratio=0.4, in_channels=1024,
                          init_std=0.001, num_classes=400)),
    }

    import copy
    out = {}
    for name, cfg in archs.items():
        try:
            # deep-copy: the reference pops 'type' out of module_cfg in place
            model = build_recognizer(copy.deepcopy(cfg), train_cfg=None,
                                     test_cfg=dict(average_clips='prob'))
        except Exception as e:
            print(f'{name}: FAILED to build: {e!r}')
            raise
        sd = model.state_dict()
        out[name] = {k: list(v.shape) for k, v in sd.items()}
        print(f'{name}: {len(sd)} keys')

    dst = os.path.join(REPO, 'tests', 'golden', 'release_vocab.json')
    with open(dst, 'w') as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print('wrote', dst)


if __name__ == '__main__':
    main()
