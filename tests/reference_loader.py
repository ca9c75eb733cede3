"""Load the ACTUAL reference code (``/root/reference/codes``) under torch CPU.

Round-4 verdict, top item: every torch-parity artifact so far validated
against ``tests/torch_oracle.py`` — a from-scratch re-implementation — so a
misreading of the reference could be encoded on both sides invisibly. This
module makes the reference repo itself executable as the oracle:

- installs a minimal ``mmcv`` shim (``is_str``,
  ``cnn.constant_init/kaiming_init/normal_init``, ``runner.obj_from_dict``
  + inert hook stubs) — the only mmcv surface the model/optimizer path
  touches (``/root/reference/codes/utils/registry.py:4``,
  ``codes/models/backbones/resnet.py:4``, ``codes/core/train.py:11``)
- loads the real reference source files as modules under the synthetic
  package ``refcodes.*``, bypassing the package ``__init__``s that would
  drag in dataloaders/NCCL/decord machinery irrelevant to numerics
- stubs ONLY sibling imports that build_optimizer/forward never execute
  (``build_dataloader``, ``DistOptimizerHook``, ``Runner``, ...)

Everything numerics-relevant — ``ResNet``, ``MVF``, ``TSNClsHead``,
``SimpleConsensus``, ``Recognizer2D``, ``BaseRecognizer.average_clip``,
``auto_fp16``, ``core/train.py::build_optimizer`` — is the reference's own
code, byte-identical, executed.

Used by tests/test_reference_oracle_parity.py. Read-only with respect to
/root/reference.
"""

import importlib.util
import logging
import sys
import types

REF = '/root/reference/codes'
_cache = None


# ---------------------------------------------------------------------------
# mmcv shim
# ---------------------------------------------------------------------------

def _install_mmcv_shim():
    if 'mmcv' in sys.modules:
        if getattr(sys.modules['mmcv'], '_mvfnet_tpu_shim', False):
            return
        raise RuntimeError('a real mmcv is installed; shim not needed')
    import torch.nn as nn

    import cv2
    import numpy as np

    # numpy>=1.24 removed the deprecated builtin aliases the 2020-era
    # reference code uses (``resnet_r3d.py:310`` ``.astype(np.int)``,
    # ``datasets/pipelines/loading.py:112``). Restore them so the
    # reference bytes execute unmodified; the aliases are exact synonyms
    # of the builtins, so numerics are unaffected.
    import warnings
    for _alias, _builtin in (('int', int), ('float', float)):
        with warnings.catch_warnings():
            warnings.simplefilter('ignore', FutureWarning)
            if not hasattr(np, _alias):
                setattr(np, _alias, _builtin)

    mmcv = types.ModuleType('mmcv')
    mmcv._mvfnet_tpu_shim = True
    mmcv.__version__ = '0.0.0+mvfnet-tpu-shim'
    mmcv.is_str = lambda x: isinstance(x, str)

    def mkdir_or_exist(dir_name):
        if dir_name:
            import os
            os.makedirs(dir_name, exist_ok=True)

    mmcv.mkdir_or_exist = mkdir_or_exist
    mmcv.is_tuple_of = lambda seq, t: (isinstance(seq, tuple)
                                       and all(isinstance(i, t) for i in seq))

    # -- mmcv.dump/load (pickle flavor only — all reference call sites use
    #    .pkl: core/test.py:124,135) and a silent ProgressBar.
    def _dump(obj, file):
        import pickle
        with open(file, 'wb') as f:
            pickle.dump(obj, f)

    def _load(file):
        import pickle
        with open(file, 'rb') as f:
            return pickle.load(f)

    class _ProgressBar:
        def __init__(self, task_num=0, **kw):
            self.task_num = task_num

        def update(self, *a, **k):
            pass

    mmcv.dump = _dump
    mmcv.load = _load
    mmcv.ProgressBar = _ProgressBar

    # -- image ops used by datasets/pipelines/augmentations.py. Implemented
    #    here to mmcv v0.x's documented semantics (mmcv/image/geometric.py:
    #    thin cv2 wrappers; imresize size is (w, h), imrescale rounds
    #    int(dim*scale+0.5), imcrop is inclusive [x1,y1,x2,y2] clipped to
    #    bounds). NOTE this is the residual trust boundary of the pipeline
    #    oracle: the reference's *decision logic* (crop grids, scale
    #    selection, flip/invert structure) executes as its own bytes, while
    #    these leaf pixel ops are re-stated from the mmcv spec.
    def imresize(img, size, return_scale=False, interpolation='bilinear'):
        interp = {'nearest': cv2.INTER_NEAREST, 'bilinear': cv2.INTER_LINEAR,
                  'bicubic': cv2.INTER_CUBIC, 'area': cv2.INTER_AREA,
                  'lanczos': cv2.INTER_LANCZOS4}[interpolation]
        h, w = img.shape[:2]
        out = cv2.resize(img, tuple(size), interpolation=interp)
        if not return_scale:
            return out
        return out, size[0] / w, size[1] / h

    def imrescale(img, scale, return_scale=False, interpolation='bilinear'):
        h, w = img.shape[:2]
        if isinstance(scale, (float, int)) and not isinstance(scale, bool):
            factor = float(scale)
        else:
            factor = min(max(scale) / max(h, w), min(scale) / min(h, w))
        out = imresize(img, (int(w * factor + 0.5), int(h * factor + 0.5)),
                       interpolation=interpolation)
        if not return_scale:
            return out
        return out, factor

    def imcrop(img, bboxes, scale=1.0):
        assert scale == 1.0
        single = bboxes.ndim == 1
        _bboxes = bboxes[None, ...] if single else bboxes
        h, w = img.shape[:2]
        patches = []
        for bb in _bboxes.astype(np.int32):
            x1 = max(int(bb[0]), 0)
            y1 = max(int(bb[1]), 0)
            x2 = min(int(bb[2]), w - 1)
            y2 = min(int(bb[3]), h - 1)
            patches.append(np.ascontiguousarray(
                img[y1:y2 + 1, x1:x2 + 1, ...]))
        return patches[0] if single else patches

    def imflip(img, direction='horizontal'):
        assert direction in ('horizontal', 'vertical')
        axis = 1 if direction == 'horizontal' else 0
        return np.ascontiguousarray(np.flip(img, axis=axis))

    def iminvert(img):
        return np.full_like(img, 255) - img

    def impad(img, shape, pad_val=0):
        if len(shape) < len(img.shape):
            shape = shape + (img.shape[-1],)
        pad = np.empty(shape, dtype=img.dtype)
        pad[...] = pad_val
        pad[:img.shape[0], :img.shape[1], ...] = img
        return pad

    def impad_to_multiple(img, divisor, pad_val=0):
        ph = int(np.ceil(img.shape[0] / divisor)) * divisor
        pw = int(np.ceil(img.shape[1] / divisor)) * divisor
        return impad(img, (ph, pw), pad_val)

    def imfrombytes(content, flag='color'):
        # mmcv.image.imfrombytes: cv2.imdecode on the raw byte buffer;
        # 'color' -> BGR HxWx3, 'grayscale' -> HxW.
        buf = np.frombuffer(content, np.uint8)
        mode = {'color': cv2.IMREAD_COLOR,
                'grayscale': cv2.IMREAD_GRAYSCALE,
                'unchanged': cv2.IMREAD_UNCHANGED}[flag]
        return cv2.imdecode(buf, mode)

    mmcv.imresize = imresize
    mmcv.imfrombytes = imfrombytes
    mmcv.imrescale = imrescale
    mmcv.imcrop = imcrop
    mmcv.imflip = imflip
    mmcv.iminvert = iminvert
    mmcv.impad = impad
    mmcv.impad_to_multiple = impad_to_multiple

    parallel = types.ModuleType('mmcv.parallel')

    class DataContainer:
        """mmcv.parallel.DataContainer — the container formating.py's
        Collect wraps img_meta in; only ``.data`` is read back in tests."""

        def __init__(self, data, stack=False, padding_value=0,
                     cpu_only=False):
            self._data = data
            self.stack = stack
            self.padding_value = padding_value
            self.cpu_only = cpu_only

        @property
        def data(self):
            return self._data

    parallel.DataContainer = DataContainer
    mmcv.parallel = parallel
    sys.modules['mmcv.parallel'] = parallel

    cnn = types.ModuleType('mmcv.cnn')

    def kaiming_init(module, a=0, mode='fan_out', nonlinearity='relu',
                     bias=0, distribution='normal'):
        if distribution == 'uniform':
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
        if hasattr(module, 'bias') and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0):
        if hasattr(module, 'weight') and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, 'bias') and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def normal_init(module, mean=0, std=1, bias=0):
        nn.init.normal_(module.weight, mean, std)
        if hasattr(module, 'bias') and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    cnn.kaiming_init = kaiming_init
    cnn.constant_init = constant_init
    cnn.normal_init = normal_init

    runner = types.ModuleType('mmcv.runner')

    def obj_from_dict(info, parent=None, default_args=None):
        """mmcv.runner.obj_from_dict — needed for real construction by
        ``codes/core/train.py:116`` (the no-paramwise optimizer path)."""
        assert isinstance(info, dict) and 'type' in info
        args = info.copy()
        obj_type = args.pop('type')
        if isinstance(obj_type, str):
            obj_type = getattr(parent, obj_type)
        if default_args is not None:
            for name, value in default_args.items():
                args.setdefault(name, value)
        return obj_type(**args)

    def get_dist_info():
        return 0, 1

    class _InertStub:
        """Placeholder for Runner/hook classes imported at module level by
        core/train.py but never constructed on the code paths under test."""

        def __init__(self, *a, **k):
            raise NotImplementedError('reference-loader stub')

    runner.obj_from_dict = obj_from_dict
    runner.get_dist_info = get_dist_info
    runner.Runner = _InertStub
    runner.DistSamplerSeedHook = _InertStub
    runner.OptimizerHook = object
    runner.Hook = object

    mmcv.cnn = cnn
    mmcv.runner = runner
    sys.modules['mmcv'] = mmcv
    sys.modules['mmcv.cnn'] = cnn
    sys.modules['mmcv.runner'] = runner


# ---------------------------------------------------------------------------
# module graph construction
# ---------------------------------------------------------------------------

def _fake_package(name):
    mod = types.ModuleType(name)
    mod.__path__ = []  # mark as package
    sys.modules[name] = mod
    return mod


def _load_real(dotted, relpath):
    """Execute the real reference file ``codes/<relpath>`` as module
    ``dotted`` (parents must already be in sys.modules)."""
    spec = importlib.util.spec_from_file_location(dotted, f'{REF}/{relpath}')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    setattr(sys.modules[dotted.rsplit('.', 1)[0]],
            dotted.rsplit('.', 1)[1], mod)
    return mod


def load_reference():
    """Import the reference model + optimizer code; returns a namespace with
    ``build_recognizer``, ``build_optimizer``, ``batch_processor``,
    ``parse_losses`` and the loaded module objects."""
    global _cache
    if _cache is not None:
        return _cache

    _install_mmcv_shim()

    root = _fake_package('refcodes')

    # -- utils: real Registry/build_from_cfg; logger + checkpoint stubbed
    #    (load_checkpoint is only reached when pretrained is a str, which
    #    the parity tests never use — they copy weights explicitly).
    utils = _fake_package('refcodes.utils')
    registry = _load_real('refcodes.utils.registry', 'utils/registry.py')
    utils.Registry = registry.Registry
    utils.build_from_cfg = registry.build_from_cfg
    utils.get_root_logger = lambda **kw: logging.getLogger('refcodes')

    def _no_checkpoint(*a, **k):
        raise NotImplementedError(
            'reference-loader stub: pretrained checkpoints are not used '
            'in parity tests')

    utils.load_checkpoint = _no_checkpoint

    # -- core: the real fp16 decorator chain (auto_fp16 wraps forward).
    core = _fake_package('refcodes.core')
    fp16 = _fake_package('refcodes.core.fp16')
    _load_real('refcodes.core.fp16.utils', 'core/fp16/utils.py')
    decorators = _load_real('refcodes.core.fp16.decorators',
                            'core/fp16/decorators.py')
    fp16.auto_fp16 = decorators.auto_fp16
    fp16.force_fp32 = decorators.force_fp32
    core.auto_fp16 = decorators.auto_fp16

    # -- models: real builder + common + backbones + modules + heads +
    #    recognizers (registration happens at exec time via decorators).
    models = _fake_package('refcodes.models')
    builder = _load_real('refcodes.models.builder', 'models/builder.py')
    common = _fake_package('refcodes.models.common')
    for sub in ('misc', 'norm', 'se_module', 'conv_module'):
        m = _load_real(f'refcodes.models.common.{sub}',
                       f'models/common/{sub}.py')
        for attr in getattr(m, '__all__', None) or [
                a for a in dir(m) if not a.startswith('_')]:
            setattr(common, attr, getattr(m, attr))

    _fake_package('refcodes.models.backbones')
    resnet = _load_real('refcodes.models.backbones.resnet',
                        'models/backbones/resnet.py')
    _fake_package('refcodes.models.modules')
    mvf = _load_real('refcodes.models.modules.MVF', 'models/modules/MVF.py')
    cost = _load_real('refcodes.models.modules.CoST',
                      'models/modules/CoST.py')
    _load_real('refcodes.models.modules.local_attention',
               'models/modules/local_attention.py')
    resnet_i3d = _load_real('refcodes.models.backbones.resnet_i3d',
                            'models/backbones/resnet_i3d.py')
    slowfast = _load_real('refcodes.models.backbones.resnet_i3d_slowfast',
                          'models/backbones/resnet_i3d_slowfast.py')
    x3d = _load_real('refcodes.models.backbones.resnet_x3d',
                     'models/backbones/resnet_x3d.py')
    _load_real('refcodes.models.backbones.resnet_r3d_utils',
               'models/backbones/resnet_r3d_utils.py')
    r3d = _load_real('refcodes.models.backbones.resnet_r3d',
                     'models/backbones/resnet_r3d.py')
    mobilenet = _load_real('refcodes.models.backbones.mobilenet_v2',
                           'models/backbones/mobilenet_v2.py')
    # the real backbones/__init__.py exports InvertedResidual
    # (backbones/__init__.py:4), which recognizer2d.py:87 imports for the
    # MobileNetV2 module-surgery isinstance checks
    sys.modules['refcodes.models.backbones'].InvertedResidual = \
        mobilenet.InvertedResidual
    bninception = _load_real('refcodes.models.backbones.bninception',
                             'models/backbones/bninception.py')
    inception_i3d = _load_real('refcodes.models.backbones.inception_v1_i3d',
                               'models/backbones/inception_v1_i3d.py')

    heads = _fake_package('refcodes.models.heads')
    _load_real('refcodes.models.heads.base', 'models/heads/base.py')
    # tsn_clshead runtime-imports `.segmental_consensuses`
    sc = _fake_package('refcodes.models.heads.segmental_consensuses')
    simple = _load_real(
        'refcodes.models.heads.segmental_consensuses.simple_consensus',
        'models/heads/segmental_consensuses/simple_consensus.py')
    relation = _load_real(
        'refcodes.models.heads.segmental_consensuses.relation_consensus',
        'models/heads/segmental_consensuses/relation_consensus.py')
    sc.SimpleConsensus = simple.SimpleConsensus
    sc.return_TRN = relation.return_TRN
    tsn_head = _load_real('refcodes.models.heads.tsn_clshead',
                          'models/heads/tsn_clshead.py')
    _load_real('refcodes.models.heads.i3d_clshead',
               'models/heads/i3d_clshead.py')
    _load_real('refcodes.models.heads.i3d_slowfast_clshead',
               'models/heads/i3d_slowfast_clshead.py')

    _fake_package('refcodes.models.recognizers')
    _load_real('refcodes.models.recognizers.base',
               'models/recognizers/base.py')
    recognizer2d = _load_real('refcodes.models.recognizers.recognizer2d',
                              'models/recognizers/recognizer2d.py')
    recognizer3d = _load_real('refcodes.models.recognizers.recognizer3d',
                              'models/recognizers/recognizer3d.py')
    models.builder = builder

    # -- core/train.py: the real build_optimizer/batch_processor. Its
    #    module-level sibling imports (dataloaders, DDP wrappers, hooks)
    #    are stubbed — none are touched by the functions under test.
    datasets = _fake_package('refcodes.datasets')
    datasets.build_dataloader = _no_checkpoint
    dist_utils = types.ModuleType('refcodes.core.dist_utils')
    dist_utils.DistOptimizerHook = object
    sys.modules['refcodes.core.dist_utils'] = dist_utils
    evaluation = types.ModuleType('refcodes.core.evaluation')
    evaluation.DistEvalTopKAccuracyHook = object
    sys.modules['refcodes.core.evaluation'] = evaluation
    fp16.Fp16OptimizerHook = object
    parallel = types.ModuleType('refcodes.core.parallel')
    parallel.MMDataParallel = object
    parallel.MMDistributedDataParallel = object
    sys.modules['refcodes.core.parallel'] = parallel
    train = _load_real('refcodes.core.train', 'core/train.py')

    _cache = types.SimpleNamespace(
        build_recognizer=builder.build_recognizer,
        build_optimizer=train.build_optimizer,
        batch_processor=train.batch_processor,
        parse_losses=train.parse_losses,
        Recognizer2D=recognizer2d.Recognizer2D,
        Recognizer3D=recognizer3d.Recognizer3D,
        ResNet=resnet.ResNet,
        ResNet_I3D=resnet_i3d.ResNet_I3D,
        ResNet_I3D_SlowFast=slowfast.ResNet_I3D_SlowFast,
        ResNet_X3D=x3d.ResNet_X3D,
        ResNet_R3D=r3d.ResNet_R3D,
        MobileNetV2=mobilenet.MobileNetV2,
        BNInception=bninception.BNInception,
        InceptionV1_I3D=inception_i3d.InceptionV1_I3D,
        MVF=mvf.MVF,
        SimpleCoST=cost.SimpleCoST,
        TSNClsHead=tsn_head.TSNClsHead,
        train=train,
        root=root,
    )
    return _cache


_pipe_cache = None


def load_reference_pipelines():
    """Import the reference's data-pipeline code
    (``codes/datasets/pipelines/{compose,augmentations,formating}.py`` +
    ``codes/datasets/builder.py``) byte-identical, on top of the model
    loader's module graph. Returns a namespace with the reference
    ``Compose``/``PIPELINES`` and the loaded ``augmentations`` module (whose
    ``random`` attribute tests monkeypatch with a scripted stub to align
    draws with our Generator-based transforms)."""
    global _pipe_cache
    if _pipe_cache is not None:
        return _pipe_cache

    load_reference()  # mmcv shim + refcodes.utils/refcodes.datasets

    dbuilder = _load_real('refcodes.datasets.builder', 'datasets/builder.py')
    _fake_package('refcodes.datasets.pipelines')
    compose = _load_real('refcodes.datasets.pipelines.compose',
                         'datasets/pipelines/compose.py')
    aug = _load_real('refcodes.datasets.pipelines.augmentations',
                     'datasets/pipelines/augmentations.py')
    formating = _load_real('refcodes.datasets.pipelines.formating',
                           'datasets/pipelines/formating.py')

    # loading.py needs ``from ...utils import FileClient``; wire in OUR
    # FileClient — byte-fetch semantics (.get -> bytes) match the
    # reference's (codes/utils/file_client.py), and the parity tests only
    # exercise the 'disk' backend.
    from mvfnet_tpu.utils.file_client import FileClient
    sys.modules['refcodes.utils'].FileClient = FileClient
    loading = _load_real('refcodes.datasets.pipelines.loading',
                         'datasets/pipelines/loading.py')

    # the real dataset classes (torch Dataset + the real Compose): base.py
    # does ``from .pipelines import Compose``
    sys.modules['refcodes.datasets.pipelines'].Compose = compose.Compose
    _load_real('refcodes.datasets.base', 'datasets/base.py')
    rawframes = _load_real('refcodes.datasets.rawframes_dataset',
                           'datasets/rawframes_dataset.py')

    _pipe_cache = types.SimpleNamespace(
        PIPELINES=dbuilder.PIPELINES,
        Compose=compose.Compose,
        augmentations=aug,
        formating=formating,
        loading=loading,
        SampleFrames=loading.SampleFrames,
        FrameSelector=loading.FrameSelector,
        RawFramesDataset=rawframes.RawFramesDataset,
    )
    return _pipe_cache


_ckpt_cache = None


def load_reference_checkpoint():
    """Import the reference's checkpoint I/O (``codes/utils/checkpoint.py``)
    byte-identical: non-strict ``load_state_dict`` with key-diff reporting,
    ``module.`` strip, ``state_dict`` unwrap, ``save_checkpoint``.
    torchvision is stubbed — it is only touched for ``modelzoo://`` URLs,
    which the parity tests never use."""
    global _ckpt_cache
    if _ckpt_cache is not None:
        return _ckpt_cache
    load_reference()
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv.models = types.ModuleType('torchvision.models')
        tv.models.__path__ = []
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tv.models
    _ckpt_cache = _load_real('refcodes.utils.checkpoint',
                             'utils/checkpoint.py')
    return _ckpt_cache


_aux_cache = None


def load_reference_aux():
    """Import the last runnable slice of the reference surface: the loader
    samplers (``codes/datasets/loader/sampler.py``), the non-dist
    ``build_dataloader`` (``loader/build_loader.py``), the FLOPs hook
    (``codes/utils/flops_hook.py`` + ``misc.py``), and the Pkl / Video
    datasets. Adds an ``mmcv.VideoReader`` shim (cv2.VideoCapture with
    CAP_PROP_POS_FRAMES random access — mmcv's own implementation is the
    same cv2 seek) so ``OpenCVDecode`` (loading.py:337-372) and the
    SampleFrames video-probe branch (loading.py:115-122) execute for real;
    parity tests feed intra-only MJPG so seek decode is deterministic."""
    global _aux_cache
    if _aux_cache is not None:
        return _aux_cache

    pipe = load_reference_pipelines()

    import cv2

    mmcv = sys.modules['mmcv']

    class _VideoReader:
        def __init__(self, filename):
            self._cap = cv2.VideoCapture(filename)
            if not self._cap.isOpened():
                raise IOError(f'cannot open {filename}')
            self.frame_cnt = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))

        def __getitem__(self, idx):
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, int(idx))
            ok, frame = self._cap.read()
            return frame if ok else None

        def __len__(self):
            return self.frame_cnt

    mmcv.VideoReader = _VideoReader

    _fake_package('refcodes.datasets.loader')
    sampler = _load_real('refcodes.datasets.loader.sampler',
                         'datasets/loader/sampler.py')
    build_loader = _load_real('refcodes.datasets.loader.build_loader',
                              'datasets/loader/build_loader.py')
    flops_hook = _load_real('refcodes.utils.flops_hook',
                            'utils/flops_hook.py')
    misc = _load_real('refcodes.utils.misc', 'utils/misc.py')
    pkl_dataset = _load_real('refcodes.datasets.pkl_dataset',
                             'datasets/pkl_dataset.py')
    video_dataset = _load_real('refcodes.datasets.video_dataset',
                               'datasets/video_dataset.py')

    _aux_cache = types.SimpleNamespace(
        pipe=pipe,
        GroupSampler=sampler.GroupSampler,
        DistributedSampler=sampler.DistributedSampler,
        DistributedGroupSampler=sampler.DistributedGroupSampler,
        build_dataloader=build_loader.build_dataloader,
        profile=flops_hook.profile,
        params_count=misc.params_count,
        PklDataset=pkl_dataset.PklDataset,
        VideoDataset=video_dataset.VideoDataset,
    )
    return _aux_cache


_disttest_cache = None


def load_reference_disttest():
    """Import the reference's distributed-test / dist-utils / io-utils slice:
    ``core/test.py`` (single_gpu_test + collect_results_{cpu,gpu}),
    ``core/dist_utils.py`` (coalesced grad allreduce), ``utils/logger.py``,
    ``utils/file_client.py``, and the ``RecognizerC2D`` class. The torch
    ``dist`` calls inside test.py/dist_utils.py are NOT stubbed here — parity
    tests monkeypatch the loaded modules' ``dist`` / ``get_dist_info``
    attributes per simulated rank so the reference's own collection and
    reduction logic executes for real."""
    global _disttest_cache
    if _disttest_cache is not None:
        return _disttest_cache

    ref = load_reference()  # mmcv shim + refcodes.models graph

    test_mod = _load_real('refcodes.core.test', 'core/test.py')
    dist_utils = _load_real('refcodes.core.dist_utils', 'core/dist_utils.py')
    logger_mod = _load_real('refcodes.utils.logger', 'utils/logger.py')
    file_client = _load_real('refcodes.utils.file_client',
                             'utils/file_client.py')
    c2d = _load_real('refcodes.models.recognizers.recognizerc2d',
                     'models/recognizers/recognizerc2d.py')

    _disttest_cache = types.SimpleNamespace(
        ref=ref,
        test_mod=test_mod,
        single_gpu_test=test_mod.single_gpu_test,
        collect_results_cpu=test_mod.collect_results_cpu,
        dist_utils=dist_utils,
        allreduce_coalesced=dist_utils._allreduce_coalesced,
        logger_mod=logger_mod,
        FileClient=file_client.FileClient,
        RecognizerC2D=c2d.RecognizerC2D,
    )
    return _disttest_cache


_evalhooks_cache = None


def load_reference_eval_hooks():
    """Import the reference eval-hook module (``core/evaluation/eval_hooks.py``)
    with its real accuracy + parallel-collate dependency chain, so
    ``DistEvalTopKAccuracyHook.evaluate`` (the metric/log composition our
    ``EvalHook`` replaces) executes as an oracle. ``scatter`` needs CUDA
    machinery only at call time; the hook's eval loop is not exercised."""
    global _evalhooks_cache
    if _evalhooks_cache is not None:
        return _evalhooks_cache

    load_reference_aux()  # datasets graph + mmcv shim

    _fake_package('refcodes.core.parallel')
    dc = _load_real('refcodes.core.parallel.data_container',
                    'core/parallel/data_container.py')
    col = _load_real('refcodes.core.parallel.collate',
                     'core/parallel/collate.py')
    par = sys.modules['refcodes.core.parallel']
    par.DataContainer = dc.DataContainer
    par.collate = col.collate
    _load_real('refcodes.core.parallel._functions',
               'core/parallel/_functions.py')
    sg = _load_real('refcodes.core.parallel.scatter_gather',
                    'core/parallel/scatter_gather.py')
    par.scatter = sg.scatter

    _fake_package('refcodes.core.evaluation')
    acc = _load_real('refcodes.core.evaluation.accuracy',
                     'core/evaluation/accuracy.py')
    eval_hooks = _load_real('refcodes.core.evaluation.eval_hooks',
                            'core/evaluation/eval_hooks.py')

    _evalhooks_cache = types.SimpleNamespace(
        accuracy=acc,
        eval_hooks=eval_hooks,
        DistEvalTopKAccuracyHook=eval_hooks.DistEvalTopKAccuracyHook,
        collate=col.collate,
        DataContainer=dc.DataContainer,
    )
    return _evalhooks_cache


_fp16_cache = None


def load_reference_fp16():
    """Import the reference fp16 subsystem (``core/fp16/hooks.py``):
    Fp16OptimizerHook (static loss scale, fp32 master weights),
    wrap_fp16_model / patch_norm_fp32. Runs on CPU with
    ``distributed=False``; the ``allreduce_grads`` import resolves against
    the real ``core/dist_utils.py``."""
    global _fp16_cache
    if _fp16_cache is not None:
        return _fp16_cache

    load_reference_disttest()  # loads refcodes.core.dist_utils

    hooks = _load_real('refcodes.core.fp16.hooks', 'core/fp16/hooks.py')

    _fp16_cache = types.SimpleNamespace(
        hooks=hooks,
        Fp16OptimizerHook=hooks.Fp16OptimizerHook,
        wrap_fp16_model=hooks.wrap_fp16_model,
        patch_norm_fp32=hooks.patch_norm_fp32,
    )
    return _fp16_cache
