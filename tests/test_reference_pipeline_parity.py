"""Data-pipeline parity against the ACTUAL reference pipeline code.

Extends the round-5 authentic-oracle program (tests/reference_loader.py)
from the model/optimizer stack to the host data pipeline: the reference's
own ``codes/datasets/pipelines/{compose,augmentations,formating}.py``
execute byte-identical (mmcv image-leaf ops shimmed to the mmcv v0.x spec
— see the disclosure in ``reference_loader._install_mmcv_shim``) and our
``mvfnet_tpu.data`` transforms must reproduce their pixels exactly.

Randomness alignment: the reference draws from the global ``random``
module / ``np.random``; our transforms draw from a per-sample
``numpy.random.Generator``. The parity tests script BOTH sides with the
same decision sequence (a queue-backed stub replacing
``augmentations.random`` on the reference side and ``results['rng']`` on
ours), so every geometry/selection code path is compared pixel-for-pixel
without depending on RNG API coincidences:

- deterministic ops (Resize keep/fixed, CenterCrop, ThreeCrop, TenCrop,
  Pad, Normalize, FormatShape NCHW/NCTHW incl. the uniform-sampling and
  Flow branches): direct equality
- MultiScaleCrop: every fixed-offset candidate (all 13 more_fix_crop
  offsets x scale pairs) and the free-crop branch
  (``augmentations.py:71-192``)
- RandomResizedCrop: accept-on-first-attempt (both swap branches) and the
  10-rejection center-square fallback (``augmentations.py:600-668``) on
  square inputs — square because the reference's bounds checks swap H/W
  (disclosed divergence, ``transforms.py::RandomResizedCrop`` docstring);
  on squares the two conventions coincide and pixels must match exactly
- RandomRescaledCrop (``augmentations.py:671-707``), same square-input
  argument for its axis-0/axis-1 offset convention
- Flip at ratio 0/1 for RGB and Flow (x-plane inversion,
  ``augmentations.py:195-228``)

Known, asserted-on divergences: ours adds ``results['rng']``, returns
numpy (not torch/DataContainer) from Collect, and Normalize does the
arithmetic in float32 numpy vs the reference's cv2-in-place double-math
(compared at atol 1e-4 on unit-scale outputs).
"""

import numpy as np
import pytest

from mvfnet_tpu.data.pipeline import Compose

from reference_loader import load_reference_pipelines

H, W = 240, 320
NORM = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])


@pytest.fixture(scope='module')
def refpipe():
    return load_reference_pipelines()


def make_frames(n=4, h=H, w=W, seed=0, flow=False):
    rng = np.random.RandomState(seed)
    if flow:
        return [rng.randint(0, 256, (h, w)).astype(np.uint8)
                for _ in range(n)]
    return [rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            for _ in range(n)]


def results_for(frames, modality='RGB', num_clips=1, clip_len=None,
                rng=None):
    r = dict(img_group=[f.copy() for f in frames], modality=modality,
             num_clips=num_clips,
             clip_len=clip_len if clip_len is not None
             else len(frames) // num_clips)
    if rng is not None:
        r['rng'] = rng
    return r


def run_both(refpipe, cfgs, frames, rng=None, **kw):
    """Run the reference Compose and ours on identical fresh inputs."""
    ref_out = refpipe.Compose(cfgs)(results_for(frames, **kw))
    our_out = Compose(cfgs)(results_for(frames, rng=rng, **kw))
    return ref_out, our_out


def assert_groups_equal(ref_out, our_out, atol=0):
    a, b = ref_out['img_group'], our_out['img_group']
    if isinstance(a, np.ndarray):
        assert a.shape == b.shape, (a.shape, b.shape)
        np.testing.assert_allclose(b, a, rtol=0, atol=atol)
    else:
        assert len(a) == len(b)
        for i, (x, y) in enumerate(zip(a, b)):
            np.testing.assert_allclose(y, x, rtol=0, atol=atol,
                                       err_msg=f'frame {i}')


# ---------------------------------------------------------------------------
# scripted randomness
# ---------------------------------------------------------------------------

class ScriptedRandom:
    """Replaces the ``random`` module inside the loaded reference
    augmentations: pops decisions from a queue. ``choice`` consumes an
    INDEX so both sides can be driven by one integer script."""

    def __init__(self, script):
        self.q = list(script)

    def choice(self, seq):
        return seq[int(self.q.pop(0))]

    def randint(self, a, b):          # inclusive, like random.randint
        v = int(self.q.pop(0))
        assert a <= v <= b, (a, v, b)
        return v

    def uniform(self, a, b):
        v = float(self.q.pop(0))
        assert a <= v <= b, (a, v, b)
        return v

    def random(self):
        return float(self.q.pop(0))


class ScriptedGen:
    """numpy.random.Generator stand-in for ``results['rng']``."""

    def __init__(self, script):
        self.q = list(script)

    def integers(self, lo, hi):       # exclusive high, like Generator
        v = int(self.q.pop(0))
        assert lo <= v < hi, (lo, v, hi)
        return v

    def uniform(self, a, b):
        return float(self.q.pop(0))

    def random(self):
        return float(self.q.pop(0))


# ---------------------------------------------------------------------------
# deterministic ops
# ---------------------------------------------------------------------------

class TestDeterministicOps:
    def test_dense_eval_pipeline_threecrop(self, refpipe):
        """The headline dense-test spatial pipeline: short-side rescale ->
        ThreeCrop(256) -> Normalize -> NCTHW."""
        cfgs = [
            dict(type='Resize', scale=(np.inf, 256), keep_ratio=True),
            dict(type='ThreeCrop', crop_size=256),
            dict(type='Normalize', to_rgb=True, **NORM),
            dict(type='FormatShape', input_format='NCTHW'),
        ]
        ref_out, our_out = run_both(refpipe, cfgs, make_frames(4),
                                    num_clips=2, clip_len=2)
        assert ref_out['img_group'].shape[0] == 6  # 3 crops x 2 clips
        assert_groups_equal(ref_out, our_out, atol=1e-4)

    def test_centercrop_pipeline(self, refpipe):
        cfgs = [
            dict(type='Resize', scale=(np.inf, 256), keep_ratio=True),
            dict(type='CenterCrop', crop_size=224),
            dict(type='Normalize', to_rgb=False, div_255=True, **NORM),
            dict(type='FormatShape', input_format='NCHW'),
        ]
        ref_out, our_out = run_both(refpipe, cfgs, make_frames(3),
                                    num_clips=3, clip_len=1)
        assert_groups_equal(ref_out, our_out, atol=1e-6)

    def test_tencrop(self, refpipe):
        cfgs = [dict(type='Resize', scale=(np.inf, 256), keep_ratio=True),
                dict(type='TenCrop', crop_size=224)]
        ref_out, our_out = run_both(refpipe, cfgs, make_frames(2),
                                    num_clips=2, clip_len=1)
        assert len(ref_out['img_group']) == 20
        assert_groups_equal(ref_out, our_out)

    def test_fixed_resize(self, refpipe):
        cfgs = [dict(type='Resize', scale=(340, 256), keep_ratio=False)]
        ref_out, our_out = run_both(refpipe, cfgs, make_frames(2))
        assert ref_out['img_group'][0].shape == (256, 340, 3)
        assert_groups_equal(ref_out, our_out)

    def test_pad_to_multiple(self, refpipe):
        cfgs = [dict(type='Pad', divisor=32)]
        ref_out, our_out = run_both(refpipe, cfgs,
                                    make_frames(2, h=250, w=250))
        assert ref_out['img_group'][0].shape == (256, 256, 3)
        assert_groups_equal(ref_out, our_out)

    def test_formatshape_uniform_sampling_branch(self, refpipe):
        """clip_len==1 & num_clips>1: the reference's uniform-sampling
        NCTHW branch (formating.py:160-167)."""
        cfgs = [dict(type='CenterCrop', crop_size=64),
                dict(type='FormatShape', input_format='NCTHW')]
        ref_out, our_out = run_both(refpipe, cfgs, make_frames(4),
                                    num_clips=4, clip_len=1)
        assert ref_out['img_group'].shape == (1, 3, 4, 64, 64)
        assert_groups_equal(ref_out, our_out)

    def test_flow_formatshape(self, refpipe):
        """Flow x/y pairs stack into 2-channel frames before NCTHW
        (formating.py:152-157)."""
        cfgs = [dict(type='FormatShape', input_format='NCTHW')]
        frames = make_frames(4, h=64, w=64, flow=True)
        ref_out, our_out = run_both(refpipe, cfgs, frames,
                                    modality='Flow', num_clips=1, clip_len=2)
        assert ref_out['img_group'].shape == (1, 2, 2, 64, 64)
        assert_groups_equal(ref_out, our_out)


# ---------------------------------------------------------------------------
# random ops, scripted
# ---------------------------------------------------------------------------

class TestFlip:
    @pytest.mark.parametrize('ratio', [0.0, 1.0])
    def test_rgb(self, refpipe, ratio):
        cfgs = [dict(type='Flip', flip_ratio=ratio)]
        ref_out, our_out = run_both(refpipe, cfgs, make_frames(3),
                                    rng=np.random.default_rng(0))
        assert ref_out['flip'] is (ratio == 1.0)
        assert our_out['flip'] is (ratio == 1.0)
        assert_groups_equal(ref_out, our_out)

    @pytest.mark.parametrize('ratio', [0.0, 1.0])
    def test_flow_inverts_x_planes(self, refpipe, ratio):
        cfgs = [dict(type='Flip', flip_ratio=ratio)]
        frames = make_frames(4, flow=True)
        ref_out, our_out = run_both(refpipe, cfgs, frames, modality='Flow',
                                    clip_len=2,
                                    rng=np.random.default_rng(0))
        assert_groups_equal(ref_out, our_out)


class TestMultiScaleCrop:
    N_OFFSETS = 13  # more_fix_crop grid (augmentations.py:160-186)

    @pytest.mark.parametrize('pair_idx', [0, 3, 7])
    @pytest.mark.parametrize('offset_idx', list(range(13)))
    def test_fix_crop_every_offset(self, refpipe, pair_idx, offset_idx,
                                   monkeypatch):
        cfgs = [dict(type='MultiScaleCrop', input_size=224,
                     scales=[1, .875, .75, .66], max_distort=1,
                     fix_crop=True, more_fix_crop=True)]
        frames = make_frames(2)
        monkeypatch.setattr(refpipe.augmentations, 'random',
                            ScriptedRandom([pair_idx, offset_idx]))
        ref_out = refpipe.Compose(cfgs)(results_for(frames))
        our_out = Compose(cfgs)(results_for(
            frames, rng=ScriptedGen([pair_idx, offset_idx])))
        np.testing.assert_array_equal(our_out['crop_bbox'],
                                      ref_out['crop_bbox'])
        assert_groups_equal(ref_out, our_out)

    def test_free_crop(self, refpipe, monkeypatch):
        cfgs = [dict(type='MultiScaleCrop', input_size=224,
                     scales=[1, .875], fix_crop=False)]
        frames = make_frames(2)
        script = [2, 17, 5]  # pair idx -> (240, 210); w_offset; h_offset
        monkeypatch.setattr(refpipe.augmentations, 'random',
                            ScriptedRandom(list(script)))
        ref_out = refpipe.Compose(cfgs)(results_for(frames))
        our_out = Compose(cfgs)(results_for(frames,
                                            rng=ScriptedGen(list(script))))
        np.testing.assert_array_equal(our_out['crop_bbox'],
                                      ref_out['crop_bbox'])
        assert_groups_equal(ref_out, our_out)


class TestRandomResizedCrop:
    @pytest.mark.parametrize('swap_r', [0.7, 0.3])
    def test_first_attempt_accept(self, refpipe, swap_r, monkeypatch):
        cfgs = [dict(type='RandomResizedCrop', input_size=224)]
        frames = make_frames(2, h=256, w=256, seed=3)
        # area frac, aspect, swap draw, x1, y1 — small crop accepts at
        # attempt 1 on both sides; square input makes the reference's
        # H/W-swapped bounds check coincide with ours
        script = [0.5, 1.2, swap_r, 5, 9]
        monkeypatch.setattr(refpipe.augmentations, 'random',
                            ScriptedRandom(list(script)))
        ref_out = refpipe.Compose(cfgs)(results_for(frames))
        our_out = Compose(cfgs)(results_for(frames,
                                            rng=ScriptedGen(list(script))))
        np.testing.assert_array_equal(np.asarray(our_out['crop_bbox'],
                                                 np.float32),
                                      np.asarray(ref_out['crop_bbox'],
                                                 np.float32))
        assert_groups_equal(ref_out, our_out)

    def test_fallback_center_square(self, refpipe, monkeypatch):
        """10 rejections -> deterministic center-square fallback
        (augmentations.py:640-644)."""
        cfgs = [dict(type='RandomResizedCrop', input_size=224)]
        frames = make_frames(2, h=256, w=256, seed=4)
        script = [1.0, 4.0 / 3.0, 0.9] * 10   # w=296 > 256 rejects, no swap
        monkeypatch.setattr(refpipe.augmentations, 'random',
                            ScriptedRandom(list(script)))
        ref_out = refpipe.Compose(cfgs)(results_for(frames))
        our_out = Compose(cfgs)(results_for(frames,
                                            rng=ScriptedGen(list(script))))
        assert_groups_equal(ref_out, our_out)


class TestRandomRescaledCrop:
    def test_scripted(self, refpipe, monkeypatch):
        cfgs = [dict(type='RandomRescaledCrop', input_size=224,
                     scale=(256, 320))]
        frames = make_frames(2, h=300, w=300, seed=5)
        # shortedge, axis-0 offset, axis-1 offset (the reference names
        # axis 0 "w"; ours names it y — same pixels on square inputs)
        script = [280, 10, 33]
        monkeypatch.setattr(refpipe.augmentations, 'random',
                            ScriptedRandom(list(script)))
        ref_out = refpipe.Compose(cfgs)(results_for(frames))
        our_out = Compose(cfgs)(results_for(frames,
                                            rng=ScriptedGen(list(script))))
        assert ref_out['img_group'][0].shape == (224, 224, 3)
        assert_groups_equal(ref_out, our_out)


# ---------------------------------------------------------------------------
# end-to-end train pipeline, scripted through every random op
# ---------------------------------------------------------------------------

class TestComposedTrainPipeline:
    def test_train_pipeline_scripted(self, refpipe, monkeypatch):
        """The recipe's full train spatial pipeline (resize -> MultiScaleCrop
        -> flip -> normalize -> NCTHW), one scripted decision sequence
        driving both stacks."""
        cfgs = [
            dict(type='Resize', scale=(np.inf, 256), keep_ratio=True),
            dict(type='MultiScaleCrop', input_size=224,
                 scales=[1, .875, .75, .66], max_distort=1,
                 fix_crop=True, more_fix_crop=True),
            dict(type='Flip', flip_ratio=1.0),
            dict(type='Normalize', to_rgb=True, **NORM),
            dict(type='FormatShape', input_format='NCTHW'),
        ]
        frames = make_frames(4, seed=6)
        script = [2, 11]  # MultiScaleCrop pair + offset; Flip is ratio-1
        monkeypatch.setattr(refpipe.augmentations, 'random',
                            ScriptedRandom(list(script)))
        ref_out = refpipe.Compose(cfgs)(
            results_for(frames, num_clips=2, clip_len=2))
        # ours draws once for the (ratio-1, hence foregone) flip decision;
        # the reference Flip draws from np.random, not the scripted module
        our_out = Compose(cfgs)(
            results_for(frames, num_clips=2, clip_len=2,
                        rng=ScriptedGen(list(script) + [0.5])))
        assert ref_out['img_group'].shape == (2, 3, 2, 224, 224)
        assert_groups_equal(ref_out, our_out, atol=1e-4)
