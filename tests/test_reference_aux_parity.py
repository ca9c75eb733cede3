"""Oracle closure part 5: the loader/aux surface vs the EXECUTING reference.

Covers the last runnable slice of the reference repo: the three epoch
samplers (``codes/datasets/loader/sampler.py``), the non-dist
``build_dataloader`` (``loader/build_loader.py``), the module-hook FLOPs
profiler (``utils/flops_hook.py`` + ``misc.py``), and the
``PklDataset`` / ``VideoDataset`` containers
(``datasets/{pkl,video}_dataset.py``) — all imported and RUN as the oracle
via ``tests/reference_loader.load_reference_aux``.

Randomness: the reference samplers draw from ``torch.Generator`` /
global ``np.random``; ours from a seeded numpy ``Generator``.  Index
sequences are therefore compared STRUCTURALLY — the invariants that define
the sampler contract (per-rank length formula, flag-homogeneous batches,
padded per-group coverage, epoch determinism, disjoint rank shards) are
asserted on BOTH executing implementations.  Where the reference path is
RNG-free (``DistributedSampler`` with ``shuffle=False``) the index
sequences must match EXACTLY.

This file is what caught the rank-striding bug in our
``DistributedGroupSampler`` (an earlier version strided the flat sequence,
which interleaves ``samples_per_gpu`` blocks across ranks and breaks
per-rank batch flag-homogeneity — the property the reference's contiguous
``offset:offset+num_samples`` slice exists to preserve,
``sampler.py:151-154``).

Fourth reference bug found by executing it: both reference group samplers
pad a group with a single ``indice[:extra]`` slice (``sampler.py:35-37``
and ``134-138``), so any group smaller than ``samples_per_gpu`` (or
``samples_per_gpu * world_size``) under-fills the pad and trips their own
length asserts — small flag groups crash the reference.  Ours tile-pads
and is tested at exactly those shapes.
"""

import os
import pickle

import numpy as np
import pytest

from mvfnet_tpu.data.builder import build_dataset
from mvfnet_tpu.data.loader import build_dataloader
from mvfnet_tpu.data.sampler import (DistributedGroupSampler, GroupSampler,
                                     ShardedSampler)

from reference_loader import load_reference_aux


@pytest.fixture(scope='module')
def aux():
    return load_reference_aux()


class _FlagDataset:
    """Minimal stand-in satisfying the reference sampler contract
    (``.flag`` array + ``__len__``)."""

    def __init__(self, flags):
        self.flag = np.asarray(flags, dtype=np.int64)

    def __len__(self):
        return len(self.flag)


def _blocks(seq, spb):
    seq = [int(i) for i in seq]
    assert len(seq) % spb == 0, (len(seq), spb)
    return [seq[i:i + spb] for i in range(0, len(seq), spb)]


def _assert_homogeneous(seq, spb, flags, who):
    for blk in _blocks(seq, spb):
        blk_flags = {int(flags[i]) for i in blk}
        assert len(blk_flags) == 1, (
            f'{who}: mixed-flag batch {blk} -> flags {blk_flags}')


def _group_counts(seq, flags, n_groups):
    counts = np.zeros(n_groups, dtype=np.int64)
    for i in seq:
        counts[flags[int(i)]] += 1
    return counts


# ---------------------------------------------------------------------------
# GroupSampler (reference sampler.py:14-51)
# ---------------------------------------------------------------------------

GROUP_CASES = [
    # (flags, samples_per_batch)
    ([0] * 7 + [1] * 5, 3),
    ([0] * 8 + [1] * 8, 4),
    ([0] * 5 + [1] * 9 + [2] * 2, 2),
    ([1] * 6, 3),              # empty group 0 (bincount leading zero)
]


class TestGroupSampler:
    @pytest.mark.parametrize('flags,spb', GROUP_CASES)
    def test_structure_matches_reference(self, aux, flags, spb):
        flags = np.asarray(flags)
        ref = aux.GroupSampler(_FlagDataset(flags), spb)
        ours = GroupSampler(flags, spb, seed=3)

        # identical padded-length formula (sampler.py:22-25)
        assert len(ours) == len(ref)

        np.random.seed(11)
        ref_seq = [int(i) for i in ref]
        our_seq = ours.local_indices()
        assert len(ref_seq) == len(our_seq) == len(ref)

        n_groups = int(flags.max()) + 1
        for seq, who in ((ref_seq, 'reference'), (our_seq, 'ours')):
            # every batch flag-homogeneous
            _assert_homogeneous(seq, spb, flags, who)
            # per-group counts equal the ceil-padded group target
            counts = _group_counts(seq, flags, n_groups)
            for g in range(n_groups):
                size = int((flags == g).sum())
                target = 0 if size == 0 else int(
                    np.ceil(size / spb)) * spb
                assert counts[g] == target, (who, g, counts[g], target)
            # full coverage: every index appears at least once
            assert set(seq) == set(range(len(flags))), who

    def test_small_group_reference_crashes_ours_works(self, aux):
        """Reference bug #4a: a group smaller than samples_per_gpu
        under-fills the single-slice pad (sampler.py:35-37) and trips the
        reference's own ``assert len(indices) == self.num_samples``."""
        flags = np.array([0, 1, 1, 1, 1, 1])  # group 0 has 1 sample, spb 3
        ref = aux.GroupSampler(_FlagDataset(flags), 3)
        np.random.seed(0)
        with pytest.raises(AssertionError):
            list(ref)
        ours = GroupSampler(flags, 3, seed=0)
        seq = ours.local_indices()
        assert len(seq) == len(ours) == 9
        _assert_homogeneous(seq, 3, flags, 'ours')
        assert set(seq) == set(range(6))


# ---------------------------------------------------------------------------
# DistributedGroupSampler (reference sampler.py:81-163)
# ---------------------------------------------------------------------------

DGS_CASES = [
    # (flags, samples_per_gpu, world_size)
    ([0] * 7 + [1] * 5, 2, 2),
    ([0] * 9 + [1] * 7, 2, 4),
    ([0] * 6 + [1] * 10 + [2] * 5, 3, 2),
    ([0] * 16, 4, 2),          # single group
]


class TestDistributedGroupSampler:
    @pytest.mark.parametrize('flags,spb,ws', DGS_CASES)
    def test_structure_matches_reference(self, aux, flags, spb, ws):
        flags = np.asarray(flags)
        n_groups = int(flags.max()) + 1
        ds = _FlagDataset(flags)

        refs = [aux.DistributedGroupSampler(ds, samples_per_gpu=spb,
                                            num_replicas=ws, rank=r)
                for r in range(ws)]
        ours = [DistributedGroupSampler(flags, spb, world_size=ws, rank=r,
                                        seed=5)
                for r in range(ws)]
        for s in refs + ours:
            s.set_epoch(2)

        # per-rank length formula (sampler.py:115-120)
        for r in range(ws):
            assert len(ours[r]) == len(refs[r]) == refs[0].num_samples

        ref_shards = [[int(i) for i in s] for s in refs]
        our_shards = [s.local_indices() for s in ours]

        for shards, who in ((ref_shards, 'reference'), (our_shards, 'ours')):
            # THE invariant the contiguous slice preserves: every rank's
            # samples_per_gpu-batch stays flag-homogeneous
            for r, seq in enumerate(shards):
                _assert_homogeneous(seq, spb, flags, f'{who} rank{r}')
            # the rank shards partition the padded global sequence:
            # per-group totals across ranks equal the padded group target
            glob = [i for seq in shards for i in seq]
            counts = _group_counts(glob, flags, n_groups)
            for g in range(n_groups):
                size = int((flags == g).sum())
                target = 0 if size == 0 else int(
                    np.ceil(size / (spb * ws))) * spb * ws
                assert counts[g] == target, (who, g, counts[g], target)
            assert set(glob) == set(range(len(flags))), who

    def test_epoch_determinism_both_sides(self, aux):
        flags = np.array([0] * 8 + [1] * 6)
        ds = _FlagDataset(flags)
        ref = aux.DistributedGroupSampler(ds, samples_per_gpu=2,
                                          num_replicas=2, rank=1)
        ours = DistributedGroupSampler(flags, 2, world_size=2, rank=1)
        for s in (ref, ours):
            s.set_epoch(3)
            a = [int(i) for i in s]
            b = [int(i) for i in s]
            assert a == b  # same epoch -> identical
            s.set_epoch(4)
            c = [int(i) for i in s]
            assert a != c  # new epoch -> reshuffled

    def test_rank_striding_breaks_homogeneity(self, aux):
        """Documents WHY the contiguous slice matters (and what our earlier
        rank-strided version got wrong): striding the reference's own
        global sequence yields mixed-flag batches."""
        flags = np.array([0] * 6 + [1] * 6)
        ds = _FlagDataset(flags)
        ws, spb = 2, 2
        violated = False
        for epoch in range(8):
            # reconstruct the global sequence from the two contiguous shards
            shards = []
            for r in range(ws):
                s = aux.DistributedGroupSampler(ds, samples_per_gpu=spb,
                                                num_replicas=ws, rank=r)
                s.set_epoch(epoch)
                shards.append([int(i) for i in s])
            glob = [i for seq in shards for i in seq]
            for r in range(ws):
                strided = glob[r::ws]
                try:
                    _assert_homogeneous(strided, spb, flags, 'strided')
                except AssertionError:
                    violated = True
        assert violated, 'rank-striding never mixed flags across 8 epochs?'

    def test_small_group_reference_crashes_ours_works(self, aux):
        """Reference bug #4b: group smaller than spb*world_size trips
        ``assert len(indices) == self.total_size`` (sampler.py:134-141)."""
        flags = np.array([0] + [1] * 8)  # group 0: 1 sample, spb*ws = 4
        ref = aux.DistributedGroupSampler(_FlagDataset(flags),
                                          samples_per_gpu=2,
                                          num_replicas=2, rank=0)
        with pytest.raises(AssertionError):
            list(ref)
        shards = []
        for r in range(2):
            s = DistributedGroupSampler(flags, 2, world_size=2, rank=r)
            seq = s.local_indices()
            assert len(seq) == len(s)
            _assert_homogeneous(seq, 2, flags, f'ours rank{r}')
            shards.append(seq)
        assert set(i for seq in shards for i in seq) == set(range(9))


# ---------------------------------------------------------------------------
# DistributedSampler (reference sampler.py:54-78) vs ShardedSampler
# ---------------------------------------------------------------------------

class TestDistributedSampler:
    @pytest.mark.parametrize('n,ws', [(10, 3), (16, 4), (7, 2), (5, 5)])
    def test_noshuffle_exact_match(self, aux, n, ws):
        """shuffle=False is RNG-free on both sides: arange -> wrap-pad ->
        rank-strided slice must agree index for index."""
        ds = _FlagDataset(np.zeros(n))
        for rank in range(ws):
            ref = aux.DistributedSampler(ds, ws, rank, shuffle=False)
            ours = ShardedSampler(n, ws, rank, shuffle=False)
            ref_seq = [int(i) for i in ref]
            our_seq = [int(i) for i in ours]
            assert our_seq == ref_seq, (rank, our_seq, ref_seq)
            assert len(ours) == ref.num_samples

    @pytest.mark.parametrize('n,ws', [(10, 3), (16, 4)])
    def test_shuffle_structure(self, aux, n, ws):
        ds = _FlagDataset(np.zeros(n))
        total = int(np.ceil(n / ws)) * ws
        for side in ('reference', 'ours'):
            shards = []
            for rank in range(ws):
                if side == 'reference':
                    s = aux.DistributedSampler(ds, ws, rank, shuffle=True)
                    s.set_epoch(1)
                else:
                    s = ShardedSampler(n, ws, rank, shuffle=True)
                    s.set_epoch(1)
                seq = [int(i) for i in s]
                assert len(seq) == total // ws, side
                shards.append(seq)
            glob = [i for seq in shards for i in seq]
            assert len(glob) == total, side
            assert set(glob) == set(range(n)), side  # coverage incl. pad


# ---------------------------------------------------------------------------
# build_dataloader (reference build_loader.py:16-52), non-dist path
# ---------------------------------------------------------------------------

NORM = dict(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375])


def _frames_tree(tmp_path_factory, n_videos=3, n_frames=8, h=40, w=48):
    import cv2
    root = tmp_path_factory.mktemp('aux_rawframes')
    lines = []
    rng = np.random.RandomState(5)
    for v in range(n_videos):
        d = root / f'clip{v}'
        os.makedirs(d)
        for i in range(1, n_frames + 1):
            img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f'img_{i:05}.jpg'), img)
        lines.append(f'clip{v} {n_frames} {v % 2}')
    ann = root / 'ann.txt'
    ann.write_text('\n'.join(lines) + '\n')
    return str(root), str(ann)


def _det_pipeline():
    """Deterministic test-mode pipeline shared verbatim by both sides."""
    return [
        dict(type='SampleFrames', clip_len=2, frame_interval=2, num_clips=2),
        dict(type='FrameSelector'),
        dict(type='Resize', scale=(32, 32), keep_ratio=False),
        dict(type='Normalize', div_255=False, to_rgb=True, **NORM),
        dict(type='FormatShape', input_format='NCHW'),
        dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
    ]


@pytest.fixture(scope='module')
def tree(tmp_path_factory):
    return _frames_tree(tmp_path_factory)


class TestBuildDataloader:
    def test_nondist_batches_match_reference(self, aux, tree):
        root, ann = tree
        ref_ds = aux.pipe.RawFramesDataset(
            ann_file=ann, pipeline=_det_pipeline(), data_root=root,
            test_mode=True, filename_tmpl='img_{:05}.jpg')
        our_ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=ann, pipeline=_det_pipeline(),
            data_root=root, test_mode=True, filename_tmpl='img_{:05}.jpg'))

        ref_loader = aux.build_dataloader(
            ref_ds, videos_per_gpu=2, workers_per_gpu=0, num_gpus=1,
            dist=False, shuffle=False, pin_memory=False)
        our_loader = build_dataloader(
            our_ds, videos_per_gpu=2, workers_per_gpu=0, num_gpus=1,
            dist=False, shuffle=False)

        ref_batches = list(ref_loader)
        our_batches = list(our_loader)
        # same batch geometry: ceil(3/2) = 2 batches, sizes 2 + 1
        assert len(ref_batches) == len(our_batches) == 2
        for rb, ob in zip(ref_batches, our_batches):
            ref_imgs = rb['img_group'].numpy()
            our_imgs = np.asarray(ob['img_group'])
            assert our_imgs.shape == ref_imgs.shape
            np.testing.assert_allclose(our_imgs, ref_imgs, rtol=0, atol=1e-4)
            np.testing.assert_array_equal(
                np.asarray(ob['label']).reshape(-1),
                rb['label'].numpy().reshape(-1))


# ---------------------------------------------------------------------------
# VideoDataset (reference video_dataset.py) via OpenCVDecode seek parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def video_tree(tmp_path_factory):
    """Intra-only MJPG AVI so cv2 seek decode is deterministic; annotation
    WITHOUT total_frames so both sides exercise the container-probe branch
    of SampleFrames (reference loading.py:115-122)."""
    import cv2
    root = tmp_path_factory.mktemp('aux_videos')
    rng = np.random.RandomState(9)
    for v in range(2):
        path = str(root / f'vid{v}.avi')
        wtr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*'MJPG'), 10.0,
                              (48, 40))
        assert wtr.isOpened()
        for _ in range(16):
            wtr.write(rng.randint(0, 255, (40, 48, 3), dtype=np.uint8))
        wtr.release()
    ann = root / 'ann.txt'
    ann.write_text('vid0.avi 1\nvid1.avi 0\n')
    return str(root), str(ann)


class TestVideoDataset:
    def test_getitem_matches_reference(self, aux, video_tree):
        root, ann = video_tree
        pipeline = [
            dict(type='SampleFrames', clip_len=3, frame_interval=2,
                 num_clips=2),
            dict(type='OpenCVDecode'),
        ]
        ref_ds = aux.VideoDataset(ann_file=ann, pipeline=pipeline,
                                  data_root=root, test_mode=True,
                                  modality='RGB')
        our_ds = build_dataset(dict(
            type='VideoDataset', ann_file=ann, pipeline=pipeline,
            data_root=root, test_mode=True, modality='RGB'))
        assert len(ref_ds) == len(our_ds) == 2
        for idx in range(2):
            ref_out = ref_ds[idx]
            our_out = our_ds[idx]
            np.testing.assert_array_equal(
                np.asarray(our_out['frame_inds']).reshape(-1),
                np.asarray(ref_out['frame_inds']).reshape(-1))
            assert ref_out['total_frames'] == our_out['total_frames'] == 16
            ref_frames = ref_out['img_group']
            our_frames = our_out['img_group']
            assert len(ref_frames) == len(our_frames) == 6
            for i, (rf, of) in enumerate(zip(ref_frames, our_frames)):
                np.testing.assert_array_equal(np.asarray(of),
                                              np.asarray(rf),
                                              err_msg=f'idx{idx} frame{i}')
            assert our_out['label'] == ref_out['label']


# ---------------------------------------------------------------------------
# PklDataset (reference pkl_dataset.py) via PklLoader
# ---------------------------------------------------------------------------

@pytest.fixture(scope='module')
def pkl_tree(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp('aux_pkl')
    rng = np.random.RandomState(13)
    for v in range(2):
        bufs = []
        for _ in range(12):
            img = rng.randint(0, 255, (40, 48, 3), dtype=np.uint8)
            ok, enc = cv2.imencode('.jpg', img)
            assert ok
            bufs.append(enc.tobytes())
        with open(root / f'clip{v}.pkl', 'wb') as f:
            pickle.dump(bufs, f)
    ann = root / 'ann.txt'
    ann.write_text('clip0.pkl 12 4\nclip1.pkl 12 1\n')
    return str(root), str(ann)


class TestPklDataset:
    def test_getitem_matches_reference(self, aux, pkl_tree):
        root, ann = pkl_tree
        pipeline = [
            dict(type='SampleFrames', clip_len=2, frame_interval=3,
                 num_clips=2),
            dict(type='PklLoader'),
        ]
        ref_ds = aux.PklDataset(ann_file=ann, pipeline=pipeline,
                                data_root=root, test_mode=True,
                                modality='RGB')
        our_ds = build_dataset(dict(
            type='PklDataset', ann_file=ann, pipeline=pipeline,
            data_root=root, test_mode=True, modality='RGB'))
        assert len(ref_ds) == len(our_ds) == 2
        for idx in range(2):
            ref_out = ref_ds[idx]
            our_out = our_ds[idx]
            np.testing.assert_array_equal(
                np.asarray(our_out['frame_inds']).reshape(-1),
                np.asarray(ref_out['frame_inds']).reshape(-1))
            for i, (rf, of) in enumerate(zip(ref_out['img_group'],
                                             our_out['img_group'])):
                np.testing.assert_array_equal(np.asarray(of),
                                              np.asarray(rf),
                                              err_msg=f'idx{idx} frame{i}')
            assert our_out['label'] == ref_out['label']


# ---------------------------------------------------------------------------
# FLOPs profiler (reference flops_hook.py::profile + misc.py::params_count)
# vs utils/flops.py (XLA cost analysis)
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestFlopsParity:
    def test_params_exact_and_macs_close(self, aux):
        import torch
        from reference_loader import load_reference
        from test_reference_oracle_parity import (
            build_reference_model, import_reference_weights_into_flax)
        from mvfnet_tpu.utils.flops import get_flop_stats, params_count

        ref = load_reference()
        ref_model = build_reference_model(ref, seed=0).float().eval()
        model, variables = import_reference_weights_into_flax(ref_model)

        # params: the reference's own counter vs ours, exact
        ref_params = aux.params_count(ref_model)
        assert params_count(variables['params']) == ref_params

        # FLOPs: reference hook-profiler counts MACs (multiply_adds = 1,
        # flops_hook.py:11) over FULL conv windows (y.nelement() * Cin * K,
        # flops_hook.py:25); XLA cost analysis counts flops = 2*MACs over
        # the REAL taps only — SAME-padding border positions contribute
        # just their in-bounds multiplies (verified exactly: a lone 3x3
        # SAME conv reports flops/full-window == ((3n-2)/(3n))^2 to
        # machine precision).  So ours must be <= the reference count,
        # inside the boundary-waste band, and converge toward it as the
        # image grows (padding fraction ~ 4/(3n)).
        T = 2
        ratios = {}
        for hw in (64, 96):
            x = torch.zeros(1, T, 3, hw, hw)
            y = torch.tensor([0])
            total_ops, total_params = aux.profile(ref_model, (x, y),
                                                  verbose=False)
            assert total_params == ref_params
            stats = get_flop_stats(model, variables, (1, T, hw, hw, 3))
            assert stats['params'] == ref_params
            ratios[hw] = stats['macs'] / total_ops
        assert 0.90 < ratios[64] <= 1.0, ratios
        assert 0.93 < ratios[96] <= 1.0, ratios
        assert ratios[96] > ratios[64], ratios  # boundary waste shrinks
