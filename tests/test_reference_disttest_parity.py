"""Oracle closure part 6: dist-test collection, coalesced grad allreduce,
io utils, and the RecognizerC2D dead path vs the EXECUTING reference.

- ``core/test.py::collect_results_cpu`` (the reference's multi-GPU result
  collection) runs for real over simulated ranks — its ``get_dist_info`` /
  ``dist`` module attributes are monkeypatched per rank, everything else is
  the reference's own bytes — and must agree index-for-index with our
  ``engine/eval.py::reorder_rank_strided`` (the XLA-allgather replacement,
  which cites the identical zip-reorder at ``test.py:171-185``).
- ``core/test.py::single_gpu_test`` composes the reference eval loop
  (default-collate DataLoader -> ``model(return_loss=False, ...)``) and is
  pinned against our recognizer on imported weights.
- ``core/dist_utils.py::_allreduce_coalesced`` executes with a fake
  ``dist.all_reduce`` that sums simulated ranks: the reference's
  flatten/allreduce/div/unflatten round trip must equal the plain
  per-tensor mean — the semantics our mesh ``pmean`` implements (the
  jax-side equal-loss/equal-params proof is
  tests/test_multichip_equivalence.py).
- ``utils/file_client.py`` (disk backend) and ``utils/logger.py`` (rank
  gating) pinned against ``mvfnet_tpu.utils`` equivalents.
- ``models/recognizers/recognizerc2d.py``: the subsumption claim is made
  executable — with no module_cfg the reference's own RecognizerC2D and
  Recognizer3D produce IDENTICAL losses/scores on shared weights, and its
  only module-insertion path (tsm) crashes on an import of
  ``modules/tsm_c2d`` which does not exist anywhere in the reference
  (fifth reference bug, ``recognizerc2d.py:69``).
"""

import os

import numpy as np
import pytest
import torch

from mvfnet_tpu.engine.eval import reorder_rank_strided
from mvfnet_tpu.utils.file_client import FileClient

from reference_loader import load_reference_disttest

NUM_CLASSES = 8


@pytest.fixture(scope='module')
def d():
    return load_reference_disttest()


# ---------------------------------------------------------------------------
# collect_results_cpu (test.py:92-144) vs reorder_rank_strided
# ---------------------------------------------------------------------------

class _FakeDist:
    @staticmethod
    def barrier():
        pass


class TestCollectResults:
    @pytest.mark.parametrize('size,world', [(10, 3), (16, 4), (7, 2)])
    def test_cpu_collection_matches_our_reorder(self, d, tmp_path, size,
                                                world, monkeypatch):
        """Each simulated rank holds the rank-strided shard the reference
        DistributedSampler feeds it (global index i -> rank i % world, with
        wrap-pad); the reference's own dump/zip/truncate logic must invert
        that layout exactly as our reorder does."""
        monkeypatch.setattr(d.test_mod, 'dist', _FakeDist)
        per_rank = int(np.ceil(size / world))
        total = per_rank * world
        padded = [i % size for i in range(total)]  # wrap-pad like sampler
        results = {i: np.array([i, i * 10.0]) for i in range(size)}

        tmpdir = str(tmp_path / f'collect_{size}_{world}')
        collected = None
        for rank in reversed(range(world)):  # rank 0 last: it reads parts
            shard = padded[rank::world]
            part = [results[i] for i in shard]
            monkeypatch.setattr(d.test_mod, 'get_dist_info',
                                lambda r=rank: (r, world))
            out = d.collect_results_cpu(part, size, tmpdir=tmpdir)
            if rank == 0:
                collected = out
            else:
                assert out is None  # non-zero ranks return nothing

        assert len(collected) == size
        for i, res in enumerate(collected):
            np.testing.assert_array_equal(res, results[i])

        # ours: the allgather produces (world, per_rank, K); the reorder
        # must reproduce the reference's collected list exactly
        gathered = np.stack([
            np.stack([results[i] for i in padded[rank::world]])
            for rank in range(world)])
        ours = reorder_rank_strided(gathered, world, size)
        np.testing.assert_array_equal(ours, np.stack(collected))


# ---------------------------------------------------------------------------
# _allreduce_coalesced (dist_utils.py:15-49) vs plain mean
# ---------------------------------------------------------------------------

class TestAllreduceCoalesced:
    def test_coalesced_roundtrip_is_grad_mean(self, d, monkeypatch):
        from torch._utils import _flatten_dense_tensors
        torch.manual_seed(0)
        world = 2
        shapes = [(4, 3), (7,), (2, 2, 2)]
        rank0 = [torch.randn(s, dtype=torch.float64) for s in shapes]
        rank1 = [torch.randn(s, dtype=torch.float64) for s in shapes]
        expected = [(a + b) / world for a, b in zip(rank0, rank1)]

        class _SumDist:
            """all_reduce on rank 0's coalesced flat tensor: add rank 1's
            tensors flattened in the same (single f64) bucket order."""

            @staticmethod
            def all_reduce(flat):
                flat += _flatten_dense_tensors(rank1)

        monkeypatch.setattr(d.dist_utils, 'dist', _SumDist)
        d.allreduce_coalesced(rank0, world)

        for got, want in zip(rank0, expected):
            torch.testing.assert_close(got, want, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# FileClient disk backend (file_client.py) parity
# ---------------------------------------------------------------------------

class TestFileClient:
    def test_disk_get_bytes_and_text(self, d, tmp_path):
        payload = bytes(range(256))
        text = 'line1\nline2 é\n'
        (tmp_path / 'blob.bin').write_bytes(payload)
        (tmp_path / 'note.txt').write_text(text, encoding='utf-8')

        ref = d.FileClient(backend='disk')
        ours = FileClient(backend='disk')
        assert bytes(ref.get(str(tmp_path / 'blob.bin'))) == \
            bytes(ours.get(str(tmp_path / 'blob.bin'))) == payload
        assert ref.get_text(str(tmp_path / 'note.txt')) == text
        assert bytes(ours.get(str(tmp_path / 'note.txt'))
                     ).decode('utf-8') == text

    def test_unknown_backend_rejected_both_sides(self, d):
        with pytest.raises(ValueError):
            d.FileClient(backend='nope')
        with pytest.raises((ValueError, KeyError)):
            FileClient(backend='nope')


# ---------------------------------------------------------------------------
# get_root_logger rank gating (utils/logger.py) parity
# ---------------------------------------------------------------------------

class TestLoggerRankGating:
    def test_nonzero_rank_silenced_both_sides(self, d, monkeypatch):
        import logging as _logging
        # reference: rank 1 -> root logger level ERROR (logger.py:17-18)
        monkeypatch.setattr(d.logger_mod, 'get_dist_info', lambda: (1, 2))
        ref_logger = d.logger_mod.get_root_logger()
        assert ref_logger.level == _logging.ERROR

        # ours: same gate on process index (utils/logging.py)
        import mvfnet_tpu.utils.logging as our_logging
        monkeypatch.setattr(our_logging, '_process_index', lambda: 1)
        monkeypatch.setattr(our_logging, '_initialized', False)
        our_logger = our_logging.get_root_logger()
        assert our_logger.level == _logging.ERROR
        # reset our module state for other tests
        monkeypatch.setattr(our_logging, '_initialized', False)
        our_logger.setLevel(_logging.INFO)


# ---------------------------------------------------------------------------
# DistEvalTopKAccuracyHook.evaluate (eval_hooks.py:80-98) vs our EvalHook
# metric composition (engine/train_loop.py::EvalHook)
# ---------------------------------------------------------------------------

class TestEvalHookMetrics:
    def test_topk_hook_evaluate_matches_ours(self):
        from reference_loader import load_reference_eval_hooks
        from mvfnet_tpu.utils.metrics import top_k_accuracy

        e = load_reference_eval_hooks()
        rng = np.random.RandomState(31)
        n, k_classes = 20, 8
        labels = rng.randint(0, k_classes, size=n)
        scores = rng.randn(n, k_classes)

        from torch.utils.data import Dataset as _TorchDataset

        class _DS(_TorchDataset):
            video_infos = [dict(label=int(lb)) for lb in labels]

            def __len__(self):
                return n

            def __getitem__(self, idx):
                raise NotImplementedError

        class _Buf:
            output = {}
            ready = False

        class _Runner:
            log_buffer = _Buf()
            mode = 'train'

        hook = e.DistEvalTopKAccuracyHook(_DS(), k=(1, 5))
        # results as its after_train_epoch collects them: one (1, K) numpy
        # row per video (base.forward return_numpy=True), squeezed inside
        # evaluate (eval_hooks.py:93). NB feeding torch tensors instead
        # silently zeroes the metric (top_k_hit's set.intersection never
        # matches tensor elements) — numpy is the reference's real dataflow.
        results = [s[None].copy() for s in scores]
        runner = _Runner()
        hook.evaluate(runner, results)
        ref_top1 = runner.log_buffer.output['top1 acc']
        ref_top5 = runner.log_buffer.output['top5 acc']
        assert runner.log_buffer.ready and runner.mode == 'val'

        ours = top_k_accuracy(scores, list(labels), k=(1, 5))
        assert ours[0] == pytest.approx(ref_top1, abs=0)
        assert ours[1] == pytest.approx(ref_top5, abs=0)


# ---------------------------------------------------------------------------
# RecognizerC2D: executable subsumption + reference bug #5
# ---------------------------------------------------------------------------

def _i3d_cfg(recognizer_type):
    return dict(
        type=recognizer_type,
        backbone=dict(type='ResNet_I3D', depth=50, out_indices=(3,),
                      norm_eval=False, inflate_freq=(1, 1, 1, 1),
                      inflate_style='3x1x1', conv1_kernel=(5, 7, 7),
                      conv1_stride_t=2, pool1_stride_t=2,
                      nonlocal_stages=(-1,), nonlocal_cfg=None,
                      norm_cfg=dict(type='BN3d', requires_grad=True)),
        cls_head=dict(type='I3DClsHead', spatial_size=-1, temporal_size=-1,
                      dropout_ratio=0.0, in_channels=2048,
                      num_classes=NUM_CLASSES))


@pytest.mark.slow
class TestRecognizerC2D:
    def test_c2d_equals_recognizer3d_on_shared_weights(self, d):
        """The C2D forward_train/forward_test bodies are operationally
        identical to Recognizer3D's (recognizerc2d.py:74-106 vs
        recognizer3d.py:20-52); with shared weights the two reference
        classes must be bit-equal — the executable form of SURVEY's
        'C2D dead path subsumed' claim."""
        ref = d.ref
        torch.manual_seed(3)
        r3d = ref.build_recognizer(_i3d_cfg('Recognizer3D'), train_cfg=None,
                                   test_cfg=dict(average_clips=None))
        c2d = ref.build_recognizer(_i3d_cfg('RecognizerC2D'), train_cfg=None,
                                   test_cfg=dict(average_clips=None))
        missing = c2d.load_state_dict(r3d.state_dict(), strict=True)
        assert not missing.missing_keys and not missing.unexpected_keys

        rng = np.random.RandomState(0)
        imgs = torch.tensor(rng.randn(2, 1, 3, 8, 32, 32), dtype=torch.float32)
        labels = torch.tensor([1, 5])

        r3d.eval(), c2d.eval()
        with torch.no_grad():
            s3d = r3d(imgs, None, return_loss=False, return_numpy=True)
            sc2d = c2d(imgs, None, return_loss=False, return_numpy=True)
        np.testing.assert_array_equal(sc2d, s3d)

        r3d.train(), c2d.train()
        torch.manual_seed(7)
        l3d = r3d(imgs, labels, return_loss=True)['loss_cls']
        torch.manual_seed(7)
        lc2d = c2d(imgs, labels, return_loss=True)['loss_cls']
        assert float(l3d) == float(lc2d)

    def test_tsm_module_path_unrunnable_reference_bug(self, d):
        """Reference bug #5: RecognizerC2D's ONLY module-insertion branch
        imports ``..modules.tsm_c2d`` (recognizerc2d.py:69) — no such file
        exists anywhere in the reference tree, so C2D-with-module was never
        runnable upstream."""
        assert not os.path.exists(
            '/root/reference/codes/models/modules/tsm_c2d.py')
        cfg = _i3d_cfg('RecognizerC2D')
        cfg['module_cfg'] = dict(type='tsm', n_frames=4)
        with pytest.raises(ModuleNotFoundError):
            d.ref.build_recognizer(cfg, train_cfg=None,
                                   test_cfg=dict(average_clips=None))


# ---------------------------------------------------------------------------
# single_gpu_test (test.py:12-39): the reference eval LOOP composed end to
# end (default-collate loader -> forward_test -> list of scores) vs ours
# ---------------------------------------------------------------------------

@pytest.mark.slow
class TestSingleGpuTest:
    def test_loop_scores_match_ours(self, d, tmp_path):
        import cv2
        import jax
        import jax.numpy as jnp
        from torch.utils.data import DataLoader as TorchDataLoader

        from mvfnet_tpu.data.builder import build_dataset
        from mvfnet_tpu.models import build_recognizer
        from mvfnet_tpu.utils.checkpoint import import_torch_weights
        from test_reference_oracle_parity import (
            build_reference_model, ref_model_cfg, flax_cfg)

        # tiny rawframes tree
        root = tmp_path / 'frames'
        rng = np.random.RandomState(21)
        lines = []
        for v, label in ((0, 2), (1, 6), (2, 4)):
            vd = root / f'c{v}'
            os.makedirs(vd)
            for i in range(1, 13):
                cv2.imwrite(str(vd / f'img_{i:05}.jpg'),
                            rng.randint(0, 255, (64, 72, 3), dtype=np.uint8))
            lines.append(f'c{v} 12 {label}')
        ann = root / 'ann.txt'
        ann.write_text('\n'.join(lines) + '\n')

        pipeline = [
            dict(type='SampleFrames', clip_len=2, frame_interval=2,
                 num_clips=2),
            dict(type='FrameSelector'),
            dict(type='Resize', scale=(64, 64), keep_ratio=False),
            dict(type='Normalize', mean=[123.675, 116.28, 103.53],
                 std=[58.395, 57.12, 57.375], div_255=False, to_rgb=True),
            dict(type='FormatShape', input_format='NCHW'),
            dict(type='Collect', keys=['img_group', 'label'], meta_keys=[]),
        ]

        ref = d.ref
        # batch_size=1: the reference's average_clip means over the WHOLE
        # batch dim (base.py:70-73), so its dense-test contract is one
        # video's views per batch (videos_per_gpu=1 in its test configs)
        ref_model = build_reference_model(
            ref, seed=5, average_clips='prob').float().eval()
        ref_ds = load_reference_pipe().RawFramesDataset(
            ann_file=str(ann), pipeline=pipeline, data_root=str(root),
            test_mode=True, filename_tmpl='img_{:05}.jpg')
        loader = TorchDataLoader(ref_ds, batch_size=1, shuffle=False,
                                 num_workers=0)
        ref_results = d.single_gpu_test(ref_model, loader)
        ref_scores = np.concatenate(
            [r.detach().numpy() for r in ref_results], axis=0)
        assert ref_scores.shape == (3, NUM_CLASSES)

        # ours on imported weights over the same dataset
        model = build_recognizer(flax_cfg(),
                                 test_cfg=dict(average_clips='prob'))
        imgs0 = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        variables = model.init(
            {'params': jax.random.PRNGKey(0),
             'dropout': jax.random.PRNGKey(1)},
            imgs0, jnp.zeros((1,), jnp.int32), return_loss=True, train=True)
        sd = {k: v.detach().numpy() for k, v in
              ref_model.state_dict().items()}
        variables = import_torch_weights(sd, variables)
        our_ds = build_dataset(dict(
            type='RawFramesDataset', ann_file=str(ann), pipeline=pipeline,
            data_root=str(root), test_mode=True,
            filename_tmpl='img_{:05}.jpg'))
        our_scores = []
        for i in range(len(our_ds)):
            item = our_ds[i]
            imgs = np.asarray(item['img_group'])  # (S, C, H, W)
            imgs = jnp.asarray(imgs.transpose(0, 2, 3, 1)[None])
            our_scores.append(np.asarray(
                model.apply(variables, imgs, None, return_loss=False)))
        our_scores = np.concatenate(our_scores, axis=0)
        np.testing.assert_allclose(our_scores, ref_scores,
                                   rtol=0, atol=2e-4)


def load_reference_pipe():
    from reference_loader import load_reference_pipelines
    return load_reference_pipelines()
