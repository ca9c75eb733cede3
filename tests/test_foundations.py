"""Registry, config loader, and metrics tests."""

import os
import textwrap

import numpy as np
import pytest

from mvfnet_tpu import Config, Registry, build_from_cfg
from mvfnet_tpu.utils import (get_weighted_score, mean_class_accuracy,
                              softmax, top_k_accuracy)


class TestRegistry:
    def test_register_and_build(self):
        reg = Registry('things')

        @reg.register_module
        class Foo:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        assert 'Foo' in reg
        obj = build_from_cfg(dict(type='Foo', a=1), reg)
        assert (obj.a, obj.b) == (1, 2)
        obj = build_from_cfg(dict(type='Foo', a=1), reg, dict(b=7))
        assert obj.b == 7

    def test_duplicate_raises(self):
        reg = Registry('r')
        reg.register_module(name='X')(int)
        with pytest.raises(KeyError):
            reg.register_module(name='X')(float)

    def test_unknown_type(self):
        reg = Registry('r')
        with pytest.raises(KeyError):
            build_from_cfg(dict(type='Nope'), reg)

    def test_callable_type(self):
        reg = Registry('r')
        obj = build_from_cfg(dict(type=dict, a=1), reg)
        assert obj == {'a': 1}


class TestConfig:
    def test_fromfile(self, tmp_path):
        p = tmp_path / 'cfg.py'
        p.write_text(textwrap.dedent('''
            import os
            clip_len = 8
            model = dict(type='Recognizer2D',
                         backbone=dict(type='ResNet', depth=50))
            data = dict(videos_per_gpu=12)
            work_dir = os.path.join('/tmp', 'x')
        '''))
        cfg = Config.fromfile(str(p))
        assert cfg.clip_len == 8
        assert cfg.model.backbone.depth == 50
        assert cfg['data']['videos_per_gpu'] == 12
        assert cfg.work_dir == '/tmp/x'
        assert 'os' not in cfg.keys()  # imported modules stripped

    def test_merge_from_dict(self, tmp_path):
        p = tmp_path / 'cfg.py'
        p.write_text('model = dict(backbone=dict(depth=50))\n')
        cfg = Config.fromfile(str(p))
        cfg.merge_from_dict({'model.backbone.depth': 101, 'total_epochs': 5})
        assert cfg.model.backbone.depth == 101
        assert cfg.total_epochs == 5

    def test_setattr(self, tmp_path):
        p = tmp_path / 'cfg.py'
        p.write_text('x = 1\n')
        cfg = Config.fromfile(str(p))
        cfg.gpus = 8
        assert cfg.gpus == 8
        assert cfg.get('missing', 'd') == 'd'

    def test_base_inheritance(self, tmp_path):
        """mmcv _base_ semantics: recursive dict merge, deriving file
        wins, lists replace wholesale, chained bases resolve."""
        (tmp_path / 'grandbase.py').write_text(
            'total_epochs = 100\noptimizer = dict(type="SGD", lr=0.1)\n')
        (tmp_path / 'base.py').write_text(textwrap.dedent('''
            _base_ = './grandbase.py'
            model = dict(backbone=dict(depth=50, norm_eval=False),
                         cls_head=dict(num_classes=400))
            pipeline = [dict(type='A'), dict(type='B')]
        '''))
        (tmp_path / 'leaf.py').write_text(textwrap.dedent('''
            _base_ = './base.py'
            model = dict(backbone=dict(depth=101))
            pipeline = [dict(type='C')]
            optimizer = dict(lr=0.02)
        '''))
        cfg = Config.fromfile(str(tmp_path / 'leaf.py'))
        assert cfg.model.backbone.depth == 101           # overridden
        assert cfg.model.backbone.norm_eval is False     # inherited
        assert cfg.model.cls_head.num_classes == 400     # inherited dict
        assert [p['type'] for p in cfg.pipeline] == ['C']  # list replaced
        assert cfg.optimizer.lr == 0.02                  # deep-merged
        assert cfg.optimizer.type == 'SGD'               # from grandbase
        assert cfg.total_epochs == 100                   # chained base
        assert '_base_' not in cfg.keys()

    def test_base_delete_key(self, tmp_path):
        """``_delete_=True`` replaces a dict wholesale (mmcv semantics)."""
        (tmp_path / 'base.py').write_text(
            "data = dict(train=dict(type='RawFramesDataset',"
            " filename_tmpl='img_{:05}.jpg'))\n")
        (tmp_path / 'leaf.py').write_text(textwrap.dedent('''
            _base_ = './base.py'
            data = dict(train=dict(_delete_=True, type='VideoDataset'))
        '''))
        cfg = Config.fromfile(str(tmp_path / 'leaf.py'))
        assert cfg.data.train.type == 'VideoDataset'
        assert 'filename_tmpl' not in cfg.data.train
        assert '_delete_' not in cfg.data.train

    def test_base_missing_file_raises(self, tmp_path):
        (tmp_path / 'leaf.py').write_text("_base_ = './nope.py'\nx = 1\n")
        with pytest.raises(FileNotFoundError):
            Config.fromfile(str(tmp_path / 'leaf.py'))

    def test_same_basename_no_collision(self, tmp_path):
        """Two configs with the same basename load independently."""
        a = tmp_path / 'a'
        b = tmp_path / 'b'
        a.mkdir()
        b.mkdir()
        (a / 'cfg.py').write_text('x = 1\n')
        (b / 'cfg.py').write_text('x = 2\n')
        assert Config.fromfile(str(a / 'cfg.py')).x == 1
        assert Config.fromfile(str(b / 'cfg.py')).x == 2


class TestMetrics:
    def test_softmax_matches_reference_math(self):
        x = np.random.RandomState(0).randn(4, 10)
        s = softmax(x)
        e = np.exp(x - x.max(axis=1, keepdims=True))
        np.testing.assert_allclose(s, e / e.sum(axis=1, keepdims=True))
        np.testing.assert_allclose(s.sum(axis=1), 1.0, rtol=1e-6)

    def test_top_k_accuracy(self):
        scores = np.array([[0.1, 0.9, 0.0],
                           [0.8, 0.1, 0.1],
                           [0.3, 0.3, 0.4],
                           [0.2, 0.5, 0.3]])
        labels = [1, 0, 0, 2]
        top1, top2 = top_k_accuracy(scores, labels, k=(1, 2))
        assert top1 == pytest.approx(0.5)
        assert top2 == pytest.approx(0.75)

    def test_top_k_matches_reference_loop(self):
        rng = np.random.RandomState(1)
        scores = rng.randn(50, 7)
        labels = rng.randint(0, 7, size=50)

        # reference implementation (accuracy.py:77-100)
        def ref_topk(scores, labels, k):
            hits = []
            for x, y in zip(scores, labels):
                idx = np.argsort(x)[-k:]
                hits.append(int(y) in set(idx))
            return float(np.mean(hits))

        for k in (1, 3, 5):
            ours = top_k_accuracy(scores, labels, k=(k,))[0]
            assert ours == pytest.approx(ref_topk(scores, labels, k))

    def test_mean_class_accuracy(self):
        scores = np.array([[0.9, 0.1], [0.8, 0.2], [0.3, 0.7], [0.6, 0.4]])
        labels = [0, 0, 1, 1]
        # class 0: 2/2; class 1: 1/2 -> mean 0.75
        assert mean_class_accuracy(scores, labels) == pytest.approx(0.75)

    def test_weighted_score(self):
        s1 = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
        s2 = [np.array([0.0, 2.0]), np.array([2.0, 0.0])]
        out = get_weighted_score([s1, s2], [1.0, 0.5])
        np.testing.assert_allclose(out[0], [1.0, 1.0])
        np.testing.assert_allclose(out[1], [1.0, 1.0])
