"""Parity tests for the remaining transforms: MultiScaleCrop offsets,
TenCrop layout, ColorJitter lighting, Pad, RandomRescaledCrop."""

import numpy as np
import pytest

from mvfnet_tpu.data.transforms import (ColorJitter, MultiScaleCrop, Pad,
                                        RandomRescaledCrop, TenCrop)


class TestMultiScaleCrop:
    def test_fix_offset_grid_matches_reference(self):
        """fill_fix_offset (augmentations.py:160-183): 5 basic + 8 extra."""
        offs = MultiScaleCrop.fill_fix_offset(False, 340, 256, 224, 224)
        w_step, h_step = (340 - 224) // 4, (256 - 224) // 4
        assert offs == [(0, 0), (4 * w_step, 0), (0, 4 * h_step),
                        (4 * w_step, 4 * h_step), (2 * w_step, 2 * h_step)]
        offs13 = MultiScaleCrop.fill_fix_offset(True, 340, 256, 224, 224)
        assert len(offs13) == 13
        assert (1 * w_step, 1 * h_step) in offs13

    def test_crop_sizes_snap_to_input_size(self):
        """Crop sizes within 3px of input_size snap to it
        (augmentations.py:133-136)."""
        msc = MultiScaleCrop(input_size=224, scales=[1, .875, .75, .66])
        g = {'img_group': [np.zeros((256, 256, 3), np.uint8)],
             'modality': 'RGB', 'rng': np.random.default_rng(0)}
        out = msc(g)
        assert out['img_group'][0].shape == (224, 224, 3)
        # base 256: crops {256, 224(snapped from 224.0), 192, 168}
        x1, y1, x2, y2 = out['crop_bbox']
        assert (x2 - x1 + 1) in (256, 224, 192, 168)


class TestTenCrop:
    def test_ten_groups_with_flips(self):
        """TenCrop: per fixed offset, [frames..., flipped frames...]
        (augmentations.py:563-587) -> 10 groups."""
        frames = [np.full((256, 340, 3), i, np.uint8) for i in range(2)]
        out = TenCrop(224)({'img_group': frames, 'modality': 'RGB'})
        assert len(out['img_group']) == 20  # 5 offsets x (2 + 2 flipped)
        assert all(im.shape == (224, 224, 3) for im in out['img_group'])
        # group order: frame ids repeat [0,1, 0,1] per offset
        vals = [int(im[0, 0, 0]) for im in out['img_group']]
        assert vals == [0, 1, 0, 1] * 5

    def test_flip_is_mirror(self):
        img = np.zeros((224, 224, 3), np.uint8)
        img[:, :112] = 255  # left half white
        out = TenCrop(224)({'img_group': [img], 'modality': 'RGB'})
        normal, flipped = out['img_group'][0], out['img_group'][1]
        np.testing.assert_array_equal(flipped, normal[:, ::-1])


class TestColorJitter:
    def test_pca_lighting_matches_formula(self):
        """Lighting noise: bgr += reversed(eigvec*alpha @ eigval)
        (augmentations.py:327-331)."""
        img = np.full((4, 4, 3), 100, np.float32)
        cj = ColorJitter(color_space_aug=False, alphastd=0.1)
        rng = np.random.default_rng(3)
        expected_alpha = np.random.default_rng(3).normal(0, 0.1, size=(3,))
        out = cj({'img_group': [img.copy()], 'modality': 'RGB',
                  'rng': rng})['img_group'][0]
        rgb = np.dot(cj.eigvec * expected_alpha, cj.eigval)
        expect = img + rgb[::-1][None, None, :].astype(np.float32)
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_color_space_aug_changes_image(self):
        img = np.random.RandomState(0).randint(
            0, 255, (8, 8, 3), np.uint8)
        cj = ColorJitter(color_space_aug=True)
        out = cj({'img_group': [img], 'modality': 'RGB',
                  'rng': np.random.default_rng(1)})['img_group'][0]
        assert out.shape == img.shape
        assert not np.allclose(out, img)


class TestPad:
    def test_pad_to_multiple(self):
        out = Pad(32)({'img_group': [np.ones((50, 70, 3), np.float32)],
                       'modality': 'RGB'})
        assert out['img_group'][0].shape == (64, 96, 3)
        # padding is zeros bottom/right
        assert out['img_group'][0][63, 95, 0] == 0
        assert out['img_group'][0][49, 69, 0] == 1


class TestRandomRescaledCrop:
    def test_output_size_and_range(self):
        rrc = RandomRescaledCrop(112, scale=(128, 160))
        g = {'img_group': [np.zeros((240, 320, 3), np.uint8)],
             'modality': 'RGB', 'rng': np.random.default_rng(0)}
        out = rrc(g)
        assert out['img_group'][0].shape == (112, 112, 3)


class TestMiscFormatOps:
    def test_resize_fixed_size(self):
        from mvfnet_tpu.data.transforms import Resize
        out = Resize(scale=(100, 60), keep_ratio=False)(
            {'img_group': [np.zeros((240, 320, 3), np.uint8)],
             'modality': 'RGB'})
        assert out['img_group'][0].shape == (60, 100, 3)

    def test_image_to_tensor_and_transpose(self):
        from mvfnet_tpu.data.transforms import ImageToTensor, Transpose
        img = np.arange(24, dtype=np.float32).reshape(2, 4, 3)
        out = ImageToTensor(['img'])({'img': img.copy()})
        assert out['img'].shape == (3, 2, 4)
        out2 = Transpose(['img'], (1, 2, 0))({'img': out['img']})
        np.testing.assert_array_equal(out2['img'], img)

    def test_nthwc_format(self):
        from mvfnet_tpu.data.transforms import FormatShape
        frames = [np.zeros((8, 8, 3), np.uint8) for _ in range(12)]
        out = FormatShape('NTHWC')(
            dict(img_group=frames, modality='RGB', num_clips=3, clip_len=4))
        assert out['img_group'].shape == (3, 4, 8, 8, 3)

    def test_nthwc_uniform_sampling_special_case(self):
        """clip_len==1, num_clips>1 -> clips become the temporal axis
        (reference formating.py:167-172)."""
        from mvfnet_tpu.data.transforms import FormatShape
        frames = [np.zeros((8, 8, 3), np.uint8) for _ in range(6)]
        out = FormatShape('NTHWC')(
            dict(img_group=frames, modality='RGB', num_clips=6, clip_len=1))
        assert out['img_group'].shape == (1, 6, 8, 8, 3)
