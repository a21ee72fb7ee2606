"""Preprocessing + multi-host helper tests."""
import numpy as np
import pytest
from PIL import Image

from xai_tpu.ops.preprocess import (center_crop_resize, denormalize,
                                    normalize)
from xai_tpu.parallel.multi_host import allreduce_scores, my_shard


def test_center_crop_resize_landscape():
    img = Image.fromarray(
        (np.random.RandomState(0).rand(300, 500, 3) * 255).astype(np.uint8))
    out = center_crop_resize(img, 224)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_center_crop_resize_portrait_and_exact():
    img = Image.fromarray(
        (np.random.RandomState(1).rand(500, 300, 3) * 255).astype(np.uint8))
    out = center_crop_resize(img, 224)
    assert out.shape == (224, 224, 3)
    # already-square 224 input passes through the resize unchanged
    sq = Image.fromarray(
        (np.random.RandomState(2).rand(224, 224, 3) * 255).astype(np.uint8))
    out2 = center_crop_resize(sq, 224)
    assert np.allclose(out2, np.asarray(sq, np.float32) / 255.0)


def test_center_crop_centering():
    """The crop takes the CENTER region (reference CenterCrop)."""
    arr = np.zeros((100, 200, 3), np.uint8)
    arr[:, 75:125] = 255          # vertical stripe in the center
    img = Image.fromarray(arr)
    out = center_crop_resize(img, 100)
    # resized by 1.0 (short edge 100), crop cols 50:150 -> stripe at 25:75
    assert out[:, 50].mean() > 0.9
    assert out[:, 10].mean() < 0.1


def test_normalize_roundtrip():
    rs = np.random.RandomState(3)
    x = rs.rand(8, 8, 3).astype(np.float32)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    back = np.asarray(denormalize(normalize(x, mean, std), mean, std))
    assert np.allclose(back, x, atol=1e-6)


def test_multi_host_helpers_single_process():
    assert my_shard([1, 2, 3]) == [1, 2, 3]
    out = allreduce_scores({"a": 4.0, "b": 2.0}, 2)
    assert out == {"a": 2.0, "b": 1.0}
