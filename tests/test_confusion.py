import numpy as np

from xai_tpu.metrics.confusion import ConfusionMatrix, IoU


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(3)
    cm.add([0, 1, 2, 2], [0, 1, 1, 2])
    v = cm.value()
    assert v[0, 0] == 1 and v[1, 1] == 1 and v[2, 2] == 1 and v[1, 2] == 1
    assert v.sum() == 4
    cm.reset()
    assert cm.value().sum() == 0


def test_iou_perfect_and_partial():
    iou = IoU(2)
    iou.add([0, 0, 1, 1], [0, 0, 1, 1])
    per, mean = iou.value()
    assert np.allclose(per, [1.0, 1.0]) and mean == 1.0
    iou.reset()
    iou.add([0, 1, 1, 1], [0, 0, 1, 1])
    per, mean = iou.value()
    # class0: tp=1 fp=0 fn=1 -> 0.5; class1: tp=2 fp=1 fn=0 -> 2/3
    assert np.allclose(per, [0.5, 2 / 3])


def test_iou_ignore_index():
    iou = IoU(3, ignore_index=2)
    iou.add([0, 1, 2], [0, 1, 2])
    per, mean = iou.value()
    assert np.isnan(per[2])
    assert np.allclose(per[:2], [1.0, 1.0])
