"""Tests: training-curve / mosaic / keypoint / label plots (utils/plots.py).

Parity targets: reference yolo/yolov7/utils/plots.py (plot_images :164,
output_to_target :155, output_to_keypoint :486, plot_skeleton_kpts :497,
plot_labels :322, plot_lr_scheduler :243, plot_results :450) and
rootnet/vis_tool.py 3D plotting.
"""
import json
import os

import numpy as np
import pytest

from hamer_yolo_tpu.utils import plots


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestOutputConversions:
    def test_output_to_target(self):
        boxes = np.array([[[10.0, 20.0, 30.0, 60.0], [0, 0, 0, 0]],
                          [[5.0, 5.0, 15.0, 25.0], [1, 1, 9, 9]]])
        scores = np.array([[0.9, 0.0], [0.8, 0.7]])
        classes = np.array([[1, 0], [2, 0]])
        valid = np.array([[True, False], [True, True]])
        t = plots.output_to_target(boxes, scores, classes, valid)
        assert t.shape == (3, 7)
        # row 0: img 0, cls 1, xywh of [10,20,30,60], conf 0.9
        np.testing.assert_allclose(t[0], [0, 1, 20, 40, 20, 40, 0.9])
        assert t[1][0] == 1 and t[2][0] == 1  # both from image 1

    def test_output_to_target_empty(self):
        t = plots.output_to_target(np.zeros((2, 3, 4)), np.zeros((2, 3)),
                                   np.zeros((2, 3)), np.zeros((2, 3), bool))
        assert t.shape == (0, 7)

    def test_output_to_keypoint(self):
        boxes = np.array([[[0.0, 0.0, 10.0, 10.0]]])
        kpts = np.arange(6, dtype=np.float64)[None, None]  # nkpt=2, steps=3
        t = plots.output_to_keypoint(boxes, np.array([[0.5]]),
                                     np.array([[0]]), kpts,
                                     np.array([[True]]))
        assert t.shape == (1, 13)
        np.testing.assert_allclose(t[0, 7:], np.arange(6))


class TestPlotImages:
    def test_mosaic_shape_and_boxes(self, rng, tmp_path):
        imgs = rng.uniform(0, 1, (5, 64, 64, 3)).astype(np.float32)
        # normalized label rows [img, cls, x, y, w, h]
        targets = np.array([[0, 1, 0.5, 0.5, 0.4, 0.4],
                            [3, 0, 0.3, 0.3, 0.2, 0.2]])
        out = str(tmp_path / "batch.jpg")
        mosaic = plots.plot_images(imgs, targets, fname=out,
                                   paths=[f"im{i}.jpg" for i in range(5)],
                                   names=["hand", "left", "right"])
        ns = 3  # ceil(sqrt(5))
        assert mosaic.shape == (ns * 64, ns * 64, 3)
        assert mosaic.dtype == np.uint8
        assert os.path.exists(out)

    def test_prediction_conf_threshold(self, rng):
        imgs = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
        base = plots.plot_images(imgs, np.zeros((0, 6)))
        # conf 0.1 <= 0.25 -> no box drawn beyond border/labels
        low = plots.plot_images(
            imgs, np.array([[0, 0, 0.5, 0.5, 0.5, 0.5, 0.1]]))
        high = plots.plot_images(
            imgs, np.array([[0, 0, 0.5, 0.5, 0.5, 0.5, 0.9]]))
        assert (low == base).all()
        assert (high != base).any()

    def test_pixel_coords_and_downscale(self, rng):
        imgs = rng.integers(0, 255, (2, 100, 100, 3)).astype(np.uint8)
        targets = np.array([[0, 0, 50.0, 50.0, 40.0, 40.0]])  # pixel xywh
        mosaic = plots.plot_images(imgs, targets, max_size=50)
        assert mosaic.shape == (2 * 50, 2 * 50, 3)


class TestSkeletonKpts:
    def test_draw_and_conf_skip(self, rng):
        im = rng.integers(0, 255, (80, 80, 3)).astype(np.uint8)
        nkpt = 17
        kpts = np.zeros(nkpt * 3)
        kpts[0::3] = rng.uniform(10, 70, nkpt)
        kpts[1::3] = rng.uniform(10, 70, nkpt)
        kpts[2::3] = 1.0
        out = plots.plot_skeleton_kpts(im.copy(), kpts)
        assert (out != im).any()
        # all-low-conf: nothing drawn
        kpts[2::3] = 0.1
        out2 = plots.plot_skeleton_kpts(im.copy(), kpts)
        assert (out2 == im).all()

    def test_steps2_no_conf(self, rng):
        im = rng.integers(0, 255, (80, 80, 3)).astype(np.uint8)
        kpts = np.tile([40.0, 40.0], 17)
        out = plots.plot_skeleton_kpts(im.copy(), kpts, steps=2)
        assert (out != im).any()

    def test_hand_topology(self, rng):
        from hamer_yolo_tpu.utils.viz import HAND_SKELETON

        im = rng.integers(0, 255, (80, 80, 3)).astype(np.uint8)
        kpts = np.tile([30.0, 30.0, 1.0], 21)
        out = plots.plot_skeleton_kpts(im.copy(), kpts,
                                       skeleton=HAND_SKELETON)
        assert (out != im).any()


class TestLabelAndCurvePlots:
    def test_plot_labels(self, rng, tmp_path):
        labels = np.column_stack([
            rng.integers(0, 3, 200),
            rng.uniform(0.1, 0.9, 200), rng.uniform(0.1, 0.9, 200),
            rng.uniform(0.05, 0.5, 200), rng.uniform(0.05, 0.5, 200)])
        out = plots.plot_labels(labels, str(tmp_path / "labels.png"),
                                names=["hand", "left", "right"])
        assert os.path.exists(out) and os.path.getsize(out) > 0

    def test_plot_lr_scheduler(self, tmp_path):
        import optax

        sched = optax.cosine_decay_schedule(0.01, 100)
        out = plots.plot_lr_scheduler(sched, 100, str(tmp_path / "lr.png"))
        assert os.path.exists(out)

    def test_plot_results(self, tmp_path):
        path = tmp_path / "metrics.jsonl"
        with open(path, "w") as f:
            for s in range(10):
                f.write(json.dumps({"step": s, "loss": 1.0 / (s + 1),
                                    "box": 0.5, "time": 0.0}) + "\n")
        out = plots.plot_results(str(tmp_path))
        assert os.path.exists(out)

    def test_plot_3d_pose_and_pcl(self, rng, tmp_path):
        joints = rng.normal(size=(21, 3))
        out = plots.plot_3d_pose(joints, str(tmp_path / "pose.png"),
                                 pcl=rng.normal(size=(100, 3)))
        assert os.path.exists(out)
        out2 = plots.plot_point_cloud(rng.normal(size=(50, 3)),
                                      str(tmp_path / "pcl.png"),
                                      color_by=rng.uniform(size=50))
        assert os.path.exists(out2)
