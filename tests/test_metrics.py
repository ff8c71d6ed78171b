"""Metrics tests: Procrustes, MPJPE/PA-MPJPE, PCK, AP."""
import numpy as np
from scipy.spatial.transform import Rotation as R

from hamer_yolo_tpu.utils import metrics as M


class TestPose:
    def test_procrustes_recovers_similarity(self, rng):
        S2 = rng.normal(size=(21, 3))
        rot = R.from_rotvec([0.2, -0.4, 0.7]).as_matrix()
        S1 = (S2 @ rot.T) * 0.5 + np.array([1.0, -2.0, 3.0])
        aligned = M.compute_similarity_transform(S1, S2)
        np.testing.assert_allclose(aligned, S2, atol=1e-8)

    def test_pa_mpjpe_invariant_to_similarity(self, rng):
        gt = rng.normal(size=(4, 21, 3))
        rot = R.from_rotvec([0.1, 0.2, 0.3]).as_matrix()
        pred = np.einsum("bnj,kj->bnk", gt, rot) * 2.0 + 5.0
        err = M.reconstruction_error(pred, gt)
        np.testing.assert_allclose(err, 0.0, atol=1e-8)

    def test_mpjpe_root_centered(self):
        gt = np.zeros((1, 3, 3))
        pred = np.ones((1, 3, 3))  # constant offset
        assert M.mpjpe(pred, gt, root_idx=0)[0] == 0.0
        assert M.mpjpe(pred, gt)[0] > 0.0

    def test_pck(self):
        gt = np.zeros((1, 4, 2))
        pred = np.array([[[0, 0], [3, 0], [0, 6], [10, 0.0]]])
        out = M.pck(pred, gt, np.array([1.0, 5.0, 20.0]))
        np.testing.assert_allclose(out, [0.25, 0.5, 1.0])

    def test_evaluator(self, rng):
        ev = M.Evaluator()
        gt = rng.normal(size=(2, 21, 3))
        ev.update(gt + 0.001, gt, gt + 0.002, gt)
        res = ev.results()
        assert 0 < res["mpjpe_mm"] < 2
        assert res["mpvpe_mm"] > 0


class TestDetection:
    def test_perfect_ap(self):
        gt = np.array([[0.0, 0, 0, 10, 10], [1.0, 20, 20, 30, 30]])
        pred_boxes = gt[:, 1:]
        tp = M.match_predictions(pred_boxes, gt[:, 0], gt[:, 1:], gt[:, 0],
                                 np.array([0.5, 0.75]))
        assert tp.all()
        res = M.ap_per_class(tp, np.array([0.9, 0.8]), gt[:, 0], gt[:, 0])
        assert res["map50"] > 0.99

    def test_missed_detection(self):
        gt_boxes = np.array([[0.0, 0, 10, 10]])
        pred_boxes = np.array([[50.0, 50, 60, 60]])
        tp = M.match_predictions(pred_boxes, np.array([0.0]), gt_boxes,
                                 np.array([0.0]), np.array([0.5]))
        assert not tp.any()

    def test_confusion_matrix(self):
        cm = M.ConfusionMatrix(nc=2)
        dets = np.array([[0, 0, 10, 10, 0.9, 0], [20, 20, 30, 30, 0.9, 1]])
        labels = np.array([[0, 0, 0, 10, 10], [1, 20, 20, 30, 30]])
        cm.process_batch(dets, labels)
        assert cm.matrix[0, 0] == 1 and cm.matrix[1, 1] == 1
        assert cm.matrix[2].sum() == 0
