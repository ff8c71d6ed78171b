"""Value parity for the two PRIMARY YOLO training losses.

The shipped trainer defaults to the reference's `ComputeLoss`
(/root/reference/yolo/yolov7/utils/loss.py:425, neighbor assigner) and
`ComputeLossOTA` (loss.py:559, SimOTA assigner).  Both are executed here
as oracles via the stub harness on canned batches (including multi-gt
conflict cases) and `training/losses.yolo_loss` must reproduce their
box/obj/cls values.
"""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_pipeline_oracle as R  # noqa: E402

pytestmark = pytest.mark.skipif(not R.reference_available(),
                                reason="reference not mounted")

ANCHORS = [[12, 16, 19, 36, 40, 28],
           [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]
CH = (32, 48, 64)
SHAPES = ((8, 8), (4, 4), (2, 2))
STRIDES = (8, 16, 32)
NC = 3
HYP = {"cls_pw": 1.0, "obj_pw": 1.0, "fl_gamma": 0.0,
       "box": 0.05, "obj": 0.7, "cls": 0.3, "anchor_t": 4.0}

# Canned batches: rows [img, cls, cx, cy, w, h] normalized.  Sizes span
# all three levels so every level keeps >=1 OTA match (the reference's
# build_targets hard-codes cuda:0 empties otherwise, loss.py:788).
BATCH_PLAIN = np.array([
    [0, 1, 0.52, 0.48, 0.30, 0.40],
    [0, 0, 0.25, 0.25, 0.10, 0.12],
    [0, 2, 0.55, 0.55, 0.85, 0.75],
    [1, 2, 0.70, 0.60, 0.45, 0.35],
    [1, 0, 0.40, 0.45, 0.90, 0.80],
], np.float32)
# multi-gt conflict: two near-identical gts in image 0 fight over the
# same candidate cells (SimOTA resolves per column to the lowest-cost gt)
BATCH_CONFLICT = np.array([
    [0, 1, 0.50, 0.50, 0.28, 0.36],
    [0, 2, 0.51, 0.49, 0.30, 0.38],
    [0, 0, 0.20, 0.75, 0.12, 0.10],
    [1, 0, 0.60, 0.40, 0.80, 0.85],
    [1, 1, 0.35, 0.65, 0.40, 0.30],
], np.float32)
# image 1 has no gts at all (empty-image path).  Image 0's gts are kept
# spatially separated: when overlapping gts pool duplicate candidate
# columns, the duplicates tie in cost and the reference's own loss value
# then depends on torch.topk's tie order (verified: the tied+conflicted
# variant of this batch yields different selections run-to-run across
# topk implementations) — conflict coverage lives in BATCH_CONFLICT,
# which conflicts WITHOUT boundary ties.
BATCH_EMPTY_IMG = np.array([
    [0, 0, 0.20, 0.20, 0.14, 0.12],
    [0, 1, 0.72, 0.30, 0.42, 0.38],
    [0, 2, 0.45, 0.68, 0.88, 0.62],
], np.float32)
BATCHES = [("plain", 2, 0, BATCH_PLAIN),
           ("conflict", 2, 1, BATCH_CONFLICT),
           ("empty_img", 2, 2, BATCH_EMPTY_IMG)]


@pytest.fixture(scope="module")
def ref_env():
    env = R.install_reference_environment()
    return env


def _make_det(ref_env, seed):
    import torch

    torch.manual_seed(seed)
    det = ref_env["yolo_models"].IDetect(nc=NC, anchors=ANCHORS, ch=CH)
    det.stride = torch.tensor([float(s) for s in STRIDES])
    with torch.no_grad():  # Model.__init__ stores anchors in grid units
        det.anchors /= det.stride.view(-1, 1, 1)
    det.train()
    return det


def _fake_model(det):
    import torch

    class FakeModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.ModuleList([det])
            self.hyp = dict(HYP)
            self.gr = 1.0

    return FakeModel()


def _maps(seed, B):
    rng = np.random.default_rng(seed)
    det_no = NC + 5
    return [rng.normal(size=(B, 3, h, w, det_no)).astype(np.float32)
            for (h, w) in SHAPES]


def _ours_inputs(maps_np, tgts, B):
    raw_maps = [jnp.asarray(np.transpose(m, (0, 2, 3, 1, 4)).reshape(
        B, h, w, -1)) for m, (h, w) in zip(maps_np, SHAPES)]
    T = max(int((tgts[:, 0] == b).sum()) for b in range(B))
    T = max(T, 1)
    targets = np.zeros((B, T, 5), np.float32)
    counts = [0] * B
    for row in tgts:
        b = int(row[0])
        targets[b, counts[b]] = row[1:]
        counts[b] += 1
    anchors = jnp.asarray(np.asarray(ANCHORS, np.float32).reshape(3, 3, 2))
    return raw_maps, jnp.asarray(targets), anchors


def _run_reference(ref_env, loss_cls_name, det, maps_np, tgts, B):
    import importlib

    import torch

    ref_loss_mod = importlib.import_module("yolov7.utils.loss")
    loss_fn = getattr(ref_loss_mod, loss_cls_name)(_fake_model(det))
    p = [torch.from_numpy(m.copy()) for m in maps_np]
    imgs = torch.zeros((B, 3, SHAPES[0][0] * STRIDES[0],
                        SHAPES[0][1] * STRIDES[0]))
    args = (p, torch.from_numpy(tgts.copy()))
    if loss_cls_name == "ComputeLossOTA":
        args = args + (imgs,)
    loss, items = loss_fn(*args)
    lbox, lobj, lcls, _total = [float(x) for x in items]
    return float(loss), lbox, lobj, lcls


class TestComputeLoss:
    """Reference ComputeLoss (loss.py:425) vs yolo_loss(assigner="neighbor")."""

    @pytest.mark.parametrize("name,B,seed,tgts", BATCHES,
                             ids=[b[0] for b in BATCHES])
    def test_loss_value_parity(self, ref_env, name, B, seed, tgts):
        from hamer_yolo_tpu.training.losses import yolo_loss

        det = _make_det(ref_env, seed)
        maps_np = _maps(seed + 10, B)
        ref_total, lbox, lobj, lcls = _run_reference(
            ref_env, "ComputeLoss", det, maps_np, tgts, B)

        raw_maps, targets, anchors = _ours_inputs(maps_np, tgts, B)
        out = yolo_loss(raw_maps, targets, anchors, STRIDES, nc=NC,
                        assigner="neighbor",
                        box_w=HYP["box"], obj_w=HYP["obj"], cls_w=HYP["cls"])
        assert float(out["box"]) == pytest.approx(lbox / HYP["box"], rel=1e-5)
        assert float(out["obj"]) == pytest.approx(lobj / HYP["obj"], rel=1e-5)
        assert float(out["cls"]) == pytest.approx(lcls / HYP["cls"], rel=1e-5)
        assert float(out["loss"]) == pytest.approx(ref_total, rel=1e-5)


class TestComputeLossOTA:
    """Reference ComputeLossOTA (loss.py:559) vs yolo_loss(assigner="simota")."""

    @pytest.mark.parametrize("name,B,seed,tgts", BATCHES,
                             ids=[b[0] for b in BATCHES])
    def test_loss_value_parity(self, ref_env, name, B, seed, tgts):
        from hamer_yolo_tpu.training.losses import yolo_loss

        det = _make_det(ref_env, seed)
        maps_np = _maps(seed + 20, B)
        ref_total, lbox, lobj, lcls = _run_reference(
            ref_env, "ComputeLossOTA", det, maps_np, tgts, B)

        raw_maps, targets, anchors = _ours_inputs(maps_np, tgts, B)
        out = yolo_loss(raw_maps, targets, anchors, STRIDES, nc=NC,
                        assigner="simota",
                        box_w=HYP["box"], obj_w=HYP["obj"], cls_w=HYP["cls"])
        assert float(out["box"]) == pytest.approx(lbox / HYP["box"], rel=1e-5)
        assert float(out["obj"]) == pytest.approx(lobj / HYP["obj"], rel=1e-5)
        assert float(out["cls"]) == pytest.approx(lcls / HYP["cls"], rel=1e-5)
        assert float(out["loss"]) == pytest.approx(ref_total, rel=1e-5)
