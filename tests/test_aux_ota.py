"""IAuxDetect training form + ComputeLossAuxOTA loss-value parity.

The reference's ComputeLossAuxOTA (yolo/yolov7/utils/loss.py:1179) is
executed as the oracle on a canned batch of training-form maps; our
yolo_loss(assigner="simota", ota_topk=20, aux_maps=...) must reproduce
the loss values. Also covers the AUXDET spec op end-to-end (training
yaml ingestion -> init -> train forward emitting lead+aux maps ->
inference forward emitting lead-only maps).
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_pipeline_oracle as R  # noqa: E402

pytestmark = pytest.mark.skipif(not R.reference_available(),
                                reason="reference not mounted")

ANCHORS = [[12, 16, 19, 36, 40, 28],
           [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]
CH = (32, 48, 64, 32, 48, 64)  # lead ch + aux ch
SHAPES = ((8, 8), (4, 4), (2, 2))


@pytest.fixture(scope="module")
def ref_yolo():
    env = R.install_reference_environment()
    return env["yolo_models"]


class TestComputeLossAuxOTA:
    def test_loss_value_parity(self, ref_yolo, rng):
        import importlib

        import torch

        ref_loss_mod = importlib.import_module("yolov7.utils.loss")

        torch.manual_seed(3)
        det = ref_yolo.IAuxDetect(nc=3, anchors=ANCHORS, ch=CH)
        det.stride = torch.tensor([8.0, 16.0, 32.0])
        with torch.no_grad():  # Model.__init__ stores anchors in grid units
            det.anchors /= det.stride.view(-1, 1, 1)
        det.train()

        class FakeModel(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.model = torch.nn.ModuleList([det])
                self.hyp = {"cls_pw": 1.0, "obj_pw": 1.0, "fl_gamma": 0.0,
                            "box": 0.05, "obj": 0.7, "cls": 0.3,
                            "anchor_t": 4.0}
                self.gr = 1.0

        loss_fn = ref_loss_mod.ComputeLossAuxOTA(FakeModel())

        B = 2
        no = det.no
        na = det.na
        rng_l = np.random.default_rng(11)
        lead_np = [rng_l.normal(size=(B, na, h, w, no)).astype(np.float32)
                   for (h, w) in SHAPES]
        aux_np = [rng_l.normal(size=(B, na, h, w, no)).astype(np.float32)
                  for (h, w) in SHAPES]
        p = [torch.from_numpy(m.copy()) for m in lead_np + aux_np]

        # every image needs a match on EVERY level (reference build_targets
        # creates hard-coded cuda:0 empties otherwise, loss.py:1116)
        tgts = np.array([
            [0, 1, 0.52, 0.48, 0.30, 0.40],
            [0, 0, 0.25, 0.25, 0.10, 0.12],
            [0, 2, 0.55, 0.55, 0.85, 0.75],
            [1, 2, 0.70, 0.60, 0.45, 0.35],
            [1, 0, 0.40, 0.45, 0.90, 0.80],
        ], np.float32)
        imgs = torch.zeros((B, 3, 64, 64))
        loss, items = loss_fn(p, torch.from_numpy(tgts.copy()), imgs)
        ref_lbox, ref_lobj, ref_lcls, ref_total = [float(x) for x in items]

        from hamer_yolo_tpu.training.losses import yolo_loss

        def to_ours(maps_np):
            return [jnp.asarray(np.transpose(m, (0, 2, 3, 1, 4)).reshape(
                B, h, w, na * no))
                for m, (h, w) in zip(maps_np, SHAPES)]

        T = 3
        targets = np.zeros((B, T, 5), np.float32)
        counts = {0: 0, 1: 0}
        for row in tgts:
            b = int(row[0])
            targets[b, counts[b]] = row[1:]
            counts[b] += 1
        anchors = jnp.asarray(np.asarray(ANCHORS, np.float32).reshape(3, 3, 2))

        got = yolo_loss(to_ours(lead_np), jnp.asarray(targets), anchors,
                        (8, 16, 32), nc=3, assigner="simota", ota_topk=20,
                        aux_maps=to_ours(aux_np))
        np.testing.assert_allclose(float(got["box"]) * 0.05, ref_lbox,
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(got["obj"]) * 0.7, ref_lobj,
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(got["cls"]) * 0.3, ref_lcls,
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(got["loss"]), float(loss),
                                   rtol=2e-4, atol=2e-5)


class TestAuxDetGraph:
    def test_training_yaml_ingests_and_forwards(self, rng):
        from hamer_yolo_tpu.models.yolov7.model import (
            AUXDET, init_yolov7, split_aux_maps, yolov7_backbone_forward,
            yolov7_train_forward,
        )
        from hamer_yolo_tpu.models.yolov7.yaml_spec import load_yaml_model_cfg

        path = "/root/reference/yolo/yolov7/cfg/training/yolov7-w6.yaml"
        spec, cfg = load_yaml_model_cfg(path, nc=3, training_form=True)
        assert spec[-1][1] == AUXDET
        assert len(spec[-1][0]) == 8  # 4 lead + 4 aux inputs
        assert cfg.strides == (8, 16, 32, 64)

        import dataclasses
        cfg = dataclasses.replace(cfg, compute_dtype="float32")
        params = init_yolov7(jax.random.PRNGKey(0), cfg, deploy=False,
                             spec=spec)
        x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)).astype(np.float32))
        maps, _ = yolov7_train_forward(params, x, cfg, spec=spec)
        lead, aux = split_aux_maps(maps, spec)
        assert len(lead) == 4 and len(aux) == 4
        for m_l, m_a, s in zip(lead, aux, cfg.strides):
            assert m_l.shape[1] == 128 // s
            assert m_a.shape[1:3] == m_l.shape[1:3]
            assert m_a.shape[-1] == cfg.na * cfg.no

        # inference forward: lead maps only (deploy strip)
        params_d = init_yolov7(jax.random.PRNGKey(0), cfg, deploy=True,
                               spec=spec)
        inf_maps = yolov7_backbone_forward(params_d, x, cfg, spec=spec)
        assert len(inf_maps) == 4


class TestAuxTrainStep:
    def test_train_step_on_mini_aux_spec(self):
        """train_aux.py-equivalent step: grads flow through lead AND aux
        heads with the AuxOTA loss; finite loss, params change."""
        import dataclasses

        from hamer_yolo_tpu.models.yolov7.model import (
            AUXDET, C, YoloConfig,
        )
        from hamer_yolo_tpu.training.train_yolo import (
            init_yolo_train_state, make_yolo_train_step,
            synthetic_yolo_batch,
        )

        spec = [
            (-1, C, (8, 3, 2)),    # /2
            (-1, C, (16, 3, 2)),   # /4
            (-1, C, (16, 3, 2)),   # /8   lead P3
            (-1, C, (32, 3, 2)),   # /16  lead P4
            (2, C, (16, 1, 1)),    # /8   aux P3
            (3, C, (32, 1, 1)),    # /16  aux P4
            ((2, 3, 4, 5), AUXDET, ()),
        ]
        anchors2 = ((12, 16, 19, 36, 40, 28), (36, 75, 76, 55, 72, 146))
        cfg = YoloConfig(nc=3, anchors=anchors2, strides=(8, 16),
                        img_size=64, compute_dtype="float32")
        state, tx = init_yolo_train_state(jax.random.PRNGKey(0), cfg,
                                          total_steps=4, spec=spec)
        step = jax.jit(make_yolo_train_step(cfg, tx, spec=spec,
                                            assigner="simota", ota_topk=20))
        batch = synthetic_yolo_batch(jax.random.PRNGKey(1), 2, img_size=64)
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

        # aux heads receive gradient (params themselves don't move at
        # step 0 — the OneCycle warmup LR starts at 0, optim.py:33-36)
        from hamer_yolo_tpu.models.yolov7.model import (
            split_aux_maps, yolov7_train_forward,
        )
        from hamer_yolo_tpu.training.losses import yolo_loss
        anchors = jnp.asarray(
            np.asarray(cfg.anchors, np.float32).reshape(cfg.nl, cfg.na, 2))

        def loss_only(params):
            maps, _ = yolov7_train_forward(params, batch["img"], cfg,
                                           spec=spec)
            lead, aux = split_aux_maps(maps, spec)
            return yolo_loss([m.astype(jnp.float32) for m in lead],
                             batch["targets"], anchors, cfg.strides, cfg.nc,
                             assigner="simota", ota_topk=20,
                             aux_maps=[m.astype(jnp.float32) for m in aux],
                             )["loss"]

        g = jax.grad(loss_only)(state.params)
        assert float(jnp.abs(g["layers"][-1]["m2"][0]["w"]).max()) > 0
        assert float(jnp.abs(g["layers"][-1]["m"][0]["w"]).max()) > 0
