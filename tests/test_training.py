"""Training loop tests: YOLO loss/step, EMA, schedules."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.yolov7.model import YOLOV7_ANCHORS, YoloConfig
from hamer_yolo_tpu.training.losses import bbox_ciou, yolo_loss
from hamer_yolo_tpu.training.optim import (
    ema_init, ema_update, one_cycle_cosine, decay_mask,
)
from hamer_yolo_tpu.training.train_yolo import (
    init_yolo_train_state, make_yolo_train_step, synthetic_yolo_batch,
)

SMALL_CFG = YoloConfig(nc=3, img_size=64, compute_dtype="float32")


class TestCiou:
    def test_perfect_overlap(self):
        b = jnp.array([[10.0, 10, 4, 4]])
        np.testing.assert_allclose(np.asarray(bbox_ciou(b, b)), 1.0, atol=1e-6)

    def test_disjoint_negative(self):
        a = jnp.array([[0.0, 0, 2, 2]])
        b = jnp.array([[10.0, 10, 2, 2]])
        assert float(bbox_ciou(a, b)[0]) < 0.0


class TestYoloLoss:
    def test_finite_and_nonzero(self, rng):
        maps = [jnp.asarray(rng.normal(size=(2, s, s, 24)).astype(np.float32))
                for s in (8, 4, 2)]
        batch = synthetic_yolo_batch(jax.random.PRNGKey(0), 2, 64)
        out = yolo_loss(maps, batch["targets"], jnp.asarray(YOLOV7_ANCHORS),
                        (8, 16, 32), nc=3)
        assert np.isfinite(float(out["loss"]))
        assert float(out["box"]) > 0 and float(out["obj"]) > 0

    def test_simota_assigner(self, rng):
        maps = [jnp.asarray(rng.normal(size=(2, s, s, 24)).astype(np.float32))
                for s in (8, 4, 2)]
        batch = synthetic_yolo_batch(jax.random.PRNGKey(0), 2, 64)
        out = yolo_loss(maps, batch["targets"], jnp.asarray(YOLOV7_ANCHORS),
                        (8, 16, 32), nc=3, assigner="simota")
        assert np.isfinite(float(out["loss"]))
        assert float(out["box"]) > 0
        # simota is differentiable end to end
        def f(m0):
            return yolo_loss([m0, maps[1], maps[2]], batch["targets"],
                             jnp.asarray(YOLOV7_ANCHORS), (8, 16, 32), 3,
                             assigner="simota")["loss"]
        g = jax.grad(f)(maps[0])
        assert np.isfinite(np.asarray(g)).all()

    def test_no_targets_only_obj(self):
        maps = [jnp.zeros((1, s, s, 24)) for s in (8, 4, 2)]
        targets = jnp.zeros((1, 4, 5))
        out = yolo_loss(maps, targets, jnp.asarray(YOLOV7_ANCHORS), (8, 16, 32), 3)
        assert float(out["box"]) == 0.0
        assert float(out["obj"]) > 0.0  # BCE against all-zero targets


class TestTrainStep:
    def test_step_updates_and_loss_decreases(self):
        state, tx = init_yolo_train_state(jax.random.PRNGKey(0), SMALL_CFG, 100)
        step = jax.jit(make_yolo_train_step(SMALL_CFG, tx))
        batch = synthetic_yolo_batch(jax.random.PRNGKey(1), 2, 64)
        losses = []
        for _ in range(4):
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # overfits a fixed batch
        assert int(state.step) == 4
        assert int(state.ema.updates) == 4


class TestOptim:
    def test_one_cycle(self):
        s = one_cycle_cosine(0.01, 0.1, 100)
        assert abs(float(s(0)) - 0.01) < 1e-8
        assert abs(float(s(100)) - 0.001) < 1e-8
        assert float(s(50)) < 0.01

    def test_ema_converges(self):
        p = {"w": jnp.zeros((4,))}
        ema = ema_init(p)
        target = {"w": jnp.ones((4,))}
        for _ in range(50):
            ema = ema_update(ema, target, decay=0.5, tau=1.0)
        assert float(ema.params["w"][0]) > 0.9

    def test_decay_mask(self):
        params = {"conv": {"w": jnp.zeros((3, 3, 4, 8)), "b": jnp.zeros((8,))},
                  "bn": {"scale": jnp.zeros((8,))}}
        mask = decay_mask(params)
        assert mask["conv"]["w"] is True
        assert mask["conv"]["b"] is False
        assert mask["bn"]["scale"] is False


class TestAuxLoss:
    def test_aux_maps_add_weighted_loss(self, rng):
        maps = [jnp.asarray(rng.normal(size=(1, s, s, 24)).astype(np.float32))
                for s in (8, 4, 2)]
        aux = [jnp.asarray(rng.normal(size=(1, s, s, 24)).astype(np.float32))
               for s in (8, 4, 2)]
        batch = synthetic_yolo_batch(jax.random.PRNGKey(0), 1, 64)
        base = yolo_loss(maps, batch["targets"], jnp.asarray(YOLOV7_ANCHORS),
                         (8, 16, 32), nc=3)
        with_aux = yolo_loss(maps, batch["targets"], jnp.asarray(YOLOV7_ANCHORS),
                             (8, 16, 32), nc=3, aux_maps=aux)
        assert float(with_aux["loss"]) != float(base["loss"])
        assert np.isfinite(float(with_aux["loss"]))
        g = jax.grad(lambda a0: yolo_loss(
            maps, batch["targets"], jnp.asarray(YOLOV7_ANCHORS),
            (8, 16, 32), 3, aux_maps=[a0, aux[1], aux[2]])["loss"])(aux[0])
        assert np.abs(np.asarray(g)).sum() > 0


class TestBatchNormTraining:
    def test_bn_stats_update_in_train_step(self):
        state, tx = init_yolo_train_state(jax.random.PRNGKey(0), SMALL_CFG, 100)
        step = jax.jit(make_yolo_train_step(SMALL_CFG, tx))
        batch = synthetic_yolo_batch(jax.random.PRNGKey(1), 2, 64)
        mean0 = np.asarray(state.params["layers"][0]["bn"]["mean"])
        var0 = np.asarray(state.params["layers"][0]["bn"]["var"])
        new_state, _ = step(state, batch)
        mean1 = np.asarray(new_state.params["layers"][0]["bn"]["mean"])
        var1 = np.asarray(new_state.params["layers"][0]["bn"]["var"])
        assert np.abs(mean1 - mean0).max() > 0  # running stats moved
        assert np.abs(var1 - var0).max() > 0

    def test_batch_norm_train_matches_torch(self, rng):
        import torch

        from hamer_yolo_tpu.core import nn as hnn

        x = rng.normal(size=(4, 8, 8, 6)).astype(np.float32)
        bn = torch.nn.BatchNorm2d(6, eps=1e-3, momentum=0.03)
        with torch.no_grad():
            bn.weight.normal_(1.0, 0.2)
            bn.bias.normal_()
        bn.train()
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        expected = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
        p = {"scale": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy()),
             "mean": jnp.zeros(6), "var": jnp.ones(6)}
        got, new_p = hnn.batch_norm_train(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)
        np.testing.assert_allclose(np.asarray(new_p["mean"]),
                                   bn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_p["var"]),
                                   bn.running_var.numpy(), atol=1e-4)

    def test_train_forward_matches_eval_with_same_stats(self, rng):
        """With BN batch stats equal to the running stats (i.e. after
        convergence), train and eval forwards agree."""
        from hamer_yolo_tpu.models.yolov7.model import (
            init_yolov7, yolov7_backbone_forward, yolov7_train_forward,
        )

        params = init_yolov7(jax.random.PRNGKey(0), SMALL_CFG, deploy=False)
        x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)).astype(np.float32))
        maps_train, new_params = yolov7_train_forward(params, x, SMALL_CFG)
        # second pass with the updated params in EVAL mode differs from the
        # train pass only through the batch-vs-running stats gap, which
        # shrinks as stats converge; here just verify shapes + finiteness
        maps_eval = yolov7_backbone_forward(new_params, x, SMALL_CFG)
        for a, b in zip(maps_train, maps_eval):
            assert a.shape == b.shape
            assert np.isfinite(np.asarray(a)).all()
            assert np.isfinite(np.asarray(b)).all()


class TestKPFusionRGBDTraining:
    def test_loss_composition_and_decrease(self, rng):
        """Reference train.py:210-261 loss layout on the layer-exact RGBD
        net: every stage term present + finite, and a few AdamW steps on a
        fixed synthetic batch reduce the total."""
        import jax

        from hamer_yolo_tpu.models.kpfusion_rgbd.model import KPFusionConfig
        from hamer_yolo_tpu.training.train_kpfusion_rgbd import (
            init_train_state, kpfusion_rgbd_loss, make_optimizer,
            make_train_step, synthetic_rgbd_batch,
        )

        cfg = KPFusionConfig(img_size=32, feature_size=8, dim=32,
                             sample_num=64, num_stages=1, heads=2)
        tx = make_optimizer(lr=3e-4)
        params, opt_state = init_train_state(jax.random.PRNGKey(0), cfg, tx)
        batch = {k: jnp.asarray(v)
                 for k, v in synthetic_rgbd_batch(rng, 2, cfg).items()}

        _, m0 = jax.jit(lambda p, b: kpfusion_rgbd_loss(p, b, cfg, 0))(
            params, batch)
        for key in ("pixel_d", "pixel_rgb", "coord_d", "coord_rgb",
                    "coord_kfam_0", "coord_kfam_1", "spatial_0", "loss"):
            assert np.isfinite(float(m0[key])), key
        # spatial term gates off past SPATIAL_EPOCH
        _, m_late = jax.jit(lambda p, b: kpfusion_rgbd_loss(p, b, cfg, 30))(
            params, batch)
        assert float(m_late["spatial_0"]) == 0.0
        assert float(m0["spatial_0"]) > 0.0

        step = jax.jit(make_train_step(cfg, tx))
        first = None
        for i in range(8):
            params, opt_state, metrics = step(params, opt_state, batch, 0)
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first


class TestKPFusionRGBDTrainCLI:
    def test_cli_runs_and_resumes(self, tmp_path):
        """tools/train_kpfusion_rgbd.py end-to-end: 2 tiny steps, ckpt
        written, --resume auto continues from it."""
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cli = os.path.join(root, "tools", "train_kpfusion_rgbd.py")
        out = str(tmp_path / "run")
        r1 = subprocess.run(
            [sys.executable, cli, "--tiny", "--steps", "2", "--batch", "1",
             "--out", out, "--log-every", "1"],
            capture_output=True, text=True, env=env, timeout=900)
        assert r1.returncode == 0, r1.stderr[-2000:]
        assert os.path.isdir(os.path.join(out, "ckpt_final"))
        r2 = subprocess.run(
            [sys.executable, cli, "--tiny", "--steps", "3", "--batch", "1",
             "--out", out, "--resume", "auto", "--log-every", "1"],
            capture_output=True, text=True, env=env, timeout=900)
        assert r2.returncode == 0, r2.stderr[-2000:]
        assert "resumed from" in r2.stdout


class TestHypYaml:
    """training/hyp.load_hyp_yaml vs the reference's shipped hyp files
    (yolo/yolov7/data/hyp.scratch.*.yaml, consumed by train.py --hyp)."""

    def test_p5_mapping(self):
        from hamer_yolo_tpu.training.hyp import load_hyp_yaml

        opt, loss, data, extras = load_hyp_yaml(
            "/root/reference/yolo/yolov7/data/hyp.scratch.p5.yaml")
        assert opt == {"lr0": 0.01, "lrf": 0.1, "momentum": 0.937,
                       "weight_decay": 0.0005}
        assert loss == {"box_w": 0.05, "cls_w": 0.3, "obj_w": 0.7,
                        "anchor_t": 4.0}
        assert data["mosaic"] is True and data["mixup"] == 0.15
        assert data["scale"] == 0.9 and data["fliplr"] == 0.5
        # loss_ota: 1 in every shipped hyp -> SimOTA assigner
        assert extras["_assigner"] == "simota"
        # pos-weights etc. surface as extras, not silent drops
        assert "cls_pw" in extras and "paste_in" in extras

    def test_hyp_drives_train_step(self):
        """A step with hyp loss gains reproduces manual gains."""
        import jax

        from hamer_yolo_tpu.models.yolov7.model import YoloConfig
        from hamer_yolo_tpu.training.hyp import load_hyp_yaml
        from hamer_yolo_tpu.training.train_yolo import (
            init_yolo_train_state, make_yolo_train_step,
            synthetic_yolo_batch,
        )

        opt, loss, _, _ = load_hyp_yaml(
            "/root/reference/yolo/yolov7/data/hyp.scratch.p5.yaml")
        cfg = YoloConfig(nc=3, img_size=64)
        state, tx = init_yolo_train_state(jax.random.PRNGKey(0), cfg,
                                          total_steps=4, opt_kwargs=opt)
        step = jax.jit(make_yolo_train_step(cfg, tx, loss_kwargs=loss))
        batch = synthetic_yolo_batch(jax.random.PRNGKey(1), 2, img_size=64)
        state2, metrics = step(state, batch)
        assert float(metrics["loss"]) > 0 and int(state2.step) == 1
