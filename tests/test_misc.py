"""Tests for mask-mode pipeline, ensemble, logging, autoanchor."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
from hamer_yolo_tpu.models.hamer import HamerConfig
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
from hamer_yolo_tpu.models.sar import SarConfig
from hamer_yolo_tpu.models.vit import ViTConfig
from hamer_yolo_tpu.models.yolov7 import (
    YoloConfig, init_yolov7, yolov7_ensemble_forward,
)
from hamer_yolo_tpu.pipeline.frame import PipelineConfig, infer_frame_with_boxes
from hamer_yolo_tpu.utils.autoanchor import anchor_metric, check_anchors, kmeans_anchors
from hamer_yolo_tpu.utils.logging import MetricLogger


def tiny_cfg():
    return PipelineConfig(
        max_hands=2, det_size=64, crop_size=64,
        yolo=YoloConfig(nc=3, img_size=64),
        hamer=HamerConfig(
            image_size=64, crop_margin=8,
            vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=4),
            head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                                dim_head=8, mlp_dim=32),
        ),
        sar=SarConfig(backbone="resnet34", input_size=64, feature_hw=2, heatmap_size=8),
    )


def _mano():
    try:
        return ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        return ManoModel.from_arrays(synthetic_mano_model())


class TestMaskMode:
    def test_infer_with_boxes(self, rng):
        cfg = tiny_cfg()
        mano = _mano()
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)
        img = jnp.asarray(rng.integers(0, 255, (100, 120, 3)).astype(np.float32))
        boxes = jnp.array([[30.0, 20.0, 80.0, 70.0], [0.0, 0, 0, 0]])
        out = jax.jit(
            lambda i: infer_frame_with_boxes(
                params, mano, i, boxes, jnp.array([1.0, 0.0]),
                jnp.array([1.0, 0.0]), jnp.array([100.0, 120.0]),
                jnp.array([[200.0, 0, 60], [0, 200.0, 50], [0, 0, 1]]), cfg)
        )(img)
        assert out["theta"].shape == (2, 48)
        assert bool(out["valid"][0]) and not bool(out["valid"][1])
        assert out["root_depth"].shape == (2,)


class TestEnsemble:
    def test_concat_predictions(self):
        cfg = YoloConfig(nc=3, img_size=64, compute_dtype="float32")
        p1 = init_yolov7(jax.random.PRNGKey(0), cfg)
        p2 = init_yolov7(jax.random.PRNGKey(1), cfg)
        x = jnp.zeros((1, 64, 64, 3))
        out = yolov7_ensemble_forward([p1, p2], x, cfg)
        assert out.shape == (1, 2 * 252, 8)


class TestLogger:
    def test_jsonl_logging(self, tmp_path):
        log = MetricLogger(str(tmp_path), tensorboard=False)
        log.log(0, {"loss": 1.5})
        log.log(1, {"loss": 1.2, "note": "x"})
        log.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1

    def test_wandb_sink_optional(self, tmp_path, monkeypatch):
        """wandb=True mirrors scalars to a wandb run when the module is
        importable (stubbed here — not in the base image) and degrades
        to JSONL-only when it is not."""
        import sys
        import types

        calls = []

        class _Run:
            def log(self, metrics, step=None):
                calls.append((step, metrics))

            def finish(self):
                calls.append(("finish", None))

        stub = types.ModuleType("wandb")
        stub.init = lambda **kw: _Run()
        monkeypatch.setitem(sys.modules, "wandb", stub)
        log = MetricLogger(str(tmp_path), tensorboard=False, wandb=True)
        log.log(3, {"loss": 0.5, "note": "x"})
        log.close()
        assert calls[0] == (3, {"loss": 0.5}) and calls[-1][0] == "finish"
        # absent module -> silently disabled
        monkeypatch.delitem(sys.modules, "wandb")
        monkeypatch.setattr("builtins.__import__", __import__)
        log2 = MetricLogger(str(tmp_path), tensorboard=False, wandb=False)
        log2.log(0, {"loss": 1.0})
        log2.close()

    def test_log_image_writes_png(self, tmp_path):
        import cv2

        log = MetricLogger(str(tmp_path), tensorboard=False)
        img = np.zeros((32, 48, 3), np.uint8)
        img[:, :, 2] = 255
        log.log_image(7, "pred_grid", img)
        log.close()
        path = tmp_path / "images" / "pred_grid_7.png"
        assert path.exists()
        back = cv2.imread(str(path))
        np.testing.assert_array_equal(back, img)


class TestAutoanchor:
    def test_metric_perfect_anchors(self):
        wh = np.array([[10.0, 20], [40, 30], [100, 80]])
        bpr, _ = anchor_metric(wh, wh)
        assert bpr == 1.0

    def test_kmeans_recovers_clusters(self, rng):
        centers = np.array([[10.0, 10], [50, 60], [200, 150]])
        wh = np.concatenate([
            c + rng.normal(0, 1.5, (60, 2)) for c in centers
        ]).clip(3, None)
        anchors = kmeans_anchors(wh, n=3, generations=50)
        # each true center close to some anchor (ratio metric)
        for c in centers:
            r = c / anchors
            assert np.min(np.max(np.maximum(r, 1 / r), axis=1)) < 1.3

    def test_check_anchors_keeps_good(self):
        wh = np.tile(np.array([[12.0, 16]]), (50, 1)) + 1.0
        anchors = np.array([[12.0, 16], [19, 36], [40, 28]])
        out, changed = check_anchors(wh, anchors)
        assert not changed


class TestMosaic9:
    def test_mosaic9(self, tmp_path, rng):
        import cv2

        from hamer_yolo_tpu.io import datasets as D

        img_dir = tmp_path / "images"
        lbl_dir = tmp_path / "labels"
        img_dir.mkdir(); lbl_dir.mkdir()
        for i in range(9):
            cv2.imwrite(str(img_dir / f"im{i}.jpg"),
                        rng.integers(0, 255, (90, 110, 3)).astype(np.uint8))
            (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        pairs = D.image_label_pairs(str(img_dir), str(lbl_dir))
        cfg = D.YoloDataConfig(img_size=96)
        img, labels = D.load_mosaic9(pairs, list(range(9)),
                                     np.random.default_rng(0), cfg)
        assert img.shape == (96, 96, 3)
        if len(labels):
            assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()


class TestCondMlp:
    def test_frequency_embed(self):
        import jax.numpy as jnp

        from hamer_yolo_tpu.core.nn import frequency_embed

        x = jnp.array([[0.5, -0.25]])
        out = frequency_embed(x, num_freqs=3)
        assert out.shape == (1, 2 * 7)
        np.testing.assert_allclose(np.asarray(out)[0, 0], 0.5)
        np.testing.assert_allclose(np.asarray(out)[0, 1],
                                   np.sin(np.pi * 0.5), atol=1e-6)

    def test_adaptive_layer_norm(self, rng):
        import jax.numpy as jnp

        from hamer_yolo_tpu.core.nn import (
            adaptive_layer_norm, adaptive_layer_norm_init,
        )

        p = adaptive_layer_norm_init(jax.random.PRNGKey(0), 8, 4)
        x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
        c1 = jnp.zeros((2, 4))
        c2 = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
        a = adaptive_layer_norm(p, x, c1)
        b = adaptive_layer_norm(p, x, c2)
        assert a.shape == x.shape
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


class TestPortraitBuckets:
    def test_portrait(self):
        from hamer_yolo_tpu.pipeline.runner import pick_bucket

        assert pick_bucket(640, 480) == (640, 480)
        assert pick_bucket(1280, 720) == (1280, 720)
        assert pick_bucket(480, 640) == (480, 640)


class TestLatestCheckpoint:
    def test_picks_final_then_highest_step(self, tmp_path):
        from hamer_yolo_tpu.core.checkpoint import latest_checkpoint

        assert latest_checkpoint(str(tmp_path / "missing")) is None
        run = tmp_path / "run"
        run.mkdir()
        assert latest_checkpoint(str(run)) is None
        (run / "ckpt_200").mkdir()
        (run / "ckpt_1000").mkdir()
        (run / "ckpt_junk").mkdir()
        assert latest_checkpoint(str(run)).endswith("ckpt_1000")
        (run / "ckpt_final").mkdir()
        assert latest_checkpoint(str(run)).endswith("ckpt_final")


class TestPlots:
    def test_plot_results_from_jsonl(self, tmp_path):
        from hamer_yolo_tpu.utils.logging import MetricLogger
        from hamer_yolo_tpu.utils.plots import plot_results

        log = MetricLogger(str(tmp_path), tensorboard=False)
        for step in range(20):
            log.log(step, {"loss": 1.0 / (step + 1), "box": 0.5 - step * 0.01,
                           "lr": 0.01, "note": "text-ignored"})
        log.close()
        out = plot_results(str(tmp_path))
        import os
        assert os.path.exists(out) and os.path.getsize(out) > 1000

    def test_plot_3d_pose_and_pcl(self, tmp_path):
        import numpy as np

        from hamer_yolo_tpu.utils.plots import plot_3d_pose, plot_point_cloud

        rng = np.random.default_rng(0)
        joints = rng.normal(size=(21, 3)).astype(np.float32)
        pcl = rng.normal(size=(256, 3)).astype(np.float32)
        p1 = plot_3d_pose(joints, str(tmp_path / "pose.png"), pcl=pcl)
        p2 = plot_point_cloud(pcl, str(tmp_path / "pcl.png"),
                              color_by=pcl[:, 2])
        import os
        assert os.path.getsize(p1) > 1000 and os.path.getsize(p2) > 1000


class TestActivations:
    """core/activations.py vs the reference's torch modules
    (yolo/yolov7/utils/activations.py) run as oracles."""

    def test_elementwise_match_torch(self):
        import torch

        from hamer_yolo_tpu.core import activations as A

        x = np.linspace(-6, 6, 97).astype(np.float32)
        tx = torch.from_numpy(x)
        # SiLU (:10), export-friendly Hardswish (:15), Mish (:40)
        pairs = [
            (A.silu, tx * torch.sigmoid(tx)),
            (A.hardswish,
             tx * torch.nn.functional.hardtanh(tx + 3, 0.0, 6.0) / 6.0),
            (A.mish, tx * torch.nn.functional.softplus(tx).tanh()),
        ]
        for fn, expect in pairs:
            np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))),
                                       expect.numpy(), rtol=1e-5, atol=1e-6)

    def test_frelu_matches_torch(self):
        import torch

        from hamer_yolo_tpu.core import activations as A

        rng = np.random.default_rng(11)
        c = 8
        p = A.frelu_init(jax.random.PRNGKey(0), c)
        # randomize BN stats so the comparison is non-trivial
        p["bn"]["mean"] = jnp.asarray(rng.normal(size=c).astype(np.float32))
        p["bn"]["var"] = jnp.asarray(
            rng.uniform(0.5, 2.0, c).astype(np.float32))
        p["bn"]["scale"] = jnp.asarray(
            rng.uniform(0.5, 1.5, c).astype(np.float32))
        p["bn"]["bias"] = jnp.asarray(rng.normal(size=c).astype(np.float32))
        x = rng.normal(size=(2, 10, 12, c)).astype(np.float32)

        # torch oracle (activations.py:65-72): depthwise conv + BN + max
        m = torch.nn.Conv2d(c, c, 3, 1, 1, groups=c, bias=False)
        with torch.no_grad():
            # our HWIO depthwise weight (kh, kw, 1, c) -> torch (c, 1, kh, kw)
            w = np.asarray(p["conv"]["w"]).transpose(3, 2, 0, 1)
            m.weight.copy_(torch.from_numpy(w))
        bn = torch.nn.BatchNorm2d(c).eval()
        with torch.no_grad():
            bn.running_mean.copy_(torch.from_numpy(np.asarray(p["bn"]["mean"])))
            bn.running_var.copy_(torch.from_numpy(np.asarray(p["bn"]["var"])))
            bn.weight.copy_(torch.from_numpy(np.asarray(p["bn"]["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(p["bn"]["bias"])))
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        with torch.no_grad():
            expect = torch.max(tx, bn(m(tx))).numpy().transpose(0, 2, 3, 1)

        got = np.asarray(A.frelu(p, jnp.asarray(x)))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def test_conv_block_accepts_callable_act(self):
        from hamer_yolo_tpu.core import activations as A
        from hamer_yolo_tpu.models.yolov7 import blocks as B

        p = B.conv_block_init(jax.random.PRNGKey(0), 3, 4, k=3)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(
                np.float32))
        y_mish = B.conv_block(p, x, act=A.mish)
        y_raw = B.conv_block(p, x, act=False)
        np.testing.assert_allclose(np.asarray(y_mish),
                                   np.asarray(A.mish(y_raw)), rtol=1e-6)
