"""Model-level tests: ViT, MANO head, HAMER forward, SAR/RootNet.

Uses scaled-down configs (CPU test budget); full-size configs are exercised
on TPU by bench.py and the graft entry compile check.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward, init_hamer
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.models.mano_head import ManoHeadConfig, init_mano_head, mano_head_forward
from hamer_yolo_tpu.models.resnet import init_resnet34, resnet34_forward
from hamer_yolo_tpu.models.convnext import init_convnext, convnext_forward
from hamer_yolo_tpu.models.sar import (
    SarConfig, estimate_root_depth, init_sar, rootnet_depth,
    sar_backbone_forward, sar_forward, soft_heatmap, soft_heatmap_init,
)
from hamer_yolo_tpu.models.vit import ViTConfig, init_vit, vit_forward

TINY_VIT = ViTConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=4)
TINY_HEAD = ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2, dim_head=8, mlp_dim=32)


def _mano():
    try:
        return ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        return ManoModel.from_arrays(synthetic_mano_model())


class TestViT:
    def test_token_shape(self):
        params = init_vit(jax.random.PRNGKey(0), TINY_VIT)
        x = jnp.zeros((2, 64, 48, 3))
        out = vit_forward(params, x, TINY_VIT)
        # (64+8-16)/16+1 = 4, (48+8-16)/16+1 = 3 -> 12 tokens
        assert out.shape == (2, 12, 64)

    def test_full_vith_token_count(self):
        from hamer_yolo_tpu.models.vit import VITH_CONFIG
        assert VITH_CONFIG.grid_hw == (16, 12)
        assert VITH_CONFIG.num_tokens == 192

    def test_vith_param_count(self):
        # ViT-H ~630M params; verify via analytic count (init is too slow on CPU).
        d, depth, mlp = 1280, 32, 4
        expected = (
            3 * 16 * 16 * d + d  # patch embed
            + (192 + 1) * d      # pos embed
            + depth * (2 * 2 * d + (3 * d * d + 3 * d) + (d * d + d)
                       + (d * mlp * d + mlp * d) + (mlp * d * d + d))
            + 2 * d
        )
        assert 600e6 < expected < 660e6


class TestDropPath:
    def test_eval_deterministic_train_stochastic(self):
        cfg = ViTConfig(img_size=(64, 48), embed_dim=64, depth=3, num_heads=4,
                        compute_dtype="float32", drop_path_rate=0.9)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        x = jnp.ones((2, 64, 48, 3))
        a = vit_forward(params, x, cfg)
        b = vit_forward(params, x, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        t1 = vit_forward(params, x, cfg, rng=jax.random.PRNGKey(1))
        t2 = vit_forward(params, x, cfg, rng=jax.random.PRNGKey(2))
        assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-6


class TestManoHead:
    def test_ief_residual_from_init(self):
        params = init_mano_head(jax.random.PRNGKey(0), TINY_HEAD)
        ctx = jnp.zeros((3, 12, 64))
        pred, cam = mano_head_forward(params, ctx, TINY_HEAD)
        assert pred["global_orient"].shape == (3, 1, 3, 3)
        assert pred["hand_pose"].shape == (3, 15, 3, 3)
        assert pred["betas"].shape == (3, 10)
        assert cam.shape == (3, 3)
        # rotations valid
        r = np.asarray(pred["hand_pose"]).reshape(-1, 3, 3)
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", r, r), np.eye(3)[None].repeat(len(r), 0), atol=1e-5
        )


class TestHamer:
    def test_forward_outputs(self):
        cfg = HamerConfig(image_size=64, crop_margin=8, vit=TINY_VIT, head=TINY_HEAD)
        params = init_hamer(jax.random.PRNGKey(0), cfg)
        mano = _mano()
        img = jnp.zeros((2, 64, 64, 3))
        out = jax.jit(lambda p, x: hamer_forward(p, mano, x, cfg))(params, img)
        assert out["pred_vertices"].shape == (2, 778, 3)
        assert out["pred_keypoints_3d"].shape == (2, 21, 3)
        assert out["pred_keypoints_2d"].shape == (2, 21, 2)
        assert out["pred_cam_t"].shape == (2, 3)
        assert out["pose"].shape == (2, 16, 3, 3)
        # tz = 2f/(size*s + 1e-9) from the predicted cam scale
        s = np.asarray(out["pred_cam"])[:, 0]
        np.testing.assert_allclose(
            np.asarray(out["pred_cam_t"])[:, 2], 2 * 5000.0 / (64 * s + 1e-9), rtol=1e-4
        )


class TestSar:
    CFG = SarConfig(backbone="resnet34", input_size=64, feature_hw=2, heatmap_size=8)

    def test_resnet34_shape(self):
        params = init_resnet34(jax.random.PRNGKey(0))
        out = resnet34_forward(params, jnp.zeros((1, 64, 64, 3)))
        assert out.shape == (1, 2, 2, 512)

    def test_convnext_tiny_shape(self):
        params = init_convnext(jax.random.PRNGKey(0), "tiny")
        out = convnext_forward(params, jnp.zeros((1, 64, 64, 3)), "tiny")
        assert out.shape == (1, 2, 2, 768)

    def test_soft_heatmap_argmax(self):
        p = soft_heatmap_init(jax.random.PRNGKey(0), 2)
        hm = np.full((1, 2, 8, 8), -10.0, np.float32)
        hm[0, 0, 3, 5] = 10.0  # row 3, col 5
        hm[0, 1, 6, 1] = 10.0
        uv, score = soft_heatmap(p, jnp.asarray(hm))
        np.testing.assert_allclose(np.asarray(uv)[0, 0], [5.0, 3.0], atol=1e-2)
        np.testing.assert_allclose(np.asarray(uv)[0, 1], [1.0, 6.0], atol=1e-2)
        np.testing.assert_allclose(np.asarray(score).sum((-1, -2)), 1.0, atol=1e-5)

    def test_sar_forward_shape(self):
        mano = _mano()
        params = init_sar(jax.random.PRNGKey(0), mano.v_template, self.CFG)
        out = jax.jit(lambda p, x: sar_forward(p, x, self.CFG))(
            params, jnp.zeros((1, 64, 64, 3))
        )
        assert out.shape == (1, 799, 3)
        uv = np.asarray(out)[..., :2]
        assert (uv >= -1.01).all() and (uv <= 1.01).all()

    def test_rootnet_depth_scaling(self):
        mano = _mano()
        params = init_sar(jax.random.PRNGKey(0), mano.v_template, self.CFG)
        patch = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32))
        k = jnp.array([1.0, 2.0])
        d = np.asarray(estimate_root_depth(params, patch, k, self.CFG))
        # depth = gamma * k -> doubling k doubles depth for identical patches
        patch2 = jnp.concatenate([patch[:1], patch[:1]])
        d2 = np.asarray(estimate_root_depth(params, patch2, k, self.CFG))
        np.testing.assert_allclose(d2[1], 2 * d2[0], rtol=1e-5)
