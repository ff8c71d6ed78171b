"""Op-level tests: matmul-warp vs gather-warp parity, flash-attn fallback."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.geometry.affine import gen_trans_from_patch, warp_affine
from hamer_yolo_tpu.ops import warp_matmul
from hamer_yolo_tpu.ops.attention import flash_mha_self_attention
from hamer_yolo_tpu.pipeline import preprocess


class TestMatmulWarp:
    def test_crop_matches_gather_warp(self, rng):
        img = jnp.asarray(rng.integers(0, 255, (200, 300, 3)).astype(np.float32))
        center = jnp.array([150.0, 90.0])
        size = jnp.array([120.0, 120.0])
        mm = np.asarray(warp_matmul.crop_square_matmul(img, center, size, (64, 64)))
        trans = gen_trans_from_patch(150.0, 90.0, 120.0, 120.0, 64.0, 64.0)
        gather = np.asarray(warp_affine(img, trans, (64, 64)))
        # matmul path applies cv2.warpAffine parity (1/32-px coord
        # quantization + uint8 rounding); the raw gather warp is smooth.
        assert np.abs(mm - gather).max() <= 0.5 + 255.0 / 64.0
        assert np.abs(mm - gather).mean() < 0.5

    def test_crop_border_zero(self):
        img = jnp.full((50, 50, 3), 200.0)
        out = np.asarray(
            warp_matmul.crop_square_matmul(
                img, jnp.array([500.0, 500.0]), jnp.array([20.0, 20.0]), (16, 16)
            )
        )
        np.testing.assert_allclose(out, 0.0)

    def test_letterbox_matches_gather(self, rng):
        img = jnp.asarray(rng.integers(0, 255, (120, 160, 3)).astype(np.float32))
        mm, r1, p1 = warp_matmul.letterbox_matmul(img, jnp.array([120.0, 160.0]), 64)
        assert mm.shape == (64, 64, 3)
        np.testing.assert_allclose(float(r1), 0.4)
        # top/bottom pad rows (dh = 8) are exactly 114
        m = np.asarray(mm)
        assert np.allclose(m[:8], 114.0) and np.allclose(m[56:], 114.0)
        # interior matches cv2 resize exactly up to fixed-point rounding
        import cv2
        resized = cv2.resize(np.asarray(img), (64, 48), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(m[8:56][1:-1, 1:-1], resized[1:-1, 1:-1], atol=1.0)

    def test_upscale_crop(self, rng):
        """Crop smaller than output (upsampling path)."""
        img = jnp.asarray(rng.integers(0, 255, (100, 100, 3)).astype(np.float32))
        out = np.asarray(
            warp_matmul.crop_square_matmul(
                img, jnp.array([50.0, 50.0]), jnp.array([10.0, 10.0]), (64, 64)
            )
        )
        trans = gen_trans_from_patch(50.0, 50.0, 10.0, 10.0, 64.0, 64.0)
        gather = np.asarray(warp_affine(img, trans, (64, 64)))
        # 1/32-px coord quantization on a 10px->64 upsample steps visibly;
        # bound by rounding + gradient * quantization error.
        assert np.abs(out - gather).max() <= 0.5 + 255.0 / 32.0
        assert np.abs(out - gather).mean() < 2.0


class TestFlashAttention:
    def test_fallback_matches_xla(self, rng):
        """Off-TPU the wrapper must equal the reference XLA attention."""
        p = nn.mha_qkv_init(jax.random.PRNGKey(0), 64, 4)
        x = jnp.asarray(rng.normal(size=(2, 12, 64)).astype(np.float32))
        a = np.asarray(nn.mha_self_attention(p, x, 4))
        b = np.asarray(flash_mha_self_attention(p, x, 4))
        np.testing.assert_allclose(a, b, atol=1e-5)
