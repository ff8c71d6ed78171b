"""Tests: visualization utilities + full SAR mesh pipeline."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.models.sar import SarConfig, init_sar
from hamer_yolo_tpu.pipeline.sar_mesh import (
    bbox_from_mask, decode_sar_uvd, sar_full_mesh, sample_depth_at_root,
)
from hamer_yolo_tpu.utils import viz

CFG = SarConfig(backbone="resnet34", input_size=64, feature_hw=2, heatmap_size=8,
                compute_dtype="float32")


def _mano():
    try:
        return ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        return ManoModel.from_arrays(synthetic_mano_model())


class TestViz:
    def test_skeleton_draw(self, rng):
        img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
        kp = rng.uniform(10, 90, (21, 2))
        out = viz.draw_hand_skeleton(img, kp)
        assert out.shape == img.shape and (out != img).any()

    def test_plot_box(self, rng):
        img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
        out = viz.plot_box(img, [10, 10, 50, 50], "right 0.93")
        assert (out != img).any()

    def test_eval_grid(self, rng):
        crops = rng.uniform(0, 1, (5, 32, 32, 3)).astype(np.float32)
        kp = rng.uniform(5, 27, (5, 21, 2))
        grid = viz.render_eval_grid(crops, kp, cols=3)
        assert grid.shape == (2 * 32, 3 * 32, 3)
        assert grid.dtype == np.uint8

    def test_shaded_overlay(self, rng):
        img = rng.integers(0, 255, (120, 120, 3)).astype(np.uint8)
        verts = rng.normal(size=(20, 3)) * 0.05 + [0, 0, 0.5]
        faces = rng.integers(0, 20, (30, 3))
        K = np.array([[200.0, 0, 60], [0, 200.0, 60], [0, 0, 1]])
        out = viz.shaded_mesh_overlay(img, verts, faces, K)
        assert out.shape == img.shape


class TestSarMesh:
    def test_decode_uvd_geometry(self):
        coords = jnp.zeros((1, 799, 3))  # uv = 0 -> crop pixel 0.5*256=128
        root = jnp.array([0.5])
        bb2img = jnp.asarray([[[2.0, 0.0, 10.0], [0.0, 2.0, 20.0]]])
        out = np.asarray(decode_sar_uvd(coords, root, bb2img, jnp.array([640.0]),
                                        jnp.array([0.0]), 0.3, 256))
        np.testing.assert_allclose(out[0, 0], [2 * 128 + 10, 2 * 128 + 20, 0.5], atol=1e-4)

    def test_decode_flip(self):
        coords = jnp.zeros((1, 799, 3))
        bb2img = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
        out = np.asarray(decode_sar_uvd(coords, jnp.array([0.4]), bb2img,
                                        jnp.array([640.0]), jnp.array([1.0]), 0.3, 256))
        np.testing.assert_allclose(out[0, 0, 0], 640 - 128 - 1, atol=1e-4)

    def test_depth_sampling(self):
        depth = jnp.broadcast_to(jnp.arange(10.0)[:, None], (10, 10))
        uv = jnp.array([[5.0, 3.0], [2.0, 7.5]])  # (x, y)
        d = np.asarray(sample_depth_at_root(depth, uv))
        np.testing.assert_allclose(d, [3.0, 7.5], atol=1e-5)

    def test_full_pipeline_shapes(self, rng):
        mano = _mano()
        params = init_sar(jax.random.PRNGKey(0), mano.v_template, CFG)
        img = jnp.asarray(rng.integers(0, 255, (120, 160, 3)).astype(np.float32))
        boxes = jnp.array([[40.0, 30.0, 100.0, 90.0]])
        out = jax.jit(
            lambda i, b: sar_full_mesh(params, i, b, jnp.array([120.0, 160.0]),
                                       jnp.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1.0]]),
                                       CFG)
        )(img, boxes)
        assert out["mesh_xyz"].shape == (1, 778, 3)
        assert out["pose_xyz"].shape == (1, 21, 3)
        assert out["root_depth"].shape == (1,)

    def test_bbox_from_mask(self):
        mask = np.zeros((50, 60), np.int32)
        mask[10:20, 5:25] = 3
        assert bbox_from_mask(mask) == [5.0, 10.0, 24.0, 19.0]
        assert bbox_from_mask(np.zeros((5, 5))) is None
