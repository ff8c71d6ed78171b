"""Auxiliary KeypointFusion layer tests (kpfusion_rgbd/layers.py).

The layer-exact KPFusion model/runtime/trainer are covered by
tests/test_kpfusion_rgbd.py (oracle parity vs the reference torch
modules) and tests/test_training.py. These tests cover the auxiliary
reference components (cbam.py / fusion_layer.py / hourglass.py PoseNet /
full-map back-projection) that the main runtime does not consume.
"""
import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.kpfusion_rgbd.layers import (
    cbam, cbam_init, depth_to_pointcloud, hourglass, hourglass_init,
    rgbd_fusion, rgbd_fusion_init,
)


class TestComponents:
    def test_cbam_shape_preserving(self, rng):
        p = cbam_init(jax.random.PRNGKey(0), 32)
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
        out = cbam(p, x)
        assert out.shape == x.shape
        # gating attenuates
        assert float(jnp.abs(out).mean()) <= float(jnp.abs(x).mean()) + 1e-6

    def test_rgbd_fusion(self, rng):
        p = rgbd_fusion_init(jax.random.PRNGKey(0), 32)
        rgb = jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))
        d = jnp.asarray(rng.normal(size=(1, 8, 8, 32)).astype(np.float32))
        assert rgbd_fusion(p, rgb, d).shape == (1, 8, 8, 32)

    def test_hourglass_shape(self, rng):
        p = hourglass_init(jax.random.PRNGKey(0), 16, depth=2)
        x = jnp.asarray(rng.normal(size=(1, 16, 16, 16)).astype(np.float32))
        assert hourglass(p, x).shape == x.shape

    def test_hourglass_odd_size(self, rng):
        # stride-2 downs don't halve exactly at odd sizes; the resize-back
        # path must still reproduce the input resolution.
        p = hourglass_init(jax.random.PRNGKey(0), 8, depth=2)
        x = jnp.asarray(rng.normal(size=(1, 15, 15, 8)).astype(np.float32))
        assert hourglass(p, x).shape == x.shape


class TestPointCloud:
    def test_depth_backprojection(self):
        depth = jnp.full((32, 32), 0.5)
        K = jnp.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]])
        pcl = np.asarray(depth_to_pointcloud(depth, K, 64))
        assert pcl.shape == (64, 3)
        np.testing.assert_allclose(pcl[:, 2], 0.5, atol=1e-6)
        # pixel (16, 16) -> x = y = 0
        assert np.abs(pcl[:, :2]).max() < 0.1  # (32px * 0.5 / 100)

    def test_invalid_depth_padding(self):
        depth = jnp.zeros((16, 16))  # all invalid
        depth = depth.at[4, 4].set(0.5)
        K = jnp.array([[100.0, 0, 8], [0, 100.0, 8], [0, 0, 1]])
        pcl = np.asarray(depth_to_pointcloud(depth, K, 32, stride=1))
        # all slots collapse to the single valid point
        np.testing.assert_allclose(pcl[:, 2], 0.5, atol=1e-6)
