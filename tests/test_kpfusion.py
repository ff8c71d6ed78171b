"""KPFusion RGBD model tests."""
import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.kpfusion import (
    KPFusionConfig, cbam, cbam_init, depth_to_pointcloud, desa, desa_init,
    hourglass, hourglass_init, init_kpfusion, kpfusion_forward,
    rgbd_fusion, rgbd_fusion_init,
)

CFG = KPFusionConfig(img_size=64, num_points=128, num_samples=16,
                     ball_k=8, feat_dim=32, n_blocks=2, heads=4)


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

    def test_desa_distance_bias(self, rng):
        """A joint sitting exactly on one point attends mostly to it."""
        p = desa_init(jax.random.PRNGKey(0), 16)
        # zero projections -> logits from distance bias only
        p = jax.tree_util.tree_map(jnp.zeros_like, p)
        node_xyz = jnp.array([[[0.0, 0, 0]]])
        pcl_xyz = jnp.array([[[0.0, 0, 0], [5.0, 5, 5]]])
        node_feat = jnp.zeros((1, 1, 16))
        pcl_feat = jnp.ones((1, 2, 16))
        out = desa(p, node_feat, node_xyz, pcl_feat, pcl_xyz, sigma=0.5)
        # proj is zero so output equals node_feat (residual); just check shape
        assert out.shape == (1, 1, 16)


class TestModel:
    def test_forward_shapes(self, rng):
        params = init_kpfusion(jax.random.PRNGKey(0), CFG, with_mesh=True)
        img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        depth = jnp.asarray(rng.uniform(0.3, 0.8, (2, 64, 64, 1)).astype(np.float32))
        pcl = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32) * 0.1 + 0.5)
        out = jax.jit(lambda p, i, d, c: kpfusion_forward(p, i, d, c, CFG))(
            params, img, depth, pcl
        )
        assert out["joints_xyz"].shape == (2, 21, 3)
        assert out["trajectory"].shape == (2, CFG.n_blocks + 1, 21, 3)
        assert out["mesh_xyz"].shape == (2, 778, 3)
        assert np.isfinite(np.asarray(out["joints_xyz"])).all()


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


class TestTraining:
    def test_train_step_loss_decreases(self):
        from hamer_yolo_tpu.training.train_kpfusion import (
            init_kpfusion_train_state, make_kpfusion_train_step,
            synthetic_kpfusion_batch,
        )

        state, tx = init_kpfusion_train_state(jax.random.PRNGKey(0), CFG, lr=1e-4)
        step = jax.jit(make_kpfusion_train_step(CFG, tx))
        batch = synthetic_kpfusion_batch(jax.random.PRNGKey(1), 2, CFG)
        losses = []
        for _ in range(8):
            state, m = step(state, batch)
            losses.append(float(m["total"]))
        assert all(np.isfinite(losses))
        assert min(losses[4:]) < losses[0]  # overfits the fixed batch

    def test_heatmap_targets_peak_at_joint(self):
        from hamer_yolo_tpu.training.train_kpfusion import heatmap_targets

        uv = jnp.array([[[0.0, 0.0], [-1.0, -1.0]]])  # center, top-left
        hm = np.asarray(heatmap_targets(uv, 9, sigma=1.0))
        assert hm.shape == (1, 9, 9, 2)
        assert hm[0, 4, 4, 0] == hm[0].max()  # center joint peaks at center
        assert hm[0, 0, 0, 1] == hm[0, :, :, 1].max()
