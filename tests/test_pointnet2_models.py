"""PointNet2 model zoo tests."""
import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.pointnet2 import (
    CLS_SA1, CLS_SA2, SAConfig, dgcnn_cls_forward, init_dgcnn_cls,
    init_pointnet2_cls, init_pointnet2_seg,
    knn_indices, pointnet2_cls_forward, pointnet2_seg_forward,
)

SA1 = SAConfig(npoint=32, radius=0.4, nsample=8, mlp=(16, 32))
SA2 = SAConfig(npoint=8, radius=0.8, nsample=8, mlp=(32, 64))


class TestPointNet2:
    def test_classifier(self, rng):
        params = init_pointnet2_cls(jax.random.PRNGKey(0), num_classes=10,
                                    sa1=SA1, sa2=SA2)
        xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        logits = jax.jit(
            lambda p, x: pointnet2_cls_forward(p, x, SA1, SA2)
        )(params, xyz)
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()

    def test_segmentation(self, rng):
        params = init_pointnet2_seg(jax.random.PRNGKey(0), num_classes=4,
                                    sa1=SA1, sa2=SA2)
        xyz = jnp.asarray(rng.normal(size=(1, 128, 3)).astype(np.float32))
        logits = jax.jit(
            lambda p, x: pointnet2_seg_forward(p, x, SA1, SA2)
        )(params, xyz)
        assert logits.shape == (1, 128, 4)

    def test_dgcnn_classifier(self, rng):
        import jax.numpy as jnp

        params = init_dgcnn_cls(jax.random.PRNGKey(0), num_classes=6,
                                dims=(8, 16))
        xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
        logits = jax.jit(lambda p, x: dgcnn_cls_forward(p, x, k=8))(params, xyz)
        assert logits.shape == (2, 6)
        assert np.isfinite(np.asarray(logits)).all()

    def test_pointmlp_classifier(self, rng):
        import jax.numpy as jnp

        from hamer_yolo_tpu.models.pointnet2 import (
            init_pointmlp_cls, pointmlp_cls_forward,
        )

        params = init_pointmlp_cls(jax.random.PRNGKey(0), num_classes=7,
                                   dims=(16, 32), npoints=(32, 8))
        xyz = jnp.asarray(rng.normal(size=(2, 96, 3)).astype(np.float32))
        logits = jax.jit(
            lambda p, x: pointmlp_cls_forward(p, x, (32, 8), 8)
        )(params, xyz)
        assert logits.shape == (2, 7)
        assert np.isfinite(np.asarray(logits)).all()

    def test_knn_self_first(self, rng):
        import jax.numpy as jnp

        xyz = jnp.asarray(rng.normal(size=(1, 32, 3)).astype(np.float32))
        idx = np.asarray(knn_indices(xyz, 4))
        np.testing.assert_array_equal(idx[0, :, 0], np.arange(32))

    def test_translation_behavior(self, rng):
        """Global features depend on absolute coords via the xyz concat;
        relative grouping keeps local structure stable."""
        params = init_pointnet2_cls(jax.random.PRNGKey(0), num_classes=5,
                                    sa1=SA1, sa2=SA2)
        xyz = jnp.asarray(rng.normal(size=(1, 128, 3)).astype(np.float32))
        a = pointnet2_cls_forward(params, xyz, SA1, SA2)
        b = pointnet2_cls_forward(params, xyz + 100.0, SA1, SA2)
        assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()
