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


class TestMSGAndPartSeg:
    def test_set_abstraction_msg_shapes_and_scales(self, rng=None):
        import numpy as np

        from hamer_yolo_tpu.models.pointnet2 import (
            MSGConfig, sa_msg_init, set_abstraction_msg,
        )

        rng = np.random.default_rng(0)
        cfg = MSGConfig(npoint=32, radii=(0.2, 0.4), nsamples=(8, 16),
                        mlps=((16, 32), (16, 48)))
        assert cfg.out_dim == 80
        xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
        p = sa_msg_init(jax.random.PRNGKey(0), 3, cfg)
        new_xyz, f = set_abstraction_msg(p, xyz, xyz, cfg)
        assert new_xyz.shape == (2, 32, 3)
        assert f.shape == (2, 32, 80)
        assert np.isfinite(np.asarray(f)).all()

    def test_part_seg_forward(self):
        import numpy as np

        from hamer_yolo_tpu.models.pointnet2 import (
            SAConfig, init_pointnet2_part_seg, pointnet2_part_seg_forward,
        )

        rng = np.random.default_rng(1)
        sa1 = SAConfig(npoint=64, radius=0.2, nsample=16, mlp=(32, 64))
        sa2 = SAConfig(npoint=16, radius=0.4, nsample=16, mlp=(64, 128))
        p = init_pointnet2_part_seg(jax.random.PRNGKey(1), num_classes=50,
                                    in_dim=3, sa1=sa1, sa2=sa2)
        xyz = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(2, 256, 3)).astype(np.float32))
        out = jax.jit(lambda p, x, f: pointnet2_part_seg_forward(
            p, x, f, sa1=sa1, sa2=sa2))(p, xyz, feats)
        assert out.shape == (2, 256, 50)
        assert np.isfinite(np.asarray(out)).all()

    def test_msg_sem_forward_reference_heads(self):
        """The KPFusion point-stream net shape contract
        (point2_msg_sem.py out_dims = [63, 21, 21])."""
        import numpy as np

        from hamer_yolo_tpu.models.pointnet2 import (
            MSGConfig, init_pointnet2_msg_sem, pointnet2_msg_sem_forward,
        )

        rng = np.random.default_rng(2)
        levels = (
            MSGConfig(64, (0.05, 0.1), (8, 16), ((16, 32), (16, 64))),
            MSGConfig(32, (0.1, 0.2), (8, 16), ((32, 128), (32, 128))),
            MSGConfig(16, (0.2, 0.4), (8, 16), ((64, 256), (64, 256))),
            MSGConfig(8, (0.4, 0.8), (8, 16), ((128, 512), (128, 512))),
        )
        p = init_pointnet2_msg_sem(jax.random.PRNGKey(2), in_dim=0,
                                   levels=levels)
        xyz = jnp.asarray(rng.normal(size=(1, 256, 3)).astype(np.float32))
        outs = jax.jit(lambda p, x: pointnet2_msg_sem_forward(
            p, x, levels=levels))(p, xyz)
        assert [o.shape for o in outs] == [(1, 256, 63), (1, 256, 21),
                                           (1, 256, 21)]
        for o in outs:
            assert np.isfinite(np.asarray(o)).all()
