"""MANO LBS tests: independent numpy reference, invariants, conventions."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
from hamer_yolo_tpu.models import mano as M


def _get_model():
    try:
        data = load_mano_model("right")
    except Exception:
        data = synthetic_mano_model()
    return M.ManoModel.from_arrays(data), data


def numpy_lbs_reference(data, betas, rotmats):
    """Independent dense 4x4 homogeneous LBS implementation (test oracle)."""
    V = data["v_template"].shape[0]
    B = rotmats.shape[0]
    nb = betas.shape[1]
    sd = data["shapedirs"][..., :nb]
    v_shaped = data["v_template"][None] + np.einsum("vds,bs->bvd", sd, betas)
    j_rest = np.einsum("jv,bvd->bjd", data["J_regressor"], v_shaped)
    pf = (rotmats[:, 1:] - np.eye(3)).reshape(B, -1)
    v_posed = v_shaped + np.einsum("vdp,bp->bvd", data["posedirs"], pf)

    parents = data["kintree_parents"]
    out_v = np.zeros((B, V, 3))
    out_j = np.zeros((B, 16, 3))
    for b in range(B):
        G = np.zeros((16, 4, 4))
        for k in range(16):
            local = np.eye(4)
            local[:3, :3] = rotmats[b, k]
            if parents[k] < 0:
                local[:3, 3] = j_rest[b, k]
                G[k] = local
            else:
                local[:3, 3] = j_rest[b, k] - j_rest[b, parents[k]]
                G[k] = G[parents[k]] @ local
        out_j[b] = G[:, :3, 3]
        Grel = G.copy()
        for k in range(16):
            bind = np.eye(4)
            bind[:3, 3] = -j_rest[b, k]
            Grel[k] = G[k] @ bind
        T = np.einsum("vk,kij->vij", data["weights"], Grel)
        vh = np.concatenate([v_posed[b], np.ones((V, 1))], axis=1)
        out_v[b] = np.einsum("vij,vj->vi", T, vh)[:, :3]
    return out_v, out_j


class TestLBS:
    def test_matches_numpy_reference(self, rng):
        model, data = _get_model()
        B = 3
        betas = rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)
        aa = rng.normal(scale=0.4, size=(B, 16, 3))
        rotmats = R.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(B, 16, 3, 3).astype(np.float32)
        verts, joints = M.lbs(model, jnp.asarray(betas), jnp.asarray(rotmats))
        ref_v, ref_j = numpy_lbs_reference(data, betas.astype(np.float64), rotmats.astype(np.float64))
        np.testing.assert_allclose(np.asarray(verts), ref_v, atol=2e-5)
        np.testing.assert_allclose(np.asarray(joints), ref_j, atol=2e-5)

    def test_rest_pose_identity(self):
        model, data = _get_model()
        eye = jnp.broadcast_to(jnp.eye(3), (1, 16, 3, 3))
        verts, joints = M.lbs(model, jnp.zeros((1, 10)), eye)
        np.testing.assert_allclose(np.asarray(verts)[0], data["v_template"], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(joints)[0], data["J_regressor"] @ data["v_template"], atol=1e-5
        )

    def test_global_rotation_equivariance(self, rng):
        model, data = _get_model()
        rot = R.from_rotvec([0.3, -0.5, 0.8]).as_matrix().astype(np.float32)
        rotmats = np.broadcast_to(np.eye(3, dtype=np.float32), (1, 16, 3, 3)).copy()
        rotmats[0, 0] = rot
        verts, joints = M.lbs(model, jnp.zeros((1, 10)), jnp.asarray(rotmats))
        j0 = data["J_regressor"] @ data["v_template"]
        root = j0[0]
        expected = (data["v_template"] - root) @ rot.T + root
        np.testing.assert_allclose(np.asarray(verts)[0], expected, atol=1e-5)


class TestConventions:
    def test_hamer_convention_output_shapes(self, rng):
        model, _ = _get_model()
        B = 2
        go = jnp.broadcast_to(jnp.eye(3), (B, 1, 3, 3))
        hp = jnp.broadcast_to(jnp.eye(3), (B, 15, 3, 3))
        out = M.mano_forward_rotmat(model, go, hp, jnp.zeros((B, 10)))
        assert out.vertices.shape == (B, 778, 3)
        assert out.joints.shape == (B, 21, 3)
        # joint 0 (wrist) is the regressed root
        j16 = np.asarray(model.J_regressor @ model.v_template)
        np.testing.assert_allclose(np.asarray(out.joints)[0, 0], j16[0], atol=1e-5)
        # OpenPose slot 1 = thumb1 = mano joint 13
        np.testing.assert_allclose(np.asarray(out.joints)[0, 1], j16[13], atol=1e-5)
        # slot 4 = thumb tip = vertex 744 (smplx ids)
        np.testing.assert_allclose(
            np.asarray(out.joints)[0, 4], np.asarray(model.v_template)[744], atol=1e-5
        )

    def test_manopth_convention_mm_scale_and_tips(self):
        model, _ = _get_model()
        pose = jnp.zeros((1, 48))
        out = M.mano_forward_manopth(model, pose)
        np.testing.assert_allclose(
            np.asarray(out.vertices)[0], np.asarray(model.v_template) * 1000.0, atol=1e-3
        )
        # thumb tip (OpenPose slot 4) = vertex 745 in manopth convention
        np.testing.assert_allclose(
            np.asarray(out.joints)[0, 4], np.asarray(model.v_template)[745] * 1000.0, atol=1e-3
        )

    def test_manopth_pca(self, rng):
        model, _ = _get_model()
        coeffs = jnp.asarray(rng.normal(size=(2, 9)).astype(np.float32))
        pose = jnp.concatenate([jnp.zeros((2, 3)), coeffs], axis=1)
        out = M.mano_forward_manopth(model, pose, use_pca=True, ncomps=6,
                                     flat_hand_mean=False)
        assert out.vertices.shape == (2, 778, 3)
        # PCA pose must differ from flat pose
        flat = M.mano_forward_manopth(model, jnp.zeros((2, 48)))
        assert np.abs(np.asarray(out.vertices) - np.asarray(flat.vertices)).max() > 1e-3

    def test_sar_regressor(self):
        model, _ = _get_model()
        reg = M.sar_joint_regressor(model)
        assert reg.shape == (21, 778)
        # rows sum to 1 (J_regressor rows are convex weights; tips one-hot)
        np.testing.assert_allclose(np.asarray(reg).sum(1), 1.0, atol=1e-4)

    def test_watertight_faces(self):
        f = M.watertight_closure_faces()
        assert f.shape == (14, 3) and f.dtype == np.int32
