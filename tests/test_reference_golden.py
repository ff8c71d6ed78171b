"""TRUE golden tests: run the reference's own code as the oracle.

hamer/hamer/utils/geometry.py is importable standalone (torch + numpy
only), so these tests execute the REFERENCE implementation directly and
compare our JAX functions against it on random inputs — no re-derivation,
no fixtures. Skipped when /root/reference is not mounted.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from hamer_yolo_tpu import geometry as G

REF_GEOM = "/root/reference/hamer/hamer/utils/geometry.py"
REF_RENDERER = "/root/reference/hamer/hamer/utils/renderer.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_GEOM),
                                reason="reference not mounted")


def _load(name, path, stubs=()):
    import types

    for s in stubs:
        if s not in sys.modules:
            parts = s.split(".")
            for i in range(len(parts)):
                mod_name = ".".join(parts[: i + 1])
                if mod_name not in sys.modules:
                    stub = types.ModuleType(mod_name)
                    # PEP 562: any attribute (class refs in annotations,
                    # CfgNode, pyrender.Node, ...) resolves to `object`.
                    stub.__getattr__ = lambda name: object
                    sys.modules[mod_name] = stub
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    return _load("ref_geometry", REF_GEOM)


@pytest.fixture(scope="module")
def ref_renderer():
    # renderer.py needs pyrender/trimesh/yacs only for the GL classes we
    # don't touch; stub them so the pure camera-lift functions load.
    return _load("ref_renderer", REF_RENDERER,
                 stubs=("pyrender", "trimesh", "yacs", "yacs.config"))


class TestAgainstReferenceCode:
    def test_aa_to_rotmat(self, ref, rng):
        import torch

        aa = rng.normal(size=(32, 3)).astype(np.float32)
        expected = ref.aa_to_rotmat(torch.from_numpy(aa)).numpy()
        got = np.asarray(G.aa_to_rotmat(jnp.asarray(aa)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_aa_to_rotmat_tiny_angles(self, ref, rng):
        import torch

        aa = (rng.normal(size=(16, 3)) * 1e-4).astype(np.float32)
        expected = ref.aa_to_rotmat(torch.from_numpy(aa)).numpy()
        got = np.asarray(G.aa_to_rotmat(jnp.asarray(aa)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_rot6d_to_rotmat(self, ref, rng):
        import torch

        x = rng.normal(size=(64, 6)).astype(np.float32)
        expected = ref.rot6d_to_rotmat(torch.from_numpy(x)).numpy()
        got = np.asarray(G.rot6d_to_rotmat(jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_quat_to_rotmat(self, ref, rng):
        import torch

        q = rng.normal(size=(32, 4)).astype(np.float32)
        expected = ref.quat_to_rotmat(torch.from_numpy(q)).numpy()
        got = np.asarray(G.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_perspective_projection(self, ref, rng):
        import torch

        pts = rng.normal(size=(4, 21, 3)).astype(np.float32)
        pts[..., 2] += 4.0
        t = rng.normal(size=(4, 3)).astype(np.float32)
        t[:, 2] += 5.0
        f = rng.uniform(500, 2000, (4, 2)).astype(np.float32)
        c = rng.uniform(100, 500, (4, 2)).astype(np.float32)
        expected = ref.perspective_projection(
            torch.from_numpy(pts), translation=torch.from_numpy(t),
            focal_length=torch.from_numpy(f), camera_center=torch.from_numpy(c),
        ).numpy()
        got = np.asarray(G.perspective_projection(
            jnp.asarray(pts), jnp.asarray(t), jnp.asarray(f), jnp.asarray(c)))
        np.testing.assert_allclose(got, expected, atol=2e-3)

    def test_cam_crop_to_full(self, ref_renderer, rng):
        import torch

        cam = rng.normal(size=(8, 3)).astype(np.float32)
        cam[:, 0] = rng.uniform(0.5, 2.0, 8)
        center = rng.uniform(100, 500, (8, 2)).astype(np.float32)
        size = rng.uniform(80, 300, 8).astype(np.float32)
        img_size = np.tile([640.0, 480.0], (8, 1)).astype(np.float32)
        expected = ref_renderer.cam_crop_to_full(
            torch.from_numpy(cam), torch.from_numpy(center),
            torch.from_numpy(size), torch.from_numpy(img_size), 5000.0,
        ).numpy()
        got = np.asarray(G.cam_crop_to_full(
            jnp.asarray(cam), jnp.asarray(center), jnp.asarray(size),
            jnp.asarray(img_size), 5000.0))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)

    def test_custom_cam_crop_to_full(self, ref_renderer, rng):
        import torch

        cam = rng.normal(size=(4, 3)).astype(np.float32)
        cam[:, 0] = rng.uniform(0.5, 2.0, 4)
        center = rng.uniform(100, 500, (4, 2)).astype(np.float32)
        size = rng.uniform(80, 300, 4).astype(np.float32)
        img_size = np.tile([1920.0, 1080.0], (4, 1)).astype(np.float32)
        fx, fy, cx, cy = 906.96, 906.79, 960.0, 540.0
        expected = ref_renderer.custom_cam_crop_to_full(
            torch.from_numpy(cam), torch.from_numpy(center),
            torch.from_numpy(size), torch.from_numpy(img_size),
            fx, fy, cx, cy,
        ).numpy()
        got = np.asarray(G.custom_cam_crop_to_full(
            jnp.asarray(cam), jnp.asarray(center), jnp.asarray(size),
            jnp.full((4,), fx), jnp.full((4,), fy),
            jnp.full((4,), cx), jnp.full((4,), cy)))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_custom_cam_depth_refine_golden(self, ref_renderer, rng):
        import torch

        cam = rng.normal(size=(4, 3)).astype(np.float32)
        cam[:, 0] = rng.uniform(0.5, 2.0, 4)
        center = rng.uniform(100, 500, (4, 2)).astype(np.float32)
        size = rng.uniform(80, 300, 4).astype(np.float32)
        img_size = np.tile([1920.0, 1080.0], (4, 1)).astype(np.float32)
        depth = rng.uniform(0.3, 0.9, 4).astype(np.float32)
        expected = ref_renderer.custom_cam_crop_to_full(
            torch.from_numpy(cam), torch.from_numpy(center),
            torch.from_numpy(size), torch.from_numpy(img_size),
            906.96, 906.79, 960.0, 540.0,
            depth_refine=torch.from_numpy(depth),
        ).numpy()
        got = np.asarray(G.custom_cam_crop_to_full(
            jnp.asarray(cam), jnp.asarray(center), jnp.asarray(size),
            jnp.full((4,), 906.96), jnp.full((4,), 906.79),
            jnp.full((4,), 960.0), jnp.full((4,), 540.0),
            depth_refine=jnp.asarray(depth)))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)

    def test_manopth_manolayer_lbs(self, rng):
        """Execute the reference's manopth ManoLayer (its full LBS: PCA,
        pose blendshapes, 3-level FK, skinning, fingertips, mm scale) as
        the oracle for mano_forward_manopth, with identical pkl data fed
        through a chumpy-free ready_arguments."""
        import types

        import torch
        from scipy import sparse

        from hamer_yolo_tpu.core.mano_assets import load_mano_pkl
        from hamer_yolo_tpu.models.mano import ManoModel, mano_forward_manopth

        dist_dir = "/root/reference/rootnet/KeypointFusion/manopth"
        mano_dir = "/root/reference/rootnet/KeypointFusion/MANO"
        if not os.path.isdir(dist_dir) or not os.path.isdir(mano_dir):
            pytest.skip("manopth/MANO assets absent")

        pkg = types.ModuleType("mp_root")
        pkg.__path__ = [dist_dir]
        sys.modules.setdefault("mp_root", pkg)
        ml = importlib.import_module("mp_root.manopth.manolayer")

        class _R:
            def __init__(self, a):
                self.r = a

        def fake_ready_arguments(path, posekey4vposed="pose"):
            d = load_mano_pkl(path)
            parents = d["kintree_parents"].astype(np.int64)
            kintree = np.stack([parents, np.arange(16)])
            return {
                "betas": _R(np.zeros(d["shapedirs"].shape[-1], np.float32)),
                "shapedirs": _R(d["shapedirs"]),
                "posedirs": _R(d["posedirs"]),
                "v_template": _R(d["v_template"]),
                "weights": _R(d["weights"]),
                "J_regressor": sparse.csc_matrix(d["J_regressor"]),
                "f": d["f"],
                "kintree_table": kintree,
                "hands_components": d["hands_components"],
                "hands_mean": d["hands_mean"],
                "hands_coeffs": d.get("hands_coeffs"),
            }

        orig = ml.ready_arguments
        ml.ready_arguments = fake_ready_arguments
        try:
            layer = ml.ManoLayer(mano_root=mano_dir, use_pca=False,
                                 flat_hand_mean=True, side="right")
            pose = (rng.normal(scale=0.3, size=(2, 48))).astype(np.float32)
            betas = rng.normal(scale=0.5, size=(2, 20)).astype(np.float32)
            with torch.no_grad():
                ref_v, ref_j = layer(torch.from_numpy(pose),
                                     th_betas=torch.from_numpy(betas))
            model = ManoModel.from_arrays(load_mano_pkl(
                os.path.join(mano_dir, "MANO_RIGHT.pkl")))
            out = mano_forward_manopth(model, jnp.asarray(pose),
                                       betas=jnp.asarray(betas))
            np.testing.assert_allclose(np.asarray(out.vertices),
                                       ref_v.numpy(), atol=2e-2)  # mm
            np.testing.assert_allclose(np.asarray(out.joints),
                                       ref_j.numpy(), atol=2e-2)

            # PCA path (ncomps=6, with hand mean)
            layer_pca = ml.ManoLayer(mano_root=mano_dir, use_pca=True,
                                     ncomps=6, flat_hand_mean=False,
                                     side="right")
            pose_pca = rng.normal(scale=1.0, size=(2, 9)).astype(np.float32)
            with torch.no_grad():
                pv, pj = layer_pca(torch.from_numpy(pose_pca),
                                   th_betas=torch.from_numpy(betas))
            out_pca = mano_forward_manopth(
                model, jnp.asarray(pose_pca), betas=jnp.asarray(betas),
                use_pca=True, ncomps=6, flat_hand_mean=False)
            np.testing.assert_allclose(np.asarray(out_pca.vertices),
                                       pv.numpy(), atol=2e-2)
        finally:
            ml.ready_arguments = orig

    def test_perspective_projection_with_rotation(self, ref, rng):
        import torch
        from scipy.spatial.transform import Rotation as R

        pts = rng.normal(size=(2, 10, 3)).astype(np.float32)
        pts[..., 2] += 4.0
        rot = R.from_rotvec(rng.normal(size=(2, 3)) * 0.3).as_matrix().astype(np.float32)
        t = np.zeros((2, 3), np.float32)
        t[:, 2] = 5.0
        f = np.full((2, 2), 1000.0, np.float32)
        expected = ref.perspective_projection(
            torch.from_numpy(pts), translation=torch.from_numpy(t),
            focal_length=torch.from_numpy(f),
            rotation=torch.from_numpy(rot),
        ).numpy()
        got = np.asarray(G.perspective_projection(
            jnp.asarray(pts), jnp.asarray(t), jnp.asarray(f),
            rotation=jnp.asarray(rot)))
        np.testing.assert_allclose(got, expected, atol=2e-3)
