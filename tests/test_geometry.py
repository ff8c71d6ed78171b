"""Geometry unit tests: rotation round-trips, cv2 parity for affine/warp,
camera lift algebra."""
import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from hamer_yolo_tpu import geometry as G


class TestRotations:
    def test_aa_rotmat_roundtrip(self, rng):
        aa = rng.normal(size=(64, 3)).astype(np.float32)
        rot = np.asarray(G.aa_to_rotmat(jnp.asarray(aa)))
        expected = R.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(rot, expected, atol=1e-5)
        back = np.asarray(G.rotmat_to_aa(jnp.asarray(rot)))
        # axis-angle is unique up to 2*pi wraps; inputs here are small.
        back_mat = R.from_rotvec(back).as_matrix()
        np.testing.assert_allclose(back_mat, expected, atol=1e-5)

    def test_aa_rotmat_small_angle(self):
        aa = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
        rot = G.aa_to_rotmat(aa)
        np.testing.assert_allclose(np.asarray(rot), np.eye(3)[None].repeat(2, 0), atol=1e-6)

    def test_rot6d_orthonormal(self, rng):
        x = rng.normal(size=(32, 6)).astype(np.float32)
        rot = np.asarray(G.rot6d_to_rotmat(jnp.asarray(x)))
        eye = np.einsum("bij,bkj->bik", rot, rot)
        np.testing.assert_allclose(eye, np.eye(3)[None].repeat(32, 0), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)

    def test_rot6d_identity_init(self):
        # HaMeR mean-params convention: [1,0,0, 0,1,0] -> identity.
        x = jnp.array([[1.0, 0, 0, 0, 1.0, 0]])
        np.testing.assert_allclose(np.asarray(G.rot6d_to_rotmat(x))[0], np.eye(3), atol=1e-6)

    def test_rot6d_matches_reference_formula(self, rng):
        """Check columns: b1 = norm(a1), etc., matching geometry.py:47-70."""
        x = rng.normal(size=(8, 6)).astype(np.float64)
        rot = np.asarray(G.rot6d_to_rotmat(jnp.asarray(x)))
        for i in range(8):
            a1, a2 = x[i, :3], x[i, 3:]
            b1 = a1 / np.linalg.norm(a1)
            u2 = a2 - (b1 @ a2) * b1
            b2 = u2 / np.linalg.norm(u2)
            b3 = np.cross(b1, b2)
            np.testing.assert_allclose(rot[i], np.stack([b1, b2, b3], axis=-1), atol=1e-5)

    def test_rotmat_to_aa_matches_cv2_rodrigues(self, rng):
        aa = rng.normal(size=(16, 3)).astype(np.float64)
        rots = R.from_rotvec(aa).as_matrix()
        ours = np.asarray(G.rotmat_to_aa(jnp.asarray(rots)))
        for i in range(16):
            cv, _ = cv2.Rodrigues(rots[i])
            np.testing.assert_allclose(ours[i], cv[:, 0], atol=1e-5)

    def test_orthonormalize(self, rng):
        noisy = R.from_rotvec(rng.normal(size=(8, 3))).as_matrix() + 0.05 * rng.normal(size=(8, 3, 3))
        proj = np.asarray(G.rotmat_orthonormalize(jnp.asarray(noisy)))
        eye = np.einsum("bij,bkj->bik", proj, proj)
        np.testing.assert_allclose(eye, np.eye(3)[None].repeat(8, 0), atol=1e-5)
        assert np.all(np.linalg.det(proj) > 0.99)


class TestAffine:
    def test_gen_trans_matches_cv2(self, rng):
        for _ in range(10):
            c_x, c_y = rng.uniform(50, 500, 2)
            w, h = rng.uniform(20, 300, 2)
            scale = rng.uniform(0.5, 2.0)
            rot = rng.uniform(-90, 90)
            ours = np.asarray(
                G.gen_trans_from_patch(c_x, c_y, w, h, 256.0, 256.0, scale, rot)
            )
            # cv2 reference (same construction as both reference repos).
            rad = np.pi * rot / 180

            def rot2d(p):
                sn, cs = np.sin(rad), np.cos(rad)
                return np.array([p[0] * cs - p[1] * sn, p[0] * sn + p[1] * cs], np.float32)

            src = np.zeros((3, 2), np.float32)
            src[0] = [c_x, c_y]
            src[1] = src[0] + rot2d([0, h * scale * 0.5])
            src[2] = src[0] + rot2d([w * scale * 0.5, 0])
            dst = np.array([[128, 128], [128, 256], [256, 128]], np.float32)
            expected = cv2.getAffineTransform(src, dst)
            np.testing.assert_allclose(ours, expected, atol=1e-3)

    def test_inverse_affine(self, rng):
        t = np.asarray(G.gen_trans_from_patch(100.0, 80.0, 50.0, 70.0, 256.0, 256.0, 1.3, 25.0))
        t_inv_direct = np.asarray(
            G.gen_trans_from_patch(100.0, 80.0, 50.0, 70.0, 256.0, 256.0, 1.3, 25.0, inv=True)
        )
        t_inv = np.asarray(G.invert_affine(jnp.asarray(t)))
        np.testing.assert_allclose(t_inv, t_inv_direct, atol=1e-4)

    def test_warp_affine_matches_cv2(self, rng):
        img = rng.integers(0, 255, size=(240, 320, 3)).astype(np.float32)
        trans = np.asarray(G.gen_trans_from_patch(150.0, 120.0, 180.0, 180.0, 64.0, 64.0))
        ours = np.asarray(G.warp_affine(jnp.asarray(img), jnp.asarray(trans), (64, 64)))
        expected = cv2.warpAffine(
            img, trans.astype(np.float64), (64, 64), flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
        # cv2 uses 5-bit fixed-point interp weights; allow small abs error.
        assert np.abs(ours - expected).max() < 1.0
        assert np.abs(ours - expected).mean() < 0.1

    def test_warp_affine_out_of_bounds_border(self):
        img = jnp.ones((32, 32, 3), jnp.float32) * 200.0
        # Crop centered far outside the image -> all border (0).
        trans = G.gen_trans_from_patch(1000.0, 1000.0, 10.0, 10.0, 16.0, 16.0)
        out = np.asarray(G.warp_affine(img, trans, (16, 16)))
        np.testing.assert_allclose(out, 0.0)

    def test_letterbox_matches_cv2_flow(self, rng):
        img = rng.integers(0, 255, size=(480, 640, 3)).astype(np.uint8)
        padded, r, (dw, dh) = G.letterbox_numpy(img, 640, auto=False)
        assert padded.shape == (640, 640, 3)
        # XLA path on the same geometry.
        r2, new_unpad, _, pads = G.letterbox_params(img.shape[:2], 640, auto=False)
        xla = np.asarray(
            G.letterbox_image(jnp.asarray(img, jnp.float32), new_unpad, pads, 640)
        )
        assert xla.shape == (640, 640, 3)
        assert np.abs(xla - padded.astype(np.float32)).mean() < 2.0

    def test_crop_resize_normalize_flip(self, rng):
        img = rng.integers(0, 255, size=(100, 100, 3)).astype(np.float32)
        mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
        noflip = np.asarray(
            G.crop_resize_normalize(
                jnp.asarray(img), jnp.array([50.0, 50.0]), jnp.asarray(80.0),
                (32, 32), mean, std, jnp.asarray(0.0),
            )
        )
        flip = np.asarray(
            G.crop_resize_normalize(
                jnp.asarray(img), jnp.array([50.0, 50.0]), jnp.asarray(80.0),
                (32, 32), mean, std, jnp.asarray(1.0),
            )
        )
        np.testing.assert_allclose(flip, noflip[:, ::-1, :], atol=1e-5)
        # Parity vs explicit cv2 pipeline (reference prepare_batch_bbox).
        trans = cv2.getAffineTransform(
            np.array([[50, 50], [50, 90], [90, 50]], np.float32),
            np.array([[16, 16], [16, 32], [32, 16]], np.float32),
        )
        patch = cv2.warpAffine(img, trans, (32, 32), flags=cv2.INTER_LINEAR,
                               borderMode=cv2.BORDER_CONSTANT, borderValue=0)
        patch = patch[:, :, ::-1]  # BGR->RGB
        expected = (patch - 255.0 * np.asarray(mean)) / (255.0 * np.asarray(std))
        assert np.abs(noflip - expected).max() < 0.05


class TestCamera:
    def test_perspective_projection(self, rng):
        pts = rng.normal(size=(4, 21, 3)).astype(np.float32)
        pts[..., 2] += 5.0
        t = np.zeros((4, 3), np.float32)
        f = np.full((4, 2), 1000.0, np.float32)
        c = np.full((4, 2), 320.0, np.float32)
        uv = np.asarray(G.perspective_projection(jnp.asarray(pts), jnp.asarray(t), jnp.asarray(f), jnp.asarray(c)))
        expected = pts[..., :2] / pts[..., 2:3] * 1000.0 + 320.0
        np.testing.assert_allclose(uv, expected, atol=1e-3)

    def test_cam_crop_to_full_consistency(self):
        """custom_cam_crop_to_full with center principal point == cam_crop_to_full."""
        cam = jnp.array([[0.9, 0.05, -0.02], [1.2, -0.1, 0.08]])
        center = jnp.array([[300.0, 200.0], [500.0, 420.0]])
        size = jnp.array([180.0, 240.0])
        img_size = jnp.array([[640.0, 480.0], [640.0, 480.0]])
        f = 5000.0
        full = np.asarray(G.cam_crop_to_full(cam, center, size, img_size, f))
        custom = np.asarray(
            G.custom_cam_crop_to_full(
                cam, center, size,
                jnp.full((2,), f), jnp.full((2,), f),
                img_size[:, 0] / 2, img_size[:, 1] / 2,
            )
        )
        np.testing.assert_allclose(full, custom, rtol=1e-5)

    def test_custom_cam_depth_refine(self):
        cam = jnp.array([[0.9, 0.05, -0.02]])
        center = jnp.array([[300.0, 200.0]])
        size = jnp.array([180.0])
        out = np.asarray(
            G.custom_cam_crop_to_full(
                cam, center, size, jnp.array([900.0]), jnp.array([900.0]),
                jnp.array([320.0]), jnp.array([240.0]), depth_refine=jnp.array([0.55]),
            )
        )
        assert abs(out[0, 2] - 0.55) < 1e-6
        # tx must follow bs = 2 fx / tz.
        bs = 2 * 900.0 / (0.55 + 1e-9)
        expected_tx = 2 * (300.0 - 320.0) / bs + 0.05
        assert abs(out[0, 0] - expected_tx) < 1e-5

    def test_uvd_xyz_roundtrip(self, rng):
        K = jnp.array([[906.96, 0, 960.0], [0, 906.79, 540.0], [0, 0, 1.0]])
        xyz = rng.normal(size=(21, 3)).astype(np.float32)
        xyz[:, 2] += 4.0
        uvd = G.xyz2uvd(jnp.asarray(xyz), K)
        back = np.asarray(G.uvd2xyz(uvd, K))
        np.testing.assert_allclose(back, xyz, atol=1e-4)

    def test_k_value(self):
        k = np.asarray(G.calculate_k_value(jnp.array([200.0, 300.0]), 906.96, 906.79))
        expected = np.sqrt(0.3 * 0.3 * 906.96 * 906.79 / (200.0 * 300.0))
        np.testing.assert_allclose(k, expected, rtol=1e-6)


class TestBoxes:
    def test_expand_to_aspect_ratio(self):
        out = np.asarray(G.expand_to_aspect_ratio(jnp.array([100.0, 50.0]), (192, 256)))
        # h/w = 0.5 < 256/192 -> grow h to w*256/192.
        np.testing.assert_allclose(out, [100.0, 100.0 * 256 / 192], rtol=1e-6)
        out2 = np.asarray(G.expand_to_aspect_ratio(jnp.array([50.0, 200.0]), (192, 256)))
        np.testing.assert_allclose(out2, [200.0 * 192 / 256, 200.0], rtol=1e-6)

    def test_hamer_box_params(self):
        box = jnp.array([[100.0, 120.0, 180.0, 260.0]])
        center, size = G.hamer_box_params(box)
        np.testing.assert_allclose(np.asarray(center)[0], [140.0, 190.0])
        # wh = (80, 140) * 2.5 = (200, 350); aspect 192:256 -> expand w to 350*192/256=262.5
        np.testing.assert_allclose(np.asarray(size)[0], 350.0)

    def test_process_bbox(self):
        out, valid = G.process_bbox(jnp.array([100.0, 100.0, 50.0, 100.0]), 640.0, 480.0)
        assert bool(valid)
        o = np.asarray(out)
        # aspect 1.0 square then *1.5; sanitize makes w=49, h=99 -> square 99 -> 148.5
        np.testing.assert_allclose(o[2], 99.0 * 1.5, rtol=1e-6)
        np.testing.assert_allclose(o[3], 99.0 * 1.5, rtol=1e-6)

    def test_box_iou(self):
        a = jnp.array([[0.0, 0, 10, 10]])
        b = jnp.array([[5.0, 5, 15, 15], [20.0, 20, 30, 30]])
        iou = np.asarray(G.box_iou(a, b))
        np.testing.assert_allclose(iou[0, 0], 25.0 / 175.0, rtol=1e-5)
        assert iou[0, 1] == 0.0


class TestFlip:
    def test_pred_cam_correction(self):
        cam = jnp.array([[1.0, 0.5, 0.3], [1.0, 0.5, 0.3]])
        out = np.asarray(G.correct_pred_cam(cam, jnp.array([0.0, 1.0])))
        assert out[0, 1] == 0.5 and out[1, 1] == -0.5
        assert out[0, 0] == 1.0 and out[1, 2] == pytest.approx(0.3)

    def test_mirror_mesh_and_faces(self):
        v = jnp.ones((2, 4, 3))
        out = np.asarray(G.mirror_mesh(v, jnp.array([0.0, 1.0])))
        assert out[0, 0, 0] == 1.0 and out[1, 0, 0] == -1.0
        f = jnp.array([[0, 1, 2]])
        np.testing.assert_array_equal(np.asarray(G.rewind_faces(f)), [[0, 2, 1]])

    def test_reference_compat_kp3d_bug(self):
        kp = jnp.ones((2, 3, 3))
        buggy = np.asarray(G.flip_keypoints3d(kp, jnp.array([0.0, 1.0]), reference_compat=True))
        assert buggy[0, 0, 0] == 0.0  # right hand x zeroed (reference bug)
        assert buggy[1, 0, 0] == 1.0
        fixed = np.asarray(G.flip_keypoints3d(kp, jnp.array([0.0, 1.0])))
        assert fixed[0, 0, 0] == 1.0 and fixed[1, 0, 0] == -1.0


class TestEuler:
    """ee_to_rotmat / rotmat_to_ee / aa<->ee — parity surface of the
    reference's KeypointFusion rotation-convention library
    (util/object_transform.py:74-107, 193-249, pytorch3d intrinsic
    semantics), pinned against scipy (capital-convention intrinsic ==
    pytorch3d composition R = R_c0 @ R_c1 @ R_c2)."""

    @pytest.mark.parametrize("conv", ["xyz", "xzy", "yxz", "yzx",
                                      "zxy", "zyx"])
    def test_matches_scipy_all_tait_bryan(self, conv, rng):
        from hamer_yolo_tpu.geometry.rotations import (
            ee_to_rotmat, rotmat_to_ee,
        )

        ang = rng.uniform(-1.2, 1.2, (32, 3)).astype(np.float64)
        got = np.asarray(ee_to_rotmat(jnp.asarray(ang), conv))
        want = R.from_euler(conv.upper(), ang).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-6)
        back = np.asarray(rotmat_to_ee(jnp.asarray(want), conv))
        np.testing.assert_allclose(back, ang, atol=1e-6)

    def test_aa_ee_roundtrip(self, rng):
        from hamer_yolo_tpu.geometry.rotations import (
            aa_to_ee, aa_to_rotmat, ee_to_aa, ee_to_rotmat,
        )

        aa = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 3)))
        ee = aa_to_ee(aa, "zyx")
        np.testing.assert_allclose(np.asarray(ee_to_rotmat(ee, "zyx")),
                                   np.asarray(aa_to_rotmat(aa)), atol=1e-5)
        aa2 = ee_to_aa(ee, "zyx")
        np.testing.assert_allclose(np.asarray(aa_to_rotmat(aa2)),
                                   np.asarray(aa_to_rotmat(aa)), atol=1e-5)

    def test_bad_convention_raises(self):
        from hamer_yolo_tpu.geometry.rotations import ee_to_rotmat

        with pytest.raises(ValueError):
            ee_to_rotmat(jnp.zeros((3,)), "xxy")
        with pytest.raises(ValueError):
            ee_to_rotmat(jnp.zeros((3,)), "xw")
