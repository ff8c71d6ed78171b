"""io/rgbd_datasets: on-disk RGB-D loading (dataloader/loader.py subset).

Decode conventions pinned against the reference reader math
(nyu_reader:160-163, HO3D.read_depth_img:1482-1488, DexYCB u16
:1110-1111); the label pipeline is checked by geometric roundtrip (the
crop matrix M itself is oracle-tested in test_kpfusion_rgbd.py) and the
dataset is exercised on the reference's own committed wild fixtures.
"""
import os

import numpy as np
import pytest

from hamer_yolo_tpu.io.rgbd_datasets import (
    HO3D_DEPTH_SCALE, RGBDDatasetConfig, RGBDDiskDataset, calculate_com,
    joint_3d_to_img, read_depth, scan_rgbd_dir,
)

REF_TEST_DIR = "/root/reference/rootnet/KeypointFusion/test"


class TestReadDepth:
    def test_u16_png_mm(self, tmp_path):
        import cv2

        d = (np.arange(64, dtype=np.uint16) * 37 % 4000).reshape(8, 8)
        p = str(tmp_path / "d.png")
        cv2.imwrite(p, d)
        got = read_depth(p, "u16")
        np.testing.assert_array_equal(got, d.astype(np.float32))
        # auto detects single-channel as u16
        np.testing.assert_array_equal(read_depth(p, "auto"), got)

    def test_nyu_encoding(self, tmp_path):
        import cv2

        # nyu_reader: depth = ch0 + ch1*256 over the BGR-decoded png
        depth_mm = np.array([[0, 255], [256, 40000]], np.uint32)
        img = np.zeros((2, 2, 3), np.uint8)
        img[..., 0] = depth_mm % 256       # blue
        img[..., 1] = depth_mm // 256      # green
        p = str(tmp_path / "nyu.png")
        cv2.imwrite(p, img)
        got = read_depth(p, "nyu")
        np.testing.assert_array_equal(got, depth_mm.astype(np.float32))

    def test_ho3d_encoding(self, tmp_path):
        import cv2

        raw = np.array([[0, 123], [4567, 65535]], np.uint32)
        img = np.zeros((2, 2, 3), np.uint8)
        img[..., 2] = raw % 256            # red
        img[..., 1] = raw // 256           # green
        p = str(tmp_path / "ho3d.png")
        cv2.imwrite(p, img)
        got = read_depth(p, "ho3d")
        np.testing.assert_allclose(
            got, raw.astype(np.float32) * HO3D_DEPTH_SCALE * 1000.0,
            rtol=1e-6)

    def test_npy(self, tmp_path):
        d = np.random.default_rng(0).uniform(100, 900, (4, 4)).astype(np.float32)
        p = str(tmp_path / "d.npy")
        np.save(p, d)
        np.testing.assert_array_equal(read_depth(p), d)

    def test_bad_format_raises(self, tmp_path):
        with pytest.raises(ValueError, match="unknown depth format"):
            read_depth(str(tmp_path / "x.png"), "exr")


class TestCoM:
    def test_matches_reference_math(self):
        # calculateCoM:61-79: mean pixel coords of in-range mask, mean z
        d = np.zeros((10, 10), np.float32)
        d[2, 3] = 400.0
        d[4, 5] = 600.0
        com = calculate_com(d, 100, 1000)
        np.testing.assert_allclose(com, [4.0, 3.0, 500.0])

    def test_empty_returns_fallback(self):
        com = calculate_com(np.zeros((5, 5), np.float32), 100, 1000)
        np.testing.assert_allclose(com, [300.0, 300.0, 500.0])


@pytest.mark.skipif(not os.path.isdir(REF_TEST_DIR),
                    reason="reference fixtures not mounted")
class TestDiskDataset:
    def test_scan_finds_wild_fixtures(self):
        samples = scan_rgbd_dir(REF_TEST_DIR)
        stems = {s.stem for s in samples}
        assert {"20", "101"} <= stems
        by = {s.stem: s for s in samples}
        assert by["20"].joints_path and by["20"].bbox_path

    def test_labeled_sample_schema_and_roundtrip(self):
        cfg = RGBDDatasetConfig()
        ds = RGBDDiskDataset(REF_TEST_DIR, cfg)
        assert len(ds) >= 2
        it = ds.load(0)
        S, N, J = cfg.img_size, cfg.sample_num, cfg.joint_num
        assert it["img_rgb"].shape == (3, S, S)
        assert it["img"].shape == (1, S, S)
        assert it["pcl"].shape == (N, 3)
        assert it["uvd_gt"].shape == (J, 3) and it["xyz_gt"].shape == (J, 3)
        for k, v in it.items():
            assert np.isfinite(v).all(), k
        assert it["img_rgb"].min() >= 0.0 and it["img_rgb"].max() <= 1.0
        assert np.abs(it["img"]).max() <= 1.0 + 1e-6
        assert np.abs(it["pcl"]).max() <= 1.0 + 1e-6
        # xyz_gt recenters the raw joints: mean must be ~0 (center = mean)
        np.testing.assert_allclose(it["xyz_gt"].mean(0), 0.0, atol=1e-6)
        # geometric roundtrip: unnormalize uvd_gt through M^-1 + pinhole
        # must land back on the raw label joints (loader.py:1170-1173)
        sample = ds.samples[0]
        joints = np.loadtxt(sample.joints_path, dtype=np.float32)[:J]
        uvd = it["uvd_gt"].copy()
        uvd[:, :2] = (uvd[:, :2] + 1.0) * (S / 2.0)
        uvd[:, 2] = uvd[:, 2] * (it["cube"][0] / 2.0) + it["center"][2]
        hom = np.concatenate([uvd[:, :2], np.ones((J, 1))], 1)
        uv_full = (np.linalg.inv(it["M"]) @ hom.T).T[:, :2]
        want_uv = joint_3d_to_img(joints, tuple(it["cam_para"]))[:, :2]
        np.testing.assert_allclose(uv_full, want_uv, atol=1e-3)
        np.testing.assert_allclose(uvd[:, 2], joints[:, 2], atol=1e-3)

    def test_batches_fixed_shape_and_wrap(self):
        cfg = RGBDDatasetConfig(sample_num=64)
        ds = RGBDDiskDataset(REF_TEST_DIR, cfg)
        bs = list(ds.batches(batch_size=3, shuffle=True, seed=1))
        assert len(bs) == 1  # ceil(2/3) with wrap fill
        assert bs[0]["img_rgb"].shape[0] == 3
        assert bs[0]["pcl"].shape == (3, 64, 3)

    def test_train_step_consumes_disk_batch(self):
        """VERDICT r3 item 3 'done' criterion: a train step consumes a
        directory of fixture-style triples."""
        import jax
        import jax.numpy as jnp

        from hamer_yolo_tpu.models.kpfusion_rgbd.model import KPFusionConfig
        from hamer_yolo_tpu.training.train_kpfusion_rgbd import (
            init_train_state, make_optimizer, make_train_step,
        )

        mcfg = KPFusionConfig(img_size=32, feature_size=8, dim=32,
                              sample_num=64, num_stages=1, heads=2)
        ds = RGBDDiskDataset(
            REF_TEST_DIR,
            RGBDDatasetConfig(img_size=32, sample_num=64))
        batch = next(ds.batches(2, shuffle=False))
        tx = make_optimizer(lr=3e-4)
        params, opt_state = init_train_state(jax.random.PRNGKey(0), mcfg, tx)
        step = jax.jit(make_train_step(mcfg, tx))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        first = None
        for _ in range(4):
            params, opt_state, metrics = step(params, opt_state, jb, 0)
            if first is None:
                first = float(metrics["loss"])
            assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss"]) < first


@pytest.mark.skipif(not os.path.isdir(REF_TEST_DIR),
                    reason="reference fixtures not mounted")
class TestAugmentOracle:
    """move_com/rotate_hand/scale_hand/augment_crop vs the reference
    loader class's own methods (loader.py:303-594) on a real fixture
    depth crop."""

    @pytest.fixture(scope="class")
    def ref_loader(self):
        import sys
        import types

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import ref_pipeline_oracle as R

        R.install_kpfusion_environment()
        # loader.py imports pycocotools at module level (used only by the
        # DexYCB/HO3D load_data paths, not the augment methods) — stub it.
        if "pycocotools" not in sys.modules:
            pc = types.ModuleType("pycocotools")
            pcc = types.ModuleType("pycocotools.coco")
            pcc.COCO = object
            pc.coco = pcc
            sys.modules["pycocotools"] = pc
            sys.modules["pycocotools.coco"] = pcc
        # loader.py does `from util import vis_tool` (flat in-repo pkg)
        kpf_root = "/root/reference/rootnet/KeypointFusion"
        if kpf_root not in sys.path:
            sys.path.insert(0, kpf_root)
        import importlib

        mod = importlib.import_module(
            "software.KeypointFusion.dataloader.loader")
        ld = mod.loader.__new__(mod.loader)  # skip Dataset __init__
        ld.paras = (906.96, 906.79, 956.75, 547.23)
        ld.flip = 1
        ld.aug_modes = ["rot", "com", "sc", "none"]
        return ld

    @pytest.fixture(scope="class")
    def crop_fixture(self):
        from hamer_yolo_tpu.io.rgbd_datasets import (
            RGBDDatasetConfig, RGBDDiskDataset, joint_3d_to_img,
        )
        from hamer_yolo_tpu.models.kpfusion_rgbd.runtime import crop_depth

        cfg = RGBDDatasetConfig()
        ds = RGBDDiskDataset(REF_TEST_DIR, cfg)
        s = [x for x in ds.samples if x.stem == "20"][0]
        depth = __import__("hamer_yolo_tpu.io.rgbd_datasets",
                           fromlist=["read_depth"]).read_depth(s.depth_path)
        joints = np.loadtxt(s.joints_path, dtype=np.float32)[:21]
        center_xyz = joints.mean(0)
        center_uvd = joint_3d_to_img(center_xyz, cfg.cam_para)
        crop, M = crop_depth(depth, center_uvd, np.asarray(cfg.cube),
                             (cfg.img_size, cfg.img_size), cfg.cam_para)
        gt3dcrop = (joints - center_xyz).astype(np.float64)
        return dict(cfg=cfg, crop=crop, M=M, com=center_uvd,
                    gt=gt3dcrop, cube=list(cfg.cube))

    @pytest.mark.parametrize("mode,off,rot,sc", [
        ("com", np.array([8.0, -6.0, 12.0]), 0.0, 1.0),
        ("rot", np.zeros(3), 73.0, 1.0),
        ("sc", np.zeros(3), 0.0, 1.17),
        ("none", np.zeros(3), 0.0, 1.0),
    ])
    def test_augment_crop_matches_reference(self, ref_loader, crop_fixture,
                                            mode, off, rot, sc):
        from hamer_yolo_tpu.io.rgbd_datasets import AUG_MODES, augment_crop

        f = crop_fixture
        ref_img, _, ref_joints, ref_cube, ref_com, ref_M, ref_rot = \
            ref_loader.augmentCrop(f["crop"].copy(), f["gt"].copy(),
                                   np.asarray(f["com"]), list(f["cube"]),
                                   f["M"].copy(), AUG_MODES.index(mode),
                                   off.copy(), rot, sc,
                                   ref_loader.paras)
        got_img, got_joints, got_cube, got_com, got_M, got_rot = \
            augment_crop(f["crop"].copy(), f["gt"].copy(),
                         np.asarray(f["com"]), list(f["cube"]),
                         f["M"].copy(), AUG_MODES.index(mode),
                         off.copy(), rot, sc, ref_loader.paras)
        np.testing.assert_allclose(got_img, ref_img, atol=1e-5,
                                   err_msg=f"imgD {mode}")
        np.testing.assert_allclose(got_joints, ref_joints, atol=1e-4)
        np.testing.assert_allclose(got_cube, np.asarray(ref_cube), atol=1e-9)
        np.testing.assert_allclose(got_com, np.asarray(ref_com), atol=1e-6)
        np.testing.assert_allclose(got_M, ref_M, atol=1e-6)

    @pytest.mark.parametrize("mode,off,rot,sc", [
        ("com", np.array([-12.0, 9.0, -20.0]), 0.0, 1.0),
        ("rot", np.zeros(3), -41.0, 1.0),
        ("sc", np.zeros(3), 0.0, 0.86),
    ])
    def test_augment_crop_rgb_matches_reference(self, ref_loader,
                                                crop_fixture, mode, off,
                                                rot, sc):
        from hamer_yolo_tpu.io.rgbd_datasets import AUG_MODES, augment_crop
        from hamer_yolo_tpu.models.kpfusion_rgbd.runtime import crop_rgb

        import cv2

        f = crop_fixture
        rgb = cv2.imread(os.path.join(REF_TEST_DIR, "20.png")).astype(
            np.float32)
        rgb_crop, M_rgb = crop_rgb(rgb, f["com"], np.asarray(f["cube"]),
                                   (f["cfg"].img_size, f["cfg"].img_size),
                                   ref_loader.paras)
        ref_img, _, ref_joints, ref_cube, ref_com, ref_M, _ = \
            ref_loader.augmentCrop_RGB(rgb_crop.copy(), f["gt"].copy(),
                                       np.asarray(f["com"]),
                                       list(f["cube"]), M_rgb.copy(),
                                       AUG_MODES.index(mode), off.copy(),
                                       rot, sc, ref_loader.paras)
        got_img, got_joints, got_cube, got_com, got_M, _ = \
            augment_crop(rgb_crop.copy(), f["gt"].copy(),
                         np.asarray(f["com"]), list(f["cube"]),
                         M_rgb.copy(), AUG_MODES.index(mode), off.copy(),
                         rot, sc, ref_loader.paras, rgb=True)
        np.testing.assert_allclose(got_img, np.asarray(ref_img), atol=1e-4)
        np.testing.assert_allclose(got_joints, ref_joints, atol=1e-4)
        np.testing.assert_allclose(got_M, ref_M, atol=1e-6)

    def test_augmented_batch_trains(self):
        """--augment end-to-end: an augmented disk batch feeds the tiny
        train step."""
        import jax
        import jax.numpy as jnp

        from hamer_yolo_tpu.io.rgbd_datasets import (
            RGBDDatasetConfig, RGBDDiskDataset,
        )
        from hamer_yolo_tpu.models.kpfusion_rgbd.model import KPFusionConfig
        from hamer_yolo_tpu.training.train_kpfusion_rgbd import (
            init_train_state, make_optimizer, make_train_step,
        )

        ds = RGBDDiskDataset(REF_TEST_DIR,
                             RGBDDatasetConfig(img_size=32, sample_num=64))
        batch = next(ds.batches(2, shuffle=False, augment=True, seed=3))
        assert all(np.isfinite(v).all() for v in batch.values())
        mcfg = KPFusionConfig(img_size=32, feature_size=8, dim=32,
                              sample_num=64, num_stages=1, heads=2)
        tx = make_optimizer(lr=3e-4)
        params, opt_state = init_train_state(jax.random.PRNGKey(0), mcfg, tx)
        step = jax.jit(make_train_step(mcfg, tx))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        _, _, metrics = step(params, opt_state, jb, 0)
        assert np.isfinite(float(metrics["loss"]))


class TestSTBFormat:
    """STB dataset format (dataloader/dataset_STB.py + preprocess.py):
    depth decode, SK extrinsic projection, convert_kp + wrist fix, and
    the shared pipeline on a synthesized mini STB tree."""

    @pytest.fixture(scope="class")
    def stb_root(self, tmp_path_factory):
        import cv2
        import scipy.io as sio

        from hamer_yolo_tpu.io.rgbd_datasets import (
            STB_CAM, STB_SK_ROT, STB_SK_TRANS,
        )

        root = tmp_path_factory.mktemp("stb")
        (root / "labels").mkdir()
        (root / "B1Counting").mkdir()
        rng = np.random.default_rng(5)
        K = np.array([[STB_CAM[0], 0, STB_CAM[2]],
                      [0, STB_CAM[1], STB_CAM[3]], [0, 0, 1]])
        R = cv2.Rodrigues(np.asarray(STB_SK_ROT))[0]
        T = np.asarray(STB_SK_TRANS)
        N = 2
        hand_para = np.zeros((3, 21, N))
        for i in range(N):
            # joints clustered ~450 mm deep,近 image center in SK frame
            center = np.array([20.0, -10.0, 450.0 + 30 * i])
            joints = center + rng.uniform(-35, 35, (21, 3))
            hand_para[:, :, i] = joints.T
            # depth: blob at the hand's projected location
            depth_mm = np.zeros((480, 640), np.float32)
            uvd = (K @ (R.T @ (joints.T - T.reshape(3, 1)))).T
            uv = (uvd[:, :2] / uvd[:, 2:3]).mean(0).astype(int)
            u0, v0 = np.clip(uv[0], 60, 580), np.clip(uv[1], 60, 420)
            depth_mm[v0 - 40:v0 + 40, u0 - 40:u0 + 40] = center[2]
            enc = np.zeros((480, 640, 3), np.uint8)
            d16 = depth_mm.astype(np.uint32)
            enc[..., 2] = d16 % 256
            enc[..., 1] = d16 // 256
            cv2.imwrite(str(root / "B1Counting" / f"SK_depth_{i}.png"), enc)
            rgbimg = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
            cv2.imwrite(str(root / "B1Counting" / f"SK_color_{i}.png"),
                        rgbimg)
        sio.savemat(str(root / "labels" / "B1Counting_SK.mat"),
                    {"handPara": hand_para})
        return str(root)

    def test_depth_decode_stb(self, tmp_path):
        import cv2

        from hamer_yolo_tpu.io.rgbd_datasets import read_depth_stb

        d = np.array([[0, 700], [4000, 65000]], np.uint32)
        enc = np.zeros((2, 2, 3), np.uint8)
        enc[..., 2] = d % 256
        enc[..., 1] = d // 256
        p = str(tmp_path / "d.png")
        cv2.imwrite(p, enc)
        np.testing.assert_array_equal(read_depth_stb(p),
                                      d.astype(np.float32))

    def test_preprocess_stb_reorder_and_wrist(self):
        from hamer_yolo_tpu.io.rgbd_datasets import preprocess_stb

        uvd = np.arange(63, dtype=np.float64).reshape(21, 3)
        out = preprocess_stb(uvd)
        # convert_kp: index 0 stays, rest reversed -> reordered[16] = old 4
        # wrist = j16 + 2*(j0 - j16) over the REORDERED array
        reordered = uvd[np.array([0] + list(range(20, 0, -1)))]
        want_wrist = reordered[16] + 2.0 * (reordered[0] - reordered[16])
        np.testing.assert_allclose(out[0], want_wrist)
        np.testing.assert_allclose(out[1:], reordered[1:])

    def test_dataset_load_schema_and_roundtrip(self, stb_root):
        from hamer_yolo_tpu.io.rgbd_datasets import STBDataset

        ds = STBDataset(stb_root, img_size=64, sample_num=128)
        assert len(ds) == 2
        it = ds.load(0)
        assert it["img_rgb"].shape == (3, 64, 64)
        assert it["img"].shape == (1, 64, 64)
        assert it["pcl"].shape == (128, 3)
        assert it["uvd_gt"].shape == (21, 3)
        for k, v in it.items():
            assert np.isfinite(v).all(), k
        np.testing.assert_allclose(it["cube"], [200, 200, 200])
        np.testing.assert_allclose(it["xyz_gt"].mean(0), 0.0, atol=1e-6)
        # label magnitudes sane for a 200mm cube around the joint mean
        assert np.abs(it["xyz_gt"]).max() < 2.0

    def test_augmented_stb_batch(self, stb_root):
        from hamer_yolo_tpu.io.rgbd_datasets import STBDataset

        ds = STBDataset(stb_root, img_size=32, sample_num=64)
        b = next(ds.batches(2, shuffle=False, augment=True, seed=7))
        assert b["img"].shape == (2, 1, 32, 32)
        assert all(np.isfinite(v).all() for v in b.values())
