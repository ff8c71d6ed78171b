"""Data-pipeline tests with synthetic on-disk fixtures."""
import os
import tarfile

import numpy as np
import pytest

from hamer_yolo_tpu.io import datasets as D


@pytest.fixture
def yolo_dataset(tmp_path):
    import cv2

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 255, (120 + 10 * i, 160, 3)).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        with open(lbl_dir / f"im{i}.txt", "w") as f:
            f.write(f"{i % 3} 0.5 0.5 0.3 0.4\n1 0.2 0.3 0.1 0.1\n")
    return str(img_dir), str(lbl_dir)


class TestYoloData:
    def test_label_loading(self, yolo_dataset):
        img_dir, lbl_dir = yolo_dataset
        pairs = D.image_label_pairs(img_dir, lbl_dir)
        assert len(pairs) == 6
        labels = D.load_yolo_labels(pairs[0][1])
        assert labels.shape == (2, 5)

    def test_mosaic(self, yolo_dataset):
        img_dir, lbl_dir = yolo_dataset
        pairs = D.image_label_pairs(img_dir, lbl_dir)
        cfg = D.YoloDataConfig(img_size=128)
        img, labels = D.load_mosaic4(pairs, [0, 1, 2, 3], np.random.default_rng(0), cfg)
        assert img.shape == (128, 128, 3)
        assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()

    def test_batch_iterator_shapes(self, yolo_dataset):
        img_dir, lbl_dir = yolo_dataset
        cfg = D.YoloDataConfig(img_size=128, max_targets=16)
        it = D.yolo_batch_iterator(img_dir, 2, cfg, label_dir=lbl_dir)
        batch = next(it)
        assert batch["img"].shape == (2, 128, 128, 3)
        assert batch["targets"].shape == (2, 16, 5)
        assert 0.0 <= batch["img"].min() and batch["img"].max() <= 1.0
        # at least one valid target row
        assert (batch["targets"][..., 3] > 0).any()


class TestHamerCrop:
    def test_crop_shapes_and_normalization(self, rng):
        img = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
        patch, aug = D.hamer_training_crop(
            img, np.array([150.0, 100.0]), 120.0, np.random.default_rng(0),
            out_size=64,
        )
        assert patch.shape == (64, 64, 3)
        assert abs(patch.mean()) < 3.0  # normalized scale
        assert set(aug) == {"scale", "rot", "do_flip", "tx", "ty"}

    def test_no_aug_matches_inference_crop(self, rng):
        """With augmentation disabled the training crop equals the
        inference preprocessing (device path)."""
        import jax.numpy as jnp

        from hamer_yolo_tpu.pipeline.preprocess import hamer_crop

        img = rng.integers(0, 255, (200, 300, 3)).astype(np.uint8)
        aug = D.HamerAugConfig(scale_factor=0, rot_factor=0, trans_factor=0,
                               color_scale=0, rot_aug_rate=0)
        patch, _ = D.hamer_training_crop(
            img, np.array([150.0, 100.0]), 120.0, np.random.default_rng(0),
            aug=aug, out_size=64,
        )
        dev = np.asarray(hamer_crop(
            jnp.asarray(img.astype(np.float32)), jnp.array([150.0, 100.0]),
            jnp.asarray(120.0), jnp.asarray(0.0), 64,
        ))
        assert np.abs(patch - dev).max() < 0.05  # cv2 fixed-point tolerance


class TestHamerTarBatches:
    def test_batch_from_tar(self, tmp_path, rng):
        import json

        import cv2

        tar_path = tmp_path / "train.tar"
        with tarfile.open(tar_path, "w") as tf:
            for i in range(3):
                img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
                jpg = tmp_path / f"s{i}.jpg"
                cv2.imwrite(str(jpg), img)
                meta = {
                    "center": [80.0, 60.0], "scale": 50.0,
                    "keypoints_2d": np.ones((21, 3)).tolist(),
                    "keypoints_3d": np.ones((21, 4)).tolist(),
                    "mano_pose": (0.1 * rng.normal(size=48)).tolist(),
                    "mano_betas": np.zeros(10).tolist(),
                }
                js = tmp_path / f"s{i}.json"
                js.write_text(json.dumps(meta))
                tf.add(jpg, arcname=f"s{i}.jpg")
                tf.add(js, arcname=f"s{i}.json")
        it = D.hamer_batch_iterator([str(tar_path)], batch_size=2, out_size=64)
        batch = next(it)
        assert batch["img"].shape == (2, 64, 64, 3)
        assert batch["mano_hand_pose"].shape == (2, 15, 3, 3)
        assert batch["has_mano_params"].sum() == 2
        # rotmats valid
        r = batch["mano_hand_pose"].reshape(-1, 3, 3)
        np.testing.assert_allclose(
            np.einsum("bij,bkj->bik", r, r), np.eye(3)[None].repeat(len(r), 0),
            atol=1e-4,
        )


class TestTarStreaming:
    def test_grouped_iteration(self, tmp_path):
        tar_path = tmp_path / "shard.tar"
        with tarfile.open(tar_path, "w") as tf:
            for key in ("a", "b"):
                for ext in ("jpg", "json"):
                    p = tmp_path / f"{key}.{ext}"
                    p.write_bytes(f"{key}-{ext}".encode())
                    tf.add(p, arcname=f"{key}.{ext}")
        samples = list(D.iter_tar_samples([str(tar_path)]))
        assert len(samples) == 2
        key0, s0 = samples[0]
        assert key0 == "a" and s0["jpg"] == b"a-jpg" and "json" in s0


def test_mocap_source(tmp_path):
    from hamer_yolo_tpu.io.datasets import MoCapSource, write_synthetic_mocap_npz

    p = write_synthetic_mocap_npz(str(tmp_path / "mocap.npz"), n=64, seed=3)
    src = MoCapSource(p)
    assert len(src) == 64
    item = src[5]
    assert item["hand_pose"].shape == (45,) and item["betas"].shape == (10,)
    pose, betas = src.sample_rotmats(7, np.random.default_rng(0))
    assert pose.shape == (7, 15, 3, 3) and betas.shape == (7, 10)
    # valid rotations
    eye = np.einsum("njab,njcb->njac", pose, pose)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)


def test_extreme_crop_in_training_crop():
    from hamer_yolo_tpu.io.datasets import HamerAugConfig, hamer_training_crop

    img = np.random.default_rng(0).integers(0, 255, (480, 640, 3),
                                            np.uint8)
    kp = np.zeros((44, 3), np.float32)
    kp[:, :2] = np.random.default_rng(1).uniform(100, 400, (44, 2))
    kp[:, 2] = 1.0
    aug = HamerAugConfig(extreme_crop_aug_rate=1.0, rot_aug_rate=0.0)
    crop, params = hamer_training_crop(
        img, np.array([320.0, 240.0]), 200.0, np.random.default_rng(2),
        aug, 256, keypoints_2d=kp)
    assert crop.shape == (256, 256, 3)
    base, _ = hamer_training_crop(
        img, np.array([320.0, 240.0]), 200.0, np.random.default_rng(2),
        HamerAugConfig(extreme_crop_aug_rate=0.0, rot_aug_rate=0.0), 256)
    assert np.abs(crop - base).max() > 0.1  # extreme crop changed the view


def test_json_box_dataset(tmp_path):
    """JsonBoxDataset mirrors the reference json_dataset.py conventions."""
    import json

    import cv2

    from hamer_yolo_tpu.io.datasets import JsonBoxDataset

    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"img_{i}.jpg"),
                    rng.integers(0, 255, (240, 320, 3)).astype(np.uint8))
    boxes = [[40, 50, 200, 210], [10, 10, 110, 150], [60, 20, 260, 220]]
    (tmp_path / "boxes.json").write_text(json.dumps(boxes))
    np.savez(tmp_path / "ann.npz",
             hand_pose=rng.normal(0, 0.2, (3, 48)).astype(np.float32),
             has_hand_pose=np.ones(3, np.float32),
             betas=np.zeros((3, 10), np.float32),
             has_betas=np.ones(3, np.float32))

    ds = JsonBoxDataset(str(tmp_path / "boxes.json"), str(tmp_path),
                        right=True, train=False,
                        annotations_npz=str(tmp_path / "ann.npz"))
    assert len(ds) == 3
    item = ds[0]
    # reference center/scale convention (json_dataset.py:84-86, 160)
    np.testing.assert_allclose(item["box_center"], [120.0, 130.0])
    # bbox_size = (scale*200).max() with scale = 2*(xy2-xy1)/200 -> 2x side
    assert float(item["box_size"]) == 320.0
    assert item["img"].shape == (256, 256, 3)
    assert item["right"] == 1.0
    assert item["mano_params"]["global_orient"].shape == (3,)
    assert item["mano_params"]["hand_pose"].shape == (45,)
    assert item["has_mano_params"]["betas"] == 1.0
    # eval mode is deterministic
    item2 = JsonBoxDataset(str(tmp_path / "boxes.json"), str(tmp_path),
                           right=True, train=False,
                           annotations_npz=str(tmp_path / "ann.npz"))[0]
    np.testing.assert_array_equal(item["img"], item2["img"])
    # train mode augments
    ds_tr = JsonBoxDataset(str(tmp_path / "boxes.json"), str(tmp_path),
                           right=True, train=True, seed=7)
    assert np.abs(ds_tr[0]["img"] - item["img"]).max() > 1e-3


def test_hand_keypoints_do_not_enter_extreme_crop():
    """(21,3) hand keypoints must not be routed into the 44-keypoint body
    extreme-crop family (it indexes ids up to 43 -> IndexError). Force the
    extreme branch probability to 1 and iterate enough draws to hit it."""
    from hamer_yolo_tpu.io.datasets import HamerAugConfig, hamer_training_crop

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
    kp21 = rng.uniform(100, 400, (21, 3)).astype(np.float32)
    aug = HamerAugConfig(extreme_crop_aug_rate=1.0, rot_aug_rate=0.0)
    for _ in range(5):
        crop, _params = hamer_training_crop(
            img, np.array([320.0, 240.0]), 200.0, rng, aug, 256,
            keypoints_2d=kp21)
        assert crop.shape == (256, 256, 3)
