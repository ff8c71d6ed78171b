"""On-disk RGB-D datasets for KeypointFusion training/eval.

File-format-level subset of the reference's dataloader
(/root/reference/rootnet/KeypointFusion/dataloader/loader.py:1-1676 and
processing_depth.py): depth-png decode conventions, center-of-mass /
joint-mean metric-cube cropping, and normalized uvd/xyz label generation
— feeding ``training/train_kpfusion_rgbd`` from a directory of samples
instead of ``synthetic_rgbd_batch``.

Depth decode conventions (loader.py:160-204, 1482-1489, 1110-1111):
- ``nyu``: 3-channel png, depth = B + G*256 (nyu_reader :160-163).
- ``ho3d``: 3-channel png, depth = (R + G*256) * 0.00012498664727900177
  * 1000 mm (HO3D.read_depth_img :1482-1488).
- ``u16``: single-channel 16-bit png in mm (DexYCB aligned_depth pngs
  read with IMREAD_ANYDEPTH :1110-1111; also this repo's wild fixtures).
- ``npy``: raw float array in mm.

Sample layout (the reference's own wild-fixture layout,
KeypointFusion/test/): for each stem,
  ``{stem}.png``       RGB frame
  ``{stem}_d.png``     depth frame (any convention above, or .npy)
  ``{stem}.txt``       optional 21x3 camera-frame joints in mm (labels)
  ``{stem}_bbox.txt``  optional normalized center box (cx cy w h in image
                       fractions, test_wild.py:666-671) — used for the
                       hand center when joints are absent

Label pipeline mirrors the DexYCB eval path (loader.py:1160-1177):
center = joint mean (or bbox depth-CoM), metric-cube crop of depth+RGB,
[-1,1] depth normalization, xyz_gt = (xyz - center)/(cube/2), uvd_gt =
crop-transformed projection normalized to [-1, 1], pcl from valid crop
pixels (getpcl) sampled to ``sample_num``.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from hamer_yolo_tpu.models.kpfusion_rgbd.runtime import (
    crop_depth, crop_rgb, get_center_from_bbx, get_pcl, joint_img_to_3d,
    normalize_img, sample_pcl,
)

DEPTH_DECODERS = ("u16", "nyu", "ho3d", "npy", "auto")
HO3D_DEPTH_SCALE = 0.00012498664727900177  # loader.py:1484


def read_depth(path: str, fmt: str = "auto") -> np.ndarray:
    """Decode a depth file to float32 millimeters (conventions above)."""
    import cv2

    if fmt not in DEPTH_DECODERS:
        raise ValueError(f"unknown depth format {fmt!r}; one of {DEPTH_DECODERS}")
    if path.endswith(".npy") or fmt == "npy":
        return np.load(path).astype(np.float32)
    img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise IOError(f"cannot read depth image {path}")
    if fmt == "auto":
        fmt = "u16" if img.ndim == 2 else "nyu"
    if fmt == "u16":
        if img.ndim != 2:
            raise ValueError(f"{path}: u16 depth must be single-channel")
        return img.astype(np.float32)
    if img.ndim != 3:  # nyu/ho3d need the 3-channel encoding
        raise ValueError(f"{path}: {fmt} depth must be 3-channel")
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    if fmt == "nyu":  # nyu_reader: channel0 + channel1*256
        return (b.astype(np.float32) + g.astype(np.float32) * 256.0)
    # ho3d: channel2 + channel1*256, scaled to mm
    return (r.astype(np.float32) + g.astype(np.float32) * 256.0) \
        * HO3D_DEPTH_SCALE * 1000.0


def calculate_com(dpt: np.ndarray, min_depth: float, max_depth: float
                  ) -> np.ndarray:
    """Depth-map center of mass (u, v, z); loader.py calculateCoM:61-79."""
    from scipy import ndimage

    dc = dpt.copy()
    dc[dc < min_depth] = 0
    dc[dc > max_depth] = 0
    num = np.count_nonzero(dc)
    if num == 0:
        return np.array((300.0, 300.0, 500.0), np.float64)
    cc = ndimage.center_of_mass(dc > 0)
    return np.array((cc[1], cc[0], dc.sum() / num), np.float64)


def joint_3d_to_img(xyz: np.ndarray, paras, flip: float = 1.0) -> np.ndarray:
    """loader.joint3DToImg:242-263 (flip=1 for nyu/DexYCB/HO3D)."""
    fx, fy, fu, fv = paras
    ret = np.zeros_like(xyz, np.float32)
    ret[..., 0] = xyz[..., 0] * fx / xyz[..., 2] + fu
    ret[..., 1] = flip * xyz[..., 1] * fy / xyz[..., 2] + fv
    ret[..., 2] = xyz[..., 2]
    return ret


def _transform_points_2d(pts: np.ndarray, M: np.ndarray) -> np.ndarray:
    """loader.transformPoints2D:147-157 (homogeneous uv through M)."""
    out = pts.copy()
    hom = np.concatenate([pts[:, :2], np.ones((pts.shape[0], 1))], axis=1)
    uv = (M @ hom.T).T
    out[:, :2] = uv[:, :2] / uv[:, 2:3]
    return out


AUG_MODES = ("rot", "com", "sc", "none")  # loader.py:1032 aug_modes


def com_to_transform(com, size, dsize, paras) -> np.ndarray:
    """Crop affine from center/cube without cropping (comToTransform
    :303-338, the 'change by pengfeiren' centering variant)."""
    from hamer_yolo_tpu.models.kpfusion_rgbd.runtime import com_to_bounds

    xstart, xend, ystart, yend, _, _ = com_to_bounds(com, size, paras)
    trans = np.eye(3)
    trans[0, 2] = -xstart
    trans[1, 2] = -ystart
    wb, hb = (xend - xstart), (yend - ystart)
    if wb > hb:
        scale = np.eye(3) * dsize[0] / float(wb)
        sz = (dsize[0], hb * dsize[0] / wb)
    else:
        scale = np.eye(3) * dsize[1] / float(hb)
        sz = (wb * dsize[1] / hb, dsize[1])
    scale[2, 2] = 1
    off = np.eye(3)
    off[0, 2] = int(np.floor(dsize[0] / 2.0 - sz[0] / 2.0))
    off[1, 2] = int(np.floor(dsize[1] / 2.0 - sz[1] / 2.0))
    return off @ scale @ trans


def recrop_hand(crop: np.ndarray, M: np.ndarray, Mnew_inv: np.ndarray,
                target_size, paras, background: float = 0.0,
                nv_val: float = 0.0, thresh_z: bool = True, com=None,
                size=(250, 250, 250)) -> np.ndarray:
    """recropHand:340-361 — warp an existing crop under a new crop
    matrix (INTER_NEAREST, constant border, z re-threshold)."""
    import cv2

    warped = cv2.warpPerspective(crop, M @ Mnew_inv, tuple(target_size[:2]),
                                 flags=cv2.INTER_NEAREST,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=float(background))
    if thresh_z:
        warped[warped < nv_val] = background
        assert com is not None
        from hamer_yolo_tpu.models.kpfusion_rgbd.runtime import com_to_bounds

        _, _, _, _, zstart, zend = com_to_bounds(com, size, paras)
        msk1 = np.logical_and(warped < zstart, warped != 0)
        msk2 = np.logical_and(warped > zend, warped != 0)
        warped[msk1] = zstart
        warped[msk2] = 0.0
    return warped


def rotate_points_2d(pts: np.ndarray, center, angle_deg: float) -> np.ndarray:
    """rotatePoints2D:122-133 on (N, 3) uvd rows (z untouched)."""
    a = angle_deg * np.pi / 180.0
    out = np.asarray(pts, np.float64).copy()
    uv = out[:, :2] - np.asarray(center[:2])
    rot = np.stack([uv[:, 0] * np.cos(a) - uv[:, 1] * np.sin(a),
                    uv[:, 0] * np.sin(a) + uv[:, 1] * np.cos(a)], 1)
    out[:, :2] = rot + np.asarray(center[:2])
    return out


def move_com(dpt, cube, com, off, joints3d, M, paras, pad_value=0.0,
             thresh_z=True):
    """moveCoM:363-402 — simulate a shifted center of mass."""
    if np.allclose(off, 0.0):
        return dpt, joints3d, com, M
    com3d = joint_img_to_3d(np.asarray(com, np.float64), paras)
    new_com = joint_3d_to_img(com3d + off, paras)
    if np.allclose(com[2], 0.0) or np.allclose(new_com[2], 0.0):
        return dpt, joints3d, com, M
    Mnew = com_to_transform(new_com, cube, dpt.shape, paras)
    nv = (np.min(dpt[dpt > 0]) - 1) if thresh_z and (dpt > 0).any() else -1.0
    new_dpt = recrop_hand(dpt.astype(np.float32), Mnew, np.linalg.inv(M),
                          dpt.shape, paras, background=pad_value, nv_val=nv,
                          thresh_z=thresh_z, com=new_com, size=cube)
    new_joints3d = joints3d + com3d - joint_img_to_3d(new_com, paras)
    return new_dpt, new_joints3d, new_com, Mnew


def rotate_hand(dpt, cube, com, rot, joints3d, paras, pad_value=0.0,
                thresh_z=True):
    """rotateHand:404-437 — in-plane rotation of the crop + labels."""
    import cv2

    if np.allclose(rot, 0.0):
        return dpt, joints3d, rot
    rot = np.mod(rot, 360)
    Mr = cv2.getRotationMatrix2D((dpt.shape[1] // 2, dpt.shape[0] // 2),
                                 -rot, 1)
    new_dpt = cv2.warpAffine(dpt, Mr, (dpt.shape[1], dpt.shape[0]),
                             flags=cv2.INTER_NEAREST,
                             borderMode=cv2.BORDER_CONSTANT,
                             borderValue=pad_value)
    if thresh_z and (dpt > 0).any():
        new_dpt[new_dpt < (np.min(dpt[dpt > 0]) - 1)] = 0
    com3d = joint_img_to_3d(np.asarray(com, np.float64), paras)
    joint_2d = joint_3d_to_img(joints3d + com3d, paras)
    data_2d = rotate_points_2d(joint_2d, com[:2], rot)
    new_joints3d = joint_img_to_3d(data_2d, paras) - com3d
    return new_dpt, new_joints3d, rot


def scale_hand(dpt, cube, com, sc, joints3d, M, paras, pad_value=0.0,
               thresh_z=True):
    """scaleHand:439-474 — virtual cube rescale (labels unchanged)."""
    if np.allclose(sc, 1.0):
        return dpt, joints3d, cube, M
    new_cube = [s * sc for s in cube]
    if np.allclose(com[2], 0.0):
        return dpt, joints3d, new_cube, M
    Mnew = com_to_transform(com, new_cube, dpt.shape, paras)
    nv = (np.min(dpt[dpt > 0]) - 1) if thresh_z and (dpt > 0).any() else -1.0
    new_dpt = recrop_hand(dpt.astype(np.float32), Mnew, np.linalg.inv(M),
                          dpt.shape, paras, background=pad_value, nv_val=nv,
                          thresh_z=thresh_z, com=com, size=cube)
    return new_dpt, joints3d, new_cube, Mnew


def rand_augment(rng: np.random.Generator, sigma_com: float = 10.0,
                 sigma_sc: float = 0.2, rot_range: float = 180.0):
    """rand_augment:475-500 (DexYCB aug_para [10, 0.2, 180]) with an
    explicit Generator instead of the global random module."""
    mode = int(rng.integers(0, len(AUG_MODES)))
    off = rng.uniform(-1, 1, 3) * sigma_com
    rot = float(rng.uniform(-rot_range, rot_range))
    sc = abs(1.0 + float(rng.uniform(-1, 1)) * sigma_sc)
    return mode, off, rot, sc


def augment_crop(img, gt3dcrop, com, cube, M, mode, off, rot, sc, paras,
                 rgb: bool = False):
    """augmentCrop:548-594 (depth, z-thresholded + premax normalize) /
    augmentCrop_RGB:501-546 (rgb=True: no z logic, no normalize).

    Returns (img, joints3d_mm, cube, com, M, rot) with joints still in
    UNNORMALIZED mm around the (possibly moved) center.
    """
    name = AUG_MODES[mode]
    thresh_z = not rgb
    premax = img.max()
    cube = list(cube)
    com = np.asarray(com, np.float64)
    if not rgb and np.max(img) == 0:
        new_img, new_joints = img, gt3dcrop
    elif name == "com":
        new_img, new_joints, com, M = move_com(
            img.astype(np.float32), cube, com, off, gt3dcrop, M, paras,
            pad_value=0, thresh_z=thresh_z)
    elif name == "rot":
        new_img, new_joints, rot = rotate_hand(
            img.astype(np.float32), cube, com, rot, gt3dcrop, paras,
            pad_value=0, thresh_z=thresh_z)
    elif name == "sc":
        new_img, new_joints, cube, M = scale_hand(
            img.astype(np.float32), cube, com, sc, gt3dcrop, M, paras,
            pad_value=0, thresh_z=thresh_z)
    else:  # none
        new_img, new_joints = img, gt3dcrop
    if not rgb:
        # reference normalize_img(premax, ...) — premax is the
        # PRE-augmentation max (augmentCrop:566)
        out = new_img.astype(np.float32).copy()
        hi = com[2] + cube[2] / 2.0
        lo = com[2] - cube[2] / 2.0
        out[out == premax] = hi
        out[out == 0] = hi
        out[out >= hi] = hi
        out[out <= lo] = lo
        new_img = (out - com[2]) / (cube[2] / 2.0)
    return new_img, new_joints, np.asarray(cube), com, M, rot


@dataclass(frozen=True)
class RGBDDatasetConfig:
    img_size: int = 128                 # config.py input_size
    sample_num: int = 1024              # point-cloud capacity
    cube: Tuple[float, float, float] = (250.0, 250.0, 250.0)  # mm
    # wild/HO3D camera (sar_config cam_para; test fixtures are 1080p)
    cam_para: Tuple[float, float, float, float] = (906.96, 906.79,
                                                   956.75, 547.23)
    depth_fmt: str = "auto"
    com_lower: float = 171.0            # get_center_from_bbx bounds
    com_upper: float = 1500.0
    joint_num: int = 21


def make_rgbd_sample(
    rgb: np.ndarray,
    depth: np.ndarray,
    cam,
    cube,
    img_size: int,
    sample_num: int,
    joint_num: int = 21,
    joints: Optional[np.ndarray] = None,
    bbox=None,
    com_bounds: Tuple[float, float] = (171.0, 1500.0),
    aug_rng: Optional[np.random.Generator] = None,
    aug_para: Tuple[float, float, float] = (10.0, 0.2, 180.0),
) -> Dict[str, np.ndarray]:
    """Shared crop/label/pcl pipeline (DexYCB/STB __getitem__ shape):
    decoded frame + camera-space joints (mm) OR bbox -> the trainer's
    sample schema. ``aug_rng`` switches to the reference TRAIN path
    (augmentCrop applied consistently to depth/RGB/labels)."""
    cube = np.asarray(cube, np.float32)
    # Label normalization faithfully mirrors the reference's own axis mix
    # (loader.py divides xyz by cube[2]/2 but re-projects uvd with
    # cube[0]/2) — harmless only while cubes are cubic in x/z, which all
    # shipped configs are (250^3, STB 200^3). Guard so an anisotropic
    # cube can't silently corrupt labels.
    if cube[0] != cube[2]:
        raise ValueError(
            f"make_rgbd_sample requires cube[0] == cube[2] (got {cube}): "
            "the reference's label normalization mixes those axes")
    S = img_size
    if joints is not None:
        # eval-path center = joint mean (loader.py:1130-1132)
        center_xyz = joints.mean(0)
        center_uvd = joint_3d_to_img(center_xyz, cam)
    else:
        if bbox is None:
            raise ValueError("make_rgbd_sample: no joints and no bbox")
        center_uvd = get_center_from_bbx(depth, bbox, com_bounds[1],
                                         com_bounds[0])
        center_xyz = joint_img_to_3d(center_uvd, cam)

    depth_crop, M = crop_depth(depth, center_uvd, cube, (S, S), cam)
    rgb_crop, M_rgb = crop_rgb(rgb, center_uvd, cube, (S, S), cam)

    if aug_rng is not None:
        if joints is None:
            raise ValueError("augmentation needs joints")
        mode, off, rot, sc = rand_augment(aug_rng, *aug_para)
        gt3dcrop = (joints - center_xyz).astype(np.float64)
        cube0 = cube
        img_d, cur_label, cube, com2d, M, _ = augment_crop(
            depth_crop, gt3dcrop, center_uvd, cube, M,
            mode, off, rot, sc, cam)
        rgb_aug, _, _, _, _, _ = augment_crop(
            rgb_crop, gt3dcrop, center_uvd, cube0, M_rgb,
            mode, off, rot, sc, cam, rgb=True)
        rgb_crop = rgb_aug.astype(np.float32)
        com3d = joint_img_to_3d(com2d, cam)
        xyz_gt = cur_label / (cube[2] / 2.0)
    else:
        img_d = normalize_img(depth_crop, center_xyz, cube)
        com3d = joint_img_to_3d(center_uvd, cam)
        xyz_gt = None if joints is None \
            else (joints - center_xyz) / (cube[2] / 2.0)

    if xyz_gt is not None:
        # loader.py:1170-1173: project back through M, normalize
        uvd = _transform_points_2d(
            joint_3d_to_img(xyz_gt * (cube[0] / 2.0) + com3d, cam), M)
        uvd[:, :2] = uvd[:, :2] / (S / 2.0) - 1.0
        uvd[:, 2] = (uvd[:, 2] - com3d[2]) / (cube[0] / 2.0)
    else:
        xyz_gt = np.zeros((joint_num, 3), np.float32)
        uvd = np.zeros((joint_num, 3), np.float32)

    pcl = get_pcl(img_d, com3d, cube, M, cam)
    pcl_sample = sample_pcl(pcl, sample_num)

    return {
        "img_rgb": rgb_crop.transpose(2, 0, 1) / 255.0,  # (3, S, S)
        "img": img_d[None].astype(np.float32),           # (1, S, S)
        "pcl": pcl_sample.astype(np.float32),
        "uvd_gt": uvd.astype(np.float32),
        "xyz_gt": xyz_gt.astype(np.float32),
        "center": com3d.astype(np.float32),
        "M": M.astype(np.float32),
        "cube": np.asarray(cube, np.float32),
        "cam_para": np.asarray(cam, np.float32),
    }


@dataclass
class RGBDSample:
    stem: str
    rgb_path: str
    depth_path: str
    joints_path: Optional[str] = None
    bbox_path: Optional[str] = None


def scan_rgbd_dir(root: str) -> List[RGBDSample]:
    """Discover ``{stem}.png + {stem}_d.png [+ {stem}.txt, {stem}_bbox.txt]``
    triples, recursively (the reference's test/ + box_101/ layout)."""
    samples: List[RGBDSample] = []
    for dirpath, _, files in sorted(os.walk(root)):
        names = set(files)
        for f in sorted(files):
            if not f.endswith("_d.png") and not f.endswith("_d.npy"):
                continue
            stem = f[: -len("_d.png")] if f.endswith("_d.png") else f[:-len("_d.npy")]
            rgb = stem + ".png"
            if rgb not in names:
                continue
            jp = stem + ".txt" if stem + ".txt" in names else None
            bp = stem + "_bbox.txt" if stem + "_bbox.txt" in names else None
            samples.append(RGBDSample(
                stem=stem,
                rgb_path=os.path.join(dirpath, rgb),
                depth_path=os.path.join(dirpath, f),
                joints_path=os.path.join(dirpath, jp) if jp else None,
                bbox_path=os.path.join(dirpath, bp) if bp else None,
            ))
    return samples


class RGBDDiskDataset:
    """Fixed-shape numpy sample/batch producer over an RGB-D directory.

    ``require_labels=True`` (training) keeps only samples with a 21x3
    joint file; unlabeled samples (bbox only) are usable for inference
    smoke runs with ``require_labels=False`` (labels are zero, and the
    hand center comes from the bbox depth-CoM, the test_wild path).
    """

    def __init__(self, root: str, cfg: RGBDDatasetConfig = RGBDDatasetConfig(),
                 require_labels: bool = True):
        self.cfg = cfg
        self.samples = [s for s in scan_rgbd_dir(root)
                        if (s.joints_path is not None) or not require_labels]
        if not self.samples:
            raise FileNotFoundError(
                f"no RGB-D samples ({'labeled ' if require_labels else ''}"
                f"{{stem}}.png + {{stem}}_d.png) under {root}")

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, idx: int,
             aug_rng: Optional[np.random.Generator] = None,
             aug_para: Tuple[float, float, float] = (10.0, 0.2, 180.0),
             ) -> Dict[str, np.ndarray]:
        """One sample in the trainer's batch schema (without batch dim).

        ``aug_rng`` switches to the reference TRAIN path (DexYCB
        __getitem__ split=='train', loader.py:1141-1158): one of
        rot/com/sc/none drawn per sample (rand_augment with
        ``aug_para`` = (sigma_com, sigma_sc, rot_range)), applied
        consistently to the depth crop (z-thresholded + premax
        normalize), the RGB crop, and the labels. Requires joints.
        """
        import cv2

        cfg = self.cfg
        s = self.samples[idx]
        rgb = cv2.imread(s.rgb_path)
        if rgb is None:
            raise IOError(f"cannot read {s.rgb_path}")
        rgb = rgb.astype(np.float32)
        depth = read_depth(s.depth_path, cfg.depth_fmt)

        joints = None
        bbox = None
        if s.joints_path is not None:
            joints = np.loadtxt(s.joints_path, dtype=np.float32)
            joints = joints.reshape(-1, 3)[: cfg.joint_num]
        elif s.bbox_path is not None:
            v = np.loadtxt(s.bbox_path).reshape(-1)[:4]
            H, W = depth.shape
            bbox = [v[0] * W - v[2] * W / 2, v[1] * H - v[3] * H / 2,
                    v[2] * W, v[3] * H]
        else:
            raise ValueError(f"{s.stem}: no joints and no bbox")
        return make_rgbd_sample(
            rgb, depth, cfg.cam_para, cfg.cube, cfg.img_size,
            cfg.sample_num, cfg.joint_num, joints=joints, bbox=bbox,
            com_bounds=(cfg.com_lower, cfg.com_upper),
            aug_rng=aug_rng, aug_para=aug_para)

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0, drop_last: bool = False,
                augment: bool = False,
                aug_para: Tuple[float, float, float] = (10.0, 0.2, 180.0),
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Epoch of stacked fixed-shape batches; short batches wrap
        (fixed shapes keep the jitted train step at one compile).
        ``augment=True`` draws a fresh rot/com/sc/none augmentation per
        sample (train path)."""
        yield from _iter_batches(self, batch_size, shuffle, seed, drop_last,
                                 augment, aug_para)


def _iter_batches(dataset, batch_size: int, shuffle: bool, seed: int,
                  drop_last: bool, augment: bool,
                  aug_para: Tuple[float, float, float]
                  ) -> Iterator[Dict[str, np.ndarray]]:
    """Shared epoch iterator over any dataset with ``samples`` +
    ``load(idx, aug_rng=, aug_para=)``: seeded shuffle, wrap-around fill
    of the short final batch (or drop_last), stacked fixed-shape dicts."""
    rng = np.random.default_rng(seed)
    order = np.arange(len(dataset.samples))
    if shuffle:
        rng.shuffle(order)
    aug_rng = rng if augment else None
    n = len(order)
    steps = n // batch_size if drop_last else math.ceil(n / batch_size)
    for b in range(steps):
        idx = [order[(b * batch_size + i) % n] for i in range(batch_size)]
        items = [dataset.load(i, aug_rng=aug_rng, aug_para=aug_para)
                 for i in idx]
        yield {k: np.stack([it[k] for it in items]) for k in items[0]}


# --- STB dataset format (dataloader/dataset_STB.py, preprocess.py) ----------

# SK-camera intrinsics/extrinsics hardcoded in STB.__getitem__
# (dataset_STB.py:65-73).
STB_CAM = (607.92271, 607.88192, 314.78337, 236.42484)
STB_SK_ROT = (0.00531, -0.01196, 0.00301)      # axis-angle
STB_SK_TRANS = (-24.0381, -0.4563, -1.2326)    # mm
STB_CUBE = (200.0, 200.0, 200.0)               # dataset_STB.py:32


def read_depth_stb(path: str) -> np.ndarray:
    """STB depth decode: R + G*256, already millimeters
    (preprocess.read_depth_img:537-545, depth_scale 0.001 * 1000)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise IOError(f"cannot read depth image {path}")
    return (img[..., 2].astype(np.float32)
            + img[..., 1].astype(np.float32) * 256.0)


def stb_convert_kp(keypoints: np.ndarray) -> np.ndarray:
    """preprocess.convert_kp:201-212: wrist stays, fingers reversed."""
    order = np.array([0] + list(range(20, 0, -1)))
    return keypoints[order]


def stb_xyz_to_uvd(xyz: np.ndarray, K: np.ndarray, rot_mat: np.ndarray,
                   T: np.ndarray) -> np.ndarray:
    """preprocess.STB_xyz2uvd:40-48: project through the SK extrinsics,
    keep the ORIGINAL camera z as the d column."""
    uvd = (K @ (rot_mat.T @ (xyz.T - T.reshape(3, 1)))).T
    uvd = uvd / uvd[:, 2:3]
    return np.concatenate([uvd[:, :2], xyz[:, 2:3]], axis=1)


def preprocess_stb(uvd: np.ndarray) -> np.ndarray:
    """preprocess.preprocessSTB:267-277: convert_kp reorder + replace the
    palm-center root with an extrapolated wrist
    (wrist = j16 + 2*(j0 - j16))."""
    uvd = stb_convert_kp(uvd)
    wrist = uvd[16] + 2.0 * (uvd[0] - uvd[16])
    return np.concatenate([wrist[None], uvd[1:]], axis=0)


@dataclass
class STBSample:
    seq: str
    frame: int
    rgb_path: str
    depth_path: str
    joints_xyz: np.ndarray  # (21, 3) raw handPara column, mm


def scan_stb_dir(root: str) -> List[STBSample]:
    """Discover the STB layout (dataset_STB.py:44-60):
    ``{root}/{seq}/SK_color_{i}.png`` + ``SK_depth_{i}.png`` with labels
    in ``{root}/labels/{seq}_SK.mat`` (handPara (3, 21, N))."""
    import scipy.io as sio

    samples: List[STBSample] = []
    labels_dir = os.path.join(root, "labels")
    if not os.path.isdir(labels_dir):
        return samples
    for mat in sorted(os.listdir(labels_dir)):
        if not mat.endswith("_SK.mat"):
            continue
        seq = mat[: -len("_SK.mat")]
        seq_dir = os.path.join(root, seq)
        if not os.path.isdir(seq_dir):
            continue
        hand_para = sio.loadmat(os.path.join(labels_dir, mat))["handPara"]
        for i in range(hand_para.shape[2]):
            rgb = os.path.join(seq_dir, f"SK_color_{i}.png")
            dep = os.path.join(seq_dir, f"SK_depth_{i}.png")
            if not (os.path.exists(rgb) and os.path.exists(dep)):
                continue
            samples.append(STBSample(
                seq=seq, frame=i, rgb_path=rgb, depth_path=dep,
                joints_xyz=hand_para[:, :, i].T.astype(np.float32)))
    return samples


class STBDataset:
    """STB-format sample/batch producer (dataset_STB.py __getitem__):
    SK depth decode, extrinsic projection + wrist-extrapolation label
    preprocessing, then the shared metric-cube crop pipeline with the
    STB 200 mm cube and SK intrinsics."""

    def __init__(self, root: str, img_size: int = 128,
                 sample_num: int = 1024):
        import cv2

        self.img_size = img_size
        self.sample_num = sample_num
        self.samples = scan_stb_dir(root)
        if not self.samples:
            raise FileNotFoundError(f"no STB samples under {root}")
        self._rot_mat = cv2.Rodrigues(
            np.asarray(STB_SK_ROT, np.float64))[0]
        self._K = np.array([[STB_CAM[0], 0, STB_CAM[2]],
                            [0, STB_CAM[1], STB_CAM[3]],
                            [0, 0, 1]], np.float64)

    def __len__(self) -> int:
        return len(self.samples)

    def load(self, idx: int,
             aug_rng: Optional[np.random.Generator] = None,
             aug_para: Tuple[float, float, float] = (10.0, 0.2, 180.0),
             ) -> Dict[str, np.ndarray]:
        import cv2

        s = self.samples[idx]
        rgb = cv2.imread(s.rgb_path)
        if rgb is None:
            raise IOError(f"cannot read {s.rgb_path}")
        depth = read_depth_stb(s.depth_path)
        # labels: project + reorder + wrist fix, back to xyz in the SK
        # camera (dataset_STB.py:78-84). NOTE the reference's uvd2xyz
        # (preprocess.py:16-23) unpacks fx for BOTH axes — fy is never
        # used; replicate that quirk here for label-exactness.
        uvd = stb_xyz_to_uvd(s.joints_xyz.astype(np.float64), self._K,
                             self._rot_mat, np.asarray(STB_SK_TRANS))
        uvd = preprocess_stb(uvd)
        fx, _, cx, cy = STB_CAM
        joints = joint_img_to_3d(uvd.astype(np.float32), (fx, fx, cx, cy))
        item = make_rgbd_sample(
            rgb.astype(np.float32), depth, STB_CAM, STB_CUBE,
            self.img_size, self.sample_num, joints=joints,
            aug_rng=aug_rng, aug_para=aug_para)
        if aug_rng is not None:
            # STB-specific train-time RGB color jitter
            # (dataset_STB.py:108-115, color_factor 0.2): per-channel
            # uniform scales applied after the geometric augment, before
            # normalization. item["img_rgb"] is (3, S, S) in [0, 1].
            c = 0.2
            scale = aug_rng.uniform(1.0 - c, 1.0 + c, 3)
            item["img_rgb"] = np.clip(
                item["img_rgb"] * scale[:, None, None], 0.0, 1.0
            ).astype(np.float32)
        return item

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                drop_last: bool = False, augment: bool = False,
                aug_para: Tuple[float, float, float] = (10.0, 0.2, 180.0),
                ) -> Iterator[Dict[str, np.ndarray]]:
        yield from _iter_batches(self, batch_size, shuffle, seed, drop_last,
                                 augment, aug_para)
