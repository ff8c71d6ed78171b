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
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

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

    def load(self, idx: int) -> Dict[str, np.ndarray]:
        """One sample in the trainer's batch schema (without batch dim)."""
        import cv2

        cfg = self.cfg
        s = self.samples[idx]
        rgb = cv2.imread(s.rgb_path)
        if rgb is None:
            raise IOError(f"cannot read {s.rgb_path}")
        rgb = rgb.astype(np.float32)
        depth = read_depth(s.depth_path, cfg.depth_fmt)
        cam = cfg.cam_para
        cube = np.asarray(cfg.cube, np.float32)
        S = cfg.img_size

        joints = None
        if s.joints_path is not None:
            joints = np.loadtxt(s.joints_path, dtype=np.float32)
            joints = joints.reshape(-1, 3)[: cfg.joint_num]
        if joints is not None:
            # DexYCB eval path: center = joint mean (loader.py:1130-1132)
            center_xyz = joints.mean(0)
            center_uvd = joint_3d_to_img(center_xyz, cam)
        else:
            if s.bbox_path is None:
                raise ValueError(f"{s.stem}: no joints and no bbox")
            v = np.loadtxt(s.bbox_path).reshape(-1)[:4]
            H, W = depth.shape
            bbox = [v[0] * W - v[2] * W / 2, v[1] * H - v[3] * H / 2,
                    v[2] * W, v[3] * H]
            center_uvd = get_center_from_bbx(depth, bbox, cfg.com_upper,
                                             cfg.com_lower)
            center_xyz = joint_img_to_3d(center_uvd, cam)

        depth_crop, M = crop_depth(depth, center_uvd, cube, (S, S), cam)
        rgb_crop, _ = crop_rgb(rgb, center_uvd, cube, (S, S), cam)
        img_d = normalize_img(depth_crop, center_xyz, cube)
        com3d = joint_img_to_3d(center_uvd, cam)

        if joints is not None:
            xyz_gt = (joints - center_xyz) / (cube[2] / 2.0)
            # loader.py:1170-1173: project back through M, normalize
            uvd = _transform_points_2d(
                joint_3d_to_img(xyz_gt * (cube[0] / 2.0) + com3d, cam), M)
            uvd[:, :2] = uvd[:, :2] / (S / 2.0) - 1.0
            uvd[:, 2] = (uvd[:, 2] - com3d[2]) / (cube[0] / 2.0)
        else:
            xyz_gt = np.zeros((cfg.joint_num, 3), np.float32)
            uvd = np.zeros((cfg.joint_num, 3), np.float32)

        pcl = get_pcl(img_d, com3d, cube, M, cam)
        pcl_sample = sample_pcl(pcl, cfg.sample_num)

        return {
            "img_rgb": rgb_crop.transpose(2, 0, 1) / 255.0,  # (3, S, S)
            "img": img_d[None].astype(np.float32),           # (1, S, S)
            "pcl": pcl_sample.astype(np.float32),
            "uvd_gt": uvd.astype(np.float32),
            "xyz_gt": xyz_gt.astype(np.float32),
            "center": com3d.astype(np.float32),
            "M": M.astype(np.float32),
            "cube": cube,
            "cam_para": np.asarray(cam, np.float32),
        }

    def batches(self, batch_size: int, shuffle: bool = True,
                seed: int = 0, drop_last: bool = False
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Epoch of stacked fixed-shape batches; short batches wrap
        (fixed shapes keep the jitted train step at one compile)."""
        order = np.arange(len(self.samples))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n = len(order)
        steps = n // batch_size if drop_last else math.ceil(n / batch_size)
        for b in range(max(steps, 0)):
            idx = [order[(b * batch_size + i) % n] for i in range(batch_size)]
            items = [self.load(i) for i in idx]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
