"""Model_RGBD-equivalent runtime: host preprocessing + jitted KPFusion.

Reproduces the reference's evaluation path (Model_RGBD.estimate_pose_RGBD,
Model_RGBD.py:68-205):

1. hand center of mass from the depth pixels inside the bbox
   (get_center_from_bbx :287-322);
2. metric-cube crops of RGB (Crop_Image_deep_pp_RGB :540-598) and depth
   (Crop_Image_deep_pp :467-538, z-thresholded, INTER_NEAREST resize,
   centered zero-padded canvas, composed off.scale.trans matrix M);
3. depth normalization to [-1, 1] around the center (normalize_img :435);
4. point cloud from the valid crop pixels through M^-1 and the pinhole,
   normalized by the cube, randomly sampled to ``sample_num`` points
   (getpcl/process_depth :351-398);
5. the jitted 2-stage KPFusion forward;
6. outputs: final-stage joints mapped back — uvd in ORIGINAL image pixels
   (through M^-1) and metric xyz in meters with the reference's
   MANO->HO3D reorder and [1, -1, -1]/1000 flip (:163-177).

Host steps are numpy (dynamic crop sizes); the model runs as one XLA
program with static shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.kpfusion_rgbd import geometry as G
from hamer_yolo_tpu.models.kpfusion_rgbd.model import (
    KPFusionConfig, kpfusion_forward,
)

MANO2HO3D = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
                      20, 16, 17, 19, 18], np.int32)


def get_center_from_bbx(depth: np.ndarray, bbx_xywh, upper: float = 1500.0,
                        lower: float = 171.0) -> np.ndarray:
    """Center of mass (u, v, z) of in-range depth inside the bbox."""
    centers = np.array([0.0, 0.0, 300.0])
    x_min, y_min = int(bbx_xywh[0]), int(bbx_xywh[1])
    x_max = int(bbx_xywh[0] + bbx_xywh[2])
    y_max = int(bbx_xywh[1] + bbx_xywh[3])
    img = depth[y_min:y_max, x_min:x_max]
    flag = np.logical_and(img <= upper, img >= lower)
    x = np.linspace(0, img.shape[1], img.shape[1])
    y = np.linspace(0, img.shape[0], img.shape[0])
    xv, yv = np.meshgrid(x, y)
    if flag.any():
        centers[0] = np.mean(xv[flag])
        centers[1] = np.mean(yv[flag])
        centers[2] = np.mean(img[flag])
        if centers[2] <= 0:
            centers[2] = 300.0
    centers[0] += bbx_xywh[0]
    centers[1] += bbx_xywh[1]
    return centers


def com_to_bounds(com, size, paras) -> Tuple[int, int, int, int, float, float]:
    fx, fy, _, _ = paras
    zstart = com[2] - size[2] / 2.0
    zend = com[2] + size[2] / 2.0
    xstart = int(np.floor((com[0] * com[2] / fx - size[0] / 2.0) / com[2] * fx + 0.5))
    xend = int(np.floor((com[0] * com[2] / fx + size[0] / 2.0) / com[2] * fx + 0.5))
    ystart = int(np.floor((com[1] * com[2] / fy - size[1] / 2.0) / com[2] * fy + 0.5))
    yend = int(np.floor((com[1] * com[2] / fy + size[1] / 2.0) / com[2] * fy + 0.5))
    return xstart, xend, ystart, yend, zstart, zend


def get_crop(depth: np.ndarray, xstart, xend, ystart, yend, zstart, zend,
             thresh_z: bool = True, background: float = 0.0) -> np.ndarray:
    if depth.ndim == 2:
        cropped = depth[max(ystart, 0):min(yend, depth.shape[0]),
                        max(xstart, 0):min(xend, depth.shape[1])].copy()
        cropped = np.pad(cropped, ((abs(ystart) - max(ystart, 0),
                                    abs(yend) - min(yend, depth.shape[0])),
                                   (abs(xstart) - max(xstart, 0),
                                    abs(xend) - min(xend, depth.shape[1]))),
                         mode="constant", constant_values=background)
    else:
        cropped = depth[max(ystart, 0):min(yend, depth.shape[0]),
                        max(xstart, 0):min(xend, depth.shape[1]), :].copy()
        cropped = np.pad(cropped, ((abs(ystart) - max(ystart, 0),
                                    abs(yend) - min(yend, depth.shape[0])),
                                   (abs(xstart) - max(xstart, 0),
                                    abs(xend) - min(xend, depth.shape[1])),
                                   (0, 0)),
                         mode="constant", constant_values=background)
    if thresh_z:
        msk1 = np.logical_and(cropped < zstart, cropped != 0)
        msk2 = np.logical_and(cropped > zend, cropped != 0)
        cropped[msk1] = zstart
        cropped[msk2] = 0.0
    return cropped


def _crop_common(img: np.ndarray, com, size, dsize, paras,
                 thresh_z: bool) -> Tuple[np.ndarray, np.ndarray]:
    import cv2

    xstart, xend, ystart, yend, zstart, zend = com_to_bounds(com, size, paras)
    cropped = get_crop(img, xstart, xend, ystart, yend, zstart, zend, thresh_z)
    wb, hb = (xend - xstart), (yend - ystart)
    if wb > hb:
        sz = (dsize[0], int(hb * dsize[0] / wb))
    else:
        sz = (int(wb * dsize[1] / hb), dsize[1])
    trans = np.eye(3)
    trans[0, 2] = -xstart
    trans[1, 2] = -ystart
    if cropped.shape[0] > cropped.shape[1]:
        scale = np.eye(3) * sz[1] / float(cropped.shape[0])
    else:
        scale = np.eye(3) * sz[0] / float(cropped.shape[1])
    scale[2, 2] = 1
    rz = cv2.resize(cropped, sz, interpolation=cv2.INTER_NEAREST)
    shape = dsize if img.ndim == 2 else (dsize[0], dsize[1], 3)
    ret = np.zeros(shape, np.float32)
    xs = int(np.floor(dsize[0] / 2.0 - rz.shape[1] / 2.0))
    ys = int(np.floor(dsize[1] / 2.0 - rz.shape[0] / 2.0))
    ret[ys:ys + rz.shape[0], xs:xs + rz.shape[1]] = rz
    off = np.eye(3)
    off[0, 2] = xs
    off[1, 2] = ys
    return ret, off @ scale @ trans


def crop_depth(depth, com, cube, dsize, paras):
    return _crop_common(depth, com, cube, dsize, paras, thresh_z=True)


def crop_rgb(rgb, com, cube, dsize, paras):
    return _crop_common(rgb, com, cube, dsize, paras, thresh_z=False)


def normalize_img(img: np.ndarray, com, cube) -> np.ndarray:
    premax = img.max()
    out = img.copy()
    hi = com[2] + cube[2] / 2.0
    lo = com[2] - cube[2] / 2.0
    out[out == premax] = hi
    out[out == 0] = hi
    out[out >= hi] = hi
    out[out <= lo] = lo
    return (out - com[2]) / (cube[2] / 2.0)


def joint_img_to_3d(uvd: np.ndarray, paras, flip: float = 1.0) -> np.ndarray:
    fx, fy, fu, fv = paras
    ret = np.zeros_like(uvd, np.float32)
    ret[..., 0] = (uvd[..., 0] - fu) * uvd[..., 2] / fx
    ret[..., 1] = flip * (uvd[..., 1] - fv) * uvd[..., 2] / fy
    ret[..., 2] = uvd[..., 2]
    return ret


def depth_to_pcl(dpt: np.ndarray, T: np.ndarray, paras,
                 flip: float = 1.0) -> np.ndarray:
    """Valid crop pixels -> metric points (processing_depth.depthToPCL)."""
    fx, fy, fu, fv = paras
    pts = np.asarray(np.where(~np.isclose(dpt, 0.0))).transpose()
    pts = np.concatenate([pts[:, [1, 0]] + 0.5,
                          np.ones((pts.shape[0], 1), "float32")], axis=1)
    pts = (np.linalg.inv(np.asarray(T)) @ pts.T).T
    pts = (pts[:, 0:2] / pts[:, 2][:, None]).reshape((pts.shape[0], 2))
    depth = dpt[~np.isclose(dpt, 0.0)]
    row = (pts[:, 0] - fu) / fx * depth
    col = flip * (pts[:, 1] - fv) / fy * depth
    return np.column_stack((row, col, depth))


def get_pcl(imgD: np.ndarray, com3D, cube, M, paras) -> np.ndarray:
    mask = np.isclose(imgD, 1)
    dpt = imgD * cube[2] / 2.0 + com3D[2]
    dpt[mask] = 0
    pcl = depth_to_pcl(dpt, M, paras) - com3D
    return pcl / np.tile(np.asarray(cube) / 2.0, (pcl.shape[0], 1))


def sample_pcl(pcl: np.ndarray, sample_num: int) -> np.ndarray:
    """EXACT reference sampling (process_depth, Model_RGBD.py:376-389):
    uses the GLOBAL numpy RNG with the same call sequence, so seeding
    np.random identically reproduces the reference's point subset."""
    n = pcl.shape[0]
    if n == 0:
        return np.zeros((sample_num, 3), np.float32)
    pcl_index = np.arange(n)
    if n < sample_num:
        tmp = sample_num // n
        index_temp = pcl_index.repeat(tmp)
        pcl_index = np.append(
            index_temp,
            np.random.choice(pcl_index, size=sample_num % n, replace=False))
    select = np.random.choice(pcl_index, sample_num, replace=False)
    return np.clip(pcl[select], -1, 1).astype(np.float32)


@dataclass
class RGBDRuntime:
    """Host driver: holds converted params + the jitted model."""

    params: Any
    cfg: KPFusionConfig = KPFusionConfig()
    cam_para: Tuple[float, float, float, float] = (906.96, 906.79, 956.75, 547.23)
    cube: Tuple[float, float, float] = (250.0, 250.0, 250.0)

    def __post_init__(self):
        cfg = self.cfg

        @jax.jit
        def fn(params, img_rgb, img, pcl, center, M, cube, cam):
            return kpfusion_forward(params, img_rgb, img, pcl, center, M,
                                    cube, cam, cfg)

        self._fn = fn

    def estimate_pose_rgbd(self, img_rgb: np.ndarray, img_d: np.ndarray,
                           bbox_xywh) -> Dict[str, np.ndarray]:
        """img_rgb (H, W, 3) uint8/float, img_d (H, W) depth in mm,
        bbox [x, y, w, h] -> joints in original-image uvd + metric xyz."""
        cfg = self.cfg
        S = cfg.img_size
        center = get_center_from_bbx(img_d, bbox_xywh)
        crop_rgb_img, _ = crop_rgb(img_rgb.astype(np.float32), center,
                                   self.cube, (S, S), self.cam_para)
        crop_rgb_img = crop_rgb_img / 255.0
        depth_crop, M = crop_depth(img_d.astype(np.float32), center,
                                   self.cube, (S, S), self.cam_para)
        imgD = normalize_img(depth_crop, center, self.cube)
        com3D = joint_img_to_3d(np.asarray(center, np.float32), self.cam_para)
        pcl = sample_pcl(get_pcl(imgD, com3D, self.cube, M, self.cam_para),
                         cfg.sample_num)

        cube_a = np.asarray(self.cube, np.float32)[None]
        cam_a = np.asarray(self.cam_para, np.float32)[None]
        out = self._fn(
            self.params,
            jnp.asarray(crop_rgb_img.transpose(2, 0, 1)[None]),
            jnp.asarray(imgD[None, None]),
            jnp.asarray(pcl[None]),
            jnp.asarray(com3D[None]),
            jnp.asarray(M[None].astype(np.float32)),
            jnp.asarray(cube_a), jnp.asarray(cam_a))

        joint_xyz = np.asarray(out["joints"])            # (1, J, 3) normalized
        # world xyz in meters, HO3D order, axis flip (Model_RGBD.py:163-166)
        xyz_world = joint_xyz * cube_a[:, None] / 2.0 + com3D[None, None]
        xyz_world = xyz_world[:, MANO2HO3D] * np.array([1, -1, -1]) / 1000.0

        # uvd back to original image pixels (Model_RGBD.py:170-179)
        uvd = np.asarray(G.xyz_nl2uvdnl(
            out["joints"], jnp.asarray(com3D[None]),
            jnp.asarray(M[None].astype(np.float32)), jnp.asarray(cube_a),
            jnp.asarray(cam_a), cfg.img_size))[0]
        uvd_px = uvd.copy()
        uvd_px[:, 0:2] = (uvd[:, 0:2] + 1) * (S / 2.0)
        uvd_px[:, 2] = uvd[:, 2] * cube_a[0, 2] / 2.0 + com3D[2]
        Minv = np.linalg.inv(M)
        homo = np.concatenate([uvd_px[:, :2],
                               np.ones((uvd_px.shape[0], 1))], axis=1)
        uv_full = (Minv @ homo.T).T
        uvd_full = np.concatenate(
            [uv_full[:, :2] / uv_full[:, 2:], uvd_px[:, 2:]], axis=1)

        return {
            "joint_uvd_full": uvd_full.astype(np.float32),
            "joint_xyz_world": xyz_world[0].astype(np.float32),
            "crop_rgb": crop_rgb_img,
            "crop_depth": imgD,
            "M": M,
            "center": center,
        }
