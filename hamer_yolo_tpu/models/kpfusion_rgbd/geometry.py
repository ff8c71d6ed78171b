"""KeypointFusion normalized-coordinate geometry + dense offset decode.

Pure-JAX ports of:
- loader.uvd_nl2xyznl_tensor / xyz_nl2uvdnl_tensor / uvd_nl2xyz_tensor
  (dataloader/processing_depth.py:775-930): normalized crop-space uvd
  ([-1,1] uv over the crop, depth normalized by center/cube) <-> normalized
  metric xyz (centered at the crop centroid, scaled by cube/2), through
  the crop matrix M and the pinhole intrinsics.
- loader.img2pcl_index (:1016): per point-cloud point, the top-k nearest
  image pixels in normalized xyz plus inverse-distance closeness weights.
- loader.img2anchor_dis (:870): the Geometry Adjacency Map 1/(gamma*d^2+1)
  between each joint and each image pixel.
- model.model joint2offset (:443), offset2joint_weight (:470),
  pcl_joint2offset (:506): dense offset/heatmap/weight map encode/decode.
- GFM.joint2heatmap (util/generateFeature.py:584): gaussian heatmaps.

Conventions: tensors stay in the reference's channel layouts at the
interfaces (offset maps are (B, 5J, H, W)-equivalent NHWC (B, H, W, 5J)),
coordinates are (u, v, d) normalized to [-1, 1].
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def points_img_to_3d(uvd: jax.Array, paras: jax.Array, flip: float = 1.0) -> jax.Array:
    """(B, N, 3) pixel uvd (z in mm) -> metric xyz (processing_depth.py:322)."""
    fx, fy, fu, fv = paras[:, 0:1], paras[:, 1:2], paras[:, 2:3], paras[:, 3:4]
    x = (uvd[..., 0] - fu) * uvd[..., 2] / fx
    y = flip * (uvd[..., 1] - fv) * uvd[..., 2] / fy
    return jnp.stack([x, y, uvd[..., 2]], axis=-1)


def points_3d_to_img(xyz: jax.Array, paras: jax.Array, flip: float = 1.0) -> jax.Array:
    """(B, N, 3) metric xyz -> pixel uvd (processing_depth.py:334)."""
    fx, fy, fu, fv = paras[:, 0:1], paras[:, 1:2], paras[:, 2:3], paras[:, 3:4]
    u = xyz[..., 0] * fx / (xyz[..., 2] + 1e-8) + fu
    v = flip * xyz[..., 1] * fy / xyz[..., 2] + fv
    return jnp.stack([u, v, xyz[..., 2]], axis=-1)


def _trans_points(points: jax.Array, M: jax.Array) -> jax.Array:
    """Apply the 3x3 crop matrix to uv (get_trans_points)."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    homo = jnp.concatenate([points[..., 0:2], ones], axis=-1)
    xy = jnp.einsum("bij,bnj->bni", M, homo)[..., 0:2]
    return jnp.concatenate([xy, points[..., 2:]], axis=-1)


def uvd_nl2xyznl(uvd: jax.Array, center: jax.Array, M: jax.Array,
                 cube: jax.Array, paras: jax.Array, img_size: int = 128,
                 flip: float = 1.0, normalize: bool = True) -> jax.Array:
    """(B, N, 3) normalized crop uvd -> normalized xyz.

    processing_depth.py:854-869 (uvd_nl2xyznl_tensor; normalize=False gives
    uvd_nl2xyz_tensor)."""
    B = uvd.shape[0]
    cube_b = cube.reshape(B, 1, 3)
    center_b = center.reshape(B, 1, 3)
    M_inv = jnp.linalg.inv(M)
    uv_un = (uvd[..., 0:2] + 1.0) * (img_size / 2.0)
    d_un = uvd[..., 2:] * (cube_b[..., 2:] / 2.0) + center_b[..., 2:]
    uvd_img = _trans_points(jnp.concatenate([uv_un, d_un], -1), M_inv)
    xyz = points_img_to_3d(uvd_img, paras, flip)
    if not normalize:
        return xyz
    return (xyz - center_b) / (cube_b / 2.0)


def xyz_nl2uvdnl(xyz: jax.Array, center: jax.Array, M: jax.Array,
                 cube: jax.Array, paras: jax.Array, img_size: int = 128,
                 flip: float = 1.0) -> jax.Array:
    """(B, N, 3) normalized xyz -> normalized crop uvd
    (processing_depth.py:900-915)."""
    B = xyz.shape[0]
    cube_b = cube.reshape(B, 1, 3)
    center_b = center.reshape(B, 1, 3)
    xyz_un = xyz * cube_b / 2.0 + center_b
    uvd_img = points_3d_to_img(xyz_un, paras, flip)
    uvd_crop = _trans_points(uvd_img, M)
    uv = uvd_crop[..., 0:2] / img_size * 2.0 - 1.0
    d = (uvd_crop[..., 2:] - center_b[..., 2:]) / (cube_b[..., 2:] / 2.0)
    return jnp.concatenate([uv, d], axis=-1)


def _pixel_uvd(img: jax.Array) -> jax.Array:
    """(B, H, W, 1) normalized depth crop -> (B, H*W, 3) pixel uvd grid.

    Mirrors the reference's mesh construction (mesh_y is the X axis —
    the reference stacks (mesh_y, mesh_x), model.py:435)."""
    B, H, W, _ = img.shape
    ax = 2.0 * (jnp.arange(W, dtype=jnp.float32) + 0.5) / W - 1.0
    gx = jnp.broadcast_to(ax[None, :], (H, W))       # varies along W
    gy = jnp.broadcast_to(ax[:, None], (H, W))       # varies along H
    grid = jnp.stack([gx, gy], axis=-1)[None].repeat(B, axis=0)
    return jnp.concatenate([grid.reshape(B, H * W, 2),
                            img.reshape(B, H * W, 1)], axis=-1)


def img2pcl_index(pcl: jax.Array, img: jax.Array, center, M, cube, paras,
                  img_size: int = 128, select_num: int = 4,
                  flip: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """(closeness (B, N, k), index (B, N, k)) — processing_depth.py:1016."""
    img_xyz = uvd_nl2xyznl(_pixel_uvd(img), center, M, cube, paras,
                           img_size, flip)
    d2 = jnp.sum((pcl[:, :, None, :] - img_xyz[:, None, :, :]) ** 2, axis=-1)
    neg_val, idx = jax.lax.top_k(-d2, select_num)
    closeness = 1.0 / (-neg_val + 1e-8)
    closeness = closeness / (closeness.sum(-1, keepdims=True) + 1e-8)
    return closeness, idx


def img2anchor_dis(joint_uvd: jax.Array, img: jax.Array, center, M, cube,
                   paras, img_size: int = 128, gamma: float = 10.0,
                   flip: float = 1.0) -> jax.Array:
    """GAM (B, J, H, W) — processing_depth.py:870-899."""
    B, J, _ = joint_uvd.shape
    H, W = img.shape[1], img.shape[2]
    joint_xyz = uvd_nl2xyznl(joint_uvd, center, M, cube, paras, img_size, flip)
    img_xyz = uvd_nl2xyznl(_pixel_uvd(img), center, M, cube, paras,
                           img_size, flip)
    d2 = jnp.sum((img_xyz[:, None, :, :] - joint_xyz[:, :, None, :]) ** 2, -1)
    return (1.0 / (gamma * d2 + 1.0)).reshape(B, J, H, W)


# --- dense offset maps (model/model.py) -------------------------------------

def _mesh_coords(B: int, feature_size: int) -> jax.Array:
    ax = 2.0 * (jnp.arange(feature_size, dtype=jnp.float32) + 0.5) / feature_size - 1.0
    gx = jnp.broadcast_to(ax[None, :], (feature_size, feature_size))
    gy = jnp.broadcast_to(ax[:, None], (feature_size, feature_size))
    return jnp.broadcast_to(jnp.stack([gx, gy], axis=0)[None],
                            (B, 2, feature_size, feature_size))


def _resize_nearest_torch(x_nchw: jax.Array, fs: int) -> jax.Array:
    """F.interpolate(mode='nearest') parity: index = floor(i * H / fs)."""
    B, C, H, W = x_nchw.shape
    iy = jnp.floor(jnp.arange(fs) * (H / fs)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(fs) * (W / fs)).astype(jnp.int32)
    return x_nchw[:, :, iy][:, :, :, ix]


def offset2joint_weight(offset_nchw: jax.Array, depth_nchw: jax.Array,
                        kernel_size: float = 0.8) -> jax.Array:
    """(B, 5J, fs, fs) offset maps + (B, 1, H, W) depth -> (B, J, 3) joints
    (model/model.py:470-505). Channel-first like the reference."""
    B, C, fs, _ = offset_nchw.shape
    J = C // 5
    if depth_nchw.shape[-1] != fs:
        depth_nchw = _resize_nearest_torch(depth_nchw, fs)
    offset_unit = offset_nchw[:, :J * 3]
    heatmap = offset_nchw[:, J * 3:J * 4]
    weight = offset_nchw[:, J * 4:]

    coords = _mesh_coords(B, fs)
    coords = jnp.concatenate([coords, depth_nchw], axis=1)          # (B,3,fs,fs)
    coords = jnp.tile(coords, (1, J, 1, 1)).reshape(B, J, 3, -1)

    mask = (depth_nchw < 0.99).astype(offset_nchw.dtype)
    offset_mask = (offset_unit * mask).reshape(B, J, 3, -1)
    heatmap_mask = (heatmap * mask).reshape(B, J, -1)
    weight_mask = jnp.where(depth_nchw > 0.99, -1e8, weight)
    normal_weight = jax.nn.softmax(weight_mask.reshape(B, J, -1), axis=-1)
    dist = kernel_size - heatmap_mask * kernel_size
    joint = jnp.sum(
        (offset_mask * dist[:, :, None, :] + coords) * normal_weight[:, :, None, :],
        axis=-1)
    return joint


def joint2offset(joint: jax.Array, img_nchw: jax.Array, kernel_size: float,
                 feature_size: int) -> jax.Array:
    """(B, J, 3) + (B, 1, H, W) -> (B, 4J, fs, fs) offset maps
    (model/model.py:443-468)."""
    B, J, _ = joint.shape
    img = _resize_nearest_torch(img_nchw, feature_size)
    coords = jnp.concatenate([_mesh_coords(B, feature_size), img], axis=1)
    coords = jnp.tile(coords, (1, J, 1, 1)).reshape(B, J, 3, feature_size,
                                                    feature_size)
    jf = joint.reshape(B, J, 3, 1, 1)
    offset = jf - coords
    dist = jnp.sqrt(jnp.sum(offset ** 2, axis=2))
    offset_norm = offset / dist[:, :, None]
    heatmap = (kernel_size - dist) / kernel_size
    mask = (heatmap >= 0).astype(img.dtype) * \
        (img < 0.99).astype(img.dtype).reshape(B, 1, feature_size, feature_size)
    offset_norm_mask = (offset_norm * mask[:, :, None]).reshape(
        B, J * 3, feature_size, feature_size)
    return jnp.concatenate([offset_norm_mask, heatmap * mask], axis=1)


def pcl_joint2offset(joint: jax.Array, pcl: jax.Array,
                     kernel_size: float = 0.8) -> jax.Array:
    """(B, J, 3), (B, N, 3) -> (B, N, 4J) per-point offsets+distance
    (model/model.py:506-530)."""
    offset = joint[:, :, None, :] - pcl[:, None, :, :]   # (B, J, N, 3)
    dis = jnp.sqrt(jnp.sum(offset ** 2, axis=-1))
    offset_norm = offset / (dis[..., None] + 1e-8)
    B, J, N, _ = offset.shape
    offset_norm = jnp.transpose(offset_norm, (0, 1, 3, 2)).reshape(B, J * 3, N)
    heatmap = (kernel_size - dis) / kernel_size
    mask = (heatmap >= 0).astype(joint.dtype) * \
        (pcl[:, :, 2] < 0.99).astype(joint.dtype)[:, None, :]
    out = jnp.concatenate([offset_norm * jnp.repeat(mask, 3, axis=1),
                           heatmap * mask], axis=1)      # (B, 4J, N)
    return jnp.transpose(out, (0, 2, 1))


def joint2heatmap(joint: jax.Array, std: float, heatmap_size: int,
                  sigma: float = 1.5) -> jax.Array:
    """(B, J, >=2) normalized joints -> (B, J, hs, hs) gaussians
    (util/generateFeature.py:584-601)."""
    B, J = joint.shape[0], joint.shape[1]
    mesh = jnp.arange(heatmap_size, dtype=jnp.float32) + 0.5
    # the reference's xx varies along the last axis for mesh_x
    mx = jnp.broadcast_to(mesh[None, :], (heatmap_size, heatmap_size))
    my = jnp.broadcast_to(mesh[:, None], (heatmap_size, heatmap_size))
    jx = ((joint[..., 0] + 1.0) / 2.0 * heatmap_size)[:, :, None, None]
    jy = ((joint[..., 1] + 1.0) / 2.0 * heatmap_size)[:, :, None, None]
    return jnp.exp(-(((mx - jx) / std) ** 2 + ((my - jy) / std) ** 2)
                   / (2.0 * sigma ** 2))
