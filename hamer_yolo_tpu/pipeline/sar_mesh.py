"""Full SAR mesh pipeline: 799-point uvd decode -> absolute xyz.

Parity with EstimateRGB.run + post_processing (reference
rootnet/Model_RGB.py:428-570):
- SAR outputs (B, 799, 3) with uv in [-1, 1] and z in depth-box units;
- z_abs = z * depth_box + root_depth (post_processing:441);
- uv_crop = (uv + 0.5) * input_size (:443 — note the reference adds 0.5 to
  the [-1, 1]-normalized value, an asymmetric mapping kept verbatim);
- crop->full-image via the inverse patch affine; optional lr-deflip;
- xyz = uvd2xyz(uvd_full, K);
- root depth from RootNet k-value OR sampled from a real depth image at
  the predicted root uv (grid_sample path, :505-520).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.geometry.affine import bilinear_sample, gen_trans_from_patch, invert_affine
from hamer_yolo_tpu.geometry.camera import calculate_k_value, uvd2xyz
from hamer_yolo_tpu.geometry.boxes import process_bbox
from hamer_yolo_tpu.models.sar import SarConfig, rootnet_depth, sar_backbone_forward, sar_head_forward
from hamer_yolo_tpu.pipeline.preprocess import sar_patch

NUM_VERTS = 778


def decode_sar_uvd(
    coords: jax.Array,
    root_depth: jax.Array,
    bb2img: jax.Array,
    img_width: jax.Array,
    do_flip: jax.Array,
    depth_box: float = 0.3,
    input_size: int = 256,
) -> jax.Array:
    """(B, 799, 3) normalized uvd -> full-image (B, 799, 3) [u px, v px, z m]."""
    z = coords[..., 2] * depth_box + root_depth[:, None]
    uv_crop = (coords[..., :2] + 0.5) * input_size
    L = bb2img[:, :, :2]  # (B, 2, 2)
    t = bb2img[:, :, 2]
    uv_full = jnp.einsum("bij,bnj->bni", L, uv_crop) + t[:, None, :]
    u = jnp.where(
        jnp.reshape(do_flip, (-1, 1)) > 0.5,
        jnp.reshape(img_width, (-1, 1)) - uv_full[..., 0] - 1.0,
        uv_full[..., 0],
    )
    return jnp.stack([u, uv_full[..., 1], z], axis=-1)


def sample_depth_at_root(
    depth_image: jax.Array,
    root_uv: jax.Array,
) -> jax.Array:
    """Bilinear depth lookup at the predicted root pixel (grid_sample path).

    depth_image: (H, W) meters; root_uv: (B, 2) pixels -> (B,) depth.
    """
    return jax.vmap(
        lambda uv: bilinear_sample(depth_image[..., None], uv[0], uv[1])[0]
    )(root_uv)


def sar_full_mesh(
    sar_params,
    image_bgr: jax.Array,
    bbox_xyxy: jax.Array,
    orig_hw: jax.Array,
    K: jax.Array,
    cfg: SarConfig = SarConfig(),
    do_flip: Optional[jax.Array] = None,
    depth_image: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """EstimateRGB.run equivalent over hand slots.

    image_bgr: (H, W, 3); bbox_xyxy: (S, 4); returns mesh/pose uvd + xyz.
    """
    S = bbox_xyxy.shape[0]
    if do_flip is None:
        do_flip = jnp.zeros((S,))
    xywh = jnp.stack(
        [bbox_xyxy[:, 0], bbox_xyxy[:, 1],
         bbox_xyxy[:, 2] - bbox_xyxy[:, 0], bbox_xyxy[:, 3] - bbox_xyxy[:, 1]],
        axis=-1,
    )
    pb, _ = process_bbox(xywh, orig_hw[1], orig_hw[0],
                         (float(cfg.input_size), float(cfg.input_size)), 1.5)
    patches = jax.vmap(lambda bb: sar_patch(image_bgr, bb, cfg.input_size))(pb)

    feats = sar_backbone_forward(sar_params, patches, cfg)
    coords = sar_head_forward(sar_params["head"], feats, cfg)  # (S, 799, 3)

    # patch affine (scale 1, rot 0) and its inverse, per slot
    def mk_trans(bb):
        return gen_trans_from_patch(
            bb[0] + bb[2] / 2.0, bb[1] + bb[3] / 2.0, bb[2], bb[3],
            float(cfg.input_size), float(cfg.input_size),
        )

    img2bb = jax.vmap(mk_trans)(pb)
    bb2img = invert_affine(img2bb)

    if depth_image is not None:
        root_uv_crop = (coords[:, NUM_VERTS, :2] + 0.5) * cfg.input_size
        uv1 = jnp.concatenate([root_uv_crop, jnp.ones((S, 1))], axis=-1)
        root_uv = jnp.einsum("bij,bj->bi", bb2img, uv1)
        root_depth = sample_depth_at_root(depth_image, root_uv)
    else:
        k_val = calculate_k_value(pb[:, 2:4], K[0, 0], K[1, 1],
                                  real_area=cfg.bbox_real[0] * cfg.bbox_real[1])
        root_depth = rootnet_depth(sar_params, feats, k_val)

    uvd_full = decode_sar_uvd(coords, root_depth, bb2img, orig_hw[1], do_flip,
                              cfg.bbox_real[0], cfg.input_size)
    xyz = uvd2xyz(uvd_full, K)
    return {
        "mesh_uvd": uvd_full[:, :NUM_VERTS],
        "pose_uvd": uvd_full[:, NUM_VERTS:],
        "mesh_xyz": xyz[:, :NUM_VERTS],
        "pose_xyz": xyz[:, NUM_VERTS:],
        "root_depth": root_depth,
    }


def bbox_from_mask(mask, target_val: int = 3):
    """Mask-driven bbox (reference get_bbox_from_npy, infer.py:1040-1072).

    mask: (H, W) numpy array; returns [x1, y1, x2, y2] or None.
    """
    import numpy as np

    rows, cols = np.where(np.asarray(mask) == target_val)
    if len(rows) == 0:
        return None
    return [float(cols.min()), float(rows.min()), float(cols.max()), float(rows.max())]
