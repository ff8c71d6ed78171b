"""Device-side fused preprocessing: letterbox, HaMeR crops, SAR patches.

The reference does all preprocessing on the CPU with cv2 (letterbox at
datasets.py:999, HaMeR crops at infer.py:217-238, SAR patches at
preprocessing.py:39) and re-uploads each result. Here the ORIGINAL frame is
uploaded once (padded to a static bucket shape) and every view the models
need — the 640x640 letterboxed detector input, the per-hand 256x256 HaMeR
crops, the 256x256 SAR depth patch — is produced on-device by affine
bilinear gathers inside the same XLA program. Dynamic box geometry stays
traced (affine matrices are data), while all output shapes are static.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.geometry.affine import (
    bilinear_sample, gen_trans_from_patch, invert_affine,
    letterbox_geometry_traced,
)
from hamer_yolo_tpu.ops import warp_matmul

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# Warp backend: "matmul" routes every axis-aligned resample through the
# MXU (ops/warp_matmul.py); "gather" uses the XLA gather formulation.
WARP_IMPL = "matmul"


def device_letterbox(
    img: jax.Array,
    orig_hw: jax.Array,
    out_size: int = 640,
    pad_value: float = 114.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Letterbox with dynamic source size on a static canvas.

    img: (Hb, Wb, 3) raw frame padded (bottom/right) to the bucket shape;
    orig_hw: (2,) actual (h, w). Returns (letterboxed (S, S, 3),
    gain, pad (dw, dh)) with cv2-EXACT geometry: the reference's rect
    letterbox (auto=True, mod-32 pad, round(d-0.1) quirks) top-left
    aligned in the static square canvas — content pixels land on the
    same anchor-grid cells as the reference's rect canvas, and
    (gain, pad) are exactly what scale_coords derives there.
    """
    if WARP_IMPL == "matmul":
        return warp_matmul.letterbox_matmul(img, orig_hw, out_size, pad_value)
    h, w = orig_hw[0], orig_hw[1]
    r, new_w, new_h, left, top, gain, pad = letterbox_geometry_traced(
        h, w, out_size)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_size, dtype=jnp.float32),
        jnp.arange(out_size, dtype=jnp.float32),
        indexing="ij",
    )
    # cv2.resize sampling to the ROUNDED target size: src = (dst+0.5)*scale-0.5,
    # clamped to the valid edge (resize replicates at borders; also keeps
    # reads out of the bucket padding).
    src_x = jnp.clip((xs - left + 0.5) * (w / new_w) - 0.5, 0.0, w - 1.0)
    src_y = jnp.clip((ys - top + 0.5) * (h / new_h) - 0.5, 0.0, h - 1.0)
    out = bilinear_sample(img, src_x, src_y, border_value=pad_value)
    # cv2.resize emits uint8 (the reference letterboxes the raw frame);
    # round to the integer grid so fixed-point quantization cannot drift.
    out = jnp.round(out)
    # Padding region must be exactly pad_value (not blended with edges)
    inside = (
        (xs >= left) & (xs < left + new_w)
        & (ys >= top) & (ys < top + new_h)
    )
    out = jnp.where(inside[..., None], out, pad_value)
    return out, gain, pad


def normalize_imagenet(patch_rgb01: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, patch_rgb01.dtype)
    std = jnp.asarray(IMAGENET_STD, patch_rgb01.dtype)
    return (patch_rgb01 - mean) / std


def crop_square_patch(
    img: jax.Array,
    center: jax.Array,
    size_wh: jax.Array,
    out_hw: Tuple[int, int],
) -> jax.Array:
    """Affine crop of a (w, h) box centered at ``center`` -> (out_h, out_w, 3).

    Exact gen_trans_from_patch + warpAffine semantics (scale 1, rot 0).
    """
    if WARP_IMPL == "matmul":
        return warp_matmul.crop_square_matmul(img, center, size_wh, out_hw)
    out_h, out_w = out_hw
    trans = gen_trans_from_patch(
        center[0], center[1], size_wh[0], size_wh[1], float(out_w), float(out_h)
    )
    inv = invert_affine(trans)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    # cv2.warpAffine fixed-point coordinate model (see
    # warp_matmul.warpaffine_fixed_point_coords); axis-aligned crop so the
    # cross terms inv[0,1]/inv[1,0] are zero.
    from hamer_yolo_tpu.ops.warp_matmul import warpaffine_fixed_point_coords

    src_x = warpaffine_fixed_point_coords(inv[0, 0], inv[0, 2], xs)
    src_y = warpaffine_fixed_point_coords(inv[1, 1], inv[1, 2], ys)
    # uint8 output rounding: (acc + (1<<21)) >> 22 == round-half-up
    return jnp.floor(bilinear_sample(img, src_x, src_y, 0.0) + 0.5)


def hamer_crop(
    img_bgr: jax.Array,
    center: jax.Array,
    size: jax.Array,
    do_flip: jax.Array,
    out_size: int = 256,
) -> jax.Array:
    """One HaMeR model input from the raw BGR frame (infer.py:217-238):
    square crop -> BGR->RGB -> lr-flip left hands -> ImageNet normalize."""
    patch = crop_square_patch(img_bgr, center, jnp.stack([size, size]), (out_size, out_size))
    patch = patch[:, :, ::-1]  # BGR -> RGB
    patch = jnp.where(do_flip > 0.5, patch[:, ::-1, :], patch)
    return normalize_imagenet(patch / 255.0)


def sar_patch(
    img_bgr: jax.Array,
    bbox_xywh: jax.Array,
    out_size: int = 256,
) -> jax.Array:
    """One SAR/RootNet input patch (Model_RGB.py:596-612): processed-bbox
    crop -> BGR->RGB -> ImageNet normalize (no flip in the depth path)."""
    cx = bbox_xywh[0] + 0.5 * bbox_xywh[2]
    cy = bbox_xywh[1] + 0.5 * bbox_xywh[3]
    patch = crop_square_patch(
        img_bgr, jnp.stack([cx, cy]), bbox_xywh[2:4], (out_size, out_size)
    )
    patch = patch[:, :, ::-1]
    return normalize_imagenet(patch / 255.0)
