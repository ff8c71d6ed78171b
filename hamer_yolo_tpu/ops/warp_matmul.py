"""MXU-native warp: axis-aligned bilinear resampling as two matmuls.

Every inference-path warp in this framework (letterbox, HaMeR crop, SAR
patch) is an axis-aligned affine (scale + translate, no rotation). For
those, bilinear resampling is SEPARABLE:

    out[y, x] = sum_s sum_t  Ry[y, s] * img[s, t] * Rx[x, t]
    out = Ry @ img @ Rx^T          (per channel)

where Ry (out_h, H) and Rx (out_w, W) are banded interpolation matrices
with at most two nonzeros per row: R[o, s] = max(0, 1 - |s - src(o)|).
Out-of-range rows are all-zero, which reproduces the constant-0 border
automatically (114-padding is handled by adding pad_value * (1 - rowsum)).

On TPU this maps the entire warp onto the MXU as dense matmuls — far
faster than the per-pixel gather formulation that XLA generates for
advanced indexing, and trivially batchable over crops via vmap (the per-
crop work is just building two small matrices + two matmuls). This is the
production replacement for the reference's cv2.warpAffine CPU crops
(hamer/infer.py:217, rootnet/preprocessing.py:39) — the "fused warp-affine
crop kernel" of the north star, expressed in the most MXU-friendly form
rather than as a hand-written gather kernel.

The general (rotated) case used by training augmentation stays on the
gather path in geometry/affine.py.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def warpaffine_fixed_point_coords(a, b, o: jax.Array) -> jax.Array:
    """cv2.warpAffine (8U, INTER_LINEAR) coordinate model: src = a*o + b
    rounded to the interpolation-table grid. Measured on this build by
    warping delta images: the effective fraction granularity is 1/128 and
    round-to-nearest fits best (max residual 0.006 of a pixel step, the
    coefficient-table quantization)."""
    return jnp.round((a * o + b) * 128.0) / 128.0


def _interp_matrix(src_coords: jax.Array, src_size: int) -> jax.Array:
    """(out,) float source coords -> (out, src_size) bilinear weights."""
    s = jax.lax.broadcasted_iota(jnp.float32, (src_coords.shape[0], src_size), 1)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(s - src_coords[:, None]))
    # Out-of-bounds coords (beyond the last pixel) contribute border (zero).
    return w


def resample_axis_aligned(
    img: jax.Array,
    src_x: jax.Array,
    src_y: jax.Array,
    pad_value: float = 0.0,
) -> jax.Array:
    """img (H, W, C), src_x (out_w,), src_y (out_h,) -> (out_h, out_w, C)."""
    H, W, C = img.shape
    Ry = _interp_matrix(src_y, H)  # (oh, H)
    Rx = _interp_matrix(src_x, W)  # (ow, W)
    # (oh, H) @ (H, W*C) -> (oh, W*C); then (oh*C, W) @ (W, ow)
    tmp = jnp.einsum("oh,hwc->owc", Ry, img)
    out = jnp.einsum("ow,awc->aoc", Rx, tmp)
    if pad_value != 0.0:
        # Rows that fall outside the source have weight-sum < 1; blend pad.
        wy = jnp.clip(Ry.sum(axis=1), 0.0, 1.0)[:, None]
        wx = jnp.clip(Rx.sum(axis=1), 0.0, 1.0)[None, :]
        cov = (wy * wx)[..., None]
        out = out + pad_value * (1.0 - cov)
    return out


def crop_square_matmul(
    img: jax.Array,
    center: jax.Array,
    size_wh: jax.Array,
    out_hw: Tuple[int, int],
) -> jax.Array:
    """MXU version of preprocess.crop_square_patch (same affine geometry).

    gen_trans_from_patch maps the box [center - s/2, center + s/2] onto
    [0, out]; the inverse sends output pixel o to
    src = (o - out/2) * (s / out) + center.
    """
    out_h, out_w = out_hw
    ox = jnp.arange(out_w, dtype=jnp.float32)
    oy = jnp.arange(out_h, dtype=jnp.float32)
    ax = size_wh[0] / out_w
    ay = size_wh[1] / out_h
    bx = center[0] - (out_w / 2.0) * ax
    by = center[1] - (out_h / 2.0) * ay
    src_x = warpaffine_fixed_point_coords(ax, bx, ox)
    src_y = warpaffine_fixed_point_coords(ay, by, oy)
    # uint8 output rounding: (acc + (1<<21)) >> 22 == round-half-up
    return jnp.floor(resample_axis_aligned(img, src_x, src_y) + 0.5)


def letterbox_matmul(
    img: jax.Array,
    orig_hw: jax.Array,
    out_size: int = 640,
    pad_value: float = 114.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """MXU version of preprocess.device_letterbox (same geometry/returns:
    cv2-exact rect letterbox, top-left aligned in the square canvas)."""
    from hamer_yolo_tpu.geometry.affine import letterbox_geometry_traced

    h, w = orig_hw[0], orig_hw[1]
    r, new_w, new_h, left, top, gain, pad = letterbox_geometry_traced(
        h, w, out_size)
    o = jnp.arange(out_size, dtype=jnp.float32)
    src_x = (o - left + 0.5) * (w / new_w) - 0.5
    src_y = (o - top + 0.5) * (h / new_h) - 0.5
    # Content coords clamp to the valid edge (cv2.resize replicates at
    # borders; this also keeps reads out of the bucket padding); pad
    # region reads -2.0 => zero row weight => 114 blend below.
    src_x = jnp.where((o >= left) & (o < left + new_w),
                      jnp.clip(src_x, 0.0, w - 1.0), -2.0)
    src_y = jnp.where((o >= top) & (o < top + new_h),
                      jnp.clip(src_y, 0.0, h - 1.0), -2.0)
    out = resample_axis_aligned(img, src_x, src_y, pad_value=pad_value)
    # cv2.resize emits uint8; snap to the integer grid like the reference.
    out = jnp.round(out)
    return out, gain, pad
