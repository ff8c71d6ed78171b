"""Affine crop machinery + batched bilinear warp (pure JAX; Pallas kernel in ops/).

Parity targets:
- ``gen_trans_from_patch`` — the 3-point affine construction used by both
  HaMeR crops (reference hamer/hamer/datasets/utils.py:82-129) and RootNet
  patches (reference rootnet/preprocessing.py:103-155). Implemented in
  closed form instead of cv2.getAffineTransform.
- ``warp_affine`` — cv2.warpAffine(INTER_LINEAR, BORDER_CONSTANT)
  equivalent as an XLA gather (reference datasets/utils.py:358-363).
- ``letterbox_params`` / ``letterbox`` — aspect-preserving resize + pad-114
  (reference yolov7/utils/datasets.py:999-1029). The jit path uses
  full-square padding (auto=False), matching the reference's static-engine
  deployments; the ``round(dw +- 0.1)`` quirk is reproduced.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotate_2d(pt: jax.Array, rot_rad: jax.Array) -> jax.Array:
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    return jnp.stack([pt[..., 0] * cs - pt[..., 1] * sn, pt[..., 0] * sn + pt[..., 1] * cs], axis=-1)


def _affine_from_triangles(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Exact affine (2, 3) mapping 3 src points (3, 2) onto 3 dst points.

    Closed-form replacement for cv2.getAffineTransform: with
    A = [s1-s0 | s2-s0], B = [t1-t0 | t2-t0] (column pairs),
    the linear part is L = B A^-1 and translation t0 - L s0.
    """
    A = jnp.stack([src[1] - src[0], src[2] - src[0]], axis=-1)  # (2, 2)
    B = jnp.stack([dst[1] - dst[0], dst[2] - dst[0]], axis=-1)  # (2, 2)
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    inv_A = jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]]) / det
    L = B @ inv_A
    t = dst[0] - L @ src[0]
    return jnp.concatenate([L, t[:, None]], axis=-1)


def gen_trans_from_patch(
    c_x: jax.Array,
    c_y: jax.Array,
    src_w: jax.Array,
    src_h: jax.Array,
    dst_w: float,
    dst_h: float,
    scale: jax.Array = 1.0,
    rot_deg: jax.Array = 0.0,
    inv: bool = False,
) -> jax.Array:
    """Affine (2, 3) from box (center, size, scale, rot) to a dst patch.

    Anchor points are the box center plus the rotated half-down and
    half-right directions, exactly as in the reference.
    """
    sw = src_w * scale
    sh = src_h * scale
    rot_rad = jnp.pi * rot_deg / 180.0
    src_center = jnp.stack([jnp.asarray(c_x, jnp.float32), jnp.asarray(c_y, jnp.float32)])
    src_down = rotate_2d(jnp.stack([jnp.zeros_like(sh), sh * 0.5]), rot_rad)
    src_right = rotate_2d(jnp.stack([sw * 0.5, jnp.zeros_like(sw)]), rot_rad)
    src = jnp.stack([src_center, src_center + src_down, src_center + src_right])

    dst_center = jnp.array([dst_w * 0.5, dst_h * 0.5], jnp.float32)
    dst_down = jnp.array([0.0, dst_h * 0.5], jnp.float32)
    dst_right = jnp.array([dst_w * 0.5, 0.0], jnp.float32)
    dst = jnp.stack([dst_center, dst_center + dst_down, dst_center + dst_right])

    if inv:
        return _affine_from_triangles(dst, src)
    return _affine_from_triangles(src, dst)


def invert_affine(trans: jax.Array) -> jax.Array:
    """Invert a (..., 2, 3) affine transform."""
    L = trans[..., :, :2]
    t = trans[..., :, 2]
    det = L[..., 0, 0] * L[..., 1, 1] - L[..., 0, 1] * L[..., 1, 0]
    inv_L = (
        jnp.stack(
            [
                jnp.stack([L[..., 1, 1], -L[..., 0, 1]], axis=-1),
                jnp.stack([-L[..., 1, 0], L[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[..., None, None]
    )
    inv_t = -jnp.einsum("...ij,...j->...i", inv_L, t)
    return jnp.concatenate([inv_L, inv_t[..., None]], axis=-1)


def bilinear_sample(img: jax.Array, xs: jax.Array, ys: jax.Array, border_value: float = 0.0) -> jax.Array:
    """Bilinear sample (H, W, C) image at float coords; constant border.

    xs/ys: any matching shape S -> output (S..., C). Matches
    cv2.INTER_LINEAR + BORDER_CONSTANT semantics (out-of-range taps read
    the border value; partially-out taps blend with it).
    """
    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        v = img[yi_c, xi_c]
        return jnp.where(inb[..., None], v, border_value)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def warp_affine(
    img: jax.Array,
    trans: jax.Array,
    out_hw: Tuple[int, int],
    border_value: float = 0.0,
) -> jax.Array:
    """cv2.warpAffine equivalent: apply forward (2, 3) src->dst transform.

    img: (H, W, C); returns (out_h, out_w, C). The forward matrix is
    inverted internally (as cv2 does without WARP_INVERSE_MAP).
    """
    out_h, out_w = out_hw
    inv = invert_affine(trans)
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=jnp.float32),
        jnp.arange(out_w, dtype=jnp.float32),
        indexing="ij",
    )
    src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    return bilinear_sample(img, src_x, src_y, border_value)


def crop_resize_normalize(
    img: jax.Array,
    center: jax.Array,
    size: jax.Array,
    out_hw: Tuple[int, int],
    mean: jax.Array,
    std: jax.Array,
    do_flip: jax.Array,
    border_value: float = 0.0,
) -> jax.Array:
    """Fused square-crop + resize + BGR->RGB + optional lr-flip + normalize.

    Produces HaMeR's model input for ONE box on ONE image:
    - crop `size`x`size` patch centered at `center`, resized to out_hw
      (equivalent to gen_trans_from_patch + warpAffine on the *original*
      image — no rotation, scale 1);
    - channel reversal (BGR input assumed, like cv2.imread in the
      reference) and left-hand horizontal flip (infer.py:229-231);
    - per-channel (x - 255*mean)/(255*std) normalization (infer.py:234-238).
    img: (H, W, 3) float; out: (out_h, out_w, 3) float32 RGB normalized.
    vmap over boxes/images for batches; ops/warp_pallas.py holds the fused
    TPU kernel version.
    """
    out_h, out_w = out_hw
    trans = gen_trans_from_patch(center[0], center[1], size, size, float(out_w), float(out_h))
    patch = warp_affine(img, trans, out_hw, border_value)  # (oh, ow, 3) BGR
    patch = patch[:, :, ::-1]  # BGR -> RGB
    flipped = patch[:, ::-1, :]
    patch = jnp.where(do_flip > 0.5, flipped, patch)
    return (patch - 255.0 * mean) / (255.0 * std)


def letterbox_params(
    shape_hw: Tuple[int, int],
    new_shape: int = 640,
    stride: int = 32,
    auto: bool = False,
    scaleup: bool = True,
) -> Tuple[float, Tuple[int, int], Tuple[float, float], Tuple[int, int, int, int]]:
    """Host-side letterbox geometry (static; feeds the jitted resize+pad).

    Returns (ratio, (new_w, new_h) unpadded, (dw, dh) half-pads,
    (top, bottom, left, right) integer pads). Reproduces the reference's
    int(round(x +- 0.1)) rounding.
    """
    h, w = shape_hw
    r = min(new_shape / h, new_shape / w)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(w * r)), int(round(h * r)))
    dw = new_shape - new_unpad[0]
    dh = new_shape - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    return r, new_unpad, (dw, dh), (top, bottom, left, right)


def letterbox_geometry_traced(h, w, out_size: int, stride: float = 32.0):
    """cv2-letterbox-EXACT geometry with traced (h, w) scalars.

    Reproduces the reference letterbox (general.py:999-1029, auto=True)
    bit-for-bit — int(round(w*r)) resize target, mod-stride rectangular
    pad, the round(d-0.1) top/left quirk — for embedding in a STATIC
    out_size x out_size canvas with the rect content TOP-LEFT aligned
    (the extra square padding goes to the bottom/right, so the anchor-grid
    alignment of every content pixel matches the reference's rect canvas
    exactly).

    Returns (r, new_w, new_h, left, top, gain, pad) where (gain, pad) are
    what the reference's scale_coords (general.py:323) derives from the
    rect canvas shape: gain = min(rect/orig), pad = (rect - orig*gain)/2
    UNROUNDED.

    jnp.round matches Python's round() (both half-to-even).
    """
    r = jnp.minimum(out_size / h, out_size / w)
    new_w = jnp.round(w * r)
    new_h = jnp.round(h * r)
    dw_total = jnp.mod(out_size - new_w, stride)
    dh_total = jnp.mod(out_size - new_h, stride)
    left = jnp.round(dw_total / 2.0 - 0.1)
    top = jnp.round(dh_total / 2.0 - 0.1)
    rect_w = new_w + dw_total
    rect_h = new_h + dh_total
    gain = jnp.minimum(rect_h / h, rect_w / w)
    pad = jnp.stack([(rect_w - w * gain) / 2.0, (rect_h - h * gain) / 2.0])
    return r, new_w, new_h, left, top, gain, pad


@partial(jax.jit, static_argnums=(1, 2, 3))
def letterbox_image(
    img: jax.Array,
    new_unpad_wh: Tuple[int, int],
    pads: Tuple[int, int, int, int],
    out_size: int = 640,
    pad_value: float = 114.0,
) -> jax.Array:
    """XLA letterbox: bilinear resize to new_unpad then constant-pad.

    img: (H, W, 3) float; returns (out_size, out_size, 3).
    """
    new_w, new_h = new_unpad_wh
    top, bottom, left, right = pads
    resized = jax.image.resize(img, (new_h, new_w, img.shape[2]), method="linear")
    return jnp.pad(
        resized,
        ((top, bottom), (left, right), (0, 0)),
        constant_values=pad_value,
    )


def letterbox_numpy(img: np.ndarray, new_shape: int = 640, stride: int = 32, auto: bool = False):
    """Host (numpy/cv2-free) letterbox for the input pipeline; returns
    (padded HWC float32, ratio, (dw, dh))."""
    import cv2

    r, new_unpad, (dw, dh), (top, bottom, left, right) = letterbox_params(
        img.shape[:2], new_shape, stride, auto
    )
    if (img.shape[1], img.shape[0]) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    img = cv2.copyMakeBorder(
        img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(114, 114, 114)
    )
    return img, r, (dw, dh)
