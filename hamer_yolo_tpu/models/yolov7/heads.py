"""IBin and IKeypoint detection heads.

The reference inventories two extra head families beyond Detect/IDetect
(SURVEY.md 2.2):

- ``IBin`` (/root/reference/yolo/yolov7/models/yolo.py:441-515): box w/h
  regressed through ``SigmoidBin`` classification-plus-residual bins
  (utils/loss.py:36-121) instead of the (2*sigmoid)^2 * anchor decode.
  Per-anchor layout: [x, y, w_bin(bin_count+1), h_bin(bin_count+1), obj,
  cls...]; w/h bins span [0, 4] x anchor.
- ``IKeypoint`` (models/yolo.py:218-316): pose estimation head — the
  detect channels are ImplicitA/M-wrapped as in IDetect, a parallel conv
  emits 3*nkpt keypoint channels, and the two are CONCATENATED along the
  channel dim before the (na, no) reshape. Keypoint x/y decode from raw
  (un-sigmoided) logits: (v*2 - 0.5 + grid) * stride; keypoint confidence
  is sigmoided.

Neither head appears in the reference's own cfg/ yamls (dead code in its
pipeline) but both are part of the inventoried surface; yaml_spec maps
``IBin``/``IKeypoint`` modules so cfgs that use them build directly.

All functions are pure; ImplicitA/M are fused into the head convs at
conversion time exactly as IDetect.fuse does (core/convert.py).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

BIN_COUNT = 21  # IBin default (models/yolo.py:445)
BIN_MIN, BIN_MAX = 0.0, 4.0
BIN_REG_SCALE = 2.0


def bin_no(nc: int, bin_count: int = BIN_COUNT) -> int:
    """Outputs per anchor for IBin: x,y,obj + cls + two (bin_count+1) bins."""
    return nc + 3 + 2 * (bin_count + 1)


def kpt_no(nc: int, nkpt: int) -> int:
    return nc + 5 + 3 * nkpt


def sigmoid_bin_centers(bin_count: int = BIN_COUNT, vmin: float = BIN_MIN,
                        vmax: float = BIN_MAX) -> jax.Array:
    """Bin center values (SigmoidBin.__init__, loss.py:55-62)."""
    step = (vmax - vmin) / bin_count
    start = vmin + step / 2.0
    return jnp.asarray(start + step * np.arange(bin_count), jnp.float32)


def sigmoid_bin_decode(y: jax.Array, bin_count: int = BIN_COUNT,
                       vmin: float = BIN_MIN, vmax: float = BIN_MAX,
                       reg_scale: float = BIN_REG_SCALE) -> jax.Array:
    """SigmoidBin.forward (loss.py:74-89) on ALREADY-sigmoided inputs.

    y: (..., bin_count+1) -> (...,) regressed value: residual from the
    first channel plus the argmax bin center, clamped to [vmin, vmax].
    """
    step = (vmax - vmin) / bin_count
    reg = (y[..., 0] * reg_scale - reg_scale / 2.0) * step
    centers = sigmoid_bin_centers(bin_count, vmin, vmax)
    idx = jnp.argmax(y[..., 1:1 + bin_count], axis=-1)
    return jnp.clip(reg + centers[idx], vmin, vmax)


def sigmoid_bin_training_loss(pred_logits: jax.Array, target: jax.Array,
                              weight: jax.Array | None = None,
                              bin_count: int = BIN_COUNT,
                              vmin: float = BIN_MIN, vmax: float = BIN_MAX,
                              reg_scale: float = BIN_REG_SCALE):
    """SigmoidBin.training_loss (loss.py:92-121), use_loss_regression=False
    (the ComputeLossBinOTA configuration, loss.py:879).

    pred_logits: (N, bin_count+1) RAW logits; target: (N,) values.
    weight: optional (N,) mask (masked-dense formulation; the reference
    indexes matched rows instead). Returns (mean masked BCE loss over the
    bin channels, clamped regressed result (N,)).
    """
    step = (vmax - vmin) / bin_count
    reg = (jax.nn.sigmoid(pred_logits[..., 0]) * reg_scale - reg_scale / 2.0) * step
    centers = sigmoid_bin_centers(bin_count, vmin, vmax)
    diff = jnp.abs(target[..., None] - centers)
    idx = jnp.argmin(diff, axis=-1)
    result = reg + centers[idx]

    tgt_bins = jax.nn.one_hot(idx, bin_count, dtype=pred_logits.dtype)
    bce = jnp.maximum(pred_logits[..., 1:], 0) - pred_logits[..., 1:] * tgt_bins \
        + jnp.log1p(jnp.exp(-jnp.abs(pred_logits[..., 1:])))
    if weight is None:
        loss = bce.mean()
    else:
        denom = jnp.maximum(weight.sum() * bin_count, 1.0)
        loss = (bce * weight[..., None]).sum() / denom
    return loss, jnp.clip(result, vmin, vmax)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_bin_head(key: jax.Array, in_chs: Sequence[int], na: int, nc: int,
                  bin_count: int = BIN_COUNT) -> Dict:
    keys = jax.random.split(key, len(in_chs))
    no = bin_no(nc, bin_count)
    return {"m": [nn.conv_init(k, 1, c, na * no, bias=True)
                  for k, c in zip(keys, in_chs)]}


def init_keypoint_head(key: jax.Array, in_chs: Sequence[int], na: int,
                       nc: int, nkpt: int) -> Dict:
    keys = jax.random.split(key, 2 * len(in_chs))
    return {
        "m": [nn.conv_init(keys[2 * i], 1, c, na * (nc + 5), bias=True)
              for i, c in enumerate(in_chs)],
        "m_kpt": [nn.conv_init(keys[2 * i + 1], 1, c, na * 3 * nkpt, bias=True)
                  for i, c in enumerate(in_chs)],
    }


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _to_anchor_major(m: jax.Array, na: int, no: int) -> jax.Array:
    """(B, H, W, na*no) -> (B, na, H, W, no), torch flatten-order parity."""
    B, H, W, _ = m.shape
    return jnp.transpose(m.reshape(B, H, W, na, no), (0, 3, 1, 2, 4))


def _grid(H: int, W: int) -> jax.Array:
    gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    return jnp.stack([gx, gy], axis=-1)


def decode_bin_detections(det_maps: Sequence[jax.Array], cfg,
                          bin_count: int = BIN_COUNT) -> jax.Array:
    """IBin inference decode (models/yolo.py:469-509) -> (B, N, nc+5)."""
    anchors = jnp.asarray(
        np.asarray(cfg.anchors, np.float32).reshape(cfg.nl, cfg.na, 2))
    L = bin_count + 1
    obj_idx = 2 + 2 * L
    outs = []
    for lvl, m in enumerate(det_maps):
        m = m.astype(jnp.float32)
        Bz, H, W, _ = m.shape
        y = jax.nn.sigmoid(_to_anchor_major(m, cfg.na, bin_no(cfg.nc, bin_count)))
        grid = _grid(H, W)
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * cfg.strides[lvl]
        anc = anchors[lvl][None, :, None, None, :]
        pw = sigmoid_bin_decode(y[..., 2:2 + L], bin_count) * anc[..., 0]
        ph = sigmoid_bin_decode(y[..., 2 + L:obj_idx], bin_count) * anc[..., 1]
        out = jnp.concatenate(
            [xy, pw[..., None], ph[..., None], y[..., obj_idx:]], axis=-1)
        outs.append(out.reshape(Bz, -1, cfg.nc + 5))
    return jnp.concatenate(outs, axis=1)


def decode_keypoint_detections(det_maps: Sequence[jax.Array], cfg,
                               nkpt: int = 17) -> jax.Array:
    """IKeypoint inference decode (models/yolo.py:256-313).

    det_maps carry the concatenated [implicit-fused det | kpt] channels.
    Output rows: [xy(2), wh(2), obj, cls(nc), (kx, ky, kconf)*nkpt];
    keypoint x/y decode from RAW logits (no sigmoid — reference parity).
    """
    anchors = jnp.asarray(
        np.asarray(cfg.anchors, np.float32).reshape(cfg.nl, cfg.na, 2))
    no_det = cfg.nc + 5
    outs = []
    for lvl, m in enumerate(det_maps):
        m = m.astype(jnp.float32)
        Bz, H, W, _ = m.shape
        x = _to_anchor_major(m, cfg.na, kpt_no(cfg.nc, nkpt))
        stride = cfg.strides[lvl]
        grid = _grid(H, W)
        y = jax.nn.sigmoid(x[..., :no_det])
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
        wh = (y[..., 2:4] * 2.0) ** 2 * anchors[lvl][None, :, None, None, :]
        kpt = x[..., no_det:].reshape(x.shape[:-1] + (nkpt, 3))
        kx = (kpt[..., 0] * 2.0 - 0.5 + grid[..., 0:1]) * stride
        ky = (kpt[..., 1] * 2.0 - 0.5 + grid[..., 1:2]) * stride
        kconf = jax.nn.sigmoid(kpt[..., 2])
        kflat = jnp.stack([kx, ky, kconf], axis=-1).reshape(x.shape[:-1] + (3 * nkpt,))
        out = jnp.concatenate([xy, wh, y[..., 4:], kflat], axis=-1)
        outs.append(out.reshape(Bz, -1, kpt_no(cfg.nc, nkpt)))
    return jnp.concatenate(outs, axis=1)
