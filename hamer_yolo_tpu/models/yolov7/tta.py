"""Multi-scale + flip test-time augmentation for the detector.

Parity: reference Model.forward(augment=True) (yolo/yolov7/models/yolo.py:
589-607): scales (1, 0.83, 0.67), lr-flip on the 0.83 scale, per-branch
de-scaling (boxes / s) and de-flipping (x -> W - x), concatenated over
the detection axis. NOTE: the reference pipeline's config sets
augment=True (config/yolo_config.py:6) but the flag is runtime-INERT
there — Detector wraps the model in TracedModel, whose forward drops the
augment argument (torch_utils.py:371-374) — so the reference never
actually executes TTA. Exposed here as an opt-in jitted branch
(value-parity-tested against the non-traced Model.forward(augment=True)
in tests/test_tome_tta.py) so both variants can be benchmarked.

Scaled shapes are static (computed from the config at trace time), so the
three branches compile into one XLA program.
"""
from __future__ import annotations

import math
from typing import List

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.yolov7.model import YoloConfig, yolov7_forward

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, "lr", None)


def _scale_pad(x: jax.Array, ratio: float, gs: int = 32) -> jax.Array:
    """scale_img equivalent (torch_utils.py:247-257): bilinear resize then
    pad bottom/right to a gs multiple with value 0.447 (the ImageNet-mean
    gray the reference uses).

    antialias=False: torch F.interpolate(mode='bilinear') does NOT
    antialias on downscale; jax.image.resize defaults to antialias=True
    there, which changes every resized pixel. The pad target is
    ceil(H*ratio/gs) on the FLOAT product (the reference computes it
    before the int() truncation of the resize size)."""
    B, H, W, C = x.shape
    if ratio == 1.0:
        return x
    h, w = int(H * ratio), int(W * ratio)
    resized = jax.image.resize(x, (B, h, w, C), method="linear",
                               antialias=False)
    H2 = math.ceil(H * ratio / gs) * gs
    W2 = math.ceil(W * ratio / gs) * gs
    return jnp.pad(resized, ((0, 0), (0, H2 - h), (0, W2 - w), (0, 0)),
                   constant_values=0.447)


def yolov7_forward_tta(params, x: jax.Array, cfg: YoloConfig = YoloConfig(),
                       spec=None) -> jax.Array:
    """(B, H, W, 3) in [0,1] -> (B, sum_i N_i, nc+5) TTA-merged decode."""
    _, H, W, _ = x.shape
    outs: List[jax.Array] = []
    for s, f in zip(TTA_SCALES, TTA_FLIPS):
        xi = jnp.flip(x, axis=2) if f == "lr" else x
        xi = _scale_pad(xi, s)
        yi = yolov7_forward(params, xi, cfg, spec=spec)
        xy = yi[..., :4] / s
        if f == "lr":
            xy = xy.at[..., 0].set(W - xy[..., 0])
        outs.append(jnp.concatenate([xy, yi[..., 4:]], axis=-1))
    return jnp.concatenate(outs, axis=1)
