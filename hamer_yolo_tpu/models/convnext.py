"""ConvNeXt backbone (SAR's 'convnext' option).

Parity: reference rootnet/convnext.py:15-214 — standard ConvNeXt blocks
(7x7 depthwise conv -> LayerNorm -> pointwise MLP x4 -> GELU -> layer
scale -> residual), patchify stem 4x4/4, three 2x2/2 downsample layers
with pre-LN. SAR uses convnext_base (dims 128/256/512/1024, depths
3/3/27/3, Model_RGB.py:227). Channels-last throughout (TPU-native; the
reference permutes in/out of channels-first per block).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

Params = Dict[str, Any]

CONVNEXT_SPECS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


def _block_init(key, dim: int, layer_scale: float = 1e-6) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "dwconv": nn.conv_init(k1, 7, dim, dim, groups=dim, bias=True),
        "norm": nn.layer_norm_init(dim),
        "pw1": nn.linear_init(k2, dim, 4 * dim),
        "pw2": nn.linear_init(k3, 4 * dim, dim),
        "gamma": jnp.full((dim,), layer_scale),
    }


def _block(p: Params, x: jax.Array, dim: int) -> jax.Array:
    y = nn.conv2d(p["dwconv"], x, stride=1, padding=3, groups=dim)
    y = nn.layer_norm(p["norm"], y)
    y = nn.linear(p["pw2"], jax.nn.gelu(nn.linear(p["pw1"], y), approximate=False))
    return x + p["gamma"].astype(y.dtype) * y


def init_convnext(key: jax.Array, variant: str = "base") -> Params:
    depths, dims = CONVNEXT_SPECS[variant]
    n_keys = 4 + sum(depths) + 3
    keys = jax.random.split(key, n_keys)
    ki = 0
    params: Params = {"stem_conv": nn.conv_init(keys[ki], 4, 3, dims[0], bias=True),
                      "stem_norm": nn.layer_norm_init(dims[0]),
                      "stages": [], "downsamples": []}
    ki += 1
    for stage in range(4):
        if stage > 0:
            params["downsamples"].append({
                "norm": nn.layer_norm_init(dims[stage - 1]),
                "conv": nn.conv_init(keys[ki], 2, dims[stage - 1], dims[stage], bias=True),
            })
            ki += 1
        blocks = [
            _block_init(keys[ki + b], dims[stage]) for b in range(depths[stage])
        ]
        ki += depths[stage]
        params["stages"].append(blocks)
    return params


def convnext_forward(params: Params, x: jax.Array, variant: str = "base") -> jax.Array:
    """x: (B, H, W, 3) -> (B, H/32, W/32, dims[-1])."""
    depths, dims = CONVNEXT_SPECS[variant]
    y = nn.conv2d(params["stem_conv"], x, stride=4, padding=0)
    y = nn.layer_norm(params["stem_norm"], y)
    for stage in range(4):
        if stage > 0:
            ds = params["downsamples"][stage - 1]
            y = nn.layer_norm(ds["norm"], y)
            y = nn.conv2d(ds["conv"], y, stride=2, padding=0)
        for blk in params["stages"][stage]:
            y = _block(blk, y, dims[stage])
    return y
