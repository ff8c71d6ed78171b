"""Auxiliary KeypointFusion layers: CBAM, RGBDFusion gate, hourglass.

Reference counterparts (capability-level, TPU-idiomatic NHWC):
- ``cbam``: rootnet/KeypointFusion/model/cbam.py (ChannelGate shared-MLP
  over avg+max pools, SpatialGate 7x7 conv over channel max+mean).
- ``rgbd_fusion``: rootnet/KeypointFusion/model/fusion_layer.py:40
  (RGBDFusion gated blend of co-registered streams + CBAM).
- ``hourglass``: rootnet/KeypointFusion/model/hourglass.py:163 (PoseNet
  encoder-decoder with skip links; the layer-exact hourglass *Residual*
  bottleneck used by the main KPFusion runtime lives in resunet.py).
- ``depth_to_pointcloud``: util img2pcl-style full-map back-projection
  to a fixed-capacity cloud (the crop-space metric-cube sampler with
  reference-exact semantics is geometry.img2pcl).

These are components of the reference repo that the layer-exact KPFusion
runtime (model.py/runtime.py) does not itself consume; they are kept so
every reference module has a counterpart (PARITY.md).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

Params = Dict[str, Any]


# --- CBAM (cbam.py) --------------------------------------------------------

def cbam_init(key, dim: int, reduction: int = 16) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = max(dim // reduction, 4)
    return {
        "mlp1": nn.linear_init(k1, dim, hidden),
        "mlp2": nn.linear_init(k2, hidden, dim),
        "spatial": nn.conv_init(k3, 7, 2, 1, bias=True),
    }


def cbam(p: Params, x: jax.Array) -> jax.Array:
    """(B, H, W, C) channel + spatial attention gating."""
    avg = jnp.mean(x, axis=(1, 2))
    mx = jnp.max(x, axis=(1, 2))
    att = nn.linear(p["mlp2"], jax.nn.relu(nn.linear(p["mlp1"], avg))) + \
        nn.linear(p["mlp2"], jax.nn.relu(nn.linear(p["mlp1"], mx)))
    x = x * jax.nn.sigmoid(att)[:, None, None, :]
    pool = jnp.stack([jnp.max(x, axis=-1), jnp.mean(x, axis=-1)], axis=-1)
    sp = jax.nn.sigmoid(nn.conv2d(p["spatial"], pool, 1, 3))
    return x * sp


# --- RGBDFusion (fusion_layer.py) ------------------------------------------

def rgbd_fusion_init(key, dim: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate_rgb": nn.linear_init(k1, 2 * dim, dim),
        "gate_d": nn.linear_init(k2, 2 * dim, dim),
        "cbam": cbam_init(k3, dim),
    }


def rgbd_fusion(p: Params, rgb: jax.Array, depth: jax.Array) -> jax.Array:
    """Gated fusion of co-registered (B, H, W, C) RGB and depth features."""
    cat = jnp.concatenate([rgb, depth], axis=-1)
    g_r = jax.nn.sigmoid(nn.linear(p["gate_rgb"], cat))
    g_d = jax.nn.sigmoid(nn.linear(p["gate_d"], cat))
    return cbam(p["cbam"], rgb * g_r + depth * g_d)


# --- Hourglass PoseNet (hourglass.py) --------------------------------------

def hourglass_init(key, dim: int, depth: int = 3) -> Params:
    keys = jax.random.split(key, depth * 3 + 2)
    downs, ups, skips = [], [], []
    for i in range(depth):
        downs.append(nn.conv_init(keys[3 * i], 3, dim, dim, bias=True))
        ups.append(nn.conv_init(keys[3 * i + 1], 3, dim, dim, bias=True))
        skips.append(nn.conv_init(keys[3 * i + 2], 1, dim, dim, bias=True))
    return {"downs": downs, "ups": ups, "skips": skips,
            "out": nn.conv_init(keys[-1], 1, dim, dim, bias=True)}


def hourglass(p: Params, x: jax.Array) -> jax.Array:
    skips = []
    y = x
    for down, skip in zip(p["downs"], p["skips"]):
        skips.append(nn.conv2d(skip, y, 1, 0))
        y = jax.nn.relu(nn.conv2d(down, y, 2, 1))
    for up, skip in zip(reversed(p["ups"]), reversed(skips)):
        # resize back to the recorded skip resolution (handles odd/small
        # sizes where stride-2 convs don't halve exactly)
        y = jax.image.resize(y, skip.shape, "nearest")
        y = jax.nn.relu(nn.conv2d(up, y, 1, 1)) + skip
    return nn.conv2d(p["out"], y, 1, 0)


def depth_to_pointcloud(
    depth: jax.Array,
    K: jax.Array,
    num_points: int,
    stride: int = 2,
    z_range: Tuple[float, float] = (0.1, 2.0),
) -> jax.Array:
    """(H, W) depth map -> fixed-capacity (num_points, 3) cloud.

    Full-image img2pcl-style back-projection: valid pixels first, strided
    subset, pad/crop to the static capacity (invalid slots repeat the
    centroid). The reference-exact crop-space metric-cube sampler is
    ``geometry.img2pcl``.
    """
    H, W = depth.shape
    ys, xs = jnp.meshgrid(jnp.arange(0, H, stride, dtype=jnp.float32),
                          jnp.arange(0, W, stride, dtype=jnp.float32),
                          indexing="ij")
    z = depth[::stride, ::stride]
    valid = (z > z_range[0]) & (z < z_range[1])
    x = (xs - K[0, 2]) * z / K[0, 0]
    y = (ys - K[1, 2]) * z / K[1, 1]
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    vflat = valid.reshape(-1)
    # order: valid first
    order = jnp.argsort(~vflat)
    pts = pts[order][:num_points]
    vsel = vflat[order][:num_points]
    centroid = jnp.sum(pts * vsel[:, None], axis=0) / jnp.maximum(vsel.sum(), 1)
    return jnp.where(vsel[:, None], pts, centroid)
