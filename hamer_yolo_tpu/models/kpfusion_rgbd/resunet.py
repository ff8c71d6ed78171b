"""ResNet-UNet image streams (reference model/resnetUnet.py:251-420).

``OfficialResNetUnet`` (depth stream, 1-channel conv1) and
``OfficialResNetUnet_RGB2offset_3D`` (RGB stream, 3-channel conv1) share
the same topology: a torchvision-style ResNet backbone emitting
(c0..c4), hourglass ``Residual`` blocks (model/hourglass.py:87-119,
pre-activation BN-ReLU conv1-conv3-conv1 with a 1x1 skip) on the skip/up/
fusion paths, bilinear 2x upsampling, and a list of 1x1 ``finals`` heads
whose outputs concatenate channel-wise (joint_num*3 offset unit vectors,
joint_num heatmaps, joint_num weights).

All BN is inference-mode with running stats (eps 1e-5, the torch default
— KPFusion never re-sets eps). NHWC pure functions.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

Params = Dict[str, Any]

RESNET18_LAYERS = (2, 2, 2, 2)
RESNET18_CHANNELS = (64, 128, 256, 512)
BN_EPS = 1e-5


def _bn(p, x):
    return nn.batch_norm(p, x, eps=BN_EPS)


# --- hourglass Residual (pre-activation bottleneck) ------------------------

def residual_init(key, c_in: int, c_out: int) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    half = c_out // 2
    p = {
        "bn1": nn.batch_norm_init(c_in),
        "conv1": nn.conv_init(k1, 1, c_in, half, bias=True),
        "bn2": nn.batch_norm_init(half),
        "conv2": nn.conv_init(k2, 3, half, half, bias=True),
        "bn3": nn.batch_norm_init(half),
        "conv3": nn.conv_init(k3, 1, half, c_out, bias=True),
    }
    if c_in != c_out:
        p["skip"] = nn.conv_init(k4, 1, c_in, c_out, bias=True)
    return p


def residual(p: Params, x: jax.Array) -> jax.Array:
    out = nn.conv2d(p["conv1"], jax.nn.relu(_bn(p["bn1"], x)), padding=0)
    out = nn.conv2d(p["conv2"], jax.nn.relu(_bn(p["bn2"], out)), padding=1)
    out = nn.conv2d(p["conv3"], jax.nn.relu(_bn(p["bn3"], out)), padding=0)
    skip = nn.conv2d(p["skip"], x, padding=0) if "skip" in p else x
    return out + skip


# --- torchvision-style ResNet-18 multiscale backbone ------------------------

def _block_init(key, c_in: int, c_out: int, stride: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "conv1": nn.conv_init(k1, 3, c_in, c_out),
        "bn1": nn.batch_norm_init(c_out),
        "conv2": nn.conv_init(k2, 3, c_out, c_out),
        "bn2": nn.batch_norm_init(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["down"] = nn.conv_init(k3, 1, c_in, c_out)
        p["down_bn"] = nn.batch_norm_init(c_out)
    return p


def _block(p: Params, x: jax.Array, stride: int) -> jax.Array:
    out = jax.nn.relu(_bn(p["bn1"], nn.conv2d(p["conv1"], x, stride=stride, padding=1)))
    out = _bn(p["bn2"], nn.conv2d(p["conv2"], out, padding=1))
    if "down" in p:
        x = _bn(p["down_bn"], nn.conv2d(p["down"], x, stride=stride, padding=0))
    return jax.nn.relu(out + x)


def resnet18_init(key, in_channels: int = 3) -> Params:
    keys = jax.random.split(key, 10)
    p: Params = {
        "conv1": nn.conv_init(keys[0], 7, in_channels, 64),
        "bn1": nn.batch_norm_init(64),
        "stages": [],
    }
    c_in = 64
    ki = 1
    for si, (n, c) in enumerate(zip(RESNET18_LAYERS, RESNET18_CHANNELS)):
        blocks = []
        for b in range(n):
            stride = 2 if (b == 0 and si > 0) else 1
            blocks.append(_block_init(keys[ki], c_in, c, stride))
            ki += 1
            c_in = c
        p["stages"].append(blocks)
    return p


def resnet18_forward(p: Params, x: jax.Array) -> List[jax.Array]:
    """x (B, H, W, C) -> [c0, c1, c2, c3, c4] (strides 4, 4, 8, 16, 32)."""
    y = jax.nn.relu(_bn(p["bn1"], nn.conv2d(p["conv1"], x, stride=2, padding=3)))
    y = nn.max_pool(y, k=3, stride=2, padding=1)
    feats = [y]
    for si, blocks in enumerate(p["stages"]):
        for b, bp in enumerate(blocks):
            y = _block(bp, y, 2 if (b == 0 and si > 0) else 1)
        feats.append(y)
    return feats


# --- UNet ------------------------------------------------------------------

def _up2x_bilinear(x: jax.Array) -> jax.Array:
    """nn.Upsample(scale_factor=2, mode='bilinear', align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


def unet_init(key, joint_num: int = 21, in_channels: int = 1,
              deconv_dim: int = 128,
              out_dim_list: Sequence[int] | None = None) -> Params:
    out_dim_list = list(out_dim_list or [joint_num * 3, joint_num, joint_num])
    keys = jax.random.split(key, 12)
    p: Params = {
        "backbone": resnet18_init(keys[0], in_channels),
        "skip4": residual_init(keys[1], 256, 256),
        "up4": residual_init(keys[2], 512, 512),
        "fuse4": residual_init(keys[3], 512 + 256, 256),
        "skip3": residual_init(keys[4], 128, 128),
        "up3": residual_init(keys[5], 256, 256),
        "fuse3": residual_init(keys[6], 256 + 128, 128),
        "skip2": residual_init(keys[7], 64, 64),
        "up2": residual_init(keys[8], 128, 128),
        "fuse2": residual_init(keys[9], 128 + 64, deconv_dim),
        # reference init: finals ~ N(0, 0.001), zero bias (resunet init_weights)
        "finals": [{"w": 0.001 * jax.random.normal(k, (1, 1, deconv_dim, d)),
                    "b": jnp.zeros((d,))}
                   for k, d in zip(jax.random.split(keys[10], len(out_dim_list)),
                                   out_dim_list)],
    }
    return p


def unet_forward(p: Params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """x (B, H, W, C) -> (img_result (B, H/4, W/4, sum(out_dims)),
    img_feature (B, H/4, W/4, deconv_dim)). OfficialResNetUnet.forward
    (resnetUnet.py:311-332)."""
    c0, c1, c2, c3, c4 = resnet18_forward(p["backbone"], x)
    c4_up = _up2x_bilinear(residual(p["up4"], c4))
    c3_fused = residual(p["fuse4"],
                        jnp.concatenate([c4_up, residual(p["skip4"], c3)], -1))
    c3_up = _up2x_bilinear(residual(p["up3"], c3_fused))
    c2_fused = residual(p["fuse3"],
                        jnp.concatenate([c3_up, residual(p["skip3"], c2)], -1))
    c2_up = _up2x_bilinear(residual(p["up2"], c2_fused))
    feat = residual(p["fuse2"],
                    jnp.concatenate([c2_up, residual(p["skip2"], c1)], -1))
    outs = [nn.conv2d(fp, feat, padding=0) for fp in p["finals"]]
    return jnp.concatenate(outs, axis=-1), feat
