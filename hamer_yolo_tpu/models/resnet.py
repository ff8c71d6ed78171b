"""ResNet-34 trunk (torchvision-compatible) for the SAR/RootNet backbone.

Parity: reference rootnet/Model_RGB.py:179-196 (``SARresnet34``) wraps
torchvision resnet34: conv1(7x7/2) + bn + relu + maxpool(3x3/2) + layer1..4
(BasicBlock x [3, 4, 6, 3]), output stride 32, 512 channels. RootNet's
depth head consumes the final (B, H/32, W/32, 512) feature map.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

Params = Dict[str, Any]

RESNET34_LAYERS = (3, 4, 6, 3)
RESNET34_CHANNELS = (64, 128, 256, 512)


def _basic_block_init(key, c_in: int, c_out: int, stride: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "conv1": nn.conv_init(k1, 3, c_in, c_out),
        "bn1": nn.batch_norm_init(c_out),
        "conv2": nn.conv_init(k2, 3, c_out, c_out),
        "bn2": nn.batch_norm_init(c_out),
    }
    if stride != 1 or c_in != c_out:
        p["down"] = nn.conv_init(k3, 1, c_in, c_out)
        p["down_bn"] = nn.batch_norm_init(c_out)
    return p


def _basic_block(p: Params, x: jax.Array, stride: int) -> jax.Array:
    y = jax.nn.relu(nn.batch_norm(p["bn1"], nn.conv2d(p["conv1"], x, stride=stride, padding=1), eps=1e-5))
    y = nn.batch_norm(p["bn2"], nn.conv2d(p["conv2"], y, stride=1, padding=1), eps=1e-5)
    if "down" in p:
        x = nn.batch_norm(p["down_bn"], nn.conv2d(p["down"], x, stride=stride, padding=0), eps=1e-5)
    return jax.nn.relu(x + y)


def init_resnet34(key: jax.Array) -> Params:
    keys = jax.random.split(key, 2 + sum(RESNET34_LAYERS))
    params: Params = {
        "conv1": nn.conv_init(keys[0], 7, 3, 64),
        "bn1": nn.batch_norm_init(64),
        "stages": [],
    }
    ki = 1
    c_in = 64
    for stage, (n, c_out) in enumerate(zip(RESNET34_LAYERS, RESNET34_CHANNELS)):
        blocks = []
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            blocks.append(_basic_block_init(keys[ki], c_in, c_out, stride))
            ki += 1
            c_in = c_out
        params["stages"].append(blocks)
    return params


def resnet34_forward(params: Params, x: jax.Array) -> jax.Array:
    """x: (B, H, W, 3) -> (B, H/32, W/32, 512)."""
    y = jax.nn.relu(nn.batch_norm(params["bn1"], nn.conv2d(params["conv1"], x, stride=2, padding=3), eps=1e-5))
    y = nn.max_pool(y, 3, 2, padding=1)
    for stage, blocks in enumerate(params["stages"]):
        for b, blk in enumerate(blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            y = _basic_block(blk, y, stride)
    return y
