"""centerNet regression head (model/centerNet.py:102-189): a 1-channel
ResNet-18 trunk + global average pool + fc to (B, joint_num, 3), used by
the reference to regress a coarse hand center/joints from a depth crop.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.models.kpfusion_rgbd.resunet import (
    resnet18_forward, resnet18_init,
)

Params = Dict[str, Any]


def centernet_init(key, joint_num: int = 21) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "backbone": resnet18_init(k1, in_channels=1),
        "fc": {"w": nn.kaiming_uniform(k2, (512, joint_num * 3)),
               "b": jnp.zeros((joint_num * 3,))},
    }


def centernet_forward(p: Params, x: jax.Array) -> jax.Array:
    """x (B, H, W, 1) depth crop -> (B, J, 3)."""
    feats = resnet18_forward(p["backbone"], x)
    pooled = feats[-1].mean(axis=(1, 2))
    out = nn.linear(p["fc"], pooled)
    return out.reshape(out.shape[0], -1, 3)
