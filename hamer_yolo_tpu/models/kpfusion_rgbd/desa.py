"""DESA: depth-enhanced multi-scale keypoint feature aggregation
(model/model.py:132-208).

For each of three radii, ball-query-group the (point cloud + joint nodes)
around every joint, embed grouped relative xyz and residual features with
1x1 convs + BN + ReLU, max-pool over the group, concat the scales with
the node features, and fuse with a 1x1 conv1d + BN + ReLU.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.ops.pointnet import query_and_group

Params = Dict[str, Any]
BN_EPS = 1e-5


def _conv1x1_init(key, c_in: int, c_out: int) -> Params:
    return {"conv": nn.conv_init(key, 1, c_in, c_out, bias=True),
            "bn": nn.batch_norm_init(c_out)}


def _conv1x1_bn(p: Params, x: jax.Array) -> jax.Array:
    """x (..., C) -> conv1x1 + BN (channel-last over the final dim)."""
    y = jnp.einsum("...c,cd->...d", x,
                   p["conv"]["w"][0, 0]) + p["conv"]["b"]
    return nn.batch_norm(p["bn"], y, eps=BN_EPS)


def desa_init(key, in_channel: int = 128, mlp: Sequence[int] = (128, 128),
              n_scales: int = 3) -> Params:
    keys = jax.random.split(key, n_scales * (2 + len(mlp) - 1) + 1)
    ki = 0
    scales: List[Params] = []
    for _ in range(n_scales):
        sp: Params = {
            "l0": _conv1x1_init(keys[ki], 3, mlp[0]),
            "f0": _conv1x1_init(keys[ki + 1], in_channel, mlp[0]),
            "mlp": [],
        }
        ki += 2
        last = mlp[0]
        for c in mlp[1:]:
            sp["mlp"].append(_conv1x1_init(keys[ki], last, c))
            ki += 1
            last = c
        scales.append(sp)
    return {
        "scales": scales,
        "fusion": _conv1x1_init(keys[ki], in_channel + mlp[-1] * n_scales,
                                in_channel),
    }


def desa_forward(p: Params, pcl_feat: jax.Array, node_feat: jax.Array,
                 pcl_xyz: jax.Array, node_xyz: jax.Array,
                 S: Sequence[int] = (64, 64, 64),
                 radius: Sequence[float] = (0.1, 0.2, 0.4)) -> jax.Array:
    """pcl_feat (B, N, C), node_feat (B, J, C), pcl_xyz (B, N, 3),
    node_xyz (B, J, 3) -> (B, J, C) (DESA.forward, model/model.py:181-208)."""
    xyz_exp = jnp.concatenate([pcl_xyz, node_xyz], axis=1)
    feat_exp = jnp.concatenate([pcl_feat, node_feat], axis=1)
    outs = []
    for i, sp in enumerate(p["scales"]):
        grouped = query_and_group(xyz_exp, node_xyz, feat_exp,
                                  radius[i], S[i])        # (B, J, K, 3+C)
        gxyz = grouped[..., :3] / radius[i]
        gfeat = grouped[..., 3:] - node_feat[:, :, None, :]
        h = jax.nn.relu(_conv1x1_bn(sp["l0"], gxyz)
                        + _conv1x1_bn(sp["f0"], gfeat))
        for mp in sp["mlp"]:
            h = jax.nn.relu(_conv1x1_bn(mp, h))
        outs.append(jnp.max(h, axis=2))                   # (B, J, C')
    outs.append(node_feat)
    concat = jnp.concatenate(outs, axis=-1)
    return jax.nn.relu(_conv1x1_bn(p["fusion"], concat))
