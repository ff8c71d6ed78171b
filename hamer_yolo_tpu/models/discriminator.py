"""HMR-style adversarial pose/shape discriminator (HaMeR training).

Parity: reference hamer/hamer/models/discriminator.py:4-98 — per-joint
1x1 "conv" critics over 15 hand-joint rotmats (flattened 9-dim each),
a betas MLP critic, and an all-joints MLP critic; outputs 25 logits
(15 per-joint + 1 shape + 1 full-pose ... reference emits 15+1+1 -> 17?
The HMR lineage uses 15 joint outputs, 1 shape, 1 joint-ensemble = 17;
kept as D_OUT below).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

NUM_JOINTS = 15
EMBED = 32


def init_discriminator(key: jax.Array) -> Dict[str, Any]:
    keys = jax.random.split(key, 6 + NUM_JOINTS)
    return {
        # shared per-joint embedding (2 x 1x1 conv over joints)
        "conv1": nn.linear_init(keys[0], 9, EMBED),
        "conv2": nn.linear_init(keys[1], EMBED, EMBED),
        # per-joint linear critics
        "joint_out": [nn.linear_init(keys[2 + j], EMBED, 1) for j in range(NUM_JOINTS)],
        # betas critic
        "shape_fc1": nn.linear_init(keys[2 + NUM_JOINTS], 10, 10),
        "shape_fc2": nn.linear_init(keys[3 + NUM_JOINTS], 10, 5),
        "shape_out": nn.linear_init(keys[4 + NUM_JOINTS], 5, 1),
        # full-pose critic
        "pose_fc1": nn.linear_init(keys[5 + NUM_JOINTS], EMBED * NUM_JOINTS, 1024),
        "pose_fc2": nn.linear_init(jax.random.fold_in(keys[5 + NUM_JOINTS], 1), 1024, 1024),
        "pose_out": nn.linear_init(jax.random.fold_in(keys[5 + NUM_JOINTS], 2), 1024, 1),
    }


def discriminator_forward(params: Dict[str, Any], hand_pose: jax.Array,
                          betas: jax.Array) -> jax.Array:
    """hand_pose: (B, 15, 3, 3) rotmats; betas: (B, 10) -> (B, 17) logits."""
    B = hand_pose.shape[0]
    x = hand_pose.reshape(B, NUM_JOINTS, 9)
    e = jax.nn.relu(nn.linear(params["conv1"], x))
    e = jax.nn.relu(nn.linear(params["conv2"], e))  # (B, 15, EMBED)
    joint_logits = jnp.concatenate(
        [nn.linear(params["joint_out"][j], e[:, j]) for j in range(NUM_JOINTS)], axis=-1
    )  # (B, 15)
    s = jax.nn.relu(nn.linear(params["shape_fc1"], betas))
    s = jax.nn.relu(nn.linear(params["shape_fc2"], s))
    shape_logit = nn.linear(params["shape_out"], s)  # (B, 1)
    p = jax.nn.relu(nn.linear(params["pose_fc1"], e.reshape(B, -1)))
    p = jax.nn.relu(nn.linear(params["pose_fc2"], p))
    pose_logit = nn.linear(params["pose_out"], p)  # (B, 1)
    return jnp.concatenate([joint_logits, shape_logit, pose_logit], axis=-1)
