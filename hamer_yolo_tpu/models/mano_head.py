"""MANO transformer-decoder regression head (HaMeR).

Parity (reference hamer/hamer/models/heads/mano_head.py:20-115 +
components/pose_transformer.py): a single query token (zeros, token_dim 1)
is embedded to dim 1024, gets a learned positional embedding, then runs
depth-6 [self-attn -> cross-attn(context = ViT tokens, context_dim 1280)
-> feed-forward] with pre-LN; three linear readouts produce residual IEF
updates on (6d pose 16x6=96, betas 10, cam 3) initialized from the MANO
mean parameters (mano_head.py:53-56, 81-98). IEF_ITERS = 1.

Head hyperparameters from configs_hydra/experiment/hamer_vit_transformer.yaml:33-42:
depth 6, heads 8, dim_head 64, mlp_dim 1024, context_dim 1280.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.geometry.rotations import rot6d_to_rotmat


@dataclass(frozen=True)
class ManoHeadConfig:
    dim: int = 1024
    context_dim: int = 1280
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    mlp_dim: int = 1024
    token_dim: int = 1  # 'zero' transformer input
    num_joints: int = 16  # global orient + 15 hand joints
    ief_iters: int = 1

    @property
    def npose(self) -> int:
        return 6 * self.num_joints


def identity_6d_mean_pose(num_joints: int = 16) -> np.ndarray:
    """Fallback mean pose when mano_mean_params.npz is unavailable:
    identity rotations in 6d rep ([1,0,0,0,1,0] per joint)."""
    return np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), num_joints)


def init_mano_head(
    key: jax.Array,
    cfg: ManoHeadConfig = ManoHeadConfig(),
    mean_pose_6d: Optional[np.ndarray] = None,
    mean_betas: Optional[np.ndarray] = None,
    mean_cam: Optional[np.ndarray] = None,
) -> nn.Params:
    keys = jax.random.split(key, cfg.depth * 3 + 5)
    layers = []
    for i in range(cfg.depth):
        k_sa, k_ca, k_ff = keys[3 * i], keys[3 * i + 1], keys[3 * i + 2]
        layers.append(
            {
                "sa_norm": nn.layer_norm_init(cfg.dim),
                "sa": nn.mha_qkv_init(k_sa, cfg.dim, cfg.heads, cfg.dim_head,
                                      qkv_bias=False, out_bias=True),
                "ca_norm": nn.layer_norm_init(cfg.dim),
                "ca": nn.cross_attention_init(k_ca, cfg.dim, cfg.context_dim,
                                              cfg.heads, cfg.dim_head),
                "ff_norm": nn.layer_norm_init(cfg.dim),
                "ff": nn.mlp_init(k_ff, cfg.dim, cfg.mlp_dim),
            }
        )
    k = cfg.depth * 3
    mean_pose = mean_pose_6d if mean_pose_6d is not None else identity_6d_mean_pose(cfg.num_joints)
    return {
        "token_embed": nn.linear_init(keys[k], cfg.token_dim, cfg.dim),
        "pos_embed": nn.trunc_normal(keys[k + 1], (1, 1, cfg.dim), std=1.0),
        "layers": layers,
        "decpose": nn.linear_init(keys[k + 2], cfg.dim, cfg.npose),
        "decshape": nn.linear_init(keys[k + 3], cfg.dim, 10),
        "deccam": nn.linear_init(keys[k + 4], cfg.dim, 3),
        "init_hand_pose": jnp.asarray(mean_pose, jnp.float32)[None],
        "init_betas": jnp.asarray(
            mean_betas if mean_betas is not None else np.zeros(10, np.float32)
        )[None],
        "init_cam": jnp.asarray(
            mean_cam if mean_cam is not None else np.array([0.9, 0.0, 0.0], np.float32)
        )[None],
    }


def mano_head_forward(
    params: nn.Params,
    context: jax.Array,
    cfg: ManoHeadConfig = ManoHeadConfig(),
) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """context: (B, N, context_dim) ViT tokens.

    Returns (pred_mano_params {global_orient (B,1,3,3), hand_pose (B,15,3,3),
    betas (B,10)}, pred_cam (B,3)).
    """
    B = context.shape[0]
    pred_pose = jnp.broadcast_to(params["init_hand_pose"].astype(context.dtype), (B, cfg.npose))
    pred_betas = jnp.broadcast_to(params["init_betas"].astype(context.dtype), (B, 10))
    pred_cam = jnp.broadcast_to(params["init_cam"].astype(context.dtype), (B, 3))

    for _ in range(cfg.ief_iters):
        token = jnp.zeros((B, 1, cfg.token_dim), context.dtype)
        x = nn.linear(params["token_embed"], token)
        x = x + params["pos_embed"].astype(x.dtype)
        for layer in params["layers"]:
            x = x + nn.mha_self_attention(layer["sa"], nn.layer_norm(layer["sa_norm"], x), cfg.heads)
            x = x + nn.cross_attention(layer["ca"], nn.layer_norm(layer["ca_norm"], x), context, cfg.heads)
            x = x + nn.mlp_gelu(layer["ff"], nn.layer_norm(layer["ff_norm"], x))
        tok = x[:, 0]
        pred_pose = nn.linear(params["decpose"], tok) + pred_pose
        pred_betas = nn.linear(params["decshape"], tok) + pred_betas
        pred_cam = nn.linear(params["deccam"], tok) + pred_cam

    # Rotation construction in f32 (Gram-Schmidt is precision-sensitive).
    rotmats = rot6d_to_rotmat(pred_pose.astype(jnp.float32).reshape(B, cfg.num_joints, 6))
    pred_mano = {
        "global_orient": rotmats[:, :1],
        "hand_pose": rotmats[:, 1:],
        "betas": pred_betas.astype(jnp.float32),
    }
    return pred_mano, pred_cam.astype(jnp.float32)
