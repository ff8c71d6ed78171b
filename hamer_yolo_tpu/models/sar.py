"""SAR mesh model + RootNet absolute-depth head (RootNet branch).

Parity targets (reference rootnet/Model_RGB.py):
- SoftHeatmap (:76-99): per-keypoint 1x1 grouped "beta" conv -> spatial
  softmax -> soft-argmax (x, y) expectation.
- GraphConv (:101-117): learned-adjacency graph conv with row-normalized
  laplacian L = D^-1 A.
- SAIGB (:119-136): groups the backbone feature map into num_FMs
  per-vertex feature maps (1x1 conv to 778*num_FMs channels + LeakyReLU
  0.1) and concatenates the MANO template xyz per vertex.
- GBBMR (:138-176): two GraphConv stacks regress per-vertex xy-heatmaps
  and z-maps (32x32), mesh->pose linear lift (mesh2pose), soft-argmax
  decode, z = sum(latent_hm * z_map); uv normalized to [-1, 1].
- SAR (:223-237): backbone (resnet34 trunk or convnext-base) -> SARhead;
  output (B, 799, 3) uvd (778 verts + 21 joints).
- ResRootNet (:240-300): GAP backbone feature -> 1x1 conv -> gamma;
  absolute depth = gamma * k_value (k from calculate_k, :494-498).

feature_size = (input 256 / 32)^2 = 64 per FM, in_dim = 8*64 + 3 = 515.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.models.convnext import convnext_forward, init_convnext
from hamer_yolo_tpu.models.resnet import init_resnet34, resnet34_forward

Params = Dict[str, Any]


@dataclass(frozen=True)
class SarConfig:
    backbone: str = "resnet34"  # or "convnext" (base)
    input_size: int = 256
    num_verts: int = 778
    num_joints: int = 21
    num_fms: int = 8
    heatmap_size: int = 32
    feature_hw: int = 8  # 256 / 32
    cam_para: Tuple[float, float, float, float] = (906.96, 906.79, 960.0, 540.0)
    bbox_real: Tuple[float, float] = (0.3, 0.3)
    compute_dtype: str = "bfloat16"

    @property
    def num_total(self) -> int:
        return self.num_verts + self.num_joints

    @property
    def feature_size(self) -> int:
        return self.feature_hw * self.feature_hw

    @property
    def backbone_channels(self) -> int:
        return 512 if self.backbone == "resnet34" else 1024

    @property
    def graph_in_dim(self) -> int:
        return self.num_fms * self.feature_size + 3


def graph_conv_init(key, num_nodes: int, in_dim: int, out_dim: int) -> Params:
    return {
        "fc": nn.linear_init(key, in_dim, out_dim),
        "adj": jnp.eye(num_nodes),
    }


def graph_conv(p: Params, x: jax.Array) -> jax.Array:
    """x: (B, N, F). L = D^-1 A with learned A."""
    A = p["adj"].astype(x.dtype)
    D = jnp.sum(A, axis=1, keepdims=True) + 1e-5
    L = A / D
    return nn.linear(p["fc"], jnp.einsum("nm,bmf->bnf", L, x))


def soft_heatmap_init(key, kp_num: int) -> Params:
    # grouped 1x1 conv == per-keypoint scalar weight (beta), no bias.
    return {"beta": jnp.ones((kp_num,))}


def soft_heatmap(p: Params, hm: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """hm: (B, K, S, S) -> (uv (B, K, 2) in pixels, scoremap (B, K, S, S))."""
    B, K, S, _ = hm.shape
    scaled = hm * p["beta"].astype(hm.dtype)[None, :, None, None]
    flat = jax.nn.softmax(scaled.reshape(B, K, S * S), axis=-1)
    score = flat.reshape(B, K, S, S)
    wx = jnp.arange(S, dtype=hm.dtype)
    sx = jnp.sum(score, axis=2) @ wx  # sum over rows -> col marginal . x
    sy = jnp.sum(score, axis=3) @ wx
    return jnp.stack([sx, sy], axis=-1), score


def init_sar_head(key, template: jax.Array, cfg: SarConfig = SarConfig()) -> Params:
    keys = jax.random.split(key, 8)
    hs2 = cfg.heatmap_size ** 2
    return {
        "saigb": {
            "group": nn.conv_init(keys[0], 1, cfg.backbone_channels,
                                  cfg.num_fms * cfg.num_verts, bias=True),
            "template": template,  # (778, 3)
        },
        "reg_xy1": graph_conv_init(keys[1], cfg.num_verts, cfg.graph_in_dim, hs2),
        "reg_xy2": graph_conv_init(keys[2], cfg.num_verts, hs2, hs2),
        "reg_z1": graph_conv_init(keys[3], cfg.num_verts, cfg.graph_in_dim, hs2),
        "reg_z2": graph_conv_init(keys[4], cfg.num_verts, hs2, hs2),
        "mesh2pose_hm": nn.linear_init(keys[5], cfg.num_verts, cfg.num_joints),
        "mesh2pose_dm": nn.linear_init(keys[6], cfg.num_verts, cfg.num_joints),
        "soft_heatmap": soft_heatmap_init(keys[7], cfg.num_total),
    }


def sar_head_forward(p: Params, feats: jax.Array, cfg: SarConfig = SarConfig()) -> jax.Array:
    """feats: (B, 8, 8, C) backbone map -> (B, 799, 3) uvd.

    uv in [-1, 1] (normalized by heatmap_size/2 - 1), z unnormalized.
    """
    B = feats.shape[0]
    S = cfg.heatmap_size
    # SAIGB: group into per-vertex features + template concat.
    g = jax.nn.leaky_relu(nn.conv2d(p["saigb"]["group"], feats, 1, 0), 0.1)
    # channel layout (num_FMs*num_vert) matches torch view(-1, V, FMs*fsize):
    # torch conv output channels [v0f0..v0f7? actually fm-major v-minor?]
    # torch: view(-1, num_vert, fsize*num_FMs) over (B, FMs*V, 8, 8) flattened
    # channel-major: channels split as (num_FMs*num_vert) -> reshape uses
    # row-major so vertex index varies fastest within...  conv channels
    # order c = fm * V + v?  nn.Conv2d output channel c corresponds to
    # filter c; the subsequent .view(-1, V, fsize*FMs) groups channels as
    # (V, FMs) blocks: c = v * FMs + f.  We mirror that: reshape to
    # (B, 8, 8, V, FMs) then (B, V, FMs * 64).
    g = g.reshape(B, cfg.feature_hw, cfg.feature_hw, cfg.num_verts, cfg.num_fms)
    g = jnp.transpose(g, (0, 3, 4, 1, 2)).reshape(B, cfg.num_verts, -1)
    template = jnp.broadcast_to(
        p["saigb"]["template"].astype(g.dtype), (B, cfg.num_verts, 3)
    )
    init_graph = jnp.concatenate([g, template], axis=-1)  # (B, V, in_dim)

    hm_xy = graph_conv(p["reg_xy2"], jax.nn.leaky_relu(graph_conv(p["reg_xy1"], init_graph), 0.1))
    hm_z = graph_conv(p["reg_z2"], jax.nn.leaky_relu(graph_conv(p["reg_z1"], init_graph), 0.1))
    hm_xy = hm_xy.reshape(B, cfg.num_verts, S, S)
    hm_z = hm_z.reshape(B, cfg.num_verts, S, S)

    # mesh -> pose heatmaps via linear combination over the vertex axis.
    hm_xy_j = jnp.einsum("bvhw,vj->bjhw", hm_xy, p["mesh2pose_hm"]["w"]) + \
        p["mesh2pose_hm"]["b"][None, :, None, None]
    hm_z_j = jnp.einsum("bvhw,vj->bjhw", hm_z, p["mesh2pose_dm"]["w"]) + \
        p["mesh2pose_dm"]["b"][None, :, None, None]

    hm_all = jnp.concatenate([hm_xy, hm_xy_j], axis=1)
    zm_all = jnp.concatenate([hm_z, hm_z_j], axis=1)
    uv, latent = soft_heatmap(p["soft_heatmap"], hm_all)
    z = jnp.sum((latent * zm_all).reshape(B, cfg.num_total, -1), axis=-1, keepdims=True)
    uv = uv / (S // 2) - 1.0
    return jnp.concatenate([uv, z], axis=-1).astype(jnp.float32)


def init_sar(key: jax.Array, template: jax.Array, cfg: SarConfig = SarConfig()) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.backbone == "resnet34":
        backbone = init_resnet34(k1)
    else:
        backbone = init_convnext(k1, "base")
    return {
        "backbone": backbone,
        "head": init_sar_head(k2, template, cfg),
        "rootnet": {"depth_layer": nn.conv_init(k3, 1, cfg.backbone_channels, 1, bias=True)},
    }


def sar_backbone_forward(params: Params, x: jax.Array, cfg: SarConfig = SarConfig()) -> jax.Array:
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    if cfg.backbone == "resnet34":
        return resnet34_forward(params["backbone"], x)
    return convnext_forward(params["backbone"], x, "base")


def sar_forward(params: Params, x: jax.Array, cfg: SarConfig = SarConfig()) -> jax.Array:
    """Full SAR: (B, 256, 256, 3) normalized patch -> (B, 799, 3) uvd."""
    feats = sar_backbone_forward(params, x, cfg)
    return sar_head_forward(params["head"], feats, cfg)


def rootnet_depth(params: Params, feats: jax.Array, k_value: jax.Array) -> jax.Array:
    """ResRootNet.forward_coord: GAP -> 1x1 conv -> gamma; depth = gamma * k.

    feats: (B, h, w, C); k_value: (B,). Returns (B,) absolute depth.
    """
    pooled = nn.avg_pool_global(feats.astype(jnp.float32))[:, None, None, :]
    gamma = nn.conv2d(params["rootnet"]["depth_layer"], pooled, 1, 0)[:, 0, 0, 0]
    return gamma * k_value


def estimate_root_depth(
    params: Params,
    patch: jax.Array,
    k_value: jax.Array,
    cfg: SarConfig = SarConfig(),
) -> jax.Array:
    """Parity with EstimateRGB.estimate_root_depth_custom (Model_RGB.py:572-639):
    backbone features only (the hook path) -> rootnet depth."""
    feats = sar_backbone_forward(params, patch, cfg)
    return rootnet_depth(params, feats, k_value)
