"""Block_KPFusion + 2-stage KPFusion (model/model.py:211-430).

The full RGB-D fusion pipeline: depth + RGB ResNet-UNet streams emit dense
offset/heatmap/weight maps and 128-d feature maps; the depth offsets decode
to initial joints; point-cloud features are gathered from both image
streams via the img->pcl index; each of the two KFAM stages runs DESA
aggregation, an intra-modal BERT encoder (init_TR), a heatmap/GAM-gated
RGB keypoint readout, a cross-modal DETR decoder (updatedDecoder), and a
final BERT readout (final_TR) producing refined joints.

Pure functions over a params pytree; image tensors cross this module in
the reference's NCHW layout (converted once from the NHWC UNet outputs)
so every gather/flatten matches the torch code line by line.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.models.kpfusion_rgbd import geometry as G
from hamer_yolo_tpu.models.kpfusion_rgbd.bert import (
    kp_interaction, kp_interaction_init,
)
from hamer_yolo_tpu.models.kpfusion_rgbd.desa import desa_forward, desa_init
from hamer_yolo_tpu.models.kpfusion_rgbd.resunet import unet_forward, unet_init
from hamer_yolo_tpu.models.kpfusion_rgbd.transfusion import (
    decoder_forward, decoder_init,
)

Params = Dict[str, Any]
BN_EPS = 1e-5


@dataclass(frozen=True)
class KPFusionConfig:
    joint_num: int = 21
    dim: int = 128
    num_stages: int = 2
    img_size: int = 128       # crop resolution (config.py input_size)
    feature_size: int = 32    # UNet output stride 4
    kernel: float = 0.8       # feature_para[0]
    heads: int = 4
    sample_num: int = 1024    # point cloud size (config.py point_num)
    flip: float = 1.0


def _lin_init(key, i, o):
    # KPFusion._init_weights: Linear ~ N(0, 0.001) (model/model.py:278-286)
    return {"w": 0.001 * jax.random.normal(key, (i, o)), "b": jnp.zeros((o,))}


def _emb_init(key, c_in: int, c_out: int) -> Params:
    """Conv1d(k=1) + BN1d."""
    return {"conv": _lin_init(key, c_in, c_out), "bn": nn.batch_norm_init(c_out)}


def _emb(p: Params, x: jax.Array) -> jax.Array:
    """(B, N, C_in) -> (B, N, C_out), channel-last conv1d + BN1d."""
    return nn.batch_norm(p["bn"], nn.linear(p["conv"], x), eps=BN_EPS)


def init_block(key, cfg: KPFusionConfig) -> Params:
    J, C = cfg.joint_num, cfg.dim
    keys = jax.random.split(key, 12)
    return {
        "pcl_feat_emb": _emb_init(keys[0], C, C),
        "pcl_xyz_emb": _emb_init(keys[1], 3, C),
        "pcl_pose_emb": _emb_init(keys[2], J * 5, C),
        "joint_feat_emb": _emb_init(keys[3], C, C),
        "joint_xyz_emb": _emb_init(keys[4], 3, C),
        "pcl_feat_emb_RGB": _emb_init(keys[5], C, C),
        "FA": desa_init(keys[6], C, (C, C)),
        # hidden == C (reference hidden 128 with dim 128, model.py:225-247);
        # tying them keeps scaled-down test configs consistent.
        "init_TR": kp_interaction_init(keys[7], C, hidden=C),
        "final_TR": kp_interaction_init(keys[8], C + 3, hidden=C),
        "crossTR": decoder_init(keys[9], "updated", J, C, C, 4),
        "atten_spatial": _lin_init(keys[10], C + J, J),
        "fc_spatial": _lin_init(keys[11], cfg.feature_size ** 2, 1),
        "weight_dis": jnp.zeros((1,)),
    }


def block_forward(
    p: Params,
    cfg: KPFusionConfig,
    img_feat: jax.Array,          # (B, C, H, W) depth-stream features
    img_feat_rgb: jax.Array,      # (B, C, H, W)
    pcl: jax.Array,               # (B, N, 3)
    joint_xyz: jax.Array,         # (B, J, 3)
    pcl_closeness: jax.Array,     # (B, N, k)
    pcl_index: jax.Array,         # (B, N, k)
    img_offset: jax.Array,        # (B, 5J, fs, fs) depth offsets (detached)
    updated_2d_feature: Optional[jax.Array],
    img_down: jax.Array,          # (B, 1, H, W) nearest-downsampled depth
    center: jax.Array, M: jax.Array, cube: jax.Array, cam_para: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Block_KPFusion.forward (model/model.py:289-355)."""
    B, C, H, W = img_feat.shape
    J = cfg.joint_num
    N = pcl.shape[1]

    joint_xyz = jax.lax.stop_gradient(joint_xyz)
    pcl_offset_xyz = jax.lax.stop_gradient(
        G.pcl_joint2offset(joint_xyz, pcl, cfg.kernel))       # (B, N, 4J)

    # gather image features at the point-cloud pixels
    k = pcl_index.shape[-1]
    idx_flat = pcl_index.reshape(B, 1, N * k)

    def gather_feat(feat_bchw):
        Cp = feat_bchw.shape[1]
        flat = feat_bchw.reshape(B, Cp, H * W)
        g = jnp.take_along_axis(flat, jnp.broadcast_to(idx_flat, (B, Cp, N * k)),
                                axis=2).reshape(B, Cp, N, k)
        return jnp.transpose(jnp.sum(g * pcl_closeness[:, None], axis=-1),
                             (0, 2, 1))                       # (B, N, Cp)

    pcl_feat0 = gather_feat(img_feat)
    pcl_feat_rgb = gather_feat(img_feat_rgb)
    pcl_weight = jax.lax.stop_gradient(
        gather_feat(img_offset[:, J * 4:]))                    # (B, N, J)

    pcl_feat = jax.nn.relu(
        _emb(p["pcl_feat_emb"], pcl_feat0)
        + _emb(p["pcl_xyz_emb"], pcl)
        + _emb(p["pcl_pose_emb"],
               jnp.concatenate([pcl_weight, pcl_offset_xyz], axis=-1)))
    pcl_feat = jax.nn.relu(pcl_feat + _emb(p["pcl_feat_emb_RGB"], pcl_feat_rgb))

    attention = jax.nn.softmax(jnp.transpose(pcl_weight, (0, 2, 1)), axis=-1)
    joint_feat = attention @ pcl_feat                          # (B, J, C)
    joint_feat = jax.nn.relu(_emb(p["joint_feat_emb"], joint_feat)
                             + _emb(p["joint_xyz_emb"], joint_xyz))
    joint_feat = desa_forward(p["FA"], pcl_feat, joint_feat, pcl, joint_xyz)

    # intra-modal interaction
    out_init, refined_3d = kp_interaction(p["init_TR"], joint_feat, cfg.heads)

    # RGB keypoint aggregation gated by heatmap + GAM
    hm = G.joint2heatmap(refined_3d[:, :, :2], cfg.kernel, H, sigma=1.0)
    img_down_nhwc = jnp.transpose(img_down, (0, 2, 3, 1))
    gam = G.img2anchor_dis(refined_3d, img_down_nhwc, center, M, cube,
                           cam_para, cfg.img_size, flip=cfg.flip)
    sp_in = jnp.concatenate([img_feat_rgb, hm], axis=1)        # (B, C+J, H, W)
    sp_logit = jnp.einsum("bchw,cj->bjhw",
                          sp_in, p["atten_spatial"]["w"]) \
        + p["atten_spatial"]["b"][None, :, None, None]
    spatial_weight = jax.nn.sigmoid(sp_logit)                  # (B, J, H, W)
    w = jax.nn.sigmoid(p["weight_dis"])[0]
    gate = w * gam[:, :, None] + (1.0 - w) * spatial_weight[:, :, None]
    rgb_j = jax.nn.relu(gate * img_feat_rgb[:, None])          # (B, J, C, H, W)
    rgb_j = rgb_j.reshape(B, J, C, H * W)
    img_feat_j = (rgb_j @ p["fc_spatial"]["w"])[..., 0] + p["fc_spatial"]["b"]
    if updated_2d_feature is not None:
        img_feat_j = jax.nn.relu((img_feat_j + updated_2d_feature) / 2.0)

    # inter-modal interaction
    refined_joint_feat = decoder_forward(p["crossTR"], "updated",
                                         img_feat_j, out_init, cfg.heads)
    refined_joint_feat = jnp.concatenate([refined_3d, refined_joint_feat], -1)
    _, refined_2d = kp_interaction(p["final_TR"], refined_joint_feat, cfg.heads)

    return refined_3d, refined_2d, img_feat_j, spatial_weight


def init_kpfusion(key, cfg: KPFusionConfig = KPFusionConfig()) -> Params:
    J = cfg.joint_num
    keys = jax.random.split(key, 2 + cfg.num_stages)
    return {
        "backbone_rgb": unet_init(keys[0], J, 3, cfg.dim,
                                  [J * 3, J, J]),
        "backbone_d": unet_init(keys[1], J, 1, cfg.dim, [J * 3, J, J]),
        "blocks": [init_block(keys[2 + i], cfg) for i in range(cfg.num_stages)],
    }


def kpfusion_forward(
    params: Params,
    img_rgb: jax.Array,   # (B, 3, S, S) RGB crop in [0, 1] (NCHW)
    img: jax.Array,       # (B, 1, S, S) normalized depth crop [-1, 1]
    pcl: jax.Array,       # (B, N, 3) normalized point cloud
    center: jax.Array, M: jax.Array, cube: jax.Array, cam_para: jax.Array,
    cfg: KPFusionConfig = KPFusionConfig(),
) -> Dict[str, Any]:
    """KPFusion.forward (model/model.py:398-429)."""
    B = img.shape[0]
    J = cfg.joint_num

    off_d_nhwc, feat_d_nhwc = unet_forward(
        params["backbone_d"], jnp.transpose(img, (0, 2, 3, 1)))
    off_rgb_nhwc, feat_rgb_nhwc = unet_forward(
        params["backbone_rgb"], jnp.transpose(img_rgb, (0, 2, 3, 1)))
    img_offset = jnp.transpose(off_d_nhwc, (0, 3, 1, 2))
    img_offset_rgb = jnp.transpose(off_rgb_nhwc, (0, 3, 1, 2))
    img_feat = jnp.transpose(feat_d_nhwc, (0, 3, 1, 2))
    img_feat_rgb = jnp.transpose(feat_rgb_nhwc, (0, 3, 1, 2))

    joint_uvd = jax.lax.stop_gradient(
        G.offset2joint_weight(img_offset, img, cfg.kernel))
    img_offset_sg = jax.lax.stop_gradient(img_offset)

    H = img_feat.shape[2]
    img_down = G._resize_nearest_torch(img, H)
    joint_xyz = G.uvd_nl2xyznl(joint_uvd, center, M, cube, cam_para,
                               cfg.img_size, cfg.flip)
    img_down_nhwc = jnp.transpose(img_down, (0, 2, 3, 1))
    pcl_closeness, pcl_index = G.img2pcl_index(
        pcl, img_down_nhwc, center, M, cube, cam_para, cfg.img_size,
        select_num=4, flip=cfg.flip)

    results: List[jax.Array] = [img_offset, img_offset_rgb]
    spatial_weights = []
    updated: Optional[jax.Array] = None
    for i in range(cfg.num_stages):
        r3d, r2d, updated, sw = block_forward(
            params["blocks"][i], cfg, img_feat, img_feat_rgb, pcl,
            joint_xyz, pcl_closeness, pcl_index, img_offset_sg, updated,
            img_down, center, M, cube, cam_para)
        results.append(r3d)
        results.append(r2d)
        spatial_weights.append(sw)
        joint_xyz = r2d

    return {"results": results, "spatial_weights": spatial_weights,
            "joint_uvd_init": joint_uvd, "joints": results[-1]}
