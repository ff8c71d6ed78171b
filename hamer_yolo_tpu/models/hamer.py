"""HAMER: hand mesh recovery model (ViT-H backbone + MANO head + MANO LBS).

Parity target: HAMER_INFER.forward_step (reference
hamer/hamer/models/hamer.py:468-563):
  - center-crop the 256x256 input to 256x192 (x[:, :, :, 32:-32]);
  - ViT backbone -> token context;
  - MANO head -> (global_orient, hand_pose, betas) rotmats + weak-persp cam;
  - cam translation tz = 2 f / (IMAGE_SIZE * s + 1e-9) (hamer.py:525-527);
  - MANO LBS -> vertices (778), 21 OpenPose joints (meters);
  - crop-space 2D projection with focal f / IMAGE_SIZE (hamer.py:548-550).

The whole forward is one jittable pure function over (params, images).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.geometry.camera import cam_to_translation, perspective_projection
from hamer_yolo_tpu.models import mano as mano_lib
from hamer_yolo_tpu.models.mano_head import (
    ManoHeadConfig,
    init_mano_head,
    mano_head_forward,
)
from hamer_yolo_tpu.models.vit import VITH_CONFIG, ViTConfig, init_vit, vit_forward


@dataclass(frozen=True)
class HamerConfig:
    image_size: int = 256
    focal_length: float = 5000.0
    crop_margin: int = 32  # 256x256 -> 256x192 center crop
    vit: ViTConfig = field(default_factory=lambda: VITH_CONFIG)
    head: ManoHeadConfig = field(default_factory=ManoHeadConfig)
    # ImageNet stats used for input normalization (model config yaml).
    image_mean: tuple = (0.485, 0.456, 0.406)
    image_std: tuple = (0.229, 0.224, 0.225)
    # ToMe token merging: tokens merged per ViT layer (0 = off). The
    # reference enables r=(8,-1) via token_merge (hamer.py:481-483).
    tome_r: int = 0
    # Single-kernel Pallas MANO LBS (ops/mano_pallas.py; TPU only).
    fused_mano: bool = False
    # W8A8 int8 backbone (core/quant.py): params["backbone"] must hold
    # quantize_vit_params output. v5e doubles MXU peak at int8.
    int8_backbone: bool = False


def init_hamer(key: jax.Array, cfg: HamerConfig = HamerConfig()) -> nn.Params:
    k1, k2 = jax.random.split(key)
    return {
        "backbone": init_vit(k1, cfg.vit),
        "mano_head": init_mano_head(k2, cfg.head),
    }


def hamer_forward(
    params: nn.Params,
    mano_model: mano_lib.ManoModel,
    img: jax.Array,
    cfg: HamerConfig = HamerConfig(),
    attn_impl: Optional[Callable] = None,
) -> Dict[str, jax.Array]:
    """img: (B, 256, 256, 3) normalized RGB crop (NHWC).

    Returns the reference's output dict (pred_cam, pred_cam_t,
    pred_mano_params, pred_vertices, pred_keypoints_3d, pred_keypoints_2d,
    pose, betas, focal_length).
    """
    B = img.shape[0]
    m = cfg.crop_margin
    x = img[:, :, m:-m, :]  # (B, 256, 192, 3) NHWC center crop

    if cfg.tome_r > 0:
        # Composes with int8_backbone: vit_forward_tome routes the block
        # matmuls through the int8 ops when params are quantized.
        from hamer_yolo_tpu.models.tome import vit_forward_tome

        context = vit_forward_tome(params["backbone"], x, cfg.vit,
                                   r_per_layer=cfg.tome_r, attn_impl=attn_impl)
    elif cfg.int8_backbone:
        from hamer_yolo_tpu.core.quant import vit_forward_int8

        # attn_impl (the Pallas flash-attention knob) maps onto the int8
        # path's fused-softmax attention option.
        context = vit_forward_int8(params["backbone"], x, cfg.vit,
                                   attn_pallas=attn_impl is not None)
    else:
        context = vit_forward(params["backbone"], x, cfg.vit, attn_impl=attn_impl)
    pred_mano, pred_cam = mano_head_forward(params["mano_head"], context, cfg.head)
    # Geometry (MANO LBS, camera lift, projection) runs in f32.
    pred_mano = {k: v.astype(jnp.float32) for k, v in pred_mano.items()}
    pred_cam = pred_cam.astype(jnp.float32)

    pred_cam_t = cam_to_translation(pred_cam, cfg.focal_length, cfg.image_size)
    focal = jnp.full((B, 2), cfg.focal_length, jnp.float32)

    out = mano_lib.mano_forward_rotmat(
        mano_model,
        pred_mano["global_orient"],
        pred_mano["hand_pose"],
        pred_mano["betas"],
        fused=cfg.fused_mano,
    )
    kp2d = perspective_projection(
        out.joints,
        translation=pred_cam_t,
        focal_length=focal / cfg.image_size,
    )
    pose = jnp.concatenate([pred_mano["global_orient"], pred_mano["hand_pose"]], axis=1)
    return {
        "pred_cam": pred_cam,
        "pred_cam_t": pred_cam_t,
        "focal_length": focal,
        "pred_mano_params": pred_mano,
        "pose": pose,
        "betas": pred_mano["betas"],
        "pred_vertices": out.vertices,
        "pred_keypoints_3d": out.joints,
        "pred_keypoints_2d": kp2d,
    }
