"""Training step for the layer-exact KPFusion RGBD net.

Reference: KeypointFusion train.py:194-265 (Trainer.train) with the
config.py hyperparameters — stage_type [1,1,2,3,2,3], coord_weight 100,
deconv_weight 1, spatial_weight 10 per KFAM stage (gated to the first
``spatial_epoch``=24 epochs), feature_type 'weight_offset' with
feature_para [0.8], AdamW lr 8e-4 wd 0.01 + StepLR(gamma=0.1).

Stage losses (SmoothL1 = model/loss.py:3-26, the reference's custom
0.01-knee variant — NOT torch.nn.SmoothL1Loss):
- type 1 (both UNet backbones): dense pixel loss on the first 4J offset
  channels vs GFM.joint2offset(uvd_gt) + coordinate loss on the
  offset2joint_weight decode, both against the DEPTH crop's pixels
  (train.py:216-224 passes ``img`` to joint2feature/feature2joint for
  the RGB stream too);
- type 2/3 (each KFAM refined_3d / refined_2d output): coordinate
  SmoothL1 vs xyz_gt (train.py:237-240);
- spatial-weight maps: SmoothL1 vs max-normalized gaussian heatmaps of
  uvd_gt (sigma 3 for the first KFAM stage, 2 after — train.py:250-260).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from hamer_yolo_tpu.models.kpfusion_rgbd import geometry as G
from hamer_yolo_tpu.models.kpfusion_rgbd.model import (
    KPFusionConfig, init_kpfusion, kpfusion_forward,
)

Params = Dict[str, Any]

COORD_WEIGHT = 100.0   # config.py:68
DECONV_WEIGHT = 1.0    # config.py:69
SPATIAL_WEIGHT = 10.0  # config.py:70
SPATIAL_EPOCH = 24     # config.py:71


def smooth_l1(x: jax.Array, y: jax.Array) -> jax.Array:
    """The reference's custom SmoothL1Loss (model/loss.py:3-26): quadratic
    0.5 z^2 inside |z| < 0.01, linear 0.01(|z| - 0.005) outside, each
    branch averaged over the LAST axis before the batch mean."""
    z = x - y
    az = jnp.abs(z)
    mse_mask = (az < 0.01).astype(z.dtype)
    l1_mask = 1.0 - mse_mask
    per = jnp.mean(0.5 * z * z * mse_mask, axis=-1) \
        + jnp.mean(0.01 * (az - 0.005) * l1_mask, axis=-1)
    return jnp.mean(per)


def kpfusion_rgbd_loss(
    params: Params,
    batch: Dict[str, jax.Array],
    cfg: KPFusionConfig,
    epoch: jax.Array | int = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One training loss evaluation. ``batch`` keys mirror the reference
    loader tuple (train.py:203): img_rgb (B,3,S,S), img (B,1,S,S) depth,
    pcl (B,N,3), xyz_gt/uvd_gt (B,J,3), center, M, cube, cam_para."""
    out = kpfusion_forward(params, batch["img_rgb"], batch["img"],
                           batch["pcl"], batch["center"], batch["M"],
                           batch["cube"], batch["cam_para"], cfg)
    results = out["results"]
    uvd_gt, xyz_gt = batch["uvd_gt"], batch["xyz_gt"]
    img = batch["img"]
    fs = results[0].shape[-1]
    J = cfg.joint_num

    metrics: Dict[str, jax.Array] = {}
    loss = jnp.zeros(())

    # GT dense features from the depth crop (train.py:217: joint2feature
    # on ``img`` for every type-1 stage, RGB backbone included).
    pixel_gt = G.joint2offset(uvd_gt, img, cfg.kernel, fs)      # (B, 4J, fs, fs)
    for idx, name in ((0, "d"), (1, "rgb")):                    # stage_type 1
        pixel_pd = results[idx]                                 # (B, 5J, fs, fs)
        loss_pixel = smooth_l1(pixel_pd[:, : 4 * J], pixel_gt) * DECONV_WEIGHT
        joint_uvd = G.offset2joint_weight(pixel_pd, img, cfg.kernel)
        loss_coord = smooth_l1(joint_uvd, uvd_gt) * COORD_WEIGHT
        loss = loss + loss_pixel + loss_coord
        metrics[f"pixel_{name}"] = loss_pixel
        metrics[f"coord_{name}"] = loss_coord

    # KFAM stages (stage_type 2/3): coordinate loss on every refined set.
    for i, r in enumerate(results[2:]):
        lc = smooth_l1(r, xyz_gt) * COORD_WEIGHT
        loss = loss + lc
        metrics[f"coord_kfam_{i}"] = lc

    # Spatial-weight heatmap supervision, first SPATIAL_EPOCH epochs only.
    gate = (jnp.asarray(epoch) <= SPATIAL_EPOCH).astype(jnp.float32)
    for i, sw in enumerate(out["spatial_weights"]):
        sigma = 3.0 if i == 0 else 2.0
        hm = G.joint2heatmap(uvd_gt[:, :, :2], cfg.kernel, fs, sigma=sigma)
        hm = hm / jnp.maximum(jnp.max(hm), 1e-8)
        lsw = smooth_l1(sw, hm) * SPATIAL_WEIGHT * gate
        loss = loss + lsw
        metrics[f"spatial_{i}"] = lsw

    metrics["loss"] = loss
    return loss, metrics


def make_optimizer(lr: float = 8e-4, steps_per_epoch: int = 1000,
                   step_size_epochs: int = 30) -> optax.GradientTransformation:
    """AdamW(lr 8e-4, wd 0.01) + StepLR(gamma 0.1) — train.py:91,120."""
    sched = optax.exponential_decay(
        lr, transition_steps=step_size_epochs * steps_per_epoch,
        decay_rate=0.1, staircase=True)
    return optax.adamw(sched, weight_decay=0.01)


def init_train_state(key: jax.Array, cfg: KPFusionConfig,
                     tx: optax.GradientTransformation):
    params = init_kpfusion(key, cfg)
    return params, tx.init(params)


def make_train_step(cfg: KPFusionConfig, tx: optax.GradientTransformation):
    def step(params, opt_state, batch, epoch):
        (_, metrics), grads = jax.value_and_grad(
            kpfusion_rgbd_loss, has_aux=True)(params, batch, cfg, epoch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def synthetic_rgbd_batch(rng, batch_size: int, cfg: KPFusionConfig):
    """Plausibly-scaled random batch in the reference's normalized spaces."""
    import numpy as np

    B, N, J, S = batch_size, cfg.sample_num, cfg.joint_num, cfg.img_size
    center = rng.uniform(200, 800, (B, 3)).astype(np.float32)
    center[:, 2] = rng.uniform(300, 700, B)
    M = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    cube = np.tile(np.array([250.0, 250.0, 250.0], np.float32), (B, 1))
    cam = np.tile(np.array([475.06, 475.06, 315.94, 245.29], np.float32),
                  (B, 1))
    return {
        "img_rgb": rng.uniform(0, 1, (B, 3, S, S)).astype(np.float32),
        "img": rng.uniform(-1, 1, (B, 1, S, S)).astype(np.float32),
        "pcl": rng.uniform(-1, 1, (B, N, 3)).astype(np.float32),
        "uvd_gt": rng.uniform(-0.8, 0.8, (B, J, 3)).astype(np.float32),
        "xyz_gt": rng.uniform(-0.8, 0.8, (B, J, 3)).astype(np.float32),
        "center": center, "M": M, "cube": cube, "cam_para": cam,
    }
