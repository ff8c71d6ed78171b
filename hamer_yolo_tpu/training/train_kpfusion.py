"""KPFusion (RGBD) training step.

Reference rootnet/KeypointFusion/train.py: joint-coordinate regression
loss over the refinement trajectory (deep supervision on every decoder
stage), heatmap supervision on the hourglass output, Adam. DP over the
mesh as elsewhere.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from hamer_yolo_tpu.models.kpfusion import KPFusionConfig, init_kpfusion, kpfusion_forward


class KPFusionTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def init_kpfusion_train_state(
    key: jax.Array, cfg: KPFusionConfig, lr: float = 1e-4, with_mesh: bool = False
) -> Tuple[KPFusionTrainState, optax.GradientTransformation]:
    params = init_kpfusion(key, cfg, with_mesh=with_mesh)
    tx = optax.adam(lr)
    return KPFusionTrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def heatmap_targets(joint_uv_norm: jax.Array, size: int, sigma: float = 1.5
                    ) -> jax.Array:
    """(B, J, 2) normalized uv in [-1, 1] -> (B, size, size, J) gaussians."""
    xs = jnp.linspace(-1.0, 1.0, size)
    gx = joint_uv_norm[..., 0][:, None, None, :] - xs[None, None, :, None]
    gy = joint_uv_norm[..., 1][:, None, None, :] - xs[None, :, None, None]
    d2 = gx ** 2 + gy ** 2
    cell = 2.0 / size
    return jnp.exp(-d2 / (2.0 * (sigma * cell) ** 2))


def kpfusion_loss(params, batch: Dict[str, jax.Array], cfg: KPFusionConfig
                  ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    out = kpfusion_forward(params, batch["img"], batch["depth"], batch["pcl"], cfg)
    gt = batch["joints_xyz"]
    # deep supervision: every trajectory stage regresses the target
    traj = out["trajectory"]  # (B, n_stages, J, 3)
    joint_l1 = jnp.abs(traj - gt[:, None]).mean()
    # heatmap supervision on the hourglass output
    hm = out["heatmaps"]
    hm_gt = heatmap_targets(gt[..., :2], hm.shape[1])
    hm_loss = jnp.mean((jax.nn.sigmoid(hm) - hm_gt) ** 2)
    if "mesh_xyz" in out and "mesh_xyz" in batch:
        mesh_l1 = jnp.abs(out["mesh_xyz"] - batch["mesh_xyz"]).mean()
    else:
        mesh_l1 = 0.0
    total = joint_l1 + 0.5 * hm_loss + mesh_l1
    return total, {"total": total, "joint_l1": joint_l1, "heatmap": hm_loss}


def make_kpfusion_train_step(cfg: KPFusionConfig, tx: optax.GradientTransformation):
    def step(state: KPFusionTrainState, batch):
        (_, metrics), grads = jax.value_and_grad(kpfusion_loss, has_aux=True)(
            state.params, batch, cfg)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return KPFusionTrainState(new_params, new_opt, state.step + 1), metrics

    return step


def synthetic_kpfusion_batch(key: jax.Array, batch_size: int, cfg: KPFusionConfig
                             ) -> Dict[str, jax.Array]:
    ks = jax.random.split(key, 4)
    return {
        "img": jax.random.normal(ks[0], (batch_size, cfg.img_size, cfg.img_size, 3)),
        "depth": jax.random.uniform(ks[1], (batch_size, cfg.img_size, cfg.img_size, 1),
                                    minval=0.3, maxval=0.8),
        "pcl": jax.random.normal(ks[2], (batch_size, cfg.num_points, 3)) * 0.1 + 0.5,
        "joints_xyz": jax.random.normal(ks[3], (batch_size, cfg.num_joints, 3)) * 0.3,
    }
