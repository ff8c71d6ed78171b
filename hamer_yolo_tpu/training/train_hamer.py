"""HaMeR training step (optax + pjit; DP over "data", TP over "model").

Parity with the reference LightningModule training (hamer.py:269-448):
manual two-optimizer adversarial setup — generator (backbone + head) with
AdamW lr 1e-5 wd 1e-4, discriminator with its own AdamW; keypoint-2d/3d
L1 + MANO parameter MSE + LSGAN adversarial term with the yaml weights.

The step is a pure function; under a Mesh, batch arrays arrive sharded
over "data" and XLA inserts the gradient psum (DDP equivalent).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hamer_yolo_tpu.models.discriminator import discriminator_forward, init_discriminator
from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward, init_hamer
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.training.losses import (
    HAMER_LOSS_WEIGHTS,
    adversarial_disc_loss,
    adversarial_gen_loss,
    keypoint_2d_loss,
    keypoint_3d_loss,
    parameter_loss,
)


class HamerTrainState(NamedTuple):
    params: Any
    opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    step: jax.Array


def make_optimizers(lr: float = 1e-5, weight_decay: float = 1e-4):
    gen_tx = optax.adamw(lr, weight_decay=weight_decay)
    disc_tx = optax.adamw(lr, weight_decay=weight_decay)
    return gen_tx, disc_tx


def init_train_state(
    key: jax.Array,
    cfg: HamerConfig,
    lr: float = 1e-5,
    weight_decay: float = 1e-4,
) -> Tuple[HamerTrainState, Tuple[Any, Any]]:
    k1, k2 = jax.random.split(key)
    params = init_hamer(k1, cfg)
    disc_params = init_discriminator(k2)
    gen_tx, disc_tx = make_optimizers(lr, weight_decay)
    return (
        HamerTrainState(
            params=params,
            opt_state=gen_tx.init(params),
            disc_params=disc_params,
            disc_opt_state=disc_tx.init(disc_params),
            step=jnp.zeros((), jnp.int32),
        ),
        (gen_tx, disc_tx),
    )


def hamer_loss_fn(
    params: Any,
    disc_params: Any,
    mano_model: ManoModel,
    batch: Dict[str, jax.Array],
    cfg: HamerConfig,
    weights: Dict[str, float] = HAMER_LOSS_WEIGHTS,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    out = hamer_forward(params, mano_model, batch["img"], cfg)
    losses = {
        "keypoints_2d": keypoint_2d_loss(out["pred_keypoints_2d"], batch["keypoints_2d"]),
        "keypoints_3d": keypoint_3d_loss(out["pred_keypoints_3d"], batch["keypoints_3d"]),
        "global_orient": parameter_loss(
            out["pred_mano_params"]["global_orient"],
            batch["mano_global_orient"], batch["has_mano_params"],
        ),
        "hand_pose": parameter_loss(
            out["pred_mano_params"]["hand_pose"],
            batch["mano_hand_pose"], batch["has_mano_params"],
        ),
        "betas": parameter_loss(
            out["pred_mano_params"]["betas"], batch["mano_betas"], batch["has_mano_params"]
        ),
    }
    fake_logits = discriminator_forward(
        disc_params, out["pred_mano_params"]["hand_pose"], out["pred_mano_params"]["betas"]
    )
    losses["adversarial"] = adversarial_gen_loss(fake_logits)
    total = sum(weights[k] * v for k, v in losses.items())
    aux = dict(losses, total=total,
               pred_hand_pose=out["pred_mano_params"]["hand_pose"],
               pred_betas=out["pred_mano_params"]["betas"])
    return total, aux


def make_train_step(mano_model: ManoModel, cfg: HamerConfig, gen_tx, disc_tx):
    """Returns a jittable (state, batch) -> (state, metrics) function."""

    def train_step(state: HamerTrainState, batch: Dict[str, jax.Array]):
        (gen_loss, aux), grads = jax.value_and_grad(hamer_loss_fn, has_aux=True)(
            state.params, state.disc_params, mano_model, batch, cfg
        )
        updates, new_opt = gen_tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # Discriminator step on (real mocap params, generated params).
        def disc_loss_fn(dp):
            real = discriminator_forward(dp, batch["mocap_hand_pose"], batch["mocap_betas"])
            fake = discriminator_forward(
                dp,
                jax.lax.stop_gradient(aux["pred_hand_pose"]),
                jax.lax.stop_gradient(aux["pred_betas"]),
            )
            return adversarial_disc_loss(real, fake)

        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(state.disc_params)
        d_updates, new_d_opt = disc_tx.update(d_grads, state.disc_opt_state, state.disc_params)
        new_disc = optax.apply_updates(state.disc_params, d_updates)

        metrics = {k: v for k, v in aux.items() if not k.startswith("pred_")}
        metrics["disc_loss"] = d_loss
        new_state = HamerTrainState(
            params=new_params, opt_state=new_opt,
            disc_params=new_disc, disc_opt_state=new_d_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def synthetic_batch(key: jax.Array, batch_size: int, cfg: HamerConfig) -> Dict[str, jax.Array]:
    """Random training batch with the full annotation schema (tests/dryrun)."""
    ks = jax.random.split(key, 8)
    eye = jnp.broadcast_to(jnp.eye(3), (batch_size, 15, 3, 3))
    kp2d = jax.random.normal(ks[1], (batch_size, 21, 3))
    kp2d = kp2d.at[..., 2].set(jax.random.uniform(ks[5], (batch_size, 21)))
    kp3d = jax.random.normal(ks[2], (batch_size, 21, 4))
    kp3d = kp3d.at[..., 3].set(jax.random.uniform(ks[6], (batch_size, 21)))
    return {
        "img": jax.random.normal(ks[0], (batch_size, cfg.image_size, cfg.image_size, 3)),
        "keypoints_2d": kp2d,
        "keypoints_3d": kp3d,
        "mano_global_orient": jnp.broadcast_to(jnp.eye(3), (batch_size, 1, 3, 3)),
        "mano_hand_pose": eye,
        "mano_betas": jax.random.normal(ks[3], (batch_size, 10)) * 0.1,
        "has_mano_params": jnp.ones((batch_size,)),
        "mocap_hand_pose": eye,
        "mocap_betas": jax.random.normal(ks[4], (batch_size, 10)) * 0.1,
    }
