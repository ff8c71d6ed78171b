"""YOLOv7 training step (optax SGD + OneCycle + EMA, DP over a mesh).

Equivalent of reference yolo/yolov7/train.py:41-545 minus the torch
plumbing: the DDP/NCCL/SyncBN/AMP machinery collapses into a jitted pure
step over a batch-sharded mesh (gradient psum inserted by XLA), bf16
activations replace AMP, and EMA is a pytree fold (training/optim.py).
Training uses the train-form (BN unfused, RepConv branches) parameters:
``init_yolov7(..., deploy=False)``; blocks.repconv_fuse +
nn.fold_bn_into_conv produce the deploy graph afterwards.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hamer_yolo_tpu.models.yolov7.model import (
    YOLOV7_ANCHORS, YoloConfig, init_yolov7, yolov7_backbone_forward,
    yolov7_train_forward,
)
from hamer_yolo_tpu.training.losses import yolo_loss
from hamer_yolo_tpu.training.optim import EmaState, ema_init, ema_update, yolo_optimizer


class YoloTrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EmaState
    step: jax.Array


def init_yolo_train_state(
    key: jax.Array, cfg: YoloConfig, total_steps: int = 10000, spec=None,
    opt_kwargs: Dict[str, float] | None = None,
) -> Tuple[YoloTrainState, optax.GradientTransformation]:
    """opt_kwargs: lr0/lrf/momentum/weight_decay overrides — e.g. from a
    reference hyp yaml via training/hyp.load_hyp_yaml."""
    params = init_yolov7(key, cfg, deploy=False, spec=spec)
    tx = yolo_optimizer(params, total_steps=total_steps,
                        **(opt_kwargs or {}))
    return YoloTrainState(
        params=params, opt_state=tx.init(params), ema=ema_init(params),
        step=jnp.zeros((), jnp.int32),
    ), tx


def make_yolo_train_step(cfg: YoloConfig, tx: optax.GradientTransformation,
                         spec=None, assigner: str = "neighbor",
                         ota_topk: int = 10,
                         loss_kwargs: Dict[str, float] | None = None):
    """spec: optional model spec (yaml_spec). If it ends in AUXDET (a
    cfg/training/*.yaml IAuxDetect model), the step trains train_aux.py
    style: lead + aux maps split and fed to the ComputeLossAuxOTA
    equivalent (assigner="simota", ota_topk=20 for exact parity)."""
    from hamer_yolo_tpu.models.yolov7.model import AUXDET, split_aux_maps

    anchors = jnp.asarray(
        np.asarray(cfg.anchors, np.float32).reshape(cfg.nl, cfg.na, 2))
    is_aux = spec is not None and spec[-1][1] == AUXDET

    def loss_fn(params, batch):
        # batch-stat BN forward; updated running stats ride in aux
        maps, params_with_stats = yolov7_train_forward(params, batch["img"],
                                                       cfg, spec=spec)
        if is_aux:
            lead, aux = split_aux_maps(maps, spec)
            out = yolo_loss(
                [m.astype(jnp.float32) for m in lead],
                batch["targets"], anchors, cfg.strides, cfg.nc,
                assigner=assigner, ota_topk=ota_topk,
                aux_maps=[m.astype(jnp.float32) for m in aux],
                **(loss_kwargs or {}),
            )
        else:
            out = yolo_loss(
                [m.astype(jnp.float32) for m in maps],
                batch["targets"], anchors, cfg.strides, cfg.nc,
                assigner=assigner, ota_topk=ota_topk,
                **(loss_kwargs or {}),
            )
        return out["loss"], (out, params_with_stats)

    def _bn_keys(path_str):
        return "bn" in path_str

    def train_step(state: YoloTrainState, batch: Dict[str, jax.Array]):
        (_, (metrics, stats_params)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # Fold the updated BN running stats (mean/var only — scale/bias
        # came through the optimizer) into the new params.
        def merge(path, new_leaf, stats_leaf):
            keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
            if keys and keys[-1] in ("mean", "var"):
                return stats_leaf
            return new_leaf

        new_params = jax.tree_util.tree_map_with_path(merge, new_params, stats_params)
        new_ema = ema_update(state.ema, new_params)
        return YoloTrainState(new_params, new_opt, new_ema, state.step + 1), metrics

    return train_step


def synthetic_yolo_batch(key: jax.Array, batch_size: int, img_size: int = 320,
                         max_targets: int = 8, nc: int = 3) -> Dict[str, jax.Array]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_valid = 4
    cls = jax.random.randint(k2, (batch_size, max_targets, 1), 0, nc).astype(jnp.float32)
    cxy = jax.random.uniform(k3, (batch_size, max_targets, 2), minval=0.2, maxval=0.8)
    wh = jax.random.uniform(k4, (batch_size, max_targets, 2), minval=0.05, maxval=0.3)
    valid = (jnp.arange(max_targets) < n_valid)[None, :, None]
    targets = jnp.concatenate([cls, cxy, wh * valid], axis=-1)
    return {
        "img": jax.random.uniform(k1, (batch_size, img_size, img_size, 3)),
        "targets": targets,
    }
