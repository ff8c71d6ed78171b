"""Optimizers / schedules / EMA for training parity.

Reference yolo/yolov7/train.py:
- SGD momentum 0.937 nesterov, lr0 0.01, weight decay 5e-4 applied ONLY
  to conv/linear weights (param group pg1; biases and norm scales exempt,
  train.py:119-160);
- OneCycle cosine LR: lf(x) = (1 - x/epochs) * (1 - lrf) + lrf with
  lrf = 0.1 ... the v7 hyp uses a cosine one-cycle (one_cycle in
  utils.general): y = lrf + (1 - lrf) * (1 + cos(pi x / T)) / 2;
- 3-epoch linear warmup with per-group warmup biases (train.py:298-306);
- ModelEMA decay d = 0.9999 * (1 - exp(-updates / 2000))
  (utils/torch_utils.py ModelEMA).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


def one_cycle_cosine(lr0: float, lrf: float, total_steps: int) -> Callable[[int], float]:
    """y(t) = lr0 * (lrf + (1 - lrf) * (1 + cos(pi t / T)) / 2)."""

    def schedule(step):
        x = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return lr0 * (lrf + (1.0 - lrf) * (1.0 + jnp.cos(jnp.pi * x)) / 2.0)

    return schedule


def warmup_wrap(schedule: Callable, warmup_steps: int, warmup_bias_lr: float = 0.1):
    def wrapped(step):
        warm = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        return jnp.where(step < warmup_steps, warm * schedule(step), schedule(step))

    return wrapped


def _is_decay_param(path_str: str, leaf) -> bool:
    """Weight decay applies to matrices/conv kernels, not biases/norms."""
    if getattr(leaf, "ndim", 0) < 2:
        return False
    for k in ("bn", "norm", "scale", "bias", "pos_embed", "implicit"):
        if k in path_str:
            return False
    return True


def decay_mask(params: Any) -> Any:
    def one(path, leaf):
        pstr = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return _is_decay_param(pstr, leaf)

    return jax.tree_util.tree_map_with_path(one, params)


def yolo_optimizer(
    params: Any,
    lr0: float = 0.01,
    lrf: float = 0.1,
    momentum: float = 0.937,
    weight_decay: float = 5e-4,
    total_steps: int = 10000,
    warmup_steps: int = 300,
) -> optax.GradientTransformation:
    schedule = warmup_wrap(one_cycle_cosine(lr0, lrf, total_steps), warmup_steps)
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=decay_mask(params)),
        optax.sgd(schedule, momentum=momentum, nesterov=True),
    )


class EmaState(NamedTuple):
    params: Any
    updates: jax.Array


def ema_init(params: Any) -> EmaState:
    return EmaState(params=jax.tree_util.tree_map(jnp.asarray, params),
                    updates=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, new_params: Any, decay: float = 0.9999,
               tau: float = 2000.0) -> EmaState:
    """ModelEMA ramped decay: d = decay * (1 - exp(-updates / tau))."""
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    ema = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, new_params
    )
    return EmaState(params=ema, updates=updates)
