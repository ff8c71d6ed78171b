"""Activation zoo (reference yolo/yolov7/utils/activations.py).

The reference ships swap-in modules — SiLU (:10), Hardswish in its
export-friendly hardtanh form (:15), Mish (:40), and FReLU (:65, a
depthwise 3x3 conv + BN funnel max). The MemoryEfficient* variants
(:22, :46) exist only to recompute the forward in torch's backward and
save activation memory — under JAX that concern is `jax.checkpoint`
(rematerialisation) applied at the call site, not a different function,
so they intentionally have no separate implementation here.

`conv_block(..., act=...)` accepts any of these callables in place of
the default SiLU; FReLU is parametric (depthwise conv + BN), so it goes
through `frelu_init` / a `partial(frelu, params)` closure.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn


def silu(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (activations.py:10-12)."""
    return x * jax.nn.sigmoid(x)


def hardswish(x: jax.Array) -> jax.Array:
    """x * hardtanh(x + 3, 0, 6) / 6 — the export-friendly form
    (activations.py:15-19)."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mish(x: jax.Array) -> jax.Array:
    """x * tanh(softplus(x)) (activations.py:40-43)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def frelu_init(key, c: int, k: int = 3) -> Dict[str, Any]:
    """FReLU funnel parameters: depthwise kxk conv (no bias) + BN
    (activations.py:65-72)."""
    p = {"conv": nn.conv_init(key, k, c, c, bias=False, groups=c)}
    p["bn"] = nn.batch_norm_init(c)
    return p


def frelu(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """max(x, BN(dwconv(x))) (activations.py:71-72). NHWC."""
    c = x.shape[-1]
    y = nn.conv2d(p["conv"], x, stride=1, padding=1, groups=c)
    # torch nn.BatchNorm2d default eps (1e-5), unlike YOLO Conv's 1e-3.
    return jnp.maximum(x, nn.batch_norm(p["bn"], y, eps=1e-5))


ACTIVATIONS = {"silu": silu, "hardswish": hardswish, "mish": mish}
