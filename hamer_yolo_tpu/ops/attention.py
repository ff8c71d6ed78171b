"""Attention kernels: Pallas flash attention for the ViT-H backbone.

The ViT-H sequence is short (192 tokens), so attention here is not a
memory-capacity problem (SURVEY.md 5: flash attention is a latency
optimization for this workload, not a necessity). We provide:

- ``flash_mha_self_attention`` — drop-in replacement for
  nn.mha_self_attention that routes QK^T/softmax/V through the official
  Pallas TPU flash-attention kernel
  (jax.experimental.pallas.ops.tpu.flash_attention), fusing the three
  attention matmuls and keeping the (N, N) logits out of HBM;
- automatic fallback to the XLA path off-TPU (CPU tests, interpret mode).

Usage: pass ``attn_impl=flash_mha_self_attention`` into
vit_forward/hamer_forward/infer_frame.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def flash_mha_self_attention(p: Dict[str, Any], x: jax.Array, num_heads: int) -> jax.Array:
    """Same contract as nn.mha_self_attention: x (B, N, D) -> (B, N, D)."""
    B, N, _ = x.shape
    h = num_heads
    hd = p["qkv"]["w"].shape[1] // 3 // h
    qkv = nn.linear(p["qkv"], x).reshape(B, N, 3, h, hd)
    q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))  # (B, h, N, hd)
    k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
    v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))

    if _on_tpu() and N % 128 == 0:
        # Long sequences: the official streaming flash kernel.
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention,
        )

        bq = min(128, N)
        bk = min(128, N)
        blocks = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        )
        out = flash_attention(q, k, v, causal=False, sm_scale=hd ** -0.5,
                              block_sizes=blocks)
    elif _on_tpu():
        # Short sequences (ViT-H's 192 tokens): single-block fused kernel.
        from hamer_yolo_tpu.ops.attention_pallas import fused_short_attention

        out = fused_short_attention(q, k, v)
    else:
        scale = hd ** -0.5
        logits = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        out = jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(logits, -1), v)

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, h * hd)
    return nn.linear(p["proj"], out)
