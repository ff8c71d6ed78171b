"""ViT-Huge (ViTPose-H) backbone for HaMeR, TPU-first.

Architecture parity (reference hamer/hamer/models/backbones/vit.py:12-24,
168, 320-339): input (256, 192) RGB crop, patch-embed conv k16 s16 pad4
(-> 16x12 = 192 tokens), embed 1280, depth 32, 16 heads, mlp_ratio 4,
qkv_bias, learned absolute pos-embed with a cls slot whose embedding is
*added* to every token (vit.py:327: x + pos[1:] + pos[:1]), pre-LN blocks,
plain softmax attention, final LayerNorm; output is the token sequence
(B, 192, 1280).

TPU design notes: tokens stay (B, 192, 1280) — 192 = 1.5 MXU tiles and
1280 = 10 lanes of 128, so every matmul tiles cleanly. Attention can route
through the Pallas flash kernel (ops/attention.py) via ``attn_impl``.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn


@dataclass(frozen=True)
class ViTConfig:
    img_size: tuple = (256, 192)  # (H, W) after the pipeline's center crop
    patch_size: int = 16
    # PatchEmbed conv padding: the reference computes 4 + 2*(ratio//2 - 1)
    # with ratio=1 => **2** (vit.py:168) — not 4 as a quick read suggests.
    # Verified against the live reference module by the composed parity
    # test (tests/test_pipeline_parity.py).
    patch_padding: int = 2
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    # bf16 activations (params stay f32; nn.* casts weights per-op). The
    # MXU natively computes bf16 x bf16 -> f32; this halves HBM traffic
    # and roughly doubles matmul throughput vs f32 on v5e.
    compute_dtype: str = "bfloat16"
    # Train-time stochastic depth (reference vit() drop_path_rate=0.55,
    # linearly ramped over depth). Active only when vit_forward gets an rng.
    drop_path_rate: float = 0.55

    @property
    def grid_hw(self) -> tuple:
        h = (self.img_size[0] + 2 * self.patch_padding - self.patch_size) // self.patch_size + 1
        w = (self.img_size[1] + 2 * self.patch_padding - self.patch_size) // self.patch_size + 1
        return h, w

    @property
    def num_tokens(self) -> int:
        h, w = self.grid_hw
        return h * w


VITH_CONFIG = ViTConfig()


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def init_vit(key: jax.Array, cfg: ViTConfig = VITH_CONFIG) -> nn.Params:
    keys = jax.random.split(key, cfg.depth + 2)
    d = cfg.embed_dim
    params = {
        "patch_embed": nn.conv_init(keys[0], cfg.patch_size, 3, d, bias=True),
        "pos_embed": nn.trunc_normal(keys[1], (1, cfg.num_tokens + 1, d)),
        "blocks": [],
        "last_norm": nn.layer_norm_init(d),
    }
    for i in range(cfg.depth):
        k1, k2 = jax.random.split(keys[2 + i])
        params["blocks"].append(
            {
                "norm1": nn.layer_norm_init(d),
                "attn": nn.mha_qkv_init(k1, d, cfg.num_heads, qkv_bias=cfg.qkv_bias),
                "norm2": nn.layer_norm_init(d),
                "mlp": nn.mlp_init(k2, d, int(d * cfg.mlp_ratio)),
            }
        )
    return params


def vit_forward(
    params: nn.Params,
    x: jax.Array,
    cfg: ViTConfig = VITH_CONFIG,
    attn_impl: Optional[Callable] = None,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """x: (B, H, W, 3) normalized crop -> (B, N_tokens, embed_dim).

    ``attn_impl(attn_params, tokens) -> tokens`` overrides the attention op
    (e.g. Pallas flash attention); defaults to the XLA softmax path.
    ``rng`` enables train-time stochastic depth (per-sample residual drop
    with the reference's linear depth ramp); None = deterministic eval.
    """
    attn = attn_impl or nn.mha_self_attention
    B = x.shape[0]
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    tok = nn.conv2d(
        params["patch_embed"], x,
        stride=cfg.patch_size, padding=cfg.patch_padding,
    )  # (B, Hp, Wp, D)
    tok = tok.reshape(B, -1, cfg.embed_dim)
    pos = params["pos_embed"].astype(tok.dtype)
    tok = tok + pos[:, 1:] + pos[:, :1]

    depth = len(params["blocks"])

    def drop_path(residual, layer_idx, key):
        if rng is None or cfg.drop_path_rate <= 0.0:
            return residual
        rate = cfg.drop_path_rate * layer_idx / max(depth - 1, 1)
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, (B, 1, 1)).astype(residual.dtype)
        return residual * mask / keep

    # Fused LN + qkv GEMM + softmax attention in one Pallas call with the
    # qkv weight resident in VMEM (ops/attention_pallas.fused_bf16_attn_block)
    # — the roadmap's fused LN+QKV block for the exact path. A/B-qualified
    # TPU DEFAULT for inference (BENCH_AB_INT8=0 tools/bench_attn_ab.py,
    # b128: mega_bf16 163.2 fps vs fusedqkv 157.1 / direct 143.6 / einsum
    # 136.6 — exact math now beats the 161-fps V100 baseline).
    # HYT_ATTN_BF16=off disables, =megakernel forces (trace-time env).
    import os

    _env_bf16 = os.environ.get("HYT_ATTN_BF16")
    mega = (rng is None and attn_impl is None
            and (_env_bf16 == "megakernel"
                 or (_env_bf16 is None and _on_tpu())))
    if mega:
        from hamer_yolo_tpu.ops.attention_pallas import fused_bf16_attn_block

    keys = jax.random.split(rng, 2 * depth) if rng is not None else [None] * (2 * depth)
    for i, blk in enumerate(params["blocks"]):
        if mega:
            # HYT_ATTN_BF16_G: crops per grid step, LN+qkv GEMM
            # flattened over (G*N) rows (bit-identical across values,
            # perf-only grouped-GEMM restructure).
            pre = fused_bf16_attn_block(
                tok, blk["attn"]["qkv"]["w"], blk["attn"]["qkv"].get("b"),
                blk["norm1"]["scale"], blk["norm1"]["bias"], cfg.num_heads,
                group=max(1, int(os.environ.get("HYT_ATTN_BF16_G", "1"))))
            a = nn.linear(blk["attn"]["proj"], pre)
        else:
            a = attn(blk["attn"], nn.layer_norm(blk["norm1"], tok),
                     cfg.num_heads)
        tok = tok + drop_path(a, i, keys[2 * i])
        m = nn.mlp_gelu(blk["mlp"], nn.layer_norm(blk["norm2"], tok))
        tok = tok + drop_path(m, i, keys[2 * i + 1])
    return nn.layer_norm(params["last_norm"], tok)
