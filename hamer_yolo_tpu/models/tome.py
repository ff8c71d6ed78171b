"""ToMe token merging for the ViT backbone (inference speedup option).

Parity target: reference hamer/hamer/models/backbones/selective_vit_adapter.py
(bipartite soft matching, applied via apply_patch with r = (8, -1),
hamer.py:481-483). Re-designed for XLA's static-shape constraint:

- a STATIC per-layer merge count r (token count shrinks deterministically
  layer by layer, so every layer still compiles to fixed shapes);
- bipartite soft matching on token cosine similarity: even tokens (set A)
  propose their best match among odd tokens (set B); the r highest-
  similarity edges are merged (size-weighted average into the B token);
- merges are expressed as one-hot scatter matmuls (MXU-friendly) instead
  of dynamic gathers.

Sizes are tracked so repeated merges stay mass-conserving, matching the
reference's merge_wavg. Proportional attention is omitted (the adapter in
the reference also runs without it by default).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bipartite_soft_matching_merge(
    tokens: jax.Array, sizes: jax.Array, r: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge r tokens. tokens: (B, N, D); sizes: (B, N).

    Returns (tokens (B, N - r, D), sizes (B, N - r)).
    Layout of the output: [unmerged/merged B tokens..., kept A tokens...]
    with A = even input positions, B = odd input positions.
    """
    B, N, D = tokens.shape
    Na = (N + 1) // 2
    Nb = N // 2
    r = min(r, Na - 1)  # always keep at least one A token
    if r <= 0:
        return tokens, sizes

    a = tokens[:, ::2]
    b = tokens[:, 1::2]
    sa = sizes[:, ::2]
    sb = sizes[:, 1::2]

    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-6)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-6)
    scores = jnp.einsum("bad,bcd->bac", an, bn)  # (B, Na, Nb)

    node_max = jnp.max(scores, axis=-1)  # (B, Na)
    node_idx = jnp.argmax(scores, axis=-1)  # (B, Na) target B index per A

    # r most-similar A tokens get merged.
    _, merge_order = jax.lax.top_k(node_max, Na)
    merged_a = merge_order[:, :r]  # (B, r) indices into A
    kept_a = merge_order[:, r:]  # (B, Na - r)
    # Keep kept-A tokens in their original order (reference unm is sorted).
    kept_a = jnp.sort(kept_a, axis=-1)

    # Scatter merged A mass into B via one-hot matmuls.
    tgt = jnp.take_along_axis(node_idx, merged_a, axis=1)  # (B, r) B indices
    onehot_tgt = jax.nn.one_hot(tgt, Nb, dtype=tokens.dtype)  # (B, r, Nb)
    merged_feat = jnp.take_along_axis(a * sa[..., None], merged_a[..., None], axis=1)  # (B, r, D)
    merged_size = jnp.take_along_axis(sa, merged_a, axis=1)  # (B, r)

    add_feat = jnp.einsum("brn,brd->bnd", onehot_tgt, merged_feat)
    add_size = jnp.einsum("brn,br->bn", onehot_tgt, merged_size)

    new_sb = sb + add_size
    new_b = (b * sb[..., None] + add_feat) / new_sb[..., None]

    kept_feat = jnp.take_along_axis(a, kept_a[..., None], axis=1)
    kept_size = jnp.take_along_axis(sa, kept_a, axis=1)

    out_tokens = jnp.concatenate([new_b, kept_feat], axis=1)
    out_sizes = jnp.concatenate([new_sb, kept_size], axis=1)
    return out_tokens, out_sizes


def vit_forward_tome(params, x, cfg, r_per_layer: int = 4, attn_impl=None,
                     fused: bool | None = None, interpret: bool = False):
    """ViT forward with per-layer token merging (drop-in for vit_forward).

    Composes with W8A8: if ``params`` came from quantize_vit_params
    (leaves hold {"wq": ...}), the block matmuls route through the int8
    ops — ToMe shrinks N while int8 doubles MXU rate, multiplicative.
    ``fused``/``interpret`` mirror quant.vit_forward_int8 (tests force
    fused=True, interpret=True on CPU; None = TPU autodispatch).
    """
    import os

    from hamer_yolo_tpu.core import nn

    quantized = "wq" in params["blocks"][0]["attn"]["qkv"]
    if quantized:
        from hamer_yolo_tpu.core import quant

        # int8 param dicts hold {"wq": ...} leaves a bf16 attn_impl can't
        # read — the quantized dispatch always wins over an override. On
        # TPU the Pallas fused-quantize GEMM (ops/int8_matmul.py) makes
        # int8 and ToMe compose positively: ToMe shrinks the GEMMs while
        # the per-token quantize cost rides inside the matmul kernel.
        # Same A/B pin as vit_forward_int8: HYT_INT8_FUSED=0 forces the
        # unfused composition (also how eval_fastpaths pins static-scale
        # semantics at small eval batches).
        if fused is None:
            fused = (quant._on_tpu()
                     and os.environ.get("HYT_INT8_FUSED", "1") != "0")
        attn = quant.int8_mha_self_attention
        mlp = quant.int8_mlp_gelu
    else:
        fused = False
        attn = attn_impl or nn.mha_self_attention
        mlp = nn.mlp_gelu
    B = x.shape[0]
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    tok = nn.conv2d(params["patch_embed"], x, stride=cfg.patch_size,
                    padding=cfg.patch_padding).reshape(B, -1, cfg.embed_dim)
    pos = params["pos_embed"].astype(tok.dtype)
    tok = tok + pos[:, 1:] + pos[:, :1]
    sizes = jnp.ones(tok.shape[:2], tok.dtype)
    for blk in params["blocks"]:
        if fused:
            # Same qualified megakernel dispatch as quant.vit_forward_int8
            # (attention via int8_block_attn_residual's HYT_ATTN default,
            # MLP via int8_block_mlp_residual's HYT_INT8_MLP default) —
            # ToMe-shrunk N just means fewer M tiles per call; the kernels
            # are shape-generic.
            tok = quant.int8_block_attn_residual(blk, tok, cfg.num_heads,
                                                 interpret=interpret)
            tok, sizes = bipartite_soft_matching_merge(tok, sizes, r_per_layer)
            tok = quant.int8_block_mlp_residual(blk, tok, interpret=interpret)
        else:
            tok = tok + attn(blk["attn"], nn.layer_norm(blk["norm1"], tok),
                             cfg.num_heads)
            tok, sizes = bipartite_soft_matching_merge(tok, sizes, r_per_layer)
            tok = tok + mlp(blk["mlp"], nn.layer_norm(blk["norm2"], tok))
    return nn.layer_norm(params["last_norm"], tok)
