"""DETR-style cross-modal decoders (model/transfusion_head.py).

``TransformerDecoderLayer`` (:97-177, cross_only configuration): post-LN
cross-attention (torch MultiheadAttention semantics, fused in_proj) with
learned or sinusoidal positional embeddings added to query/key/value,
then a ReLU FFN. The three inventoried decoder variants:

- ``detrDecoder`` (:563):   query pos = learned per-joint embedding,
                            key pos = DETR sine embedding over the image
                            grid; keys = flattened image features.
- ``updatedDecoder`` (:638): both pos learned per-joint; keys = per-joint
                            features (this is what Block_KPFusion uses).
- ``spatial_aggregate_TR`` (:714): queries = image grid with sine pos,
                            keys = per-joint features with learned pos.

All decoders return the LAST layer's output in the reference's (B, C, P)
layout.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

Params = Dict[str, Any]


def detr_sine_position_embedding(H: int, W: int, embedding_dim: int = 64,
                                 temperature: float = 10000.0,
                                 normalize: bool = True) -> np.ndarray:
    """(H*W, 2*embedding_dim) sine embedding (transfusion_head.py:59-95);
    static given the grid shape."""
    scale = 2 * math.pi
    y = np.cumsum(np.ones((H, W), np.float32), axis=0)
    x = np.cumsum(np.ones((H, W), np.float32), axis=1)
    if normalize:
        y = y / (y[-1:, :] + 1e-6) * scale
        x = x / (x[:, -1:] + 1e-6) * scale
    dim_t = np.arange(embedding_dim, dtype=np.float32)
    dim_t = temperature ** (2 * np.floor(dim_t / 2) / embedding_dim)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])],
                  axis=3).reshape(H, W, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])],
                  axis=3).reshape(H, W, -1)
    return np.concatenate([py, px], axis=2).reshape(H * W, 2 * embedding_dim)


def _mha(p: Params, q: jax.Array, k: jax.Array, v: jax.Array,
         heads: int) -> jax.Array:
    """torch nn.MultiheadAttention (batch-second reference uses (L, B, C);
    here (B, L, C)): fused in_proj rows [q; k; v], scaled by head_dim."""
    B, Lq, C = q.shape
    hd = C // heads
    wq, wk, wv = (p["in_proj_w"][:, i * C:(i + 1) * C] for i in range(3))
    bq, bk, bv = (p["in_proj_b"][i * C:(i + 1) * C] for i in range(3))
    qh = (q @ wq + bq).reshape(B, Lq, heads, hd).transpose(0, 2, 1, 3)
    kh = (k @ wk + bk).reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    vh = (v @ wv + bv).reshape(B, -1, heads, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax((qh / math.sqrt(hd)) @ jnp.swapaxes(kh, -1, -2), -1)
    out = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, Lq, C)
    return nn.linear(p["out_proj"], out)


def decoder_layer_init(key, dim: int, ffn: int, joint_num: int,
                       self_pos: bool, cross_pos: bool) -> Params:
    keys = jax.random.split(key, 6)
    lin = lambda k, i, o: {"w": nn.kaiming_uniform(k, (i, o)),
                           "b": jnp.zeros((o,))}
    p: Params = {
        "attn": {
            "in_proj_w": nn.kaiming_uniform(keys[0], (dim, 3 * dim)),
            "in_proj_b": jnp.zeros((3 * dim,)),
            "out_proj": lin(keys[1], dim, dim),
        },
        "linear1": lin(keys[2], dim, ffn),
        "linear2": lin(keys[3], ffn, dim),
        "norm2": nn.layer_norm_init(dim),
        "norm3": nn.layer_norm_init(dim),
    }
    if self_pos:
        p["self_posembed"] = 0.02 * jax.random.normal(keys[4], (joint_num, dim))
    if cross_pos:
        p["cross_posembed"] = 0.02 * jax.random.normal(keys[5], (joint_num, dim))
    return p


def decoder_layer(p: Params, query: jax.Array, key: jax.Array,
                  query_pos: Optional[jax.Array], key_pos: Optional[jax.Array],
                  heads: int) -> jax.Array:
    """cross_only TransformerDecoderLayer (transfusion_head.py:135-177).

    query (B, Pq, C), key (B, Pk, C); query_pos/key_pos (Pq/Pk, C) arrays
    (learned embeddings from params when present, else the provided sine
    embeddings). Post-LN, ReLU FFN; torch LayerNorm eps 1e-5.
    """
    qp = p.get("self_posembed", query_pos)
    kp = p.get("cross_posembed", key_pos)
    q_in = query if qp is None else query + qp[None]
    k_in = key if kp is None else key + kp[None]
    attn_out = _mha(p["attn"], q_in, k_in, k_in, heads)
    x = nn.layer_norm(p["norm2"], query + attn_out, eps=1e-5)
    ff = nn.linear(p["linear2"], jax.nn.relu(nn.linear(p["linear1"], x)))
    return nn.layer_norm(p["norm3"], x + ff, eps=1e-5)


def decoder_init(key, variant: str, joint_num: int = 21, dim: int = 128,
                 ffn: int = 128, layers: int = 4) -> Params:
    """variant: 'detr' | 'updated' | 'spatial'."""
    self_pos = variant in ("detr", "updated")
    cross_pos = variant in ("updated", "spatial")
    keys = jax.random.split(key, layers)
    return {"layers": [decoder_layer_init(k, dim, ffn, joint_num,
                                          self_pos, cross_pos)
                       for k in keys]}


def decoder_forward(p: Params, variant: str, query: jax.Array,
                    key: jax.Array, heads: int = 4,
                    grid_hw: Optional[tuple] = None) -> jax.Array:
    """Run a decoder variant; returns (B, Pq, C) (the reference returns
    (B, C, Pq) — transposed once at the call sites to stay channel-last).

    detr:    query=(B, J, C) joint feats, key=(B, H*W, C) image feats,
             key sine pos from grid_hw.
    updated: query=(B, J, C), key=(B, J, C).
    spatial: query=(B, H*W, C) image feats with sine pos, key=(B, J, C).
    """
    sine = None
    if variant in ("detr", "spatial"):
        H, W = grid_hw
        dim = query.shape[-1]
        sine = jnp.asarray(detr_sine_position_embedding(H, W, dim // 2))
    qpos = sine if variant == "spatial" else None
    kpos = sine if variant == "detr" else None
    # Reference quirk: every layer receives the ORIGINAL query (the
    # decoders never chain outputs — transfusion_head.py:633/712/791
    # call decoder[i](anchor_feats, ...) in a loop and keep only the
    # last), so only the final layer's weights shape the result.
    x = query
    for lp in p["layers"]:
        x = decoder_layer(lp, query, key, qpos, kpos, heads)
    return x
