"""BERT-style intra-modal keypoint transformers (model/model.py:33-130).

``TR_Encoder`` wraps a HuggingFace BertEncoder: learned position
embeddings (a SEPARATE nn.Embedding, not BertEmbeddings — the reference
creates BertEmbeddings/BertPooler but never calls them in forward) plus a
linear image-feature embedding, then ``num_hidden_layers`` post-LN BERT
layers (self-attention -> dense+LN, GELU intermediate -> dense+LN).

``KP_Interaction_TR`` adds a cls head and a residual projection:
pred = cls_head(encoder(x)) + residual(x).

KPFusion instantiates it twice per block (model/model.py:225-247):
hidden 128, 4 layers, 4 heads, intermediate 16, img_feature_dim 128
(init_TR) / 131 (final_TR), output dim 3.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn

Params = Dict[str, Any]
LN_EPS = 1e-12  # HF Bert layer_norm_eps default


def _ln(p, x):
    return nn.layer_norm(p, x, eps=LN_EPS)


def bert_layer_init(key, hidden: int, heads: int, intermediate: int) -> Params:
    keys = jax.random.split(key, 6)
    lin = lambda k, i, o: {"w": nn.kaiming_uniform(k, (i, o)),
                           "b": jnp.zeros((o,))}
    return {
        "q": lin(keys[0], hidden, hidden),
        "k": lin(keys[1], hidden, hidden),
        "v": lin(keys[2], hidden, hidden),
        "attn_out": lin(keys[3], hidden, hidden),
        "attn_ln": nn.layer_norm_init(hidden),
        "inter": lin(keys[4], hidden, intermediate),
        "out": lin(keys[5], intermediate, hidden),
        "out_ln": nn.layer_norm_init(hidden),
    }


def bert_layer(p: Params, x: jax.Array, heads: int) -> jax.Array:
    B, N, C = x.shape
    hd = C // heads
    q = nn.linear(p["q"], x).reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    k = nn.linear(p["k"], x).reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    v = nn.linear(p["v"], x).reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(q @ jnp.swapaxes(k, -1, -2) / jnp.sqrt(float(hd)), -1)
    ctx = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    x = _ln(p["attn_ln"], x + nn.linear(p["attn_out"], ctx))
    h = jax.nn.gelu(nn.linear(p["inter"], x), approximate=False)
    return _ln(p["out_ln"], x + nn.linear(p["out"], h))


def tr_encoder_init(key, img_dim: int, hidden: int = 128, heads: int = 4,
                    layers: int = 4, intermediate: int = 16,
                    max_positions: int = 512) -> Params:
    keys = jax.random.split(key, layers + 2)
    return {
        "pos_embed": 0.02 * jax.random.normal(keys[0], (max_positions, hidden)),
        "img_embed": {"w": nn.kaiming_uniform(keys[1], (img_dim, hidden)),
                      "b": jnp.zeros((hidden,))},
        "layers": [bert_layer_init(keys[2 + i], hidden, heads, intermediate)
                   for i in range(layers)],
    }


def tr_encoder(p: Params, img_feats: jax.Array, heads: int = 4) -> jax.Array:
    """img_feats (B, N, img_dim) -> (B, N, hidden) (TR_Encoder.forward)."""
    N = img_feats.shape[1]
    x = p["pos_embed"][None, :N] + nn.linear(p["img_embed"], img_feats)
    for lp in p["layers"]:
        x = bert_layer(lp, x, heads)
    return x


def kp_interaction_init(key, img_dim: int, out_dim: int = 3,
                        hidden: int = 128, heads: int = 4, layers: int = 4,
                        intermediate: int = 16) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    lin = lambda k, i, o: {"w": nn.kaiming_uniform(k, (i, o)),
                           "b": jnp.zeros((o,))}
    small = lambda k, i, o: {"w": 0.001 * jax.random.normal(k, (i, o)),
                             "b": jnp.zeros((o,))}
    return {
        "bert": tr_encoder_init(k1, img_dim, hidden, heads, layers, intermediate),
        # KPFusion _init_weights puts all Linears at N(0, 0.001)
        "cls_head": small(k2, hidden, out_dim),
        "residual": small(k3, img_dim, out_dim),
    }


def kp_interaction(p: Params, img_feats: jax.Array,
                   heads: int = 4) -> Tuple[jax.Array, jax.Array]:
    """(sequence_output (B, N, hidden), pred_score (B, N, out_dim)) —
    KP_Interaction_TR.forward (model/model.py:119-130)."""
    seq = tr_encoder(p["bert"], img_feats, heads)
    pred = nn.linear(p["cls_head"], seq) + nn.linear(p["residual"], img_feats)
    return seq, pred
