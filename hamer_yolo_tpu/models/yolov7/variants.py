"""Ghost / Swin-transformer / OREPA yolov7 block variants.

The reference's model zoo (yolo/yolov7/models/common.py) carries three
block families beyond the ones the shipped pipeline uses; they are
inventoried (SURVEY.md 2.2) and parse_model (models/yolo.py:744) accepts
them from any cfg yaml, so yaml_spec ingestion is incomplete without
them:

- Ghost family (common.py:156 GhostConv, :247 Ghost bottleneck, :286
  GhostSPPCSPC, :300 GhostStem, :409-434 GhostCSPA/B/C) — half-channel
  conv + cheap depthwise "ghost" features.
- Swin family (common.py:1371 WindowAttention, :1476
  SwinTransformerLayer, :1588 SwinTransformerBlock, :1606-1664
  STCSPA/B/C) — windowed MSA with relative position bias and cyclic
  shift inside CSP wrappers.
- OREPA (common.py:1076 OREPA_3x3_RepConv, :1228 RepConv_OREPA) — an
  over-parameterized RepVGG block whose five weight branches collapse to
  ONE 3x3 conv at deploy (switch_to_deploy). Here the collapse happens at
  weight-conversion time (core/convert._convert_orepa), and the runtime
  block is the ordinary deploy RepConv — the TPU graph never sees the
  branches.

Also Stem (common.py:169), the plain counterpart GhostStem overrides.

All pure functions over NHWC; window partitioning uses static shapes
(reshape/transpose, the TPU-friendly formulation of window attention).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.models.yolov7 import blocks as B

Params = Dict[str, Any]

# spec op tags
GHOSTC, GHOST, GCSPA, GCSPB, GCSPC, GSPP = (
    "GHOSTC", "GHOST", "GCSPA", "GCSPB", "GCSPC", "GSPP")
STEM, GSTEM = "STEM", "GSTEM"
SWINB, STCSPA, STCSPB, STCSPC = "SWINB", "STCSPA", "STCSPB", "STCSPC"

VARIANT_OPS = (GHOSTC, GHOST, GCSPA, GCSPB, GCSPC, GSPP, STEM, GSTEM,
               SWINB, STCSPA, STCSPB, STCSPC)


def _conv(p: Params, x: jax.Array, s: int = 1, act: bool = True,
          groups: int = 1) -> jax.Array:
    """Conv(+folded BN)+SiLU with group support (DWConv etc.)."""
    w = p["conv"]["w"]
    k = (w["q"] if isinstance(w, dict) else w).shape[0]
    y = nn.conv2d(p["conv"], x, stride=s, padding=k // 2, groups=groups)
    if "bn" in p:
        y = nn.batch_norm(p["bn"], y)
    return jax.nn.silu(y) if act else y


def _conv_init(key, c1: int, c2: int, k: int = 1, groups: int = 1,
               deploy: bool = True) -> Params:
    p: Params = {"conv": nn.conv_init(key, k, c1, c2, groups=groups,
                                      bias=deploy)}
    if not deploy:
        p["bn"] = nn.batch_norm_init(c2)
    return p


# ---------------------------------------------------------------------------
# Ghost family
# ---------------------------------------------------------------------------

def ghost_conv_init(key, c1: int, c2: int, k: int = 1,
                    deploy: bool = True) -> Params:
    c_ = c2 // 2
    k1, k2 = jax.random.split(key)
    return {"cv1": _conv_init(k1, c1, c_, k, deploy=deploy),
            "cv2": _conv_init(k2, c_, c_, 5, groups=c_, deploy=deploy)}


def ghost_conv(p: Params, x: jax.Array, s: int = 1, act: bool = True) -> jax.Array:
    y = _conv(p["cv1"], x, s=s, act=act)
    c_ = y.shape[-1]
    return jnp.concatenate([y, _conv(p["cv2"], y, act=act, groups=c_)], axis=-1)


def ghost_bottleneck_init(key, c1: int, c2: int, k: int = 3, s: int = 1,
                          deploy: bool = True) -> Params:
    c_ = c2 // 2
    keys = jax.random.split(key, 5)
    p: Params = {
        "g1": ghost_conv_init(keys[0], c1, c_, 1, deploy),
        "g2": ghost_conv_init(keys[1], c_, c2, 1, deploy),
    }
    if s == 2:
        p["dw"] = _conv_init(keys[2], c_, c_, k, groups=c_, deploy=deploy)
        p["sc_dw"] = _conv_init(keys[3], c1, c1, k, groups=c1, deploy=deploy)
        p["sc_pw"] = _conv_init(keys[4], c1, c2, 1, deploy=deploy)
    return p


def ghost_bottleneck(p: Params, x: jax.Array, s: int = 1) -> jax.Array:
    y = ghost_conv(p["g1"], x)
    if s == 2:
        y = _conv(p["dw"], y, s=2, act=False, groups=y.shape[-1])
        sc = _conv(p["sc_pw"],
                   _conv(p["sc_dw"], x, s=2, act=False, groups=x.shape[-1]),
                   act=False)
    else:
        sc = x
    return ghost_conv(p["g2"], y, act=False) + sc


def _csp_init(key, c1: int, c2: int, n: int, variant: str, body_init,
              deploy: bool = True) -> Params:
    """Shared CSP wrapper init (BottleneckCSPA/B/C shapes, common.py:311)."""
    e = 0.5
    keys = jax.random.split(key, n + 4)
    if variant == "a":
        c_ = int(c2 * e)
        p = {"cv1": _conv_init(keys[0], c1, c_, 1, deploy=deploy),
             "cv2": _conv_init(keys[1], c1, c_, 1, deploy=deploy),
             "cv3": _conv_init(keys[2], 2 * c_, c2, 1, deploy=deploy)}
    elif variant == "b":
        c_ = int(c2)
        p = {"cv1": _conv_init(keys[0], c1, c_, 1, deploy=deploy),
             "cv2": _conv_init(keys[1], c_, c_, 1, deploy=deploy),
             "cv3": _conv_init(keys[2], 2 * c_, c2, 1, deploy=deploy)}
    else:  # "c"
        c_ = int(c2 * e)
        p = {"cv1": _conv_init(keys[0], c1, c_, 1, deploy=deploy),
             "cv2": _conv_init(keys[1], c1, c_, 1, deploy=deploy),
             "cv3": _conv_init(keys[2], c_, c_, 1, deploy=deploy),
             "cv4": _conv_init(keys[3], 2 * c_, c2, 1, deploy=deploy)}
    p["m"] = [body_init(keys[4 + i], c_) for i in range(n)]
    return p


def _csp_forward(p: Params, x: jax.Array, variant: str, body) -> jax.Array:
    if variant == "a":
        y1 = _conv(p["cv1"], x)
        for bp in p["m"]:
            y1 = body(bp, y1)
        y2 = _conv(p["cv2"], x)
        return _conv(p["cv3"], jnp.concatenate([y1, y2], axis=-1))
    if variant == "b":
        x1 = _conv(p["cv1"], x)
        y1 = x1
        for bp in p["m"]:
            y1 = body(bp, y1)
        y2 = _conv(p["cv2"], x1)
        return _conv(p["cv3"], jnp.concatenate([y1, y2], axis=-1))
    y1 = _conv(p["cv1"], x)
    for bp in p["m"]:
        y1 = body(bp, y1)
    y1 = _conv(p["cv3"], y1)
    y2 = _conv(p["cv2"], x)
    return _conv(p["cv4"], jnp.concatenate([y1, y2], axis=-1))


def ghost_sppcspc_init(key, c1: int, c2: int, deploy: bool = True) -> Params:
    e = 0.5
    c_ = int(2 * c2 * e)
    keys = jax.random.split(key, 7)
    specs = [(c1, c_, 1), (c1, c_, 1), (c_, c_, 3), (c_, c_, 1),
             (4 * c_, c_, 1), (c_, c_, 3), (2 * c_, c2, 1)]
    return {f"cv{i + 1}": ghost_conv_init(keys[i], a, b, k, deploy)
            for i, (a, b, k) in enumerate(specs)}


def ghost_sppcspc(p: Params, x: jax.Array) -> jax.Array:
    x1 = ghost_conv(p["cv4"], ghost_conv(p["cv3"], ghost_conv(p["cv1"], x)))
    pools = [B.sp(x1, k) for k in (5, 9, 13)]
    y1 = ghost_conv(p["cv6"], ghost_conv(
        p["cv5"], jnp.concatenate([x1] + pools, axis=-1)))
    y2 = ghost_conv(p["cv2"], x)
    return ghost_conv(p["cv7"], jnp.concatenate([y1, y2], axis=-1))


def stem_init(key, c1: int, c2: int, ghost: bool = False,
              deploy: bool = True) -> Params:
    c_ = int(c2 / 2)
    keys = jax.random.split(key, 4)
    if ghost:  # GhostStem (common.py:300)
        return {"cv1": ghost_conv_init(keys[0], c1, c_, 3, deploy),
                "cv2": ghost_conv_init(keys[1], c_, c_, 1, deploy),
                "cv3": ghost_conv_init(keys[2], c_, c_, 3, deploy),
                "cv4": ghost_conv_init(keys[3], 2 * c_, c2, 1, deploy)}
    return {"cv1": _conv_init(keys[0], c1, c_, 3, deploy=deploy),
            "cv2": _conv_init(keys[1], c_, c_, 1, deploy=deploy),
            "cv3": _conv_init(keys[2], c_, c_, 3, deploy=deploy),
            "cv4": _conv_init(keys[3], 2 * c_, c2, 1, deploy=deploy)}


def stem_forward(p: Params, x: jax.Array, ghost: bool = False) -> jax.Array:
    cv = ghost_conv if ghost else _conv
    s2 = dict(s=2)
    x = cv(p["cv1"], x, **s2)
    a = cv(p["cv3"], cv(p["cv2"], x), **s2)
    pooled = B.mp(x)  # MaxPool2d(2, 2)
    return cv(p["cv4"], jnp.concatenate([a, pooled], axis=-1))


# ---------------------------------------------------------------------------
# Swin transformer family (v1)
# ---------------------------------------------------------------------------

def relative_position_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 bias table
    (WindowAttention.__init__, common.py:1386-1397)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def window_attention_init(key, dim: int, num_heads: int, ws: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "qkv": {"w": nn.kaiming_uniform(k1, (dim, 3 * dim)),
                "b": jnp.zeros((3 * dim,))},
        "proj": {"w": nn.kaiming_uniform(k2, (dim, dim)),
                 "b": jnp.zeros((dim,))},
        "rpb": 0.02 * jax.random.normal(k3, ((2 * ws - 1) ** 2, num_heads)),
    }


def window_attention(p: Params, x: jax.Array, num_heads: int, ws: int,
                     mask=None) -> jax.Array:
    """x: (nW*B, N, C) windows; mask: (nW, N, N) or None."""
    Bn, N, C = x.shape
    hd = C // num_heads
    qkv = nn.linear(p["qkv"], x).reshape(Bn, N, 3, num_heads, hd)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    attn = (q * (hd ** -0.5)) @ jnp.swapaxes(k, -2, -1)  # (Bn, nh, N, N)
    rpi = relative_position_index(ws).reshape(-1)
    bias = p["rpb"][rpi].reshape(N, N, num_heads)
    attn = attn + jnp.transpose(bias, (2, 0, 1))[None]
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(Bn // nW, nW, num_heads, N, N) + mask[:, None][None]
        attn = attn.reshape(Bn, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.transpose(attn @ v, (0, 2, 1, 3)).reshape(Bn, N, C)
    return nn.linear(p["proj"], out)


def swin_layer_init(key, dim: int, num_heads: int, ws: int,
                    mlp_ratio: float = 4.0) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": nn.layer_norm_init(dim),
        "attn": window_attention_init(k1, dim, num_heads, ws),
        "norm2": nn.layer_norm_init(dim),
        "mlp": nn.mlp_init(k2, dim, hidden),
    }


def _shift_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Static SW-MSA attention mask (create_mask, common.py:1503-1524)."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(H // ws, ws, W // ws, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def swin_layer(p: Params, x: jax.Array, num_heads: int, ws: int,
               shift: int) -> jax.Array:
    """x: (B, H, W, C) NHWC (the reference works NCHW; same math).

    Pads to window multiples, optional cyclic shift, W-MSA, reverse.
    SiLU MLP (the reference's yolov7-flavored Swin uses nn.SiLU)."""
    Bz, H_, W_, C = x.shape
    pad_b = (ws - H_ % ws) % ws
    pad_r = (ws - W_ % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    H, W = H_ + pad_b, W_ + pad_r

    shortcut = x.reshape(Bz, H * W, C)
    t = nn.layer_norm(p["norm1"], shortcut).reshape(Bz, H, W, C)
    if shift > 0:
        t = jnp.roll(t, (-shift, -shift), axis=(1, 2))
        mask = jnp.asarray(_shift_mask(H, W, ws, shift))
    else:
        mask = None
    win = t.reshape(Bz, H // ws, ws, W // ws, ws, C)
    win = jnp.transpose(win, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, C)
    win = window_attention(p["attn"], win, num_heads, ws, mask)
    t = win.reshape(Bz, H // ws, W // ws, ws, ws, C)
    t = jnp.transpose(t, (0, 1, 3, 2, 4, 5)).reshape(Bz, H, W, C)
    if shift > 0:
        t = jnp.roll(t, (shift, shift), axis=(1, 2))
    t = shortcut + t.reshape(Bz, H * W, C)
    t = t + _silu_mlp(p["mlp"], nn.layer_norm(p["norm2"], t))
    out = t.reshape(Bz, H, W, C)
    return out[:, :H_, :W_]


def _silu_mlp(p: Params, x: jax.Array) -> jax.Array:
    # the reference Swin Mlp uses act_layer=nn.SiLU (common.py:1444)
    return nn.linear(p["fc2"], jax.nn.silu(nn.linear(p["fc1"], x)))


def swin_block_init(key, c1: int, c2: int, num_heads: int, n: int,
                    ws: int = 8, deploy: bool = True) -> Params:
    keys = jax.random.split(key, n + 1)
    p: Params = {"layers": [swin_layer_init(keys[i], c2, num_heads, ws)
                            for i in range(n)]}
    if c1 != c2:
        p["conv"] = _conv_init(keys[n], c1, c2, 1, deploy=deploy)
    return p


def swin_block(p: Params, x: jax.Array, num_heads: int, ws: int = 8) -> jax.Array:
    if "conv" in p:
        x = _conv(p["conv"], x)
    for i, lp in enumerate(p["layers"]):
        x = swin_layer(lp, x, num_heads, ws, 0 if i % 2 == 0 else ws // 2)
    return x


def stcsp_init(key, c1: int, c2: int, n: int, variant: str,
               deploy: bool = True) -> Params:
    e = 0.5
    c_ = int(c2 * e) if variant in ("a", "c") else int(c2)
    num_heads = c_ // 32
    k1, k2 = jax.random.split(key)
    p = _csp_init(k1, c1, c2, 0, variant, lambda *a: None, deploy)
    p["m"] = swin_block_init(k2, c_, c_, num_heads, n, deploy=deploy)
    return p


def stcsp_forward(p: Params, x: jax.Array, variant: str, c2: int) -> jax.Array:
    c_ = int(c2 * 0.5) if variant in ("a", "c") else int(c2)
    num_heads = c_ // 32
    body = lambda q, y: swin_block(q, y, num_heads)
    if variant == "a":
        y1 = body(p["m"], _conv(p["cv1"], x))
        y2 = _conv(p["cv2"], x)
        return _conv(p["cv3"], jnp.concatenate([y1, y2], axis=-1))
    if variant == "b":
        x1 = _conv(p["cv1"], x)
        y1 = body(p["m"], x1)
        y2 = _conv(p["cv2"], x1)
        return _conv(p["cv3"], jnp.concatenate([y1, y2], axis=-1))
    y1 = _conv(p["cv3"], body(p["m"], _conv(p["cv1"], x)))
    y2 = _conv(p["cv2"], x)
    return _conv(p["cv4"], jnp.concatenate([y1, y2], axis=-1))


# ---------------------------------------------------------------------------
# spec dispatch (consumed by model.py)
# ---------------------------------------------------------------------------

def out_channels(op: str, c1: int, args: tuple) -> int:
    return int(args[0])


def init_variant(op: str, key, c1: int, args: tuple,
                 deploy: bool = True) -> Params:
    c2 = int(args[0])
    if op == GHOSTC:
        k = int(args[1]) if len(args) > 1 else 1
        return ghost_conv_init(key, c1, c2, k, deploy)
    if op == GHOST:
        k = int(args[1]) if len(args) > 1 else 3
        s = int(args[2]) if len(args) > 2 else 1
        return ghost_bottleneck_init(key, c1, c2, k, s, deploy)
    if op in (GCSPA, GCSPB, GCSPC):
        n = int(args[1]) if len(args) > 1 else 1
        variant = {"GCSPA": "a", "GCSPB": "b", "GCSPC": "c"}[op]
        c_ = int(c2 * 0.5) if variant in ("a", "c") else int(c2)
        return _csp_init(key, c1, c2, n, variant,
                         lambda k_, c: ghost_bottleneck_init(k_, c, c, 3, 1, deploy),
                         deploy)
    if op == GSPP:
        return ghost_sppcspc_init(key, c1, c2, deploy)
    if op in (STEM, GSTEM):
        return stem_init(key, c1, c2, ghost=(op == GSTEM), deploy=deploy)
    if op == SWINB:
        num_heads = int(args[1])
        n = int(args[2]) if len(args) > 2 else 1
        return swin_block_init(key, c1, c2, num_heads, n, deploy=deploy)
    if op in (STCSPA, STCSPB, STCSPC):
        n = int(args[1]) if len(args) > 1 else 1
        return stcsp_init(key, c1, c2, n, op[-1].lower(), deploy)
    raise ValueError(op)


def apply_variant(op: str, p: Params, x: jax.Array, args: tuple) -> jax.Array:
    c2 = int(args[0])
    if op == GHOSTC:
        s = int(args[2]) if len(args) > 2 else 1
        return ghost_conv(p, x, s=s)
    if op == GHOST:
        s = int(args[2]) if len(args) > 2 else 1
        return ghost_bottleneck(p, x, s=s)
    if op in (GCSPA, GCSPB, GCSPC):
        variant = {"GCSPA": "a", "GCSPB": "b", "GCSPC": "c"}[op]
        return _csp_forward(p, x, variant, ghost_bottleneck)
    if op == GSPP:
        return ghost_sppcspc(p, x)
    if op in (STEM, GSTEM):
        return stem_forward(p, x, ghost=(op == GSTEM))
    if op == SWINB:
        return swin_block(p, x, int(args[1]))
    if op in (STCSPA, STCSPB, STCSPC):
        return stcsp_forward(p, x, op[-1].lower(), c2)
    raise ValueError(op)
