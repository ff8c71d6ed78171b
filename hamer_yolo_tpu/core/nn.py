"""Minimal functional NN layer library (pure JAX, NHWC, pytree params).

Every layer is an (init, apply) pair over explicit parameter dicts — no
module framework. This keeps weight conversion (PyTorch ckpt -> pytree),
sharding annotation, and Pallas kernel substitution trivial.

Conventions:
- images are NHWC (TPU-native); conv weights are HWIO;
- linear weights are (in, out) so y = x @ w + b;
- params are float32; ``cast`` the activations for bf16 compute.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def _fan_in_out(shape: Sequence[int]) -> Tuple[int, int]:
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = math.prod(shape[:-2])
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_uniform(key, shape, dtype=jnp.float32):
    fan_in, _ = _fan_in_out(shape)
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


# ---------------------------------------------------------------------------
# Linear / LayerNorm
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    kw, _ = jax.random.split(key)
    p = {"w": kaiming_uniform(kw, (in_dim, out_dim))}
    if bias:
        p["b"] = jnp.zeros((out_dim,))
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv / BatchNorm (NHWC, HWIO)
# ---------------------------------------------------------------------------

def conv_init(key, k: int | Tuple[int, int], c_in: int, c_out: int,
              groups: int = 1, bias: bool = False) -> Params:
    kh, kw = (k, k) if isinstance(k, int) else k
    p = {"w": kaiming_uniform(key, (kh, kw, c_in // groups, c_out))}
    if bias:
        p["b"] = jnp.zeros((c_out,))
    return p


# Conv activation-calibration hook (core/quant.calibrate_yolo_act_scales):
# when set to a dict, the int8 conv branch records the running input
# absmax keyed by id(p["w"]) — the quantized-weight dict object is the
# stable per-conv identity inside a spec-built param tree (the graph has
# no layer names to key by). Eager-mode only.
_CONV_CALIB: Optional[dict] = None


def conv2d(
    p: Params,
    x: jax.Array,
    stride: int | Tuple[int, int] = 1,
    padding: Any = "SAME",
    groups: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """x: (B, H, W, C) -> (B, H', W', C_out).

    W8A8 path: if ``p["w"]`` is a dict {"q": int8 HWIO, "scale": (C_out,)}
    (from core/quant.quantize_conv_weight), the conv runs int8 with
    per-tensor dynamic activation scale and int32 accumulation. CAUTION:
    measured SLOWER than bf16 on v5e (e2e 124.7 -> 102.5 fps with the
    YOLO trunk quantized) — XLA lowers int8 convs via widening, not the
    MXU int8 mode (unlike dot_general, where int8 IS faster). Kept as an
    opt-in for backends with native int8 conv support.
    """
    strides = (stride, stride) if isinstance(stride, int) else stride
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(p["w"], dict):
        kh, kw = p["w"]["q"].shape[:2]
        if _CONV_CALIB is not None:
            if isinstance(x, jax.core.Tracer):
                raise RuntimeError(
                    "conv calibration must run eagerly (outside jit)")
            key = id(p["w"])
            seen = _CONV_CALIB.get(key, (0.0, None))[0]
            _CONV_CALIB[key] = (max(seen, float(jnp.max(jnp.abs(x)))),
                                p["w"])
        no_pad = padding in (0, "VALID", ((0, 0), (0, 0))) or (
            padding == "SAME" and kh == kw == 1)
        if kh == kw == 1 and groups == 1 and no_pad:
            # 1x1 conv IS a matmul: route through dot_general so the MXU
            # int8 mode engages (XLA's int8 *conv* lowering widens and
            # is a measured loss; dot_general is a measured win — see
            # quantize_yolo_params). Stride = spatial subsample.
            xs = x[:, :: strides[0], :: strides[1], :]
            B, Ho, Wo, C = xs.shape
            x2 = xs.reshape(B * Ho * Wo, C)
            sx_static = p.get("sx")
            if sx_static is not None:
                # Static calibrated per-tensor scale: the dynamic absmax
                # reduction (a full HBM pass over the activation at
                # M = B*H*W rows) disappears; quantize becomes a single
                # fused elementwise that XLA folds into the producer's
                # epilogue. Same mechanism that flipped the ViT int8
                # path (core/quant.attach_static_act_scales).
                sx = sx_static.astype(jnp.float32)
                qx = jnp.clip(jnp.round(x2 / sx.astype(x2.dtype)),
                              -127, 127).astype(jnp.int8)
            else:
                # per-pixel (per-row) dynamic scales — tighter than the
                # per-tensor scale the conv path uses
                sx = jnp.maximum(
                    jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0,
                    1e-8)
                qx = jnp.clip(jnp.round(x2 / sx.astype(x2.dtype)),
                              -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qx, p["w"]["q"].reshape(C, -1),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (acc.astype(jnp.float32) * sx.astype(jnp.float32)
                 * p["w"]["scale"]).astype(x.dtype)
            y = y.reshape(B, Ho, Wo, -1)
        elif p.get("sx") is not None and groups == 1:
            # Spatial int8 conv as kh*kw SHIFTED int8 GEMMs: XLA has no
            # MXU int8 *conv* lowering (it widens — a measured 124.7 ->
            # 102.5 fps loss), but int8 dot_general IS the MXU fast mode
            # (152 vs 117 bf16 TFLOP/s at ViT shapes). out[b,i,j,o] =
            # sum_{dy,dx,c} x[b, i*s+dy-ph, j*s+dx-pw, c] * W[dy,dx,c,o]
            # = sum_{dy,dx} GEMM(shifted strided slice, W[dy,dx]) with
            # int32 accumulation. Quantize BEFORE padding so the zero
            # border is an exact int8 zero; with the static calibrated
            # scale the quantize is one fused elementwise (no absmax
            # reduction pass). The kh*kw slice reads are cheap relative
            # to the GEMMs (intensity ~2*C_out FLOPs/byte).
            B, H, W, C = x.shape
            sh, sw = strides
            if padding == "SAME":
                pads = []
                for dim, k, s in ((H, kh, sh), (W, kw, sw)):
                    out_d = -(-dim // s)
                    tot = max((out_d - 1) * s + (k - 1) * dilation + 1 - dim,
                              0)
                    pads.append((tot // 2, tot - tot // 2))
            elif padding == "VALID":
                pads = [(0, 0), (0, 0)]
            else:
                pads = list(padding)
            Ho = (H + pads[0][0] + pads[0][1]
                  - ((kh - 1) * dilation + 1)) // sh + 1
            Wo = (W + pads[1][0] + pads[1][1]
                  - ((kw - 1) * dilation + 1)) // sw + 1
            sx = p["sx"].astype(jnp.float32)
            qx = jnp.clip(jnp.round(x / sx.astype(x.dtype)),
                          -127, 127).astype(jnp.int8)
            qx = jnp.pad(qx, ((0, 0), tuple(pads[0]), tuple(pads[1]),
                              (0, 0)))
            wq = p["w"]["q"]
            acc = None
            for dy in range(kh):
                for dx in range(kw):
                    y0, x0 = dy * dilation, dx * dilation
                    sl = qx[:, y0: y0 + (Ho - 1) * sh + 1: sh,
                            x0: x0 + (Wo - 1) * sw + 1: sw, :]
                    d = jax.lax.dot_general(
                        sl.reshape(B * Ho * Wo, C), wq[dy, dx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    acc = d if acc is None else acc + d
            y = (acc.astype(jnp.float32) * sx
                 * p["w"]["scale"]).astype(x.dtype).reshape(B, Ho, Wo, -1)
        else:
            sx = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-8)
            qx = jnp.clip(jnp.round(x / sx.astype(x.dtype)), -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                qx,
                p["w"]["q"],
                window_strides=strides,
                padding=padding,
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                preferred_element_type=jnp.int32,
            )
            y = (acc.astype(jnp.float32)
                 * (sx * p["w"]["scale"]).astype(jnp.float32)).astype(x.dtype)
    else:
        y = jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=strides,
            padding=padding,
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def batch_norm_init(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


def batch_norm(p: Params, x: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Inference-mode BN with running stats (torch BatchNorm2d eps=1e-3 in
    YOLO's Conv; pass eps explicitly where it differs)."""
    inv = jax.lax.rsqrt(p["var"].astype(x.dtype) + eps)
    return (x - p["mean"].astype(x.dtype)) * inv * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def batch_norm_train(p: Params, x: jax.Array, eps: float = 1e-3,
                     momentum: float = 0.03) -> Tuple[jax.Array, Params]:
    """Training-mode BN: normalize by BATCH statistics and return updated
    running stats (torch semantics; yolov7 sets momentum=0.03 in
    initialize_weights). Under a data-sharded mesh the batch moments are
    computed over the GLOBAL batch (XLA inserts the psum) — the SyncBN
    equivalent. The stats update is stop-gradiented."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    inv = jax.lax.rsqrt(var.astype(x.dtype) + eps)
    y = (x - mean.astype(x.dtype)) * inv * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    n = 1
    for a in axes:
        n *= x.shape[a]
    unbiased = var * (n / max(n - 1, 1))  # torch tracks unbiased variance
    new_p = dict(p)
    new_p["mean"] = jax.lax.stop_gradient(
        (1 - momentum) * p["mean"] + momentum * mean.astype(p["mean"].dtype))
    new_p["var"] = jax.lax.stop_gradient(
        (1 - momentum) * p["var"] + momentum * unbiased.astype(p["var"].dtype))
    return y, new_p


def fold_bn_into_conv(conv_p: Params, bn_p: Params, eps: float = 1e-3) -> Params:
    """Fuse conv (no bias) + BN into a single conv with bias (deploy path).

    Equivalent of the reference's fuse_conv_and_bn (torch_utils.py) /
    RepConv._fuse_bn_tensor, done once at weight-conversion time.
    """
    inv = 1.0 / jnp.sqrt(bn_p["var"] + eps)
    scale = bn_p["scale"] * inv  # (C_out,)
    w = conv_p["w"] * scale[None, None, None, :]
    b = bn_p["bias"] - bn_p["mean"] * scale
    if "b" in conv_p:
        b = b + conv_p["b"] * scale
    return {"w": w, "b": b}


def max_pool(x: jax.Array, k: int, stride: int, padding: int = 0) -> jax.Array:
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def avg_pool_global(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C) global average pool."""
    return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Attention (XLA reference path; Pallas flash kernel in ops/attention.py)
# ---------------------------------------------------------------------------

def mha_qkv_init(key, dim: int, num_heads: int, head_dim: Optional[int] = None,
                 qkv_bias: bool = True, out_bias: bool = True) -> Params:
    head_dim = head_dim or dim // num_heads
    inner = head_dim * num_heads
    k1, k2 = jax.random.split(key)
    return {
        "qkv": linear_init(k1, dim, inner * 3, bias=qkv_bias),
        "proj": linear_init(k2, inner, dim, bias=out_bias),
    }


def mha_self_attention(p: Params, x: jax.Array, num_heads: int) -> jax.Array:
    """Fused-qkv softmax self-attention. x: (B, N, D).

    num_heads is static (params hold only arrays; head_dim is inferred
    from the qkv projection width).
    """
    B, N, _ = x.shape
    h = num_heads
    hd = p["qkv"]["w"].shape[1] // 3 // h
    qkv = linear(p["qkv"], x).reshape(B, N, 3, h, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, hd)
    scale = hd ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, h * hd)
    return linear(p["proj"], out)


def cross_attention_init(key, dim: int, context_dim: int, num_heads: int,
                         head_dim: int) -> Params:
    inner = head_dim * num_heads
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "to_q": linear_init(k1, dim, inner, bias=False),
        "to_kv": linear_init(k2, context_dim, inner * 2, bias=False),
        "proj": linear_init(k3, inner, dim, bias=True),
    }


def cross_attention(p: Params, x: jax.Array, context: jax.Array,
                    num_heads: int) -> jax.Array:
    """x: (B, N, D) queries over context (B, M, Dc)."""
    B, N, _ = x.shape
    M = context.shape[1]
    h = num_heads
    hd = p["to_q"]["w"].shape[1] // h
    q = linear(p["to_q"], x).reshape(B, N, h, hd)
    kv = linear(p["to_kv"], context).reshape(B, M, 2, h, hd)
    k, v = kv[:, :, 0], kv[:, :, 1]
    scale = hd ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, h * hd)
    return linear(p["proj"], out)


def mlp_init(key, dim: int, hidden: int, out_dim: Optional[int] = None) -> Params:
    out_dim = out_dim or dim
    k1, k2 = jax.random.split(key)
    return {"fc1": linear_init(k1, dim, hidden), "fc2": linear_init(k2, hidden, out_dim)}


def mlp_gelu(p: Params, x: jax.Array) -> jax.Array:
    return linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], x), approximate=False))


def frequency_embed(x: jax.Array, num_freqs: int, max_freq_exp: Optional[int] = None
                    ) -> jax.Array:
    """NeRF-style frequency embedding (reference t_cond_mlp.FrequencyEmbedder):
    (..., d) -> (..., d * (2*num_freqs + 1)) as [x, sin(2^k pi x), cos(...)]."""
    max_freq_exp = num_freqs - 1 if max_freq_exp is None else max_freq_exp
    freqs = 2.0 ** jnp.linspace(0.0, max_freq_exp, num_freqs) * jnp.pi
    scaled = x[..., None] * freqs  # (..., d, F)
    out = jnp.concatenate(
        [x[..., None], jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return out.reshape(x.shape[:-1] + (-1,))


def adaptive_layer_norm_init(key, dim: int, cond_dim: int) -> Params:
    """AdaptiveLayerNorm1D (reference t_cond_mlp): LN whose scale/shift are
    regressed from a conditioning vector (FiLM-style)."""
    return {"to_scale_shift": linear_init(key, cond_dim, 2 * dim)}


def adaptive_layer_norm(p: Params, x: jax.Array, cond: jax.Array,
                        eps: float = 1e-6) -> jax.Array:
    """x: (B, N, D); cond: (B, C)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    ss = linear(p["to_scale_shift"], cond)  # (B, 2D)
    D = x.shape[-1]
    scale, shift = ss[..., :D], ss[..., D:]
    return y * (1.0 + scale[:, None, :]) + shift[:, None, :]


def num_params(tree) -> int:
    leaves = [x.size for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "size")]
    return sum(leaves)
