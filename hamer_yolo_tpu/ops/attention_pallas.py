"""Pallas fused attention for short sequences (ViT-H's 192 tokens).

The official flash-attention kernel tiles the sequence in 128-multiples —
wrong shape for ViT-H's 192-token crops. At N=192 the whole attention
computation fits in VMEM (q/k/v 192x80 f32 = 60 KB each; logits 192x192 =
144 KB), so the optimal TPU formulation is a single-block kernel per
(batch, head): QK^T -> stable softmax -> PV without any HBM round trip for
the intermediates. This fuses the three matmuls + softmax the same way
flash attention does, minus the (unneeded) streaming machinery.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG2E = 1.4426950408889634


def softmax_flavor() -> str:
    """Trace-time env knob (HYT_SOFTMAX=exp|exp2|exp2p): the softmax form
    inside the attention megakernels. "exp2" folds log2(e) into the
    existing q*scale prescale (an (N, hd) tensor, N/hd = 2.4x smaller than
    the logits) and takes exp2 of the (N, N) logits — hardware exp is
    exp2(x*log2e) anyway, so this deletes one full VPU multiply pass over
    every logit tensor (B*h*N*N = 151M elements per ViT-H layer at 256
    crops). "exp2p" additionally folds the softmax normalization past the
    p*v dot (row scaling commutes with it), turning the second (N, N)
    broadcast-multiply into an (N, hd) one. Mathematically the same
    softmax; bitwise they resample f32 rounding, so they stay env-gated
    OFF until the interleaved A/B (tools/bench_attn_ab.py) qualifies one.
    Returned as a STRING so the flavor keys every jit cache (the
    ops/int8_matmul.gelu_prologue convention — an env read inside a
    traced body would go stale)."""
    v = os.environ.get("HYT_SOFTMAX")
    return v if v in ("exp2", "exp2p") else "exp"


def attn_math_flavor() -> str:
    """Trace-time env knob (HYT_ATTN_MATH=bf16|int8): the dtype of the
    two per-head attention dots inside the megaproj kernel. "int8"
    quantizes q/k/v with DYNAMIC per-head-tile absmax scales computed in
    VMEM (no HBM pass — the tiles are (N, hd), tiny) and runs q@k^T and
    p@v on the int8 MXU at 2x the bf16 rate; p rides its natural [0, 1]
    range at scale 1/127 (resolution comparable to bf16's 8-bit
    mantissa). The attention math is the identified residual floor
    component of the int8 ViT (est. ~1.55 TFLOP bf16 at 256 crops).
    Same trace-time STRING convention as softmax_flavor(). CLOSED as a
    23 ms LOSS (assets/ab_attnmath_int8_r03.log: fr_qk8 462.7 vs fr
    439.8 ms p50 b128, losing every interleaved iteration): the dynamic
    quantize elementwise passes — absmax+round over three (N, hd) tiles
    per head plus the round over the (N, N) p tensor — cost more VPU
    time than the 2x int8 MXU rate saves on the small per-head dots.
    Together with the exp2/exp2p closures this pins the megaproj
    attention as VPU/elementwise-bound, NOT dot-bound. Stays env-gated
    off."""
    return "int8" if os.environ.get("HYT_ATTN_MATH") == "int8" else "bf16"


def _attn_kernel(q_ref, k_ref, v_ref, *rest, scale: float, group: int,
                 quantize_out: bool):
    if quantize_out:
        s_ref, o_ref = rest  # (1, 1) f32 static scale; o_ref int8
        inv_s = 1.0 / s_ref[0, 0]
    else:
        (o_ref,) = rest
    for g in range(group):  # static unroll: `group` heads per grid step
        q = q_ref[g]  # (N, hd)
        k = k_ref[g]
        v = v_ref[g]
        logits = jax.lax.dot_general(
            q * scale, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, N)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        # reciprocal-multiply: one VPU divide per ROW instead of one
        # per logit (divides are multi-cycle on the VPU)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        res = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        if quantize_out:
            # Epilogue quantize with the NEXT GEMM's static activation
            # scale (core/quant semantics: round-half-even, clip ±127) —
            # the proj quantize pass never touches HBM.
            res = jnp.clip(jnp.round(res * inv_s), -127, 127)
        o_ref[g, :, :] = res.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "group"))
def fused_short_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False,
    group: int = 16, out_scale: jax.Array | None = None,
) -> jax.Array:
    """q/k/v: (B, h, N, hd) -> (B, h, N, hd); softmax attention, no mask.

    ``group`` (b, h) pairs are processed per grid step: one step's DMA
    then carries group*3*N*hd elements and the compute loop amortizes
    the per-step pipeline overhead (a group of 1 at ViT-H shapes is
    DMA-latency-bound: 4096 tiny steps).

    ``out_scale``: optional () / (1, 1) f32 static activation scale of
    the CONSUMING int8 GEMM — the epilogue quantizes in-kernel and the
    output is int8 (the proj quantize pass disappears from HBM)."""
    B, h, N, hd = q.shape
    scale = hd ** -0.5
    G = group
    while (B * h) % G:
        G //= 2
    qf = q.reshape(B * h, N, hd)
    kf = k.reshape(B * h, N, hd)
    vf = v.reshape(B * h, N, hd)
    quant = out_scale is not None
    in_specs = [pl.BlockSpec((G, N, hd), lambda i: (i, 0, 0))
                for _ in range(3)]
    args = [qf, kf, vf]
    if quant:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0)))
        args.append(jnp.asarray(out_scale, jnp.float32).reshape(1, 1))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, group=G,
                          quantize_out=quant),
        grid=(B * h // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, N, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * h, N, hd),
                                       jnp.int8 if quant else q.dtype),
        interpret=interpret,
    )(*args)
    return out.reshape(B, h, N, hd)


def _attn_qkv_kernel(x_ref, *rest, scale: float, num_heads: int,
                     head_dim: int, group: int, quantize_out: bool):
    if quantize_out:
        s_ref, o_ref = rest  # (1, 1) f32 static scale; o_ref int8
        inv_s = 1.0 / s_ref[0, 0]
    else:
        (o_ref,) = rest
    D = num_heads * head_dim
    for g in range(group):
        for t in range(num_heads):  # static unroll over heads
            # Head slices straight out of the fused-qkv VMEM block —
            # (s, h, e) layout from the qkv GEMM, so q/k/v of head t sit
            # at lane offsets (s*D + t*hd). The slices are not 128-lane
            # aligned (hd=80 for ViT-H); Mosaic relayouts in-register,
            # which is the whole trade: a little VREG shuffling instead
            # of four HBM-materialized (B,h,N,hd) transpose copies.
            q = x_ref[g, :, t * head_dim:(t + 1) * head_dim]
            k = x_ref[g, :, D + t * head_dim:D + (t + 1) * head_dim]
            v = x_ref[g, :, 2 * D + t * head_dim:2 * D + (t + 1) * head_dim]
            logits = jax.lax.dot_general(
                q * scale, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, N)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            res = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            if quantize_out:
                res = jnp.clip(jnp.round(res * inv_s), -127, 127)
            o_ref[g, :, t * head_dim:(t + 1) * head_dim] = \
                res.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                              "group"))
def fused_qkv_attention(
    qkv: jax.Array, num_heads: int, interpret: bool = False,
    group: int = 2, out_scale: jax.Array | None = None,
) -> jax.Array:
    """qkv: (B, N, 3*D) fused GEMM output -> (B, N, D); softmax attention.

    The transpose-free engagement of the single-block attention: the
    kernel consumes the qkv projection EXACTLY as the GEMM wrote it and
    head-slices in VMEM, so the (B,h,N,hd) layout copies that
    fused_short_attention needs (3 input transposes + 1 output
    transpose ~= 750 MB of HBM traffic per layer at 256 crops) never
    exist. ``group`` crops per grid step; ``out_scale`` as in
    fused_short_attention (int8 epilogue for the consuming GEMM)."""
    B, N, td = qkv.shape
    hd = td // 3 // num_heads
    scale = hd ** -0.5
    G = group
    while B % G:
        G //= 2
    quant = out_scale is not None
    in_specs = [pl.BlockSpec((G, N, td), lambda i: (i, 0, 0))]
    args = [qkv]
    if quant:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0)))
        args.append(jnp.asarray(out_scale, jnp.float32).reshape(1, 1))
    D = num_heads * hd
    return pl.pallas_call(
        functools.partial(_attn_qkv_kernel, scale=scale,
                          num_heads=num_heads, head_dim=hd, group=G,
                          quantize_out=quant),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D),
                                       jnp.int8 if quant else qkv.dtype),
        interpret=interpret,
    )(*args)


def _attn_block_bf16_kernel(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *,
                            scale: float, num_heads: int, head_dim: int,
                            group: int):
    D = num_heads * head_dim
    N = x_ref.shape[1]
    K = x_ref.shape[2]
    # LN + qkv GEMM FLATTENED over the whole (group*N)-row block: the
    # taller M lifts the in-kernel bf16 dot rate (same grouped-GEMM
    # restructure as the megaproj kernel — output bit-identical across
    # group since LN and the GEMM are per-row). Attention per-crop.
    x = x_ref[...].reshape(group * N, K).astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    x = x * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    qkv = jax.lax.dot_general(
        x.astype(jnp.bfloat16), w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    qkv = qkv.astype(jnp.bfloat16)  # (group*N, 3D)
    for gi in range(group):
        r0, r1 = gi * N, (gi + 1) * N
        for t in range(num_heads):
            q = qkv[r0:r1, t * head_dim:(t + 1) * head_dim]
            k = qkv[r0:r1, D + t * head_dim:D + (t + 1) * head_dim]
            v = qkv[r0:r1, 2 * D + t * head_dim:2 * D + (t + 1) * head_dim]
            logits = jax.lax.dot_general(
                q * scale, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            res = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            o_ref[gi, :, t * head_dim:(t + 1) * head_dim] = \
                res.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                              "group"))
def fused_bf16_attn_block(
    tok: jax.Array, w: jax.Array, bias: jax.Array | None,
    ln_scale: jax.Array, ln_bias: jax.Array, num_heads: int,
    interpret: bool = False, group: int = 1,
) -> jax.Array:
    """EXACT-math bf16 fused LN+QKV+attention block (pre-proj): the
    roadmap's "fused LN+QKV Pallas block" — LN, the qkv projection and
    softmax attention in one pallas_call with the (K, 3D) bf16 qkv
    weight resident in VMEM. The (B, N, 3D) qkv tensor and the LN output
    never touch HBM (~630 MB/layer at 256 crops). Returns (B, N, D) in
    tok.dtype; apply the proj linear outside. Same f32 LN/softmax math
    as nn.mha_self_attention over nn.layer_norm — exact path, no
    quantization. Env-gated HYT_ATTN_BF16=megakernel in
    models/vit.vit_forward (inference only); qualified via the
    BENCH_AB_INT8=0 interleaved A/B. Matches the reference attention at
    /root/reference/hamer/hamer/models/backbones/vit.py:110-126."""
    B, N, K = tok.shape
    td = w.shape[1]
    hd = td // 3 // num_heads
    D = num_heads * hd
    scale = hd ** -0.5
    G = group
    while B % G:
        G //= 2
    if bias is None:
        bias = jnp.zeros((td,), jnp.float32)
    return pl.pallas_call(
        functools.partial(_attn_block_bf16_kernel, scale=scale,
                          num_heads=num_heads, head_dim=hd, group=G),
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, N, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((K, td), lambda i: (0, 0)),
            pl.BlockSpec((1, td), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), tok.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K * td + 4 * B * num_heads * N * N * hd,
            bytes_accessed=B * N * K * 2 + K * td * 2 + B * N * D * 2,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(tok, w.astype(jnp.bfloat16),
      bias.reshape(1, td).astype(jnp.float32),
      ln_scale.reshape(1, K).astype(jnp.float32),
      ln_bias.reshape(1, K).astype(jnp.float32))


def _attn_block_kernel(x_ref, w_ref, sw_ref, b_ref, g_ref, bt_ref,
                       sxq_ref, sxp_ref, o_ref, *, scale: float,
                       num_heads: int, head_dim: int, group: int):
    D = num_heads * head_dim
    N = x_ref.shape[1]
    K = x_ref.shape[2]
    sq = sxq_ref[0, 0]
    inv_p = 1.0 / sxp_ref[0, 0]
    # LN + quantize + qkv GEMM FLATTENED over (group*N) rows — taller M
    # lifts the in-kernel int8 dot rate (grouped-GEMM restructure, same
    # as megaproj; bit-identical across group). Attention per-crop.
    x = x_ref[...].reshape(group * N, K).astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-6)
    x = x * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x * (1.0 / sq)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (group*N, 3D) i32, consumed in VMEM — never exists in HBM
    qkv = (acc.astype(jnp.float32) * (sq * sw_ref[:].astype(jnp.float32))
           + b_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    for gi in range(group):
        r0, r1 = gi * N, (gi + 1) * N
        for t in range(num_heads):
            q = qkv[r0:r1, t * head_dim:(t + 1) * head_dim]
            k = qkv[r0:r1, D + t * head_dim:D + (t + 1) * head_dim]
            v = qkv[r0:r1, 2 * D + t * head_dim:2 * D + (t + 1) * head_dim]
            logits = jax.lax.dot_general(
                q * scale, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
            res = jnp.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            res = jnp.clip(jnp.round(res * inv_p), -127, 127)
            o_ref[gi, :, t * head_dim:(t + 1) * head_dim] = \
                res.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                              "group"))
def fused_int8_attn_block(
    tok: jax.Array, wq: jax.Array, wscale: jax.Array,
    bias: jax.Array | None, ln_scale: jax.Array, ln_bias: jax.Array,
    sx_qkv: jax.Array, sx_proj: jax.Array, num_heads: int,
    interpret: bool = False, group: int = 1,
) -> jax.Array:
    """The attention MEGAKERNEL: LN + static-scale int8 quantize + qkv
    GEMM + softmax attention + int8 epilogue, one pallas_call.

    tok: (B, N, K) bf16/f32 residual stream; wq: (K, 3D) int8 qkv weight
    (RESIDENT: constant index map, fetched from HBM once per layer and
    reused across all B crops); wscale (3D,) f32; bias (3D,) or None;
    ln_scale/ln_bias (K,); sx_qkv/sx_proj () f32 calibrated static
    activation scales. Returns (B, N, D) int8, pre-quantized for the
    proj GEMM (consume with ops.int8_matmul.int8_dot_prequant).

    vs the fusedqkv + XLA-chain composition, the qkv projection tensor
    (B, N, 3D) and its int8/i32 intermediates NEVER touch HBM: per layer
    at 256 crops that's ~880 MB of traffic replaced by one 4.9 MB weight
    fetch. The risk (why this is env-gated until the interleaved e2e A/B
    qualifies it): the in-kernel (N, K)x(K, 3D) dot must be within ~25%
    of XLA's fat-N dot rate or the GEMM loss eats the traffic win —
    tools/probe_int8_ceiling.py's int8_pallas_res3840 arm prices exactly
    this. Engagement: HYT_ATTN=megakernel (core/quant.int8_block_attn_fused).
    Matches the reference attention math at
    /root/reference/hamer/hamer/models/backbones/vit.py:110-126."""
    B, N, K = tok.shape
    td = wq.shape[1]
    hd = td // 3 // num_heads
    D = num_heads * hd
    scale = hd ** -0.5
    G = group
    while B % G:
        G //= 2
    if bias is None:
        bias = jnp.zeros((td,), jnp.float32)
    args = (
        tok,
        wq,
        wscale.reshape(1, td).astype(jnp.float32),
        bias.reshape(1, td).astype(jnp.float32),
        ln_scale.reshape(1, K).astype(jnp.float32),
        ln_bias.reshape(1, K).astype(jnp.float32),
        jnp.asarray(sx_qkv, jnp.float32).reshape(1, 1),
        jnp.asarray(sx_proj, jnp.float32).reshape(1, 1),
    )
    in_specs = [
        pl.BlockSpec((G, N, K), lambda i: (i, 0, 0)),
        pl.BlockSpec((K, td), lambda i: (0, 0)),
        pl.BlockSpec((1, td), lambda i: (0, 0)),
        pl.BlockSpec((1, td), lambda i: (0, 0)),
        pl.BlockSpec((1, K), lambda i: (0, 0)),
        pl.BlockSpec((1, K), lambda i: (0, 0)),
        pl.BlockSpec((1, 1), lambda i: (0, 0)),
        pl.BlockSpec((1, 1), lambda i: (0, 0)),
    ]
    return pl.pallas_call(
        functools.partial(_attn_block_kernel, scale=scale,
                          num_heads=num_heads, head_dim=hd, group=G),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, D), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K * td + 4 * B * num_heads * N * N * hd,
            bytes_accessed=B * N * K * 2 + K * td + B * N * D,
            transcendentals=B * num_heads * N * N,
        ),
        interpret=interpret,
    )(*args)


def _attn_proj_block_kernel(x_ref, w_ref, sw_ref, b_ref, g_ref, bt_ref,
                            sxq_ref, sxp_ref, wp_ref, pw_ref, pb_ref,
                            o_ref, aq_ref, *, scale: float, num_heads: int,
                            head_dim: int, group: int, flavor: str,
                            math: str):
    D = num_heads * head_dim
    N = x_ref.shape[1]
    K = x_ref.shape[2]
    sq = sxq_ref[0, 0]
    sp = sxp_ref[0, 0]
    inv_p = 1.0 / sp
    # The qkv/proj GEMMs run FLATTENED over the whole (group*N)-row
    # block — at group>1 the taller M lifts the in-kernel int8 dot rate
    # toward XLA's fat-M rate (the priced risk of the per-crop N=192
    # form, see the wrapper docstring). Attention stays per-crop.
    x0 = x_ref[...].reshape(group * N, K).astype(jnp.float32)  # residual
    mu = jnp.mean(x0, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x0 - mu), axis=-1, keepdims=True)
    x = (x0 - mu) * jax.lax.rsqrt(var + 1e-6)
    x = x * g_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x * (1.0 / sq)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (group*N, 3D) i32, VMEM-only
    qkv = (acc.astype(jnp.float32) * (sq * sw_ref[:].astype(jnp.float32))
           + b_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    # HYT_SOFTMAX=exp2: fold log2(e) into the q prescale (N x hd) and
    # exp2 the logits (N x N) — same softmax (max-shift is invariant
    # under the positive base change), one fewer VPU pass over the
    # logits than hardware exp's internal x*log2e. exp2p additionally
    # folds the softmax normalization PAST the p*v dot (row scaling
    # commutes with it): the (N, N) broadcast-multiply by 1/sum becomes
    # an (N, hd) multiply merged into the existing quantize prescale —
    # the unnormalized e rows are <= N so the bf16 dot cannot overflow.
    exp2 = flavor in ("exp2", "exp2p")
    qs = scale * _LOG2E if exp2 else scale
    for gi in range(group):
        for t in range(num_heads):
            r0, r1 = gi * N, (gi + 1) * N
            q = qkv[r0:r1, t * head_dim:(t + 1) * head_dim]
            k = qkv[r0:r1, D + t * head_dim:D + (t + 1) * head_dim]
            v = qkv[r0:r1, 2 * D + t * head_dim:2 * D + (t + 1) * head_dim]
            if math == "int8":
                # HYT_ATTN_MATH=int8: dynamic per-head-tile absmax
                # quantize (the (N, hd) tiles live in VMEM — no extra
                # HBM pass) so both attention dots run on the int8 MXU
                # at 2x the bf16 rate; the tile-scalar dequant folds
                # into the softmax prescale.
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                sq_t = jnp.max(jnp.abs(qf)) * (1.0 / 127) + 1e-12
                sk_t = jnp.max(jnp.abs(kf)) * (1.0 / 127) + 1e-12
                qi = jnp.round(qf * (1.0 / sq_t)).astype(jnp.int8)
                ki = jnp.round(kf * (1.0 / sk_t)).astype(jnp.int8)
                iacc = jax.lax.dot_general(
                    qi, ki,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                logits = iacc.astype(jnp.float32) * (qs * (sq_t * sk_t))
            else:
                logits = jax.lax.dot_general(
                    q * qs, k,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp2(logits - m) if exp2 else jnp.exp(logits - m)
            inv_s = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            if math == "int8":
                # p in [0, 1] quantizes at the fixed scale 1/127 (8-bit
                # resolution, comparable to bf16's mantissa); v gets the
                # same dynamic tile absmax treatment.
                p = e * inv_s
                pi = jnp.round(p * 127.0).astype(jnp.int8)
                vf = v.astype(jnp.float32)
                sv_t = jnp.max(jnp.abs(vf)) * (1.0 / 127) + 1e-12
                vi = jnp.round(vf * (1.0 / sv_t)).astype(jnp.int8)
                racc = jax.lax.dot_general(
                    pi, vi,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                res = racc.astype(jnp.float32) * ((sv_t / 127.0) * inv_p)
            elif flavor == "exp2p":
                res = jnp.dot(e.astype(v.dtype), v,
                              preferred_element_type=jnp.float32)
                res = res * (inv_s * inv_p)
            else:
                p = e * inv_s
                res = jnp.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32)
                res = res * inv_p
            aq_ref[r0:r1, t * head_dim:(t + 1) * head_dim] = jnp.clip(
                jnp.round(res), -127, 127).astype(jnp.int8)
    pacc = jax.lax.dot_general(
        aq_ref[:], wp_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (group*N, K) i32
    # Dequant with int8_dot_prequant's exact f32 operation ORDER
    # ((acc*sp)*pscale + bias — f32 multiplies don't reassociate), then
    # residual in the OUTPUT dtype (round y first, then add): bit-for-
    # bit the unfused tok + int8_dot_prequant(...) path, so the megaproj
    # arm scores the same MPVPE as the megakernel+pair path (an earlier
    # f32-add-then-round variant, though tighter, drew a different
    # rounding-noise sample: 1.60 vs 1.48 mm on the eval crops).
    y = (pacc.astype(jnp.float32) * sp * pw_ref[:].astype(jnp.float32)
         + pb_ref[:].astype(jnp.float32))
    o_ref[...] = (x_ref[...]
                  + y.astype(o_ref.dtype).reshape(group, N, K))


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                              "group", "softmax",
                                              "attn_math"))
def fused_int8_attn_proj_block(
    tok: jax.Array, wq: jax.Array, wscale: jax.Array,
    bias: jax.Array | None, ln_scale: jax.Array, ln_bias: jax.Array,
    sx_qkv: jax.Array, sx_proj: jax.Array,
    wp: jax.Array, pscale: jax.Array, pbias: jax.Array | None,
    num_heads: int, interpret: bool = False, group: int = 1,
    softmax: str = "exp", attn_math: str = "bf16",
) -> jax.Array:
    """The FULL attention-block megakernel: LN + static int8 quantize +
    qkv GEMM + softmax attention + int8 quantize + PROJ GEMM + dequant
    + RESIDUAL, one pallas_call. Returns tok + proj(attn(LN(tok))).

    vs fused_int8_attn_block + XLA proj: the (B, N, D) int8 attention
    output and the proj/residual round-trip never touch HBM — per layer
    at 256 crops that replaces ~250 MB of traffic with one extra 1.6 MB
    resident proj weight fetch. The int8 math is IDENTICAL (same
    quantize semantics, int32 dots), only the f32 residual add happens
    pre-bf16-round instead of post — strictly tighter. The risk priced
    by the interleaved A/B: the in-kernel (N, D)x(D, K) proj dot at
    N=192 runs below XLA's fat-M int8 dot rate; the traffic win must
    cover the difference. ``group`` batches G crops per grid step and
    runs the qkv/proj GEMMs flattened over (G*N) rows (taller M, better
    MXU rate) — HYT_ATTN_MEGAPROJ_G sweeps it via
    core/quant.int8_block_attn_residual; attention math stays per-crop
    so the output is bit-identical across G. ``softmax`` ("exp"|"exp2",
    HYT_SOFTMAX via softmax_flavor()): "exp2" folds log2e into the q
    prescale and exp2's the logits — same softmax, one fewer VPU pass
    over (N, N) per head (both exp2 flavors CLOSED as A/B losses,
    assets/ab_softmax_*_r03.log). ``attn_math`` ("bf16"|"int8",
    HYT_ATTN_MATH via attn_math_flavor()): int8 runs the two per-head
    attention dots on the int8 MXU with dynamic in-VMEM tile scales.
    Engagement: HYT_ATTN=megaproj
    (core/quant.int8_block_attn_residual). Matches the reference
    attention at /root/reference/hamer/hamer/models/backbones/vit.py:110-126."""
    B, N, K = tok.shape
    td = wq.shape[1]
    hd = td // 3 // num_heads
    D = num_heads * hd
    scale = hd ** -0.5
    G = group
    while B % G:
        G //= 2
    if bias is None:
        bias = jnp.zeros((td,), jnp.float32)
    if pbias is None:
        pbias = jnp.zeros((K,), jnp.float32)
    args = (
        tok,
        wq,
        wscale.reshape(1, td).astype(jnp.float32),
        bias.reshape(1, td).astype(jnp.float32),
        ln_scale.reshape(1, K).astype(jnp.float32),
        ln_bias.reshape(1, K).astype(jnp.float32),
        jnp.asarray(sx_qkv, jnp.float32).reshape(1, 1),
        jnp.asarray(sx_proj, jnp.float32).reshape(1, 1),
        wp,
        pscale.reshape(1, K).astype(jnp.float32),
        pbias.reshape(1, K).astype(jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((G, N, K), lambda i: (i, 0, 0)),
        pl.BlockSpec((K, td), lambda i: (0, 0)),
        pl.BlockSpec((1, td), lambda i: (0, 0)),
        pl.BlockSpec((1, td), lambda i: (0, 0)),
        pl.BlockSpec((1, K), lambda i: (0, 0)),
        pl.BlockSpec((1, K), lambda i: (0, 0)),
        pl.BlockSpec((1, 1), lambda i: (0, 0)),
        pl.BlockSpec((1, 1), lambda i: (0, 0)),
        pl.BlockSpec((D, K), lambda i: (0, 0)),
        pl.BlockSpec((1, K), lambda i: (0, 0)),
        pl.BlockSpec((1, K), lambda i: (0, 0)),
    ]
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        functools.partial(_attn_proj_block_kernel, scale=scale,
                          num_heads=num_heads, head_dim=hd, group=G,
                          flavor=softmax, math=attn_math),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, N, K), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, K), tok.dtype),
        scratch_shapes=[pltpu.VMEM((G * N, D), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * K * td + 4 * B * num_heads * N * N * hd
            + 2 * B * N * D * K,
            bytes_accessed=B * N * K * 4 + K * td + D * K,
            transcendentals=B * num_heads * N * N,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# Crossover measured by tools/bench_attention2.py on one v5e chip
# (ms/layer at ViT-H shapes, XLA einsum vs this kernel incl. the
# layout transposes): 32 crops 0.53/0.66, 64 0.51/0.46, 128 1.76/1.22,
# 256 3.09/2.05 — the kernel wins from ~64 crops up (the XLA softmax
# path materializes the (B,h,N,N) logits in HBM).
#
# HOW the kernel is engaged matters as much as the kernel (interleaved
# in-process e2e A/B, tools/bench_attn_ab.py, b128 static-int8):
#   einsum                           704.2 ms  (181.8 fps)
#   kernel via custom_vmap collapse  748.4 ms  (171.0 fps)  <- LOSS
#   kernel direct under jax.vmap     671.8 ms  (190.5 fps)  <- WIN
# The custom_vmap crop-collapse rule (mandatory for the int8 GEMM,
# which must not re-fetch weights per vmap instance) materializes
# reshape copies that cost more than the kernel saves.  Attention has
# no weight operands, so the pallas_call's native vmap batching rule
# (a leading grid dim) is free — "pallas_direct" is the production
# engagement; "pallas"/"auto" (custom_vmap) remain for flat callers.
MIN_PALLAS_CROPS = 64


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _qkv_attention(num_heads: int, interpret: bool, force):
    def impl(qkv):
        B, N, td = qkv.shape
        h = num_heads
        hd = td // 3 // h
        x = qkv.reshape(B, N, 3, h, hd)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (B, N, h, hd)
        use_pallas = force == "pallas" or (
            force == "auto" and B >= MIN_PALLAS_CROPS
            and (_on_tpu() or interpret))
        if use_pallas:
            out = fused_short_attention(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)), interpret=interpret)
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, h * hd)
        scale = hd ** -0.5
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, h * hd)

    @jax.custom_batching.custom_vmap
    def attn(qkv):
        return impl(qkv)

    @attn.def_vmap
    def _rule(axis_size, in_batched, qkv):
        # Collapse the vmap axis into the crop batch: the frame pipeline
        # vmaps over frames with 2 crop slots each, so without this the
        # dispatch would see B=2 and never engage the kernel (and a
        # batched pallas_call would re-grid per frame). Same pattern as
        # ops/int8_matmul._flat_matmul.
        Bv, B, N, td = qkv.shape
        return attn(qkv.reshape(Bv * B, N, td)).reshape(Bv, B, N, -1), True

    return attn


def softmax_attention_qkv(qkv: jax.Array, num_heads: int, *,
                          interpret: bool = False, force=None,
                          out_scale: jax.Array | None = None) -> jax.Array:
    """(B, N, 3D) fused-qkv -> (B, N, D) softmax attention.

    ``force`` (or env HYT_ATTN when unset):
      "xla" (DEFAULT) — plain inline einsum softmax, zero wrapper: the
        e2e-qualified path (see MIN_PALLAS_CROPS note).
      "pallas" — the fused single-block Pallas kernel behind the
        custom_vmap crop-collapse rule.
      "pallas_direct" — the kernel inlined with NO custom_vmap wrapper:
        under jax.vmap the pallas_call batches via its native rule (a
        leading grid dim — fine here: attention has no weight operands
        to re-fetch, unlike the int8 GEMM case).
      "pallas_fusedqkv" — the transpose-free variant: the kernel reads
        the fused (B, N, 3D) GEMM output directly and head-slices in
        VMEM (fused_qkv_attention). Also direct/no-wrapper.
      "auto" — kernel at >= MIN_PALLAS_CROPS collapsed crops, einsum
        below, behind a custom_vmap rule that folds vmap axes into the
        crop batch first (the frame pipeline vmaps 2-crop instances).

    "pallas"/"auto" are INFERENCE-ONLY: custom_vmap does not compose
    with reverse-mode autodiff — training code must use
    nn.mha_self_attention. Matches the reference's vanilla softmax
    attention (/root/reference/hamer/hamer/models/backbones/vit.py:110-126).

    ``out_scale``: optional f32 static activation scale of the consuming
    int8 GEMM — the result is quantized to int8 (in the kernel epilogue
    on the pallas_direct path, inline on the einsum path).
    """
    if force is None:
        env = os.environ.get("HYT_ATTN")
        force = env if env in ("xla", "pallas", "pallas_direct",
                               "pallas_fusedqkv", "auto") else "xla"
    if out_scale is not None and force not in ("xla", "pallas_direct",
                                               "pallas_fusedqkv"):
        raise ValueError(
            "out_scale requires force='xla'/'pallas_direct'/'pallas_fusedqkv'")
    if force == "pallas_fusedqkv":
        return fused_qkv_attention(qkv, num_heads, interpret=interpret,
                                   out_scale=out_scale)
    if force in ("xla", "pallas_direct"):
        B, N, td = qkv.shape
        h = num_heads
        hd = td // 3 // h
        x = qkv.reshape(B, N, 3, h, hd)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        if force == "pallas_direct":
            out = fused_short_attention(
                jnp.transpose(q, (0, 2, 1, 3)),
                jnp.transpose(k, (0, 2, 1, 3)),
                jnp.transpose(v, (0, 2, 1, 3)), interpret=interpret,
                out_scale=out_scale)
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, h * hd)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * (hd ** -0.5), k)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, h * hd)
        if out_scale is not None:
            s = jnp.asarray(out_scale, jnp.float32).reshape(())
            out = jnp.clip(jnp.round(out.astype(jnp.float32) / s),
                           -127, 127).astype(jnp.int8)
        return out
    return _qkv_attention(num_heads, interpret, force)(qkv)


def fast_mha_self_attention(p, x: jax.Array, num_heads: int) -> jax.Array:
    """Inference drop-in for nn.mha_self_attention (same contract) that
    routes the softmax attention through softmax_attention_qkv."""
    from hamer_yolo_tpu.core import nn

    qkv = nn.linear(p["qkv"], x)
    out = softmax_attention_qkv(qkv, num_heads)
    return nn.linear(p["proj"], out)
