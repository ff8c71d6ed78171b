"""Pallas fused W8A8 matmul: prologue + dynamic quantize + int8 MXU GEMM.

Why this kernel exists (round-2 findings, CLAUDE.md / core/quant.py):
W8A8 via plain ``dot_general`` does engage the v5e int8 MXU mode
(microbench 152 vs 117 bf16 TFLOP/s at ViT shapes), but the *dynamic
per-token quantization* runs as unfused XLA elementwise passes — a full
HBM read+write of every activation tensor before each of the 4 matmuls
per transformer block. At large batch that overhead is ~15 ms per b128
dispatch, and once ToMe shrinks the GEMMs it dominates outright (int8 +
ToMe r4 measured 147.8 fps vs 159.0 for ToMe alone).

This kernel makes the quantize (and the adjacent LayerNorm / GELU
elementwise pass) free by computing them in VMEM inside the GEMM:

  grid (M/TM, N/TN), x tile (TM, K) resident across the j sweep:
    j == 0:  x -> f32 -> [LayerNorm | GELU | id] -> row absmax
             -> int8 scratch (TM, K) + row scales (TM, 1)
    every j: int8 dot (TM, K) x (K, TN) -> int32 acc on the MXU
             -> * sx * sw + bias -> bf16 out tile

The activation tensor is read from HBM exactly once per GEMM (Pallas
skips the re-fetch while the block index is unchanged), the int8
quantization never round-trips to HBM, and the LN/GELU pass that
preceded the matmul in the unfused graph disappears entirely.

Quantization semantics match core/quant.quantize_act_int8 (symmetric
per-row absmax, scale = max(absmax/127, 1e-8), round-half-even, clip to
[-127, 127]) except that the prologue + quantize run in f32 rather than
bf16 — strictly tighter numerics, qualified end-to-end by
tools/eval_fastpaths.py.

Replaces (TPU-natively) the reference's dynamic-quantization story: the
reference ships TensorRT int8 with an entropy calibrator
(yolo/yolov7/TensorRT-For-YOLO-Series-cuda-python/export.py:17-92); here
per-token dynamic scales are computed in-kernel at zero marginal cost, so
no calibration pass is needed at all.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)

# Even-polynomial GELU for the int8 path (HYT_GELU=poly): GELU(x) =
# x/2 + E(x) with E(x) = (x/2)erf(x/sqrt(2)) EVEN, so E fits a
# polynomial in u = x^2. Chebyshev-fit degree 8 on |x| <= 4 gives max
# abs err 1.2e-4 (tail |x| > 4 uses the asymptote gelu ~ x / 0, err
# 1.3e-4) — ~600x below one int8 quantization step of the consumer
# (s2 = absmax/127, absmax ~ 10 post-GELU), i.e. bit-identical after
# the round() in virtually every lane. Replaces the A&S erf's exp +
# divide + 12 FMA with 9 cheap FMA: the GELU runs on the fat (M, 4K)
# fc1 output (252M elements/layer at 256 crops), where special-function
# VPU ops are the megakernel's dominant non-MXU cost.
_GELU_POLY_U = (  # E(x) = sum c_k u^k, u = x^2, Chebyshev LSQ on [0, 16]
    3.138923846637831e-05, 0.3985892442238482, -0.0658308598919238,
    0.009491168272223864, -0.001005431695009259, 7.497100545436031e-05,
    -3.6818665106501106e-06, 1.0570036565177172e-07,
    -1.3327008826321846e-09)


def _gelu_poly_f32(x: jax.Array) -> jax.Array:
    u = jnp.minimum(x * x, 16.0)
    e = jnp.float32(_GELU_POLY_U[-1])
    for c in _GELU_POLY_U[-2::-1]:
        e = e * u + jnp.float32(c)
    y = 0.5 * x + e
    y = jnp.where(x > 4.0, x, y)
    return jnp.where(x < -4.0, 0.0, y)


def gelu_prologue() -> str:
    """Trace-time env knob (HYT_GELU=poly|exact): picks the GELU
    prologue STRING so the flavor keys every jit/lru cache (an env read
    inside an already-traced kernel body would go stale — inner-jit
    jaxprs cache by avals/statics only).

    TPU default is POLY — qualified by the interleaved A/B
    (tools/bench_attn_ab.py b128 static-int8: mega_mlp 502.6 ms vs
    mega_gelu 482.2, +10.8 fps) and by tools/eval_fastpaths.py (the
    int8_static_mega_gelu_poly arm matches int8_sta_mega MPVPE — the
    1.2e-4 poly error is ~600x below one int8 step of the fc2
    quantize). Off-TPU (and under HYT_GELU=exact) the A&S-erf exact
    form stays the default: the int8 megakernels only engage on TPU
    and CPU interpret-mode parity tests pin exact semantics."""
    import os

    env = os.environ.get("HYT_GELU")
    if env == "poly":
        return "gelu_poly"
    if env is None and _on_tpu():
        return "gelu_poly"
    return "gelu"


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _erf_f32(x: jax.Array) -> jax.Array:
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7; Mosaic has no
    erf lowering, so the exact-GELU prologue uses this rational form)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _prologue_f32(x: jax.Array, prologue: str, g, b) -> jax.Array:
    """x: (TM, K) f32 -> (TM, K) f32 after the fused elementwise stage."""
    if prologue == "ln":
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-6)
        x = x * g + b
    elif prologue == "gelu":
        # Exact-form (erf) GELU, matching jax.nn.gelu(approximate=False)
        # to ~1e-7 via the rational erf above.
        x = 0.5 * x * (1.0 + _erf_f32(x / _SQRT2))
    elif prologue == "gelu_poly":
        x = _gelu_poly_f32(x)
    elif prologue != "id":
        raise ValueError(f"unknown prologue {prologue!r}")
    return x


def _kernel(x_ref, w_ref, sw_ref, b_ref, g_ref, bt_ref, o_ref,
            xq_ref, sx_ref, *, prologue: str, sxs_ref=None):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _quantize():
        x = x_ref[:].astype(jnp.float32)
        x = _prologue_f32(x, prologue,
                          g_ref[:].astype(jnp.float32),
                          bt_ref[:].astype(jnp.float32))
        if sxs_ref is None:
            absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            scale = jnp.maximum(absmax / 127.0, 1e-8)
        else:
            # Static calibrated per-tensor scale: no absmax reduction.
            scale = jnp.broadcast_to(sxs_ref[:], sx_ref.shape)
        # one reciprocal per ROW, multiply per element (VPU divides are
        # multi-cycle; x / scale would divide per element)
        xq_ref[:] = jnp.clip(jnp.round(x * (1.0 / scale)),
                             -127, 127).astype(jnp.int8)
        sx_ref[:] = scale

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
    y = y + b_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _kernel_static(x_ref, w_ref, sw_ref, b_ref, g_ref, bt_ref, sxs_ref,
                   o_ref, xq_ref, sx_ref, *, prologue: str):
    _kernel(x_ref, w_ref, sw_ref, b_ref, g_ref, bt_ref, o_ref,
            xq_ref, sx_ref, prologue=prologue, sxs_ref=sxs_ref)


def _pick_tile(n: int, pref: int) -> int:
    for t in (pref, 512, 384, 256, 128):
        if t <= pref and n % t == 0:
            return t
    return n  # small / odd dims: single tile


def _pallas_matmul(x2, wq, wscale2, bias2, g2, bt2, sxs2, *, prologue, tm, tn,
                   out_dtype, interpret):
    """x2: (M, K) -> (M, N). Scale/bias/LN args pre-shaped (1, dim) f32.
    sxs2: None (dynamic per-row quantize) or (1, 1) f32 static scale."""
    M, K = x2.shape
    N = wq.shape[1]
    tm_ = tm  # M is padded up, so any tile works
    Mp = -(-M // tm_) * tm_
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    tn_ = _pick_tile(N, tn)

    in_specs = [
        pl.BlockSpec((tm_, K), lambda i, j: (i, 0)),
        pl.BlockSpec((K, tn_), lambda i, j: (0, j)),
        pl.BlockSpec((1, tn_), lambda i, j: (0, j)),
        pl.BlockSpec((1, tn_), lambda i, j: (0, j)),
        pl.BlockSpec((1, K), lambda i, j: (0, 0)),
        pl.BlockSpec((1, K), lambda i, j: (0, 0)),
    ]
    args = (x2, wq, wscale2, bias2, g2, bt2)
    kern = functools.partial(_kernel, prologue=prologue)
    if sxs2 is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, j: (0, 0)))
        args = args + (sxs2,)
        kern = functools.partial(_kernel_static, prologue=prologue)

    grid = (Mp // tm_, N // tn_)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm_, tn_), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((tm_, K), jnp.int8),
            pltpu.VMEM((tm_, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K * N * (Mp // tm_) + Mp * N * 2,
            transcendentals=Mp * K if prologue == "gelu" else 0,
        ),
        interpret=interpret,
    )(*args)
    if Mp != M:
        out = out[:M]
    return out


def int8_dot_prequant(xq: jax.Array, wq: jax.Array, wscale: jax.Array,
                      bias: Optional[jax.Array], sx: jax.Array,
                      out_dtype=jnp.bfloat16) -> jax.Array:
    """(..., K) int8 @ (K, N) int8 -> (..., N) out_dtype.

    The PRE-QUANTIZED input case: ``xq`` was already quantized by the
    producer (e.g. the attention kernel's int8 epilogue,
    ops/attention_pallas.fused_short_attention(out_scale=...)) with the
    static per-tensor activation scale ``sx``. Just the MXU int8 dot +
    dequant epilogue — no prologue, no quantize pass, and dot_general
    batches leading dims natively so no custom_vmap machinery is needed
    at any M."""
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (acc.astype(jnp.float32) * sx.reshape(()).astype(jnp.float32)
         * wscale.reshape((1,) * (xq.ndim - 1) + (-1,)).astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _mlp1_kernel(x_ref, w_ref, sw_ref, b_ref, g_ref, bt_ref, s1_ref,
                 s2_ref, o_ref, *, gelu: str = "gelu"):
    x = x_ref[:].astype(jnp.float32)
    x = _prologue_f32(x, "ln", g_ref[:].astype(jnp.float32),
                      bt_ref[:].astype(jnp.float32))
    s1 = s1_ref[0, 0]
    xq = jnp.clip(jnp.round(x * (1.0 / s1)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (s1 * sw_ref[:].astype(jnp.float32)) \
        + b_ref[:].astype(jnp.float32)
    y = _prologue_f32(y, gelu, None, None)
    o_ref[:] = jnp.clip(jnp.round(y * (1.0 / s2_ref[0, 0])),
                        -127, 127).astype(jnp.int8)


def _mlp2_kernel(yq_ref, w_ref, sw_ref, b_ref, s2_ref, tok_ref, o_ref):
    acc = jax.lax.dot_general(
        yq_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    z = acc.astype(jnp.float32) * (s2_ref[0, 0]
                                   * sw_ref[:].astype(jnp.float32)) \
        + b_ref[:].astype(jnp.float32)
    o_ref[:] = (tok_ref[:].astype(jnp.float32) + z).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tm", "gelu"))
def fused_int8_mlp_block(
    tok: jax.Array,
    w1q: jax.Array, w1scale: jax.Array, b1: Optional[jax.Array],
    w2q: jax.Array, w2scale: jax.Array, b2: Optional[jax.Array],
    ln_scale: jax.Array, ln_bias: jax.Array,
    sx1: jax.Array, sx2: jax.Array,
    interpret: bool = False, tm: int = 128, gelu: str = "gelu",
) -> jax.Array:
    """The MLP MEGAKERNEL pair: LN+quantize+fc1+GELU+quantize in one
    pallas_call, fc2+dequant+RESIDUAL in a second — each with its full
    (K, N) int8 weight RESIDENT in VMEM (constant index map: one HBM
    fetch per layer, reused across every M tile and every vmap
    instance). Returns tok + mlp(LN(tok)) — the residual is fused into
    fc2's epilogue, so the only HBM tensors per layer are tok (in/out)
    and the int8 GELU activations.

    Requires static calibrated scales (sx1 post-LN, sx2 post-GELU).
    Env-gated HYT_INT8_MLP=megakernel (core/quant) until the
    interleaved e2e A/B qualifies it: the in-kernel fat GEMMs must be
    within ~25% of XLA's fat-N dot rate (probe arms
    int8_pallas_res5120_tm* in tools/probe_int8_ceiling.py).
    Quantize/GELU semantics identical to the fused_int8_matmul
    prologues (round-half-even, clip +-127, A&S erf)."""
    lead = tok.shape[:-1]
    K = tok.shape[-1]
    H = w1q.shape[1]
    x2 = tok.reshape(-1, K)
    M = x2.shape[0]
    Mp = -(-M // tm) * tm
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    if b1 is None:
        b1 = jnp.zeros((H,), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((K,), jnp.float32)
    s1 = jnp.asarray(sx1, jnp.float32).reshape(1, 1)
    s2 = jnp.asarray(sx2, jnp.float32).reshape(1, 1)

    yq = pl.pallas_call(
        functools.partial(_mlp1_kernel, gelu=gelu),
        grid=(Mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i: (i, 0)),
            pl.BlockSpec((K, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, H), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * H,
            bytes_accessed=Mp * K * 2 + K * H + Mp * H,
            transcendentals=Mp * H if gelu == "gelu" else 0),
        interpret=interpret,
    )(x2, w1q, w1scale.reshape(1, H).astype(jnp.float32),
      b1.reshape(1, H).astype(jnp.float32),
      ln_scale.reshape(1, K).astype(jnp.float32),
      ln_bias.reshape(1, K).astype(jnp.float32), s1, s2)

    out = pl.pallas_call(
        _mlp2_kernel,
        grid=(Mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, H), lambda i: (i, 0)),
            pl.BlockSpec((H, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((tm, K), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tm, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, K), tok.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * H * K,
            bytes_accessed=Mp * H + H * K + Mp * K * 4,
            transcendentals=0),
        interpret=interpret,
    )(yq, w2q, w2scale.reshape(1, K).astype(jnp.float32),
      b2.reshape(1, K).astype(jnp.float32), s2, x2)
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, K)


def _mlp1p_kernel(x_ref, w1_ref, s1w_ref, b1_ref, w2_ref, s2w_ref, b2_ref,
                  g_ref, bt_ref, s1_ref, s2_ref, o_ref, *, gelu: str,
                  hc: int):
    x0 = x_ref[:].astype(jnp.float32)  # kept live for the residual
    x = _prologue_f32(x0, "ln", g_ref[:].astype(jnp.float32),
                      bt_ref[:].astype(jnp.float32))
    s1 = s1_ref[0, 0]
    s2 = s2_ref[0, 0]
    xq = jnp.clip(jnp.round(x * (1.0 / s1)), -127, 127).astype(jnp.int8)
    H = w1_ref.shape[1]
    acc = None
    for c in range(0, H, hc):
        a1 = jax.lax.dot_general(
            xq, w1_ref[:, c:c + hc],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = a1.astype(jnp.float32) * (s1 * s1w_ref[:, c:c + hc]
                                      .astype(jnp.float32)) \
            + b1_ref[:, c:c + hc].astype(jnp.float32)
        y = _prologue_f32(y, gelu, None, None)
        yq = jnp.clip(jnp.round(y * (1.0 / s2)),
                      -127, 127).astype(jnp.int8)
        a2 = jax.lax.dot_general(
            yq, w2_ref[c:c + hc, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = a2 if acc is None else acc + a2  # i32: exact chunk sum
    z = acc.astype(jnp.float32) * (s2 * s2w_ref[:].astype(jnp.float32)) \
        + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (x0 + z).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tm", "gelu",
                                              "hc"))
def fused_int8_mlp_block1(
    tok: jax.Array,
    w1q: jax.Array, w1scale: jax.Array, b1: Optional[jax.Array],
    w2q: jax.Array, w2scale: jax.Array, b2: Optional[jax.Array],
    ln_scale: jax.Array, ln_bias: jax.Array,
    sx1: jax.Array, sx2: jax.Array,
    interpret: bool = False, tm: int = 128, gelu: str = "gelu",
    hc: int = 1280,
) -> jax.Array:
    """The SINGLE-CALL MLP megakernel: LN+quantize+fc1+GELU+quantize+
    fc2+dequant+residual in ONE pallas_call, both int8 weights VMEM-
    resident (constant index maps: one HBM fetch per layer).

    vs the fused_int8_mlp_block PAIR, the (M, H) int8 GELU activation
    tensor never exists in HBM: at 256 crops that is ~500 MB of traffic
    per layer (written by kernel 1, re-read by kernel 2) replaced by
    nothing. fc1/fc2 are processed in ``hc``-column chunks so the i32/f32
    intermediates stay (tm, hc); the per-chunk fc2 partial sums
    accumulate in int32, so the math is BIT-IDENTICAL to the pair
    (same quantize semantics, same int32 dot, one dequant at the end).
    Cost: ~13 MB of resident weights, above Mosaic's default scoped-VMEM
    budget — vmem_limit_bytes raised explicitly; qualified only via the
    interleaved e2e A/B (tools/bench_attn_ab.py arm mega1).
    Engagement: HYT_INT8_MLP=megakernel1 (core/quant.int8_block_mlp_residual)."""
    lead = tok.shape[:-1]
    K = tok.shape[-1]
    H = w1q.shape[1]
    if H % hc:
        hc = H
    x2 = tok.reshape(-1, K)
    M = x2.shape[0]
    Mp = -(-M // tm) * tm
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    if b1 is None:
        b1 = jnp.zeros((H,), jnp.float32)
    if b2 is None:
        b2 = jnp.zeros((K,), jnp.float32)
    s1 = jnp.asarray(sx1, jnp.float32).reshape(1, 1)
    s2 = jnp.asarray(sx2, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_mlp1p_kernel, gelu=gelu, hc=hc),
        grid=(Mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, K), lambda i: (i, 0)),
            pl.BlockSpec((K, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, K), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, K), tok.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * Mp * K * H,
            bytes_accessed=Mp * K * 4 + K * H * 2,
            transcendentals=Mp * H if gelu == "gelu" else 0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x2, w1q, w1scale.reshape(1, H).astype(jnp.float32),
      b1.reshape(1, H).astype(jnp.float32),
      w2q, w2scale.reshape(1, K).astype(jnp.float32),
      b2.reshape(1, K).astype(jnp.float32),
      ln_scale.reshape(1, K).astype(jnp.float32),
      ln_bias.reshape(1, K).astype(jnp.float32), s1, s2)
    if Mp != M:
        out = out[:M]
    return out.reshape(*lead, K)


# Below this row count the fully-fused Pallas GEMM wins (weight traffic
# amortizes poorly at tiny M; measured ViT 194 -> 28 ms at 2 crops).
# Above it, XLA's int8 dot_general + auto-fused elementwise chain is at
# the MXU roofline and strictly faster (chained bench at M=49152).
FUSED_GEMM_MAX_M = 8192


def _xla_chain(x, wq, wscale2, bias2, g2, bt2, prologue, out_dtype,
               sxs2=None):
    """Plain inline XLA int8 chain in the COMPUTE dtype, rank-polymorphic.

    Measured (tools/profile_int8_vit.py + bench_int8_kernel.py at
    256-crop shapes): XLA auto-fuses this prologue + quantize chain well,
    its int8 dot_general runs at the MXU int8 roofline where our hand
    Pallas GEMM measured behind, keeping the elementwise chain in bf16
    instead of f32 saves +349 ms of HBM traffic per b128 ViT, and
    emitting it INLINE (no custom_vmap / nested-jit boundary) lets XLA
    fuse it with the surrounding residual/attention graph.

    With a static calibrated scale (sxs2, (1, 1) f32) the per-row absmax
    reduction disappears: the quantize becomes a pure elementwise map
    that XLA fuses into the prologue (one HBM pass over x instead of
    two), and the activation scale folds into the per-channel weight
    scale at zero marginal cost.

    HYT_INT8_EP=bf16 (trace-time env, default f32) runs the dequant
    epilogue in bf16 on the fat (M, N) tensor — the acc is <= 127*127*K
    ~ 8e7, so bf16's 8 mantissa bits cost ~0.4% relative on a path
    already at ~1% quantization noise. Probe arm: probe_mlp_chain
    ep_bf16; qualify via tools/eval_fastpaths.py before defaulting."""
    import os

    ep = jnp.bfloat16 if os.environ.get("HYT_INT8_EP") == "bf16" \
        else jnp.float32
    x = _prologue_f32(x, prologue, g2.astype(x.dtype), bt2.astype(x.dtype))
    if sxs2 is None:
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sx = jnp.maximum((absmax / 127.0).astype(jnp.float32), 1e-8)
    else:
        sx = sxs2.reshape((1,) * x.ndim)
    xq = jnp.clip(jnp.round(x / sx.astype(x.dtype)),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = (acc.astype(ep) * (sx * wscale2).astype(ep)
         + bias2.astype(ep))
    return y.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _flat_matmul(prologue: str, tm: int, tn: int, out_dtype, interpret: bool,
                 force=None, static: bool = False):
    """custom_vmap'd (M, K) matmul for the SMALL-M regime.

    vmapping collapses the mapped axis into M instead of replicating the
    kernel per batch element — without this, a vmapped caller (the frame
    pipeline vmaps infer_frame over the serving batch) would batch the
    pallas_call itself, every instance re-fetching the full int8 weight
    matrix from HBM (measured: 110 fps e2e at b128 vs ~160 collapsed).
    If the COLLAPSED M lands above FUSED_GEMM_MAX_M, the rule emits the
    inline XLA chain on the batched tensor instead (dot_general batches
    leading dims natively; no collapse reshapes, no fusion boundary).

    ``static``: the trailing operand is a (1, 1) calibrated activation
    scale (per-tensor static quantization) instead of dynamic absmax."""

    @jax.custom_batching.custom_vmap
    def flat(x2, wq, wscale2, bias2, g2, bt2, *sxs):
        use_xla = (force == "xla" or
                   (force is None and x2.shape[0] > FUSED_GEMM_MAX_M))
        if use_xla:
            return _xla_chain(x2, wq, wscale2, bias2, g2, bt2,
                              prologue, out_dtype,
                              sxs[0] if static else None)
        # Small-M Pallas path: the in-VMEM dynamic absmax is free here
        # (no HBM pass to save) and strictly tighter than a per-tensor
        # static scale — AND the static kernel variant measured a scoped-
        # VMEM blowup at K=5120 tiles on v5e. Use dynamic quantize; the
        # static operand only changes behavior in the large-M XLA chain.
        sxs2 = sxs[0] if (static and (interpret or force == "pallas")) \
            else None
        return _pallas_matmul(x2, wq, wscale2, bias2, g2, bt2, sxs2,
                              prologue=prologue, tm=tm, tn=tn,
                              out_dtype=out_dtype, interpret=interpret)

    @flat.def_vmap
    def _rule(axis_size, in_batched, x2, wq, wscale2, bias2, g2, bt2, *sxs):
        if any(in_batched[1:]):
            raise NotImplementedError(
                "fused_int8_matmul: batched weights/scales unsupported")
        Bv, M, K = x2.shape
        if force != "pallas" and (force == "xla"
                                  or Bv * M > FUSED_GEMM_MAX_M):
            return _xla_chain(x2, wq, wscale2, bias2, g2, bt2,
                              prologue, out_dtype,
                              sxs[0] if static else None), True
        out = flat(x2.reshape(Bv * M, K), wq, wscale2, bias2, g2, bt2, *sxs)
        return out.reshape(Bv, M, -1), True

    return flat


def fused_int8_matmul(
    x: jax.Array,
    wq: jax.Array,
    wscale: jax.Array,
    bias: Optional[jax.Array] = None,
    ln_scale: Optional[jax.Array] = None,
    ln_bias: Optional[jax.Array] = None,
    *,
    prologue: str = "id",
    tm: int = 256,
    tn: int = 256,
    out_dtype=None,
    interpret: bool = False,
    force=None,
    static_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """[LN|GELU|id](x) @ dequant-int8 wq + bias, quantizing x per row.

    x: (..., K) bf16/f32; wq: (K, N) int8; wscale: (N,) f32;
    bias: (N,) or None; ln_scale/ln_bias: (K,) when prologue == "ln".
    Returns (..., N) in out_dtype (default: x.dtype).
    ``force``: None = pick by collapsed M (FUSED_GEMM_MAX_M); "pallas" /
    "xla" pin the implementation (benchmarking).
    ``static_scale``: scalar f32 calibrated activation scale — replaces
    the dynamic per-row absmax quantize with a pure elementwise map (one
    HBM pass over x instead of two; see core.quant.attach_static_act_scales).
    Only takes effect on the LARGE-M XLA-chain path: the small-M Pallas
    kernel always quantizes dynamically in VMEM (free there, tighter, and
    immune to the K=5120 scoped-VMEM blowup of the static kernel variant).
    """
    K = x.shape[-1]
    N = wq.shape[1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    out_dtype = jnp.dtype(out_dtype or x.dtype)

    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    if ln_scale is None:
        ln_scale = jnp.ones((K,), jnp.float32)
    if ln_bias is None:
        ln_bias = jnp.zeros((K,), jnp.float32)

    args = (
        wq,
        wscale.reshape(1, N).astype(jnp.float32),
        bias.reshape(1, N).astype(jnp.float32),
        ln_scale.reshape(1, K).astype(jnp.float32),
        ln_bias.reshape(1, K).astype(jnp.float32),
    )
    static = static_scale is not None
    sxs = ((static_scale.reshape(1, 1).astype(jnp.float32),) if static
           else ())
    if force != "pallas" and (force == "xla"
                              or x2.shape[0] > FUSED_GEMM_MAX_M):
        # Large per-call M: emit the XLA chain INLINE — no custom_vmap /
        # jit boundary, so XLA fuses it with the caller's graph. (Under
        # vmap the per-instance M is small; the custom_vmap rule below
        # handles the collapsed-M decision.)
        return _xla_chain(x, *args, prologue, out_dtype,
                          sxs[0] if static else None)

    flat = _flat_matmul(prologue, tm, tn, out_dtype, interpret, force,
                        static)
    out = flat(x2, *args, *sxs)
    return out.reshape(*lead, N)
