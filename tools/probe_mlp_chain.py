"""Probe: the REAL int8 ViT MLP block at b128 shapes — which formulation
is fastest on this chip?

The e2e int8 chain runs ~152 TFLOP/s while pure int8 dot measures 322
(probe_int8_ceiling.py). Candidate causes at the MLP (where 2/3 of ViT
FLOPs live, fc1 1280->5120 + fc2 5120->1280):
  - fat-dim dots are slower per-FLOP than square (N=5120 probe: 166);
  - the i32 accumulator of fc1 (M x 5120 x 4 B ~ 1 GB at M=49152)
    round-trips HBM before the dequant/GELU/quantize consumer fusion.

Times L-chained FULL MLP blocks (ln -> q -> fc1 -> dequant gelu q ->
fc2 -> dequant, static per-tensor act scales as in the production path):

  xla_static     : the shipped _xla_chain formulation (baseline)
  xla_dyn        : same w/ dynamic per-row absmax (the pre-calib path)
  chunkN         : fc1 as 4 separate N=1280 dots, fc2 as 4 K-chunk dots
  acc_bf16       : dots emit bf16 accumulators (halves acc traffic;
                   accuracy must be re-qualified before shipping)
  pallas512      : fused_int8_matmul force="pallas" tm=tn=512 (dynamic
                   in-VMEM quantize; 512x512 measured 212 TFLOP/s pure)
  bf16           : exact bf16 MLP for scale

  python tools/probe_mlp_chain.py [M] [L]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.ops.int8_matmul import fused_int8_matmul

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    D, H = 1280, 5120
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32)).astype(
        jnp.bfloat16)
    w1 = rng.normal(size=(D, H)).astype(np.float32) * 0.03
    w2 = rng.normal(size=(H, D)).astype(np.float32) * 0.03
    b1 = jnp.zeros((H,), jnp.float32)
    b2 = jnp.zeros((D,), jnp.float32)
    g = jnp.ones((D,), jnp.float32)
    bt = jnp.zeros((D,), jnp.float32)

    def qw(w):
        absmax = np.abs(w).max(axis=0)
        s = np.maximum(absmax / 127.0, 1e-8)
        q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        return jnp.asarray(q), jnp.asarray(s.astype(np.float32))

    w1q, s1 = qw(w1)
    w2q, s2 = qw(w2)
    w1b = jnp.asarray(w1).astype(jnp.bfloat16)
    w2b = jnp.asarray(w2).astype(jnp.bfloat16)
    # static per-tensor act scales "calibrated" on x0 itself
    sx1 = jnp.asarray(1.0 / 127.0, jnp.float32).reshape(1, 1)  # post-LN ~N(0,1) -> absmax~4
    sx1 = jnp.asarray(4.0 / 127.0, jnp.float32).reshape(1, 1)
    sx2 = jnp.asarray(3.0 / 127.0, jnp.float32).reshape(1, 1)

    flops = 2.0 * M * D * H * 2 * L

    def ln(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)

    def quant_static(x, s):
        return jnp.clip(jnp.round(x / s.astype(x.dtype)), -127, 127
                        ).astype(jnp.int8)

    def quant_dyn(x):
        absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = jnp.maximum((absmax / 127.0).astype(jnp.float32), 1e-8)
        return quant_static(x, s), s

    def mlp_xla(x, static, acc_dtype=jnp.int32):
        h = ln(x)
        if static:
            xq, sx = quant_static(h, sx1), sx1
        else:
            xq, sx = quant_dyn(h)
        acc = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=acc_dtype)
        y = acc.astype(jnp.float32) * sx * s1[None, :] + b1[None, :]
        y = jax.nn.gelu(y.astype(jnp.bfloat16), approximate=False)
        if static:
            yq, sy = quant_static(y, sx2), sx2
        else:
            yq, sy = quant_dyn(y)
        acc2 = jax.lax.dot_general(yq, w2q, (((1,), (0,)), ((), ())),
                                   preferred_element_type=acc_dtype)
        z = acc2.astype(jnp.float32) * sy * s2[None, :] + b2[None, :]
        return x + z.astype(x.dtype)

    def mlp_chunk(x):
        h = ln(x)
        xq = quant_static(h, sx1)
        cols = []
        for c in range(4):
            acc = jax.lax.dot_general(
                xq, jax.lax.slice_in_dim(w1q, c * D, (c + 1) * D, axis=1),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            cols.append(acc)
        y = (jnp.concatenate(cols, axis=1).astype(jnp.float32)
             * sx1 * s1[None, :] + b1[None, :])
        y = jax.nn.gelu(y.astype(jnp.bfloat16), approximate=False)
        yq = quant_static(y, sx2)
        acc2 = None
        for c in range(4):
            part = jax.lax.dot_general(
                jax.lax.slice_in_dim(yq, c * D, (c + 1) * D, axis=1),
                jax.lax.slice_in_dim(w2q, c * D, (c + 1) * D, axis=0),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            acc2 = part if acc2 is None else acc2 + part
        z = acc2.astype(jnp.float32) * sx2 * s2[None, :] + b2[None, :]
        return x + z.astype(x.dtype)

    def mlp_pallas(x):
        y = fused_int8_matmul(x, w1q, s1, b1, g, bt, prologue="ln",
                              tm=512, tn=512, force="pallas")
        z = fused_int8_matmul(y, w2q, s2, b2, prologue="gelu",
                              tm=512, tn=512, force="pallas")
        return x + z

    def mlp_epilogue(x, act="gelu_erf", ep_dtype=jnp.float32):
        """xla_static with a configurable fc1 epilogue: ``ep_dtype``
        prices the dequant precision (f32 vs bf16 on the fat (M,H)
        tensor), ``act`` prices the nonlinearity (erf-GELU vs tanh-GELU
        vs relu vs none). Attribution arms for the ~6.9 ms/block of
        non-dot cost in xla_static."""
        h = ln(x)
        xq = quant_static(h, sx1)
        acc = jax.lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        scale1 = (sx1 * s1[None, :]).astype(ep_dtype)
        y = acc.astype(ep_dtype) * scale1 + b1[None, :].astype(ep_dtype)
        y = y.astype(jnp.bfloat16)
        if act == "gelu_erf":
            y = jax.nn.gelu(y, approximate=False)
        elif act == "gelu_tanh":
            y = jax.nn.gelu(y, approximate=True)
        elif act == "relu":
            y = jnp.maximum(y, 0)
        elif act != "none":
            raise ValueError(act)
        yq = quant_static(y, sx2)
        acc2 = jax.lax.dot_general(yq, w2q, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        scale2 = (sx2 * s2[None, :]).astype(ep_dtype)
        z = acc2.astype(ep_dtype) * scale2 + b2[None, :].astype(ep_dtype)
        return x + z.astype(x.dtype)

    def mlp_bf16(x):
        h = ln(x)
        y = h @ w1b + b1.astype(jnp.bfloat16)[None, :]
        y = jax.nn.gelu(y, approximate=False)
        z = y @ w2b + b2.astype(jnp.bfloat16)[None, :]
        return x + z

    def chain(step):
        @jax.jit
        def run(x):
            for _ in range(L):
                x = step(x)
            return jnp.sum(x.astype(jnp.float32))
        return run

    variants = {
        "xla_static": chain(functools.partial(mlp_xla, static=True)),
        "xla_dyn": chain(functools.partial(mlp_xla, static=False)),
        "chunkN": chain(mlp_chunk),
        "acc_bf16": chain(functools.partial(
            mlp_xla, static=True, acc_dtype=jnp.bfloat16)),
        "pallas512": chain(mlp_pallas),
        "ep_bf16": chain(functools.partial(
            mlp_epilogue, ep_dtype=jnp.bfloat16)),
        "gelu_tanh": chain(functools.partial(
            mlp_epilogue, act="gelu_tanh", ep_dtype=jnp.bfloat16)),
        "relu": chain(functools.partial(
            mlp_epilogue, act="relu", ep_dtype=jnp.bfloat16)),
        "noact": chain(functools.partial(
            mlp_epilogue, act="none", ep_dtype=jnp.bfloat16)),
        "bf16": chain(mlp_bf16),
    }

    print(f"M={M} D={D} H={H} L={L}  ({flops/1e12:.1f} TFLOP per call)")
    for name, fn in variants.items():
        try:
            float(fn(x0))
            ts = []
            for _ in range(5):
                t0 = time.time()
                float(fn(x0))
                ts.append(time.time() - t0)
            p50 = float(np.percentile(ts, 50))
            dev = max(p50 - 0.028, 1e-6)
            print(f"{name:<12s} p50 {p50*1e3:8.2f} ms  "
                  f"(~{flops/dev/1e12:6.1f} TFLOP/s dev-attributed, "
                  f"{p50*1e3/L:6.2f} ms/block)", flush=True)
        except Exception as e:
            print(f"{name:<12s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
