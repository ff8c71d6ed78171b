"""Microbench: Pallas fused-quantize int8 GEMM vs unfused int8 vs bf16.

Times one full ViT-H block's worth of GEMMs (qkv+LN, proj, fc1+LN,
fc2+GELU) at serving shapes on the real chip. Scalar-fetch timing per
CLAUDE.md (axon block_until_ready returns early on lazy arrays).

  python tools/bench_int8_kernel.py [M]   # M = rows (default 24576 = b128)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core import quant
    from hamer_yolo_tpu.ops.int8_matmul import fused_int8_matmul

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 24576
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1  # chain repeats
    D, H = 1280, 5120
    rng = np.random.default_rng(0)

    def mk(k, n):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.03)
        return quant.quantize_weight_int8(w), w

    (qkv_q, qkv_w), (proj_q, proj_w) = mk(D, 3 * D), mk(D, D)
    (fc1_q, fc1_w), (fc2_q, fc2_w) = mk(D, H), mk(H, D)
    g = jnp.ones((D,), jnp.float32)
    b = jnp.zeros((D,), jnp.float32)
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32)).astype(jnp.bfloat16)

    def ln(x, s, bi):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-6) * s.astype(x.dtype) + bi.astype(x.dtype)

    def block_fused(x, force=None, tm=256, tn=256):
        a = fused_int8_matmul(x, qkv_q["q"], qkv_q["scale"], None, g, b,
                              prologue="ln", force=force, tm=tm, tn=tn)
        a = fused_int8_matmul(a[:, :D], proj_q["q"], proj_q["scale"], None,
                              prologue="id", force=force, tm=tm, tn=tn)
        h = fused_int8_matmul(x + a, fc1_q["q"], fc1_q["scale"], None, g, b,
                              prologue="ln", force=force, tm=tm, tn=tn)
        o = fused_int8_matmul(h, fc2_q["q"], fc2_q["scale"], None,
                              prologue="gelu", force=force, tm=tm, tn=tn)
        return (x + o * 0.001).astype(x.dtype)

    @jax.jit
    def chain_fused(x):
        for _ in range(L):
            x = block_fused(x)
        return jnp.sum(x.astype(jnp.float32))

    def make_forced(force, tm, tn):
        @jax.jit
        def run(x):
            for _ in range(L):
                x = block_fused(x, force=force, tm=tm, tn=tn)
            return jnp.sum(x.astype(jnp.float32))
        return run

    chain_pallas_256 = make_forced("pallas", 256, 256)

    def block_unfused(x):
        y = quant.int8_linear({"q": qkv_q["q"], "scale": qkv_q["scale"]}, ln(x, g, b))
        y = quant.int8_linear({"q": proj_q["q"], "scale": proj_q["scale"]}, y[:, :D])
        h = quant.int8_linear({"q": fc1_q["q"], "scale": fc1_q["scale"]}, ln(x + y, g, b))
        h = jax.nn.gelu(h, approximate=False)
        o = quant.int8_linear({"q": fc2_q["q"], "scale": fc2_q["scale"]}, h)
        return (x + o * 0.001).astype(x.dtype)

    @jax.jit
    def chain_unfused(x):
        for _ in range(L):
            x = block_unfused(x)
        return jnp.sum(x.astype(jnp.float32))

    def block_bf16(x):
        y = ln(x, g, b) @ qkv_w.astype(jnp.bfloat16)
        y = y[:, :D] @ proj_w.astype(jnp.bfloat16)
        h = ln(x + y, g, b) @ fc1_w.astype(jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        o = h @ fc2_w.astype(jnp.bfloat16)
        return (x + o * 0.001).astype(x.dtype)

    @jax.jit
    def chain_bf16(x):
        for _ in range(L):
            x = block_bf16(x)
        return jnp.sum(x.astype(jnp.float32))

    flops = 2 * M * (D * 3 * D + D * D + D * H + H * D) * L
    for name, fn in [("fused", chain_fused), ("unfused_int8", chain_unfused),
                     ("bf16", chain_bf16),
                     ("pallas256", chain_pallas_256)]:
        try:
            float(fn(x))  # compile
            ts = []
            for _ in range(20):
                t0 = time.time()
                float(fn(x))
                ts.append(time.time() - t0)
            p50 = float(np.percentile(ts, 50))
            # ~28 ms tunnel overhead per dispatch (CLAUDE.md) — report both.
            dev = max(p50 - 0.028, 1e-9)
            print(f"{name:14s} p50 {p50*1e3:7.2f} ms  (dev ~{dev*1e3:6.2f} ms, "
                  f"{flops/dev/1e12:6.1f} TFLOP/s)")
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
