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

    @jax.jit
    def chain_fused(x):
        a = fused_int8_matmul(x, qkv_q["q"], qkv_q["scale"], None, g, b, prologue="ln")
        a = fused_int8_matmul(a[:, :D], proj_q["q"], proj_q["scale"], None, prologue="id")
        h = fused_int8_matmul(x + a, fc1_q["q"], fc1_q["scale"], None, g, b, prologue="ln")
        o = fused_int8_matmul(h, fc2_q["q"], fc2_q["scale"], None, prologue="gelu")
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def chain_unfused(x):
        a = quant.int8_linear(qkv_q | {}, 0, 0) if False else None  # noqa
        y = quant.int8_linear({"q": qkv_q["q"], "scale": qkv_q["scale"]}, ln(x, g, b))
        y = quant.int8_linear({"q": proj_q["q"], "scale": proj_q["scale"]}, y[:, :D])
        h = quant.int8_linear({"q": fc1_q["q"], "scale": fc1_q["scale"]}, ln(x + y, g, b))
        h = jax.nn.gelu(h, approximate=False)
        o = quant.int8_linear({"q": fc2_q["q"], "scale": fc2_q["scale"]}, h)
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def chain_bf16(x):
        y = ln(x, g, b) @ qkv_w.astype(jnp.bfloat16)
        y = y[:, :D] @ proj_w.astype(jnp.bfloat16)
        h = ln(x + y, g, b) @ fc1_w.astype(jnp.bfloat16)
        h = jax.nn.gelu(h, approximate=False)
        o = h @ fc2_w.astype(jnp.bfloat16)
        return jnp.sum(o.astype(jnp.float32))

    flops = 2 * M * (D * 3 * D + D * D + D * H + H * D)
    for name, fn in [("fused", chain_fused), ("unfused_int8", chain_unfused),
                     ("bf16", chain_bf16)]:
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
    main()
