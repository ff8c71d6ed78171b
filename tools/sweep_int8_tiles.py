"""Per-shape tile sweep: Pallas fused int8 GEMM vs XLA int8 dot_general.

Isolates the GEMM inner loop from the elementwise story: for each ViT-H
matmul shape at M rows, times
  - xla_pure:   pre-quantized int8 x @ int8 w (dot_general) — the MXU
                ceiling XLA achieves, no quantize cost;
  - xla_chain:  LN/GELU + dynamic quantize + dot (the real unfused path);
  - pallas tm/tn variants of the fused kernel.

  python tools/sweep_int8_tiles.py [M]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core import quant
    from hamer_yolo_tpu.ops.int8_matmul import fused_int8_matmul

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    shapes = [("qkv", 1280, 3840, "ln"), ("proj", 1280, 1280, "id"),
              ("fc1", 1280, 5120, "ln"), ("fc2", 5120, 1280, "gelu")]
    rng = np.random.default_rng(0)

    for name, K, N, prologue in shapes:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.03)
        wq = quant.quantize_weight_int8(w)
        g = jnp.ones((K,), jnp.float32)
        b = jnp.zeros((K,), jnp.float32)
        xq_pre, sx_pre = jax.jit(quant.quantize_act_int8)(x)
        jax.block_until_ready((xq_pre, sx_pre))
        flops = 2 * M * K * N

        def ln(x):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-6)

        @jax.jit
        def xla_pure(xq, wqq):
            acc = jax.lax.dot_general(xq, wqq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return jnp.sum(acc)

        @jax.jit
        def xla_chain(x):
            h = x
            if prologue == "ln":
                h = ln(h)
            elif prologue == "gelu":
                h = jax.nn.gelu(h, approximate=False)
            y = quant.int8_linear({"q": wq["q"], "scale": wq["scale"]}, h)
            return jnp.sum(y.astype(jnp.float32))

        cases = [("xla_pure", lambda: float(xla_pure(xq_pre, wq["q"]))),
                 ("xla_chain", lambda: float(xla_chain(x)))]
        for tm in (256, 512):
            for tn in (256, 512):
                fn = jax.jit(functools.partial(
                    fused_int8_matmul, prologue=prologue, tm=tm, tn=tn))

                def run(fn=fn):
                    return float(jnp.sum(fn(
                        x, wq["q"], wq["scale"], None,
                        g if prologue == "ln" else None,
                        b if prologue == "ln" else None).astype(jnp.float32)))
                cases.append((f"pallas_{tm}x{tn}", run))

        for cname, run in cases:
            try:
                run()
                ts = []
                for _ in range(10):
                    t0 = time.time()
                    run()
                    ts.append(time.time() - t0)
                p50 = float(np.percentile(ts, 50))
                dev = max(p50 - 0.028, 1e-9)
                print(f"{name:5s} {cname:14s} p50 {p50*1e3:7.2f} ms "
                      f"(dev ~{dev*1e3:6.2f}, {flops/dev/1e12:6.1f} TFLOP/s)")
            except Exception as e:
                print(f"{name:5s} {cname:14s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
        print()


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
