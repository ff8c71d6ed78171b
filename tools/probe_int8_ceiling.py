"""What is the REAL int8 MXU ceiling on this chip at ViT-H shapes?

The e2e int8 chain measures ~152 TFLOP/s (tools/bench_int8_kernel.py).
v5e's nominal int8 peak is ~2x bf16 (~394 TOPS). This probe separates
"XLA's int8 dot_general is the ceiling" from "the quantize/dequant
elementwise chain is the ceiling" by timing CHAINED (L links, one jit,
scalar fetch — the CLAUDE.md axon timing rules) matmuls with NO
quantize math:

  int8_pure : xq(M,K)i8 @ w(K,N)i8 -> i32, relink via (acc & 127) -> i8
  bf16_pure : same chain in bf16
  int8_pallas: same pure int8 GEMM as a Pallas kernel (K-resident tiles)

  python tools/probe_int8_ceiling.py [M] [L]
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
    from jax.experimental import pallas as pl

    # L must be large: the ~28 ms dispatch floor swallows an 8-link
    # chain (first run of this probe printed >peak rates — floor noise).
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 49152
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    K = N = 1280
    rng = np.random.default_rng(0)

    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    xb = jnp.asarray(rng.normal(size=(M, K)), jnp.float32).astype(jnp.bfloat16)
    wb = jnp.asarray(rng.normal(size=(K, N)), jnp.float32).astype(jnp.bfloat16)

    flops = 2.0 * M * K * N * L

    @jax.jit
    def int8_pure(x):
        for _ in range(L):
            acc = jax.lax.dot_general(x, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            x = (acc & 127).astype(jnp.int8)  # cheap relink, no dequant
        return jnp.sum(acc)

    @jax.jit
    def bf16_pure(x):
        for _ in range(L):
            x = jax.lax.dot_general(x, wb, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
            x = jnp.clip(x, -2.0, 2.0)  # keep finite
        return jnp.sum(x.astype(jnp.float32))

    def pallas_gemm(x, w, tm, tn):
        def kern(x_ref, w_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        return pl.pallas_call(
            kern,
            grid=(M // tm, N // tn),
            in_specs=[pl.BlockSpec((tm, K), lambda i, j: (i, 0)),
                      pl.BlockSpec((K, tn), lambda i, j: (0, j))],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * N,
                bytes_accessed=M * K + K * N * (M // tm) + M * N * 4,
                transcendentals=0),
        )(x, w)

    def make_pallas_chain(tm, tn):
        @jax.jit
        def run(x):
            for _ in range(L):
                acc = pallas_gemm(x, wq, tm, tn)
                x = (acc & 127).astype(jnp.int8)
            return jnp.sum(acc)
        return run

    def bench(name, fn, arg):
        try:
            float(fn(arg))  # compile+warm
            ts = []
            for _ in range(5):
                t0 = time.time()
                float(fn(arg))
                ts.append(time.time() - t0)
            p50 = float(np.percentile(ts, 50))
            # subtract the ~28 ms dispatch floor when attributing rate
            dev = max(p50 - 0.028, 1e-6)
            print(f"{name:<16s} p50 {p50*1e3:7.2f} ms  "
                  f"(~{flops/dev/1e12:6.1f} TFLOP/s device-attributed)",
                  flush=True)
        except Exception as e:
            print(f"{name:<16s} FAILED: {type(e).__name__}: {e}", flush=True)

    print(f"M={M} K={K} N={N} L={L}  ({flops/1e12:.1f} TFLOP per call)")
    bench("bf16_pure", bf16_pure, xb)
    bench("int8_pure_xla", int8_pure, xq)
    for tm, tn in ((256, 256), (512, 256), (512, 512), (1024, 256)):
        bench(f"int8_pallas_{tm}x{tn}", make_pallas_chain(tm, tn), xq)

    # Fat-N (fc1-shaped) variant: relink traffic is 1/4 of the dot's
    # output, so the rate attribution is much less polluted.
    N2 = 5120
    w2q = jnp.asarray(rng.integers(-127, 128, (K, N2)), jnp.int8)
    w2b = jnp.asarray(rng.normal(size=(K, N2)), jnp.float32).astype(jnp.bfloat16)
    flops2 = 2.0 * M * K * N2 * L

    # Relink must consume EVERY output column or XLA dead-code-narrows
    # the dot to the sliced columns (first run: >1000 "TFLOP/s").
    @jax.jit
    def int8_fat(x):
        for _ in range(L):
            acc = jax.lax.dot_general(x, w2q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            x = (acc.reshape(M, 4, K).sum(axis=1) & 127).astype(jnp.int8)
        return jnp.sum(acc)

    @jax.jit
    def bf16_fat(x):
        for _ in range(L):
            acc = jax.lax.dot_general(x, w2b, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.bfloat16)
            x = jnp.clip(acc.reshape(M, 4, K).sum(axis=1), -2.0, 2.0)
        return jnp.sum(acc.astype(jnp.float32))

    flops = flops2  # bench() reads the enclosing variable
    print(f"fat-N: M={M} K={K} N={N2} L={L}  ({flops2/1e12:.1f} TFLOP per call)")
    bench("bf16_fat_xla", bf16_fat, xb)
    bench("int8_fat_xla", int8_fat, xq)

    # Full-N-resident Pallas fat GEMM: grid over M ONLY, the whole
    # (K, Nf) int8 weight stays in VMEM across every step (constant
    # index map -> fetched once), the i32 acc is consumed IN VMEM
    # (folded back to K columns + masked to int8, the same relink as
    # the XLA arms). This is the megakernel GEMM question: can a hand
    # kernel beat XLA's fat-N dot rate (~166 TFLOP/s) when weight
    # traffic is zero and the acc never exists in HBM?
    def pallas_fatres(w, tm):
        Kd, Nf = w.shape
        groups = Nf // Kd

        def kern(x_ref, w_ref, o_ref):
            acc = jax.lax.dot_general(
                x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o_ref[:] = (acc.reshape(tm, groups, Kd).sum(axis=1)
                        & 127).astype(jnp.int8)

        def call(x):
            return pl.pallas_call(
                kern,
                grid=(M // tm,),
                in_specs=[pl.BlockSpec((tm, Kd), lambda i: (i, 0)),
                          pl.BlockSpec((Kd, Nf), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((tm, Kd), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((M, Kd), jnp.int8),
                cost_estimate=pl.CostEstimate(
                    flops=2 * M * Kd * Nf,
                    bytes_accessed=M * Kd * 2 + Kd * Nf,
                    transcendentals=0),
            )(x, w)

        @jax.jit
        def run(x):
            for _ in range(L):
                x = call(x)
            return jnp.sum(x.astype(jnp.int32))
        return run

    for tm in (128, 256):
        bench(f"int8_pallas_res5120_tm{tm}", pallas_fatres(w2q, tm), xq)

    # qkv-shaped fat dot (N=3840): both XLA and the resident kernel.
    N3 = 3840
    w3q = jnp.asarray(rng.integers(-127, 128, (K, N3)), jnp.int8)
    flops = 2.0 * M * K * N3 * L

    @jax.jit
    def int8_qkvfat(x):
        for _ in range(L):
            acc = jax.lax.dot_general(x, w3q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            x = (acc.reshape(M, 3, K).sum(axis=1) & 127).astype(jnp.int8)
        return jnp.sum(acc)

    print(f"qkv-N: M={M} K={K} N={N3} L={L}  ({flops/1e12:.1f} TFLOP per call)")
    bench("int8_qkvfat_xla", int8_qkvfat, xq)
    for tm in (128, 256):
        bench(f"int8_pallas_res3840_tm{tm}", pallas_fatres(w3q, tm), xq)


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
