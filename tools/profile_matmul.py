"""Matmul microbenchmark on the live backend: bf16 vs int8 vs AQT int8.

Per-dispatch timing through the axon tunnel is unreliable below ~10 ms, so
each measurement chains ITERS dependent ViT-H MLP blocks
(x @ W1(1280,5120) -> h @ W2(5120,1280)) inside ONE jitted lax.scan — the
carry serializes the chain (no CSE / no overlap), and per-block time =
dispatch_time / ITERS. 161 GFLOP per block pair.

Decides VERDICT round-1 next-step #2: is the int8 MXU mode reachable
(AQT / raw dot_general) and does W8A8 beat bf16 at the ViT-H shapes?
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, K, N = 6144, 1280, 5120
ITERS = 50
GFLOP_PER_BLOCK = 2 * (M * K * N + M * N * K) / 1e9  # fc1 + fc2


def bench_dispatch(fn, *args, reps=8, warmup=2):
    # fn must return a SCALAR: on the axon remote backend
    # block_until_ready on large lazy arrays does not wait for device
    # completion; fetching a scalar (float()) forces the true sync.
    for _ in range(warmup):
        float(fn(*args))
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(np.asarray(lat) * 1e3, 50))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.05, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.bfloat16)
    results = {}

    def report(name, fn, *args):
        ms = bench_dispatch(jax.jit(fn), *args) / ITERS
        tflops = GFLOP_PER_BLOCK / ms
        results[name] = {"ms_per_block": round(ms, 4), "tflops": round(tflops, 1)}
        print(f"{name:<22s} {ms:8.4f} ms/block   {tflops:7.1f} TFLOP/s", flush=True)

    # ---- bf16 chain ----
    def bf16_chain(x, w1, w2):
        def step(x, _):
            h = x @ w1
            y = jnp.tanh(h @ w2)  # tanh keeps the carry bounded
            return y, ()
        y, _ = lax.scan(step, x, None, length=ITERS)
        return jnp.sum(y.astype(jnp.float32))

    report("bf16", bf16_chain, x0, w1, w2)

    # ---- W8A8: pre-quantized int8 weights, dynamic per-row int8 acts ----
    w1q = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 128, (N, K)), jnp.int8)

    def q_dot(x, wq):
        sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-8)
        qa = jnp.clip(jnp.round(x / sx.astype(x.dtype)), -127, 127).astype(jnp.int8)
        acc = lax.dot_general(qa, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
        return acc.astype(jnp.bfloat16) * sx.astype(jnp.bfloat16)

    def int8_chain(x, w1q, w2q):
        def step(x, _):
            h = q_dot(x, w1q)
            y = jnp.tanh(q_dot(h, w2q) * 0.01)
            return y, ()
        y, _ = lax.scan(step, x, None, length=ITERS)
        return jnp.sum(y.astype(jnp.float32))

    report("w8a8_raw", int8_chain, x0, w1q, w2q)

    # ---- pure static int8 (upper bound for the int8 MXU mode) ----
    x0q = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)

    def int8_static_chain(xq, w1q, w2q):
        def step(xq, _):
            h = lax.dot_general(xq, w1q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            h8 = (h >> 8).astype(jnp.int8)
            y = lax.dot_general(h8, w2q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return (y >> 8).astype(jnp.int8), ()
        y, _ = lax.scan(step, xq, None, length=ITERS)
        return jnp.sum(y.astype(jnp.int32))

    report("int8_static", int8_static_chain, x0q, w1q, w2q)

    # ---- AQT int8 fwd ----
    try:
        from aqt.jax.v2 import config as aqt_config

        dg = aqt_config.config_v4(fwd_bits=8, dlhs_bits=None, drhs_bits=None)

        def aqt_chain(x, w1, w2):
            def step(x, _):
                h = dg(x, w1, (((1,), (0,)), ((), ())))
                y = jnp.tanh(dg(h.astype(jnp.bfloat16), w2, (((1,), (0,)), ((), ()))))
                return y.astype(jnp.bfloat16), ()
            y, _ = lax.scan(step, x, None, length=ITERS)
            return jnp.sum(y.astype(jnp.float32))

        report("aqt_int8", aqt_chain, x0, w1, w2)
    except Exception as e:
        print(f"aqt failed: {type(e).__name__}: {e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
