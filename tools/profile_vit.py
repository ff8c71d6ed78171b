"""ViT-H backbone variant shootout on the live backend.

Times the production backbone (depth 32, dim 1280, 192 tokens) on the
benchmark crop batch (BENCH_BATCH frames x BENCH_MAX_HANDS slots) across
the optimization knobs: bf16 baseline, Pallas fused attention, W8A8
dynamic int8 (core/quant.py), int8+pallas, ToMe r=4. Scalar-fetch timing
(axon block_until_ready on lazy arrays does not sync).

Usage: [BENCH_BATCH=16] [BENCH_MAX_HANDS=2] python tools/profile_vit.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *args, iters=10, warmup=3):
    t0 = time.time()
    float(fn(*args))
    compile_s = time.time() - t0
    for _ in range(warmup):
        float(fn(*args))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(np.asarray(lat) * 1e3, 50)), compile_s


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.quant import quantize_vit_params, vit_forward_int8
    from hamer_yolo_tpu.models.tome import vit_forward_tome
    from hamer_yolo_tpu.models.vit import VITH_CONFIG, init_vit, vit_forward
    from hamer_yolo_tpu.ops.attention import flash_mha_self_attention

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    max_hands = int(os.environ.get("BENCH_MAX_HANDS", "2"))
    ncrops = batch * max_hands
    cfg = VITH_CONFIG

    params = jax.jit(lambda k: init_vit(k, cfg))(jax.random.PRNGKey(0))
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ncrops,) + cfg.img_size + (3,)), jnp.float32)
    print(f"device: {jax.devices()[0]}  crops={ncrops}", flush=True)

    gflop = 2 * 0.631e9 * cfg.num_tokens * ncrops / 1e9  # ~2*P*N rough
    results = {}

    def report(name, fn, *args):
        ms, comp = bench(jax.jit(fn), *args)
        results[name] = round(ms, 2)
        print(f"{name:<22s} {ms:8.2f} ms  ~{gflop/ms:6.1f} TFLOP/s  (compile {comp:.0f}s)",
              flush=True)

    report("bf16", lambda p, x: jnp.sum(
        vit_forward(p, x, cfg).astype(jnp.float32)), params, x)

    report("bf16+pallas_attn", lambda p, x: jnp.sum(
        vit_forward(p, x, cfg, attn_impl=flash_mha_self_attention).astype(jnp.float32)),
        params, x)

    qparams = jax.jit(quantize_vit_params)(params)
    qparams = jax.device_put(qparams)
    report("w8a8_int8", lambda p, x: jnp.sum(
        vit_forward_int8(p, x, cfg).astype(jnp.float32)), qparams, x)

    try:
        report("tome_r4", lambda p, x: jnp.sum(
            vit_forward_tome(p, x, dataclasses.replace(cfg), 4).astype(jnp.float32)),
            params, x)
    except Exception as e:
        print(f"tome failed: {type(e).__name__}: {e}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
