"""Targeted perf experiments on the live backend (round-2 optimization).

1. conv int8 vs bf16 at representative YOLOv7 trunk shapes (is W8A8
   worth it for the detector's 24 ms?)
2. W8A8 ViT under per-frame vmap vs flat crop batch (does the pipeline's
   vmap structure tax the int8 dot_general lowering?)
3. int8+ToMe combined backbone timing.

Scalar-fetch timing (see CLAUDE.md TIMING RULE).
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
    import jax
    import jax.numpy as jnp
    from jax import lax

    results = {}
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}", flush=True)

    def report(name, fn, *args):
        ms, comp = bench(jax.jit(fn), *args)
        results[name] = round(ms, 2)
        print(f"{name:<26s} {ms:8.2f} ms  (compile {comp:.0f}s)", flush=True)

    def ssum(x):
        return jnp.sum(x.astype(jnp.float32))

    # ---- 1. conv int8 vs bf16 (chained x8 inside one jit) ----
    for (B, H, C1, C2) in [(16, 160, 128, 128), (16, 80, 256, 256)]:
        x = jnp.asarray(rng.standard_normal((B, H, H, C1)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C1, C2)) * 0.05, jnp.bfloat16)

        def conv_chain(x, w):
            def step(x, _):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.tanh(y), ()
            y, _ = lax.scan(step, x, None, length=8)
            return ssum(y)

        report(f"conv_bf16_{H}x{C1}", conv_chain, x, w)

        wq = jnp.asarray(rng.integers(-127, 128, (3, 3, C1, C2)), jnp.int8)

        def conv_chain_int8(x, wq):
            def step(x, _):
                sx = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-8)
                qx = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
                y = lax.conv_general_dilated(
                    qx, wq, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                return jnp.tanh(y.astype(jnp.bfloat16) * (sx * 1e-3)), ()
            y, _ = lax.scan(step, x, None, length=8)
            return ssum(y)

        report(f"conv_int8_{H}x{C1}", conv_chain_int8, x, wq)

    # ---- 2 & 3. ViT variants ----
    from hamer_yolo_tpu.core.quant import quantize_vit_params, vit_forward_int8
    from hamer_yolo_tpu.models.tome import vit_forward_tome
    from hamer_yolo_tpu.models.vit import VITH_CONFIG, init_vit

    cfg = VITH_CONFIG
    params = jax.device_put(jax.jit(lambda k: init_vit(k, cfg))(jax.random.PRNGKey(0)))
    qparams = jax.device_put(jax.jit(quantize_vit_params)(params))
    flat = jnp.asarray(rng.standard_normal((32,) + cfg.img_size + (3,)), jnp.float32)
    framed = flat.reshape((16, 2) + cfg.img_size + (3,))

    report("vit_int8_flat32", lambda p, x: ssum(vit_forward_int8(p, x, cfg)),
           qparams, flat)
    report("vit_int8_vmap16x2", lambda p, x: ssum(jax.vmap(
        lambda xi: vit_forward_int8(p, xi, cfg))(x)), qparams, framed)
    report("vit_int8_tome4_flat32", lambda p, x: ssum(
        vit_forward_tome(p, x, cfg, r_per_layer=4)), qparams, flat)
    report("vit_bf16_tome4_flat32", lambda p, x: ssum(
        vit_forward_tome(p, x, cfg, r_per_layer=4)), params, flat)

    print(json.dumps(results))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
