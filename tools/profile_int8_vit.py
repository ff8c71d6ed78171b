"""Isolate fused vs unfused int8 ViT-H cost at e2e shapes.

Times the full 32-layer ViT forward (the e2e hot path) for:
  - bf16 exact (vit_forward)
  - unfused int8 (vit_forward_int8 fused=False)
  - fused Pallas int8 (vit_forward_int8 fused=True)
at large batch (256 crops = bench b128 x 2 hands) and small (2 crops =
single frame), scalar-fetch timed. Explains BENCH deltas without the
pipeline around it.

  python tools/profile_int8_vit.py [n_crops ...]
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
    from hamer_yolo_tpu.models.vit import VITH_CONFIG, init_vit, vit_forward

    crops_list = [int(a) for a in sys.argv[1:]] or [256, 2]
    cfg = VITH_CONFIG
    params = jax.jit(lambda k: init_vit(k, cfg))(jax.random.PRNGKey(0))
    params_q = jax.jit(quant.quantize_vit_params)(params)
    jax.block_until_ready((params, params_q))

    flops_per_crop = 2 * 192 * 32 * (1280 * 3840 + 1280 * 1280
                                     + 2 * 1280 * 5120)

    for n in crops_list:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, 256, 192, 3)).astype(np.float32))

        fns = {
            "bf16": jax.jit(lambda p, x: jnp.sum(
                vit_forward(p, x, cfg).astype(jnp.float32))),
            "int8_unfused": jax.jit(lambda p, x: jnp.sum(
                quant.vit_forward_int8(p, x, cfg, fused=False)
                .astype(jnp.float32))),
            "int8_fused": jax.jit(lambda p, x: jnp.sum(
                quant.vit_forward_int8(p, x, cfg, fused=True)
                .astype(jnp.float32))),
            "int8_f_pattn": jax.jit(lambda p, x: jnp.sum(
                quant.vit_forward_int8(p, x, cfg, fused=True,
                                       attn_pallas=True)
                .astype(jnp.float32))),
        }

        # attention-ablated int8 (attention replaced by identity):
        # isolates the attention-math share of the block cost.
        def _no_attn(p, x):
            import jax.numpy as jnp

            from hamer_yolo_tpu.core import nn as NN
            from hamer_yolo_tpu.ops.int8_matmul import fused_int8_matmul

            B = x.shape[0]
            xx = x.astype(jnp.dtype(cfg.compute_dtype))
            tok = NN.conv2d(p["patch_embed"], xx, stride=cfg.patch_size,
                            padding=cfg.patch_padding).reshape(
                                B, -1, cfg.embed_dim)
            pos = p["pos_embed"].astype(tok.dtype)
            tok = tok + pos[:, 1:] + pos[:, :1]
            for blk in p["blocks"]:
                pa = blk["attn"]
                qkv = fused_int8_matmul(
                    tok, pa["qkv"]["wq"]["q"], pa["qkv"]["wq"]["scale"],
                    pa["qkv"].get("b"), blk["norm1"]["scale"],
                    blk["norm1"]["bias"], prologue="ln")
                out = qkv[..., : cfg.embed_dim]  # attention ablated
                tok = tok + fused_int8_matmul(
                    out, pa["proj"]["wq"]["q"], pa["proj"]["wq"]["scale"],
                    pa["proj"].get("b"), prologue="id")
                tok = tok + quant.int8_block_mlp_fused(blk, tok)
            return jnp.sum(NN.layer_norm(p["last_norm"], tok)
                           .astype(jnp.float32))

        fns["int8_no_attn"] = jax.jit(_no_attn)

        # Static calibrated activation scales (params carry "sx"): the
        # same jit fns route through the static XLA chain at large M.
        stats = jax.jit(lambda p, xi: quant.collect_vit_act_stats(
            p, xi, cfg))(params_q, x[: min(n, 8)])
        params_s = quant.attach_static_act_scales(params_q, stats)
        fns["int8_static"] = fns["int8_fused"]
        fns["int8_sta_pattn"] = fns["int8_f_pattn"]
        fns["int8_sta_noat"] = fns["int8_no_attn"]

        for name, fn in fns.items():
            p = (params if name == "bf16"
                 else params_s if name.startswith("int8_sta")
                 else params_q)
            try:
                float(fn(p, x))  # compile
                ts = []
                for _ in range(10):
                    t0 = time.time()
                    float(fn(p, x))
                    ts.append(time.time() - t0)
                p50 = float(np.percentile(ts, 50))
                dev = max(p50 - 0.028, 1e-9)
                print(f"crops={n:4d} {name:13s} p50 {p50*1e3:8.2f} ms "
                      f"(dev ~{dev*1e3:8.2f}, {flops_per_crop*n/dev/1e12:6.1f} "
                      f"TFLOP/s, {dev/n*1e3:7.3f} ms/crop)")
            except Exception as e:
                print(f"crops={n:4d} {name:13s} FAILED: "
                      f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
