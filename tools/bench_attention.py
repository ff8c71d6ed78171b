"""Attention-variant microbench at ViT-H serving shapes.

profile_int8_vit's ablation showed the attention math is ~305 ms of the
611 ms int8 ViT at 256 crops — HALF the backbone, not the ~12 ms the
round-2 cost map attributed. This sweeps implementations to find where
that time goes:

  python tools/bench_attention.py [B] [iters]
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

    from hamer_yolo_tpu.ops.attention_pallas import fused_short_attention

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    h, N, hd = 16, 192, 80
    L = 32  # emulate the full backbone's 32 attention layers
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3, h, hd)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    scale = hd ** -0.5

    def split(qkv):
        return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, h, hd)

    def einsum_path(qkv):
        q, k, v = split(qkv)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v)

    def einsum_nosoftmax(qkv):
        q, k, v = split(qkv)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        return jnp.einsum("bhnm,bmhd->bnhd", logits, v)

    def flat_dot(qkv):
        q, k, v = (jnp.transpose(t, (0, 2, 1, 3)).reshape(B * h, N, hd)
                   for t in split(qkv))
        logits = jax.lax.dot_general(
            q * scale, k, (((2,), (2,)), ((0,), (0,))))
        attn = jax.nn.softmax(logits, axis=-1)
        out = jax.lax.dot_general(attn.astype(v.dtype), v,
                                  (((2,), (1,)), ((0,), (0,))))
        return jnp.transpose(out.reshape(B, h, N, hd), (0, 2, 1, 3))

    def f32_softmax(qkv):
        q, k, v = split(qkv)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v)

    def pallas_g(g):
        def fn(qkv):
            q, k, v = (jnp.transpose(t, (0, 2, 1, 3)) for t in split(qkv))
            out = fused_short_attention(q, k, v, group=g)
            return jnp.transpose(out, (0, 2, 1, 3))
        return fn

    cases = {
        "einsum(cur)": einsum_path,
        "einsum_nosm": einsum_nosoftmax,
        "flat_dot": flat_dot,
        "f32_softmax": f32_softmax,
        "pallas_g1": pallas_g(1),
        "pallas_g8": pallas_g(8),
        "pallas_g16": pallas_g(16),
        "pallas_g32": pallas_g(32),
    }
    flops = 2 * 2 * B * h * N * N * hd * L
    for name, fn in cases.items():
        @jax.jit
        def run(qkv, fn=fn):
            out = qkv[:, :, 0]
            for _ in range(L):
                out = fn(qkv + out[:, :, None] * 0.0)  # no CSE
            return jnp.sum(out.astype(jnp.float32))
        try:
            float(run(qkv))
            ts = []
            for _ in range(iters):
                t0 = time.time()
                float(run(qkv))
                ts.append(time.time() - t0)
            p50 = float(np.percentile(ts, 50))
            dev = max(p50 - 0.028, 1e-9)
            print(f"{name:12s} p50 {p50*1e3:8.2f} ms (dev ~{dev*1e3:7.2f}, "
                  f"{flops/dev/1e12:6.1f} TFLOP/s, {dev/L*1e3:7.0f} us/layer)")
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
