"""Attention v2: kill the qkv slice/transpose HBM passes.

profile_int8_vit.py at 256 crops shows attention costs ~186 ms of the
495 ms static-int8 ViT (~6.7 TFLOP/s effective — bandwidth-bound, not
MXU-bound). The XLA einsum path materializes q/k/v slices and (B,h,N,N)
logits in HBM; the existing Pallas kernel (ops/attention_pallas.py)
keeps logits in VMEM but still pays 3 slice copies + 4 transposes in XLA
to get (B,h,N,hd) operands.

These variants consume the fused-qkv GEMM output (B, N, 3D) DIRECTLY
and emit (B, N, D) — zero layout passes in HBM:

  xla_einsum   : current production path (baseline)
  pallas_bhnd  : existing kernel + XLA transposes (current BENCH_ATTN)
  pallas_slice : new kernel, per-head static lane slices of (N, 3D)
  pallas_tpose : new kernel, in-VMEM transpose to (48, N, hd) + batched dot

Chained L layers in one jit (axon timing rules), out re-expanded to qkv
with a 3x concat (same pollution for every variant).

  python tools/bench_attention2.py [crops] [L]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, HD = 16, 80
D = H * HD


def make_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    scale = HD ** -0.5

    def _slice_kernel(qkv_ref, o_ref, *, group: int):
        for c in range(group):
            x = qkv_ref[c]  # (N, 3D)
            for h in range(H):
                q = x[:, h * HD:(h + 1) * HD]
                k = x[:, D + h * HD:D + (h + 1) * HD]
                v = x[:, 2 * D + h * HD:2 * D + (h + 1) * HD]
                logits = jax.lax.dot_general(
                    q * scale, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = jnp.max(logits, axis=-1, keepdims=True)
                e = jnp.exp(logits - m)
                p = e / jnp.sum(e, axis=-1, keepdims=True)
                o_ref[c, :, h * HD:(h + 1) * HD] = jnp.dot(
                    p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)

    def _tpose_kernel(qkv_ref, o_ref, *, group: int):
        for c in range(group):
            x = qkv_ref[c]  # (N, 3D)
            N = x.shape[0]
            xt = jnp.transpose(x.reshape(N, 3 * H, HD), (1, 0, 2))
            q, k, v = xt[:H], xt[H:2 * H], xt[2 * H:]
            logits = jax.lax.dot_general(
                q * scale, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (H, N, N)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
            out = jax.lax.dot_general(
                p, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (H, N, HD)
            o_ref[c] = jnp.transpose(out, (1, 0, 2)).reshape(
                N, D).astype(o_ref.dtype)

    def call(kernel, qkv, group):
        B, N, _ = qkv.shape
        G = group
        while B % G:
            G //= 2
        return pl.pallas_call(
            functools.partial(kernel, group=G),
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, N, 3 * D), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((G, N, D), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, D), qkv.dtype),
        )(qkv)

    return _slice_kernel, _tpose_kernel, call


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.ops.attention_pallas import fused_short_attention

    crops = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    N = 192
    rng = np.random.default_rng(0)
    qkv0 = jnp.asarray(rng.normal(size=(crops, N, 3 * D)).astype(np.float32)
                       ).astype(jnp.bfloat16)

    _slice_kernel, _tpose_kernel, call = make_kernels()

    def xla_attn(qkv):
        B = qkv.shape[0]
        x = qkv.reshape(B, N, 3, H, HD)
        q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q * (HD ** -0.5), k)
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, D)

    def pallas_bhnd(qkv):
        B = qkv.shape[0]
        x = qkv.reshape(B, N, 3, H, HD)
        q, k, v = (jnp.transpose(x[:, :, i], (0, 2, 1, 3)) for i in range(3))
        out = fused_short_attention(q, k, v)
        return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, D)

    variants = {
        "xla_einsum": xla_attn,
        "pallas_bhnd": pallas_bhnd,
        "pallas_slice_g4": lambda qkv: call(_slice_kernel, qkv, 4),
        "pallas_slice_g8": lambda qkv: call(_slice_kernel, qkv, 8),
        "pallas_tpose_g4": lambda qkv: call(_tpose_kernel, qkv, 4),
        "pallas_tpose_g8": lambda qkv: call(_tpose_kernel, qkv, 8),
    }

    print(f"crops={crops} N={N} H={H} HD={HD} L={L}", flush=True)
    ref = None
    for name, fn in variants.items():
        @jax.jit
        def chain(qkv, fn=fn):
            for _ in range(L):
                out = fn(qkv)
                qkv = jnp.concatenate([out, out, out], axis=-1)
            return jnp.sum(out.astype(jnp.float32))

        try:
            # numeric check (single layer) vs xla
            one = jax.jit(fn)(qkv0[:4])
            if ref is None:
                ref = one
            else:
                err = float(jnp.max(jnp.abs(
                    one.astype(jnp.float32) - ref.astype(jnp.float32))))
                if err > 2e-2:
                    print(f"{name:<16s} NUMERIC MISMATCH max|d|={err}")
                    continue
            float(chain(qkv0))
            ts = []
            for _ in range(5):
                t0 = time.time()
                float(chain(qkv0))
                ts.append(time.time() - t0)
            p50 = float(np.percentile(ts, 50))
            print(f"{name:<16s} p50 {p50*1e3:8.2f} ms  "
                  f"({(p50 - 0.028)*1e3/L:6.2f} ms/layer dev-attributed)",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name:<16s} FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
