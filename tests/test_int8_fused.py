"""Pallas fused-quantize int8 GEMM (ops/int8_matmul.py) correctness.

Run in interpret mode on the CPU test mesh; the reference composition is
the unfused core/quant path (LN / GELU in f32 + quantize_act_int8 +
int8 dot_general + dequant), which the kernel must reproduce.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hamer_yolo_tpu.core import nn, quant
from hamer_yolo_tpu.ops.int8_matmul import fused_int8_matmul


def _ref_unfused(x, wq, prologue="id", ln=None):
    """f32 prologue + per-row dynamic quantize + int8 dot + dequant."""
    xf = x.astype(jnp.float32)
    if prologue == "ln":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
        xf = xf * ln["scale"] + ln["bias"]
    elif prologue == "gelu":
        xf = jax.nn.gelu(xf, approximate=False)
    q, s = quant.quantize_act_int8(xf)
    acc = jax.lax.dot_general(
        q, wq["q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s * wq["scale"]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


class TestFusedKernel:
    @pytest.mark.parametrize("prologue", ["id", "ln", "gelu"])
    def test_matches_unfused(self, rng, prologue):
        M, K, N = 96, 256, 384  # M deliberately not a tile multiple
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)
        ln = {"scale": jnp.asarray(1.0 + 0.1 * rng.normal(size=(K,)).astype(np.float32)),
              "bias": jnp.asarray(0.1 * rng.normal(size=(K,)).astype(np.float32))}

        got = fused_int8_matmul(
            x, wq["q"], wq["scale"], None,
            ln["scale"] if prologue == "ln" else None,
            ln["bias"] if prologue == "ln" else None,
            prologue=prologue, tm=64, tn=128, interpret=True,
            out_dtype=jnp.float32)
        want = _ref_unfused(x, wq, prologue, ln)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_bias_and_bf16_io(self, rng):
        M, K, N = 64, 128, 128
        x = jnp.asarray(rng.normal(size=(2, M // 2, K)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        b = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
        wq = quant.quantize_weight_int8(w)
        got = fused_int8_matmul(x, wq["q"], wq["scale"], b,
                                prologue="id", tm=32, tn=128, interpret=True)
        assert got.shape == (2, M // 2, N)
        assert got.dtype == jnp.bfloat16
        want = _ref_unfused(x.reshape(M, K), wq) + b
        np.testing.assert_allclose(
            np.asarray(got, np.float32).reshape(M, N), np.asarray(want),
            rtol=0.02, atol=0.05)


class TestLargeMPath:
    @pytest.mark.parametrize("prologue", ["id", "ln", "gelu"])
    def test_quantize_kernel_plus_xla_dot_matches(self, rng, prologue,
                                                  monkeypatch):
        """M above FUSED_GEMM_MAX_M routes through the Pallas fused
        quantize + XLA int8 dot_general; numerics must match the
        reference composition exactly like the fully-fused path."""
        from hamer_yolo_tpu.ops import int8_matmul as im

        monkeypatch.setattr(im, "FUSED_GEMM_MAX_M", 8)
        M, K, N = 72, 384, 256  # M > 8 -> large-M path (fresh shapes)
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)
        ln = {"scale": jnp.asarray(
                  1.0 + 0.1 * rng.normal(size=(K,)).astype(np.float32)),
              "bias": jnp.asarray(
                  0.1 * rng.normal(size=(K,)).astype(np.float32))}
        got = im.fused_int8_matmul(
            x, wq["q"], wq["scale"], None,
            ln["scale"] if prologue == "ln" else None,
            ln["bias"] if prologue == "ln" else None,
            prologue=prologue, tm=16, tn=128, interpret=True,
            out_dtype=jnp.float32)
        want = _ref_unfused(x, wq, prologue, ln)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_epilogue_close_to_f32(self, rng, monkeypatch):
        """HYT_INT8_EP=bf16 runs the large-M dequant in bf16: bounded
        drift vs the f32 epilogue (acc <= 127*127*K so bf16's 8 mantissa
        bits cost ~0.4% relative)."""
        from hamer_yolo_tpu.ops import int8_matmul as im

        monkeypatch.setattr(im, "FUSED_GEMM_MAX_M", 8)
        M, K, N = 72, 384, 256
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)
        f32 = im.fused_int8_matmul(x, wq["q"], wq["scale"], None,
                                   prologue="id", out_dtype=jnp.float32)
        monkeypatch.setenv("HYT_INT8_EP", "bf16")
        bf = im.fused_int8_matmul(x, wq["q"], wq["scale"], None,
                                  prologue="id", out_dtype=jnp.float32)
        ref = float(jnp.max(jnp.abs(f32))) + 1e-6
        assert float(jnp.max(jnp.abs(bf - f32))) / ref < 0.02


class TestVmapCollapse:
    def test_vmap_matches_loop(self, rng):
        """vmapping the kernel must equal per-instance application (the
        custom_vmap rule collapses the batch into M)."""
        Bv, M, K, N = 3, 40, 128, 128
        x = jnp.asarray(rng.normal(size=(Bv, M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)

        def one(xi):
            return fused_int8_matmul(xi, wq["q"], wq["scale"],
                                     prologue="id", tm=32, tn=128,
                                     interpret=True, out_dtype=jnp.float32)

        got = jax.vmap(one)(x)
        want = jnp.stack([one(x[i]) for i in range(Bv)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def _ref_static(x, wq, sx, prologue="id", ln=None):
    """f32 prologue + STATIC per-tensor quantize + int8 dot + dequant."""
    xf = x.astype(jnp.float32)
    if prologue == "ln":
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
        xf = xf * ln["scale"] + ln["bias"]
    elif prologue == "gelu":
        xf = jax.nn.gelu(xf, approximate=False)
    q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, wq["q"], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * wq["scale"]


class TestStaticScale:
    @pytest.mark.parametrize("prologue", ["id", "ln"])
    def test_pallas_static_matches_reference(self, rng, prologue):
        M, K, N = 96, 256, 384
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)
        ln = {"scale": jnp.asarray(
                  1.0 + 0.1 * rng.normal(size=(K,)).astype(np.float32)),
              "bias": jnp.asarray(
                  0.1 * rng.normal(size=(K,)).astype(np.float32))}
        sx = jnp.asarray(0.031, jnp.float32)
        got = fused_int8_matmul(
            x, wq["q"], wq["scale"], None,
            ln["scale"] if prologue == "ln" else None,
            ln["bias"] if prologue == "ln" else None,
            prologue=prologue, tm=64, tn=128, interpret=True,
            out_dtype=jnp.float32, static_scale=sx)
        want = _ref_static(x, wq, sx, prologue, ln)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_large_m_static_matches_reference(self, rng, monkeypatch):
        from hamer_yolo_tpu.ops import int8_matmul as im

        monkeypatch.setattr(im, "FUSED_GEMM_MAX_M", 8)
        M, K, N = 72, 384, 256
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)
        sx = jnp.asarray(0.027, jnp.float32)
        got = im.fused_int8_matmul(
            x, wq["q"], wq["scale"], None, prologue="id", tm=16, tn=128,
            interpret=True, out_dtype=jnp.float32, static_scale=sx)
        want = _ref_static(x, wq, sx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_vmap_static(self, rng):
        Bv, M, K, N = 3, 40, 128, 128
        x = jnp.asarray(rng.normal(size=(Bv, M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)
        sx = jnp.asarray(0.04, jnp.float32)

        def one(xi):
            return fused_int8_matmul(xi, wq["q"], wq["scale"],
                                     prologue="id", tm=32, tn=128,
                                     interpret=True, out_dtype=jnp.float32,
                                     static_scale=sx)

        got = jax.vmap(one)(x)
        want = jnp.stack([one(x[i]) for i in range(Bv)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_calibrate_attach_vit_close_to_dynamic(self, rng):
        """calibrate -> attach -> static forward stays close to the
        dynamic-quantize forward on the calibration distribution (same
        int8 grid, scales from the observed absmax)."""
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit

        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=2, num_heads=4,
                        compute_dtype="float32")
        params = init_vit(jax.random.PRNGKey(0), cfg)
        pq = quant.quantize_vit_params(params)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))

        stats = jax.jit(
            lambda p, xi: quant.collect_vit_act_stats(p, xi, cfg))(pq, x)
        assert len(stats["blocks"]) == 2
        ps = quant.attach_static_act_scales(pq, stats)
        assert ps["blocks"][0]["attn"]["qkv"]["sx"].shape == ()

        dyn = quant.vit_forward_int8(pq, x, cfg, fused=False)
        sta = quant.vit_forward_int8(ps, x, cfg, fused=False)
        # Per-tensor static is coarser than per-row dynamic; bound the
        # drift rather than demand equality.
        err = float(jnp.max(jnp.abs(sta - dyn)))
        ref = float(jnp.max(jnp.abs(dyn))) + 1e-6
        assert err / ref < 0.15, (err, ref)

        # Fused (interpret) static path agrees with the unfused static.
        fus = quant.vit_forward_int8(ps, x, cfg, fused=True, interpret=True)
        np.testing.assert_allclose(np.asarray(fus), np.asarray(sta),
                                   rtol=0.05, atol=0.05)

    def test_mlp_megakernel_matches_fused(self, rng, monkeypatch):
        """HYT_INT8_MLP=megakernel (resident-weight fc1/fc2 pair with
        fused LN/GELU/quantize/residual) matches the qualified fused
        static path within quantization tolerance."""
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit

        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=2, num_heads=4,
                        compute_dtype="float32")
        pq = quant.quantize_vit_params(init_vit(jax.random.PRNGKey(0), cfg))
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        stats = quant.collect_vit_act_stats(pq, x, cfg)
        ps = quant.attach_static_act_scales(pq, stats)
        base = quant.vit_forward_int8(ps, x, cfg, fused=True, interpret=True)
        monkeypatch.setenv("HYT_INT8_MLP", "megakernel")
        mega = quant.vit_forward_int8(ps, x, cfg, fused=True, interpret=True)
        np.testing.assert_allclose(np.asarray(mega), np.asarray(base),
                                   rtol=0.05, atol=0.05)

    def test_mlp_megakernel1_bitwise_matches_pair(self, rng, monkeypatch):
        """HYT_INT8_MLP=megakernel1 (single-call fc1+GELU+fc2+residual,
        both weights resident, chunked): same int32 math as the pair —
        the per-chunk fc2 partial sums add exactly, so the outputs are
        bit-identical."""
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit

        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=2, num_heads=4,
                        compute_dtype="float32")
        pq = quant.quantize_vit_params(init_vit(jax.random.PRNGKey(0), cfg))
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        stats = quant.collect_vit_act_stats(pq, x, cfg)
        ps = quant.attach_static_act_scales(pq, stats)
        tok = jnp.asarray(rng.normal(size=(2, 4, 128)).astype(np.float32))
        blk = ps["blocks"][0]
        monkeypatch.setenv("HYT_INT8_MLP", "megakernel")
        pair = quant.int8_block_mlp_residual(blk, tok, interpret=True)
        monkeypatch.setenv("HYT_INT8_MLP", "megakernel1")
        monkeypatch.setenv("HYT_INT8_MLP_HC", "128")  # 4 chunks of H=512
        one = quant.int8_block_mlp_residual(blk, tok, interpret=True)
        np.testing.assert_allclose(np.asarray(one), np.asarray(pair),
                                   rtol=1e-6, atol=1e-6)
        # full e2e forward, single-chunk fallback (H % hc != 0)
        monkeypatch.setenv("HYT_INT8_MLP_HC", "1280")
        base = quant.vit_forward_int8(ps, x, cfg, fused=True, interpret=True)
        monkeypatch.setenv("HYT_INT8_MLP", "megakernel")
        want = quant.vit_forward_int8(ps, x, cfg, fused=True, interpret=True)
        np.testing.assert_allclose(np.asarray(base), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_gelu_poly_pointwise(self):
        """HYT_GELU=poly: even-polynomial GELU within 2e-4 abs of exact
        (vs the consumer's int8 quantization step ~1e-1)."""
        from hamer_yolo_tpu.ops.int8_matmul import _gelu_poly_f32

        x = jnp.linspace(-12.0, 12.0, 20001, dtype=jnp.float32)
        ref = jax.nn.gelu(x, approximate=False)
        err = float(jnp.max(jnp.abs(_gelu_poly_f32(x) - ref)))
        assert err < 2e-4, err

    def test_gelu_poly_megakernel_matches_exact(self, rng, monkeypatch):
        """The MLP megakernel under HYT_GELU=poly reproduces the
        exact-GELU megakernel within quantization tolerance (the poly
        error is ~600x below one int8 step of the fc2 quantize)."""
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit

        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=2, num_heads=4,
                        compute_dtype="float32")
        pq = quant.quantize_vit_params(init_vit(jax.random.PRNGKey(0), cfg))
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        stats = quant.collect_vit_act_stats(pq, x, cfg)
        ps = quant.attach_static_act_scales(pq, stats)
        monkeypatch.setenv("HYT_INT8_MLP", "megakernel")
        base = quant.vit_forward_int8(ps, x, cfg, fused=True, interpret=True)
        monkeypatch.setenv("HYT_GELU", "poly")
        poly = quant.vit_forward_int8(ps, x, cfg, fused=True, interpret=True)
        # elements landing within 1.2e-4 of an int8 quantize boundary in
        # the fc2 quantize flip by ONE step under the poly form — allow
        # ~1% one-step flips, bound the rest tightly (same convention as
        # test_block_prequant_matches_static_composition).
        close = np.isclose(np.asarray(poly), np.asarray(base),
                           rtol=0.02, atol=0.02)
        assert close.mean() > 0.99, close.mean()
        np.testing.assert_allclose(np.asarray(poly), np.asarray(base),
                                   rtol=0.2, atol=0.1)


class TestPrequantAttention:
    """Attention int8 epilogue (out_scale) + pre-quantized proj dot."""

    def test_out_scale_epilogue_matches_inline_quantize(self, rng):
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        qkv = jnp.asarray(rng.normal(size=(4, 8, 3 * 2 * 16))
                          .astype(np.float32))
        sx = jnp.asarray(0.02, jnp.float32)
        got = softmax_attention_qkv(qkv, 2, force="pallas_direct",
                                    interpret=True, out_scale=sx)
        want = softmax_attention_qkv(qkv, 2, force="xla", out_scale=sx)
        assert got.dtype == jnp.int8
        # round-half-even at the +-0.5 boundary may differ by 1 ulp for
        # values landing exactly on the grid midpoint; require exactness
        # off the boundary via a 1-count tolerance.
        diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
        assert diff.max() <= 1 and (diff > 0).mean() < 0.01

    def test_block_prequant_matches_static_composition(self, rng,
                                                       monkeypatch):
        """int8_block_attn_fused with static scales + kernel engaged
        (interpret) must match the unfused static attention block."""
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit

        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=1, num_heads=4,
                        compute_dtype="float32")
        pq = quant.quantize_vit_params(
            init_vit(jax.random.PRNGKey(1), cfg))
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        stats = quant.collect_vit_act_stats(pq, x, cfg)
        ps = quant.attach_static_act_scales(pq, stats)
        blk = ps["blocks"][0]
        tok = jnp.asarray(rng.normal(size=(2, 4, 128)).astype(np.float32))

        got = quant.int8_block_attn_fused(blk, tok, 4, interpret=True)
        ref = quant.int8_mha_self_attention(
            blk["attn"], nn.layer_norm(blk["norm1"], tok), 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.05, atol=0.05)
        # kill-switch restores the non-prequant path
        monkeypatch.setenv("HYT_ATTN_PREQUANT", "0")
        off = quant.int8_block_attn_fused(blk, tok, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(off), np.asarray(ref),
                                   rtol=0.05, atol=0.05)
        # fusedqkv (transpose-free) kernel engagement, same contract
        monkeypatch.delenv("HYT_ATTN_PREQUANT")
        monkeypatch.setenv("HYT_ATTN", "pallas_fusedqkv")
        fq = quant.int8_block_attn_fused(blk, tok, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(fq), np.asarray(ref),
                                   rtol=0.05, atol=0.05)
        # megakernel (LN+quantize+qkv GEMM+attention+epilogue in one
        # pallas_call), same contract
        monkeypatch.setenv("HYT_ATTN", "megakernel")
        mk = quant.int8_block_attn_fused(blk, tok, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(mk), np.asarray(ref),
                                   rtol=0.05, atol=0.05)
        # grouped-GEMM form (HYT_ATTN_MEGA_G): perf-only, BIT-IDENTICAL
        monkeypatch.setenv("HYT_ATTN_MEGA_G", "2")
        mg = quant.int8_block_attn_fused(blk, tok, 4, interpret=True)
        np.testing.assert_array_equal(np.asarray(mg), np.asarray(mk))
        monkeypatch.delenv("HYT_ATTN_MEGA_G")
        # and it must be CLOSE to the prequant pallas_direct composition
        # (same math, different fusion; +-1 int8 round-boundary flips in
        # the pre-proj quantize allowed — ~1% of elements)
        monkeypatch.setenv("HYT_ATTN", "pallas_direct")
        pd = quant.int8_block_attn_fused(blk, tok, 4, interpret=True)
        close = np.isclose(np.asarray(mk), np.asarray(pd),
                           rtol=0.02, atol=0.02)
        assert close.mean() > 0.97
        np.testing.assert_allclose(np.asarray(mk), np.asarray(pd),
                                   rtol=0.2, atol=0.2)

    def test_attn_proj_megakernel_matches_composition(self, rng,
                                                      monkeypatch):
        """HYT_ATTN=megaproj (full attention-block megakernel: LN+
        quantize+qkv+attention+quantize+PROJ+residual in one
        pallas_call) matches tok + megakernel-attention composition —
        same int8 math, residual fused in-kernel."""
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit

        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=1, num_heads=4,
                        compute_dtype="float32")
        pq = quant.quantize_vit_params(init_vit(jax.random.PRNGKey(1), cfg))
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        stats = quant.collect_vit_act_stats(pq, x, cfg)
        ps = quant.attach_static_act_scales(pq, stats)
        blk = ps["blocks"][0]
        tok = jnp.asarray(rng.normal(size=(2, 4, 128)).astype(np.float32))

        monkeypatch.setenv("HYT_ATTN", "megakernel")
        want = tok + quant.int8_block_attn_fused(blk, tok, 4,
                                                 interpret=True)
        monkeypatch.setenv("HYT_ATTN", "megaproj")
        got = quant.int8_block_attn_residual(blk, tok, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # group>1 (HYT_ATTN_MEGAPROJ_G) flattens G crops per grid step
        # for the qkv/proj GEMMs — perf-only: output must be
        # BIT-IDENTICAL to G=1 (attention math stays per-crop)
        for g in ("2", "3"):  # 3 doesn't divide B=2 -> falls back to 1
            monkeypatch.setenv("HYT_ATTN_MEGAPROJ_G", g)
            gg = quant.int8_block_attn_residual(blk, tok, 4, interpret=True)
            np.testing.assert_array_equal(np.asarray(gg), np.asarray(got))
        monkeypatch.delenv("HYT_ATTN_MEGAPROJ_G")
        # HYT_SOFTMAX=exp2 (log2e folded into the q prescale, exp2
        # logits) and exp2p (+ normalization folded past the p*v dot)
        # are the SAME softmax up to f32 rounding; the post-attn int8
        # quantize may flip +-1 round boundaries on a few elements
        for flavor in ("exp2", "exp2p"):
            monkeypatch.setenv("HYT_SOFTMAX", flavor)
            e2 = quant.int8_block_attn_residual(blk, tok, 4,
                                                interpret=True)
            monkeypatch.delenv("HYT_SOFTMAX")
            close = np.isclose(np.asarray(e2), np.asarray(got),
                               rtol=0.02, atol=0.02)
            assert close.mean() > 0.97, flavor
            np.testing.assert_allclose(np.asarray(e2), np.asarray(got),
                                       rtol=0.2, atol=0.2)
        # HYT_ATTN_MATH=int8 (dynamic-tile int8 q@k / p@v dots) adds
        # ~0.5% quantization noise to the attention result — looser
        # contract, same output up to that noise
        monkeypatch.setenv("HYT_ATTN_MATH", "int8")
        i8 = quant.int8_block_attn_residual(blk, tok, 4, interpret=True)
        monkeypatch.delenv("HYT_ATTN_MATH")
        close = np.isclose(np.asarray(i8), np.asarray(got),
                           rtol=0.05, atol=0.05)
        assert close.mean() > 0.95
        np.testing.assert_allclose(np.asarray(i8), np.asarray(got),
                                   rtol=0.3, atol=0.3)
        # without static scales (or with the kill-switch) it falls back
        # to the composed path
        monkeypatch.setenv("HYT_ATTN_PREQUANT", "0")
        off = quant.int8_block_attn_residual(blk, tok, 4, interpret=True)
        ref = quant.int8_mha_self_attention(
            blk["attn"], nn.layer_norm(blk["norm1"], tok), 4)
        np.testing.assert_allclose(np.asarray(off), np.asarray(tok + ref),
                                   rtol=0.05, atol=0.05)

    def test_int8_dot_prequant_matches_int8_linear(self, rng):
        from hamer_yolo_tpu.ops.int8_matmul import int8_dot_prequant

        K, N = 64, 32
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
        wq = quant.quantize_weight_int8(w)
        b = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(3, 8, K)).astype(np.float32))
        sx = jnp.asarray(0.03, jnp.float32)
        xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        got = int8_dot_prequant(xq, wq["q"], wq["scale"], b, sx,
                                out_dtype=jnp.float32)
        want = quant.int8_linear(wq, x, b, sx_static=sx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


class TestFusedVitPath:
    def test_vit_forward_int8_fused_matches_unfused(self, rng):
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit
        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=2, num_heads=4,
                        compute_dtype="float32")
        params = init_vit(jax.random.PRNGKey(0), cfg)
        pq = quant.quantize_vit_params(params)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        ref = quant.vit_forward_int8(pq, x, cfg, fused=False)
        got = quant.vit_forward_int8(pq, x, cfg, fused=True, interpret=True)
        assert got.shape == ref.shape
        # fused path runs LN/quantize in f32 (vs bf16-policy casts in the
        # unfused composition) — allow small numeric drift.
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.05, atol=0.05)

    def test_fused_blocks_match_unfused_composition(self, rng):
        """int8_block_{attn,mlp}_fused == LN -> int8 attention/MLP."""
        from hamer_yolo_tpu.models.vit import ViTConfig, init_vit
        cfg = ViTConfig(img_size=(32, 32), patch_size=16, patch_padding=0,
                        embed_dim=128, depth=1, num_heads=4,
                        compute_dtype="float32")
        blk = quant.quantize_vit_params(
            init_vit(jax.random.PRNGKey(1), cfg))["blocks"][0]
        tok = jnp.asarray(rng.normal(size=(2, 8, 128)).astype(np.float32))

        got_a = quant.int8_block_attn_fused(blk, tok, 4, interpret=True)
        ref_a = quant.int8_mha_self_attention(
            blk["attn"], nn.layer_norm(blk["norm1"], tok), 4)
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                                   rtol=0.05, atol=0.05)

        got_m = quant.int8_block_mlp_fused(blk, tok, interpret=True)
        ref_m = quant.int8_mlp_gelu(blk["mlp"],
                                    nn.layer_norm(blk["norm2"], tok))
        np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m),
                                   rtol=0.05, atol=0.05)
