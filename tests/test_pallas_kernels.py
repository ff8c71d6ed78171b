"""Pallas kernel tests (interpret mode on CPU): NMS, attention, MANO."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
from hamer_yolo_tpu.models.mano import ManoModel, lbs
from hamer_yolo_tpu.ops.attention_pallas import fused_short_attention
from hamer_yolo_tpu.ops.mano_pallas import mano_lbs_fused
from hamer_yolo_tpu.ops.nms_pallas import greedy_nms_keep
from hamer_yolo_tpu.ops.nms import _greedy_suppress
from hamer_yolo_tpu.geometry.boxes import box_iou


def _mano():
    try:
        return ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        return ManoModel.from_arrays(synthetic_mano_model())


class TestNmsKernel:
    def test_matches_scan_impl(self, rng):
        B, K = 2, 64
        boxes = np.zeros((B, K, 4), np.float32)
        boxes[..., :2] = rng.uniform(0, 300, (B, K, 2))
        boxes[..., 2:] = boxes[..., :2] + rng.uniform(10, 80, (B, K, 2))
        active = (rng.uniform(0, 1, (B, K)) > 0.2).astype(np.float32)
        keep = np.asarray(greedy_nms_keep(jnp.asarray(boxes), jnp.asarray(active),
                                          0.45, interpret=True))
        for b in range(B):
            ref = np.asarray(_greedy_suppress(
                box_iou(jnp.asarray(boxes[b]), jnp.asarray(boxes[b])),
                jnp.asarray(active[b]) > 0.5, 0.45))
            np.testing.assert_array_equal(keep[b] > 0.5, ref)


class TestAttentionKernel:
    def test_matches_softmax_attention(self, rng):
        q, k, v = (jnp.asarray(rng.normal(size=(1, 2, 64, 32)).astype(np.float32))
                   for _ in range(3))
        ref = jnp.einsum(
            "bhnm,bhmd->bhnd",
            jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q * 32 ** -0.5, k), -1), v)
        out = fused_short_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestAttentionDispatch:
    """softmax_attention_qkv: auto-routed fused-qkv attention."""

    def _qkv(self, rng, B=4, N=24, h=2, hd=16):
        return jnp.asarray(rng.normal(size=(B, N, 3 * h * hd))
                           .astype(np.float32)), h

    def test_pallas_matches_xla(self, rng):
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        qkv, h = self._qkv(rng)
        ref = softmax_attention_qkv(qkv, h, force="xla")
        out = softmax_attention_qkv(qkv, h, force="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_vmap_collapses_to_crop_batch(self, rng):
        """vmapping over frames must equal the flat collapsed call (the
        frame pipeline vmaps 2-crop instances over the serving batch).
        force="auto" exercises the custom_vmap collapse rule (on CPU the
        inner dispatch then takes the einsum branch)."""
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        qkv, h = self._qkv(rng, B=6)
        batched = qkv.reshape(3, 2, *qkv.shape[1:])
        out_v = jax.vmap(
            lambda q: softmax_attention_qkv(q, h, force="auto"))(batched)
        flat = softmax_attention_qkv(qkv, h, force="xla")
        np.testing.assert_allclose(np.asarray(out_v).reshape(flat.shape),
                                   np.asarray(flat), atol=1e-5)

    def test_pallas_direct_under_vmap(self, rng):
        """force="pallas_direct" has no custom_vmap wrapper — under
        jax.vmap the pallas_call batches via its native rule and must
        still match the flat einsum result."""
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        qkv, h = self._qkv(rng, B=6)
        batched = qkv.reshape(3, 2, *qkv.shape[1:])
        out = jax.vmap(lambda q: softmax_attention_qkv(
            q, h, force="pallas_direct", interpret=True))(batched)
        ref = softmax_attention_qkv(qkv, h, force="xla")
        np.testing.assert_allclose(np.asarray(out).reshape(ref.shape),
                                   np.asarray(ref), atol=1e-5)

    def test_fusedqkv_under_vmap(self, rng):
        """force="pallas_fusedqkv" (transpose-free, head-slicing in VMEM)
        must match einsum both flat and under the frame pipeline's vmap,
        including the odd head_dim (non-128-lane-aligned slices)."""
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        qkv, h = self._qkv(rng, B=6, h=3, hd=24)
        ref = softmax_attention_qkv(qkv, h, force="xla")
        out = softmax_attention_qkv(qkv, h, force="pallas_fusedqkv",
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        batched = qkv.reshape(3, 2, *qkv.shape[1:])
        out_v = jax.vmap(lambda q: softmax_attention_qkv(
            q, h, force="pallas_fusedqkv", interpret=True))(batched)
        np.testing.assert_allclose(np.asarray(out_v).reshape(ref.shape),
                                   np.asarray(ref), atol=1e-5)

    def test_fusedqkv_int8_epilogue(self, rng):
        """out_scale epilogue: int8 output matches the einsum+quantize
        reference exactly (round-half-even, clip +-127)."""
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        qkv, h = self._qkv(rng, B=4)
        sx = jnp.asarray(0.011, jnp.float32)
        got = softmax_attention_qkv(qkv, h, force="pallas_fusedqkv",
                                    interpret=True, out_scale=sx)
        want = softmax_attention_qkv(qkv, h, force="xla", out_scale=sx)
        assert got.dtype == jnp.int8
        np.testing.assert_allclose(np.asarray(got, np.int32),
                                   np.asarray(want, np.int32), atol=1)

    @pytest.mark.parametrize("force", ["pallas_direct", "pallas_fusedqkv"])
    def test_prequant_epilogue_under_vmap(self, rng, force):
        """The production engagement: out_scale (an UNBATCHED operand)
        composing with the frame pipeline's jax.vmap over the kernel —
        pallas_call's batching rule must broadcast it, matching the flat
        einsum+quantize result exactly."""
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        qkv, h = self._qkv(rng, B=6)
        sx = jnp.asarray(0.02, jnp.float32)
        batched = qkv.reshape(3, 2, *qkv.shape[1:])
        out = jax.vmap(lambda q: softmax_attention_qkv(
            q, h, force=force, interpret=True, out_scale=sx))(batched)
        ref = softmax_attention_qkv(qkv, h, force="xla", out_scale=sx)
        assert out.dtype == jnp.int8
        np.testing.assert_array_equal(
            np.asarray(out, np.int32).reshape(ref.shape),
            np.asarray(ref, np.int32))

    def test_bf16_block_megakernel_matches_ln_attention(self, rng):
        """fused_bf16_attn_block == nn.mha_self_attention over
        nn.layer_norm (pre-proj), incl. under vmap — the exact-path
        fused LN+QKV engagement (HYT_ATTN_BF16=megakernel)."""
        from hamer_yolo_tpu.core import nn
        from hamer_yolo_tpu.ops.attention_pallas import fused_bf16_attn_block

        h, hd, K = 2, 16, 64
        p = nn.mha_qkv_init(jax.random.PRNGKey(0), K, h, qkv_bias=True)
        lnp = nn.layer_norm_init(K)
        tok = jnp.asarray(rng.normal(size=(6, 24, K)).astype(np.float32))
        pre = fused_bf16_attn_block(tok, p["qkv"]["w"], p["qkv"].get("b"),
                                    lnp["scale"], lnp["bias"], h,
                                    interpret=True)
        got = nn.linear(p["proj"], pre)
        want = nn.mha_self_attention(p, nn.layer_norm(lnp, tok), h)
        # kernel computes the qkv GEMM in bf16 (as the production bf16
        # ViT does); the f32 reference differs at bf16 resolution.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0.05, atol=0.05)
        batched = tok.reshape(3, 2, 24, K)
        out_v = jax.vmap(lambda t: fused_bf16_attn_block(
            t, p["qkv"]["w"], p["qkv"].get("b"), lnp["scale"], lnp["bias"],
            h, interpret=True))(batched)
        np.testing.assert_allclose(np.asarray(out_v).reshape(pre.shape),
                                   np.asarray(pre), atol=1e-6)
        # group>1 (HYT_ATTN_BF16_G) flattens G crops per grid step for
        # the LN+qkv GEMM — perf-only: output must be BIT-IDENTICAL to
        # group=1 (attention math stays per-crop). group=4 doesn't
        # divide B=6 -> halves down to 2.
        for g in (2, 3, 4):
            gg = fused_bf16_attn_block(tok, p["qkv"]["w"], p["qkv"].get("b"),
                                       lnp["scale"], lnp["bias"], h,
                                       interpret=True, group=g)
            np.testing.assert_array_equal(np.asarray(gg), np.asarray(pre))

    def test_auto_engages_kernel_at_crossover(self, rng):
        """force="auto" above MIN_PALLAS_CROPS takes the kernel branch
        (interpret=True stands in for being on TPU) and matches XLA."""
        from hamer_yolo_tpu.ops import attention_pallas as ap

        qkv, h = self._qkv(rng, B=ap.MIN_PALLAS_CROPS)
        out = ap.softmax_attention_qkv(qkv, h, force="auto", interpret=True)
        ref = ap.softmax_attention_qkv(qkv, h, force="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_fast_mha_matches_nn(self, rng):
        from hamer_yolo_tpu.core import nn
        from hamer_yolo_tpu.ops.attention_pallas import fast_mha_self_attention

        p = nn.mha_qkv_init(jax.random.PRNGKey(0), 32, num_heads=2)
        x = jnp.asarray(rng.normal(size=(4, 24, 32)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(fast_mha_self_attention(p, x, 2)),
            np.asarray(nn.mha_self_attention(p, x, 2)), atol=1e-5)


class TestManoKernel:
    def test_matches_xla_lbs(self, rng):
        m = _mano()
        S = 2
        betas = jnp.asarray(rng.normal(scale=0.5, size=(S, 10)).astype(np.float32))
        rots = jnp.asarray(
            R.from_rotvec(rng.normal(scale=0.3, size=(S * 16, 3)))
            .as_matrix().reshape(S, 16, 3, 3).astype(np.float32))
        v_ref, j_ref = lbs(m, betas, rots)
        v_pl, j_pl = mano_lbs_fused(m, betas, rots, interpret=True)
        np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_ref), atol=1e-3)
        np.testing.assert_allclose(np.asarray(j_pl), np.asarray(j_ref), atol=1e-4)
