"""Int8 quantization tests: error bounds and shapes."""
import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import nn, quant
from hamer_yolo_tpu.models.vit import ViTConfig, init_vit, vit_forward

TINY = ViTConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=4,
                 compute_dtype="float32")


class TestQuantOps:
    def test_weight_roundtrip_error(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        wq = quant.quantize_weight_int8(w)
        deq = wq["q"].astype(jnp.float32) * wq["scale"]
        rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 0.01  # 1/127 half-step

    def test_int8_linear_close_to_f32(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
        ref = x @ w + b
        got = quant.int8_linear(quant.quantize_weight_int8(w), x, b)
        denom = np.abs(np.asarray(ref)).mean()
        err = np.abs(np.asarray(got - ref)).mean() / denom
        assert err < 0.02, err

    def test_vit_int8_output_close(self, rng):
        params = init_vit(jax.random.PRNGKey(0), TINY)
        x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
        ref = np.asarray(vit_forward(params, x, TINY))
        q = quant.quantize_vit_params(params)
        got = np.asarray(quant.vit_forward_int8(q, x, TINY))
        assert got.shape == ref.shape
        # cosine similarity per token stays high under W8A8
        a = ref.reshape(-1, ref.shape[-1])
        b = got.reshape(-1, got.shape[-1])
        cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                 * np.linalg.norm(b, axis=-1) + 1e-9)
        assert cos.min() > 0.99, cos.min()

    def test_quantized_param_size(self, rng):
        params = init_vit(jax.random.PRNGKey(0), TINY)
        q = quant.quantize_vit_params(params)
        blk = q["blocks"][0]["attn"]["qkv"]["wq"]
        assert blk["q"].dtype == jnp.int8
        assert blk["scale"].shape == (3 * 64,)


class TestYoloStaticInt8:
    """Static calibrated activation scales on the detector's 1x1 convs
    (quant.calibrate_yolo_act_scales + the nn.conv2d "sx" fast path)."""

    def test_calibrated_scales_attach_and_match(self, rng):
        from hamer_yolo_tpu.models.yolov7.model import (YoloConfig,
                                                        init_yolov7,
                                                        yolov7_forward)

        cfg = YoloConfig(nc=2)
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        q = quant.quantize_yolo_params(params)
        calib = rng.random((1, 256, 256, 3)).astype(np.float32)
        qs = quant.calibrate_yolo_act_scales(q, calib, cfg)

        def census(tree):
            nq = ns = 0
            if isinstance(tree, dict):
                if "w" in tree and isinstance(tree["w"], dict):
                    kh, kw = tree["w"]["q"].shape[:2]
                    return int(kh == kw == 1), int("sx" in tree)
                for v in tree.values():
                    a, b = census(v)
                    nq += a
                    ns += b
            elif isinstance(tree, (list, tuple)):
                for v in tree:
                    a, b = census(v)
                    nq += a
                    ns += b
            return nq, ns

        n_1x1, n_sx = census(qs)
        assert n_1x1 > 0 and n_sx == n_1x1, (n_1x1, n_sx)
        x = jnp.asarray(rng.random((1, 256, 256, 3)).astype(np.float32))
        ref = np.asarray(yolov7_forward(params, x, cfg))
        sta = np.asarray(yolov7_forward(qs, x, cfg))
        dyn = np.asarray(yolov7_forward(q, x, cfg))
        err_sta = np.abs(sta - ref).mean() / (np.abs(ref).mean() + 1e-9)
        err_dyn = np.abs(dyn - ref).mean() / (np.abs(ref).mean() + 1e-9)
        # static per-tensor scales are coarser than per-pixel dynamic but
        # must stay in the same error regime on in-distribution input
        assert err_sta < max(3.0 * err_dyn, 0.02), (err_sta, err_dyn)

    def test_calibration_rejects_traced_execution(self, rng):
        from hamer_yolo_tpu.models.yolov7.model import (YoloConfig,
                                                        init_yolov7)
        import pytest

        cfg = YoloConfig(nc=2)
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        with pytest.raises(RuntimeError, match="no quantized"):
            quant.calibrate_yolo_act_scales(
                params, rng.random((1, 256, 256, 3)).astype(np.float32), cfg)

    def test_spatial_int8_shifted_gemm_matches_widened_conv(self, rng):
        """The static-scale spatial branch (kh*kw shifted int8 GEMMs)
        computes the IDENTICAL integer math as a widened int8 conv —
        exact-match oracle across stride/padding combos."""
        w = jnp.asarray(rng.normal(size=(3, 3, 7, 13)).astype(np.float32))
        wq = quant.quantize_conv_weight(w)
        b = jnp.asarray(rng.normal(size=(13,)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 9, 10, 7)).astype(np.float32))
        sx = jnp.float32(float(jnp.max(jnp.abs(x))) / 127.0)
        qx = jnp.clip(jnp.round(x / sx), -127, 127)
        for stride, pad in [(1, 1), (2, 1), (1, "SAME"), (2, "SAME"),
                            (1, 0)]:
            got = nn.conv2d({"w": wq, "b": b, "sx": sx}, x,
                            stride=stride, padding=pad)
            pad_arg = (((pad, pad), (pad, pad)) if isinstance(pad, int)
                       else pad)
            ref = jax.lax.conv_general_dilated(
                qx, wq["q"].astype(jnp.float32),
                window_strides=(stride, stride), padding=pad_arg,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) * sx * wq["scale"] + b
            np.testing.assert_allclose(np.asarray(got, np.float32),
                                       np.asarray(ref, np.float32),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"stride={stride} pad={pad}")
