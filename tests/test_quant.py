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
