"""ToMe token merging + detector TTA tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.tome import bipartite_soft_matching_merge, vit_forward_tome
from hamer_yolo_tpu.models.vit import ViTConfig, init_vit, vit_forward
from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7
from hamer_yolo_tpu.models.yolov7.tta import yolov7_forward_tta

TINY = ViTConfig(img_size=(64, 48), embed_dim=64, depth=3, num_heads=4,
                 compute_dtype="float32")


class TestToMe:
    def test_merge_conserves_mass(self, rng):
        tok = jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32))
        sizes = jnp.ones((2, 12))
        out, out_sizes = bipartite_soft_matching_merge(tok, sizes, 3)
        assert out.shape == (2, 9, 8)
        np.testing.assert_allclose(np.asarray(out_sizes).sum(-1), 12.0, atol=1e-5)
        # weighted token mass conserved
        np.testing.assert_allclose(
            np.asarray((out * out_sizes[..., None]).sum(1)),
            np.asarray(tok.sum(1)), atol=1e-4,
        )

    def test_merges_duplicates_first(self):
        """Identical token pairs merge before distinct ones."""
        tok = np.zeros((1, 8, 4), np.float32)
        tok[0, 0] = tok[0, 1] = [1, 0, 0, 0]  # A0 identical to B0
        tok[0, 2] = [0, 1, 0, 0]
        tok[0, 3] = [0, 0, 1, 0]
        tok[0, 4] = [0, 0, 0, 1.0]
        tok[0, 5] = [1, 1, 0, 0]
        tok[0, 6] = [0, 1, 1, 0]
        tok[0, 7] = [1, 0, 1, 0]
        out, sizes = bipartite_soft_matching_merge(jnp.asarray(tok), jnp.ones((1, 8)), 1)
        # B0 should have absorbed A0 (identical) -> still [1,0,0,0], size 2
        np.testing.assert_allclose(np.asarray(out)[0, 0], [1, 0, 0, 0], atol=1e-5)
        assert np.asarray(sizes)[0, 0] == 2.0

    def test_vit_tome_shrinks_tokens_and_runs(self):
        params = init_vit(jax.random.PRNGKey(0), TINY)
        x = jnp.zeros((1, 64, 48, 3))
        base = vit_forward(params, x, TINY)
        merged = vit_forward_tome(params, x, TINY, r_per_layer=2)
        assert base.shape == (1, 12, 64)
        assert merged.shape == (1, 12 - 3 * 2, 64)

    def test_vit_tome_int8_composition(self, rng):
        """ToMe over quantized params routes the int8 matmuls and stays
        close to the bf16 ToMe output (W8A8 + token merge compose)."""
        from hamer_yolo_tpu.core.quant import quantize_vit_params

        params = init_vit(jax.random.PRNGKey(0), TINY)
        x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
        ref = vit_forward_tome(params, x, TINY, r_per_layer=2)
        q = quantize_vit_params(params)
        out = vit_forward_tome(q, x, TINY, r_per_layer=2)
        assert out.shape == ref.shape
        cos = np.sum(np.asarray(ref) * np.asarray(out)) / (
            np.linalg.norm(np.asarray(ref)) * np.linalg.norm(np.asarray(out)))
        assert cos > 0.99

    def test_vit_tome_int8_fused_megakernel(self, rng):
        """The fused static-scale ToMe path (interpret-mode Pallas: the
        TPU-default attention megakernel + resident-weight MLP pair at
        ToMe-shrunk token counts) matches the unfused int8 ToMe output
        within quantization tolerance."""
        from hamer_yolo_tpu.core import quant

        params = init_vit(jax.random.PRNGKey(0), TINY)
        x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
        pq = quant.quantize_vit_params(params)
        stats = quant.collect_vit_act_stats(pq, x, TINY)
        ps = quant.attach_static_act_scales(pq, stats)
        base = vit_forward_tome(ps, x, TINY, r_per_layer=2, fused=False)
        mega = vit_forward_tome(ps, x, TINY, r_per_layer=2, fused=True,
                                interpret=True)
        assert mega.shape == base.shape
        np.testing.assert_allclose(np.asarray(mega), np.asarray(base),
                                   rtol=0.08, atol=0.08)


class TestTTA:
    def test_tta_output_shape_and_flip_consistency(self):
        cfg = YoloConfig(nc=3, img_size=64, compute_dtype="float32")
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        out = jax.jit(lambda p, x: yolov7_forward_tta(p, x, cfg))(params, x)
        # scale 1: 64 -> (8,4,2 grids) 3*(64+16+4)=252; scale .83 -> 53->pad 64
        # (so 252 again); scale .67 -> 42 -> pad 64 -> 252
        assert out.shape[0] == 1 and out.shape[2] == 8
        assert out.shape[1] == 3 * 252
        # A horizontally symmetric input must give symmetric flipped preds:
        xs = jnp.asarray(np.tile(np.linspace(0, 1, 64)[None, :, None], (64, 1, 3))[None])
        sym = xs + jnp.flip(xs, axis=2)
        o = np.asarray(jax.jit(lambda p, x: yolov7_forward_tta(p, x, cfg))(params, sym))
        # branch 2 (flipped, de-flipped) xy must live in [approx 0, 64+]
        assert np.isfinite(o).all()

    def test_tta_value_parity_vs_reference(self):
        """VALUE parity vs the reference's non-traced
        Model.forward(augment=True) (yolo.py:589-605) on a small cfg.

        (The reference's shipped pipeline never executes this path —
        TracedModel.forward drops the augment flag, torch_utils.py:371 —
        but our --augment option exposes it to users, so it gets the same
        oracle bar as everything else.)"""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import ref_pipeline_oracle as R

        if not R.reference_available():
            pytest.skip("reference not mounted")
        import torch

        env = R.install_reference_environment()
        cfg_dict = {
            "nc": 3,
            "depth_multiple": 1.0,
            "width_multiple": 1.0,
            "anchors": [[12, 16, 19, 36, 40, 28],
                        [36, 75, 76, 55, 72, 146],
                        [142, 110, 192, 243, 459, 401]],
            "backbone": [
                [-1, 1, "Conv", [16, 3, 2]],
                [-1, 1, "Conv", [32, 3, 2]],
                [-1, 1, "Conv", [48, 3, 2]],   # P3
                [-1, 1, "Conv", [64, 3, 2]],   # P4
                [-1, 1, "Conv", [80, 3, 2]],   # P5
            ],
            "head": [
                [[2, 3, 4], 1, "IDetect", [3, "anchors"]],
            ],
        }
        torch.manual_seed(0)
        import copy

        model = env["yolo_models"].Model(copy.deepcopy(cfg_dict), ch=3, nc=3)
        model.eval()
        x_np = np.random.default_rng(1).uniform(
            0, 1, (1, 64, 64, 3)).astype(np.float32)
        with torch.no_grad():
            ref_out, _ = model(torch.from_numpy(
                x_np.transpose(0, 3, 1, 2).copy()), augment=True)

        from hamer_yolo_tpu.core.convert import convert_yolov7_state_dict
        from hamer_yolo_tpu.models.yolov7.yaml_spec import spec_from_yaml

        spec, ycfg = spec_from_yaml(copy.deepcopy(cfg_dict), nc=3)
        import dataclasses

        ycfg = dataclasses.replace(ycfg, compute_dtype="float32")
        sd = {k: np.asarray(v.detach().numpy())
              for k, v in model.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_yolov7_state_dict(sd, spec=spec))
        got = np.asarray(yolov7_forward_tta(params, jnp.asarray(x_np),
                                            ycfg, spec=spec))
        assert got.shape == tuple(ref_out.shape)
        # scale-1 branch is resize-free -> tight; scaled branches go
        # through bilinear resize where torch/XLA differ by float LSBs
        np.testing.assert_allclose(got, ref_out.numpy(), atol=2e-4,
                                   rtol=1e-4)
