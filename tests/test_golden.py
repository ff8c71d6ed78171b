"""Golden regression tests: committed fixtures pin numerical behavior.

The fixture was captured with tools/parity_check.py (tiny HAMER, seed 0,
CPU f32). Any refactor that drifts the forward numerics beyond the
reference tolerance (allclose 1e-3, the contract the reference applies to
its ONNX exports) fails here. Also: orbax checkpoint roundtrip.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "hamer_tiny_golden.npz")


class TestGoldenHamer:
    @pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
    def test_forward_matches_fixture(self):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from parity_check import build_hamer

        data = np.load(FIXTURE)
        fn, _ = build_hamer(seed=0, tiny=True)
        out = fn(jnp.asarray(data["__input__"]))
        for k in data.files:
            if k == "__input__":
                continue
            np.testing.assert_allclose(
                np.asarray(out[k]), data[k], atol=1e-3, rtol=1e-3,
                err_msg=f"output {k} drifted from golden fixture",
            )


class TestCheckpointRoundtrip:
    def test_orbax_save_load(self, tmp_path):
        from hamer_yolo_tpu.core.checkpoint import load_checkpoint, save_checkpoint
        from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7

        cfg = YoloConfig(nc=3, img_size=64)
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params)
        restored = load_checkpoint(path, params)
        a = jax.tree_util.tree_leaves(params)
        b = jax.tree_util.tree_leaves(restored)
        assert len(a) == len(b)
        for x, y in zip(a[:20], b[:20]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_train_state_roundtrip(self, tmp_path):
        from hamer_yolo_tpu.core.checkpoint import load_checkpoint, save_checkpoint
        from hamer_yolo_tpu.models.yolov7 import YoloConfig
        from hamer_yolo_tpu.training.train_yolo import init_yolo_train_state

        state, _ = init_yolo_train_state(
            jax.random.PRNGKey(0), YoloConfig(nc=3, img_size=64), 10)
        path = str(tmp_path / "state")
        save_checkpoint(path, state)
        restored = load_checkpoint(path, state)
        assert int(restored.step) == int(state.step)
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(restored.ema.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.ema.params)[0]),
        )


FULLSIZE = os.path.join(os.path.dirname(__file__), "fixtures", "fullsize_golden.npz")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FULLSIZE), reason="fixture missing")
class TestFullSizeGolden:
    """Full-size seed-0 regression pins (CPU f32). Catches numerical drift
    in the production-size graphs across refactors/rounds. ~2 min on CPU."""

    def test_hamer_fullsize(self):
        import dataclasses

        from hamer_yolo_tpu.core.mano_assets import load_mano_model
        from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward, init_hamer
        from hamer_yolo_tpu.models.mano import ManoModel
        from hamer_yolo_tpu.models.vit import VITH_CONFIG

        data = np.load(FULLSIZE)
        hcfg = HamerConfig(vit=dataclasses.replace(VITH_CONFIG,
                                                   compute_dtype="float32"))
        mano = ManoModel.from_arrays(load_mano_model("right"))
        hp = jax.jit(lambda k: init_hamer(k, hcfg))(jax.random.PRNGKey(0))
        out = hamer_forward(hp, mano, jnp.asarray(data["hamer_input"]), hcfg)
        np.testing.assert_allclose(np.asarray(out["pred_vertices"]),
                                   data["hamer_vertices"], atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["pred_cam"]),
                                   data["hamer_cam"], atol=1e-3)

    def test_yolo_fullsize(self):
        from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7, yolov7_forward

        data = np.load(FULLSIZE)
        ycfg = YoloConfig(nc=3, compute_dtype="float32")
        yp = jax.jit(lambda k: init_yolov7(k, ycfg))(jax.random.PRNGKey(0))
        rng2 = np.random.default_rng(0)
        _ = rng2.normal(size=(1, 256, 256, 3))  # consume hamer draw
        yimg = rng2.uniform(0, 1, (1, 640, 640, 3)).astype(np.float32)
        pred = np.asarray(yolov7_forward(yp, jnp.asarray(yimg), ycfg))
        rows = pred[0, data["yolo_top_idx"]]
        np.testing.assert_allclose(rows, data["yolo_top_rows"], atol=2e-3)

    def test_sar_fullsize(self):
        from hamer_yolo_tpu.core.mano_assets import load_mano_model
        from hamer_yolo_tpu.models.mano import ManoModel
        from hamer_yolo_tpu.models.sar import SarConfig, init_sar, sar_forward

        data = np.load(FULLSIZE)
        scfg = SarConfig(compute_dtype="float32")
        mano = ManoModel.from_arrays(load_mano_model("right"))
        sp = jax.jit(lambda k: init_sar(k, mano.v_template, scfg))(jax.random.PRNGKey(0))
        uvd = np.asarray(sar_forward(sp, jnp.asarray(data["sar_input"]), scfg))
        np.testing.assert_allclose(uvd, data["sar_uvd"], atol=1e-2, rtol=1e-3)


class TestPipelineCheckpointRoundtrip:
    def test_templateless_restore_runs(self, tmp_path):
        """CLI --checkpoint path: full pipeline params survive a
        templateless orbax restore (None spec-layers intact) and the
        restored detector forward runs."""
        from hamer_yolo_tpu.core.checkpoint import (
            init_pipeline_params, load_checkpoint, save_checkpoint,
        )
        from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
        from hamer_yolo_tpu.models.hamer import HamerConfig
        from hamer_yolo_tpu.models.mano import ManoModel
        from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
        from hamer_yolo_tpu.models.sar import SarConfig
        from hamer_yolo_tpu.models.vit import ViTConfig
        from hamer_yolo_tpu.models.yolov7 import YoloConfig, yolov7_forward

        try:
            mano = ManoModel.from_arrays(load_mano_model("right"))
        except Exception:
            mano = ManoModel.from_arrays(synthetic_mano_model())
        params = init_pipeline_params(
            jax.random.PRNGKey(0), mano,
            yolo_cfg=YoloConfig(nc=3, img_size=64),
            hamer_cfg=HamerConfig(
                image_size=64, crop_margin=8,
                vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2,
                              num_heads=4),
                head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                                    dim_head=8, mlp_dim=32)),
            sar_cfg=SarConfig(backbone="resnet34", input_size=64,
                              feature_hw=2, heatmap_size=8))
        path = str(tmp_path / "pipe")
        save_checkpoint(path, params)
        restored = load_checkpoint(path)
        assert set(restored) == {"yolo", "hamer", "sar"}
        assert len(restored["yolo"]["layers"]) == 106
        assert restored["yolo"]["layers"][10] is None  # CAT layer slot
        out = yolov7_forward(restored["yolo"], jnp.zeros((1, 64, 64, 3)),
                             YoloConfig(nc=3, img_size=64))
        assert out.shape == (1, 252, 8)
