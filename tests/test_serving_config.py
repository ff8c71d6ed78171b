"""Serving loop, video IO, and config-system tests."""
import dataclasses
import os

import numpy as np
import pytest

import jax

from hamer_yolo_tpu.core import config as C
from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
from hamer_yolo_tpu.models.hamer import HamerConfig
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
from hamer_yolo_tpu.models.sar import SarConfig
from hamer_yolo_tpu.models.vit import ViTConfig
from hamer_yolo_tpu.models.yolov7 import YoloConfig
from hamer_yolo_tpu.pipeline.frame import PipelineConfig
from hamer_yolo_tpu.pipeline.serving import BatchedPipeline
from hamer_yolo_tpu.io.video import iter_media


def tiny_cfg() -> PipelineConfig:
    return PipelineConfig(
        max_hands=2, det_size=64, crop_size=64,
        yolo=YoloConfig(nc=3, img_size=64),
        hamer=HamerConfig(
            image_size=64, crop_margin=8,
            vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=4),
            head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                                dim_head=8, mlp_dim=32),
        ),
        sar=SarConfig(backbone="resnet34", input_size=64, feature_hw=2, heatmap_size=8),
    )


class TestServing:
    def test_batched_pipeline_stream(self, rng):
        cfg = tiny_cfg()
        try:
            mano = ManoModel.from_arrays(load_mano_model("right"))
        except Exception:
            mano = ManoModel.from_arrays(synthetic_mano_model())
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)
        pipe = BatchedPipeline(params, mano, cfg, batch_size=4,
                               bucket_hw=(128, 128))
        frames = [rng.integers(0, 255, (100 + i, 120, 3)).astype(np.float32)
                  for i in range(6)]
        K = np.array([[200.0, 0, 60], [0, 200.0, 50], [0, 0, 1]], np.float32)
        outs = list(pipe.stream(iter(frames), K))
        assert len(outs) == 2  # 4 + 2
        assert outs[0]["boxes"].shape[0] == 4
        assert outs[1]["boxes"].shape[0] == 2
        assert pipe.last_stats.frames == 6

    def test_uint8_upload_bit_identical(self, rng):
        """All-uint8 frame lists upload as uint8 (4x fewer H2D bytes
        through the tunnel) and the on-device cast reproduces the f32
        path bit-for-bit (0..255 is exact in f32)."""
        cfg = tiny_cfg()
        try:
            mano = ManoModel.from_arrays(load_mano_model("right"))
        except Exception:
            mano = ManoModel.from_arrays(synthetic_mano_model())
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)
        pipe = BatchedPipeline(params, mano, cfg, batch_size=2,
                               bucket_hw=(128, 128))
        frames_u8 = [rng.integers(0, 255, (100, 120, 3)).astype(np.uint8)
                     for _ in range(2)]
        K = np.array([[200.0, 0, 60], [0, 200.0, 50], [0, 0, 1]], np.float32)
        imgs_u8, _, _ = pipe._pad_frames(frames_u8, K)
        assert imgs_u8.dtype == np.uint8
        out_u8 = pipe.process_batch(frames_u8, K)
        out_f32 = pipe.process_batch(
            [f.astype(np.float32) for f in frames_u8], K)
        for k in ("boxes", "vertices", "cam_t", "betas"):
            np.testing.assert_array_equal(out_u8[k], out_f32[k], err_msg=k)


class TestServingMesh:
    def test_data_parallel_serving(self, rng):
        """Batch sharded over the 8-device CPU mesh (ICI fan-out config)."""
        from hamer_yolo_tpu.parallel.mesh import make_mesh

        cfg = tiny_cfg()
        try:
            mano = ManoModel.from_arrays(load_mano_model("right"))
        except Exception:
            mano = ManoModel.from_arrays(synthetic_mano_model())
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)
        mesh = make_mesh(n_data=8, n_model=1)
        with jax.set_mesh(mesh):
            pipe = BatchedPipeline(params, mano, cfg, batch_size=8,
                                   bucket_hw=(96, 96), mesh=mesh)
            frames = [rng.integers(0, 255, (80, 90, 3)).astype(np.float32)
                      for _ in range(8)]
            K = np.array([[200.0, 0, 45], [0, 200.0, 40], [0, 0, 1]], np.float32)
            out = pipe.process_batch(frames, K)
        assert out["boxes"].shape == (8, cfg.max_hands, 4)
        assert np.isfinite(out["theta"]).all()


class TestVideoIO:
    def test_iter_media_dir(self, tmp_path, rng):
        import cv2

        for i in range(3):
            cv2.imwrite(str(tmp_path / f"f{i}.jpg"),
                        rng.integers(0, 255, (40, 50, 3)).astype(np.uint8))
        frames = list(iter_media(str(tmp_path)))
        assert len(frames) == 3
        assert frames[0].shape == (40, 50, 3)

    def test_iter_media_max_frames(self, tmp_path, rng):
        import cv2

        for i in range(5):
            cv2.imwrite(str(tmp_path / f"f{i}.jpg"),
                        rng.integers(0, 255, (20, 20, 3)).astype(np.uint8))
        assert len(list(iter_media(str(tmp_path), max_frames=2))) == 2


class TestConfig:
    def test_dotted_overrides(self):
        o = C.overrides_from_dotted(["conf_thres=0.3", "hamer.tome_r=4",
                                     "tta=true"])
        assert o == {"conf_thres": 0.3, "hamer": {"tome_r": 4}, "tta": True}

    def test_apply_overrides_nested(self):
        cfg = PipelineConfig()
        new = C.apply_overrides(cfg, {"conf_thres": 0.5, "hamer": {"tome_r": 8}})
        assert new.conf_thres == 0.5
        assert new.hamer.tome_r == 8
        assert cfg.conf_thres == 0.25  # original untouched

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            C.apply_overrides(PipelineConfig(), {"not_a_key": 1})

    def test_toml_roundtrip(self, tmp_path):
        path = tmp_path / "cfg.toml"
        path.write_text("conf_thres = 0.4\n[hamer]\ntome_r = 2\n")
        o = C.load_config_file(str(path))
        new = C.apply_overrides(PipelineConfig(), o)
        assert new.conf_thres == 0.4 and new.hamer.tome_r == 2

    def test_describe(self):
        s = C.describe(YoloConfig())
        assert "img_size" in s


class TestServingPipelined:
    def test_stream_depth_preserves_order(self, rng):
        """depth=3 keeps multiple batches in flight; output order and
        contents must match the depth=1 (fully synchronous) stream."""
        cfg = tiny_cfg()
        try:
            mano = ManoModel.from_arrays(load_mano_model("right"))
        except Exception:
            mano = ManoModel.from_arrays(synthetic_mano_model())
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)
        pipe = BatchedPipeline(params, mano, cfg, batch_size=2,
                               bucket_hw=(128, 128))
        frames = [rng.integers(0, 255, (100, 120, 3)).astype(np.float32)
                  for _ in range(6)]
        K = np.array([[200.0, 0, 60], [0, 200.0, 50], [0, 0, 1]], np.float32)
        sync = list(pipe.stream(iter(frames), K, depth=1))
        deep = list(pipe.stream(iter(frames), K, depth=3))
        assert len(sync) == len(deep) == 3
        for a, b in zip(sync, deep):
            np.testing.assert_array_equal(a["boxes"], b["boxes"])
            np.testing.assert_array_equal(a["valid"], b["valid"])
