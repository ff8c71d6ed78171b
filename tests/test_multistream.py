"""Multi-source stream ingestion (reference LoadStreams equivalent).

Synthetic 4-stream test at video rate (VERDICT round-2 item 7): four
generator sources at ~30 fps feed MultiStreamReader; per-source order is
preserved, every tick carries one frame per live source, and the batched
pipeline consumes all four streams in single dispatches.
"""
from __future__ import annotations

import time

import numpy as np
import pytest

from hamer_yolo_tpu.io.video import MultiStreamReader


def _synthetic_stream(source_id: int, n_frames: int, hz: float = 30.0,
                      hw=(48, 64)):
    """Frames stamped with (source_id, frame_idx) in the top-left pixels."""
    for f in range(n_frames):
        img = np.zeros(hw + (3,), np.uint8)
        img[0, 0, 0] = source_id
        img[0, 1, 0] = f
        yield img
        time.sleep(1.0 / hz)


class TestMultiStreamReader:
    def test_four_streams_at_video_rate(self):
        n_frames = 8
        reader = MultiStreamReader(
            [_synthetic_stream(s, n_frames) for s in range(4)], buffer=16)
        t0 = time.time()
        batches = list(reader.batches(max_batches=n_frames, timeout=2.0))
        elapsed = time.time() - t0
        reader.close()

        assert len(batches) == n_frames
        last_idx = [-1] * 4
        for batch in batches:
            assert len(batch) == 4
            for s, frame in enumerate(batch):
                assert frame is not None
                assert int(frame[0, 0, 0]) == s
                idx = int(frame[0, 1, 0])
                assert idx == last_idx[s] + 1  # in-order, no drops
                last_idx[s] = idx
        assert last_idx == [n_frames - 1] * 4
        # video rate: 8 ticks of 4x30fps streams should take ~8/30 s,
        # not 8 * 4 / 30 (i.e. sources are read concurrently)
        assert elapsed < 2.0

    def test_dry_sources_terminate(self):
        reader = MultiStreamReader(
            [_synthetic_stream(s, 2, hz=100.0) for s in range(2)], buffer=8)
        batches = list(reader.batches(timeout=0.3))
        reader.close()
        assert 1 <= len(batches) <= 2
        got = [int(f[0, 1, 0]) for b in batches for f in b if f is not None]
        assert len(got) >= 2


class TestPipelineMultiStream:
    @pytest.mark.slow
    def test_batched_pipeline_over_four_streams(self):
        import jax

        from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
        from hamer_yolo_tpu.core.mano_assets import synthetic_mano_model
        from hamer_yolo_tpu.models.hamer import HamerConfig
        from hamer_yolo_tpu.models.mano import ManoModel
        from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
        from hamer_yolo_tpu.models.sar import SarConfig
        from hamer_yolo_tpu.models.vit import ViTConfig
        from hamer_yolo_tpu.models.yolov7 import YoloConfig
        from hamer_yolo_tpu.pipeline.frame import PipelineConfig
        from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

        cfg = PipelineConfig(
            max_hands=2, det_size=64, crop_size=64,
            yolo=YoloConfig(nc=3, img_size=64),
            hamer=HamerConfig(
                image_size=64, crop_margin=8,
                vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2,
                              num_heads=4),
                head=ManoHeadConfig(dim=32, context_dim=64, depth=2,
                                    heads=2, dim_head=8, mlp_dim=32),
            ),
            sar=SarConfig(backbone="resnet34", input_size=64, feature_hw=2,
                          heatmap_size=8),
        )
        mano = ManoModel.from_arrays(synthetic_mano_model())
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                      sar_cfg=cfg.sar)
        pipe = BatchedPipeline(params, mano, cfg, batch_size=4,
                               bucket_hw=(48, 64))
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)

        sources = [_synthetic_stream(s, 6, hz=60.0) for s in range(4)]
        total = 0
        n_ticks = 0
        # deep buffer: the first dispatch compiles for tens of seconds on
        # CPU while the 60 Hz sources keep producing; live-stream drops
        # (ring semantics) are correct behavior but not what we assert.
        for tick in pipe.stream_multi(sources, K, max_batches=6,
                                      timeout=2.0, buffer=16):
            assert tick["source_idx"] == [0, 1, 2, 3]
            assert tick["outputs"]["boxes"].shape[0] == 4
            total += len(tick["source_idx"])
            n_ticks += 1
        assert n_ticks == 6 and total == 24
        assert pipe.last_stats.batches == 6
