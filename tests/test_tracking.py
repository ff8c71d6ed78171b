"""Detect-skip tracking mode (serving detect_every=K).

The reference re-runs YOLO on every video frame (yolo/detector.py:35-104);
the TPU serving loop can instead refresh detections on keyframes and track
boxes from the previous tick's projected keypoints in between
(geometry.boxes.track_boxes_from_keypoints -> frame.infer_frames_tracked
-> serving.BatchedPipeline(detect_every=K).stream_multi). The detector is
~1/3 of the frame program's device time at b128, so tracked ticks are
correspondingly cheaper.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.geometry.boxes import track_boxes_from_keypoints


class TestTrackBoxesFromKeypoints:
    def test_expand_round_clip_invalid(self):
        # slot 0: kp box [10, 20] x [30, 60] -> wh (20, 40), expand 1.5 ->
        # (30, 60) about center (20, 40) -> [5, 10, 35, 70]
        kp0 = np.stack([np.linspace(10, 30, 21), np.linspace(20, 60, 21)],
                       axis=-1)
        # slot 1: collapsed keypoints at (100, 100) -> min_size box
        kp1 = np.full((21, 2), 100.0)
        # slot 2: valid=0 -> zeroed regardless of keypoints
        kp2 = kp0 + 5.0
        kp2d = jnp.asarray(np.stack([kp0, kp1, kp2]), jnp.float32)
        valid = jnp.asarray([1.0, 1.0, 0.0])
        out = np.asarray(track_boxes_from_keypoints(
            kp2d, valid, jnp.asarray([120.0, 160.0]), expand=1.5,
            min_size=8.0))
        np.testing.assert_allclose(out[0], [5, 10, 35, 70])
        np.testing.assert_allclose(out[1], [96, 96, 104, 104])
        np.testing.assert_allclose(out[2], [0, 0, 0, 0])

    def test_clips_to_frame(self):
        kp = np.stack([np.linspace(-40, 30, 21), np.linspace(10, 200, 21)],
                      axis=-1)[None]
        out = np.asarray(track_boxes_from_keypoints(
            jnp.asarray(kp, jnp.float32), jnp.asarray([1.0]),
            jnp.asarray([120.0, 160.0]), expand=1.0))
        x1, y1, x2, y2 = out[0]
        assert x1 >= 0 and y1 >= 0 and x2 <= 160 and y2 <= 120
        assert x2 > x1 and y2 > y1


def _tiny_cfg():
    from hamer_yolo_tpu.models.hamer import HamerConfig
    from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
    from hamer_yolo_tpu.models.sar import SarConfig
    from hamer_yolo_tpu.models.vit import ViTConfig
    from hamer_yolo_tpu.models.yolov7 import YoloConfig
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig

    return PipelineConfig(
        max_hands=2, det_size=64, crop_size=64,
        yolo=YoloConfig(nc=3, img_size=64),
        hamer=HamerConfig(
            image_size=64, crop_margin=8,
            vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2,
                          num_heads=4),
            head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                                dim_head=8, mlp_dim=32),
        ),
        sar=SarConfig(backbone="resnet34", input_size=64, feature_hw=2,
                      heatmap_size=8),
    )


def _tiny_params(cfg):
    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import synthetic_mano_model
    from hamer_yolo_tpu.models.mano import ManoModel

    mano = ManoModel.from_arrays(synthetic_mano_model())
    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)
    return params, mano


class TestInferFramesTracked:
    @pytest.mark.slow
    def test_same_schema_as_infer_frames(self):
        from hamer_yolo_tpu.pipeline.frame import (infer_frames,
                                                   infer_frames_tracked)

        cfg = _tiny_cfg()
        params, mano = _tiny_params(cfg)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.integers(0, 255, (2, 48, 64, 3)).astype(np.float32))
        hws = jnp.broadcast_to(jnp.asarray([48.0, 64.0]), (2, 2))
        Ks = jnp.broadcast_to(jnp.asarray(
            [[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], jnp.float32),
            (2, 3, 3))

        det_out = jax.jit(lambda p, i, h, k: infer_frames(
            p, mano, i, h, k, cfg))(params, images, hws, Ks)
        trk_out = jax.jit(lambda p, i, kp, ir, v, h, k: infer_frames_tracked(
            p, mano, i, kp, ir, v, h, k, cfg))(
                params, images, det_out["keypoints_2d"],
                det_out["is_right"], det_out["valid"], hws, Ks)

        assert set(trk_out) == set(det_out)
        for k in det_out:
            assert trk_out[k].shape == det_out[k].shape, k
            assert np.isfinite(np.asarray(trk_out[k])).all(), k
        # validity passes straight through the tracked program
        np.testing.assert_array_equal(np.asarray(trk_out["valid"]),
                                      np.asarray(det_out["valid"]))
        np.testing.assert_array_equal(np.asarray(trk_out["is_right"]),
                                      np.asarray(det_out["is_right"]))

    @pytest.mark.slow
    def test_box_roundtrip_matches_detect(self):
        """Keypoints whose tracked extent reproduces the detector's boxes
        must yield the detect program's outputs (scores are passthrough;
        the only difference between the programs is the box source)."""
        from hamer_yolo_tpu.pipeline.frame import (infer_frames,
                                                   infer_frames_tracked)

        cfg = _tiny_cfg()
        params, mano = _tiny_params(cfg)
        rng = np.random.default_rng(2)
        images = jnp.asarray(
            rng.integers(0, 255, (2, 48, 64, 3)).astype(np.float32))
        hws = jnp.broadcast_to(jnp.asarray([48.0, 64.0]), (2, 2))
        Ks = jnp.broadcast_to(jnp.asarray(
            [[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], jnp.float32),
            (2, 3, 3))

        det_out = jax.jit(lambda p, i, h, k: infer_frames(
            p, mano, i, h, k, cfg))(params, images, hws, Ks)
        valid = np.asarray(det_out["valid"], bool)
        assert valid.any()

        expand, min_size = 1.3, 2.0
        boxes = np.asarray(det_out["boxes"], np.float64)
        c = (boxes[..., :2] + boxes[..., 2:]) / 2.0
        wh = boxes[..., 2:] - boxes[..., :2]
        kp = np.broadcast_to(c[..., None, :],
                             boxes.shape[:2] + (21, 2)).copy()
        kp[..., 0, :] = c - wh / (2.0 * expand)
        kp[..., 1, :] = c + wh / (2.0 * expand)

        trk_out = jax.jit(lambda p, i, kpv, ir, v, h, k: infer_frames_tracked(
            p, mano, i, kpv, ir, v, h, k, cfg, track_expand=expand,
            track_min_size=min_size))(
                params, images, jnp.asarray(kp, jnp.float32),
                det_out["is_right"], det_out["valid"], hws, Ks)

        ok = valid & (wh >= min_size).all(axis=-1)
        assert ok.any()
        np.testing.assert_array_equal(
            np.asarray(trk_out["boxes"])[ok], boxes[ok])
        for key in ("vertices", "keypoints_2d", "cam_t", "root_depth",
                    "betas", "theta"):
            np.testing.assert_allclose(
                np.asarray(trk_out[key], np.float64)[ok],
                np.asarray(det_out[key], np.float64)[ok],
                atol=2e-3, err_msg=key)


class TestStreamMultiDetectEvery:
    @pytest.mark.slow
    def test_keyframe_cadence_and_stitching(self):
        from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

        cfg = _tiny_cfg()
        params, mano = _tiny_params(cfg)
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
        rng = np.random.default_rng(1)
        frame_by_src = [
            rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
            for _ in range(2)
        ]

        def _static_stream(src, n):
            for _ in range(n):
                yield frame_by_src[src]

        pipe = BatchedPipeline(params, mano, cfg, batch_size=2,
                               bucket_hw=(48, 64), detect_every=2)
        ticks = list(pipe.stream_multi(
            [_static_stream(s, 4) for s in range(2)], K, max_batches=4,
            timeout=5.0, buffer=8))
        assert len(ticks) == 4
        # cadence: keyframes on ticks 0/2 detect every source; in between
        # nothing detects (state exists for both sources)
        assert ticks[0]["detected"] == [0, 1]
        assert ticks[1]["detected"] == []
        assert ticks[2]["detected"] == [0, 1]
        assert ticks[3]["detected"] == []
        for t in ticks:
            assert t["source_idx"] == [0, 1]
            assert t["outputs"]["boxes"].shape[0] == 2
            for v in t["outputs"].values():
                assert np.isfinite(np.asarray(v)).all()
        # static sources: keyframe ticks reproduce the plain batched
        # program bit-for-bit (same program, same frames)
        ref = pipe.process_batch(frame_by_src, K)
        for k, v in ticks[2]["outputs"].items():
            np.testing.assert_array_equal(v, ref[k], err_msg=k)
        # tracked ticks carry keyframe validity forward
        np.testing.assert_array_equal(ticks[1]["outputs"]["valid"],
                                      ticks[0]["outputs"]["valid"])

    @pytest.mark.slow
    def test_detect_every_mesh_sharded(self):
        """Both serving programs (detect + tracked) dispatch through the
        8-device data mesh: the tracked batch tuple shards like the
        detect one (serving._shard pads every dispatch to batch_size)."""
        from hamer_yolo_tpu.parallel.mesh import make_mesh
        from hamer_yolo_tpu.pipeline.serving import BatchedPipeline

        cfg = _tiny_cfg()
        params, mano = _tiny_params(cfg)
        K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
                  for _ in range(2)]

        def _src(i, n=4):
            for _ in range(n):
                yield frames[i]

        mesh = make_mesh(n_data=8, n_model=1)
        with jax.set_mesh(mesh):
            pipe = BatchedPipeline(params, mano, cfg, batch_size=8,
                                   bucket_hw=(48, 64), mesh=mesh,
                                   detect_every=2)
            ticks = list(pipe.stream_multi([_src(0), _src(1)], K,
                                           max_batches=3, timeout=5.0))
        assert [t["detected"] for t in ticks] == [[0, 1], [], [0, 1]]
        for t in ticks:
            assert t["outputs"]["boxes"].shape[0] == 2
            for v in t["outputs"].values():
                assert np.isfinite(np.asarray(v)).all()
