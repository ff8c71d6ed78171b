"""W8A8 int8 YOLOv7 trunk tests (core/quant.quantize_yolo_params)."""
import numpy as np

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core.quant import quantize_conv_weight, quantize_yolo_params
from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7, yolov7_forward


class TestQuantConv:
    def test_weight_roundtrip_error_bounded(self, rng):
        w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
        q = quantize_conv_weight(w)
        assert q["q"].dtype == jnp.int8
        deq = np.asarray(q["q"], np.float32) * np.asarray(q["scale"])
        # per-channel absmax symmetric: error <= scale/2 per element
        err = np.abs(deq - np.asarray(w))
        assert (err <= np.asarray(q["scale"]) / 2 + 1e-6).all()


class TestQuantYolo:
    def test_forward_close_and_head_untouched(self, rng):
        cfg = YoloConfig(nc=3, img_size=128, compute_dtype="float32")
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        qparams = quantize_yolo_params(params)

        # detect head stays f32 (box regression precision)
        assert not isinstance(qparams["layers"][-1]["m"][0]["w"], dict)
        # default = pointwise-only: 3x3 stem conv stays f32, 1x1 ELAN
        # convs are int8 (layer 4 is the first 1x1, models/yolov7 spec)
        assert not isinstance(qparams["layers"][0]["conv"]["w"], dict)
        assert qparams["layers"][4]["conv"]["w"]["q"].dtype == jnp.int8
        # full-conv mode (only_1x1=False) quantizes the stem too
        qfull = quantize_yolo_params(params, only_1x1=False)
        assert qfull["layers"][0]["conv"]["w"]["q"].dtype == jnp.int8

        x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
        ref = np.asarray(yolov7_forward(params, x, cfg))
        out = np.asarray(yolov7_forward(qparams, x, cfg))
        assert out.shape == ref.shape
        cos = (ref * out).sum() / (np.linalg.norm(ref) * np.linalg.norm(out))
        assert cos > 0.99
        # objectness/class columns (sigmoided) stay close in absolute terms
        np.testing.assert_allclose(out[..., 4:], ref[..., 4:], atol=0.1)

    def test_detections_survive_nms(self, rng):
        """Quantized trunk -> NMS picks overlapping boxes vs the f32 trunk."""
        from hamer_yolo_tpu.ops.nms import non_max_suppression

        cfg = YoloConfig(nc=3, img_size=128, compute_dtype="float32")
        params = init_yolov7(jax.random.PRNGKey(1), cfg)
        qparams = quantize_yolo_params(params)
        x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
        # random-weight logits hover near 0.5 score; use a low threshold
        a = non_max_suppression(yolov7_forward(params, x, cfg),
                                conf_thres=0.1, iou_thres=0.5, max_det=4)
        b = non_max_suppression(yolov7_forward(qparams, x, cfg),
                                conf_thres=0.1, iou_thres=0.5, max_det=4)
        na, nb = int(a.valid.sum()), int(b.valid.sum())
        assert nb > 0 if na > 0 else True
        if na and nb:
            # top boxes agree to within a few pixels
            np.testing.assert_allclose(np.asarray(a.boxes[0, 0]),
                                       np.asarray(b.boxes[0, 0]), atol=4.0)


class TestPointwiseInt8Conv:
    def test_1x1_dot_path_matches_conv_path(self, rng):
        """The 1x1 int8 conv routes through dot_general (per-pixel
        scales); it must stay close to the f32 conv and support stride."""
        from hamer_yolo_tpu.core import nn
        from hamer_yolo_tpu.core.quant import quantize_conv_weight

        for stride in (1, 2):
            w = jnp.asarray(rng.normal(size=(1, 1, 16, 32)).astype(np.float32) * 0.2)
            b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
            x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
            ref = nn.conv2d({"w": w, "b": b}, x, stride=stride)
            got = nn.conv2d({"w": quantize_conv_weight(w), "b": b}, x,
                            stride=stride)
            assert got.shape == ref.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=0.05, rtol=0.05)

    def test_grouped_1x1_falls_back_to_conv(self, rng):
        from hamer_yolo_tpu.core import nn
        from hamer_yolo_tpu.core.quant import quantize_conv_weight

        w = jnp.asarray(rng.normal(size=(1, 1, 8, 32)).astype(np.float32) * 0.2)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 16)).astype(np.float32))
        ref = nn.conv2d({"w": w}, x, groups=2)
        got = nn.conv2d({"w": quantize_conv_weight(w)}, x, groups=2)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=0.2, rtol=0.2)
