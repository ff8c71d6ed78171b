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
        # trunk convs are int8
        assert qparams["layers"][0]["conv"]["w"]["q"].dtype == jnp.int8

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
