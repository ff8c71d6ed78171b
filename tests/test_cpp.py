"""Native host library tests (ctypes) vs the JAX/cv2 references."""
import numpy as np
import pytest

from hamer_yolo_tpu import cpp

pytestmark = pytest.mark.skipif(not cpp.available(),
                                reason="libhyt_host.so not built")


class TestLetterbox:
    def test_matches_device_letterbox(self, rng):
        import jax.numpy as jnp

        from hamer_yolo_tpu.ops.warp_matmul import letterbox_matmul

        img = rng.integers(0, 255, (120, 160, 3)).astype(np.uint8)
        native, r, (dw, dh) = cpp.letterbox(img, 64)
        dev, r2, pad2 = letterbox_matmul(
            jnp.asarray(img.astype(np.float32)), jnp.array([120.0, 160.0]), 64
        )
        assert abs(r - float(r2)) < 1e-6
        # interior equality (edge rows differ: device path pads-to-114
        # sub-pixel, native clamps like cv2.resize)
        d = np.abs(native[9:55] - np.asarray(dev)[9:55])
        assert d.max() < 1.0

    def test_pad_value(self, rng):
        img = rng.integers(0, 255, (100, 200, 3)).astype(np.uint8)
        out, r, (dw, dh) = cpp.letterbox(img, 64)
        # rect letterbox (auto=True mod-32) sits TOP-LEFT in the square
        # canvas: content rows 0..31, the rest is 114 gray.
        assert np.allclose(out[32:], 114.0)
        assert r == pytest.approx(0.32)


class TestCrop:
    def test_matches_jax_crop(self, rng):
        import jax.numpy as jnp

        from hamer_yolo_tpu.ops.warp_matmul import crop_square_matmul

        img = rng.integers(0, 255, (200, 300, 3)).astype(np.float32)
        native = cpp.crop_bilinear(img, 150.0, 90.0, 120.0, 64)
        dev = np.asarray(crop_square_matmul(
            jnp.asarray(img), jnp.array([150.0, 90.0]),
            jnp.array([120.0, 120.0]), (64, 64),
        ))
        assert np.abs(native - dev).max() < 1e-2

    def test_normalize(self):
        img = np.full((4, 4, 3), 128.0, np.float32)
        out = cpp.normalize(img.copy(), [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
        expected = (128.0 - 127.5) / 63.75
        np.testing.assert_allclose(out, expected, atol=1e-6)


class TestNms:
    def test_matches_python_oracle(self, rng):
        N, nc = 100, 3
        pred = np.zeros((N, 5 + nc), np.float32)
        pred[:, 0:2] = rng.uniform(50, 600, (N, 2))
        pred[:, 2:4] = rng.uniform(10, 120, (N, 2))
        pred[:, 4] = rng.uniform(0, 1, N)
        pred[:, 5:] = rng.dirichlet(np.ones(nc), N)
        out = cpp.nms(pred, 0.25, 0.45)
        # vs the jitted device NMS
        import jax.numpy as jnp

        from hamer_yolo_tpu.ops.nms import non_max_suppression

        dev = non_max_suppression(jnp.asarray(pred)[None], 0.25, 0.45,
                                  use_pallas=False)
        dv = np.asarray(dev.valid[0])
        assert len(out) == dv.sum()
        np.testing.assert_allclose(out[:, 4], np.asarray(dev.scores[0])[dv], rtol=1e-5)
        np.testing.assert_allclose(out[:, :4], np.asarray(dev.boxes[0])[dv], rtol=1e-4)

    def test_agnostic(self):
        pred = np.zeros((2, 8), np.float32)
        pred[:, 0:4] = [100, 100, 20, 20]
        pred[:, 4] = 0.9
        pred[0, 5] = 1.0
        pred[1, 6] = 0.9
        assert len(cpp.nms(pred, agnostic=False)) == 2
        assert len(cpp.nms(pred, agnostic=True)) == 1
