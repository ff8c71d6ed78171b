"""utils/detect_eval: the shared detector evaluation loop."""
import os

import numpy as np
import pytest

from hamer_yolo_tpu.models.yolov7.model import YoloConfig


@pytest.fixture(scope="module")
def labeled_dir(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("det")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    for i in range(2):
        img = rng.integers(0, 255, (96, 120, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "images" / f"im{i}.jpg"), img)
        (root / "labels" / f"im{i}.txt").write_text("1 0.5 0.5 0.3 0.4\n")
    return root


class TestEvalDetectorImages:
    def test_yields_original_frame_geometry(self, labeled_dir):
        import jax

        from hamer_yolo_tpu.io.datasets import image_label_pairs
        from hamer_yolo_tpu.models.yolov7 import init_yolov7
        from hamer_yolo_tpu.utils.detect_eval import eval_detector_images

        cfg = YoloConfig(nc=3, img_size=64)
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        pairs = image_label_pairs(str(labeled_dir / "images"),
                                  str(labeled_dir / "labels"))
        recs = list(eval_detector_images(params, cfg, pairs, img_size=64))
        assert len(recs) == 2
        for rec in recs:
            # gt box back in ORIGINAL 120x96 pixels
            np.testing.assert_allclose(
                rec["gt_boxes"][0],
                [0.35 * 120, 0.3 * 96, 0.65 * 120, 0.7 * 96], atol=1e-4)
            assert rec["gt_cls"].tolist() == [1.0]
            if len(rec["boxes"]):
                # random-weight boxes are unclipped (eval path keeps raw
                # geometry like the reference's test.py); just finite +
                # scored
                assert np.isfinite(rec["boxes"]).all()
                assert (rec["scores"] >= 0).all()

    def test_keypoint_head_rejected(self, labeled_dir):
        from hamer_yolo_tpu.models.yolov7.model import KPT
        from hamer_yolo_tpu.utils.detect_eval import eval_detector_images

        cfg = YoloConfig(nc=3, img_size=64)
        fake_spec = [((), "CONV", {}), ((), KPT, {})]
        with pytest.raises(ValueError, match="KPT"):
            list(eval_detector_images({}, cfg, [], spec=fake_spec))

    def test_detector_map_bounds(self, labeled_dir):
        import jax

        from hamer_yolo_tpu.io.datasets import image_label_pairs
        from hamer_yolo_tpu.models.yolov7 import init_yolov7
        from hamer_yolo_tpu.utils.detect_eval import detector_map

        cfg = YoloConfig(nc=3, img_size=64)
        params = init_yolov7(jax.random.PRNGKey(0), cfg)
        pairs = image_label_pairs(str(labeled_dir / "images"),
                                  str(labeled_dir / "labels"))
        mp, mr, map50, mmap = detector_map(params, cfg, pairs, img_size=64)
        for v in (mp, mr, map50, mmap):
            assert 0.0 <= v <= 1.0
        assert mmap <= map50 + 1e-9

    def test_empty_pairs(self):
        from hamer_yolo_tpu.utils.detect_eval import detector_map

        cfg = YoloConfig(nc=3, img_size=64)
        assert detector_map({}, cfg, []) == (0.0, 0.0, 0.0, 0.0)
