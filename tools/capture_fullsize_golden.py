"""Capture FULL-SIZE seed-0 model outputs as committed regression fixtures.

Run on CPU f32 so fixtures are platform-stable:
    JAX_PLATFORMS=cpu python tools/capture_fullsize_golden.py
Writes tests/fixtures/fullsize_golden.npz consumed by tests/test_golden.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.mano_assets import load_mano_model
    from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward, init_hamer
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.models.sar import SarConfig, init_sar, sar_forward
    from hamer_yolo_tpu.models.vit import VITH_CONFIG
    from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7, yolov7_forward

    rng = np.random.default_rng(0)
    out = {}

    # HaMeR full size (f32 for platform stability)
    hcfg = HamerConfig(vit=dataclasses.replace(VITH_CONFIG, compute_dtype="float32"))
    mano = ManoModel.from_arrays(load_mano_model("right"))
    hp = jax.jit(lambda k: init_hamer(k, hcfg))(jax.random.PRNGKey(0))
    img = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    ho = hamer_forward(hp, mano, jnp.asarray(img), hcfg)
    out["hamer_input"] = img
    out["hamer_vertices"] = np.asarray(ho["pred_vertices"])
    out["hamer_kp3d"] = np.asarray(ho["pred_keypoints_3d"])
    out["hamer_cam"] = np.asarray(ho["pred_cam"])
    out["hamer_betas"] = np.asarray(ho["betas"])
    del hp

    # YOLOv7 full size @640, top-64 rows by objectness
    ycfg = YoloConfig(nc=3, compute_dtype="float32")
    yp = jax.jit(lambda k: init_yolov7(k, ycfg))(jax.random.PRNGKey(0))
    yimg = rng.uniform(0, 1, (1, 640, 640, 3)).astype(np.float32)
    pred = np.asarray(yolov7_forward(yp, jnp.asarray(yimg), ycfg))
    top = np.argsort(-pred[0, :, 4])[:64]
    out["yolo_input_seed"] = np.asarray([0])
    out["yolo_top_idx"] = top.astype(np.int64)
    out["yolo_top_rows"] = pred[0, top]
    del yp

    # SAR full size
    scfg = SarConfig(compute_dtype="float32")
    sp = jax.jit(lambda k: init_sar(k, mano.v_template, scfg))(jax.random.PRNGKey(0))
    simg = rng.normal(size=(1, 256, 256, 3)).astype(np.float32)
    out["sar_input"] = simg
    out["sar_uvd"] = np.asarray(sar_forward(sp, jnp.asarray(simg), scfg))

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tests", "fixtures", "fullsize_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB)")


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
