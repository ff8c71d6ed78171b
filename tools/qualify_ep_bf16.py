"""Accuracy pin for HYT_INT8_EP=bf16 at LARGE-M shapes.

tools/eval_fastpaths.py runs 8 crops (M=1536), which routes the int8
GEMMs through the small-M Pallas kernel — the kernel quantizes/dequants
in VMEM and ignores HYT_INT8_EP, so it cannot qualify the bf16 dequant
epilogue of the large-M XLA chain (ops/int8_matmul._xla_chain). This
tool runs the static-int8 HaMeR forward at 64 crops (M=12288 >
FUSED_GEMM_MAX_M) under both epilogue dtypes and reports the vertex /
keypoint deltas in mm.

Gate (same bar as eval_fastpaths): delta vs the f32-epilogue run well
under the int8-vs-f32 delta itself (~1.4 mm); expect ~0.1 mm from the
0.4%-relative bf16 dequant.

  python tools/qualify_ep_bf16.py   (TPU; ~2 compiles)
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.mano_assets import (load_mano_model,
                                                 synthetic_mano_model)
    from hamer_yolo_tpu.core.quant import (attach_static_act_scales,
                                           collect_vit_act_stats,
                                           quantize_vit_params)
    from hamer_yolo_tpu.models.hamer import (HamerConfig, hamer_forward,
                                             init_hamer)
    from hamer_yolo_tpu.models.mano import ManoModel

    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())

    import dataclasses

    cfg = HamerConfig()
    cfg_i8 = dataclasses.replace(cfg, int8_backbone=True)
    params = jax.jit(lambda k: init_hamer(k, cfg))(jax.random.PRNGKey(0))
    qparams = dict(params)
    qparams["backbone"] = jax.jit(quantize_vit_params)(params["backbone"])
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.standard_normal((8, 256, 192, 3)), jnp.float32)
    stats = jax.jit(lambda p, x: collect_vit_act_stats(
        p, x, cfg.vit))(qparams["backbone"], calib)
    qparams["backbone"] = attach_static_act_scales(qparams["backbone"], stats)
    qparams = jax.device_put(qparams)

    crops = jnp.asarray(rng.standard_normal((64, 256, 256, 3)), jnp.float32)

    def run():
        # fresh jit per env setting: HYT_INT8_EP is read at trace time
        out = jax.jit(lambda p, x: hamer_forward(p, mano, x, cfg_i8))(
            qparams, crops)
        return {k: np.asarray(out[k], np.float64)
                for k in ("pred_vertices", "pred_keypoints_3d")}

    os.environ.pop("HYT_INT8_EP", None)
    base = run()
    os.environ["HYT_INT8_EP"] = "bf16"
    bf = run()
    os.environ.pop("HYT_INT8_EP", None)

    mpvpe = np.linalg.norm(bf["pred_vertices"] - base["pred_vertices"],
                           axis=-1).mean() * 1000.0
    mpjpe = np.linalg.norm(
        bf["pred_keypoints_3d"] - base["pred_keypoints_3d"],
        axis=-1).mean() * 1000.0
    print(f"ep_bf16 vs ep_f32 @64 crops (large-M XLA chain): "
          f"MPVPE {mpvpe:.4f} mm  MPJPE {mpjpe:.4f} mm")


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
