"""Accuracy qualification of the fast ViT paths (VERDICT round-1 weak #1).

Measures the end-to-end HaMeR output deltas (MPVPE in mm, 3D keypoint
error, MANO parameter drift) of each accelerated backbone against the
exact-bf16 baseline on the SAME production-shape seed-0 weights:

- ToMe r in {2, 4, 8}   (static-schedule token merging, models/tome.py)
- W8A8 dynamic int8     (core/quant.py)
- bf16 vs f32           (context: the noise floor quantization must beat)

Caveat: random (seed-0) weights — real-checkpoint deltas may differ, but
this pins the numeric distortion of each path at production shapes. The
BASELINE.md parity bar is MPVPE < 1 mm.

Usage: python tools/eval_fastpaths.py   (TPU or CPU; ~minutes of compiles)
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.core.quant import quantize_vit_params
    from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward, init_hamer
    from hamer_yolo_tpu.models.mano import ManoModel

    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())

    cfg = HamerConfig()
    params = jax.jit(lambda k: init_hamer(k, cfg))(jax.random.PRNGKey(0))
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    # Realistic crop statistics: ImageNet-normalized pixels.
    crops = jnp.asarray(rng.standard_normal((8, 256, 256, 3)), jnp.float32)

    def run(cfg_variant, p=params):
        out = jax.jit(lambda p, x: hamer_forward(p, mano, x, cfg_variant))(p, crops)
        return {k: np.asarray(out[k], np.float64) for k in
                ("pred_vertices", "pred_keypoints_3d", "pred_cam")}

    # Pin every non-megakernel arm to the plain einsum exact path — on
    # TPU the bf16 megakernel is now the inference default and must be
    # measured AGAINST exact, not AS it. The bf16_mega arm below
    # re-enables it explicitly.
    os.environ["HYT_ATTN_BF16"] = "off"
    base = run(cfg)

    def delta(name, other):
        mpvpe = np.linalg.norm(other["pred_vertices"] - base["pred_vertices"],
                               axis=-1).mean() * 1000.0
        kp3d = np.linalg.norm(other["pred_keypoints_3d"] - base["pred_keypoints_3d"],
                              axis=-1).mean() * 1000.0
        cam = np.abs(other["pred_cam"] - base["pred_cam"]).max()
        print(f"{name:<14s} MPVPE {mpvpe:8.4f} mm   kp3d {kp3d:8.4f} mm   "
              f"cam max|d| {cam:.5f}", flush=True)
        return {"mpvpe_mm": round(float(mpvpe), 4),
                "kp3d_mm": round(float(kp3d), 4), "cam_maxd": round(float(cam), 5)}

    results = {}
    f32_cfg = dataclasses.replace(
        cfg, vit=dataclasses.replace(cfg.vit, compute_dtype="float32"))
    results["f32_vs_bf16"] = delta("f32(ctx)", run(f32_cfg))

    for r in (2, 4, 8):
        results[f"tome_r{r}"] = delta(
            f"tome_r{r}", run(dataclasses.replace(cfg, tome_r=r)))

    qparams = dict(params)
    qparams["backbone"] = jax.jit(quantize_vit_params)(params["backbone"])
    results["int8"] = delta(
        "w8a8_int8", run(dataclasses.replace(cfg, int8_backbone=True), qparams))

    results["int8_tome_r4"] = delta(
        "int8+tome_r4",
        run(dataclasses.replace(cfg, int8_backbone=True, tome_r=4), qparams))

    # Static calibrated per-tensor activation scales (core/quant.py):
    # calibrate on a HELD-OUT batch of the same distribution, then eval
    # on the standard crops — measures the per-tensor resolution loss
    # plus any clip on unseen activations.
    from hamer_yolo_tpu.core.quant import (attach_static_act_scales,
                                           collect_vit_act_stats)

    crng = np.random.default_rng(1)
    # ViT input shape = the 256x192 center crop (hamer crop_margin 32).
    calib = jnp.asarray(crng.standard_normal((8, 256, 192, 3)), jnp.float32)
    stats = jax.jit(lambda p, x: collect_vit_act_stats(p, x, cfg.vit))(
        qparams["backbone"], calib)
    sparams = dict(qparams)
    sparams["backbone"] = attach_static_act_scales(qparams["backbone"], stats)
    # Pin the UNFUSED composition: at this small eval batch the fused
    # TPU dispatch lands in the Pallas small-M kernel, which (by design)
    # quantizes dynamically and would not exercise static semantics; the
    # unfused int8_linear applies the same per-tensor static quantize the
    # large-M XLA chain uses at b128.
    os.environ["HYT_INT8_FUSED"] = "0"
    try:
        results["int8_static"] = delta(
            "int8_static",
            run(dataclasses.replace(cfg, int8_backbone=True), sparams))
        results["int8_static_tome_r4"] = delta(
            "int8_sta+tome4",
            run(dataclasses.replace(cfg, int8_backbone=True, tome_r=4),
                sparams))
    finally:
        del os.environ["HYT_INT8_FUSED"]

    # Megakernel engagements of the same static-scale math (attention
    # megakernel + resident-weight MLP pair, core/quant.py; and the
    # exact-path bf16 fused LN+QKV+attention block, models/vit.py).
    # Pallas kernels need a real TPU; skip elsewhere (interpret-mode
    # parity lives in tests/test_pallas_kernels.py).
    if jax.devices()[0].platform in ("tpu", "axon"):
        os.environ["HYT_ATTN"] = "megakernel"
        os.environ["HYT_INT8_MLP"] = "megakernel"
        # Pin exact-erf GELU for the baseline mega arms (poly is the TPU
        # default since its qualification; the dedicated arm below
        # measures it explicitly).
        os.environ["HYT_GELU"] = "exact"
        try:
            results["int8_static_mega"] = delta(
                "int8_sta_mega",
                run(dataclasses.replace(cfg, int8_backbone=True), sparams))
            results["int8_static_mega_tome_r4"] = delta(
                "int8_mega+tom4",
                run(dataclasses.replace(cfg, int8_backbone=True, tome_r=4),
                    sparams))
            os.environ["HYT_GELU"] = "poly"
            try:
                # Transcendental-free polynomial GELU in the MLP
                # megakernel (ops/int8_matmul._gelu_poly_f32): the poly
                # error (1.2e-4 abs) is ~600x below one int8 step of the
                # fc2 quantize, so this arm should match int8_sta_mega.
                results["int8_static_mega_gelu_poly"] = delta(
                    "int8_mega_gelu",
                    run(dataclasses.replace(cfg, int8_backbone=True),
                        sparams))
                # The r3 TPU DEFAULT: full attention-block megakernel
                # (megaproj: proj GEMM + residual fused in-kernel,
                # assets/ab_megaproj_r03.log) + poly-GELU MLP pair. The
                # in-kernel dequant+residual replicates the unfused
                # path's f32 operation order and output-dtype rounding
                # (interpret-mode match at rtol 1e-5, test_int8_fused);
                # on-device bf16 compute still flips int8 round
                # boundaries between the fused and composed forms, so
                # the MPVPE is a fresh ~1.4 mm noise sample (measured
                # 1.3976 vs mega_gelu 1.4849,
                # assets/eval_fastpaths_megaproj_r03.log).
                os.environ["HYT_ATTN"] = "megaproj"
                results["int8_static_megaproj"] = delta(
                    "int8_megaproj",
                    run(dataclasses.replace(cfg, int8_backbone=True),
                        sparams))
                os.environ["HYT_ATTN"] = "megakernel"
            finally:
                os.environ["HYT_GELU"] = "exact"
        finally:
            del os.environ["HYT_ATTN"], os.environ["HYT_INT8_MLP"]
            del os.environ["HYT_GELU"]
        os.environ["HYT_ATTN_BF16"] = "megakernel"
        try:
            results["bf16_mega"] = delta("bf16_mega", run(cfg))
        finally:
            del os.environ["HYT_ATTN_BF16"]

    print(json.dumps(results))


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
