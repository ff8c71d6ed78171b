"""AOT-export pipeline programs for the C++ PJRT runner / deployment.

The TPU-native replacement for the reference's ONNX/TensorRT export story
(hamer_torch2onnx.py, yolov7/export.py, EngineBuilder): the jitted program
is lowered + compiled ahead of time and the raw PJRT executable is
serialized to disk, alongside:
- <name>.bin        raw serialized executable (PJRT_Executable_DeserializeAndLoad)
- <name>.meta       input arity/dtypes/shapes for the runner
- <name>.stablehlo  portable StableHLO text (re-compilable anywhere)

Usage: python tools/export_executable.py --out exports/ [--model hamer|frame]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export(out_dir: str, model: str = "hamer", hw: str = "720x1280",
           max_hands: int = 4) -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward, init_hamer
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig, infer_frame

    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())

    os.makedirs(out_dir, exist_ok=True)

    if model == "yolo":
        # Detector+NMS engine — the exact counterpart of the reference's
        # TensorRT C++ end2end engine (EfficientNMS baked into the graph).
        from hamer_yolo_tpu.models.yolov7 import YoloConfig, init_yolov7, yolov7_forward
        from hamer_yolo_tpu.ops.nms import non_max_suppression

        ycfg = YoloConfig(nc=3)
        params = jax.jit(lambda k: init_yolov7(k, ycfg))(jax.random.PRNGKey(0))
        params = jax.device_put(params)

        def fn(img):
            pred = yolov7_forward(params, img, ycfg)
            nms = non_max_suppression(pred, 0.25, 0.35, classes=(0, 1, 2),
                                      agnostic=True, max_det=32)
            return nms.boxes, nms.scores, nms.classes, nms.valid

        args = (jnp.zeros((1, 640, 640, 3), jnp.float32),)
        meta = ["f32 1,640,640,3"]
    elif model == "hamer":
        cfg = HamerConfig()
        params = jax.jit(lambda k: init_hamer(k, cfg))(jax.random.PRNGKey(0))
        params = jax.device_put(params)

        def fn(img):
            out = hamer_forward(params, mano, img, cfg)
            return out["pred_vertices"], out["pred_keypoints_3d"], out["pred_cam_t"]

        args = (jnp.zeros((1, 256, 256, 3), jnp.float32),)
        meta = ["f32 1,256,256,3"]
    elif model == "frame":
        H, W = (int(x) for x in hw.split("x"))
        pcfg = PipelineConfig(max_hands=max_hands)
        params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                      yolo_cfg=pcfg.yolo, hamer_cfg=pcfg.hamer,
                                      sar_cfg=pcfg.sar)
        params = jax.device_put(params)

        def fn(image, orig_hw, K):
            out = infer_frame(params, mano, image, orig_hw, K, pcfg)
            return (out["boxes"], out["scores"], out["valid"], out["theta"],
                    out["betas"], out["cam_t"], out["vertices"])

        args = (jnp.zeros((H, W, 3), jnp.float32), jnp.zeros((2,), jnp.float32),
                jnp.zeros((3, 3), jnp.float32))
        meta = [f"f32 {H},{W},3", "f32 2", "f32 3,3"]
    else:
        raise ValueError(model)

    lowered = jax.jit(fn).lower(*args)
    # No StableHLO text dump: weights are baked as constants (engine-style)
    # and serializing them as MLIR text is multi-GB. The .bin executable is
    # the deploy artifact; lowered.as_text() remains available via the API
    # for weight-free programs.
    compiled = lowered.compile()
    payload = compiled.runtime_executable().serialize()
    with open(os.path.join(out_dir, f"{model}.bin"), "wb") as f:
        f.write(payload)
    with open(os.path.join(out_dir, f"{model}.meta"), "w") as f:
        f.write("\n".join(meta) + "\n")
    print(f"exported {model}: {len(payload)} bytes -> {out_dir}/")
    print(f"run: cpp/build/hyt_run <pjrt_plugin.so> {out_dir}/{model}.bin "
          f"{out_dir}/{model}.meta")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="exports")
    p.add_argument("--model", default="hamer", choices=["yolo", "hamer", "frame"])
    p.add_argument("--hw", default="720x1280")
    p.add_argument("--max-hands", type=int, default=4)
    a = p.parse_args()
    export(a.out, a.model, a.hw, a.max_hands)
