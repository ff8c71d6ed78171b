"""Numerical parity checker (the compare_pytorch_onnx equivalent).

The reference validates its exported runtimes against PyTorch with
np.allclose at atol/rtol 1e-3 over named outputs (hamer/infer.py:674-736,
hamer_torch2onnx.py:70-123). This tool provides the same contract for this
framework:

  capture   run a model on given inputs, save named outputs to .npz
  compare   re-run and compare against a captured .npz (allclose 1e-3,
            printing per-output max abs/rel diffs)

Typical uses: CPU-vs-TPU parity, pre/post-refactor regression pinning,
and — when reference torch checkpoints are available — converted-weight
golden checks against reference-captured npz fixtures.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HAMER_OUTPUT_NAMES = (
    "pred_cam", "pred_cam_t", "focal_length", "pred_keypoints_3d",
    "pred_vertices", "pred_keypoints_2d", "betas",
)


def build_hamer(seed: int = 0, tiny: bool = False):
    import jax

    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward, init_hamer
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
    from hamer_yolo_tpu.models.vit import ViTConfig

    if tiny:
        cfg = HamerConfig(
            image_size=64, crop_margin=8,
            vit=ViTConfig(img_size=(64, 48), embed_dim=64, depth=2, num_heads=4,
                          compute_dtype="float32"),
            head=ManoHeadConfig(dim=32, context_dim=64, depth=2, heads=2,
                                dim_head=8, mlp_dim=32),
        )
    else:
        cfg = HamerConfig()
    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    params = jax.jit(lambda k: init_hamer(k, cfg))(jax.random.PRNGKey(seed))

    def fn(img):
        out = hamer_forward(params, mano, img, cfg)
        return {k: out[k] for k in HAMER_OUTPUT_NAMES if k in out} | {
            "betas": out["betas"]
        }

    return fn, cfg


def cmd_capture(args) -> int:
    import jax.numpy as jnp

    fn, cfg = build_hamer(args.seed, args.tiny)
    rng = np.random.default_rng(args.seed)
    img = rng.normal(size=(args.batch, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    out = fn(jnp.asarray(img))
    np.savez(args.path, __input__=img,
             **{k: np.asarray(v) for k, v in out.items()})
    print(f"captured {len(out)} outputs -> {args.path}")
    return 0


def cmd_compare(args) -> int:
    import jax.numpy as jnp

    data = np.load(args.path)
    fn, cfg = build_hamer(args.seed, args.tiny)
    out = fn(jnp.asarray(data["__input__"]))
    failures = 0
    for k in data.files:
        if k == "__input__":
            continue
        got = np.asarray(out[k])
        ref = data[k]
        max_abs = float(np.abs(got - ref).max())
        denom = np.maximum(np.abs(ref), 1e-6)
        max_rel = float((np.abs(got - ref) / denom).max())
        ok = np.allclose(got, ref, atol=args.atol, rtol=args.rtol)
        print(f"{k:<22s} max_abs={max_abs:.2e} max_rel={max_rel:.2e} "
              f"{'OK' if ok else 'FAIL'}")
        failures += 0 if ok else 1
    if failures:
        print(f"{failures} output(s) out of tolerance")
        return 1
    print("all outputs within tolerance")
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("capture", cmd_capture), ("compare", cmd_compare)):
        sp = sub.add_parser(name)
        sp.add_argument("path")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--batch", type=int, default=1)
        sp.add_argument("--tiny", action="store_true")
        sp.add_argument("--atol", type=float, default=1e-3)
        sp.add_argument("--rtol", type=float, default=1e-3)
        sp.set_defaults(fn=fn)
    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
