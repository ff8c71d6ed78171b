"""HaMeR evaluation CLI: MPJPE / PA-MPJPE / MPVPE over prediction dirs.

Parity: reference Evaluator wiring (hamer/hamer/utils/pose_utils.py:89-225,
validation_step logging) as a standalone tool. Two modes:

  npy mode    compare two dirs of per-image .npy hand dicts (ours vs a
              reference capture) -> parameter-space and mesh-space errors
              (the BASELINE MPVPE<1mm parity check once reference outputs
              are available);
  npz mode    compare joints/vertices arrays saved as npz (pred vs gt).

python tools/eval_hamer.py npy --pred out/ --ref ref_out/
python tools/eval_hamer.py npz --pred pred.npz --ref gt.npz
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_npy(args) -> int:
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.io.writers import load_hand_npy
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.reconstruct import _mano_from_aa_fn
    from hamer_yolo_tpu.utils.metrics import Evaluator, mpvpe

    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())
    mano_fn = _mano_from_aa_fn(mano)

    ev = Evaluator()
    param_diffs = {"theta": [], "betas": [], "cam_t": []}
    n = 0
    for f in sorted(os.listdir(args.pred)):
        if not f.endswith(".npy"):
            continue
        ref_path = os.path.join(args.ref, f)
        if not os.path.exists(ref_path):
            continue
        pred = load_hand_npy(os.path.join(args.pred, f))
        ref = load_hand_npy(ref_path)
        for side in ("left", "right"):
            p, r = pred.get(side), ref.get(side)
            if p is None or r is None:
                continue
            for k in param_diffs:
                param_diffs[k].append(np.abs(p[k] - r[k]).max())
            vp = np.asarray(mano_fn(jnp.asarray(p["theta"], jnp.float32),
                                    jnp.asarray(p["betas"], jnp.float32),
                                    jnp.asarray(p["cam_t"], jnp.float32)))
            vr = np.asarray(mano_fn(jnp.asarray(r["theta"], jnp.float32),
                                    jnp.asarray(r["betas"], jnp.float32),
                                    jnp.asarray(r["cam_t"], jnp.float32)))
            ev.mpvpe_all.append(mpvpe(vp[None], vr[None]))
            n += 1
    if n == 0:
        print("no overlapping hands found")
        return 1
    mm = float(np.concatenate(ev.mpvpe_all).mean() * 1000.0)
    print(f"hands compared: {n}")
    for k, v in param_diffs.items():
        print(f"max |d{k}|: {np.max(v):.5f}")
    print(f"MPVPE: {mm:.3f} mm  ({'PASS' if mm < args.mpvpe_mm else 'FAIL'} "
          f"@ {args.mpvpe_mm} mm)")
    return 0 if mm < args.mpvpe_mm else 1


def cmd_npz(args) -> int:
    from hamer_yolo_tpu.utils.metrics import Evaluator

    pred = np.load(args.pred)
    ref = np.load(args.ref)
    ev = Evaluator()
    ev.update(pred["joints"], ref["joints"],
              pred.get("vertices"), ref.get("vertices"))
    for k, v in ev.results().items():
        print(f"{k}: {v:.3f}")
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    a = sub.add_parser("npy")
    a.add_argument("--pred", required=True)
    a.add_argument("--ref", required=True)
    a.add_argument("--mpvpe-mm", type=float, default=1.0)
    a.set_defaults(fn=cmd_npy)
    b = sub.add_parser("npz")
    b.add_argument("--pred", required=True)
    b.add_argument("--ref", required=True)
    b.set_defaults(fn=cmd_npz)
    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
