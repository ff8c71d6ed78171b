"""One-command real-checkpoint golden loop (VERDICT round-2 item 5).

Runs the REFERENCE pipeline in-process on the given torch checkpoints
(process_batch_manopara, /root/reference/hamer/infer.py:1223-1318),
captures the per-image npy MANO-dict goldens, converts the SAME
checkpoints through core/convert into our jitted pipeline, runs it on the
same images, and emits the MPVPE < 1 mm verdict — so the moment the real
`yolov7_best.pt` / `hamer.ckpt` / `SAR-resnet34-Root.pth` weights appear,
the BASELINE.md gate closes in minutes:

  python tools/golden_capture.py --images <dir> \
      --yolo yolov7_best.pt --hamer hamer.ckpt --model-cfg model_config.yaml \
      --sar SAR-resnet34-Root.pth [--mean-params mano_mean_params.npz] \
      [--intrinsics cam_K.txt] [--out golden_run]

Dry-run mode (no checkpoint args): generates RANDOM weights in each
model's NATIVE checkpoint format (the exact generator used by
tests/test_pipeline_parity.py) and closes the same loop on them —
verifying the tool end-to-end without the real weights. In dry-run the
images are pre-sized to 640x448 so the letterbox is an identity resize,
the reference detector's boxes are pinned into our pipeline, and the
gate runs on ONE image (the BN-calibration image): a random-weight
detector is only numerically stable there — its confidence peaks sit at
the calibrated threshold, so on other images +-1e-6 float noise flips
detections/crops chaotically (65 mm MPVPE swings measured). Real
checkpoints are well-conditioned and use our detections end-to-end over
--max-images images.

Runs on CPU f32 (JAX_PLATFORMS=cpu) for bit-stable comparison — the
<1 mm gate is ALWAYS graded on exact math (compute_dtype=float32 forced
for every model below), never the int8/bf16 bench fast paths; the
verdict JSON records this in its "math" field.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402


def _load_intrinsics(path: str | None) -> np.ndarray:
    if path:
        return np.loadtxt(path, dtype=np.float32).reshape(3, 3)
    return np.array([[906.96, 0.0, 960.0],
                     [0.0, 906.79, 540.0],
                     [0.0, 0.0, 1.0]], np.float32)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="input image dir")
    p.add_argument("--yolo", default=None, help="yolov7_best.pt")
    p.add_argument("--hamer", default=None, help="hamer.ckpt")
    p.add_argument("--model-cfg", default=None,
                   help="HaMeR model_config.yaml (next to the real ckpt)")
    p.add_argument("--sar", default=None, help="SAR-*-Root.pth")
    p.add_argument("--mean-params", default=None,
                   help="mano_mean_params.npz (real asset)")
    p.add_argument("--intrinsics", default=None, help="cam_K.txt (3x3)")
    p.add_argument("--out", default="golden_run")
    p.add_argument("--max-images", type=int, default=4)
    p.add_argument("--conf", type=float, default=None,
                   help="detector conf threshold (default: reference 0.25, "
                        "or the calibrated one in dry-run)")
    p.add_argument("--gate-mm", type=float, default=1.0,
                   help="MPVPE pass gate in mm (BASELINE.md: 1.0)")
    args = p.parse_args()

    # FORCE cpu (not setdefault): sitecustomize pins JAX_PLATFORMS=axon,
    # and hamer_yolo_tpu/__init__ re-applies the env var on first import —
    # a setdefault would let the tool's pipeline silently flip onto the
    # remote TPU mid-run (where random-weight detector conv noise breaks
    # the dry-run parity).
    os.environ["JAX_PLATFORMS"] = "cpu"

    import cv2
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    import ref_pipeline_oracle as R

    if not R.reference_available():
        print("FATAL: reference repo not mounted at /root/reference")
        return 2

    out = os.path.abspath(args.out)
    input_dir = os.path.join(out, "input")
    ref_dir = os.path.join(out, "ref")
    ours_dir = os.path.join(out, "ours")
    for d in (input_dir, ref_dir, ours_dir):
        os.makedirs(d, exist_ok=True)

    # Resolve checkpoint names through the cache-first resolver
    # (utils/downloads.find_weights): `--yolo yolov7_best.pt` works as soon
    # as the file appears anywhere on $HYT_WEIGHTS / the user cache, so the
    # golden gate closes without editing paths.
    from hamer_yolo_tpu.utils.downloads import find_weights
    for attr in ("yolo", "hamer", "model_cfg", "sar", "mean_params"):
        val = getattr(args, attr)
        if val is not None and not os.path.isfile(val):
            resolved = find_weights(val)
            if resolved is None:
                print(f"FATAL: --{attr.replace('_', '-')} {val!r} not found "
                      "(checked the path, $HYT_WEIGHTS, and the user cache)")
                return 2
            setattr(args, attr, resolved)

    dry_run = args.yolo is None
    K = _load_intrinsics(args.intrinsics)

    # ---- stage input images -------------------------------------------------
    names = sorted(f for f in os.listdir(args.images)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if dry_run:
        # dry-run gates on the calibration image only (see docstring)
        names = names[:1]
    names = names[: args.max_images]
    if not names:
        print(f"FATAL: no images in {args.images}")
        return 2
    for n in names:
        img = cv2.imread(os.path.join(args.images, n))
        stem = os.path.splitext(n)[0]
        if dry_run:
            img = cv2.resize(img, (640, 448), interpolation=cv2.INTER_AREA)
        cv2.imwrite(os.path.join(input_dir, stem + ".png"), img)
    print(f"[1/4] staged {len(names)} image(s) -> {input_dir}"
          + (" (640x448, dry-run identity letterbox)" if dry_run else ""))

    # ---- checkpoints --------------------------------------------------------
    conf_thres = 0.25
    if dry_run:
        ck = R.make_checkpoints(
            out, seed=0,
            calibration_image=os.path.join(
                input_dir, os.path.splitext(names[0])[0] + ".png"))
        conf_thres = ck["conf_thres"]
        print(f"[2/4] DRY RUN: random-weight native checkpoints in {out} "
              f"(calibrated conf {conf_thres:.3f})")
    else:
        missing = [a for a in ("hamer", "model_cfg", "sar")
                   if getattr(args, a.replace("-", "_")) is None]
        if missing:
            print(f"FATAL: real-checkpoint mode needs --{' --'.join(missing)}")
            return 2
        # layout the hamer ckpt the way load_hamer expects: the
        # model_config.yaml sits at ckpt/../../model_config.yaml
        hdir = os.path.join(out, "checkpoints", "hamer_ckpt")
        os.makedirs(hdir, exist_ok=True)
        hpath = os.path.join(hdir, "hamer.ckpt")
        shutil.copy(args.hamer, hpath)
        shutil.copy(args.model_cfg,
                    os.path.join(out, "checkpoints", "model_config.yaml"))
        ck = {"yolo": args.yolo, "hamer": hpath, "sar": args.sar,
              "mean_params": args.mean_params or ""}
        if args.mean_params:
            os.environ["HYT_MEAN_PARAMS_NPZ"] = args.mean_params
        print(f"[2/4] real checkpoints: {args.yolo}, {args.hamer}, {args.sar}")
    if args.conf is not None:
        conf_thres = args.conf

    # ---- reference run (the golden capture) --------------------------------
    res = R.run_reference_pipeline(ck, input_dir, ref_dir, K,
                                   conf_thres=conf_thres)
    n_hands_ref = sum(1 for r in res.values() for v in r.values()
                      if v is not None)
    print(f"[3/4] reference captured {len(res)} image(s), "
          f"{n_hands_ref} hand(s) -> {ref_dir}")

    # ---- our pipeline on the converted checkpoints -------------------------
    from dataclasses import replace

    from hamer_yolo_tpu.core.convert import convert_pipeline_checkpoints
    from hamer_yolo_tpu.core.mano_assets import load_mano_model
    from hamer_yolo_tpu.geometry.rotations import aa_to_rotmat
    from hamer_yolo_tpu.io.writers import frame_outputs_to_hand_dicts
    from hamer_yolo_tpu.models.mano import ManoModel, lbs
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig
    from hamer_yolo_tpu.pipeline.runner import FrameProgram

    mano = ManoModel.from_arrays(load_mano_model("right"))
    params = convert_pipeline_checkpoints(
        ck["yolo"], ck["hamer"], ck["sar"],
        template=np.asarray(mano.v_template))
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # Dry-run: pin the reference detector's boxes into our pipeline (the
    # composed-parity-test trick). A RANDOM-weight detector's float noise
    # flips .round() at x.5 boundaries, legitimately changing crops on
    # any image other than the conf-calibration one; pinning the handoff
    # keeps the crop->ViT->head->flip->lift->save comparison exact while
    # still exercising the full composition. Real checkpoints use our
    # own detections end-to-end.
    ref_detector = None
    if dry_run:
        env = R.install_reference_environment()
        ref_detector = env["detector_mod"].Detector(env["yolo_opt"])

    base = PipelineConfig(max_hands=4)
    cfg = replace(
        base, conf_thres=conf_thres,
        yolo=replace(base.yolo, nc=3, compute_dtype="float32"),
        hamer=replace(base.hamer,
                      vit=replace(base.hamer.vit, compute_dtype="float32")),
        sar=replace(base.sar, compute_dtype="float32"),
    )
    prog = FrameProgram(params, mano, cfg)

    from hamer_yolo_tpu.pipeline.frame import infer_frame_with_boxes

    pinned_fn = jax.jit(
        lambda p, im, b, ir, v, hw, Km: infer_frame_with_boxes(
            p, mano, im, b, ir, v, hw, Km, cfg))

    ours = {}
    for n in sorted(os.listdir(input_dir)):
        stem = os.path.splitext(n)[0]
        img = cv2.imread(os.path.join(input_dir, n))
        if ref_detector is not None:
            _, dets_list = ref_detector.detect(img)
            dets = dets_list[0]
            S = cfg.max_hands
            boxes = np.zeros((S, 4), np.float32)
            is_right = np.zeros((S,), np.float32)
            valid = np.zeros((S,), bool)
            for i, (label, coords) in enumerate(dets[:S]):
                boxes[i] = coords
                is_right[i] = float(label == "right")
                valid[i] = True
            h, w = img.shape[:2]
            out_frame = pinned_fn(
                params, jnp.asarray(img.astype(np.float32)),
                jnp.asarray(boxes), jnp.asarray(is_right),
                jnp.asarray(valid), jnp.asarray([h, w], jnp.float32),
                jnp.asarray(K))
            out_frame = jax.tree_util.tree_map(np.asarray, out_frame)
        else:
            out_frame = jax.tree_util.tree_map(
                np.asarray, prog(img.astype(np.float32), K))
        hands = frame_outputs_to_hand_dicts(out_frame, keep="last")
        np.save(os.path.join(ours_dir, stem + ".npy"), hands,
                allow_pickle=True)
        ours[stem] = hands
        nv = int(out_frame["valid"].astype(bool).sum())
        sides = [("right" if r > 0.5 else "left")
                 for r, v in zip(out_frame["is_right"], out_frame["valid"])
                 if v]
        print(f"    ours {stem}: {nv} det(s) {sides} "
              f"scores {np.round(out_frame['scores'][:nv], 3).tolist()}")
    print(f"[4/4] ours: {len(ours)} image(s) -> {ours_dir}")

    # ---- verdict ------------------------------------------------------------
    def verts(hand):
        theta = jnp.asarray(hand["theta"], jnp.float32).reshape(16, 3)
        betas = jnp.asarray(hand["betas"], jnp.float32)[None]
        return np.asarray(lbs(mano, betas, aa_to_rotmat(theta)[None])[0][0])

    rows, worst = [], 0.0
    n_checked = 0
    for stem, want in res.items():
        got = ours.get(stem, {"left": None, "right": None})
        for side in ("left", "right"):
            if want[side] is None:
                if got[side] is not None:
                    rows.append((stem, side, None, "EXTRA-DET"))
                continue
            if got[side] is None:
                rows.append((stem, side, None, "MISSING"))
                worst = float("inf")
                continue
            mpvpe = float(np.linalg.norm(
                verts(want[side]) - verts(got[side]), axis=-1).mean() * 1e3)
            cam_d = float(np.abs(np.asarray(want[side]["cam_t"])
                                 - np.asarray(got[side]["cam_t"])).max())
            rows.append((stem, side, mpvpe, f"cam_t max|d| {cam_d:.2e}"))
            worst = max(worst, mpvpe)
            n_checked += 1

    print()
    for stem, side, mpvpe, note in rows:
        m = f"{mpvpe:8.3f} mm" if mpvpe is not None else "      --   "
        print(f"  {stem:24s} {side:5s} MPVPE {m}  {note}")
    ok = n_checked >= 1 and worst < args.gate_mm
    verdict = {
        "mode": "dry_run" if dry_run else "real_checkpoints",
        # The <1 mm BASELINE.md gate is evaluated on EXACT math — f32 on
        # CPU (cfg forces compute_dtype=float32 for yolo/vit/sar above),
        # never the int8/bf16 bench fast paths. bench.py's default int8
        # config sits at 1.40 mm vs f32 and must not be what the golden
        # gate grades.
        "math": "f32-exact (CPU; fast paths disabled)",
        "images": len(res), "hands_checked": n_checked,
        "worst_mpvpe_mm": None if worst == float("inf") else round(worst, 4),
        "gate_mm": args.gate_mm, "pass": bool(ok),
    }
    with open(os.path.join(out, "verdict.json"), "w") as f:
        json.dump(verdict, f, indent=1)
    print(f"\n{json.dumps(verdict)}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
