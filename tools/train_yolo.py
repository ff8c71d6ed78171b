"""YOLOv7 hand-detector training CLI (reference yolov7/train.py equivalent).

python tools/train_yolo.py --data <images_dir> --steps 1000 --batch 16 \
    [--devices N] [--resume ckpt_dir] [--out runs/yolo] [--evolve N]

Distribution: with N visible devices the batch is sharded over a "data"
mesh (the DDP/NCCL equivalent — XLA inserts the gradient all-reduce).
Checkpoints (params + EMA + opt state + step) via orbax; --resume
restores and continues (reference --resume / get_latest_run).

--evolve N runs N generations of genetic hyperparameter evolution
(reference train.py:590-700): each generation trains a FRESH model for
--steps steps under a mutated hyp candidate (training/evolve.py META
gains/limits), evaluates COCO mAP on --data (conf 0.001 / iou 0.65,
test.py settings), and appends to <out>/evolve.txt; the best hyp lands
in <out>/hyp_evolved.yaml. No checkpoints are saved per generation
(the reference sets nosave/notest).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train_loop(args, spec, cfg, opt_kwargs, loss_kwargs, data_kwargs,
                assigner, ota_topk, out, save_ckpts=True, plots=False,
                resume=None, quiet=False, seed=0):
    """One training run; returns (final EMA-bearing state, last metrics)."""
    import jax
    import numpy as np

    from hamer_yolo_tpu.core.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from hamer_yolo_tpu.io.datasets import YoloDataConfig, yolo_batch_iterator
    from hamer_yolo_tpu.parallel.mesh import make_mesh, shard_batch
    from hamer_yolo_tpu.training.train_yolo import (
        init_yolo_train_state, make_yolo_train_step,
    )
    from hamer_yolo_tpu.utils.logging import MetricLogger

    state, tx = init_yolo_train_state(jax.random.PRNGKey(seed), cfg,
                                      args.steps, spec=spec,
                                      opt_kwargs=opt_kwargs)
    resume = latest_checkpoint(out) if resume == "auto" else resume
    if resume and os.path.exists(resume):
        state = load_checkpoint(resume, state)
        print(f"resumed from {resume} at step {int(state.step)}")

    n_dev = args.devices or len(jax.devices())
    if n_dev > 1 and args.batch % n_dev:
        print(f"batch {args.batch} not divisible by {n_dev} devices; "
              "running single-device")
        n_dev = 1
    mesh = make_mesh(n_data=n_dev, n_model=1) if n_dev > 1 else None
    step_fn = jax.jit(make_yolo_train_step(cfg, tx, spec=spec,
                                           assigner=assigner,
                                           ota_topk=ota_topk,
                                           loss_kwargs=loss_kwargs))

    data_cfg = YoloDataConfig(img_size=args.img_size, **data_kwargs)
    data = yolo_batch_iterator(args.data, args.batch, data_cfg,
                               label_dir=args.labels)

    os.makedirs(out, exist_ok=True)
    logger = MetricLogger(out) if not quiet else None
    t0 = time.time()
    start = int(state.step)
    m = {}
    for step in range(start, args.steps):
        batch = next(data)
        if plots and step == start:
            from hamer_yolo_tpu.utils.plots import plot_images, plot_labels

            tgt = batch["targets"]  # (B, T, 5) [cls, xywh-normalized]
            live = tgt[..., 3] > 0  # padded rows have w == 0
            rows = [np.concatenate([[b], tgt[b, t]])
                    for b, t in zip(*np.nonzero(live))]
            plot_images(batch["img"], np.asarray(rows).reshape(-1, 6),
                        fname=os.path.join(out, "train_batch0.jpg"))
            plot_labels(tgt[live], os.path.join(out, "labels.png"))
        if mesh is not None:
            with jax.set_mesh(mesh):
                batch = shard_batch(batch, mesh)
                state, metrics = step_fn(state, batch)
        else:
            state, metrics = step_fn(state, batch)
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (step - start + 1) * args.batch / (time.time() - t0)
            if logger is not None:
                logger.log(step, m)
            if not quiet:
                print(f"step {step}: loss={m['loss']:.4f} box={m['box']:.4f} "
                      f"obj={m['obj']:.4f} cls={m['cls']:.4f} "
                      f"({rate:.1f} img/s)")
        if save_ckpts and step and step % args.ckpt_every == 0:
            save_checkpoint(os.path.join(out, f"ckpt_{step}"), state)
    if save_ckpts:
        save_checkpoint(os.path.join(out, "ckpt_final"), state)
    if logger is not None:
        logger.close()
    return state, m


def _eval_map(args, cfg, spec, params, conf=0.001, iou=0.65):
    """COCO mAP over the labeled --data dir (test.py harness settings).

    Returns (mP, mR, mAP@.5, mAP@.5:.95) — the fitness inputs. Shared
    loop with tools/eval_detector.py (utils/detect_eval.py).
    """
    from hamer_yolo_tpu.io.datasets import image_label_pairs
    from hamer_yolo_tpu.utils.detect_eval import detector_map

    return detector_map(params, cfg, image_label_pairs(args.data, args.labels),
                        spec=spec, conf=conf, iou=iou, img_size=args.img_size)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="images dir (labels dir sibling)")
    p.add_argument("--labels", default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--nc", type=int, default=3)
    p.add_argument("--devices", type=int, default=0, help="0 = all visible")
    p.add_argument("--out", default="runs/yolo")
    p.add_argument("--resume", default=None)
    p.add_argument("--ckpt-every", type=int, default=200)
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--cfg", default=None,
                   help="reference model yaml (cfg/deploy or cfg/training); "
                        "default = built-in yolov7 spec")
    p.add_argument("--aux", action="store_true",
                   help="train_aux.py mode: keep IAuxDetect aux heads "
                        "(requires a cfg/training/*.yaml via --cfg) and use "
                        "the ComputeLossAuxOTA-equivalent loss (simota, "
                        "topk 20)")
    p.add_argument("--assigner", default=None,
                   choices=["neighbor", "simota"],
                   help="label assigner (default: neighbor; simota for OTA)")
    p.add_argument("--hyp", default=None, metavar="YAML",
                   help="reference hyp yaml (data/hyp.scratch.*.yaml): "
                        "lr/momentum/wd, box/cls/obj gains, aug params, "
                        "loss_ota -> simota assigner")
    p.add_argument("--plots", action="store_true",
                   help="save train_batch0.jpg mosaic + labels.png at start "
                        "and results.png curves at the end (reference "
                        "train.py plot_images/plot_labels/plot_results)")
    p.add_argument("--evolve", type=int, default=0, metavar="N",
                   help="genetic hyp evolution for N generations "
                        "(train.py:590-700); writes <out>/evolve.txt + "
                        "hyp_evolved.yaml")
    p.add_argument("--evolve-seed", type=int, default=0)
    args = p.parse_args()

    import jax  # noqa: F401  (backend init before any model building)

    spec = None
    if args.cfg:
        import dataclasses

        from hamer_yolo_tpu.models.yolov7.yaml_spec import load_yaml_model_cfg

        spec, cfg = load_yaml_model_cfg(args.cfg, nc=args.nc,
                                        training_form=args.aux)
        cfg = dataclasses.replace(cfg, img_size=args.img_size)
    else:
        from hamer_yolo_tpu.models.yolov7.model import YoloConfig

        if args.aux:
            print("--aux requires --cfg pointing at a cfg/training yaml "
                  "with an IAuxDetect head")
            return 2
        cfg = YoloConfig(nc=args.nc, img_size=args.img_size)

    hyp0 = {}
    opt_kwargs, loss_kwargs, data_kwargs = {}, {}, {}
    hyp_assigner = None
    if args.hyp:
        import yaml as _yaml

        from hamer_yolo_tpu.training.hyp import load_hyp_yaml

        with open(args.hyp) as f:
            hyp0 = _yaml.safe_load(f) or {}
        opt_kwargs, loss_kwargs, data_kwargs, extras = load_hyp_yaml(args.hyp)
        hyp_assigner = extras.pop("_assigner", None)
        if extras:
            print(f"hyp keys without a counterpart here (ignored): "
                  f"{sorted(extras)}")
    assigner = (args.assigner or hyp_assigner
                or ("simota" if args.aux else "neighbor"))
    ota_topk = 20 if args.aux else 10

    if args.evolve:
        from hamer_yolo_tpu.training.evolve import evolve
        from hamer_yolo_tpu.training.hyp import map_hyp

        def train_and_eval(hyp, gen):
            okw, lkw, dkw, _ = map_hyp(hyp)
            state, m = _train_loop(
                args, spec, cfg, okw, lkw, dkw, assigner, ota_topk,
                out=os.path.join(args.out, f"gen_{gen}"),
                save_ckpts=False, quiet=True, seed=gen)
            ema_params = state.ema.params if hasattr(state, "ema") else state.params
            mp, mr, map50, mmap = _eval_map(args, cfg, spec, ema_params)
            return (mp, mr, map50, mmap,
                    m.get("box", 0.0), m.get("obj", 0.0), m.get("cls", 0.0))

        best = evolve(train_and_eval, args.evolve, args.out, hyp0=hyp0,
                      seed=args.evolve_seed)
        print(f"best hyp -> {os.path.join(args.out, 'hyp_evolved.yaml')}")
        print({k: round(v, 5) for k, v in list(best.items())[:8]})
        return 0

    t0 = time.time()
    _train_loop(args, spec, cfg, opt_kwargs, loss_kwargs, data_kwargs,
                assigner, ota_topk, out=args.out, save_ckpts=True,
                plots=args.plots, resume=args.resume)
    if args.plots:
        from hamer_yolo_tpu.utils.plots import plot_results

        print(f"curves -> {plot_results(args.out)}")
    print(f"done: {args.steps} steps in {time.time() - t0:.0f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
