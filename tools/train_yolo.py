"""YOLOv7 hand-detector training CLI (reference yolov7/train.py equivalent).

python tools/train_yolo.py --data <images_dir> --steps 1000 --batch 16 \
    [--devices N] [--resume ckpt_dir] [--out runs/yolo]

Distribution: with N visible devices the batch is sharded over a "data"
mesh (the DDP/NCCL equivalent — XLA inserts the gradient all-reduce).
Checkpoints (params + EMA + opt state + step) via orbax; --resume
restores and continues (reference --resume / get_latest_run).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    args = p.parse_args()

    import jax
    import numpy as np

    from hamer_yolo_tpu.core.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from hamer_yolo_tpu.io.datasets import YoloDataConfig, yolo_batch_iterator
    from hamer_yolo_tpu.models.yolov7.model import YoloConfig
    from hamer_yolo_tpu.parallel.mesh import make_mesh, shard_batch
    from hamer_yolo_tpu.training.train_yolo import (
        init_yolo_train_state, make_yolo_train_step,
    )

    spec = None
    if args.cfg:
        import dataclasses

        from hamer_yolo_tpu.models.yolov7.yaml_spec import load_yaml_model_cfg

        spec, cfg = load_yaml_model_cfg(args.cfg, nc=args.nc,
                                        training_form=args.aux)
        cfg = dataclasses.replace(cfg, img_size=args.img_size)
    else:
        if args.aux:
            print("--aux requires --cfg pointing at a cfg/training yaml "
                  "with an IAuxDetect head")
            return 2
        cfg = YoloConfig(nc=args.nc, img_size=args.img_size)
    opt_kwargs, loss_kwargs, data_kwargs = {}, {}, {}
    hyp_assigner = None
    if args.hyp:
        from hamer_yolo_tpu.training.hyp import load_hyp_yaml

        opt_kwargs, loss_kwargs, data_kwargs, extras = load_hyp_yaml(args.hyp)
        hyp_assigner = extras.pop("_assigner", None)
        if extras:
            print(f"hyp keys without a counterpart here (ignored): "
                  f"{sorted(extras)}")
    assigner = (args.assigner or hyp_assigner
                or ("simota" if args.aux else "neighbor"))
    ota_topk = 20 if args.aux else 10
    state, tx = init_yolo_train_state(jax.random.PRNGKey(0), cfg, args.steps,
                                      spec=spec, opt_kwargs=opt_kwargs)
    resume = latest_checkpoint(args.out) if args.resume == "auto" else args.resume
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

    os.makedirs(args.out, exist_ok=True)
    from hamer_yolo_tpu.utils.logging import MetricLogger

    logger = MetricLogger(args.out)
    t0 = time.time()
    start = int(state.step)
    for step in range(start, args.steps):
        batch = next(data)
        if args.plots and step == start:
            from hamer_yolo_tpu.utils.plots import plot_images, plot_labels

            tgt = batch["targets"]  # (B, T, 5) [cls, xywh-normalized]
            live = tgt[..., 3] > 0  # padded rows have w == 0
            rows = [np.concatenate([[b], tgt[b, t]])
                    for b, t in zip(*np.nonzero(live))]
            plot_images(batch["img"], np.asarray(rows).reshape(-1, 6),
                        fname=os.path.join(args.out, "train_batch0.jpg"))
            plot_labels(tgt[live], os.path.join(args.out, "labels.png"))
        if mesh is not None:
            with jax.set_mesh(mesh):
                batch = shard_batch(batch, mesh)
                state, metrics = step_fn(state, batch)
        else:
            state, metrics = step_fn(state, batch)
        if step % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            rate = (step - start + 1) * args.batch / (time.time() - t0)
            logger.log(step, m)
            print(f"step {step}: loss={m['loss']:.4f} box={m['box']:.4f} "
                  f"obj={m['obj']:.4f} cls={m['cls']:.4f} ({rate:.1f} img/s)")
        if step and step % args.ckpt_every == 0:
            save_checkpoint(os.path.join(args.out, f"ckpt_{step}"), state)
    save_checkpoint(os.path.join(args.out, "ckpt_final"), state)
    logger.close()
    if args.plots:
        from hamer_yolo_tpu.utils.plots import plot_results

        print(f"curves -> {plot_results(args.out)}")
    print(f"done: {args.steps} steps in {time.time() - t0:.0f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
