"""KPFusion RGBD training CLI (reference KeypointFusion/train.py).

python tools/train_kpfusion_rgbd.py --steps 200 [--batch 4] [--tiny]
    [--data DIR [--depth-fmt u16|nyu|ho3d|npy]]
    [--out runs/kpfusion_rgbd] [--resume dir|auto] [--devices N]

Data: --data DIR consumes a directory of fixture-style samples
({stem}.png + {stem}_d.png + {stem}.txt 21x3 mm joints; io/rgbd_datasets
— DexYCB/NYU/HO3D depth decode conventions, metric-cube crops, uvd/xyz
label generation per dataloader/loader.py:1097-1205). Without --data,
synthetic batches (plausibly-scaled random, the smoke default). With N
visible devices the batch shards over the "data" mesh.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=8e-4)   # config.py:60
    p.add_argument("--tiny", action="store_true", help="scaled-down net (smoke)")
    p.add_argument("--data", default=None,
                   help="RGB-D sample dir (fixture layout); default synthetic")
    p.add_argument("--depth-fmt", default="auto",
                   choices=["auto", "u16", "nyu", "ho3d", "npy"])
    p.add_argument("--data-format", default="fixture",
                   choices=["fixture", "stb"],
                   help="fixture = {stem}.png + {stem}_d.png + {stem}.txt "
                        "dirs; stb = STB tree ({seq}/SK_color_i.png + "
                        "labels/{seq}_SK.mat)")
    p.add_argument("--augment", action="store_true",
                   help="train-time rot/com/sc augmentation on --data "
                        "samples (reference augmentCrop, aug_para "
                        "[10, 0.2, 180])")
    p.add_argument("--devices", type=int, default=0)
    p.add_argument("--out", default="runs/kpfusion_rgbd")
    p.add_argument("--resume", default=None)
    p.add_argument("--ckpt-every", type=int, default=100)
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from hamer_yolo_tpu.models.kpfusion_rgbd.model import KPFusionConfig
    from hamer_yolo_tpu.parallel.mesh import make_mesh, shard_batch
    from hamer_yolo_tpu.training.train_kpfusion_rgbd import (
        init_train_state, make_optimizer, make_train_step,
        synthetic_rgbd_batch,
    )
    from hamer_yolo_tpu.utils.logging import MetricLogger

    if args.tiny:
        cfg = KPFusionConfig(img_size=32, feature_size=8, dim=32,
                             sample_num=64, num_stages=1, heads=2)
    else:
        cfg = KPFusionConfig()

    tx = make_optimizer(lr=args.lr)
    params, opt_state = init_train_state(jax.random.PRNGKey(0), cfg, tx)
    state = {"params": params, "opt_state": opt_state,
             "step": jnp.zeros((), jnp.int32)}
    resume = latest_checkpoint(args.out) if args.resume == "auto" else args.resume
    if resume and os.path.exists(resume):
        state = load_checkpoint(resume, state)
        print(f"resumed from {resume} at step {int(state['step'])}")

    n_dev = args.devices or len(jax.devices())
    if n_dev > 1 and args.batch % n_dev:
        print(f"batch {args.batch} not divisible by {n_dev} devices; "
              "running single-device")
        n_dev = 1
    mesh = make_mesh(n_data=n_dev, n_model=1) if n_dev > 1 else None
    step_fn = jax.jit(make_train_step(cfg, tx))

    os.makedirs(args.out, exist_ok=True)
    logger = MetricLogger(args.out)
    rng = np.random.default_rng(0)

    batch_iter = None
    if args.data:
        if args.data_format == "stb":
            from hamer_yolo_tpu.io.rgbd_datasets import STBDataset

            ds = STBDataset(args.data, img_size=cfg.img_size,
                            sample_num=cfg.sample_num)
        else:
            from hamer_yolo_tpu.io.rgbd_datasets import (
                RGBDDatasetConfig, RGBDDiskDataset,
            )

            ds = RGBDDiskDataset(
                args.data,
                RGBDDatasetConfig(img_size=cfg.img_size,
                                  sample_num=cfg.sample_num,
                                  depth_fmt=args.depth_fmt))
        print(f"data: {len(ds)} labeled sample(s) from {args.data} "
              f"({args.data_format})")

        def _epochs():
            epoch = 0
            while True:
                yield from ((epoch, b) for b in ds.batches(
                    args.batch, shuffle=True, seed=epoch,
                    augment=args.augment))
                epoch += 1

        batch_iter = _epochs()
    t0 = time.time()
    ctx = jax.set_mesh(mesh) if mesh is not None else None
    if ctx is not None:
        ctx.__enter__()
    try:
        start = int(state["step"])
        params, opt_state = state["params"], state["opt_state"]
        for step in range(start, args.steps):
            if batch_iter is not None:
                epoch, np_batch = next(batch_iter)
                batch = {k: jnp.asarray(v) for k, v in np_batch.items()}
            else:
                batch = {k: jnp.asarray(v) for k, v in
                         synthetic_rgbd_batch(rng, args.batch, cfg).items()}
                # epoch analogue for the spatial-weight gate (train.py:250)
                epoch = step * args.batch // 1000
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            params, opt_state, metrics = step_fn(params, opt_state, batch, epoch)
            if step % args.log_every == 0:
                logger.log(step, {k: float(v) for k, v in metrics.items()})
                print(f"step {step}: loss={float(metrics['loss']):.4f} "
                      f"coord_d={float(metrics['coord_d']):.4f} "
                      f"kfam0={float(metrics['coord_kfam_0']):.4f}")
            if step and step % args.ckpt_every == 0:
                state = {"params": params, "opt_state": opt_state,
                         "step": jnp.asarray(step, jnp.int32)}
                save_checkpoint(os.path.join(args.out, f"ckpt_{step}"), state)
        state = {"params": params, "opt_state": opt_state,
                 "step": jnp.asarray(args.steps, jnp.int32)}
        save_checkpoint(os.path.join(args.out, "ckpt_final"), state)
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
    print(f"done: {args.steps} steps in {time.time() - t0:.0f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
