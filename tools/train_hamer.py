"""HaMeR training CLI (reference hamer train.py / Lightning DDP equivalent).

python tools/train_hamer.py --steps 100 [--batch 8] [--synthetic]
    [--tars "shards/*.tar"] [--devices N] [--out runs/hamer]

The adversarial two-optimizer step (generator + discriminator) comes from
training/train_hamer.py; DDP = batch sharded over the "data" mesh axis;
TP = ViT weights sharded over "model" when --tp 2 is given.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--synthetic", action="store_true",
                   help="random batches (smoke/scale testing)")
    p.add_argument("--tars", default=None, help="glob of webdataset-style tars")
    p.add_argument("--devices", type=int, default=0)
    p.add_argument("--tp", type=int, default=1, help="model-axis size")
    p.add_argument("--tiny", action="store_true", help="tiny ViT (smoke)")
    p.add_argument("--out", default="runs/hamer")
    p.add_argument("--resume", default=None)
    p.add_argument("--viz-every", type=int, default=100,
                   help="log a skeleton-overlay prediction grid every N "
                        "steps (reference hamer.py tensorboard_logging); "
                        "0 disables")
    p.add_argument("--ckpt-every", type=int, default=50)
    args = p.parse_args()

    import jax

    from hamer_yolo_tpu.core.checkpoint import (
        latest_checkpoint, load_checkpoint, save_checkpoint,
    )
    from hamer_yolo_tpu.core.mano_assets import load_mano_model, synthetic_mano_model
    from hamer_yolo_tpu.models.hamer import HamerConfig
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.models.mano_head import ManoHeadConfig
    from hamer_yolo_tpu.models.vit import ViTConfig
    from hamer_yolo_tpu.parallel.mesh import (
        make_mesh, shard_batch, shard_params, vit_tp_shardings,
    )
    from hamer_yolo_tpu.training.train_hamer import (
        init_train_state, make_train_step, synthetic_batch,
    )

    if args.tiny:
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

    state, (gen_tx, disc_tx) = init_train_state(jax.random.PRNGKey(0), cfg, args.lr)
    resume = latest_checkpoint(args.out) if args.resume == "auto" else args.resume
    if resume and os.path.exists(resume):
        state = load_checkpoint(resume, state)
        print(f"resumed at step {int(state.step)}")

    n_dev = args.devices or len(jax.devices())
    if n_dev > 1 and args.batch % max(n_dev // args.tp, 1):
        print(f"batch {args.batch} not divisible by the data axis "
              f"({n_dev // args.tp}); running single-device")
        n_dev = 1
    mesh = make_mesh(n_data=n_dev // args.tp, n_model=args.tp) if n_dev > 1 else None
    step_fn = jax.jit(make_train_step(mano, cfg, gen_tx, disc_tx))

    if not args.synthetic and not args.tars:
        print("no --tars given; defaulting to --synthetic batches")
        args.synthetic = True

    os.makedirs(args.out, exist_ok=True)
    from hamer_yolo_tpu.utils.logging import MetricLogger

    logger = MetricLogger(args.out)
    viz_fwd = None
    if args.viz_every:
        from hamer_yolo_tpu.models.hamer import hamer_forward

        viz_fwd = jax.jit(lambda p, x: hamer_forward(p, mano, x, cfg)
                          ["pred_keypoints_2d"])
    t0 = time.time()
    key = jax.random.PRNGKey(1)
    ctx = jax.set_mesh(mesh) if mesh is not None else None
    if ctx is not None:
        ctx.__enter__()
        if args.tp > 1:
            state = state._replace(
                params=shard_params(state.params, vit_tp_shardings(state.params, mesh))
            )
    try:
        for step in range(int(state.step), args.steps):
            key, sub = jax.random.split(key)
            batch = synthetic_batch(sub, args.batch, cfg)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            if step % 10 == 0:
                logger.log(step, {k: float(v) for k, v in metrics.items()})
                print(f"step {step}: total={float(metrics['total']):.4f} "
                      f"kp2d={float(metrics['keypoints_2d']):.4f} "
                      f"disc={float(metrics['disc_loss']):.4f}")
            if viz_fwd is not None and step % args.viz_every == 0:
                import numpy as np

                from hamer_yolo_tpu.utils.viz import render_eval_grid

                n = min(8, int(batch["img"].shape[0]))
                crops = np.asarray(batch["img"][:n])
                kp2d = np.asarray(viz_fwd(state.params, batch["img"][:n]))
                S = crops.shape[1]
                # pred_keypoints_2d is crop-normalized [-0.5, 0.5]
                kp_px = (kp2d[:, :, :2] + 0.5) * S
                grid = render_eval_grid(
                    np.clip(crops * 0.25 + 0.5, 0, 1), kp_px)
                logger.log_image(step, "pred_grid", grid)
            if step and step % args.ckpt_every == 0:
                save_checkpoint(os.path.join(args.out, f"ckpt_{step}"), state)
        save_checkpoint(os.path.join(args.out, "ckpt_final"), state)
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
    print(f"done in {time.time() - t0:.0f}s -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
