"""Per-layer-group attribution for a yaml detector variant (default w6).

bench_variants.py showed yolov7-w6 @1280 as the one variant below the
reference's own V100 number (8.9 vs 7.6 ms/img) while e6/d6/e6e beat
theirs — this tool finds where the time goes. It times PREFIX programs
(walk the spec up to layer k, reduce to a scalar) at a ladder of cut
points and differences consecutive cuts: the ~28 ms dispatch floor and
input upload cancel in the difference, leaving each group's device
time (the CLAUDE.md chain-timing discipline for sub-floor signals).

Usage: python tools/profile_w6.py [--cfg yolov7-w6.yaml] [--size 1280]
       [--batch 32] [--step 8] [--iters 5]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_CFG = "/root/reference/yolo/yolov7/cfg/deploy"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov7-w6.yaml")
    ap.add_argument("--size", type=int, default=1280)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--step", type=int, default=8)
    ap.add_argument("--upto", type=int, default=0,
                    help="profile only spec[:upto] (0 = whole model)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.models.yolov7 import blocks as B
    from hamer_yolo_tpu.models.yolov7.model import (_resolve, _save_set,
                                                    _variants, init_yolov7)
    from hamer_yolo_tpu.models.yolov7.yaml_spec import load_yaml_model_cfg

    spec, cfg = load_yaml_model_cfg(os.path.join(REF_CFG, args.cfg), nc=3)
    params = jax.device_put(init_yolov7(jax.random.PRNGKey(0), cfg,
                                        spec=spec))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, args.size, args.size, 3),
                               np.float32))

    saved = _save_set(spec)

    def prefix(params, x, upto):
        """Walk spec[:upto]; returns a scalar over every live tensor."""
        from hamer_yolo_tpu.core import nn

        y = {}
        out = x.astype(jnp.dtype(cfg.compute_dtype))
        acc = jnp.float32(0)
        for i, (frm, op, a) in enumerate(spec[:upto]):
            srcs = _resolve(frm, i)
            inputs = [out if s == i - 1 else y[s] for s in srcs]
            p = params["layers"][i]
            if op == "C":
                out = B.conv_block(p, inputs[0], s=a[2])
            elif op == "MP":
                out = B.mp(inputs[0])
            elif op == "CAT":
                out = jnp.concatenate(inputs, axis=-1)
            elif op == "ADD":
                out = inputs[0] + inputs[1]
            elif op == "SPP":
                out = B.sppcspc(p, inputs[0])
            elif op == "UP":
                out = B.upsample2x(inputs[0])
            elif op == "REORG":
                out = B.reorg(inputs[0])
            elif op == "SP_":
                out = B.sp(inputs[0], a[0] if a else 3)
            elif op == "DOWNC":
                q = B.conv_block(p["cv2"], B.conv_block(p["cv1"], inputs[0]),
                                 s=2)
                b2 = B.conv_block(p["cv3"], B.mp(inputs[0]))
                out = jnp.concatenate([q, b2], axis=-1)
            elif op == "REP":
                out = B.repconv(p, inputs[0], s=a[1] if len(a) > 1 else 1)
            elif op in _variants().VARIANT_OPS:
                out = _variants().apply_variant(op, p, inputs[0], a)
            elif op in ("DET", "BIN", "AUXDET", "KPT"):
                for head_p, inp in zip(p["m"], inputs[: len(p["m"])]):
                    acc = acc + jnp.sum(
                        nn.conv2d(head_p, inp, stride=1, padding=0)
                        .astype(jnp.float32))
                out = inputs[-1]
            if i in saved:
                y[i] = out
        # Sum every live tensor: a saved tap consumed only BEYOND the cut
        # would otherwise be dead code and its producer group would be
        # attributed to a later cut. The extra reduce re-reads saved maps
        # (~1 ms noise per group at b32/1280) — acceptable for finding
        # multi-ms outliers.
        for v in y.values():
            acc = acc + jnp.sum(v.astype(jnp.float32))
        return acc + jnp.sum(out.astype(jnp.float32))

    last = args.upto if args.upto else len(spec)
    cuts = list(range(args.step, last, args.step)) + [last]
    times = {0: 0.0}
    prev = 0.0
    print(f"{args.cfg}: {len(spec)} layers, {len(cuts)} cuts", flush=True)
    for k in cuts:
        fn = jax.jit(lambda p, xx, k=k: prefix(p, xx, k))
        float(fn(params, x))  # compile
        lat = []
        for _ in range(args.iters):
            t0 = time.time()
            float(fn(params, x))
            lat.append(time.time() - t0)
        t = float(np.percentile(lat, 50))
        grp_ms = (t - prev) * 1e3
        ops = [f"{i}:{spec[i][1]}" for i in range(k - args.step
                                                  if k - args.step > 0 else 0,
                                                  k)]
        # shape note for the group's last layer
        print(f"cut {k:3d}: total {t*1e3:7.1f} ms  group {grp_ms:+7.1f} ms  "
              f"[{' '.join(o.split(':')[1] for o in ops)}]", flush=True)
        times[k] = t
        prev = t

    full = times[cuts[-1]]
    print(json.dumps({
        "cfg": args.cfg, "batch": args.batch, "size": args.size,
        "full_prefix_ms": round(full * 1e3, 1),
        "ms_per_img": round(full / args.batch * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
