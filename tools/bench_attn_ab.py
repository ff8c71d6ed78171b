"""Interleaved e2e A/B: einsum vs Pallas attention in the int8 pipeline.

The device-attributed profile (tools/profile_int8_vit.py) says the fused
single-block attention kernel saves ~32 ms per 256 crops on the static
int8 path, but back-to-back bench.py runs 20 min apart said the
opposite. Dispatch overhead on the axon tunnel drifts on wall-clock
timescales, so this tool compiles BOTH full-batch pipeline programs in
one process and times them interleaved (A B A B ...) — drift hits both
arms equally.

  python tools/bench_attn_ab.py [batch] [iters]

Env: BENCH_AB_INT8 (1), BENCH_AB_ARMS (comma list), BENCH_AB_TOME
(0; r-per-layer token merging so the ToMe-path kernel engagement can
be qualified the same interleaved way).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hamer_yolo_tpu.core.checkpoint import init_pipeline_params
    from hamer_yolo_tpu.core.mano_assets import (load_mano_model,
                                                 synthetic_mano_model)
    from hamer_yolo_tpu.core.quant import (attach_static_act_scales,
                                           collect_vit_act_stats,
                                           quantize_vit_params)
    from hamer_yolo_tpu.models.mano import ManoModel
    from hamer_yolo_tpu.pipeline.frame import PipelineConfig, infer_frame

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    H, W = 720, 1280

    import dataclasses

    use_int8 = os.environ.get("BENCH_AB_INT8", "1") == "1"
    tome_r = int(os.environ.get("BENCH_AB_TOME", "0"))
    cfg = PipelineConfig(max_hands=2)
    cfg = dataclasses.replace(
        cfg, hamer=dataclasses.replace(cfg.hamer, int8_backbone=use_int8,
                                       tome_r=tome_r))
    try:
        mano = ManoModel.from_arrays(load_mano_model("right"))
    except Exception:
        mano = ManoModel.from_arrays(synthetic_mano_model())

    params = init_pipeline_params(jax.random.PRNGKey(0), mano,
                                  yolo_cfg=cfg.yolo, hamer_cfg=cfg.hamer,
                                  sar_cfg=cfg.sar)
    if use_int8:
        params["hamer"]["backbone"] = jax.jit(quantize_vit_params)(
            params["hamer"]["backbone"])
        crng = np.random.default_rng(1)
        calib = jnp.asarray(crng.standard_normal((8, 256, 192, 3)),
                            jnp.float32)
        stats = jax.jit(lambda p, x: collect_vit_act_stats(
            p, x, cfg.hamer.vit))(params["hamer"]["backbone"], calib)
        params["hamer"]["backbone"] = attach_static_act_scales(
            params["hamer"]["backbone"], stats)
    params = jax.device_put(params)

    def checksum(out):
        keys = ("boxes", "scores", "valid", "betas", "theta", "cam_t",
                "vertices", "root_depth")
        return sum(jnp.sum(out[k].astype(jnp.float32)) for k in keys)

    def make(attn_impl):
        @jax.jit
        def run(p, images, hws, Ks):
            return sum(jax.vmap(
                lambda i, hw, k: checksum(infer_frame(
                    p, mano, i, hw, k, cfg, attn_impl=attn_impl))
            )(images, hws, Ks))
        return run

    def make_frames():
        # the DEPLOYED program shape (bench.py runs infer_frames):
        # stage-batched detector; HYT_STAGE_BATCH_HAMER in the arm env
        # additionally stage-batches the backbone (read at trace time)
        from hamer_yolo_tpu.pipeline.frame import infer_frames

        @jax.jit
        def run(p, images, hws, Ks):
            return checksum(infer_frames(p, mano, images, hws, Ks, cfg))
        return run

    # int8 path only truth-tests attn_impl (models/hamer.py:91) -> any
    # non-None sentinel selects the custom_vmap Pallas kernel. Arms can
    # also be selected via HYT_ATTN / HYT_ATTN_PREQUANT, which the quant
    # path reads at TRACE time — set just before each arm's compile call.
    # BENCH_AB_ARMS: comma list. For BENCH_AB_INT8=0 (exact bf16) only
    # einsum/direct/fusedqkv apply: fast_mha reads HYT_ATTN;
    # prequant/pallas are int8-path mechanisms.
    wanted = os.environ.get(
        "BENCH_AB_ARMS",
        "einsum,direct,prequant,fusedqkv,prequant_fq,mega,mega_mlp"
        if use_int8
        else "einsum,direct,fusedqkv,mega_bf16").split(",")
    arm_defs = {
        "einsum": (None, {"HYT_ATTN": "xla"}),
        "pallas": ("pallas", {"HYT_ATTN_PREQUANT": "0"}),
        "direct": (None, {"HYT_ATTN": "pallas_direct",
                          "HYT_ATTN_PREQUANT": "0"}),
        "fusedqkv": (None, {"HYT_ATTN": "pallas_fusedqkv",
                            "HYT_ATTN_PREQUANT": "0"}),
        "prequant": (None, {}),  # the TPU default path
        "prequant_fq": (None, {"HYT_ATTN": "pallas_fusedqkv"}),
        # LN+quantize+qkv GEMM+attention+epilogue in one pallas_call
        # (needs static scales; int8-only)
        "mega": (None, {"HYT_ATTN": "megakernel", "HYT_GELU": "exact"}),
        # + resident-weight MLP megakernel pair on top (exact-erf GELU
        # pinned: poly is the TPU default since its qualification)
        "mega_mlp": (None, {"HYT_ATTN": "megakernel",
                            "HYT_INT8_MLP": "megakernel",
                            "HYT_GELU": "exact"}),
        # + the transcendental-free polynomial GELU in the MLP
        # megakernel (HYT_GELU=poly; fc1's fat GELU is the dominant
        # non-MXU VPU cost at 256 crops)
        "mega_gelu": (None, {"HYT_ATTN": "megakernel",
                             "HYT_INT8_MLP": "megakernel",
                             "HYT_GELU": "poly"}),
        # grouped-GEMM qkv in the attn-only megakernel (the ToMe path's
        # attention form; bit-identical, perf-only)
        "mega_gelu_g2": (None, {"HYT_ATTN": "megakernel",
                                "HYT_INT8_MLP": "megakernel",
                                "HYT_GELU": "poly",
                                "HYT_ATTN_MEGA_G": "2"}),
        # tm sweep of the MLP megakernel on top of the poly GELU
        "mega_gelu_tm192": (None, {"HYT_ATTN": "megakernel",
                                   "HYT_INT8_MLP": "megakernel",
                                   "HYT_GELU": "poly",
                                   "HYT_INT8_MLP_TM": "192"}),
        "mega_gelu_tm256": (None, {"HYT_ATTN": "megakernel",
                                   "HYT_INT8_MLP": "megakernel",
                                   "HYT_GELU": "poly",
                                   "HYT_INT8_MLP_TM": "256"}),
        # exact-path fused LN+QKV+attention block (bf16 mode only)
        "mega_bf16": (None, {"HYT_ATTN_BF16": "megakernel"}),
        # grouped-GEMM form: LN+qkv GEMM flattened over (G*192) rows
        # per grid step (bit-identical, perf-only)
        "mega_bf16_g2": (None, {"HYT_ATTN_BF16": "megakernel",
                                "HYT_ATTN_BF16_G": "2"}),
        "mega_bf16_g4": (None, {"HYT_ATTN_BF16": "megakernel",
                                "HYT_ATTN_BF16_G": "4"}),
        # FULL attention-block megakernel (LN+quantize+qkv+attention+
        # quantize+PROJ+residual in one pallas_call) on top of the
        # poly-GELU MLP pair default
        "megaproj": (None, {"HYT_ATTN": "megaproj",
                            "HYT_INT8_MLP": "megakernel",
                            "HYT_GELU": "poly"}),
        # SINGLE-CALL MLP megakernel (fc1+GELU+fc2+residual, both
        # weights resident, GELU tensor never in HBM) under the current
        # attention megakernel default
        "mega1": (None, {"HYT_ATTN": "megakernel",
                         "HYT_INT8_MLP": "megakernel1",
                         "HYT_GELU": "poly"}),
        # both new engagements together
        "megaproj1": (None, {"HYT_ATTN": "megaproj",
                             "HYT_INT8_MLP": "megakernel1",
                             "HYT_GELU": "poly"}),
        # mega1 tile sweeps (VMEM pressure pricing)
        "mega1_tm192": (None, {"HYT_ATTN": "megakernel",
                               "HYT_INT8_MLP": "megakernel1",
                               "HYT_GELU": "poly",
                               "HYT_INT8_MLP_TM": "192"}),
        "mega1_hc2560": (None, {"HYT_ATTN": "megakernel",
                                "HYT_INT8_MLP": "megakernel1",
                                "HYT_GELU": "poly",
                                "HYT_INT8_MLP_HC": "2560"}),
        # best-tile single-call MLP under the qualified megaproj
        # attention (tm192 matches the pair's qualified tile; hc2560
        # halves the chunked fc2 partial-sum revisits)
        "megaproj1_t192h2560": (None, {"HYT_ATTN": "megaproj",
                                       "HYT_INT8_MLP": "megakernel1",
                                       "HYT_GELU": "poly",
                                       "HYT_INT8_MLP_TM": "192",
                                       "HYT_INT8_MLP_HC": "2560"}),
        "megaproj1_t192h5120": (None, {"HYT_ATTN": "megaproj",
                                       "HYT_INT8_MLP": "megakernel1",
                                       "HYT_GELU": "poly",
                                       "HYT_INT8_MLP_TM": "192",
                                       "HYT_INT8_MLP_HC": "5120"}),
        # megaproj crops-per-grid-step sweep: the qkv/proj GEMMs run
        # flattened over (G*192) rows — taller M lifts the in-kernel
        # int8 dot rate; output bit-identical across G (perf-only knob)
        "megaproj_g2": (None, {"HYT_ATTN": "megaproj",
                               "HYT_INT8_MLP": "megakernel",
                               "HYT_GELU": "poly",
                               "HYT_ATTN_MEGAPROJ_G": "2"}),
        "megaproj_g4": (None, {"HYT_ATTN": "megaproj",
                               "HYT_INT8_MLP": "megakernel",
                               "HYT_GELU": "poly",
                               "HYT_ATTN_MEGAPROJ_G": "4"}),
        "megaproj_g8": (None, {"HYT_ATTN": "megaproj",
                               "HYT_INT8_MLP": "megakernel",
                               "HYT_GELU": "poly",
                               "HYT_ATTN_MEGAPROJ_G": "8"}),
        # ----- frames-program arms (infer_frames, the bench.py shape:
        # stage-batched detector). "fr" = per-frame-vmapped backbone
        # (current default); "sb_*" = HYT_STAGE_BATCH_HAMER=1 runs all
        # B*S crops through ONE hamer_forward — the megakernel grid can
        # then group G>S crops per step (vmap caps G at S=2).
        "fr": (None, {"HYT_ATTN": "megaproj", "HYT_INT8_MLP": "megakernel",
                      "HYT_GELU": "poly"}, "frames"),
        # exp2 softmax inside the megaproj kernel: log2e folded into the
        # q prescale, exp2 on the logits — deletes one VPU multiply pass
        # over every (N, N) logit tensor (same softmax, f32-rounding
        # resample)
        "fr_exp2": (None, {"HYT_ATTN": "megaproj",
                           "HYT_INT8_MLP": "megakernel",
                           "HYT_GELU": "poly",
                           "HYT_SOFTMAX": "exp2"}, "frames"),
        # exp2 + softmax normalization folded PAST the p*v dot: the
        # (N, N) broadcast-multiply by 1/sum becomes an (N, hd) multiply
        # merged into the quantize prescale
        "fr_exp2p": (None, {"HYT_ATTN": "megaproj",
                            "HYT_INT8_MLP": "megakernel",
                            "HYT_GELU": "poly",
                            "HYT_SOFTMAX": "exp2p"}, "frames"),
        # int8 attention math: the two per-head dots on the int8 MXU
        # (2x bf16 rate) with dynamic in-VMEM tile scales
        "fr_qk8": (None, {"HYT_ATTN": "megaproj",
                          "HYT_INT8_MLP": "megakernel",
                          "HYT_GELU": "poly",
                          "HYT_ATTN_MATH": "int8"}, "frames"),
        "sb_g2": (None, {"HYT_ATTN": "megaproj",
                         "HYT_INT8_MLP": "megakernel", "HYT_GELU": "poly",
                         "HYT_STAGE_BATCH_HAMER": "1",
                         "HYT_ATTN_MEGAPROJ_G": "2"}, "frames"),
        "sb_g4": (None, {"HYT_ATTN": "megaproj",
                         "HYT_INT8_MLP": "megakernel", "HYT_GELU": "poly",
                         "HYT_STAGE_BATCH_HAMER": "1",
                         "HYT_ATTN_MEGAPROJ_G": "4"}, "frames"),
        "sb_g8": (None, {"HYT_ATTN": "megaproj",
                         "HYT_INT8_MLP": "megakernel", "HYT_GELU": "poly",
                         "HYT_STAGE_BATCH_HAMER": "1",
                         "HYT_ATTN_MEGAPROJ_G": "8"}, "frames"),
        "sb_g16": (None, {"HYT_ATTN": "megaproj",
                          "HYT_INT8_MLP": "megakernel", "HYT_GELU": "poly",
                          "HYT_STAGE_BATCH_HAMER": "1",
                          "HYT_ATTN_MEGAPROJ_G": "16"}, "frames"),
        # exact-bf16 frames arms (run with BENCH_AB_INT8=0)
        "fr_bf16": (None, {"HYT_ATTN_BF16": "megakernel"}, "frames"),
        "sb_bf16_g2": (None, {"HYT_ATTN_BF16": "megakernel",
                              "HYT_STAGE_BATCH_HAMER": "1",
                              "HYT_ATTN_BF16_G": "2"}, "frames"),
        "sb_bf16_g4": (None, {"HYT_ATTN_BF16": "megakernel",
                              "HYT_STAGE_BATCH_HAMER": "1",
                              "HYT_ATTN_BF16_G": "4"}, "frames"),
        "sb_bf16_g8": (None, {"HYT_ATTN_BF16": "megakernel",
                              "HYT_STAGE_BATCH_HAMER": "1",
                              "HYT_ATTN_BF16_G": "8"}, "frames"),
    }
    arms = {}
    for name in wanted:
        spec = arm_defs[name]
        attn_impl, env = spec[0], spec[1]
        prog = spec[2] if len(spec) > 2 else "frame"
        arms[name] = (make_frames() if prog == "frames" else make(attn_impl),
                      env)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.integers(0, 255, (H, W, 3)).astype(np.float32))
    images = jnp.broadcast_to(image, (batch, H, W, 3))
    hws = jnp.broadcast_to(jnp.asarray([H, W], jnp.float32), (batch, 2))
    Ks = jnp.broadcast_to(jnp.asarray(
        [[906.96, 0, W / 2], [0, 906.79, H / 2], [0, 0, 1]], jnp.float32),
        (batch, 3, 3))

    fns = {}
    for name, (fn, env) in arms.items():
        for k in ("HYT_ATTN", "HYT_ATTN_PREQUANT", "HYT_INT8_MLP",
                  "HYT_ATTN_BF16", "HYT_GELU", "HYT_INT8_MLP_TM",
                  "HYT_INT8_MLP_HC", "HYT_ATTN_MEGAPROJ_G",
                  "HYT_ATTN_MEGA_G", "HYT_ATTN_BF16_G",
                  "HYT_SOFTMAX", "HYT_ATTN_MATH", "HYT_STAGE_BATCH_HAMER"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.time()
        try:
            float(fn(params, images, hws, Ks))
        except Exception as e:  # a failing arm must not kill the A/B
            print(f"{name}: FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:500]}", flush=True)
            continue
        print(f"{name}: compiled in {time.time() - t0:.0f}s", flush=True)
        fns[name] = fn
    for k in ("HYT_ATTN", "HYT_ATTN_PREQUANT", "HYT_INT8_MLP",
                  "HYT_ATTN_BF16", "HYT_GELU", "HYT_INT8_MLP_TM",
                  "HYT_INT8_MLP_HC", "HYT_ATTN_MEGAPROJ_G",
                  "HYT_ATTN_MEGA_G", "HYT_ATTN_BF16_G",
                  "HYT_SOFTMAX", "HYT_ATTN_MATH", "HYT_STAGE_BATCH_HAMER"):
        os.environ.pop(k, None)

    times = {name: [] for name in fns}
    for it in range(iters):
        for name, fn in fns.items():
            t0 = time.time()
            float(fn(params, images, hws, Ks))
            times[name].append(time.time() - t0)
        print(f"iter {it}: " + "  ".join(
            f"{n} {times[n][-1]*1e3:7.1f} ms" for n in fns), flush=True)

    for name, ts in times.items():
        ts = np.array(ts)
        p50 = float(np.percentile(ts, 50))
        print(f"{name:8s} p50 {p50*1e3:7.1f} ms  ({batch/p50:6.1f} fps)  "
              f"min {ts.min()*1e3:7.1f}  max {ts.max()*1e3:7.1f}")


if __name__ == "__main__":
    import sys as _sys  # _hyt_help_guard
    if "-h" in _sys.argv or "--help" in _sys.argv:
        print(__doc__ or "env-configured tool; see module docstring")
        raise SystemExit(0)
    main()
