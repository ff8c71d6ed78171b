"""Int8 quantization (W8A8) for the transformer matmuls.

The e2e profile (CLAUDE.md) shows ViT-H matmuls dominate (82% of FLOPs at
~36% bf16 MXU utilization); v5e doubles peak throughput at int8. This
module provides the standard symmetric W8A8 recipe:

- weights: per-output-channel symmetric int8 (scales folded out of the
  matmul), quantized once at load time;
- activations: dynamic per-row (per-token) absmax symmetric int8 at
  runtime;
- accumulate int32 on the MXU (`preferred_element_type=int32`), rescale
  to the compute dtype.

Exposed as a drop-in attention/MLP implementation for vit_forward
(``int8_mha_self_attention`` has the same (params, x, num_heads) contract
— pass quantized params from ``quantize_vit_params``). Opt-in; bf16 stays
the default.

STATUS (measured on v5e via BENCH_INT8=1): the dot_general path DOES
engage the int8 MXU mode (microbench 152 TFLOP/s vs 117 bf16 at ViT
shapes) — e2e 124.7 -> 140.2 fps at batch 32, 128.9 -> 146.3 at batch
64, MPVPE delta 1.44 mm (tools/eval_fastpaths.py; bf16 noise floor
0.83 mm). Round 2 found composition with ToMe NEGATIVE (159.0 -> 147.8
at r=4): once token merging shrinks the GEMMs, the unfused
dynamic-quantize elementwise passes dominate. Round 3 fixes that with
the Pallas fused kernel (ops/int8_matmul.py): LayerNorm/GELU + dynamic
per-row quantize computed in VMEM inside the int8 GEMM, so every
elementwise pass between the block matmuls disappears from the HBM
traffic. On TPU the ``vit_forward_int8`` path routes through it
automatically (``fused`` arg overrides). Convs are a different story —
see quantize_yolo_params below.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def quantize_weight_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """(in, out) f32 -> {q (in, out) int8, scale (out,) f32} per-channel."""
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_act_int8(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(..., d) -> (int8 values, per-row scale (..., 1)) dynamic symmetric."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(wq: Dict[str, jax.Array], x: jax.Array,
                bias: jax.Array | None = None,
                sx_static: jax.Array | None = None) -> jax.Array:
    """y = dequant(quant(x) @ wq) + b; int32 MXU accumulation.

    ``sx_static``: scalar calibrated activation scale (per-tensor static
    quantization — skips the dynamic per-row absmax reduction)."""
    if sx_static is None:
        qx, sx = quantize_act_int8(x)
    else:
        sx = sx_static.astype(jnp.float32)
        qx = jnp.clip(jnp.round(x / sx.astype(x.dtype)),
                      -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qx, wq["q"],
        dimension_numbers=(((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * wq["scale"]
    y = y.astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def quantize_linear_params(p: Params) -> Params:
    out: Params = {"wq": quantize_weight_int8(p["w"])}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_vit_params(vit_params: Params) -> Params:
    """Quantize every transformer-block matmul; embeddings/norms stay f32."""
    qblocks = []
    for blk in vit_params["blocks"]:
        qblocks.append({
            "norm1": blk["norm1"],
            "attn": {
                "qkv": quantize_linear_params(blk["attn"]["qkv"]),
                "proj": quantize_linear_params(blk["attn"]["proj"]),
            },
            "norm2": blk["norm2"],
            "mlp": {
                "fc1": quantize_linear_params(blk["mlp"]["fc1"]),
                "fc2": quantize_linear_params(blk["mlp"]["fc2"]),
            },
        })
    return {
        "patch_embed": vit_params["patch_embed"],
        "pos_embed": vit_params["pos_embed"],
        "blocks": qblocks,
        "last_norm": vit_params["last_norm"],
    }


def collect_vit_act_stats(params_q: Params, x: jax.Array, cfg) -> Params:
    """Calibration pass: absmax of every quantized matmul input.

    ``x`` is the BACKBONE input (for HaMeR: the 256x192 center crop the
    forward applies before the ViT, hamer.py crop_margin — not the raw
    256x256 crop). Runs the UNFUSED int8 ViT forward and records
    the post-prologue absmax seen by each of the 4 GEMMs per block (the
    exact tensors the fused kernels quantize: post-LN for qkv/fc1, the
    attention output for proj, post-GELU for fc2). Calibrating THROUGH
    the int8 forward (not the bf16 one) makes the stats reflect the
    activations the static-scale runtime will actually see.

    Returns {"blocks": [{"qkv","proj","fc1","fc2"}: () f32]}; reduce over
    calibration batches with jax.tree.map(jnp.maximum, a, b), then call
    attach_static_act_scales. Jittable.

    TPU-native replacement for the reference's TensorRT entropy
    calibrator (yolo/yolov7/TensorRT-For-YOLO-Series-cuda-python/
    export.py:17-92): absmax over calibration batches instead of an
    entropy histogram, computed on-device in one jitted pass.
    """
    from hamer_yolo_tpu.core import nn

    B = x.shape[0]
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    tok = nn.conv2d(params_q["patch_embed"], x, stride=cfg.patch_size,
                    padding=cfg.patch_padding).reshape(B, -1, cfg.embed_dim)
    pos = params_q["pos_embed"].astype(tok.dtype)
    tok = tok + pos[:, 1:] + pos[:, :1]

    def amax(t):
        return jnp.max(jnp.abs(t.astype(jnp.float32)))

    stats = []
    for blk in params_q["blocks"]:
        s = {}
        h = nn.layer_norm(blk["norm1"], tok)
        s["qkv"] = amax(h)
        p = blk["attn"]
        qkv = int8_linear(p["qkv"]["wq"], h, p["qkv"].get("b"))
        ao = _attn_math(qkv, cfg.num_heads)
        s["proj"] = amax(ao)
        tok = tok + int8_linear(p["proj"]["wq"], ao, p["proj"].get("b"))
        h2 = nn.layer_norm(blk["norm2"], tok)
        s["fc1"] = amax(h2)
        m = blk["mlp"]
        g = jax.nn.gelu(int8_linear(m["fc1"]["wq"], h2, m["fc1"].get("b")),
                        approximate=False)
        s["fc2"] = amax(g)
        tok = tok + int8_linear(m["fc2"]["wq"], g, m["fc2"].get("b"))
        stats.append(s)
    return {"blocks": stats}


def attach_static_act_scales(params_q: Params, stats: Params,
                             margin: float = 1.0) -> Params:
    """Attach calibrated per-tensor activation scales ("sx") to quantized
    ViT params. Every int8 path (fused Pallas GEMM, inline XLA chain,
    unfused int8_linear) detects "sx" and skips the dynamic per-row
    absmax quantize. ``margin`` scales the calibrated absmax (>1 guards
    against unseen outliers at the cost of resolution; saturating values
    clip to +-127 either way).

    Caveat (same as every per-tensor static scheme): one scale covers all
    tokens, so activation-outlier tokens cost resolution for the rest —
    qualify on real checkpoints via tools/eval_fastpaths.py before
    trusting it beyond random-weight measurements.
    """
    def scale(a):
        return jnp.maximum(a * margin / 127.0, 1e-8).astype(jnp.float32)

    qblocks = []
    for blk, s in zip(params_q["blocks"], stats["blocks"]):
        attn = {
            "qkv": {**blk["attn"]["qkv"], "sx": scale(s["qkv"])},
            "proj": {**blk["attn"]["proj"], "sx": scale(s["proj"])},
        }
        mlp = {
            "fc1": {**blk["mlp"]["fc1"], "sx": scale(s["fc1"])},
            "fc2": {**blk["mlp"]["fc2"], "sx": scale(s["fc2"])},
        }
        qblocks.append({**blk, "attn": attn, "mlp": mlp})
    return {**params_q, "blocks": qblocks}


def save_act_stats(path: str, stats: Params) -> None:
    """Persist collect_vit_act_stats output as a flat .npz."""
    import numpy as np

    flat = {}
    for i, s in enumerate(stats["blocks"]):
        for k, v in s.items():
            flat[f"blk{i:02d}_{k}"] = np.asarray(v, np.float32)
    np.savez(path, **flat)


def load_act_stats(path: str) -> Params:
    """Inverse of save_act_stats."""
    import numpy as np

    z = np.load(path)
    n = max(int(k[3:5]) for k in z.files) + 1
    blocks = []
    for i in range(n):
        blocks.append({k.split("_", 1)[1]: jnp.asarray(z[k])
                       for k in z.files if k.startswith(f"blk{i:02d}_")})
    return {"blocks": blocks}


def quantize_conv_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """(kh, kw, cin, cout) f32 -> {q int8, scale (cout,)} per-out-channel."""
    absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_conv_tree(tree: Params, only_1x1: bool = False) -> Params:
    """Recursively W8A8-quantize convs {"w": 4d, ...} in a param tree.

    nn.conv2d routes dict-valued "w" through the int8 path; linears
    (2-d "w") and norms are left untouched. ``only_1x1`` quantizes just
    the pointwise convs (which lower to MXU int8 dot_general — a win)
    and leaves spatial convs in bf16 (XLA's int8 conv lowering widens —
    a measured loss).
    """
    if isinstance(tree, dict):
        if "w" in tree and getattr(tree["w"], "ndim", 0) == 4:
            kh, kw = tree["w"].shape[:2]
            if only_1x1 and not (kh == 1 and kw == 1):
                return tree
            out = dict(tree)
            out["w"] = quantize_conv_weight(tree["w"])
            return out
        return {k: quantize_conv_tree(v, only_1x1) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(quantize_conv_tree(v, only_1x1) for v in tree)
    return tree


def quantize_yolo_params(params: Params, quant_detect: bool = False,
                         only_1x1: bool = True) -> Params:
    """W8A8 the YOLOv7 deploy graph's convs.

    Default quantizes ONLY the 1x1 (pointwise) convs: nn.conv2d lowers
    those to int8 dot_general with per-pixel scales, which engages the
    v5e MXU int8 mode. Round-2 measured full-conv quantization as a LOSS
    (e2e 124.7 -> 102.5 fps at batch 32 — XLA has no MXU int8 *conv*
    lowering, it widens); pass only_1x1=False to reproduce that mode on
    backends with native int8 convs.

    STATUS (round 3, measured): even the 1x1-only mode is an e2e LOSS on
    v5e — BENCH_INT8_YOLO=1 on top of the int8 ViT measured 169.5 ->
    159.7 fps at b128 (detector 1.547 -> 1.863 ms/img): the YOLO trunk's
    pointwise GEMMs are small enough that the per-pixel quantize passes
    cost more than the int8 MXU saves. Keep this OFF for deployment; it
    exists as the measured-and-documented answer to "why not quantize
    the detector too".

    The final detect/bin/keypoint head layer keeps f32 weights by default
    (box regression is precision-sensitive and the head is cheap).
    """
    layers = params["layers"]
    qlayers = [quantize_conv_tree(l, only_1x1) for l in layers[:-1]]
    qlayers.append(quantize_conv_tree(layers[-1], only_1x1)
                   if quant_detect else layers[-1])
    return {**params, "layers": qlayers}


def calibrate_yolo_act_scales(params_q: Params, images,
                              cfg=None, spec=None) -> Params:
    """Attach static per-tensor activation scales to the quantized 1x1
    convs of a YOLO param tree (the detector-side analog of
    attach_static_act_scales).

    Runs the int8 forward EAGERLY over ``images`` (list/array of
    (H, W, 3) RGB [0,1] frames at the detector input size) with the
    nn._CONV_CALIB hook recording each quantized conv's input absmax —
    stats therefore reflect quantized upstream activations, same
    discipline as collect_vit_act_stats. Returns a new tree where every
    calibrated conv dict gains a scalar ``sx``; nn.conv2d then skips the
    dynamic per-pixel absmax pass (a full HBM read of the activation at
    detector-sized M) entirely.

    The whole pass is pinned to the host CPU backend: eager execution on
    the axon tunnel would cost ~28 ms PER OP. The tree is device_put to
    CPU first (which also rebuilds the dicts, so the id-keyed stats are
    collected and attached on the same rebuilt tree); callers device_put
    the returned tree wherever they need it. Mirrors the reference's
    TensorRT int8 calibrator story
    (yolo/yolov7/TensorRT-For-YOLO-Series-cuda-python/export.py) with a
    plain eager pass instead of an entropy calibrator.
    """
    from hamer_yolo_tpu.core import nn as _nn
    from hamer_yolo_tpu.models.yolov7.model import (YoloConfig,
                                                    yolov7_forward)

    cfg = cfg or YoloConfig()
    cpu = jax.devices("cpu")[0]
    params_q = jax.device_put(params_q, cpu)
    stats: dict = {}
    _nn._CONV_CALIB = stats
    try:
        with jax.default_device(cpu):
            for img in images:
                yolov7_forward(params_q, jnp.asarray(img)[None], cfg,
                               spec=spec)
    finally:
        _nn._CONV_CALIB = None
    by_id = {k: absmax for k, (absmax, _) in stats.items()}

    def attach(tree):
        if isinstance(tree, dict):
            if "w" in tree and isinstance(tree["w"], dict):
                absmax = by_id.get(id(tree["w"]))
                if absmax is None:
                    return tree
                out = dict(tree)
                out["sx"] = jnp.float32(max(absmax / 127.0, 1e-8))
                return out
            return {k: attach(v) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(attach(v) for v in tree)
        return tree

    attached = attach(params_q)
    if not by_id:
        raise RuntimeError("calibration saw no quantized 1x1 convs — "
                           "pass a quantize_yolo_params tree")
    # Return HOST (numpy) leaves: the eager pass committed the tree to
    # the CPU device, and committed arrays survive a later plain
    # jax.device_put(tree) — downstream jits would then compile for CPU
    # (where the Pallas NMS can't run). numpy leaves re-place freely.
    import numpy as np

    return jax.tree_util.tree_map(np.asarray, attached)


def int8_mha_self_attention(p: Params, x: jax.Array, num_heads: int) -> jax.Array:
    """Drop-in for nn.mha_self_attention over int8-quantized params."""
    B, N, _ = x.shape
    h = num_heads
    hd = p["qkv"]["wq"]["q"].shape[1] // 3 // h
    qkv = int8_linear(p["qkv"]["wq"], x, p["qkv"].get("b"),
                      p["qkv"].get("sx"))
    out = _attn_math(qkv, h)
    return int8_linear(p["proj"]["wq"], out, p["proj"].get("b"),
                       p["proj"].get("sx"))


def int8_mlp_gelu(p: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.gelu(int8_linear(p["fc1"]["wq"], x, p["fc1"].get("b"),
                                p["fc1"].get("sx")),
                    approximate=False)
    return int8_linear(p["fc2"]["wq"], h, p["fc2"].get("b"),
                       p["fc2"].get("sx"))


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _attn_math(qkv: jax.Array, num_heads: int,
               attn_pallas: bool = False) -> jax.Array:
    """(B, N, 3*D) fused-qkv tensor -> (B, N, D) pre-proj attention out.

    Routes through ops/attention_pallas.softmax_attention_qkv. TPU
    default is "pallas_direct" — the fused single-block kernel engaged
    WITHOUT a custom_vmap wrapper, so under the frame pipeline's vmap
    the pallas_call batches via its native rule (no collapse-reshape
    copies). Interleaved e2e A/B at b128 static-int8 (tools/
    bench_attn_ab.py): direct 671.8 ms vs einsum 704.2 (190.5 vs 181.8
    fps); the custom_vmap-collapsed variant measured 748.4 ms — see the
    MIN_PALLAS_CROPS note in ops/attention_pallas.py. Off-TPU falls
    back to the einsum path (pallas_call needs a TPU or interpret
    mode). ``attn_pallas`` pins the kernel; env HYT_ATTN overrides."""
    import os

    from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

    force = "pallas_direct" if attn_pallas else None
    if force is None and os.environ.get("HYT_ATTN") is None:
        force = "pallas_direct" if _on_tpu() else "xla"
    return softmax_attention_qkv(qkv, num_heads, force=force)


def int8_block_attn_fused(blk: Params, tok: jax.Array, num_heads: int,
                          interpret: bool = False,
                          attn_pallas: bool = False) -> jax.Array:
    """LN(norm1) + qkv + softmax attention + proj, LN/quantize fused into
    the Pallas int8 GEMMs (ops/int8_matmul.py). Residual NOT added.

    With calibrated static scales AND the attention kernel engaged, the
    proj quantize happens in the attention kernel's int8 EPILOGUE
    (out_scale) and proj becomes a plain pre-quantized MXU dot — the
    (B, N, D) quantize elementwise pass never touches HBM and the
    attention output crosses HBM at int8 width. Kill-switch:
    HYT_ATTN_PREQUANT=0."""
    import os

    from hamer_yolo_tpu.ops.int8_matmul import (fused_int8_matmul,
                                                int8_dot_prequant)

    p = blk["attn"]
    sx_qkv = p["qkv"].get("sx")
    sx_proj = p["proj"].get("sx")
    env = os.environ.get("HYT_ATTN")
    if attn_pallas:
        kern = "pallas_direct"
    elif env in ("pallas_direct", "pallas_fusedqkv", "megakernel"):
        kern = env
    elif env is None and (_on_tpu() or interpret):
        # A/B-qualified TPU defaults (tools/bench_attn_ab.py, b128
        # static-int8, interleaved in-process): megakernel 252.1 fps vs
        # fusedqkv 224.9 / direct 193.1 / einsum 184.0. The megakernel
        # needs both static scales; without them the transpose-free
        # fusedqkv engagement is the next-best measured arm.
        kern = ("megakernel" if sx_qkv is not None and sx_proj is not None
                else "pallas_direct")
    else:
        kern = None
    prequant = (sx_proj is not None and kern is not None
                and os.environ.get("HYT_ATTN_PREQUANT") != "0")
    if prequant and kern == "megakernel" and sx_qkv is not None:
        # LN + quantize + qkv GEMM + attention + int8 epilogue in ONE
        # pallas_call — the (B, N, 3D) qkv tensor never touches HBM.
        from hamer_yolo_tpu.ops.attention_pallas import fused_int8_attn_block

        # HYT_ATTN_MEGA_G: crops per grid step with the qkv GEMM
        # flattened over (G*N) rows (bit-identical across values,
        # perf-only — same grouped-GEMM restructure A/B-qualified for
        # megaproj, assets/ab_megaproj_g_r03.log).
        aq = fused_int8_attn_block(
            tok, p["qkv"]["wq"]["q"], p["qkv"]["wq"]["scale"],
            p["qkv"].get("b"), blk["norm1"]["scale"], blk["norm1"]["bias"],
            sx_qkv, sx_proj, num_heads, interpret=interpret,
            group=max(1, int(os.environ.get("HYT_ATTN_MEGA_G", "1"))))
        return int8_dot_prequant(aq, p["proj"]["wq"]["q"],
                                 p["proj"]["wq"]["scale"], p["proj"].get("b"),
                                 sx_proj, out_dtype=tok.dtype)
    qkv = fused_int8_matmul(
        tok, p["qkv"]["wq"]["q"], p["qkv"]["wq"]["scale"], p["qkv"].get("b"),
        blk["norm1"]["scale"], blk["norm1"]["bias"],
        prologue="ln", interpret=interpret,
        static_scale=sx_qkv)
    if prequant:
        from hamer_yolo_tpu.ops.attention_pallas import softmax_attention_qkv

        aq = softmax_attention_qkv(
            qkv, num_heads,
            force="pallas_direct" if kern == "megakernel" else kern,
            interpret=interpret, out_scale=sx_proj)
        return int8_dot_prequant(aq, p["proj"]["wq"]["q"],
                                 p["proj"]["wq"]["scale"], p["proj"].get("b"),
                                 sx_proj, out_dtype=tok.dtype)
    out = _attn_math(qkv, num_heads, attn_pallas=attn_pallas)
    return fused_int8_matmul(
        out, p["proj"]["wq"]["q"], p["proj"]["wq"]["scale"], p["proj"].get("b"),
        prologue="id", interpret=interpret,
        static_scale=p["proj"].get("sx"))


def int8_block_attn_residual(blk: Params, tok: jax.Array, num_heads: int,
                             interpret: bool = False,
                             attn_pallas: bool = False) -> jax.Array:
    """tok + attnblock(LN(tok)) with the qualified kernel dispatch.

    HYT_ATTN=megaproj engages the FULL attention-block megakernel
    (ops/attention_pallas.fused_int8_attn_proj_block: LN + quantize +
    qkv GEMM + attention + quantize + proj GEMM + dequant + residual in
    one pallas_call, qkv AND proj weights VMEM-resident) — needs both
    static scales. Every other value falls through to
    tok + int8_block_attn_fused(...). Same trace-time-env convention as
    the other fast-path knobs.

    megaproj is the TPU AUTODEFAULT since its interleaved A/B
    qualification (assets/ab_megaproj_r03.log, b128 static-int8:
    megaproj 470.8 ms p50 vs megakernel+pair 473.4, winning every
    interleaved iteration; the single-call MLP arm mega1 LOST 479.1 /
    474.0 tm192 and stays env-gated HYT_INT8_MLP=megakernel1)."""
    import os

    p = blk["attn"]
    sx_qkv = p["qkv"].get("sx")
    sx_proj = p["proj"].get("sx")
    env = os.environ.get("HYT_ATTN")
    megaproj = (env == "megaproj"
                or (env is None and (_on_tpu() or interpret))) \
        and not attn_pallas
    if (megaproj and sx_qkv is not None and sx_proj is not None
            and os.environ.get("HYT_ATTN_PREQUANT") != "0"):
        from hamer_yolo_tpu.ops.attention_pallas import (
            attn_math_flavor, fused_int8_attn_proj_block, softmax_flavor)

        # HYT_ATTN_MEGAPROJ_G: crops per grid step (flattened-GEMM
        # group; bit-identical across values — perf-only, trace-time).
        # Default 2: interleaved A/B b128 (assets/ab_megaproj_g_r03.log)
        # p50 461.1 ms vs 472.9 at G=1 — the taller (G*192)-row
        # qkv/proj GEMMs lift the in-kernel int8 dot rate. NOTE: under
        # the per-frame vmap the pallas batching rule caps the group at
        # the slot count S (G halves until it divides the per-instance
        # batch), so that log's G=4/8 arms silently ran at 2. The REAL
        # tall-M sweep (HYT_STAGE_BATCH_HAMER=1 flattens all B*S crops
        # into one backbone call, assets/ab_stagebatch_r03.log) shows
        # M=384 is already the knee: sb_g2 440.6 / sb_g4 441.0 /
        # sb_g8 451.7 / sb_g16 446.8 ms — bigger blocks VMEM-pressure
        # the pipeline. G=2 stands.
        return fused_int8_attn_proj_block(
            tok, p["qkv"]["wq"]["q"], p["qkv"]["wq"]["scale"],
            p["qkv"].get("b"), blk["norm1"]["scale"], blk["norm1"]["bias"],
            sx_qkv, sx_proj, p["proj"]["wq"]["q"], p["proj"]["wq"]["scale"],
            p["proj"].get("b"), num_heads, interpret=interpret,
            group=max(1, int(os.environ.get("HYT_ATTN_MEGAPROJ_G", "2"))),
            softmax=softmax_flavor(), attn_math=attn_math_flavor())
    return tok + int8_block_attn_fused(blk, tok, num_heads,
                                       interpret=interpret,
                                       attn_pallas=attn_pallas)


def int8_block_mlp_fused(blk: Params, tok: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """LN(norm2) + fc1 + GELU + fc2; LN fused into fc1's GEMM, the GELU
    (exact erf, or the int8-ready polynomial under HYT_GELU=poly) fused
    into fc2's quantize stage. Residual NOT added."""
    from hamer_yolo_tpu.ops.int8_matmul import (fused_int8_matmul,
                                                gelu_prologue)

    p = blk["mlp"]
    h = fused_int8_matmul(
        tok, p["fc1"]["wq"]["q"], p["fc1"]["wq"]["scale"], p["fc1"].get("b"),
        blk["norm2"]["scale"], blk["norm2"]["bias"],
        prologue="ln", interpret=interpret,
        static_scale=p["fc1"].get("sx"))
    return fused_int8_matmul(
        h, p["fc2"]["wq"]["q"], p["fc2"]["wq"]["scale"], p["fc2"].get("b"),
        prologue=gelu_prologue(), interpret=interpret,
        static_scale=p["fc2"].get("sx"))


def int8_block_mlp_residual(blk: Params, tok: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """tok + MLP(LN(tok)) with the qualified kernel dispatch.

    Resident-weight fc1/fc2 Pallas megakernel pair with fused
    LN/GELU/quantize/residual (ops/int8_matmul.fused_int8_mlp_block;
    needs static scales) — A/B-qualified TPU DEFAULT (bench_attn_ab
    b128 static-int8: mega_mlp 255.6 fps vs mega-only 252.1). Falls
    back to the fused GEMM pair otherwise. HYT_INT8_MLP=off disables,
    =megakernel forces (trace-time env, like HYT_ATTN); interpret mode
    engages the megakernel too (same convention as the attention
    dispatch above). Shared by vit_forward_int8 and models/tome."""
    import os

    env_mlp = os.environ.get("HYT_INT8_MLP")
    mlp_mega = (env_mlp in ("megakernel", "megakernel1")
                or (env_mlp is None and (_on_tpu() or interpret)))
    m = blk["mlp"]
    if (mlp_mega and m["fc1"].get("sx") is not None
            and m["fc2"].get("sx") is not None):
        from hamer_yolo_tpu.ops.int8_matmul import (fused_int8_mlp_block,
                                                    fused_int8_mlp_block1,
                                                    gelu_prologue)

        if env_mlp == "megakernel1":
            # SINGLE-CALL variant: fc1+GELU+fc2+residual in one
            # pallas_call, both weights resident — the int8 GELU
            # activation tensor never touches HBM. Bit-identical int32
            # math to the pair; env-gated until the interleaved A/B
            # qualifies it (tools/bench_attn_ab.py arm mega1).
            return fused_int8_mlp_block1(
                tok, m["fc1"]["wq"]["q"], m["fc1"]["wq"]["scale"],
                m["fc1"].get("b"), m["fc2"]["wq"]["q"],
                m["fc2"]["wq"]["scale"], m["fc2"].get("b"),
                blk["norm2"]["scale"], blk["norm2"]["bias"],
                m["fc1"]["sx"], m["fc2"]["sx"], interpret=interpret,
                gelu=gelu_prologue(),
                tm=int(os.environ.get("HYT_INT8_MLP_TM", "128")),
                hc=int(os.environ.get("HYT_INT8_MLP_HC", "1280")))
        return fused_int8_mlp_block(
            tok, m["fc1"]["wq"]["q"], m["fc1"]["wq"]["scale"],
            m["fc1"].get("b"), m["fc2"]["wq"]["q"],
            m["fc2"]["wq"]["scale"], m["fc2"].get("b"),
            blk["norm2"]["scale"], blk["norm2"]["bias"],
            m["fc1"]["sx"], m["fc2"]["sx"], interpret=interpret,
            gelu=gelu_prologue(),
            # tm sweep (interleaved A/B, b128 static-int8): 128 479.9 ms
            # / 192 474.6 / 256 545.4 (VMEM pressure) — 192 is default.
            tm=int(os.environ.get("HYT_INT8_MLP_TM", "192")))
    return tok + int8_block_mlp_fused(blk, tok, interpret=interpret)


def vit_forward_int8(params_q: Params, x: jax.Array, cfg,
                     fused: bool | None = None,
                     interpret: bool = False,
                     attn_pallas: bool = False) -> jax.Array:
    """vit_forward with int8 blocks (params from quantize_vit_params).

    ``fused=None`` routes through the Pallas fused-quantize GEMM kernel
    on TPU and the plain dot_general composition elsewhere; pass
    True/False to force (tests use fused=True, interpret=True on CPU).
    ``attn_pallas`` uses the fused-softmax attention kernel.
    """
    from hamer_yolo_tpu.core import nn

    import os

    if fused is None:
        # HYT_INT8_FUSED=0 pins the plain unfused composition (A/B
        # benchmarking across chip/tunnel conditions).
        fused = _on_tpu() and os.environ.get("HYT_INT8_FUSED", "1") != "0"
    B = x.shape[0]
    x = x.astype(jnp.dtype(cfg.compute_dtype))
    tok = nn.conv2d(params_q["patch_embed"], x, stride=cfg.patch_size,
                    padding=cfg.patch_padding).reshape(B, -1, cfg.embed_dim)
    pos = params_q["pos_embed"].astype(tok.dtype)
    tok = tok + pos[:, 1:] + pos[:, :1]
    for blk in params_q["blocks"]:
        if fused:
            tok = int8_block_attn_residual(blk, tok, cfg.num_heads,
                                           interpret=interpret,
                                           attn_pallas=attn_pallas)
            tok = int8_block_mlp_residual(blk, tok, interpret=interpret)
        else:
            tok = tok + int8_mha_self_attention(
                blk["attn"], nn.layer_norm(blk["norm1"], tok), cfg.num_heads)
            tok = tok + int8_mlp_gelu(blk["mlp"],
                                      nn.layer_norm(blk["norm2"], tok))
    return nn.layer_norm(params_q["last_norm"], tok)
