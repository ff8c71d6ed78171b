"""End-to-end single-frame pipeline as ONE jitted XLA program.

Replaces the reference's per-hand Python loop (infer.py:1268-1304) and its
CPU<->GPU ping-pong with a fixed-capacity masked formulation:

  raw frame (bucketed static shape)
    -> device letterbox -> YOLOv7 -> NMS -> top MAX_HANDS slots
    -> vmapped fused crops -> HaMeR (batch = slots) -> flip corrections
    -> camera lift with real intrinsics (+ optional RootNet depth refine)
    -> full-image 2D projection -> MANO params in axis-angle

Call stacks mirrored (SURVEY.md 3.1): Detector.detect, estimate_from_rgb,
estimate_root_depth_custom, save-side rotmat->aa conversion.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.geometry.boxes import hamer_box_params, process_bbox, scale_coords
from hamer_yolo_tpu.geometry.camera import calculate_k_value, custom_cam_crop_to_full, project_with_intrinsics
from hamer_yolo_tpu.geometry.flip import correct_pred_cam, flip_keypoints3d
from hamer_yolo_tpu.geometry.rotations import rotmat_to_aa
from hamer_yolo_tpu.models.hamer import HamerConfig, hamer_forward
from hamer_yolo_tpu.models.mano import ManoModel
from hamer_yolo_tpu.models.sar import SarConfig, estimate_root_depth
from hamer_yolo_tpu.models.yolov7 import YoloConfig, yolov7_forward
from hamer_yolo_tpu.ops.nms import non_max_suppression
from hamer_yolo_tpu.pipeline.preprocess import device_letterbox, hamer_crop, sar_patch


@dataclass(frozen=True)
class PipelineConfig:
    max_hands: int = 4
    det_size: int = 640
    conf_thres: float = 0.25   # config/yolo_config.py:7
    iou_thres: float = 0.35    # config/yolo_config.py:8
    classes: Tuple[int, ...] = (0, 1, 2)  # config/yolo_config.py:9
    agnostic_nms: bool = True  # config/yolo_config.py:10
    # Static NMS candidate pool (reference max_nms=30000, general.py:616).
    # 512 is ample for hands at conf 0.25; raise for dense-object cfgs —
    # overflow behavior (highest-score candidates kept) is pinned by
    # tests/test_yolo.py test_candidate_overflow_keeps_highest_scores.
    max_nms_static: int = 512
    right_class: int = 1       # cls==1 -> right (yolo/detector.py:144-148)
    crop_size: int = 256
    use_depth_refine: bool = False  # d_infer.py behavior when True
    tta: bool = False  # 3-scale+flip detector TTA. The reference's config
    #                    sets augment=True (config/yolo_config.py:6) but
    #                    TracedModel.forward DROPS the flag at runtime
    #                    (torch_utils.py:371-374), so the reference never
    #                    executes TTA — off-by-default here IS the
    #                    effective reference behavior. Measured 1.87x
    #                    detector cost on v5e when on (2.25 -> 4.21 ms/img
    #                    b32, assets/ab_tta_r03.log).
    yolo: YoloConfig = field(default_factory=lambda: YoloConfig(nc=3))
    hamer: HamerConfig = field(default_factory=HamerConfig)
    sar: SarConfig = field(default_factory=SarConfig)


def detect_hands(
    yolo_params: Dict[str, Any],
    image_bgr: jax.Array,
    orig_hw: jax.Array,
    cfg: PipelineConfig,
) -> Dict[str, jax.Array]:
    """Detector stage: letterbox -> YOLO -> NMS -> original-frame boxes.

    Returns top-max_hands slots: boxes (S, 4) xyxy, scores (S,),
    is_right (S,), valid (S,).
    """
    letterboxed, r, pad = device_letterbox(image_bgr, orig_hw, cfg.det_size)
    det_in = letterboxed[..., ::-1] / 255.0  # BGR -> RGB, [0, 1]
    if cfg.tta:
        from hamer_yolo_tpu.models.yolov7.tta import yolov7_forward_tta

        pred = yolov7_forward_tta(yolo_params, det_in[None], cfg.yolo)
    else:
        pred = yolov7_forward(yolo_params, det_in[None], cfg.yolo)
    nms = non_max_suppression(
        pred,
        conf_thres=cfg.conf_thres,
        iou_thres=cfg.iou_thres,
        classes=cfg.classes,
        agnostic=cfg.agnostic_nms,
        max_det=cfg.max_hands,
        max_nms_static=cfg.max_nms_static,
    )
    boxes = scale_coords(nms.boxes[0], r, pad, (orig_hw[0], orig_hw[1]))
    boxes = jnp.round(boxes)  # detector rounds (yolo/detector.py:142)
    return {
        "boxes": boxes,
        "scores": nms.scores[0],
        "is_right": (nms.classes[0] == cfg.right_class).astype(jnp.float32),
        "classes": nms.classes[0],
        "valid": nms.valid[0],
    }


def detect_hands_batched(
    yolo_params: Dict[str, Any],
    images_bgr: jax.Array,
    orig_hws: jax.Array,
    cfg: PipelineConfig,
) -> Dict[str, jax.Array]:
    """detect_hands over a frame batch with a NATIVELY BATCHED trunk+NMS.

    Same math as ``jax.vmap(detect_hands)`` (equal in isolation; in a
    larger program XLA fusion can move conf scores ~1 ulp) but measured
    ~22 ms/b128 faster on v5e (assets/profile_det_batched_r03.log:
    vmap formulation 163 ms device vs 141 batched — the vmap batching
    of the NMS kernel + per-frame reshapes cost real HBM traffic).
    images_bgr: (B, Hb, Wb, 3); orig_hws: (B, 2).
    """
    if cfg.tta:  # TTA composes per-frame; keep the reference formulation.
        return jax.vmap(
            lambda i, h: detect_hands(yolo_params, i, h, cfg)
        )(images_bgr, orig_hws)
    lb, r, pad = jax.vmap(
        lambda i, h: device_letterbox(i, h, cfg.det_size)
    )(images_bgr, orig_hws)
    pred = yolov7_forward(yolo_params, lb[..., ::-1] / 255.0, cfg.yolo)
    nms = non_max_suppression(
        pred,
        conf_thres=cfg.conf_thres,
        iou_thres=cfg.iou_thres,
        classes=cfg.classes,
        agnostic=cfg.agnostic_nms,
        max_det=cfg.max_hands,
        max_nms_static=cfg.max_nms_static,
    )
    boxes = jax.vmap(
        lambda b, rr, pp, hw: jnp.round(scale_coords(b, rr, pp, (hw[0], hw[1])))
    )(nms.boxes, r, pad, orig_hws)
    return {
        "boxes": boxes,
        "scores": nms.scores,
        "is_right": (nms.classes == cfg.right_class).astype(jnp.float32),
        "classes": nms.classes,
        "valid": nms.valid,
    }


def _hamer_crops(image_bgr, dets, cfg: PipelineConfig):
    """Per-frame crop prep: (crops (S, c, c, 3), center, size, do_flip)."""
    do_flip = 1.0 - dets["is_right"]  # left hands are flipped
    center, size = hamer_box_params(dets["boxes"])
    crops = jax.vmap(
        lambda c, s, f: hamer_crop(image_bgr, c, s, f, cfg.crop_size)
    )(center, size, do_flip)
    return crops, center, size, do_flip


def _select_attn_impl(cfg: PipelineConfig, attn_impl):
    """Inference default: on TPU, leave attn_impl None so vit_forward
    engages the fused bf16 LN+QKV+attention megakernel (the A/B-qualified
    exact-path default — models/vit.py; HYT_ATTN_BF16=off reverts).
    Elsewhere, the env-switchable softmax attention: with HYT_ATTN unset
    it is byte-identical to nn.mha_self_attention (inline einsum, no
    wrapper); HYT_ATTN=pallas|auto engages the fused Pallas kernel
    (custom_vmap-based, NOT differentiable — training uses hamer_forward
    with nn.mha_self_attention). The int8 path dispatches internally
    (core/quant._attn_math)."""
    if attn_impl is not None or cfg.hamer.int8_backbone:
        return attn_impl
    import os

    from hamer_yolo_tpu.ops.attention_pallas import _on_tpu

    _env_bf16 = os.environ.get("HYT_ATTN_BF16")
    if not (_env_bf16 == "megakernel" or (_env_bf16 is None and _on_tpu())):
        from hamer_yolo_tpu.ops.attention_pallas import \
            fast_mha_self_attention

        return fast_mha_self_attention
    return None


def _recover_epilogue(out, center, size, do_flip, K, depth_refine):
    """Flip corrections + camera lift + full-image projection over one
    frame's hand slots, from a hamer_forward output dict."""
    # Reference-compatible kp3d flip handling (infer.py:391) is a known bug;
    # apply the corrected mirror (flip.py docstring).
    kp3d = flip_keypoints3d(out["pred_keypoints_3d"], do_flip)
    pred_cam = correct_pred_cam(out["pred_cam"], do_flip)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    S = do_flip.shape[0]
    cam_t_full = custom_cam_crop_to_full(
        pred_cam, center, size,
        jnp.full((S,), fx), jnp.full((S,), fy),
        jnp.full((S,), cx), jnp.full((S,), cy),
        depth_refine=depth_refine,
    )
    kp2d_full = project_with_intrinsics(
        kp3d + cam_t_full[:, None], jnp.full((S,), fx), jnp.full((S,), fy),
        jnp.full((S,), cx), jnp.full((S,), cy),
    )
    return {
        "pred_cam": pred_cam,
        "pred_cam_t_full": cam_t_full,
        "pred_keypoints_3d": kp3d,
        "pred_keypoints_2d_full": kp2d_full,
        "pred_vertices": out["pred_vertices"],
        "global_orient": out["pred_mano_params"]["global_orient"],
        "hand_pose": out["pred_mano_params"]["hand_pose"],
        "betas": out["pred_mano_params"]["betas"],
        "do_flip": do_flip,
    }


def recover_hands(
    hamer_params: Dict[str, Any],
    mano_model: ManoModel,
    image_bgr: jax.Array,
    dets: Dict[str, jax.Array],
    K: jax.Array,
    cfg: PipelineConfig,
    depth_refine: Optional[jax.Array] = None,
    attn_impl=None,
) -> Dict[str, jax.Array]:
    """HaMeR stage over all hand slots at once (estimate_from_rgb parity)."""
    crops, center, size, do_flip = _hamer_crops(image_bgr, dets, cfg)
    attn_impl = _select_attn_impl(cfg, attn_impl)
    out = hamer_forward(hamer_params, mano_model, crops, cfg.hamer, attn_impl=attn_impl)
    return _recover_epilogue(out, center, size, do_flip, K, depth_refine)


def estimate_depths(
    sar_params: Dict[str, Any],
    image_bgr: jax.Array,
    dets: Dict[str, jax.Array],
    orig_hw: jax.Array,
    K: jax.Array,
    cfg: PipelineConfig,
) -> jax.Array:
    """RootNet stage: per-slot absolute root depth (S,)."""
    b = dets["boxes"]
    xywh = jnp.stack(
        [b[:, 0], b[:, 1], b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=-1
    )
    pb, _ = process_bbox(xywh, orig_hw[1], orig_hw[0],
                         (float(cfg.sar.input_size), float(cfg.sar.input_size)), 1.5)
    patches = jax.vmap(lambda bb: sar_patch(image_bgr, bb, cfg.sar.input_size))(pb)
    k_val = calculate_k_value(
        pb[:, 2:4], K[0, 0], K[1, 1],
        real_area=cfg.sar.bbox_real[0] * cfg.sar.bbox_real[1],
    )
    return estimate_root_depth(sar_params, patches, k_val, cfg.sar)


def infer_frame(
    params: Dict[str, Any],
    mano_model: ManoModel,
    image_bgr: jax.Array,
    orig_hw: jax.Array,
    K: jax.Array,
    cfg: PipelineConfig,
    attn_impl=None,
) -> Dict[str, jax.Array]:
    """The full program. image_bgr: (Hb, Wb, 3) float32 raw BGR 0..255
    (bucket-padded); orig_hw: (2,) float32; K: (3, 3).

    Returns per-slot outputs incl. the npy-schema fields (betas, theta,
    pose_hand, pose_global, cam_t, is_right) as masked arrays.
    """
    dets = detect_hands(params["yolo"], image_bgr, orig_hw, cfg)
    return _infer_from_dets(params, mano_model, image_bgr, dets, orig_hw, K,
                            cfg, attn_impl)


def _infer_from_dets(params, mano_model, image_bgr, dets, orig_hw, K, cfg,
                     attn_impl=None) -> Dict[str, jax.Array]:
    """Everything after the detector: depth -> HaMeR -> npy-schema fields."""
    depth = None
    if cfg.use_depth_refine or "sar" in params:
        depth = estimate_depths(params["sar"], image_bgr, dets, orig_hw, K, cfg)
    refine = depth if cfg.use_depth_refine else None

    rec = recover_hands(
        params["hamer"], mano_model, image_bgr, dets, K, cfg,
        depth_refine=refine, attn_impl=attn_impl,
    )
    return _npy_fields(dets, rec, depth)


def _npy_fields(dets, rec, depth) -> Dict[str, jax.Array]:
    """Save-side axis-angle conversion + npy-schema dict
    (infer.py:1281-1296)."""
    global_aa = rotmat_to_aa(rec["global_orient"][:, 0])       # (S, 3)
    hand_aa = rotmat_to_aa(rec["hand_pose"]).reshape(global_aa.shape[0], -1)  # (S, 45)
    theta = jnp.concatenate([global_aa, hand_aa], axis=-1)     # (S, 48)

    out = {
        **dets,
        "betas": rec["betas"],
        "theta": theta,
        "pose_hand": hand_aa,
        "pose_global": global_aa,
        "cam_t": rec["pred_cam_t_full"],
        "pred_cam": rec["pred_cam"],
        "keypoints_3d": rec["pred_keypoints_3d"],
        "keypoints_2d": rec["pred_keypoints_2d_full"],
        "vertices": rec["pred_vertices"],
    }
    if depth is not None:
        out["root_depth"] = depth
    return out


def infer_frames(
    params: Dict[str, Any],
    mano_model: ManoModel,
    images_bgr: jax.Array,
    orig_hws: jax.Array,
    Ks: jax.Array,
    cfg: PipelineConfig,
    attn_impl=None,
) -> Dict[str, jax.Array]:
    """Stage-batched full program over a frame batch.

    Same computation as ``jax.vmap(infer_frame)`` — the detector stage
    just runs natively batched (detect_hands_batched), ~22 ms/b128
    faster on v5e. The per-hand stages stay vmapped over frames (they
    batch over SLOTS internally, and vmap composes them at no measured
    cost). Outputs match vmap(infer_frame) up to XLA fusion ulps
    (~3e-6 on conf scores — enough to swap a slot between NEAR-TIED
    candidates on random weights; immaterial on trained weights).
    Pinned by tests/test_pipeline.py::test_infer_frames_matches_vmap.
    images_bgr: (B, Hb, Wb, 3); orig_hws: (B, 2); Ks: (B, 3, 3).

    HYT_STAGE_BATCH_HAMER=1 (trace-time env) additionally stage-batches
    the HaMeR backbone: all B*S crops run through ONE hamer_forward call
    instead of a per-frame vmap. Same math — but the attention
    megakernels' grid steps then see the WHOLE crop batch, so their
    grouped-GEMM factor (HYT_ATTN_MEGAPROJ_G etc.) can exceed the
    per-frame slot count S (vmap structurally caps the in-kernel GEMM
    at S*192 rows). Equality pinned by
    tests/test_pipeline.py::test_infer_frames_stage_batched_matches.
    """
    import os

    dets = detect_hands_batched(params["yolo"], images_bgr, orig_hws, cfg)
    if os.environ.get("HYT_STAGE_BATCH_HAMER", "0") == "1":
        crops, center, size, do_flip = jax.vmap(
            lambda i, d: _hamer_crops(i, d, cfg))(images_bgr, dets)
        B, S = crops.shape[0], crops.shape[1]
        flat = hamer_forward(
            params["hamer"], mano_model,
            crops.reshape(B * S, *crops.shape[2:]), cfg.hamer,
            attn_impl=_select_attn_impl(cfg, attn_impl))
        out = jax.tree.map(lambda a: a.reshape(B, S, *a.shape[1:]), flat)

        def _epi(o, c, s, f, img, d, hw, k):
            depth = None
            if cfg.use_depth_refine or "sar" in params:
                depth = estimate_depths(params["sar"], img, d, hw, k, cfg)
            refine = depth if cfg.use_depth_refine else None
            rec = _recover_epilogue(o, c, s, f, k, refine)
            return _npy_fields(d, rec, depth)

        return jax.vmap(_epi)(out, center, size, do_flip, images_bgr,
                              dets, orig_hws, Ks)
    return jax.vmap(
        lambda i, d, hw, k: _infer_from_dets(params, mano_model, i, d, hw,
                                             k, cfg, attn_impl)
    )(images_bgr, dets, orig_hws, Ks)


def infer_frames_tracked(
    params: Dict[str, Any],
    mano_model: ManoModel,
    images_bgr: jax.Array,
    prev_kp2d: jax.Array,
    prev_is_right: jax.Array,
    prev_valid: jax.Array,
    orig_hws: jax.Array,
    Ks: jax.Array,
    cfg: PipelineConfig,
    attn_impl=None,
    track_expand: float = 1.3,
    track_min_size: float = 32.0,
) -> Dict[str, jax.Array]:
    """Detector-skip frame batch: boxes come from the previous tick's
    projected 2D keypoints instead of YOLO.

    The serving tracking mode (BatchedPipeline detect_every=K): the
    detector — ~1/3 of the frame program's device time at b128
    (assets/profile_stages_poly_r03.log) — runs only on keyframes; in
    between, each slot's box is ``track_boxes_from_keypoints`` of that
    source's last outputs. The reference has no equivalent (its webcam
    loop re-detects every frame, yolo/detector.py:35-104).

    images_bgr: (B, Hb, Wb, 3); prev_kp2d: (B, S, 21, 2) full-image
    keypoints from the previous tick; prev_is_right/prev_valid: (B, S).
    Output pytree has the SAME key set/shapes as ``infer_frames`` (scores
    carry the validity mask, not detector confidences), so serving can
    stitch detected and tracked sub-batches tick by tick.
    """
    from hamer_yolo_tpu.geometry.boxes import track_boxes_from_keypoints

    boxes = jax.vmap(
        lambda k, v, hw: track_boxes_from_keypoints(
            k, v, hw, expand=track_expand, min_size=track_min_size)
    )(prev_kp2d, prev_valid, orig_hws)
    dets = {
        "boxes": boxes,
        "scores": prev_valid.astype(jnp.float32),
        "is_right": prev_is_right.astype(jnp.float32),
        # raw class id is not recoverable from is_right alone; 0 is a
        # legitimate left id in the 3-class mapping (cls==1 -> right,
        # else left, yolo/detector.py:144-148)
        "classes": jnp.where(prev_is_right > 0.5, cfg.right_class,
                             0).astype(jnp.int32),
        "valid": prev_valid.astype(bool),
    }
    return jax.vmap(
        lambda i, d, hw, k: _infer_from_dets(params, mano_model, i, d, hw,
                                             k, cfg, attn_impl)
    )(images_bgr, dets, orig_hws, Ks)


def infer_frame_with_boxes(
    params: Dict[str, Any],
    mano_model: ManoModel,
    image_bgr: jax.Array,
    boxes: jax.Array,
    is_right: jax.Array,
    box_valid: jax.Array,
    orig_hw: jax.Array,
    K: jax.Array,
    cfg: PipelineConfig,
    attn_impl=None,
) -> Dict[str, jax.Array]:
    """Pipeline with externally-supplied boxes (mask-driven variant,
    reference process_batch_manopara_with_mask, infer.py:1099-1220).

    boxes: (S, 4) xyxy; is_right/box_valid: (S,).
    """
    dets = {
        "boxes": boxes,
        "scores": box_valid.astype(jnp.float32),
        "is_right": is_right.astype(jnp.float32),
        "valid": box_valid.astype(bool),
    }
    depth = None
    if "sar" in params:
        depth = estimate_depths(params["sar"], image_bgr, dets, orig_hw, K, cfg)
    refine = depth if cfg.use_depth_refine else None
    rec = recover_hands(params["hamer"], mano_model, image_bgr, dets, K, cfg,
                        depth_refine=refine, attn_impl=attn_impl)
    global_aa = rotmat_to_aa(rec["global_orient"][:, 0])
    hand_aa = rotmat_to_aa(rec["hand_pose"]).reshape(global_aa.shape[0], -1)
    out = {
        **dets,
        "betas": rec["betas"],
        "theta": jnp.concatenate([global_aa, hand_aa], axis=-1),
        "pose_hand": hand_aa,
        "pose_global": global_aa,
        "cam_t": rec["pred_cam_t_full"],
        "keypoints_3d": rec["pred_keypoints_3d"],
        "keypoints_2d": rec["pred_keypoints_2d_full"],
        "vertices": rec["pred_vertices"],
    }
    if depth is not None:
        out["root_depth"] = depth
    return out
