"""Training losses.

HaMeR (reference hamer/hamer/models/losses.py + hamer.py:269-399):
- Keypoint2DLoss: confidence-weighted L1 on 2D keypoints.
- Keypoint3DLoss: confidence-weighted L1 on root-centered 3D keypoints
  (pelvis_id = 0 for hands).
- ParameterLoss: per-sample-masked MSE on MANO rotmats/betas.
- Adversarial (LSGAN): generator pulls D(fake) -> 1; discriminator pulls
  D(real) -> 1, D(fake) -> 0 (hamer.py training_step).
Loss weights from configs_hydra/experiment/hamer_vit_transformer.yaml:44-51.

YOLOv7 (reference yolo/yolov7/utils/loss.py:425-558 ComputeLoss, non-OTA):
- CIoU box loss on matched anchors, BCE objectness with IoU-scaled
  targets, BCE classification; anchor matching by wh-ratio (< 4) with
  3-cell neighbor assignment.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

HAMER_LOSS_WEIGHTS = {
    "keypoints_3d": 0.05,
    "keypoints_2d": 0.01,
    "global_orient": 0.001,
    "hand_pose": 0.001,
    "betas": 0.0005,
    "adversarial": 0.0005,
}


def keypoint_2d_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """pred (B, N, 2); gt (B, N, 3) with confidence in [..., 2]."""
    conf = gt[..., 2:3]
    return jnp.sum(conf * jnp.abs(pred - gt[..., :2])) / pred.shape[0]


def keypoint_3d_loss(pred: jax.Array, gt: jax.Array, root_idx: int = 0) -> jax.Array:
    """pred (B, N, 3); gt (B, N, 4) with confidence; both root-centered."""
    conf = gt[..., 3:4]
    pred_c = pred - pred[:, root_idx:root_idx + 1]
    gt_c = gt[..., :3] - gt[:, root_idx:root_idx + 1, :3]
    return jnp.sum(conf * jnp.abs(pred_c - gt_c)) / pred.shape[0]


def parameter_loss(pred: jax.Array, gt: jax.Array, has: jax.Array) -> jax.Array:
    """Masked MSE; has: (B,) validity of the annotation."""
    B = pred.shape[0]
    mask = has.reshape((B,) + (1,) * (pred.ndim - 1))
    return jnp.sum(mask * (pred - gt) ** 2) / B


def adversarial_gen_loss(fake_logits: jax.Array) -> jax.Array:
    """LSGAN generator loss: (D(fake) - 1)^2."""
    return jnp.mean((fake_logits - 1.0) ** 2, axis=-1).sum() / fake_logits.shape[0]


def adversarial_disc_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    real = jnp.mean((real_logits - 1.0) ** 2, axis=-1).sum() / real_logits.shape[0]
    fake = jnp.mean(fake_logits ** 2, axis=-1).sum() / fake_logits.shape[0]
    return real + fake


# --------------------------------------------------------------------------
# YOLO losses
# --------------------------------------------------------------------------

def bbox_ciou(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """CIoU between (..., 4) xywh boxes (reference general.py bbox_iou CIoU)."""
    b1x1, b1y1 = box1[..., 0] - box1[..., 2] / 2, box1[..., 1] - box1[..., 3] / 2
    b1x2, b1y2 = box1[..., 0] + box1[..., 2] / 2, box1[..., 1] + box1[..., 3] / 2
    b2x1, b2y1 = box2[..., 0] - box2[..., 2] / 2, box2[..., 1] - box2[..., 3] / 2
    b2x2, b2y2 = box2[..., 0] + box2[..., 2] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * \
        jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    w1, h1 = box1[..., 2], box1[..., 3]
    w2, h2 = box2[..., 2], box2[..., 3]
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((box2[..., 0] - box1[..., 0]) ** 2 + (box2[..., 1] - box1[..., 1]) ** 2)
    v = (4 / jnp.pi ** 2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - rho2 / c2 - alpha * v


def bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))



def _bin_L(bin_count):
    return bin_count + 1


def _level_candidates(raw, targets, anc_px, stride, nc, anchor_t, g, lvl, L, na,
                      head="detect", bin_count=21):
    """Per-level anchor/cell candidate construction (build_targets core).

    g is the neighbor-cell radius: 0.5 for lead heads, 1.0 for aux heads
    (ComputeLossAuxOTA's looser build_targets2, loss.py:1179+).

    head="bin" only adjusts the channel LAYOUT here (per-anchor
    [x, y, w_bin(bc+1), h_bin(bc+1), obj, cls...]); all SigmoidBin
    decode/BCE math lives in _simota_pooled_losses, the only loss path
    the IBin head can take (yolo_loss raises for bin + non-simota).
    """
    B, H, W, _ = raw.shape
    T = targets.shape[1]
    if head == "bin":
        Lb = _bin_L(bin_count)
        no = nc + 3 + 2 * Lb
        obj_idx = 2 + 2 * Lb
    else:
        no = nc + 5
        obj_idx = 4
    m = raw.reshape(B, H, W, na, no)
    m = jnp.transpose(m, (0, 3, 1, 2, 4))  # (B, na, H, W, no)

    t_xy = targets[..., 1:3] * jnp.array([W, H])  # grid units
    t_wh = targets[..., 3:5] * jnp.array([W, H])
    t_cls = targets[..., 0].astype(jnp.int32)
    valid = targets[..., 3] > 0  # (B, T)

    anc = anc_px / stride  # (na, 2) grid units
    r = t_wh[:, :, None, :] / anc[None, None, :, :]  # (B, T, na, 2)
    ratio_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t  # (B, T, na)

    # candidate cells: center + neighbors within radius g (reference
    # build_targets offsets [[0,0],[1,0],[0,1],[-1,0],[0,-1]]*g with masks
    # j=fx<g, k=fy<g, l=fx>1-g, m=fy>1-g)
    cx, cy = t_xy[..., 0], t_xy[..., 1]
    fx, fy = cx - jnp.floor(cx), cy - jnp.floor(cy)
    base_offs = jnp.asarray(
        [[0.0, 0.0], [g, 0.0], [0.0, g], [-g, 0.0], [0.0, -g]], raw.dtype
    )  # (5, 2); cell = floor(xy - off)
    offs = jnp.broadcast_to(base_offs[None, None], (B, T, 5, 2))
    # The l/m (far-side) masks mirror the reference's `(gxi % 1. < g)`
    # with gxi = grid_size - xy: that modulo is ALSO satisfied at
    # fx == 0.0 exactly (cell-corner centers), where it duplicates the
    # center cell — reproduce it verbatim, not as `fx > 1 - g`.
    inv_x, inv_y = W - cx, H - cy
    active = jnp.stack([
        jnp.ones_like(fx, bool),
        (fx < g) & (cx > 1.0), (fy < g) & (cy > 1.0),
        (inv_x % 1.0 < g) & (inv_x > 1.0), (inv_y % 1.0 < g) & (inv_y > 1.0),
    ], axis=2)  # (B, T, 5)

    cells = jnp.floor(t_xy[:, :, None, :] - offs).astype(jnp.int32)  # (B, T, 5, 2)
    cells_x = jnp.clip(cells[..., 0], 0, W - 1)
    cells_y = jnp.clip(cells[..., 1], 0, H - 1)

    # Gather predictions for every (target, candidate cell, anchor).
    bidx = jnp.arange(B)[:, None, None, None]
    psel = m[bidx, jnp.arange(na)[None, None, None, :],
             cells_y[..., None], cells_x[..., None], :]  # (B, T, 5, na, no)

    match = valid[:, :, None, None] & active[..., None] & ratio_ok[:, :, None, :]
    match_f = match.astype(raw.dtype)

    ps_xy = jax.nn.sigmoid(psel[..., 0:2]) * 2.0 - 0.5
    rel_xy = t_xy[:, :, None, None, :] - cells[:, :, :, None, :].astype(raw.dtype)
    rel_xy = jnp.broadcast_to(rel_xy, ps_xy.shape)
    # wh decode + CIoU: detect layout only. For head=="bin" these values
    # are never consumed (the pooled simota path rebuilds boxes from
    # psel with the SigmoidBin decode), so the detect formula on the
    # first channels is harmless filler that keeps shapes uniform.
    ps_wh = (jax.nn.sigmoid(psel[..., 2:4]) * 2.0) ** 2 * anc[None, None, None, :, :]
    pbox = jnp.concatenate([ps_xy, ps_wh], axis=-1)
    tbox = jnp.concatenate([rel_xy, jnp.broadcast_to(t_wh[:, :, None, None, :], ps_wh.shape)], axis=-1)
    ciou = bbox_ciou(pbox, tbox)
    # plain IoU for the OTA cost (the reference uses box_iou, not CIoU)
    iou_cost = _plain_iou_xywh(jax.lax.stop_gradient(pbox), tbox)

    flat_idx = (bidx * (L * na * 8192)  # unique per (b, lvl, anchor, cell)
                + lvl * (na * 8192)
                + jnp.arange(na)[None, None, None, :] * 8192
                + cells_y[..., None] * W + cells_x[..., None])
    return {
        "m": m, "psel": psel, "match_f": match_f, "ciou": ciou,
        "iou_cost": iou_cost, "obj_idx": obj_idx, "anc_grid": anc,
        "t_cls": t_cls, "H": H, "W": W, "na": na, "lvl": lvl,
        "cells_y": cells_y, "cells_x": cells_x, "bidx": bidx,
        "flat_idx": flat_idx,
    }


def _plain_iou_xywh(box1: jax.Array, box2: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Plain IoU between xywh boxes (reference general.py box_iou on xyxy)."""
    b1x1, b1y1 = box1[..., 0] - box1[..., 2] / 2, box1[..., 1] - box1[..., 3] / 2
    b1x2, b1y2 = box1[..., 0] + box1[..., 2] / 2, box1[..., 1] + box1[..., 3] / 2
    b2x1, b2y1 = box2[..., 0] - box2[..., 2] / 2, box2[..., 1] - box2[..., 3] / 2
    b2x2, b2y2 = box2[..., 0] + box2[..., 2] / 2, box2[..., 1] + box2[..., 3] / 2
    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * \
        jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    union = box1[..., 2] * box1[..., 3] + box2[..., 2] * box2[..., 3] - inter + eps
    return inter / union


def yolo_loss(
    raw_maps,
    targets: jax.Array,
    anchors: jax.Array,
    strides: Tuple[int, ...],
    nc: int,
    box_w: float = 0.05,
    obj_w: float = 0.7,
    cls_w: float = 0.3,
    anchor_t: float = 4.0,
    assigner: str = "neighbor",
    ota_topk: int = 10,
    aux_maps=None,
    head: str = "detect",
    bin_count: int = 21,
) -> Dict[str, jax.Array]:
    """Fixed-capacity YOLO loss.

    raw_maps: list of 3 raw head maps (B, H, W, na*(nc+5)) (pre-sigmoid).
    targets: (B, T, 5) padded labels [cls, cx, cy, w, h] normalized 0-1;
    invalid rows have w == 0.

    assigner:
    - "neighbor": yolov7 non-OTA ComputeLoss — wh-ratio within [1/t, t]
      plus the two nearest neighbor cells (loss.py:425-558);
    - "simota": ComputeLossOTA (loss.py:559-851) — the neighbor prefilter
      yields the candidate pool; per gt, dynamic-k = clamp(sum top-10
      IoU, >=1) candidates with the lowest cost
      (cls BCE + 3 * -log IoU) are selected; cross-gt conflicts resolve
      to the lowest-cost gt. All dense/masked (no dynamic shapes).
    """
    B = raw_maps[0].shape[0]
    T = targets.shape[1]
    na = anchors.shape[1]
    L = len(raw_maps)
    # reference per-level obj balance (loss.py:1200): [4.0, 1.0, 0.4] for
    # 3 levels, else the P3-P7 table [4.0, 1.0, 0.25, 0.06, 0.02]
    balance = (4.0, 1.0, 0.4) if L == 3 else (4.0, 1.0, 0.25, 0.06, 0.02)[:L]
    if head == "bin" and assigner != "simota":
        raise ValueError("the IBin head only has an OTA loss "
                         "(ComputeLossBinOTA, loss.py:852)")

    # ---- Pass 1: per-level candidate construction -------------------------
    per_level = [
        _level_candidates(raw, targets, anchors[lvl], strides[lvl], nc,
                          anchor_t, 0.5, lvl, L, na, head=head,
                          bin_count=bin_count)
        for lvl, raw in enumerate(raw_maps)
    ]

    # ---- SimOTA: exact pooled formulation ----------------------------------
    if assigner == "simota":
        total_box, total_obj, total_cls = _simota_pooled_losses(
            per_level, targets, strides, nc, head, bin_count, balance,
            ota_topk, B, T, na)
        if aux_maps is not None:
            # ComputeLossAuxOTA (loss.py:1179): aux candidates come from
            # find_5_positive (g=1.0) with the OTA cost computed on the
            # LEAD predictions (build_targets2(p[:nl], ...)); the losses
            # are then evaluated on the AUX maps at the selected cells,
            # 0.25-weighted. The reference uses top_k=20 for AuxOTA —
            # pass ota_topk=20 from the train CLI for exact parity.
            aux_cost = [
                _level_candidates(raw, targets, anchors[lvl], strides[lvl],
                                  nc, anchor_t, 1.0, lvl, L, na)
                for lvl, raw in enumerate(raw_maps)
            ]
            aux_loss = [
                _level_candidates(raw, targets, anchors[lvl], strides[lvl],
                                  nc, anchor_t, 1.0, lvl, L, na)
                for lvl, raw in enumerate(aux_maps)
            ]
            a_box, a_obj, a_cls = _simota_pooled_losses(
                aux_cost, targets, strides, nc, head, bin_count, balance,
                ota_topk, B, T, na, loss_level=aux_loss)
            total_box += 0.25 * a_box
            total_obj += 0.25 * a_obj
            total_cls += 0.25 * a_cls
        loss = box_w * total_box + obj_w * total_obj + cls_w * total_cls
        return {
            "loss": loss * B,
            "box": total_box, "obj": total_obj, "cls": total_cls,
        }

    # ---- Pass 2: loss accumulation ----------------------------------------
    total_box, total_obj, total_cls = _accumulate_losses(per_level, nc, balance, B)

    # Auxiliary heads (ComputeLossAuxOTA, loss.py:1179+): same targets with
    # the looser g=1.0 cell radius, 0.25-weighted.
    if aux_maps is not None:
        aux_level = [
            _level_candidates(raw, targets, anchors[lvl], strides[lvl], nc,
                              anchor_t, 1.0, lvl, L, na)
            for lvl, raw in enumerate(aux_maps)
        ]
        a_box, a_obj, a_cls = _accumulate_losses(aux_level, nc, balance, B)
        total_box += 0.25 * a_box
        total_obj += 0.25 * a_obj
        total_cls += 0.25 * a_cls

    loss = box_w * total_box + obj_w * total_obj + cls_w * total_cls
    return {
        "loss": loss * B,  # reference scales by batch size (loss.py:556)
        "box": total_box, "obj": total_obj, "cls": total_cls,
    }


def _simota_pooled_losses(per_level, targets, strides, nc, head, bin_count,
                          balance, ota_topk, B, T, na, loss_level=None):
    """EXACT dense formulation of ComputeLoss(Bin)OTA's build_targets
    (loss.py:559-851 / :852-1178).

    The reference pools ALL find_3_positive candidates of an image across
    gts and levels into one cost matrix — a candidate cell generated by
    gt A can be assigned to gt B, and duplicate (cell, anchor) columns
    from different source gts are separate columns (both can be matched,
    to different gts). Conflicts are resolved per COLUMN only (lowest
    cost gt). This function reproduces that with fixed shapes: the pool
    is the padded (T * 5 offsets * na) candidate grid per level, masked
    by candidate existence.

    ``loss_level``: when given, the OTA *assignment* (cost matrix,
    dynamic-k) is computed from ``per_level``'s predictions while the
    box/obj/cls losses are evaluated on ``loss_level``'s predictions at
    the same candidate cells. This is exactly ComputeLossAuxOTA's aux
    branch (loss.py:1209-1211): ``build_targets2(p[:self.nl], ...)``
    builds find_5_positive candidates and costs from the LEAD maps, then
    the loss indexes the AUX maps ``p[i+self.nl]`` at the selected
    cells (the 0.25 aux weight is applied by the caller).
    """
    from hamer_yolo_tpu.models.yolov7.heads import (
        sigmoid_bin_centers, sigmoid_bin_decode,
    )

    BIG = 1e9
    Lb = bin_count + 1
    img_w = per_level[0]["W"] * strides[0]
    img_h = per_level[0]["H"] * strides[0]
    gt_cls = targets[..., 0].astype(jnp.int32)          # (B, T)
    gt_valid = targets[..., 3] > 0                       # (B, T)
    gt_xy_px = targets[..., 1:3] * jnp.array([img_w, img_h], jnp.float32)
    gt_wh_px = targets[..., 3:5] * jnp.array([img_w, img_h], jnp.float32)
    gt_box_px = jnp.concatenate([gt_xy_px, gt_wh_px], axis=-1)  # (B, T, 4)

    # ---- flatten candidates per level --------------------------------------
    def _flatten_levels(levels):
        out = []
        for d in levels:
            obj_idx = d["obj_idx"]
            stride = strides[d["lvl"]]
            no = d["psel"].shape[-1]
            C = d["psel"].shape[1] * d["psel"].shape[2] * d["psel"].shape[3]
            ps = d["psel"].reshape(B, C, no)
            exist = d["match_f"].reshape(B, C) > 0
            cellx = jnp.broadcast_to(d["cells_x"][..., None],
                                     d["match_f"].shape).reshape(B, C)
            celly = jnp.broadcast_to(d["cells_y"][..., None],
                                     d["match_f"].shape).reshape(B, C)
            anc = d["anc_grid"]  # (na, 2) grid units
            anc_c = jnp.broadcast_to(
                anc[None, None, None, :, :], d["match_f"].shape + (2,)
            ).reshape(B, C, 2)

            sxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
            cell = jnp.stack([cellx, celly], axis=-1).astype(jnp.float32)
            xy_grid = sxy + cell
            if head == "bin":
                w_logits = ps[..., 2:2 + Lb]
                h_logits = ps[..., 2 + Lb:obj_idx]
                wh_cost = jnp.stack([
                    sigmoid_bin_decode(jax.nn.sigmoid(w_logits), bin_count),
                    sigmoid_bin_decode(jax.nn.sigmoid(h_logits), bin_count),
                ], axis=-1) * anc_c
            else:
                w_logits = h_logits = None
                wh_cost = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * anc_c
            box_px = jnp.concatenate([xy_grid * stride, wh_cost * stride],
                                     axis=-1)
            out.append(dict(
                ps=ps, exist=exist, cell=cell, anc=anc_c, obj_idx=obj_idx,
                box_px=box_px, stride=stride, C=C,
                w_logits=w_logits, h_logits=h_logits,
                obj_logit=ps[..., obj_idx], cls_logits=ps[..., obj_idx + 1:],
                d=d,
            ))
        return out

    lvl_data = _flatten_levels(per_level)
    # aux mode: selection from lead predictions, losses on aux predictions
    lvl_loss = _flatten_levels(loss_level) if loss_level is not None else lvl_data

    cand_box = jnp.concatenate([l["box_px"] for l in lvl_data], axis=1)
    cand_exist = jnp.concatenate([l["exist"] for l in lvl_data], axis=1)
    cand_obj = jnp.concatenate([l["obj_logit"] for l in lvl_data], axis=1)
    cand_cls = jnp.concatenate([l["cls_logits"] for l in lvl_data], axis=1)

    # ---- pairwise cost (B, T, Ctot), assignment only (stop-grad) ----------
    iou = _plain_iou_xywh(jax.lax.stop_gradient(cand_box)[:, None, :, :],
                          gt_box_px[:, :, None, :])
    mask = cand_exist[:, None, :] & gt_valid[:, :, None]
    iou_m = jnp.clip(iou, 0.0, 1.0) * mask
    onehot = jax.nn.one_hot(gt_cls, nc)                  # (B, T, nc)
    y = jnp.sqrt(jax.nn.sigmoid(jax.lax.stop_gradient(cand_cls))
                 * jax.nn.sigmoid(jax.lax.stop_gradient(cand_obj))[..., None])
    bce_cost = -(onehot[:, :, None, :] * jnp.log(y[:, None] + 1e-8)
                 + (1 - onehot[:, :, None, :]) * jnp.log(1 - y[:, None] + 1e-8))
    cost = bce_cost.sum(-1) + 3.0 * (-jnp.log(iou_m + 1e-8))
    cost = jnp.where(mask, cost, BIG)

    k_top = min(ota_topk, iou_m.shape[-1])
    topk_iou, _ = jax.lax.top_k(iou_m, k_top)
    dyn_k = jnp.clip(jnp.sum(topk_iou, axis=-1).astype(jnp.int32), 1, None)
    order = jnp.argsort(cost, axis=-1)
    ranks = jnp.argsort(order, axis=-1)
    select = (ranks < dyn_k[..., None]) & mask
    # per-COLUMN conflict: the reference reassigns a column selected by
    # >1 gts to the gt with the GLOBALLY lowest cost — argmin over ALL
    # gt rows, selectors or not (loss.py:755-758) — so a contested
    # column can land on a gt that never picked it.  Columns with a
    # single selector are left untouched.
    conflict = jnp.sum(select, axis=1, keepdims=True) > 1  # (B, 1, C)
    row_argmin = jnp.argmin(cost, axis=1)                  # (B, C) first-min
    winner = jnp.swapaxes(
        jax.nn.one_hot(row_argmin, cost.shape[1], dtype=bool), 1, 2)
    select = jnp.where(conflict, winner, select)
    sel_f = select.astype(jnp.float32)                  # (B, T, Ctot)

    # ---- per-level losses over selected (gt, candidate) pairs -------------
    total_box = 0.0
    total_obj = 0.0
    total_cls = 0.0
    centers = sigmoid_bin_centers(bin_count)
    off = 0
    for l in lvl_loss:
        C = l["C"]
        d = l["d"]
        stride = l["stride"]
        sl = sel_f[:, :, off:off + C]                    # (B, T, C)
        n_sel = sl.sum()
        n_den = jnp.maximum(n_sel, 1.0)
        W_l, H_l = d["W"], d["H"]
        t_xy = targets[..., 1:3] * jnp.array([W_l, H_l], jnp.float32)
        t_wh = targets[..., 3:5] * jnp.array([W_l, H_l], jnp.float32)

        xy_grid = (jax.nn.sigmoid(l["ps"][..., 0:2]) * 2.0 - 0.5) + l["cell"]
        if head == "bin":
            reg_scale, vmin, vmax = 2.0, 0.0, 4.0
            step = (vmax - vmin) / bin_count
            tw = t_wh[..., 0][:, :, None] / l["anc"][..., 0][:, None, :]
            th = t_wh[..., 1][:, :, None] / l["anc"][..., 1][:, None, :]
            idx_w = jnp.argmin(jnp.abs(tw[..., None] - centers), axis=-1)
            idx_h = jnp.argmin(jnp.abs(th[..., None] - centers), axis=-1)
            reg_w = (jax.nn.sigmoid(l["w_logits"][..., 0]) * reg_scale
                     - reg_scale / 2.0) * step
            reg_h = (jax.nn.sigmoid(l["h_logits"][..., 0]) * reg_scale
                     - reg_scale / 2.0) * step
            pw = jnp.clip(reg_w[:, None, :] + centers[idx_w], vmin, vmax) \
                * l["anc"][..., 0][:, None, :]
            ph = jnp.clip(reg_h[:, None, :] + centers[idx_h], vmin, vmax) \
                * l["anc"][..., 1][:, None, :]
            # SigmoidBin BCE over the selected pairs (w and h separately,
            # each a mean over (n, bin_count) elements)
            for logits, tgt_idx in ((l["w_logits"], idx_w), (l["h_logits"], idx_h)):
                tgt_bins = jax.nn.one_hot(tgt_idx, bin_count)  # (B, T, C, bc)
                lg = logits[:, None, :, 1:]
                bce = jnp.maximum(lg, 0) - lg * tgt_bins + \
                    jnp.log1p(jnp.exp(-jnp.abs(lg)))
                total_box += (bce * sl[..., None]).sum() / (n_den * bin_count)
            pbox = jnp.concatenate([
                jnp.broadcast_to(xy_grid[:, None], sl.shape + (2,)),
                jnp.stack([pw, ph], axis=-1)], axis=-1)
        else:
            wh = (jax.nn.sigmoid(l["ps"][..., 2:4]) * 2.0) ** 2 * l["anc"]
            pbox = jnp.broadcast_to(
                jnp.concatenate([xy_grid, wh], axis=-1)[:, None], sl.shape + (4,))
        tbox = jnp.broadcast_to(
            jnp.concatenate([t_xy, t_wh], axis=-1)[:, :, None], sl.shape + (4,))
        ciou = bbox_ciou(pbox, tbox)                     # (B, T, C)
        total_box += ((1.0 - ciou) * sl).sum() / n_den

        # objectness: tobj[cell] = clamped detached CIoU of its pair
        bidx = jnp.arange(B)[:, None, None]
        anc_id = jnp.broadcast_to(
            jnp.arange(na)[None, None, None, :], d["match_f"].shape
        ).reshape(B, C)
        cid = (bidx * (na * H_l * W_l)
               + anc_id[:, None, :] * (H_l * W_l)
               + l["cell"][..., 1].astype(jnp.int32)[:, None, :] * W_l
               + l["cell"][..., 0].astype(jnp.int32)[:, None, :])  # (B,T,C)
        # duplicate tobj writes (two selected columns sharing a cell)
        # resolve last-write-wins in the reference's emit order: the
        # level pool is (offset-group, anchor, source-target)-ordered
        c_idx = jnp.arange(C)
        t_src = c_idx // (5 * na)
        off_i = (c_idx % (5 * na)) // na
        a_i = c_idx % na
        pri_col = jnp.broadcast_to(
            (off_i * (na * T) + a_i * T + t_src + 1)[None, None, :], sl.shape)
        obj_target = _last_write_obj_target(
            jnp.clip(jax.lax.stop_gradient(ciou), 0.0), sl > 0, pri_col,
            jnp.broadcast_to(cid, sl.shape), B * na * H_l * W_l,
        ).reshape(B, na, H_l, W_l)
        obj_map = d["m"][..., l["obj_idx"]]              # (B, na, H, W)
        total_obj += bce_logits(obj_map, obj_target).mean() * balance[d["lvl"]]

        if nc > 1:
            lg = l["cls_logits"][:, None]                # (B,1,C,nc)
            tgt = jnp.broadcast_to(onehot[:, :, None, :], sl.shape + (nc,))
            total_cls += (bce_logits(jnp.broadcast_to(lg, tgt.shape), tgt)
                          * sl[..., None]).sum() / (n_den * nc)
        off += C
    return total_box, total_obj, total_cls


def _last_write_obj_target(iou_clamped, match, pri, flat_idx, num_segments):
    """tobj with the reference's duplicate-write semantics.

    torch's `tobj[b, a, gj, gi] = iou` with duplicate indices keeps the
    LAST write (CPU order: offset-group-major, then anchor, then target
    — the order build_targets emits candidates).  `pri` encodes that
    order (+1, 0 = unmatched); the per-cell winner is the matched
    candidate with the highest priority, and its clamped IoU is the
    objectness target.
    """
    pri_m = jnp.where(match, pri, 0).reshape(-1)
    seg_pri = jax.ops.segment_max(pri_m, flat_idx.reshape(-1),
                                  num_segments=num_segments)
    win = match & (pri == seg_pri[flat_idx])
    return jax.ops.segment_sum(
        jnp.where(win, iou_clamped, 0.0).reshape(-1), flat_idx.reshape(-1),
        num_segments=num_segments)


def _candidate_priority(T, na, shape):
    """Write-order priority over a (B, T, 5, na) candidate grid."""
    t_idx = jnp.arange(T)[None, :, None, None]
    off_idx = jnp.arange(5)[None, None, :, None]
    a_idx = jnp.arange(na)[None, None, None, :]
    return jnp.broadcast_to(
        off_idx * (na * T) + a_idx * T + t_idx + 1, shape)


def _accumulate_losses(per_level, nc, balance, B):
    total_box = 0.0
    total_obj = 0.0
    total_cls = 0.0
    for d in per_level:
        m, match_f, ciou = d["m"], d["match_f"], d["ciou"]
        H, W, na_, lvl = d["H"], d["W"], d["na"], d["lvl"]
        obj_idx = d["obj_idx"]
        n_match = jnp.maximum(match_f.sum(), 1.0)
        total_box += ((1.0 - ciou) * match_f).sum() / n_match

        # objectness target: IoU at matched cells, duplicate writes
        # resolved last-write-wins exactly as the reference's scatter
        lvl_flat = (d["bidx"] * (na_ * H * W)
                    + jnp.arange(na_)[None, None, None, :] * (H * W)
                    + d["cells_y"][..., None] * W + d["cells_x"][..., None])
        T_ = match_f.shape[1]
        pri = _candidate_priority(T_, na_, match_f.shape)
        obj_target = _last_write_obj_target(
            jnp.clip(jax.lax.stop_gradient(ciou), 0.0), match_f > 0, pri,
            lvl_flat, B * na_ * H * W).reshape(B, na_, H, W)
        obj_loss = bce_logits(m[..., obj_idx], obj_target).mean()
        total_obj += obj_loss * balance[lvl]

        if nc > 1:
            cls_t = jax.nn.one_hot(d["t_cls"], nc, dtype=ciou.dtype)
            cls_logits = d["psel"][..., obj_idx + 1:]
            cls_tgt = jnp.broadcast_to(cls_t[:, :, None, None, :], cls_logits.shape)
            total_cls += (bce_logits(cls_logits, cls_tgt) * match_f[..., None]).sum() / (n_match * nc)
    return total_box, total_obj, total_cls

