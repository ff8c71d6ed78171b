"""Training data pipelines (host-side numpy; devices get fixed-shape batches).

Parity targets:
- YOLO detection dataset (reference yolo/yolov7/utils/datasets.py
  LoadImagesAndLabels): YOLO-format txt labels, letterbox, mosaic-4
  augmentation (:723), HSV jitter, random flip; batches are
  (img (B, S, S, 3) float [0, 1], targets (B, T, 5) padded [cls cx cy w h]).
- HaMeR crop dataset (reference hamer/hamer/datasets/vitdet_dataset.py +
  datasets/utils.py get_example): box -> rescaled square crop (2.5x,
  aspect [192, 256]) with scale/rot/flip/color augmentation via the same
  affine machinery as inference.
- Tar-shard streaming (reference image_dataset.load_tars_as_webdataset)
  without the webdataset dependency: plain tarfile iteration yielding
  (key, {ext: bytes}) groups.

All augmentation randomness is numpy-side (the reference's is too);
device code stays deterministic.
"""
from __future__ import annotations

import os
import tarfile
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# YOLO detection dataset
# ---------------------------------------------------------------------------

@dataclass
class YoloDataConfig:
    img_size: int = 640
    max_targets: int = 64
    mosaic: bool = True
    hsv_h: float = 0.015  # hyp.scratch.p5.yaml
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    fliplr: float = 0.5
    # random_perspective params (hyp.scratch.p5.yaml)
    degrees: float = 0.0
    translate: float = 0.2
    scale: float = 0.9
    shear: float = 0.0
    perspective: float = 0.0
    mixup: float = 0.15


def load_yolo_labels(label_path: str) -> np.ndarray:
    """YOLO txt -> (N, 5) [cls, cx, cy, w, h] normalized."""
    if not os.path.exists(label_path):
        return np.zeros((0, 5), np.float32)
    rows = []
    with open(label_path) as f:
        for line in f:
            vals = line.split()
            if len(vals) >= 5:
                rows.append([float(v) for v in vals[:5]])
    return np.asarray(rows, np.float32) if rows else np.zeros((0, 5), np.float32)


def image_label_pairs(img_dir: str, label_dir: Optional[str] = None) -> List[Tuple[str, str]]:
    label_dir = label_dir or img_dir.replace("images", "labels")
    pairs = []
    for f in sorted(os.listdir(img_dir)):
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
            stem = os.path.splitext(f)[0]
            pairs.append((os.path.join(img_dir, f), os.path.join(label_dir, stem + ".txt")))
    return pairs


def augment_hsv(img: np.ndarray, rng: np.random.Generator, cfg: YoloDataConfig) -> np.ndarray:
    import cv2

    r = rng.uniform(-1, 1, 3) * [cfg.hsv_h, cfg.hsv_s, cfg.hsv_v] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(256)
    lut_h = ((x * r[0]) % 180).astype(img.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(img.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(img.dtype)
    hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s), cv2.LUT(val, lut_v)))
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def random_perspective(
    img: np.ndarray,
    targets: np.ndarray,
    rng: np.random.Generator,
    degrees: float = 10.0,
    translate: float = 0.1,
    scale: float = 0.1,
    shear: float = 10.0,
    perspective: float = 0.0,
    border: Tuple[int, int] = (0, 0),
    params: Optional[Tuple[float, ...]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Affine/perspective jitter (reference datasets.py:1032-1121).

    targets: (n, 5) [cls, x1, y1, x2, y2] in PIXELS of ``img``. ``border``
    shrinks the canvas (the mosaic passes (-S/2, -S/2) to cut the 2S
    collage to S). ``params`` overrides the 8 random draws
    (px, py, angle, scale, shear_x_deg, shear_y_deg, tx_frac, ty_frac) —
    drawn from ``rng`` in the reference's exact order otherwise.
    Host-side cv2 (input pipeline; not part of the jitted graph).
    """
    import math as _math

    import cv2

    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2
    if params is None:
        params = (
            rng.uniform(-perspective, perspective),
            rng.uniform(-perspective, perspective),
            rng.uniform(-degrees, degrees),
            rng.uniform(1 - scale, 1.1 + scale),
            rng.uniform(-shear, shear),
            rng.uniform(-shear, shear),
            rng.uniform(0.5 - translate, 0.5 + translate),
            rng.uniform(0.5 - translate, 0.5 + translate),
        )
    px, py, a, s_, sh_x, sh_y, txf, tyf = params

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = px
    P[2, 1] = py
    R = np.eye(3)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s_)
    Sh = np.eye(3)
    Sh[0, 1] = _math.tan(sh_x * _math.pi / 180)
    Sh[1, 0] = _math.tan(sh_y * _math.pi / 180)
    T = np.eye(3)
    T[0, 2] = txf * width
    T[1, 2] = tyf * height
    M = T @ Sh @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                                 borderValue=(114, 114, 114))

    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
        keep = _box_candidates(targets[:, 1:5].T * s_, new.T)
        targets = targets[keep]
        targets[:, 1:5] = new[keep]
    return img, targets


def _box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1, eps=1e-16):
    """reference datasets.py:1124-1129."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & \
        (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def mixup(img: np.ndarray, labels: np.ndarray, img2: np.ndarray,
          labels2: np.ndarray, rng: np.random.Generator
          ) -> Tuple[np.ndarray, np.ndarray]:
    """Beta(8, 8) image blend + label concat (reference train path /
    yolov5-style mixup used at hyp mixup=0.15)."""
    r = rng.beta(8.0, 8.0)
    out = (img.astype(np.float32) * r
           + img2.astype(np.float32) * (1 - r)).astype(img.dtype)
    return out, np.concatenate([labels, labels2], axis=0)


def load_mosaic4(
    pairs: Sequence[Tuple[str, str]],
    indices: Sequence[int],
    rng: np.random.Generator,
    cfg: YoloDataConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """4-image mosaic (reference datasets.py:723-780): 2x2 collage around a
    random center on a 2S canvas, labels to pixel xyxy, then
    random_perspective with border=(-S/2, -S/2) cuts it to S (the
    reference composition; the earlier canvas-resize shortcut is gone)."""
    import cv2

    S = cfg.img_size
    yc, xc = (int(rng.uniform(S * 0.5, S * 1.5)) for _ in range(2))
    canvas = np.full((S * 2, S * 2, 3), 114, np.uint8)
    all_labels = []
    for i, idx in enumerate(indices[:4]):
        img_path, lbl_path = pairs[idx]
        img = cv2.imread(img_path)
        h0, w0 = img.shape[:2]
        r = S / max(h0, w0)
        img = cv2.resize(img, (int(w0 * r), int(h0 * r)))
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, S * 2), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(S * 2, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, S * 2), min(S * 2, yc + h)
            x1b, y1b = 0, 0
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y1b + (y2a - y1a), x1b:x1b + (x2a - x1a)]
        labels = load_yolo_labels(lbl_path)
        if len(labels):
            lab = labels.copy()
            lab[:, 1] = labels[:, 1] * w + x1a - x1b
            lab[:, 2] = labels[:, 2] * h + y1a - y1b
            lab[:, 3] = labels[:, 3] * w
            lab[:, 4] = labels[:, 4] * h
            all_labels.append(lab)
    labels = np.concatenate(all_labels) if all_labels else np.zeros((0, 5), np.float32)
    # xywh (pixels on 2S canvas) -> xyxy, clipped (datasets.py:763-765)
    if len(labels):
        xyxy = labels.copy()
        xyxy[:, 1] = labels[:, 1] - labels[:, 3] / 2
        xyxy[:, 2] = labels[:, 2] - labels[:, 4] / 2
        xyxy[:, 3] = labels[:, 1] + labels[:, 3] / 2
        xyxy[:, 4] = labels[:, 2] + labels[:, 4] / 2
        np.clip(xyxy[:, 1:], 0, 2 * S, out=xyxy[:, 1:])
        labels = xyxy
    canvas, labels = random_perspective(
        canvas, labels, rng, cfg.degrees, cfg.translate, cfg.scale,
        cfg.shear, cfg.perspective, border=(-S // 2, -S // 2))
    # back to normalized xywh for the fixed-shape batch
    if len(labels):
        out = labels.copy()
        out[:, 1] = (labels[:, 1] + labels[:, 3]) / 2 / S
        out[:, 2] = (labels[:, 2] + labels[:, 4]) / 2 / S
        out[:, 3] = (labels[:, 3] - labels[:, 1]) / S
        out[:, 4] = (labels[:, 4] - labels[:, 2]) / S
        labels = out
    return canvas, labels


def load_mosaic9(
    pairs: Sequence[Tuple[str, str]],
    indices: Sequence[int],
    rng: np.random.Generator,
    cfg: YoloDataConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """9-image mosaic (reference datasets.py:782+): 3x3 collage on a 3S
    canvas, random S-crop, labels shifted/clipped accordingly."""
    import cv2

    S = cfg.img_size
    canvas = np.full((S * 3, S * 3, 3), 114, np.uint8)
    all_labels = []
    cells = [(r, c) for r in range(3) for c in range(3)]
    for (r, c), idx in zip(cells, indices[:9]):
        img_path, lbl_path = pairs[idx]
        img = cv2.imread(img_path)
        h0, w0 = img.shape[:2]
        sc = S / max(h0, w0)
        img = cv2.resize(img, (int(w0 * sc), int(h0 * sc)))
        h, w = img.shape[:2]
        y0, x0 = r * S, c * S
        canvas[y0:y0 + h, x0:x0 + w] = img
        labels = load_yolo_labels(lbl_path)
        if len(labels):
            lab = labels.copy()
            lab[:, 1] = labels[:, 1] * w + x0
            lab[:, 2] = labels[:, 2] * h + y0
            lab[:, 3] = labels[:, 3] * w
            lab[:, 4] = labels[:, 4] * h
            all_labels.append(lab)
    labels = np.concatenate(all_labels) if all_labels else np.zeros((0, 5), np.float32)

    # random S x S crop out of the 3S canvas
    yc = int(rng.integers(0, 2 * S))
    xc = int(rng.integers(0, 2 * S))
    crop = canvas[yc:yc + S, xc:xc + S]
    if len(labels):
        labels[:, 1] -= xc
        labels[:, 2] -= yc
        x1 = np.clip(labels[:, 1] - labels[:, 3] / 2, 0, S)
        y1 = np.clip(labels[:, 2] - labels[:, 4] / 2, 0, S)
        x2 = np.clip(labels[:, 1] + labels[:, 3] / 2, 0, S)
        y2 = np.clip(labels[:, 2] + labels[:, 4] / 2, 0, S)
        labels[:, 1] = (x1 + x2) / 2 / S
        labels[:, 2] = (y1 + y2) / 2 / S
        labels[:, 3] = (x2 - x1) / S
        labels[:, 4] = (y2 - y1) / S
        labels = labels[(labels[:, 3] > 2 / S) & (labels[:, 4] > 2 / S)]
    return crop, labels


def yolo_batch_iterator(
    img_dir: str,
    batch_size: int,
    cfg: Optional[YoloDataConfig] = None,
    seed: int = 0,
    label_dir: Optional[str] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite shuffled batches of fixed-shape training data."""
    import cv2

    cfg = cfg or YoloDataConfig()
    pairs = image_label_pairs(img_dir, label_dir)
    rng = np.random.default_rng(seed)
    S, T = cfg.img_size, cfg.max_targets
    while True:
        imgs = np.zeros((batch_size, S, S, 3), np.float32)
        targets = np.zeros((batch_size, T, 5), np.float32)
        for b in range(batch_size):
            if cfg.mosaic:
                idxs = rng.integers(0, len(pairs), 4)
                img, labels = load_mosaic4(pairs, idxs, rng, cfg)
                if cfg.mixup > 0 and rng.uniform() < cfg.mixup:
                    idxs2 = rng.integers(0, len(pairs), 4)
                    img2, labels2 = load_mosaic4(pairs, idxs2, rng, cfg)
                    img, labels = mixup(img, labels, img2, labels2, rng)
            else:
                i = int(rng.integers(0, len(pairs)))
                img = cv2.imread(pairs[i][0])
                h0, w0 = img.shape[:2]
                r = S / max(h0, w0)
                resized = cv2.resize(img, (int(w0 * r), int(h0 * r)))
                img = np.full((S, S, 3), 114, np.uint8)
                img[: resized.shape[0], : resized.shape[1]] = resized
                labels = load_yolo_labels(pairs[i][1])
                if len(labels):
                    labels = labels.copy()
                    labels[:, 1] *= resized.shape[1] / S
                    labels[:, 2] *= resized.shape[0] / S
                    labels[:, 3] *= resized.shape[1] / S
                    labels[:, 4] *= resized.shape[0] / S
            img = augment_hsv(img, rng, cfg)
            if rng.uniform() < cfg.fliplr:
                img = img[:, ::-1]
                if len(labels):
                    labels[:, 1] = 1.0 - labels[:, 1]
            imgs[b] = img[:, :, ::-1].astype(np.float32) / 255.0  # BGR->RGB
            n = min(len(labels), T)
            targets[b, :n] = labels[:n]
        yield {"img": imgs, "targets": targets}


# ---------------------------------------------------------------------------
# HaMeR crop dataset
# ---------------------------------------------------------------------------

@dataclass
class HamerAugConfig:
    # reference configs/__init__.py DATASETS.CONFIG defaults
    scale_factor: float = 0.3
    rot_factor: float = 30.0
    trans_factor: float = 0.02
    color_scale: float = 0.2
    rot_aug_rate: float = 0.6
    do_flip: bool = False
    flip_aug_rate: float = 0.5
    # EFT extreme cropping (configs/__init__.py:66, utils.py:574-586)
    extreme_crop_aug_rate: float = 0.10
    extreme_crop_aug_level: int = 1


def hamer_training_crop(
    img_bgr: np.ndarray,
    center: np.ndarray,
    bbox_size: float,
    rng: np.random.Generator,
    aug: Optional[HamerAugConfig] = None,
    out_size: int = 256,
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
    keypoints_2d: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Dict[str, float]]:
    """One augmented training crop (get_example / do_augmentation parity).

    `keypoints_2d` (44, 3) in pixel coords enables the EFT extreme-crop
    augmentation branch (reference utils.py:574-586, THRESH=4 guard).
    Returns (normalized RGB crop (S, S, 3) float32, aug params applied).
    """
    import cv2

    from hamer_yolo_tpu.io.extreme_crop import (
        extreme_cropping, extreme_cropping_aggressive,
    )

    aug = aug or HamerAugConfig()
    tx = float(np.clip(rng.normal(), -1, 1) * aug.trans_factor)
    ty = float(np.clip(rng.normal(), -1, 1) * aug.trans_factor)
    scale = float(np.clip(rng.normal(), -1, 1) * aug.scale_factor + 1.0)
    rot = float(np.clip(rng.normal(), -2, 2) * aug.rot_factor) \
        if rng.uniform() <= aug.rot_aug_rate else 0.0
    do_flip = aug.do_flip and rng.uniform() <= aug.flip_aug_rate
    do_extreme = rng.uniform() <= aug.extreme_crop_aug_rate
    c_low, c_up = 1 - aug.color_scale, 1 + aug.color_scale
    color = rng.uniform(c_low, c_up, 3)

    c_x, c_y = float(center[0]), float(center[1])
    # The EFT extreme-crop family indexes the 44-keypoint BODY convention
    # (extreme_crop.py body/hip/shoulder ids up to 43); a 21-point hand
    # array must not enter it (reference only applies it from datasets
    # that carry body keypoints).
    if do_extreme and keypoints_2d is not None and keypoints_2d.shape[0] >= 44:
        fn = (extreme_cropping_aggressive if aug.extreme_crop_aug_level == 1
              else extreme_cropping)
        cx1, cy1, w1, h1 = fn(c_x, c_y, bbox_size, bbox_size, keypoints_2d,
                              rng=rng)
        if w1 >= 4 and h1 >= 4:  # reference THRESH=4 skip guard
            c_x, c_y, bbox_size = cx1, cy1, float(max(w1, h1))

    c_x = c_x + tx * bbox_size
    c_y = c_y + ty * bbox_size

    h, w = img_bgr.shape[:2]
    img = img_bgr
    if do_flip:
        img = img[:, ::-1]
        c_x = w - c_x - 1

    # 3-point affine identical to the inference path
    rad = np.pi * rot / 180
    sw = bbox_size * scale

    def rot2d(p):
        return np.array([p[0] * np.cos(rad) - p[1] * np.sin(rad),
                         p[0] * np.sin(rad) + p[1] * np.cos(rad)], np.float32)

    src = np.stack([
        np.array([c_x, c_y], np.float32),
        np.array([c_x, c_y], np.float32) + rot2d([0, sw * 0.5]),
        np.array([c_x, c_y], np.float32) + rot2d([sw * 0.5, 0]),
    ])
    dst = np.array([[out_size / 2, out_size / 2],
                    [out_size / 2, out_size],
                    [out_size, out_size / 2]], np.float32)
    trans = cv2.getAffineTransform(src, dst)
    patch = cv2.warpAffine(img, trans, (out_size, out_size), flags=cv2.INTER_LINEAR)
    patch = patch[:, :, ::-1].astype(np.float32)  # BGR -> RGB
    patch = np.clip(patch * color[None, None, :], 0, 255)
    patch = (patch - 255.0 * np.asarray(mean)) / (255.0 * np.asarray(std))
    return patch.astype(np.float32), {
        "scale": scale, "rot": rot, "do_flip": float(do_flip),
        "tx": tx, "ty": ty,
    }


# ---------------------------------------------------------------------------
# Tar-shard streaming
# ---------------------------------------------------------------------------

def hamer_batch_iterator(
    tar_paths: Sequence[str],
    batch_size: int,
    out_size: int = 256,
    aug: Optional["HamerAugConfig"] = None,
    seed: int = 0,
    infinite: bool = True,
    mocap: Optional["MoCapSource"] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """HaMeR training batches from webdataset-style tar shards.

    Sample layout (reference load_tars_as_webdataset): <key>.jpg + <key>.json
    with optional fields keypoints_2d (21, 3), keypoints_3d (21, 4),
    mano_pose (48,) aa, mano_betas (10,), bbox center/scale. Missing
    annotations become zero-confidence / has_mano_params = 0.

    `mocap` supplies the unpaired MANO samples the adversarial prior
    trains against (reference mocap_dataset.py); without one the batch's
    own params are reused as a stand-in (discriminator loss degenerates
    to a self-consistency regularizer — fine for smoke tests only).
    """
    import json as _json

    import cv2

    rng = np.random.default_rng(seed)
    aug = aug or HamerAugConfig()

    def sample_stream():
        while True:
            for key, sample in iter_tar_samples(tar_paths):
                yield key, sample
            if not infinite:
                return

    from hamer_yolo_tpu.geometry.rotations import aa_to_rotmat
    import jax.numpy as jnp

    stream = sample_stream()
    while True:
        imgs = np.zeros((batch_size, out_size, out_size, 3), np.float32)
        kp2d = np.zeros((batch_size, 21, 3), np.float32)
        kp3d = np.zeros((batch_size, 21, 4), np.float32)
        pose_aa = np.zeros((batch_size, 48), np.float32)
        betas = np.zeros((batch_size, 10), np.float32)
        has_mano = np.zeros((batch_size,), np.float32)
        got = 0
        try:
            while got < batch_size:
                key, sample = next(stream)
                if "jpg" not in sample:
                    continue
                img = cv2.imdecode(np.frombuffer(sample["jpg"], np.uint8),
                                   cv2.IMREAD_COLOR)
                if img is None:
                    continue
                meta = _json.loads(sample.get("json", b"{}"))
                h, w = img.shape[:2]
                center = np.asarray(meta.get("center", [w / 2, h / 2]), np.float32)
                bbox_size = float(meta.get("scale", max(h, w) / 2) )
                crop, aug_params = hamer_training_crop(
                    img, center, bbox_size, rng, aug, out_size)
                imgs[got] = crop
                if "keypoints_2d" in meta:
                    kp2d[got] = np.asarray(meta["keypoints_2d"], np.float32)
                if "keypoints_3d" in meta:
                    kp3d[got] = np.asarray(meta["keypoints_3d"], np.float32)
                if "mano_pose" in meta:
                    pose_aa[got] = np.asarray(meta["mano_pose"], np.float32)
                    betas[got] = np.asarray(meta.get("mano_betas",
                                                     np.zeros(10)), np.float32)
                    has_mano[got] = 1.0
                got += 1
        except StopIteration:
            if got == 0:
                return
        rot = np.asarray(aa_to_rotmat(jnp.asarray(pose_aa.reshape(batch_size, 16, 3))))
        if mocap is not None:
            mocap_pose, mocap_betas = mocap.sample_rotmats(batch_size, rng)
        else:
            mocap_pose, mocap_betas = rot[:, 1:], betas  # stand-in
        yield {
            "img": imgs,
            "keypoints_2d": kp2d,
            "keypoints_3d": kp3d,
            "mano_global_orient": rot[:, :1],
            "mano_hand_pose": rot[:, 1:],
            "mano_betas": betas,
            "has_mano_params": has_mano,
            "mocap_hand_pose": mocap_pose,
            "mocap_betas": mocap_betas,
        }


class MoCapSource:
    """Unpaired MANO parameter pool for the adversarial prior (reference
    hamer/datasets/mocap_dataset.py: npz with hand_pose (N, 48) aa — the
    global orient is dropped — and betas (N, 10))."""

    def __init__(self, dataset_file: str):
        data = np.load(dataset_file)
        self.pose = data["hand_pose"].astype(np.float32)[:, 3:]
        self.betas = data["betas"].astype(np.float32)
        self.length = len(self.pose)

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return {"hand_pose": self.pose[idx].copy(),
                "betas": self.betas[idx].copy()}

    def sample_rotmats(self, n: int,
                       rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
        """n random samples as ((n, 15, 3, 3) rotmats, (n, 10) betas) —
        the form the discriminator consumes (hamer.py training_step)."""
        import jax.numpy as jnp

        from hamer_yolo_tpu.geometry.rotations import aa_to_rotmat

        idx = rng.integers(0, self.length, size=n)
        pose = self.pose[idx].reshape(n, 15, 3)
        return np.asarray(aa_to_rotmat(jnp.asarray(pose))), self.betas[idx]


def write_synthetic_mocap_npz(path: str, n: int = 4096, seed: int = 0) -> str:
    """A stand-in mocap pool when the real CMU/FreiHAND npz is absent:
    MANO poses drawn near the flat-hand mean with per-joint jitter. Same
    npz schema as the reference file, so swapping in the real one is a
    path change."""
    rng = np.random.default_rng(seed)
    hand_pose = np.zeros((n, 48), np.float32)
    hand_pose[:, 3:] = rng.normal(0.0, 0.25, (n, 45)).astype(np.float32)
    betas = rng.normal(0.0, 0.5, (n, 10)).astype(np.float32)
    np.savez(path, hand_pose=hand_pose, betas=betas)
    return path


def iter_tar_samples(tar_paths: Sequence[str]) -> Iterator[Tuple[str, Dict[str, bytes]]]:
    """webdataset-style grouped iteration: consecutive members sharing a
    basename form one sample {ext: bytes}."""
    for path in tar_paths:
        with tarfile.open(path) as tf:
            current_key = None
            sample: Dict[str, bytes] = {}
            for member in tf:
                if not member.isfile():
                    continue
                base, ext = os.path.splitext(os.path.basename(member.name))
                data = tf.extractfile(member).read()
                if current_key is not None and base != current_key:
                    yield current_key, sample
                    sample = {}
                current_key = base
                sample[ext.lstrip(".")] = data
            if current_key is not None and sample:
                yield current_key, sample


# ---------------------------------------------------------------------------
# JSON box-file dataset (reference hamer/datasets/json_dataset.py:46-213)
# ---------------------------------------------------------------------------

class JsonBoxDataset:
    """Images + a JSON file of xyxy boxes -> HaMeR training/eval items.

    Reference parity (json_dataset.py): the JSON holds one [x1, y1, x2, y2]
    per image of the sorted ``*.jpg`` glob of ``img_dir``; center/scale use
    the reference's 200-pixel convention (center = box midpoint, scale =
    2 * (xy2 - xy1) / 200, bbox_size = (scale * 200).max()); ``right``
    stamps the constant handedness flag; optional npz annotations
    (hand_pose (N, 48) aa + has_hand_pose, betas (N, 10) + has_betas,
    hand_keypoints_2d (N, 21, 3), hand_keypoints_3d (N, 21, 4)) fill the
    MANO supervision slots, zeros otherwise. Items carry the same keys the
    reference emits (img, keypoints_2d/3d, box_center, box_size,
    mano_params, has_mano_params, right, imgname, personid, idx).

    train=True routes through the full augmentation crop
    (hamer_training_crop: scale/rot/trans/color + EFT extreme-crop);
    train=False uses the deterministic crop (all aug rates zeroed).
    """

    def __init__(self, dataset_file: str, img_dir: str, right: bool = True,
                 train: bool = False, aug: Optional[HamerAugConfig] = None,
                 out_size: int = 256, annotations_npz: Optional[str] = None,
                 seed: int = 0):
        import glob as _glob
        import json as _json

        boxes = np.asarray(_json.load(open(dataset_file)), np.float32)
        if boxes.ndim == 1:
            boxes = boxes[None]
        self.imgname = sorted(_glob.glob(os.path.join(img_dir, "*.jpg")))
        n = len(boxes)
        self.center = (boxes[:, 2:4] + boxes[:, 0:2]) / 2.0
        self.scale = 2 * (boxes[:, 2:4] - boxes[:, 0:2]) / 200.0
        self.right = np.full(n, 1.0 if right else 0.0, np.float32)
        self.train = train
        self.out_size = out_size
        self.aug = aug or HamerAugConfig()
        if not train:
            self.aug = HamerAugConfig(
                scale_factor=0.0, rot_factor=0.0, trans_factor=0.0,
                color_scale=0.0, rot_aug_rate=0.0, do_flip=False,
                extreme_crop_aug_rate=0.0)
        self.rng = np.random.default_rng(seed)

        def _get(d, key, default):
            return d[key].astype(np.float32) if d is not None and key in d \
                else default

        ann = np.load(annotations_npz) if annotations_npz else None
        self.hand_pose = _get(ann, "hand_pose", np.zeros((n, 48), np.float32))
        self.has_hand_pose = _get(ann, "has_hand_pose", np.zeros(n, np.float32))
        self.betas = _get(ann, "betas", np.zeros((n, 10), np.float32))
        self.has_betas = _get(ann, "has_betas", np.zeros(n, np.float32))
        self.keypoints_2d = _get(ann, "hand_keypoints_2d",
                                 np.zeros((n, 21, 3), np.float32))
        self.keypoints_3d = _get(ann, "hand_keypoints_3d",
                                 np.zeros((n, 21, 4), np.float32))

    def __len__(self) -> int:
        return len(self.scale)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import cv2

        image_file = self.imgname[idx]
        img = cv2.imread(image_file)
        center = self.center[idx].copy()
        bbox_size = float((self.scale[idx] * 200).max())
        crop, aug_params = hamer_training_crop(
            img, center, bbox_size, self.rng, self.aug, self.out_size,
            keypoints_2d=self.keypoints_2d[idx] if self.train else None)
        hand_pose = self.hand_pose[idx]
        return {
            "img": crop,
            "keypoints_2d": self.keypoints_2d[idx].copy(),
            "keypoints_3d": self.keypoints_3d[idx].copy(),
            "orig_keypoints_2d": self.keypoints_2d[idx].copy(),
            "box_center": center,
            "box_size": np.float32(bbox_size),
            "mano_params": {
                "global_orient": hand_pose[:3].copy(),
                "hand_pose": hand_pose[3:].copy(),
                "betas": self.betas[idx].copy(),
            },
            "has_mano_params": {
                "global_orient": self.has_hand_pose[idx].copy(),
                "hand_pose": self.has_hand_pose[idx].copy(),
                "betas": self.has_betas[idx].copy(),
            },
            "right": self.right[idx].copy(),
            "imgname": image_file,
            "personid": np.int32(idx),
            "idx": np.int32(idx),
        }
