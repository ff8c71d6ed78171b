"""YOLOv7 detector: spec-driven graph builder + anchor decode (NHWC).

The reference builds its network from a YAML layer list via ``parse_model``
(yolo/yolov7/models/yolo.py:516-851). Here the same topology (deploy
`cfg/deploy/yolov7.yaml`) is expressed as a Python spec and compiled by
walking the list once at trace time — XLA sees a flat chain of fused
conv+SiLU ops. Route/Concat feature caching mirrors forward_once's y[]
(yolo.py:609-639), computed statically.

Decode parity (yolo.py:31-146 Detect/IDetect inference):
  xy = (2*sigmoid - 0.5 + grid) * stride, wh = (2*sigmoid)^2 * anchor,
  flattened in (anchor, row, col) order per level, levels concatenated
  P3(80x80) -> P4(40x40) -> P5(20x20) at 640 input => (B, 25200, nc+5).

ImplicitA/ImplicitM of IDetect are fused into the head convs at weight
conversion (IDetect.fuse, yolo.py:186-198), so the deploy graph here is
identical for Detect and IDetect checkpoints.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hamer_yolo_tpu.core import nn
from hamer_yolo_tpu.models.yolov7 import blocks as B

# --- Architecture spec -----------------------------------------------------
# Entries: (from, op, args). from: int or tuple of ints (negative = relative).
# ops: C(c2, k, s) conv+bn+silu; MP maxpool2x2; CAT concat; SPP SPPCSPC(c2);
# UP nearest2x; REP RepConv(c2); DET detect head.

C, MP_, CAT, SPP, UP, REP, DET = "C", "MP", "CAT", "SPP", "UP", "REP", "DET"
# IBin / IKeypoint head variants (models/yolov7/heads.py)
BIN, KPT = "BIN", "KPT"
# IAuxDetect training form (models/yolo.py:319): 2*nl inputs — nl lead
# heads (m) + nl auxiliary heads (m2). Inference uses only the lead maps
# (the reference deploy-strips m2); training emits both for
# ComputeLossAuxOTA.
AUXDET = "AUXDET"


def _variants():
    from hamer_yolo_tpu.models.yolov7 import variants
    return variants


def _elan(c_mid: int, c_out: int) -> List[Tuple[Any, str, tuple]]:
    """ELAN block: 2 parallel 1x1 + chain of four 3x3, concat 4 taps, 1x1 out."""
    return [
        (-1, C, (c_mid, 1, 1)),
        (-2, C, (c_mid, 1, 1)),
        (-1, C, (c_mid, 3, 1)),
        (-1, C, (c_mid, 3, 1)),
        (-1, C, (c_mid, 3, 1)),
        (-1, C, (c_mid, 3, 1)),
        ((-1, -3, -5, -6), CAT, ()),
        (-1, C, (c_out, 1, 1)),
    ]


def _elan_head(c_mid: int, c_out: int) -> List[Tuple[Any, str, tuple]]:
    """Head ELAN: denser taps (all six intermediate outputs concatenated)."""
    half = c_mid // 2
    return [
        (-1, C, (c_mid, 1, 1)),
        (-2, C, (c_mid, 1, 1)),
        (-1, C, (half, 3, 1)),
        (-1, C, (half, 3, 1)),
        (-1, C, (half, 3, 1)),
        (-1, C, (half, 3, 1)),
        ((-1, -2, -3, -4, -5, -6), CAT, ()),
        (-1, C, (c_out, 1, 1)),
    ]


def _down(c: int) -> List[Tuple[Any, str, tuple]]:
    """MP-Conv downsampling: parallel maxpool+1x1 / 1x1+3x3s2, concat."""
    return [
        (-1, MP_, ()),
        (-1, C, (c, 1, 1)),
        (-3, C, (c, 1, 1)),
        (-1, C, (c, 3, 2)),
        ((-1, -3), CAT, ()),
    ]


def yolov7_spec() -> List[Tuple[Any, str, tuple]]:
    """Deploy YOLOv7 (cfg/deploy/yolov7.yaml topology), 106 layers."""
    spec: List[Tuple[Any, str, tuple]] = []
    # Backbone
    spec += [(-1, C, (32, 3, 1)), (-1, C, (64, 3, 2)), (-1, C, (64, 3, 1)),
             (-1, C, (128, 3, 2))]                      # 0-3
    spec += _elan(64, 256)                              # 4-11
    spec += _down(128)                                  # 12-16 (P3 in)
    spec += _elan(128, 512)                             # 17-24
    spec += _down(256)                                  # 25-29 (P4 in)
    spec += _elan(256, 1024)                            # 30-37
    spec += _down(512)                                  # 38-42 (P5 in)
    spec += _elan(256, 1024)                            # 43-50
    # Head
    spec += [(-1, SPP, (512,))]                         # 51
    spec += [(-1, C, (256, 1, 1)), (-1, UP, ()), (37, C, (256, 1, 1)),
             ((-1, -2), CAT, ())]                       # 52-55
    spec += _elan_head(256, 256)                        # 56-63
    spec += [(-1, C, (128, 1, 1)), (-1, UP, ()), (24, C, (128, 1, 1)),
             ((-1, -2), CAT, ())]                       # 64-67
    spec += _elan_head(128, 128)                        # 68-75
    spec += [(-1, MP_, ()), (-1, C, (128, 1, 1)), (-3, C, (128, 1, 1)),
             (-1, C, (128, 3, 2)), ((-1, -3, 63), CAT, ())]  # 76-80
    spec += _elan_head(256, 256)                        # 81-88
    spec += [(-1, MP_, ()), (-1, C, (256, 1, 1)), (-3, C, (256, 1, 1)),
             (-1, C, (256, 3, 2)), ((-1, -3, 51), CAT, ())]  # 89-93
    spec += _elan_head(512, 512)                        # 94-101
    spec += [(75, REP, (256,)), (88, REP, (512,)), (101, REP, (1024,))]  # 102-104
    spec += [((102, 103, 104), DET, ())]                # 105
    return spec


YOLOV7_ANCHORS = np.array(
    [
        [[12, 16], [19, 36], [40, 28]],      # P3/8
        [[36, 75], [76, 55], [72, 146]],     # P4/16
        [[142, 110], [192, 243], [459, 401]],  # P5/32
    ],
    np.float32,
)
YOLOV7_STRIDES = (8, 16, 32)


@dataclass(frozen=True)
class YoloConfig:
    nc: int = 3  # hand detector classes (config/yolo_config.py:9)
    img_size: int = 640
    anchors: tuple = tuple(map(tuple, YOLOV7_ANCHORS.reshape(3, 6).tolist()))
    strides: tuple = YOLOV7_STRIDES
    # bf16 conv backbone (the reference runs the detector in fp16,
    # yolo/detector.py:111); decode runs in f32.
    compute_dtype: str = "bfloat16"
    # IBin / IKeypoint head parameters (heads.py; only used when the spec
    # ends in a BIN/KPT op).
    bin_count: int = 21
    nkpt: int = 17

    @property
    def no(self) -> int:
        return self.nc + 5

    @property
    def nl(self) -> int:
        return len(self.strides)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2


def _resolve(frm, idx: int) -> List[int]:
    frs = frm if isinstance(frm, tuple) else (frm,)
    return [idx + f if f < 0 else f for f in frs]


def init_yolov7(key: jax.Array, cfg: YoloConfig = YoloConfig(),
                deploy: bool = True, spec=None) -> nn.Params:
    """Build parameter pytree by walking the spec and tracking channels.

    ``spec`` defaults to the built-in deploy yolov7; pass the output of
    yaml_spec.load_yaml_model_cfg for other family members (x/w6/tiny/...).
    """
    spec = spec if spec is not None else yolov7_spec()
    keys = jax.random.split(key, len(spec) + 3)
    channels: List[int] = []
    layers: List[Any] = []
    c_in_img = 3
    for i, (frm, op, args) in enumerate(spec):
        srcs = _resolve(frm, i)
        if i == 0:
            c_srcs = [c_in_img]
        else:
            c_srcs = [channels[s] for s in srcs]
        c1 = c_srcs[0]
        if op == C:
            c2, k, s = args
            layers.append(B.conv_block_init(keys[i], c1, c2, k, s, deploy))
        elif op == MP_:
            c2 = c1
            layers.append(None)
        elif op == CAT:
            c2 = sum(c_srcs)
            layers.append(None)
        elif op == "ADD":  # Shortcut (common.py:84-90): x[0] + x[1]
            c2 = c1
            layers.append(None)
        elif op == SPP:
            (c2,) = args
            layers.append(B.sppcspc_init(keys[i], c1, c2, deploy=deploy))
        elif op == UP:
            c2 = c1
            layers.append(None)
        elif op == "REORG":
            c2 = 4 * c1
            layers.append(None)
        elif op == "SP_":
            c2 = c1
            layers.append(None)
        elif op == "DOWNC":
            (c2,) = args
            k1, k2, k3 = jax.random.split(keys[i], 3)
            layers.append({
                "cv1": B.conv_block_init(k1, c1, c1, 1, 1, deploy),
                "cv2": B.conv_block_init(k2, c1, c2 // 2, 3, 2, deploy),
                "cv3": B.conv_block_init(k3, c1, c2 // 2, 1, 1, deploy),
            })
        elif op == REP:
            c2 = args[0]
            layers.append(B.repconv_init(keys[i], c1, c2, deploy=deploy))
        elif op in _variants().VARIANT_OPS:
            V = _variants()
            layers.append(V.init_variant(op, keys[i], c1, args, deploy))
            c2 = V.out_channels(op, c1, args)
        elif op == DET:
            heads = []
            det_keys = jax.random.split(keys[i], len(srcs))
            for j, s in enumerate(srcs):
                heads.append(nn.conv_init(det_keys[j], 1, channels[s], cfg.na * cfg.no, bias=True))
            layers.append({"m": heads})
            c2 = 0
        elif op == AUXDET:
            # first half: lead heads (IAuxDetect.m, ia/im fused — exact at
            # init and for converted fused ckpts); second half: aux heads
            # (IAuxDetect.m2, plain convs in the reference too).
            half = len(srcs) // 2
            det_keys = jax.random.split(keys[i], len(srcs))
            lead = [nn.conv_init(det_keys[j], 1, channels[s], cfg.na * cfg.no,
                                 bias=True) for j, s in enumerate(srcs[:half])]
            aux = [nn.conv_init(det_keys[half + j], 1, channels[s],
                                cfg.na * cfg.no, bias=True)
                   for j, s in enumerate(srcs[half:])]
            layers.append({"m": lead, "m2": aux})
            c2 = 0
        elif op == BIN:
            from hamer_yolo_tpu.models.yolov7 import heads as H

            layers.append(H.init_bin_head(
                keys[i], [channels[s] for s in srcs], cfg.na, cfg.nc,
                cfg.bin_count))
            c2 = 0
        elif op == KPT:
            from hamer_yolo_tpu.models.yolov7 import heads as H

            layers.append(H.init_keypoint_head(
                keys[i], [channels[s] for s in srcs], cfg.na, cfg.nc,
                cfg.nkpt))
            c2 = 0
        else:
            raise ValueError(op)
        channels.append(c2)
    return {"layers": layers}


def _save_set(spec) -> set:
    saved = set()
    for i, (frm, op, args) in enumerate(spec):
        for s in _resolve(frm, i):
            if s != i - 1:
                saved.add(s)
    return saved


def _reorg_conv_fusable(spec, params, i: int, saved) -> bool:
    """True when spec[i] (REORG) feeds only spec[i+1] = Conv(k=3, s=1)
    with a plain bf16/f32 weight — the exact-fusion peephole conditions
    (HYT_FUSE_REORG: 1/0/auto, auto = on for TPU where the unfused
    C_in=12 conv is lane-padding-bound)."""
    knob = os.environ.get("HYT_FUSE_REORG", "auto")
    if knob == "0":
        return False
    if knob == "auto":
        try:
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return False
        except Exception:
            return False
    if i + 1 >= len(spec) or i in saved:
        return False
    frm, op, args = spec[i + 1]
    if op != C or frm != -1 or len(args) < 3 or args[1] != 3 or args[2] != 1:
        return False
    p = params["layers"][i + 1]
    w = p.get("conv", {}).get("w") if isinstance(p, dict) else None
    return w is not None and not isinstance(w, dict) and w.shape[0] == 3


def yolov7_backbone_forward(params: nn.Params, x: jax.Array,
                            cfg: YoloConfig = YoloConfig(),
                            spec=None) -> List[jax.Array]:
    """x: (B, H, W, 3) in [0, 1] -> list of nl raw head maps (B, Hl, Wl, na*no)."""
    spec = spec if spec is not None else yolov7_spec()
    saved = _save_set(spec)
    y: Dict[int, jax.Array] = {}
    out = x.astype(jnp.dtype(cfg.compute_dtype))
    det_maps: List[jax.Array] = []
    fused_skip = -1
    for i, (frm, op, args) in enumerate(spec):
        if i == fused_skip:  # consumed by the fused REORG+Conv below
            if i in saved:
                y[i] = out
            continue
        srcs = _resolve(frm, i)
        inputs = [out if s == i - 1 else y[s] for s in srcs]
        p = params["layers"][i]
        if op == C:
            out = B.conv_block(p, inputs[0], s=args[2])
        elif op == MP_:
            out = B.mp(inputs[0])
        elif op == CAT:
            out = jnp.concatenate(inputs, axis=-1)
        elif op == "ADD":
            out = inputs[0] + inputs[1]
        elif op == SPP:
            out = B.sppcspc(p, inputs[0])
        elif op == UP:
            out = B.upsample2x(inputs[0])
        elif op == "REORG":
            if _reorg_conv_fusable(spec, params, i, saved):
                # exact peephole: ReOrg + 3x3/s1 Conv = one 6x6/s2 conv
                # on the raw image (blocks.reorg_conv_block)
                out = B.reorg_conv_block(params["layers"][i + 1], inputs[0])
                fused_skip = i + 1
                continue
            out = B.reorg(inputs[0])
        elif op == "SP_":
            out = B.sp(inputs[0], args[0] if args else 3)
        elif op == "DOWNC":
            a = B.conv_block(p["cv2"], B.conv_block(p["cv1"], inputs[0]), s=2)
            b = B.conv_block(p["cv3"], B.mp(inputs[0]))
            out = jnp.concatenate([a, b], axis=-1)
        elif op == REP:
            out = B.repconv(p, inputs[0], s=args[1] if len(args) > 1 else 1)
        elif op in _variants().VARIANT_OPS:
            out = _variants().apply_variant(op, p, inputs[0], args)
        elif op == DET or op == BIN:
            for head_p, inp in zip(p["m"], inputs):
                det_maps.append(nn.conv2d(head_p, inp, stride=1, padding=0))
            out = inputs[-1]
        elif op == AUXDET:
            # inference: lead heads only (IAuxDetect returns z from
            # x[:nl], models/yolo.py:356-372)
            for head_p, inp in zip(p["m"], inputs[:len(p["m"])]):
                det_maps.append(nn.conv2d(head_p, inp, stride=1, padding=0))
            out = inputs[-1]
        elif op == KPT:
            # IKeypoint: concat [fused det conv | kpt conv] channels
            # (models/yolo.py:264) before the (na, no) reshape.
            for head_p, kpt_p, inp in zip(p["m"], p["m_kpt"], inputs):
                d = nn.conv2d(head_p, inp, stride=1, padding=0)
                k = nn.conv2d(kpt_p, inp, stride=1, padding=0)
                det_maps.append(jnp.concatenate([d, k], axis=-1))
            out = inputs[-1]
        if i in saved:
            y[i] = out
    return det_maps


def yolov7_train_forward(params: nn.Params, x: jax.Array,
                         cfg: YoloConfig = YoloConfig(),
                         spec=None):
    """Training forward: batch-stat BN (torch semantics) in one pass.

    Returns (det_maps, new_params) where new_params carries the updated BN
    running stats (momentum 0.03, initialize_weights parity). The stats are
    stop-gradiented; assign them into the train state after the optimizer
    step.
    """
    spec = spec if spec is not None else yolov7_spec()
    saved = _save_set(spec)
    y: Dict[int, jax.Array] = {}
    out = x.astype(jnp.dtype(cfg.compute_dtype))
    det_maps: List[jax.Array] = []
    new_layers = list(params["layers"])
    for i, (frm, op, args) in enumerate(spec):
        srcs = _resolve(frm, i)
        inputs = [out if s == i - 1 else y[s] for s in srcs]
        p = params["layers"][i]
        if op == C:
            out, new_layers[i] = B.conv_block_train(p, inputs[0], s=args[2])
        elif op == MP_:
            out = B.mp(inputs[0])
        elif op == CAT:
            out = jnp.concatenate(inputs, axis=-1)
        elif op == "ADD":
            out = inputs[0] + inputs[1]
        elif op == SPP:
            out, new_layers[i] = B.sppcspc_train(p, inputs[0])
        elif op == UP:
            out = B.upsample2x(inputs[0])
        elif op == "REORG":
            out = B.reorg(inputs[0])
        elif op == "SP_":
            out = B.sp(inputs[0], args[0] if args else 3)
        elif op == "DOWNC":
            new_p = dict(p)
            a0, new_p["cv1"] = B.conv_block_train(p["cv1"], inputs[0])
            a, new_p["cv2"] = B.conv_block_train(p["cv2"], a0, s=2)
            b, new_p["cv3"] = B.conv_block_train(p["cv3"], B.mp(inputs[0]))
            out = jnp.concatenate([a, b], axis=-1)
            new_layers[i] = new_p
        elif op == REP:
            out, new_layers[i] = B.repconv_train(p, inputs[0])
        elif op == DET:
            for head_p, inp in zip(p["m"], inputs):
                det_maps.append(nn.conv2d(head_p, inp, stride=1, padding=0))
            out = inputs[-1]
        elif op == AUXDET:
            # training form: lead maps first, then the nl aux maps
            # (IAuxDetect.forward training branch, models/yolo.py:342-353);
            # split with split_aux_maps for ComputeLossAuxOTA.
            half = len(p["m"])
            for head_p, inp in zip(p["m"], inputs[:half]):
                det_maps.append(nn.conv2d(head_p, inp, stride=1, padding=0))
            for head_p, inp in zip(p["m2"], inputs[half:]):
                det_maps.append(nn.conv2d(head_p, inp, stride=1, padding=0))
            out = inputs[-1]
        if i in saved:
            y[i] = out
    return det_maps, {"layers": new_layers}


def split_aux_maps(det_maps: Sequence[jax.Array], spec) -> Tuple[list, list]:
    """(lead_maps, aux_maps) from a training forward over an AUXDET spec;
    aux_maps is empty for plain DET/BIN/KPT heads."""
    if spec[-1][1] != AUXDET:
        return list(det_maps), []
    nl = len(det_maps) // 2
    return list(det_maps[:nl]), list(det_maps[nl:])


def decode_detections(det_maps: Sequence[jax.Array],
                      cfg: YoloConfig = YoloConfig()) -> jax.Array:
    """Raw head maps -> (B, sum(Hl*Wl*na), nc+5) decoded boxes (input-pixel xywh).

    Matches IDetect inference decode incl. flatten order (anchor-major).
    """
    anchors = jnp.asarray(
        np.asarray(cfg.anchors, np.float32).reshape(cfg.nl, cfg.na, 2))
    outs = []
    for lvl, m in enumerate(det_maps):
        m = m.astype(jnp.float32)  # decode in f32
        Bz, H, W, _ = m.shape
        stride = cfg.strides[lvl]
        m = m.reshape(Bz, H, W, cfg.na, cfg.no)
        m = jnp.transpose(m, (0, 3, 1, 2, 4))  # (B, na, H, W, no) torch order
        ys = jax.nn.sigmoid(m)
        gx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        gy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        grid = jnp.stack([gx, gy], axis=-1)  # (H, W, 2)
        xy = (ys[..., 0:2] * 2.0 - 0.5 + grid) * stride
        wh = (ys[..., 2:4] * 2.0) ** 2 * anchors[lvl][None, :, None, None, :]
        out = jnp.concatenate([xy, wh, ys[..., 4:]], axis=-1)
        outs.append(out.reshape(Bz, -1, cfg.no))
    return jnp.concatenate(outs, axis=1)


def yolov7_forward(params: nn.Params, x: jax.Array,
                   cfg: YoloConfig = YoloConfig(), spec=None) -> jax.Array:
    """Full inference graph: image (B, H, W, 3) -> decoded (B, N, nc+5)
    (IKeypoint specs append 3*nkpt keypoint columns)."""
    maps = yolov7_backbone_forward(params, x, cfg, spec=spec)
    head_op = (spec if spec is not None else yolov7_spec())[-1][1]
    if head_op == BIN:
        from hamer_yolo_tpu.models.yolov7 import heads as H

        return H.decode_bin_detections(maps, cfg, cfg.bin_count)
    if head_op == KPT:
        from hamer_yolo_tpu.models.yolov7 import heads as H

        return H.decode_keypoint_detections(maps, cfg, cfg.nkpt)
    return decode_detections(maps, cfg)


def yolov7_ensemble_forward(params_list, x: jax.Array,
                            cfg: YoloConfig = YoloConfig()) -> jax.Array:
    """Multi-checkpoint ensemble: concatenated decoded predictions, NMS'd
    downstream (reference models/experimental.py Ensemble / attempt_load
    with multiple weights)."""
    preds = [yolov7_forward(p, x, cfg) for p in params_list]
    return jnp.concatenate(preds, axis=1)
