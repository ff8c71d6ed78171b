"""YOLO yaml model-spec ingestion: run any reference cfg yaml directly.

The reference defines its model zoo as YAML layer lists consumed by
``parse_model`` (yolo/yolov7/models/yolo.py:744). This module converts
those yamls (user-supplied data — e.g. cfg/deploy/yolov7x.yaml,
yolov7-w6.yaml, yolov7-tiny.yaml) into this framework's spec tuples, so
every model family the reference ships runs on the same spec-driven
builder without transcription:

- width_multiple/depth_multiple scaling (make_divisible by 8);
- module map: Conv, MP, SP, SPPCSPC, RepConv, Concat, nn.Upsample, ReOrg,
  DownC, Detect/IDetect (IAuxDetect's aux heads are deploy-stripped, as
  the reference does for inference);
- anchors/strides inferred (#detect inputs -> pyramid levels, stride
  doubling from P3=8, or P2/P3 starts per the input's first level).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

from hamer_yolo_tpu.models.yolov7.model import (
    AUXDET, BIN, C, CAT, DET, KPT, MP_, REP, SPP, UP, YoloConfig,
)

# extra ops introduced by larger/smaller family members
REORG, SP_, DOWNC = "REORG", "SP_", "DOWNC"

_ACT_MODULES = {
    "Conv": C,
    "MP": MP_,
    "SP": SP_,
    "SPPCSPC": SPP,
    "RepConv": REP,
    "Concat": CAT,
    "Shortcut": "ADD",  # x[0] + x[1] (common.py:84-90, e6e E-ELAN merge)
    "nn.Upsample": UP,
    "Upsample": UP,
    "ReOrg": REORG,
    "DownC": DOWNC,
    "Detect": DET,
    "IDetect": DET,
    "IAuxDetect": DET,
    "IBin": BIN,
    "IKeypoint": KPT,
    # ghost / swin / stem variants (models/yolov7/variants.py)
    "GhostConv": "GHOSTC",
    "Ghost": "GHOST",
    "GhostCSPA": "GCSPA",
    "GhostCSPB": "GCSPB",
    "GhostCSPC": "GCSPC",
    "GhostSPPCSPC": "GSPP",
    "Stem": "STEM",
    "GhostStem": "GSTEM",
    "SwinTransformerBlock": "SWINB",
    "STCSPA": "STCSPA",
    "STCSPB": "STCSPB",
    "STCSPC": "STCSPC",
    # OREPA deploys to a plain fused RepConv (core/convert._convert_orepa)
    "RepConv_OREPA": REP,
}

# variant ops that take the repeat count n as their 2nd arg (parse_model
# inserts it, models/yolo.py:776-786)
_N_REPEAT_OPS = ("GCSPA", "GCSPB", "GCSPC", "GSPP",
                 "STCSPA", "STCSPB", "STCSPC")
_VARIANT_OPS = ("GHOSTC", "GHOST", "GCSPA", "GCSPB", "GCSPC", "GSPP",
                "STEM", "GSTEM", "SWINB", "STCSPA", "STCSPB", "STCSPC")


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(math.ceil(x / divisor) * divisor))


def spec_from_yaml(cfg_dict: Dict[str, Any], nc: int | None = None,
                   training_form: bool = False,
                   ) -> Tuple[List[Tuple[Any, str, tuple]], YoloConfig]:
    """Reference model yaml dict -> (spec list, YoloConfig).

    ``training_form=True`` keeps IAuxDetect's auxiliary heads (the
    reference's cfg/training/*.yaml run through train_aux.py,
    models/yolo.py:319): the spec ends in an AUXDET op over all 2*nl
    inputs and the training forward emits lead + aux maps for
    ComputeLossAuxOTA. Default (deploy) strips the aux heads exactly as
    the reference does for inference.
    """
    gd = float(cfg_dict.get("depth_multiple", 1.0))
    gw = float(cfg_dict.get("width_multiple", 1.0))
    anchors = cfg_dict["anchors"]
    nc = nc if nc is not None else int(cfg_dict.get("nc", 80))

    spec: List[Tuple[Any, str, tuple]] = []
    det_from = None
    layers = list(cfg_dict["backbone"]) + list(cfg_dict["head"])
    for frm, number, module, args in layers:
        op = _ACT_MODULES.get(module)
        if op is None:
            raise ValueError(f"unsupported module in yaml: {module}")
        frm_t = tuple(frm) if isinstance(frm, (list, tuple)) else frm
        n = max(round(number * gd), 1) if number > 1 else number
        if n != 1 and op != C:
            raise ValueError(f"repeat counts only supported for Conv, got {module}")

        if op == C:
            c2 = make_divisible(args[0] * gw) if args[0] != 3 else args[0]
            k = args[1] if len(args) > 1 else 1
            s = args[2] if len(args) > 2 else 1
            for _ in range(n):
                spec.append((frm_t, C, (c2, k, s)))
                frm_t = -1
        elif op == SPP:
            spec.append((frm_t, SPP, (make_divisible(args[0] * gw),)))
        elif op == REP:
            s_ = int(args[2]) if len(args) > 2 else 1
            spec.append((frm_t, REP, (make_divisible(args[0] * gw),)
                         if s_ == 1 else (make_divisible(args[0] * gw), s_)))
        elif op == DOWNC:
            spec.append((frm_t, DOWNC, (make_divisible(args[0] * gw),)))
        elif op == SP_:
            k = args[0] if args else 3
            spec.append((frm_t, SP_, (k,)))
        elif op in (MP_, CAT, UP, REORG, "ADD"):
            spec.append((frm_t, op, ()))
        elif op in _VARIANT_OPS:
            c2 = make_divisible(args[0] * gw)
            rest = tuple(args[1:])
            if op in _N_REPEAT_OPS:
                rest = (n,) + rest
            elif op == "SWINB":
                # [c2, num_heads, num_layers]
                rest = tuple(args[1:3])
            spec.append((frm_t, op, (c2,) + rest))
        elif op in (DET, BIN, KPT):
            det_from = frm_t
            if module == "IAuxDetect":
                if training_form:
                    op = AUXDET
                else:
                    # deploy strips the aux heads: keep the first half
                    half = len(det_from) // 2
                    det_from = tuple(det_from[:half])
            head_args = ()
            if op == KPT and len(args) > 2:  # [nc, anchors, nkpt]
                head_args = (int(args[2]),)
            spec.append((det_from, op, head_args))

    head_op = spec[-1][1]
    nl = len(det_from) // 2 if head_op == AUXDET else len(det_from)
    # stride pyramid: ReOrg models start at P3=8 despite the extra reorg
    # (w6/e6 use 4 levels 8..64); plain models use 8/16/32.
    strides = tuple(8 * (2 ** i) for i in range(nl))
    flat_anchors = tuple(tuple(a) for a in anchors)
    kw = {}
    if head_op == KPT and spec[-1][2]:
        kw["nkpt"] = spec[-1][2][0]
    cfg = YoloConfig(nc=nc, anchors=flat_anchors, strides=strides, **kw)
    return spec, cfg


def load_yaml_model_cfg(path: str, nc: int | None = None,
                        training_form: bool = False):
    import yaml

    with open(path) as f:
        d = yaml.safe_load(f)
    return spec_from_yaml(d, nc, training_form=training_form)
