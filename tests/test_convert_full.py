"""Full-model converter coverage: every layer of the yolov7 deploy graph.

Builds a torch-layout state dict FROM our own randomly-initialized deploy
params (the exact inverse transposes), runs convert_yolov7_state_dict on
it, and checks the round trip reproduces the original pytree — validating
the converter's spec-index/prefix mapping across all 106 layers, and that
the converted model's forward matches exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.core import convert as cv
from hamer_yolo_tpu.models.yolov7.model import (
    C, DET, REP, SPP, YoloConfig, init_yolov7, yolov7_forward, yolov7_spec,
)


def _inv_conv(p):
    """Our {"w" HWIO, "b"} deploy conv -> torch-layout fused-conv keys."""
    out = {"conv.weight": np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))}
    if "b" in p:
        out["conv.bias"] = np.asarray(p["b"])
    return out


def pytree_to_torch_sd(params, spec):
    sd = {}
    for i, (frm, op, args) in enumerate(spec):
        p = params["layers"][i]
        prefix = f"model.{i}"
        if op == C:
            for k, v in _inv_conv(p["conv"]).items():
                sd[f"{prefix}.{k}"] = v
        elif op == SPP:
            for name in ("cv1", "cv2", "cv3", "cv4", "cv5", "cv6", "cv7"):
                for k, v in _inv_conv(p[name]["conv"]).items():
                    sd[f"{prefix}.{name}.{k}"] = v
        elif op == REP:
            sd[f"{prefix}.rbr_reparam.weight"] = np.transpose(
                np.asarray(p["reparam"]["w"]), (3, 2, 0, 1))
            sd[f"{prefix}.rbr_reparam.bias"] = np.asarray(p["reparam"]["b"])
        elif op == DET:
            for j, head in enumerate(p["m"]):
                sd[f"{prefix}.m.{j}.weight"] = np.transpose(
                    np.asarray(head["w"]), (3, 2, 0, 1))
                sd[f"{prefix}.m.{j}.bias"] = np.asarray(head["b"])
    return sd


class TestFullConverterRoundTrip:
    def test_all_layers_roundtrip_and_forward(self):
        cfg = YoloConfig(nc=3, img_size=64, compute_dtype="float32")
        spec = yolov7_spec()
        params = init_yolov7(jax.random.PRNGKey(0), cfg, deploy=True)
        sd = pytree_to_torch_sd(params, spec)
        restored = cv.convert_yolov7_state_dict(sd)

        # leaf-exact round trip
        orig_leaves = jax.tree_util.tree_leaves(params)
        rest_leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(jnp.asarray, restored))
        assert len(orig_leaves) == len(rest_leaves)
        for a, b in zip(orig_leaves, rest_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # forward-exact
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (1, 64, 64, 3)).astype(np.float32))
        y1 = np.asarray(yolov7_forward(params, x, cfg))
        y2 = np.asarray(yolov7_forward(
            jax.tree_util.tree_map(jnp.asarray, restored), x, cfg))
        np.testing.assert_array_equal(y1, y2)
