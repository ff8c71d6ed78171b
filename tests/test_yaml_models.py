"""YAML model-spec ingestion tests: run reference cfg yamls directly."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hamer_yolo_tpu.models.yolov7.model import (
    init_yolov7, yolov7_forward, yolov7_spec,
)
from hamer_yolo_tpu.models.yolov7.yaml_spec import (
    load_yaml_model_cfg, make_divisible, spec_from_yaml,
)

REF_CFG = "/root/reference/yolo/yolov7/cfg/deploy"

MINI_YAML = {
    "nc": 2,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30], [30, 61, 62, 45]],
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],   # /2
        [-1, 1, "Conv", [32, 3, 2]],   # /4
        [-1, 1, "Conv", [32, 3, 2]],   # /8
        [-1, 1, "Conv", [64, 3, 2]],   # /16
    ],
    "head": [
        [-1, 1, "Conv", [64, 1, 1]],
        [3, 1, "Conv", [32, 1, 1]],
        [[4, 5], 1, "IDetect", ["nc", "anchors"]],
    ],
}


class TestMiniYaml:
    def test_build_and_forward(self):
        spec, cfg = spec_from_yaml(MINI_YAML)
        assert cfg.nc == 2 and cfg.na == 2 and cfg.nl == 2
        assert cfg.strides == (8, 16)
        params = init_yolov7(jax.random.PRNGKey(0), cfg, spec=spec)
        out = yolov7_forward(params, jnp.zeros((1, 64, 64, 3)), cfg, spec=spec)
        # levels: 8x8 and 4x4 at strides 8/16 on 64 input... note first
        # detect input is layer 4 (stride 16!) — this mini net is synthetic;
        # just verify static shape math: 2 anchors * (64+16) cells
        assert out.shape[0] == 1 and out.shape[2] == 7

    def test_make_divisible(self):
        assert make_divisible(100 * 1.25) == 128
        assert make_divisible(3) == 8


@pytest.mark.skipif(not os.path.isdir(REF_CFG), reason="reference cfgs absent")
class TestReferenceYamls:
    def _build(self, name, nc=3, size=64):
        spec, cfg = load_yaml_model_cfg(os.path.join(REF_CFG, name), nc=nc)
        import dataclasses

        cfg = dataclasses.replace(cfg, compute_dtype="float32")
        params = init_yolov7(jax.random.PRNGKey(0), cfg, spec=spec)
        out = yolov7_forward(params, jnp.zeros((1, size, size, 3)), cfg, spec=spec)
        return out, cfg

    def test_yolov7x(self):
        out, cfg = self._build("yolov7x.yaml", size=64)
        # strides 8/16/32 on 64 -> 3*(64+16+4) = 252 per anchor set
        assert out.shape == (1, 3 * (64 + 16 + 4), 8)

    def test_yolov7_w6(self):
        out, cfg = self._build("yolov7-w6.yaml", size=128)
        assert cfg.nl == 4 and cfg.strides == (8, 16, 32, 64)
        n = 3 * (16 ** 2 + 8 ** 2 + 4 ** 2 + 2 ** 2)
        assert out.shape == (1, n, 8)

    def test_yolov7_builtin_matches_yaml(self):
        """The hand-written spec and the yaml-ingested spec agree on
        structure (same op sequence and channel widths)."""
        spec_yaml, cfg = load_yaml_model_cfg(
            os.path.join(REF_CFG, "yolov7.yaml"), nc=3)
        spec_builtin = yolov7_spec()
        assert len(spec_yaml) == len(spec_builtin)
        for a, b in zip(spec_yaml, spec_builtin):
            assert a[1] == b[1], (a, b)
            if a[1] == "C":
                assert a[2][0] == b[2][0], (a, b)


    def test_yolov7_tiny(self):
        out, cfg = self._build("yolov7-tiny.yaml", size=64)
        assert out.shape == (1, 3 * (64 + 16 + 4), 8)

    def test_yolov7_e6e_shortcut(self):
        """e6e uses Shortcut (common.py:84-90) E-ELAN merges; the yaml
        loader must keep them as ADD spec entries (a silently dropped
        layer shifts every later absolute 'from' index)."""
        spec, cfg = load_yaml_model_cfg(
            os.path.join(REF_CFG, "yolov7-e6e.yaml"), nc=3)
        assert len(spec) == 262  # 1:1 with the yaml layer list
        assert sum(1 for _, op, _a in spec if op == "ADD") == 11
        assert cfg.nl == 4


class TestReorgConvFusion:
    """The exact REORG+Conv(3x3/s1) -> 6x6/s2 peephole
    (models/yolov7/model._reorg_conv_fusable, blocks.reorg_conv_block):
    full w6 forward with fusion forced on must match fusion off."""

    def test_w6_forward_matches_unfused(self, monkeypatch):
        import dataclasses

        spec, cfg = load_yaml_model_cfg(
            os.path.join(REF_CFG, "yolov7-w6.yaml"), nc=3)
        cfg = dataclasses.replace(cfg, compute_dtype="float32")
        params = init_yolov7(jax.random.PRNGKey(0), cfg, spec=spec)
        x = jnp.asarray(np.random.default_rng(0).random(
            (1, 128, 128, 3), np.float32))

        monkeypatch.setenv("HYT_FUSE_REORG", "0")
        ref = np.asarray(yolov7_forward(params, x, cfg, spec=spec))
        monkeypatch.setenv("HYT_FUSE_REORG", "1")
        fused = np.asarray(yolov7_forward(params, x, cfg, spec=spec))
        np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-4)
