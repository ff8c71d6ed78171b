"""Ghost / Swin / OREPA block variants against the reference's modules.

Each variant is instantiated from the reference's own common.py (via the
stub harness), run in eval mode on random input, and our converted params
must reproduce the forward exactly. Also: yaml_spec ingestion of a cfg
that uses the variants end to end.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import ref_pipeline_oracle as R  # noqa: E402

pytestmark = pytest.mark.skipif(not R.reference_available(),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def common():
    import importlib

    R.install_reference_environment()
    return importlib.import_module("yolov7.models.common")


def _sd(module, prefix="model.3"):
    return {f"{prefix}.{k}": np.asarray(v.detach().numpy())
            for k, v in module.state_dict().items()}


def _run_torch(module, x_nchw):
    import torch

    module.eval()
    with torch.no_grad():
        return module(torch.from_numpy(x_nchw)).numpy()


def _nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def _cmp(ref_nchw, got_nhwc, atol=2e-5):
    np.testing.assert_allclose(np.asarray(got_nhwc),
                               ref_nchw.transpose(0, 2, 3, 1), atol=atol,
                               rtol=1e-4)


class TestGhostFamily:
    def test_ghost_conv(self, common, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_ghost_conv
        from hamer_yolo_tpu.models.yolov7.variants import ghost_conv

        torch.manual_seed(0)
        m = common.GhostConv(16, 32, k=3, s=2)
        _calibrate_bn(m)
        x = rng.normal(size=(2, 16, 16, 16)).astype(np.float32)
        ref = _run_torch(m, x)
        p = jax.tree_util.tree_map(jnp.asarray, _convert_ghost_conv(_sd(m), "model.3"))
        _cmp(ref, ghost_conv(p, _nhwc(x), s=2))

    def test_ghost_bottleneck(self, common, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_ghost_bottleneck
        from hamer_yolo_tpu.models.yolov7.variants import ghost_bottleneck

        for s in (1, 2):
            torch.manual_seed(s)
            m = common.Ghost(24, 24, k=3, s=s)
            _calibrate_bn(m)
            x = np.random.default_rng(s).normal(size=(2, 24, 16, 16)).astype(np.float32)
            ref = _run_torch(m, x)
            p = jax.tree_util.tree_map(jnp.asarray,
                                       _convert_ghost_bottleneck(_sd(m), "model.3"))
            _cmp(ref, ghost_bottleneck(p, _nhwc(x), s=s))

    @pytest.mark.parametrize("variant", ["A", "B", "C"])
    def test_ghost_csp(self, common, variant, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_ghost_csp
        from hamer_yolo_tpu.models.yolov7.variants import _csp_forward, ghost_bottleneck

        torch.manual_seed(3)
        m = getattr(common, f"GhostCSP{variant}")(16, 32, n=2)
        _calibrate_bn(m)
        x = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        ref = _run_torch(m, x)
        p = jax.tree_util.tree_map(
            jnp.asarray, _convert_ghost_csp(_sd(m), "model.3", variant.lower()))
        _cmp(ref, _csp_forward(p, _nhwc(x), variant.lower(), ghost_bottleneck))

    def test_ghost_sppcspc(self, common, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_ghost_sppcspc
        from hamer_yolo_tpu.models.yolov7.variants import ghost_sppcspc

        torch.manual_seed(4)
        m = common.GhostSPPCSPC(32, 32)
        _calibrate_bn(m)
        x = rng.normal(size=(1, 32, 32, 32)).astype(np.float32)
        ref = _run_torch(m, x)
        p = jax.tree_util.tree_map(jnp.asarray,
                                   _convert_ghost_sppcspc(_sd(m), "model.3"))
        _cmp(ref, ghost_sppcspc(p, _nhwc(x)), atol=1e-4)

    @pytest.mark.parametrize("ghost", [False, True])
    def test_stem(self, common, ghost, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_stem
        from hamer_yolo_tpu.models.yolov7.variants import stem_forward

        torch.manual_seed(5)
        m = (common.GhostStem if ghost else common.Stem)(3, 32)
        _calibrate_bn(m)
        x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
        ref = _run_torch(m, x)
        p = jax.tree_util.tree_map(jnp.asarray, _convert_stem(_sd(m), "model.3"))
        _cmp(ref, stem_forward(p, _nhwc(x), ghost=ghost))


class TestSwinFamily:
    def test_swin_block(self, common, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_swin_block
        from hamer_yolo_tpu.models.yolov7.variants import swin_block

        torch.manual_seed(6)
        m = common.SwinTransformerBlock(32, 64, num_heads=2, num_layers=2)
        with torch.no_grad():  # spread the zero-init relative position bias
            for blk in m.blocks:
                blk.attn.relative_position_bias_table += torch.randn_like(
                    blk.attn.relative_position_bias_table) * 0.1
        _calibrate_bn(m)
        # 12x12: not divisible by window 8 -> exercises the padding path
        x = rng.normal(size=(1, 32, 12, 12)).astype(np.float32)
        ref = _run_torch(m, x)
        p = jax.tree_util.tree_map(jnp.asarray,
                                   _convert_swin_block(_sd(m), "model.3"))
        got = swin_block(p, _nhwc(x), num_heads=2)
        _cmp(ref, got, atol=1e-4)

    @pytest.mark.parametrize("variant", ["A", "B", "C"])
    def test_stcsp(self, common, variant, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_stcsp
        from hamer_yolo_tpu.models.yolov7.variants import stcsp_forward

        torch.manual_seed(7)
        m = getattr(common, f"STCSP{variant}")(64, 64, n=2)
        with torch.no_grad():
            for blk in m.m.blocks:
                blk.attn.relative_position_bias_table += torch.randn_like(
                    blk.attn.relative_position_bias_table) * 0.1
        _calibrate_bn(m)
        x = rng.normal(size=(1, 64, 16, 16)).astype(np.float32)
        ref = _run_torch(m, x)
        p = jax.tree_util.tree_map(
            jnp.asarray, _convert_stcsp(_sd(m), "model.3", variant.lower()))
        got = stcsp_forward(p, _nhwc(x), variant.lower(), 64)
        _cmp(ref, got, atol=1e-4)


class TestOREPA:
    def test_repconv_orepa_deploy_fusion(self, common, rng):
        import torch

        from hamer_yolo_tpu.core.convert import _convert_orepa
        from hamer_yolo_tpu.models.yolov7.blocks import repconv

        torch.manual_seed(8)
        m = common.RepConv_OREPA(16, 16, k=3, s=1)
        for bn in m.modules():
            if isinstance(bn, torch.nn.BatchNorm2d):
                bn.eps = 1e-3  # initialize_weights parity
        _calibrate_bn(m)
        x = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
        m.eval()
        ref = _run_torch(m, x)
        # the reference's own switch_to_deploy must agree with itself
        m.switch_to_deploy()
        ref_deploy = _run_torch(m, x)
        np.testing.assert_allclose(ref_deploy, ref, atol=1e-4)

        # convert from the TRAINING-form state dict (saved before deploy)
        torch.manual_seed(8)
        m_train = common.RepConv_OREPA(16, 16, k=3, s=1)
        for bn in m_train.modules():
            if isinstance(bn, torch.nn.BatchNorm2d):
                bn.eps = 1e-3
        _calibrate_bn(m_train)
        p = jax.tree_util.tree_map(jnp.asarray,
                                   _convert_orepa(_sd(m_train), "model.3"))
        _cmp(ref, repconv(p, _nhwc(x)), atol=1e-4)


class TestYamlIngestion:
    def test_variant_cfg_builds_and_runs(self, rng):
        from hamer_yolo_tpu.models.yolov7.model import init_yolov7, yolov7_forward
        from hamer_yolo_tpu.models.yolov7.yaml_spec import spec_from_yaml

        cfg_dict = {
            "nc": 3,
            "depth_multiple": 1.0,
            "width_multiple": 1.0,
            "anchors": [[12, 16, 19, 36, 40, 28],
                        [36, 75, 76, 55, 72, 146],
                        [142, 110, 192, 243, 459, 401]],
            "backbone": [
                [-1, 1, "Stem", [32]],
                [-1, 1, "GhostConv", [64, 3, 2]],
                [-1, 1, "GhostCSPA", [64]],
                [-1, 1, "Ghost", [64, 3, 1]],
                [-1, 1, "Conv", [96, 3, 2]],          # P4
                [-1, 1, "STCSPB", [96]],
                [-1, 1, "RepConv_OREPA", [128, 3, 2]],  # P5
                [-1, 1, "GhostSPPCSPC", [128]],
            ],
            "head": [
                [[3, 5, 7], 1, "IDetect", [3, "anchors"]],
            ],
        }
        spec, cfg = spec_from_yaml(cfg_dict, nc=3)
        import dataclasses
        cfg = dataclasses.replace(cfg, compute_dtype="float32")
        params = init_yolov7(jax.random.PRNGKey(0), cfg, spec=spec)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        out = yolov7_forward(params, x, cfg, spec=spec)
        assert out.shape[-1] == 8
        assert np.isfinite(np.asarray(out)).all()


def _calibrate_bn(m):
    """Write plausible running stats so eval-mode BN is non-trivial."""
    import torch

    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.eps = 1e-3  # initialize_weights parity (torch_utils.py:150)
                mod.running_mean += torch.randn_like(mod.running_mean) * 0.1
                mod.running_var *= (1.0 + torch.rand_like(mod.running_var) * 0.5)
