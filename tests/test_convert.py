"""Weight-converter golden tests vs live torch modules.

The reference checkpoints aren't available in this environment, so each
converter is validated against a freshly-built torch module with the SAME
layer layout as the reference (conv+BN blocks, RepConv branches, fused-qkv
ViT attention, torchvision BasicBlock), random weights, eval mode.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hamer_yolo_tpu.core import convert as cv  # noqa: E402
from hamer_yolo_tpu.core import nn  # noqa: E402
from hamer_yolo_tpu.models.yolov7 import blocks as B  # noqa: E402


def to_jax_nhwc(x_torch):
    return jnp.asarray(x_torch.detach().numpy().transpose(0, 2, 3, 1))


def from_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


class TestConvBnFold:
    def test_conv_bn_silu(self, rng):
        m = tnn.Sequential()
        m.conv = tnn.Conv2d(8, 16, 3, 2, 1, bias=False)
        m.bn = tnn.BatchNorm2d(16, eps=1e-3)
        m.eval()
        with torch.no_grad():
            m.bn.running_mean.normal_()
            m.bn.running_var.uniform_(0.5, 2.0)
            m.bn.weight.normal_(1.0, 0.2)
            m.bn.bias.normal_()
        sd = {f"m.{k}": v.numpy() for k, v in m.state_dict().items()}
        params = cv._convert_conv_block(sd, "m")
        x = torch.randn(2, 8, 16, 16)
        with torch.no_grad():
            expected = torch.nn.functional.silu(m.bn(m.conv(x))).numpy()
        got = from_nhwc(B.conv_block(params, to_jax_nhwc(x), s=2))
        np.testing.assert_allclose(got, expected, atol=2e-5)


class TestRepConvFuse:
    def _torch_repconv(self, c1, c2):
        m = tnn.Module()
        m.rbr_dense = tnn.Sequential(
            tnn.Conv2d(c1, c2, 3, 1, 1, bias=False), tnn.BatchNorm2d(c2, eps=1e-3))
        m.rbr_1x1 = tnn.Sequential(
            tnn.Conv2d(c1, c2, 1, 1, 0, bias=False), tnn.BatchNorm2d(c2, eps=1e-3))
        if c1 == c2:
            m.rbr_identity = tnn.BatchNorm2d(c1, eps=1e-3)
        for bn in [m.rbr_dense[1], m.rbr_1x1[1]] + ([m.rbr_identity] if c1 == c2 else []):
            with torch.no_grad():
                bn.running_mean.normal_()
                bn.running_var.uniform_(0.5, 2.0)
                bn.weight.normal_(1.0, 0.2)
                bn.bias.normal_()
        m.eval()
        return m

    def test_fused_matches_torch_branches(self):
        m = self._torch_repconv(8, 8)
        sd = {f"m.{k}": v.numpy() for k, v in m.state_dict().items()}
        params = cv._convert_repconv(sd, "m")
        x = torch.randn(2, 8, 12, 12)
        with torch.no_grad():
            y = m.rbr_dense(x) + m.rbr_1x1(x) + m.rbr_identity(x)
            expected = torch.nn.functional.silu(y).numpy()
        got = from_nhwc(B.repconv(params, to_jax_nhwc(x)))
        np.testing.assert_allclose(got, expected, atol=1e-4)


class TestVitAttention:
    def test_fused_qkv_layout(self, rng):
        """torch reference attention (vit.py:89-126 semantics) vs ours."""
        dim, heads = 32, 4
        qkv = tnn.Linear(dim, dim * 3, bias=True)
        proj = tnn.Linear(dim, dim, bias=True)
        x = torch.randn(2, 6, dim)
        with torch.no_grad():
            B_, N, C = x.shape
            t = qkv(x).reshape(B_, N, 3, heads, -1).permute(2, 0, 3, 1, 4)
            q, k, v = t[0], t[1], t[2]
            attn = (q * (C // heads) ** -0.5) @ k.transpose(-2, -1)
            attn = attn.softmax(dim=-1)
            expected = proj((attn @ v).transpose(1, 2).reshape(B_, N, -1)).numpy()
        params = {
            "qkv": {"w": cv.linear_w(qkv.weight.detach().numpy()),
                    "b": qkv.bias.detach().numpy()},
            "proj": {"w": cv.linear_w(proj.weight.detach().numpy()),
                     "b": proj.bias.detach().numpy()},
        }
        got = np.asarray(nn.mha_self_attention(params, jnp.asarray(x.numpy()), heads))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_layer_norm_layout(self):
        dim = 16
        ln = tnn.LayerNorm(dim, eps=1e-6)
        with torch.no_grad():
            ln.weight.normal_(1.0, 0.1)
            ln.bias.normal_()
        x = torch.randn(3, 5, dim)
        expected = ln(x).detach().numpy()
        got = np.asarray(nn.layer_norm(
            {"scale": jnp.asarray(ln.weight.detach().numpy()),
             "bias": jnp.asarray(ln.bias.detach().numpy())},
            jnp.asarray(x.numpy()),
        ))
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestResNetBlock:
    def test_basic_block_inline(self):
        c1, c2 = 8, 16
        m = tnn.Module()
        m.conv1 = tnn.Conv2d(c1, c2, 3, 2, 1, bias=False)
        m.bn1 = tnn.BatchNorm2d(c2)
        m.conv2 = tnn.Conv2d(c2, c2, 3, 1, 1, bias=False)
        m.bn2 = tnn.BatchNorm2d(c2)
        m.downsample = tnn.Sequential(
            tnn.Conv2d(c1, c2, 1, 2, bias=False), tnn.BatchNorm2d(c2))
        for bn in (m.bn1, m.bn2, m.downsample[1]):
            with torch.no_grad():
                bn.running_mean.normal_()
                bn.running_var.uniform_(0.5, 2.0)
                bn.weight.normal_(1.0, 0.2)
                bn.bias.normal_()
        m.eval()
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        # emulate "layer.0" prefix
        sd = {f"layer.0.{k}": v for k, v in sd.items()}
        params = cv._convert_resnet_basic_block(sd, "layer.0")
        x = torch.randn(2, c1, 16, 16)
        with torch.no_grad():
            y = torch.relu(m.bn1(m.conv1(x)))
            y = m.bn2(m.conv2(y))
            expected = torch.relu(y + m.downsample(x)).numpy()
        from hamer_yolo_tpu.models.resnet import _basic_block
        got = from_nhwc(_basic_block(params, to_jax_nhwc(x), stride=2))
        np.testing.assert_allclose(got, expected, atol=2e-5)


class TestDetectFuse:
    def test_implicit_fusion(self):
        """IDetect ia/im fusion (yolo.py:186-198) matches explicit forward."""
        c_in, na_no = 8, 24
        conv = tnn.Conv2d(c_in, na_no, 1, bias=True)
        ia = torch.randn(1, c_in, 1, 1) * 0.1
        im = 1.0 + torch.randn(1, na_no, 1, 1) * 0.1
        x = torch.randn(2, c_in, 4, 4)
        with torch.no_grad():
            expected = (conv(x + ia) * im).numpy()
        sd = {
            "det.m.0.weight": conv.weight.detach().numpy(),
            "det.m.0.bias": conv.bias.detach().numpy(),
            "det.ia.0.implicit": ia.numpy(),
            "det.im.0.implicit": im.numpy(),
        }
        params = cv._convert_detect(sd, "det", n_heads=1)
        got = from_nhwc(nn.conv2d(params["m"][0], to_jax_nhwc(x), 1, 0))
        np.testing.assert_allclose(got, expected, atol=1e-5)
