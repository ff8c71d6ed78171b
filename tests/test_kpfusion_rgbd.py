"""Layer-exact KeypointFusion RGBD parity vs the reference's own modules.

Each piece of the rebuilt stack (models/kpfusion_rgbd) is checked against
the reference's torch code executed through the stub harness.
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
def kpf_env():
    import importlib

    R.install_kpfusion_environment()
    return importlib


def _sd(module, prefix="net"):
    return {f"{prefix}.{k}": np.asarray(v.detach().numpy())
            for k, v in module.state_dict().items()}


def _spread_bn(m):
    import torch

    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                mod.running_mean += torch.randn_like(mod.running_mean) * 0.1
                mod.running_var *= 1.0 + torch.rand_like(mod.running_var) * 0.5


class TestResUnet:
    @pytest.mark.parametrize("in_ch", [1, 3])
    def test_forward_parity(self, kpf_env, in_ch, rng):
        import torch

        ru = kpf_env.import_module("software.KeypointFusion.model.resnetUnet")
        from hamer_yolo_tpu.core.convert import convert_kpf_unet
        from hamer_yolo_tpu.models.kpfusion_rgbd import resunet as RU

        torch.manual_seed(in_ch)
        cls = (ru.OfficialResNetUnet if in_ch == 1
               else ru.OfficialResNetUnet_RGB2offset_3D)
        m = cls("resnet-18", 21, pretrain=False, deconv_dim=128,
                out_dim_list=[21 * 3, 21, 21])
        _spread_bn(m)
        m.eval()
        x = rng.normal(size=(1, in_ch, 128, 128)).astype(np.float32)
        with torch.no_grad():
            ref_res, ref_feat = m(torch.from_numpy(x))

        p = jax.tree_util.tree_map(
            jnp.asarray, convert_kpf_unet(_sd(m), "net"))
        got_res, got_feat = jax.jit(RU.unet_forward)(
            p, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(got_feat), ref_feat.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got_res), ref_res.numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=1e-4)


class TestGeometry:
    @pytest.fixture(scope="class")
    def loader(self, kpf_env):
        pd = kpf_env.import_module(
            "software.KeypointFusion.dataloader.processing_depth")
        ld = pd.loader.__new__(pd.loader)
        ld.img_size = 128
        ld.flip = 1
        ld.sample_num = 1024
        return ld

    @pytest.fixture(scope="class")
    def coords(self):
        rng = np.random.default_rng(0)
        B, N, J = 2, 64, 21
        paras = np.tile(np.array([906.96, 906.79, 956.75, 547.23],
                                 np.float32), (B, 1))
        center = rng.uniform(200, 800, (B, 3)).astype(np.float32)
        center[:, 2] = rng.uniform(300, 700, B)
        M = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        M[:, 0, 0] = M[:, 1, 1] = 0.45
        M[:, 0, 2] = rng.uniform(-150, -50, B)
        M[:, 1, 2] = rng.uniform(-150, -50, B)
        cube = np.tile(np.array([250.0, 250.0, 250.0], np.float32), (B, 1))
        uvd = rng.uniform(-0.9, 0.9, (B, N, 3)).astype(np.float32)
        return dict(B=B, N=N, J=J, paras=paras, center=center, M=M,
                    cube=cube, uvd=uvd)

    def test_uvd_xyz_roundtrip_parity(self, loader, coords):
        import torch

        from hamer_yolo_tpu.models.kpfusion_rgbd import geometry as G

        t = {k: torch.from_numpy(v) for k, v in coords.items()
             if isinstance(v, np.ndarray)}
        ref_xyz = loader.uvd_nl2xyznl_tensor(
            t["uvd"], t["center"], t["M"], t["cube"], t["paras"]).numpy()
        got_xyz = np.asarray(G.uvd_nl2xyznl(
            jnp.asarray(coords["uvd"]), jnp.asarray(coords["center"]),
            jnp.asarray(coords["M"]), jnp.asarray(coords["cube"]),
            jnp.asarray(coords["paras"])))
        np.testing.assert_allclose(got_xyz, ref_xyz, atol=1e-4, rtol=1e-4)

        ref_back = loader.xyz_nl2uvdnl_tensor(
            torch.from_numpy(ref_xyz), t["center"], t["M"], t["cube"],
            t["paras"]).numpy()
        got_back = np.asarray(G.xyz_nl2uvdnl(
            jnp.asarray(got_xyz), jnp.asarray(coords["center"]),
            jnp.asarray(coords["M"]), jnp.asarray(coords["cube"]),
            jnp.asarray(coords["paras"])))
        np.testing.assert_allclose(got_back, ref_back, atol=1e-4, rtol=1e-4)

    def test_img2pcl_index_and_gam(self, loader, coords, rng):
        import torch

        from hamer_yolo_tpu.models.kpfusion_rgbd import geometry as G

        B = coords["B"]
        img = rng.uniform(-1, 1, (B, 1, 32, 32)).astype(np.float32)
        pcl = rng.uniform(-1, 1, (B, 128, 3)).astype(np.float32)
        t = {k: torch.from_numpy(v) for k, v in coords.items()
             if isinstance(v, np.ndarray)}
        ref_cl, ref_idx = loader.img2pcl_index(
            torch.from_numpy(pcl), torch.from_numpy(img), t["center"],
            t["M"], t["cube"], t["paras"], select_num=4)
        got_cl, got_idx = G.img2pcl_index(
            jnp.asarray(pcl), jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(coords["center"]), jnp.asarray(coords["M"]),
            jnp.asarray(coords["cube"]), jnp.asarray(coords["paras"]),
            select_num=4)
        np.testing.assert_array_equal(np.asarray(got_idx), ref_idx.numpy())
        np.testing.assert_allclose(np.asarray(got_cl), ref_cl.numpy(),
                                   atol=1e-4, rtol=1e-3)

        joints = rng.uniform(-0.8, 0.8, (B, coords["J"], 3)).astype(np.float32)
        ref_gam = loader.img2anchor_dis(
            torch.from_numpy(joints), torch.from_numpy(img), t["center"],
            t["M"], t["cube"], t["paras"]).numpy()
        got_gam = np.asarray(G.img2anchor_dis(
            jnp.asarray(joints), jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(coords["center"]), jnp.asarray(coords["M"]),
            jnp.asarray(coords["cube"]), jnp.asarray(coords["paras"])))
        np.testing.assert_allclose(got_gam, ref_gam, atol=1e-4, rtol=1e-3)

    def test_offset_maps_parity(self, kpf_env, rng):
        import torch

        mm = kpf_env.import_module("software.KeypointFusion.model.model")
        from hamer_yolo_tpu.models.kpfusion_rgbd import geometry as G

        B, J, fs = 2, 21, 32
        joint = rng.uniform(-0.8, 0.8, (B, J, 3)).astype(np.float32)
        img = rng.uniform(-1, 1, (B, 1, 128, 128)).astype(np.float32)
        ref_off = mm.joint2offset(torch.from_numpy(joint),
                                  torch.from_numpy(img), 0.8, fs).numpy()
        got_off = np.asarray(G.joint2offset(jnp.asarray(joint),
                                            jnp.asarray(img), 0.8, fs))
        np.testing.assert_allclose(got_off, ref_off, atol=1e-4, rtol=1e-3)

        offset5 = rng.normal(size=(B, 5 * J, fs, fs)).astype(np.float32)
        ref_j = mm.offset2joint_weight(torch.from_numpy(offset5),
                                       torch.from_numpy(img), 0.8).numpy()
        got_j = np.asarray(G.offset2joint_weight(jnp.asarray(offset5),
                                                 jnp.asarray(img), 0.8))
        np.testing.assert_allclose(got_j, ref_j, atol=1e-4, rtol=1e-3)

        pcl = rng.uniform(-1, 1, (B, 96, 3)).astype(np.float32)
        ref_p = mm.pcl_joint2offset(torch.from_numpy(joint),
                                    torch.from_numpy(pcl), 0.8).numpy()
        got_p = np.asarray(G.pcl_joint2offset(jnp.asarray(joint),
                                              jnp.asarray(pcl), 0.8))
        np.testing.assert_allclose(got_p, ref_p, atol=1e-4, rtol=1e-3)

    def test_joint2heatmap_parity(self, kpf_env, rng):
        import torch

        gf = kpf_env.import_module("software.KeypointFusion.util.generateFeature")
        from hamer_yolo_tpu.models.kpfusion_rgbd import geometry as G

        gfm = gf.GFM()
        joint = rng.uniform(-0.8, 0.8, (2, 21, 2)).astype(np.float32)
        ref_hm = gfm.joint2heatmap(torch.from_numpy(joint), 0.8, 32,
                                   sigma=1).numpy()
        got_hm = np.asarray(G.joint2heatmap(jnp.asarray(joint), 0.8, 32,
                                            sigma=1.0))
        np.testing.assert_allclose(got_hm, ref_hm, atol=1e-5, rtol=1e-4)
