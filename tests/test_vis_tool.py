"""Parity: utils/vis_tool.py vs the reference rootnet/vis_tool.py run
in-process (topologies, palettes, draw_pose pixels, draw_pcl rasters).

Reference: /root/reference/rootnet/vis_tool.py (get_sketch_setting:89,
get_sketch_color:220, get_joint_color:286, draw_pose:362, draw_pcl:546,
vis_3d_skeleton:717, draw_mesh:909).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

from hamer_yolo_tpu.utils import vis_tool as vt

DATASETS = ["hands_2017", "FHAD", "nyu", "nyu_all", "icvl", "msra", "itop",
            "shrec", "DHG2016", "mano"]


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, os.path.dirname(__file__))
    import matplotlib
    matplotlib.use("Agg")
    from ref_pipeline_oracle import install_reference_environment
    install_reference_environment()
    spec = importlib.util.spec_from_file_location(
        "ref_vis_tool", "/root/reference/rootnet/vis_tool.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestTopologyTables:
    @pytest.mark.parametrize("ds", DATASETS)
    def test_sketch_setting(self, ref, ds):
        ours = [list(e) for e in vt.get_sketch_setting(ds)]
        theirs = [list(e) for e in ref.get_sketch_setting(ds)]
        assert ours == theirs

    @pytest.mark.parametrize("ds", DATASETS + ["smplerx"])
    def test_sketch_color(self, ref, ds):
        ours = list(vt.get_sketch_color(ds))
        theirs = [c.value for c in ref.get_sketch_color(ds)]
        assert ours == theirs

    @pytest.mark.parametrize("ds", DATASETS + ["smplerx"])
    def test_joint_color(self, ref, ds):
        ours = list(vt.get_joint_color(ds))
        theirs = [c.value for c in ref.get_joint_color(ds)]
        assert ours == theirs


class TestDrawPose:
    @pytest.mark.parametrize("ds", ["hands_2017", "nyu", "msra", "mano"])
    def test_pixel_parity(self, ref, ds):
        rng = np.random.default_rng(0)
        n = {"hands_2017": 21, "nyu": 14, "msra": 21, "mano": 21}[ds]
        pose = rng.uniform(8, 56, (n, 2))
        canvas = np.full((64, 64, 3), 200, np.uint8)
        ours = vt.draw_pose(ds, canvas.copy(), pose.copy())
        theirs = ref.draw_pose(ds, canvas.copy(), pose.copy())
        np.testing.assert_array_equal(ours, theirs)

    def test_short_pose_truncates_edges(self, ref):
        # fewer joints than the topology: the edge loop must stop early.
        pose = np.random.default_rng(1).uniform(5, 27, (8, 2))
        canvas = np.full((32, 32, 3), 255, np.uint8)
        ours = vt.draw_pose("hands_x", canvas.copy(), pose.copy())
        theirs = ref.draw_pose("hands_x", canvas.copy(), pose.copy())
        np.testing.assert_array_equal(ours, theirs)

    def test_draw_point(self, ref):
        pose = np.random.default_rng(2).uniform(4, 28, (21, 2))
        canvas = np.zeros((32, 32, 3), np.uint8)
        ours = vt.draw_point("mano", canvas.copy(), pose.copy())
        theirs = ref.draw_point("mano", canvas.copy(), pose.copy())
        np.testing.assert_array_equal(ours, theirs)


class TestDrawPcl:
    def test_matches_reference(self, ref):
        import torch
        rng = np.random.default_rng(3)
        pcl = rng.uniform(-1.3, 1.3, (4, 200, 3)).astype(np.float32)
        ours = vt.draw_pcl(pcl, 32)
        theirs = ref.draw_pcl(torch.from_numpy(pcl), 32).numpy()
        np.testing.assert_array_equal(ours, theirs)

    def test_background_value(self):
        img = vt.draw_pcl(np.zeros((1, 1, 3)), 8, background_value=0.5)
        assert img.shape == (1, 1, 8, 8)
        assert img[0, 0, 4, 4] == -1.0
        assert (img == 0.5).sum() == 63

    def test_debug_pcl_pose_writes(self, tmp_path):
        rng = np.random.default_rng(4)
        paths = vt.debug_pcl_pose(rng.uniform(-1, 1, (2, 64, 3)),
                                  rng.uniform(-1, 1, (2, 21, 3)),
                                  index=1, dataset="hands_2017",
                                  data_dir=str(tmp_path), name="gt")
        assert len(paths) == 2
        assert all(os.path.exists(p) for p in paths)
        assert paths[0].endswith("2-gt.png")  # B*index + i naming


class Test3DPlots:
    def test_vis_3d_skeleton(self, tmp_path):
        rng = np.random.default_rng(5)
        kpt = rng.normal(size=(21, 3))
        vis = np.ones((21, 1))
        out = str(tmp_path / "skel.png")
        rgb = vt.vis_3d_skeleton(kpt, vis, vt.get_sketch_setting("mano"),
                                 out=out)
        assert rgb.ndim == 3 and rgb.shape[2] == 3
        assert os.path.exists(out)
        # hidden joints must not render identically to visible ones
        rgb2 = vt.vis_3d_skeleton(kpt, np.zeros((21, 1)),
                                  vt.get_sketch_setting("mano"))
        assert not np.array_equal(rgb, rgb2)

    def test_draw_mesh(self, tmp_path):
        verts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
        faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
        out = str(tmp_path / "mesh.png")
        rgb = vt.draw_mesh(verts, faces, path=out)
        assert os.path.exists(out) and rgb.shape[2] == 3
        rgb_na = vt.draw_mesh(verts, faces, with_axis=False)
        assert not np.array_equal(rgb, rgb_na)


class TestHeatmapTiles:
    def test_heatmap_overlay_shapes(self):
        rng = np.random.default_rng(6)
        img = rng.uniform(-1, 1, (2, 16, 16)).astype(np.float32)
        hm = rng.uniform(0, 1, (2, 3, 8, 8)).astype(np.float32)
        out = vt.heatmap_overlay(img, hm, size=24)
        assert out.shape == (2, 3, 24, 24, 3)
        assert np.isfinite(out).all()

    def test_heatmap_overlay_normalize_matches_reference_math(self, ref):
        # oracle: reference debug_2d_heatmap on pre-normalized maps equals
        # our overlay colors (no img term) for the same jet mapping.
        import torch
        rng = np.random.default_rng(7)
        hm = rng.uniform(0, 1, (1, 2, 8, 8)).astype(np.float32)
        theirs = ref.debug_2d_heatmap(torch.from_numpy(hm), 0, ".", 16)
        ours = vt.heatmap_overlay(np.zeros((1, 16, 16), np.float32) - 1.0,
                                  hm, size=16, normalize=False)
        # ours = base(0)/2 + jet color; theirs = jet color (BGR from RGBA
        # slice). Compare the colormap term.
        np.testing.assert_allclose(ours[0, :, :, :, :], theirs, atol=1e-4)

    def test_tile_batch_images(self):
        imgs = [np.full((8, 8, 3), i, np.uint8) for i in range(10)]
        canvas = vt.tile_batch_images(imgs, max_col=4)
        assert canvas.shape == (24, 32, 3)
        single_row = vt.tile_batch_images(imgs[:3], max_col=4)
        assert single_row.shape == (8, 24, 3)
