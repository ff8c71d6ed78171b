"""CLI end-to-end smoke tests (--tiny models, CPU)."""
import json
import os

import numpy as np
import pytest

from hamer_yolo_tpu.cli.main import main
from hamer_yolo_tpu.io.writers import load_hand_npy


@pytest.fixture
def image_dir(tmp_path, rng):
    import cv2

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(2):
        cv2.imwrite(str(d / f"f{i}.jpg"),
                    rng.integers(0, 255, (100, 120, 3)).astype(np.uint8))
    return str(d)


class TestCliInfer:
    def test_infer_end_to_end(self, image_dir, tmp_path):
        out = str(tmp_path / "out")
        rc = main(["infer", "--tiny", "--input", image_dir, "--output", out])
        assert rc == 0
        npys = [f for f in os.listdir(out) if f.endswith(".npy")]
        assert len(npys) == 2
        results = load_hand_npy(os.path.join(out, npys[0]))
        assert set(results) == {"left", "right"}

    def test_infer_batched_matches_single(self, image_dir, tmp_path):
        # --batch N routes through the stage-batched program; per-image
        # npy outputs must match the single-frame program (up to fusion
        # ulps — random-weight score ties can swap slots, so compare
        # the schema + the slot-validity counts + close values where
        # the same hand is present).
        out1 = str(tmp_path / "out_single")
        out2 = str(tmp_path / "out_batched")
        assert main(["infer", "--tiny", "--input", image_dir,
                     "--output", out1, "--no-obj"]) == 0
        assert main(["infer", "--tiny", "--input", image_dir,
                     "--output", out2, "--no-obj", "--batch", "2"]) == 0
        for f in sorted(os.listdir(out1)):
            if not f.endswith(".npy"):
                continue
            a = load_hand_npy(os.path.join(out1, f))
            b = load_hand_npy(os.path.join(out2, f))
            assert set(a) == set(b)
            for hand in a:
                if a[hand] is None or b[hand] is None:
                    continue
                for k in a[hand]:
                    np.testing.assert_allclose(
                        b[hand][k], a[hand][k], rtol=0, atol=5e-2,
                        err_msg=f"{f}:{hand}:{k}")

    def test_infer_masked(self, image_dir, tmp_path):
        masks = tmp_path / "masks"
        masks.mkdir()
        for i in range(2):
            m = np.zeros((100, 120), np.int32)
            m[30:70, 40:90] = 3
            np.save(masks / f"f{i}.npy", m)
        out = str(tmp_path / "out_masked")
        rc = main(["infer", "--tiny", "--input", image_dir, "--output", out,
                   "--mask-dir", str(masks), "--no-obj"])
        assert rc == 0
        results = load_hand_npy(os.path.join(out, "f0.npy"))
        assert results["right"] is not None
        assert results["right"]["theta"].shape == (48,)


class TestCliFastPath:
    @pytest.mark.parametrize("fast", ["int8", "int8-tome"])
    def test_infer_fast_path(self, image_dir, tmp_path, fast):
        """--fast-path quantizes the ViT params and re-routes the
        backbone; the pipeline must still produce the full npy schema."""
        out = str(tmp_path / f"out_{fast}")
        rc = main(["infer", "--tiny", "--input", image_dir, "--output", out,
                   "--fast-path", fast, "--tome-r", "1", "--no-obj"])
        assert rc == 0
        npys = [f for f in os.listdir(out) if f.endswith(".npy")]
        assert len(npys) == 2
        results = load_hand_npy(os.path.join(out, npys[0]))
        assert set(results) == {"left", "right"}


class TestCliCalibrateInt8:
    def test_calibrate_then_infer_static(self, image_dir, tmp_path):
        """tools/calibrate_int8.py over real crops -> scales npz ->
        infer --fast-path int8 --calib-scales (static quantize path)."""
        import runpy
        import sys

        scales = str(tmp_path / "scales.npz")
        argv = sys.argv
        sys.argv = ["calibrate_int8.py", "--input", image_dir,
                    "--out", scales, "--tiny", "--batch", "4",
                    "--max-images", "2"]
        try:
            with pytest.raises(SystemExit) as e:
                runpy.run_path(
                    os.path.join(os.path.dirname(__file__), "..", "tools",
                                 "calibrate_int8.py"), run_name="__main__")
            assert e.value.code == 0
        finally:
            sys.argv = argv
        assert os.path.exists(scales)

        from hamer_yolo_tpu.core.quant import load_act_stats

        stats = load_act_stats(scales)
        assert len(stats["blocks"]) == 2  # tiny ViT depth
        assert set(stats["blocks"][0]) == {"qkv", "proj", "fc1", "fc2"}

        out = str(tmp_path / "out_static")
        rc = main(["infer", "--tiny", "--input", image_dir, "--output", out,
                   "--fast-path", "int8", "--calib-scales", scales,
                   "--no-obj"])
        assert rc == 0
        assert len([f for f in os.listdir(out) if f.endswith(".npy")]) == 2


class TestCliDetect:
    def test_detect_prints_json(self, image_dir, capsys):
        rc = main(["detect", "--tiny", "--input", image_dir])
        assert rc == 0
        lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
        assert len(lines) == 2
        rec = json.loads(lines[0])
        assert "detections" in rec

    def test_detect_save_txt_and_img(self, image_dir, tmp_path, capsys):
        """--save-txt writes the reference detect.py label format
        (cls x_c y_c w h conf, normalized); --save-img writes annotated
        copies."""
        txt, img = str(tmp_path / "labels"), str(tmp_path / "vis")
        rc = main(["detect", "--tiny", "--input", image_dir,
                   "--save-txt", txt, "--save-conf", "--save-img", img])
        assert rc == 0
        capsys.readouterr()
        txts = sorted(os.listdir(txt))
        assert len(txts) == 2 and all(f.endswith(".txt") for f in txts)
        rows = open(os.path.join(txt, txts[0])).read().split()
        if rows:  # cls + 4 coords + conf per detection
            assert len(rows) % 6 == 0
            vals = [float(v) for v in rows]
            assert all(0.0 <= v <= 1.0 for v in vals[1:6])
        assert len(os.listdir(img)) == 2


class TestCliRgbd:
    def test_rgbd_on_reference_wild_fixture(self, capsys):
        """`rgbd` CLI on the reference's own committed wild-test fixture
        (KeypointFusion/test/20.png + 20_d.png + 20_bbox.txt; normalized
        center-box format per test_wild.py:666-671). Random weights —
        checks the full metric-cube crop + pcl runtime end-to-end;
        numeric parity vs the reference runtime is pinned in
        tests/test_kpfusion_rgbd.py::TestWildFixtures."""
        base = "/root/reference/rootnet/KeypointFusion/test"
        rgb, dep, box = (os.path.join(base, n)
                         for n in ("20.png", "20_d.png", "20_bbox.txt"))
        if not all(os.path.exists(p) for p in (rgb, dep, box)):
            pytest.skip("reference wild fixtures not mounted")
        rc = main(["rgbd", "--rgb", rgb, "--depth", dep, "--bbox-file", box])
        assert rc == 0
        out = capsys.readouterr().out
        payload = json.loads(out.strip().splitlines()[-1])
        xyz = np.asarray(payload["joint_xyz_world"])
        assert xyz.shape == (21, 3) and np.isfinite(xyz).all()
        uvd = np.asarray(payload["joint_uvd_full"])
        assert uvd.shape == (21, 3) and np.isfinite(uvd).all()


class TestCliHelp:
    @pytest.mark.parametrize("cmd", ["infer", "detect", "serve",
                                     "serve-http", "rgbd", "reconstruct"])
    def test_help_renders(self, cmd, capsys):
        """Every subcommand's --help must format (regression: a bare
        '+8% e2e' in a help string was parsed by argparse as a %e float
        spec, crashing --help for every command sharing the runtime
        options)."""
        with pytest.raises(SystemExit) as e:
            main([cmd, "--help"])
        assert e.value.code == 0
        assert cmd in capsys.readouterr().out


class TestCliServe:
    def test_serve_stream_over_image_dir(self, image_dir, capsys):
        """serve end-to-end on an image-dir source (single-stream path),
        with the uint8 upload dtype pinned."""
        rc = main(["serve", "--tiny", "--input", image_dir, "--batch", "2",
                   "--upload-dtype", "uint8"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "fps" in out
        assert "2 frames" in out
