"""CLI app smoke tests (fast configs, krylon fixture)."""

import os
import sys

import numpy as np
import pytest


@pytest.fixture
def fast_cfg(tmp_path):
    """A reference-grammar config tuned for test speed."""
    cfg = tmp_path / "fast.cfg"
    cfg.write_text("""
# fast test config (reference grammar)
finger_width = 0.01
hand_outer_diameter = 0.12
hand_depth = 0.06
hand_height = 0.02
init_bite = 0.01
volume_width = 0.10
volume_depth = 0.06
volume_height = 0.02
image_size = 60
image_num_channels = 3
num_samples = 12
num_orientations = 8
num_finger_placements = 10
hand_axes = 2
voxelize = 1
voxel_size = 0.003
workspace = -1 1 -1 1 -1 1
workspace_grasps = -1 1 -1 1 -1 1
min_inliers = 0
num_selected = 5
num_init_samples = 6
num_iterations = 1
num_samples_per_iteration = 6
""")
    return str(cfg)


KRYLON = "/root/reference/tutorials/krylon.pcd"


class TestApps:
    def test_detect_grasps(self, fast_cfg, capsys):
        from gpd_tpu.apps.detect_grasps import main
        assert main([fast_cfg, KRYLON]) == 0
        out = capsys.readouterr().out
        assert "Selected" in out

    def test_detect_grasps_usage(self, capsys):
        from gpd_tpu.apps.detect_grasps import main
        assert main([]) == -1

    def test_generate_candidates(self, fast_cfg, tmp_path, capsys):
        from gpd_tpu.apps.generate_candidates import main
        out_csv = str(tmp_path / "hands.csv")
        assert main([fast_cfg, KRYLON, out_csv]) == 0
        assert os.path.exists(out_csv)
        assert "candidates" in capsys.readouterr().out

    def test_cem_detect_grasps(self, fast_cfg, capsys):
        from gpd_tpu.apps.cem_detect_grasps import main
        assert main([fast_cfg, KRYLON]) == 0
        assert "Final result" in capsys.readouterr().out

    def test_label_grasps(self, fast_cfg, capsys):
        from gpd_tpu.apps.label_grasps import main
        assert main([fast_cfg, KRYLON, KRYLON]) == 0
        assert "Ground-truth antipodal" in capsys.readouterr().out

    def test_test_grasp_image(self, tmp_path, monkeypatch, capsys):
        from gpd_tpu.apps.test_grasp_image import main
        monkeypatch.chdir(tmp_path)
        assert main([KRYLON, "100"]) == 0
        assert "valid hand poses" in capsys.readouterr().out

    def test_convert_weights(self, tmp_path):
        from gpd_tpu.apps.convert_weights import main
        from gpd_tpu.net import lenet
        import jax
        src = str(tmp_path / "w.npz")
        lenet.save_params_npz(src, lenet.init_params(jax.random.PRNGKey(0), 3))
        dst = str(tmp_path / "out.npz")
        assert main([src, dst, "3"]) == 0
        p = lenet.load_params(dst, 3)
        assert p["conv1_w"].shape == (20, 3, 5, 5)


class TestAPI:
    def test_detect_in_file(self, fast_cfg):
        from gpd_tpu import api
        grasps = api.detect_grasps_in_file(fast_cfg, KRYLON)
        assert isinstance(grasps, list)
        if grasps:
            g = grasps[0]
            assert g["position"].shape == (3,)
            assert g["orientation"].shape == (3, 3)

    def test_calc_descriptors(self, fast_cfg):
        from gpd_tpu import api
        from gpd_tpu.io.pcd import load_pcd
        grasps, images = api.calc_grasp_descriptors(fast_cfg, load_pcd(KRYLON))
        assert images.ndim == 4
        assert images.shape[-1] == 3
        assert len(grasps) == images.shape[0]


class TestViz:
    def test_plot_and_ply(self, tmp_path, rng):
        from gpd_tpu import viz
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        nrm = np.tile([0, 0, 1.0], (200, 1)).astype(np.float32)
        viz.save_cloud_ply(str(tmp_path / "c.ply"), pts, normals=nrm)
        from gpd_tpu.io.pcd import load_ply
        back = load_ply(str(tmp_path / "c.ply"))
        np.testing.assert_allclose(back, pts, atol=1e-5)

        grasps = [dict(position=np.zeros(3), orientation=np.eye(3))]
        viz.plot_grasps(pts, grasps, path=str(tmp_path / "g.png"))
        assert os.path.exists(tmp_path / "g.png")
        viz.grasp_image_grid(rng.integers(0, 255, (60, 60, 15)).astype(np.uint8),
                             path=str(tmp_path / "i.png"))
        assert os.path.exists(tmp_path / "i.png")
