"""Data-generation pipeline tests: HDF5 shard writer with resume journal,
class balancing, ground-truth labeling, multi-view fusion."""

import os

import numpy as np
import jax
import pytest

from gpd_tpu.config import DetectorConfig
from gpd_tpu.core.types import CloudArrays
from gpd_tpu.datagen import (DataGenConfig, DataGenerator, HDF5ShardWriter,
                             balance_instances, fuse_views)
from gpd_tpu.detector import GraspDetector


class TestBalance:
    def test_even(self, rng):
        pos = np.arange(100)
        neg = np.arange(100, 130)
        keep = balance_instances(500, pos, neg, rng)
        assert len(keep) == 60
        assert (keep < 100).sum() == 30

    def test_cap(self, rng):
        pos = np.arange(100)
        neg = np.arange(100, 200)
        keep = balance_instances(40, pos, neg, rng)
        assert len(keep) == 80


class TestWriter:
    def test_append_and_resume(self, tmp_path, rng):
        path = str(tmp_path / "train.h5")
        w = HDF5ShardWriter(path, 60, 15)
        imgs = rng.integers(0, 256, (10, 60, 60, 15)).astype(np.uint8)
        lbls = rng.integers(0, 2, 10).astype(np.uint8)
        w.append("obj1", 0, imgs, lbls)
        w.append("obj1", 1, imgs, lbls)
        w.close()

        w2 = HDF5ShardWriter(path, 60, 15)
        assert w2.is_done("obj1", 0)
        assert w2.is_done("obj1", 1)
        assert not w2.is_done("obj1", 2)
        assert w2.h5["labels"].shape[0] == 20
        w2.append("obj1", 2, imgs, lbls)
        assert w2.h5["labels"].shape[0] == 30
        w2.close()

    def test_shuffle(self, tmp_path, rng):
        path = str(tmp_path / "t.h5")
        w = HDF5ShardWriter(path, 60, 3)
        imgs = np.arange(20, dtype=np.uint8)[:, None, None, None] * \
            np.ones((20, 60, 60, 3), np.uint8)
        lbls = np.arange(20, dtype=np.uint8) % 2
        w.append("o", 0, imgs, lbls)
        w.shuffle_in_place(seed=3)
        vals = w.h5["images"][:, 0, 0, 0]
        assert sorted(vals.tolist()) == list(range(20))
        assert not np.array_equal(vals, np.arange(20))
        w.close()

    def test_shuffle_streaming_blocks_keep_pairing(self, tmp_path, rng):
        """The streaming monotonic-gather shuffle (block << n) must apply
        ONE joint permutation: (image, label) pairs stay together, the
        writer stays usable (append after shuffle), and a small block size
        gives the same permutation as one big block."""
        a = str(tmp_path / "a.h5")
        b = str(tmp_path / "b.h5")
        imgs = np.arange(50, dtype=np.uint8)[:, None, None, None] * \
            np.ones((50, 60, 60, 3), np.uint8)
        lbls = np.arange(50, dtype=np.uint8)
        for path, block in ((a, 7), (b, 20000)):
            w = HDF5ShardWriter(path, 60, 3)
            w.append("o", 0, imgs, lbls)
            w.shuffle_in_place(seed=5, block=block)
            iv = w.h5["images"][:, 0, 0, 0]
            lv = w.h5["labels"][:, 0]
            np.testing.assert_array_equal(iv, lv)   # pairing preserved
            assert sorted(iv.tolist()) == list(range(50))
            # Writer still usable post-rename.
            w.append("o", 1, imgs[:3], lbls[:3])
            assert w.h5["labels"].shape[0] == 53
            w.close()
        import h5py
        with h5py.File(a) as fa, h5py.File(b) as fb:
            np.testing.assert_array_equal(fa["labels"][:50],
                                          fb["labels"][:50])

    def test_compatible_with_train_loader(self, tmp_path, rng):
        from gpd_tpu.net.train import HDF5Dataset
        path = str(tmp_path / "t.h5")
        w = HDF5ShardWriter(path, 60, 15)
        imgs = rng.integers(0, 256, (32, 60, 60, 15)).astype(np.uint8)
        lbls = rng.integers(0, 2, 32).astype(np.uint8)
        w.append("o", 0, imgs, lbls)
        w.close()
        ds = HDF5Dataset(path)
        blocks = list(ds.blocks())
        assert len(blocks) == 1
        assert blocks[0][0].shape == (32, 60, 60, 15)
        assert blocks[0][1].dtype == np.int32


class TestGenerateView:
    def test_synthetic_object(self, rng):
        """View cloud = half cylinder; mesh cloud = full cylinder.
        Pipeline must produce balanced labeled instances."""
        n = 2000
        theta_full = rng.uniform(0, 2 * np.pi, n)
        theta_view = rng.uniform(-np.pi / 2, np.pi / 2, n)

        def cyl(theta):
            pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                            rng.uniform(-0.05, 0.05, n)], 1).astype(np.float32)
            nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                           1).astype(np.float32)
            return pts, nrm

        vp, vn = cyl(theta_view)
        mp, mn_ = cyl(theta_full)
        view = CloudArrays.from_numpy(vp, normals=vn)
        mesh = CloudArrays.from_numpy(mp, normals=mn_)

        cfg = DetectorConfig(num_samples=16, search_neighbors_cap=256,
                             frame_neighbors_cap=32, normals_neighbors_cap=32,
                             shadow_voxel_cap=256)
        det = GraspDetector(cfg)
        gen = DataGenerator(det, DataGenConfig(min_grasps_per_view=1,
                                               max_grasps_per_view=50))
        images, labels = gen.generate_view(view, mesh, jax.random.PRNGKey(0),
                                           rng)
        assert images.ndim == 4 and images.dtype == np.uint8
        assert len(images) == len(labels)
        if len(labels) > 0:
            # balanced: equal pos/neg
            assert abs(int((labels == 1).sum()) -
                       int((labels == 0).sum())) <= 0

    def test_two_run_reproducibility(self, tmp_path, rng):
        """Two full generate() runs over the same work-list and seed must
        produce bit-identical datasets: per-(object, view) PRNG keys derive
        from a stable crc32 salt, not Python's per-process-salted hash()
        (datagen.py generate)."""
        import h5py
        from gpd_tpu.datagen import HDF5ShardWriter

        n = 1500

        def cyl(theta, z):
            pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta), z],
                           1).astype(np.float32)
            nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                           1).astype(np.float32)
            return pts, nrm

        z = np.random.default_rng(6).uniform(-0.05, 0.05, n)
        # View = half shell; mesh = full cylinder (positives need the
        # opposing surface to exist in the ground-truth cloud).
        vth = np.random.default_rng(5).uniform(-np.pi / 2, np.pi / 2, n)
        mth = np.random.default_rng(7).uniform(0, 2 * np.pi, n)
        vp_, vn_ = cyl(vth, z)
        mp_, mn_ = cyl(mth, z)
        view = CloudArrays.from_numpy(vp_, normals=vn_)
        mesh = CloudArrays.from_numpy(mp_, normals=mn_)

        cfg = DetectorConfig(num_samples=16, search_neighbors_cap=256,
                             frame_neighbors_cap=32, normals_neighbors_cap=32,
                             shadow_voxel_cap=256)
        det = GraspDetector(cfg)
        gen = DataGenerator(det, DataGenConfig(min_grasps_per_view=1,
                                               max_grasps_per_view=50,
                                               test_views=()))
        items = [("obj_a", 0, view, mesh), ("obj_a", 1, view, mesh)]
        outs = []
        for run in range(2):
            path = str(tmp_path / f"run{run}.h5")
            w = HDF5ShardWriter(path, cfg.image_geometry.size,
                                cfg.image_geometry.num_channels)
            gen.generate(items, w, seed=3)
            w.close()
            with h5py.File(path, "r") as f:
                outs.append((f["images"][:], f["labels"][:]))
        assert len(outs[0][1]) > 0
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][1], outs[1][1])


class TestMultiView:
    def test_fuse(self, rng):
        c1 = rng.normal(size=(50, 3)).astype(np.float32)
        c2 = rng.normal(size=(30, 3)).astype(np.float32)
        T1 = np.eye(4)
        # Rotation by 90 deg about z + translation.
        T2 = np.eye(4)
        T2[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        T2[:3, 3] = [1, 0, 0]
        pts, cam, vp = fuse_views([c1, c2], [T1, T2])
        assert pts.shape == (80, 3)
        assert (cam[:50] == 1).all() and (cam[50:] == 2).all()
        np.testing.assert_allclose(pts[:50], c1, atol=1e-6)
        np.testing.assert_allclose(
            pts[50], T2[:3, :3] @ c2[0] + T2[:3, 3], atol=1e-5)
        np.testing.assert_allclose(vp[1], [1, 0, 0], atol=1e-6)

    @staticmethod
    def _rot(axis, deg):
        c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
        if axis == "z":
            return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])

    def test_bigbird_roundtrip(self, tmp_path, rng):
        """Synthetic-pose roundtrip (data_generator.cpp:617-701): build a
        fake BigBIRD object dir (clouds/ PCDs in camera frame + poses/ and
        calibration.h5), fuse, and recover the table-frame ground truth."""
        import h5py
        from gpd_tpu.datagen import (calculate_transform,
                                     create_multiview_cloud, read_pose_hdf5)
        from gpd_tpu.io.pcd import save_pcd

        obj, camera, ref = "mug_01", 1, 5
        angles = [0, 120]
        root = tmp_path
        d = root / obj
        (d / "clouds").mkdir(parents=True)
        (d / "poses").mkdir()

        # Ground truth: an L-shaped table-frame cloud.
        gt = rng.uniform(-0.05, 0.05, (200, 3)).astype(np.float32)

        # One camera calibration (camera from reference camera).
        T_cam_from_ref = np.eye(4, dtype=np.float32)
        T_cam_from_ref[:3, :3] = self._rot("x", 30)
        T_cam_from_ref[:3, 3] = [0.1, -0.2, 0.05]
        with h5py.File(d / "calibration.h5", "w") as f:
            f[f"H_NP{camera}_from_NP{ref}"] = T_cam_from_ref

        for angle in angles:
            T_table_from_ref = np.eye(4, dtype=np.float32)
            T_table_from_ref[:3, :3] = self._rot("z", angle)
            T_table_from_ref[:3, 3] = [0, 0, 0.7]
            with h5py.File(d / "poses" / f"NP{ref}_{angle}_pose.h5",
                           "w") as f:
                f["H_table_from_reference_camera"] = T_table_from_ref
            # The view PCD holds the cloud in CAMERA frame: points such
            # that T = T_table_from_ref @ inv(T_cam_from_ref) maps them
            # back onto the table-frame ground truth.
            T = T_table_from_ref @ np.linalg.inv(T_cam_from_ref)
            Tinv = np.linalg.inv(T)
            cam_pts = gt @ Tinv[:3, :3].T + Tinv[:3, 3]
            save_pcd(str(d / "clouds" / f"NP{camera}_{angle}.pcd"),
                     cam_pts.astype(np.float32))

            got_T = calculate_transform(str(root), obj, camera, angle, ref)
            np.testing.assert_allclose(got_T, T, atol=1e-5)

        cloud = create_multiview_cloud(str(root), obj, camera, angles, ref)
        pts = np.asarray(cloud.points)[np.asarray(cloud.mask)]
        cam_src = np.asarray(cloud.cam_source)[np.asarray(cloud.mask)]
        assert pts.shape == (400, 3)
        # Both views land on the table-frame ground truth.
        np.testing.assert_allclose(pts[:200], gt, atol=1e-4)
        np.testing.assert_allclose(pts[200:], gt, atol=1e-4)
        assert (cam_src[:200] == 1).all() and (cam_src[200:] == 2).all()
        # Camera positions = T[:3, 3] per view.
        vps = np.asarray(cloud.view_points)
        assert vps.shape == (2, 3)
        # read_pose_hdf5 validates shape.
        T0 = read_pose_hdf5(str(d / "calibration.h5"),
                            f"H_NP{camera}_from_NP{ref}")
        np.testing.assert_allclose(T0, T_cam_from_ref, atol=1e-7)


class TestSceneSynthesis:
    """The round-4 clutter/two-camera training distribution
    (datasets/synthetic.py make_scene / render_view_occluded /
    render_fused_views; reference claims: README.md:237-244 dense clutter,
    data_generator.cpp:617-665 multi-view fusion)."""

    def test_make_scene_geometry(self, rng):
        from gpd_tpu.datasets import synthetic as syn
        pts, nrm = syn.make_scene(rng, n_objects=3, table_halfsize=0.2)
        assert pts.shape == nrm.shape and pts.shape[1] == 3
        # Everything rests on or above the table plane.
        assert pts[:, 2].min() >= -1e-6
        # Table patch present: many points exactly at z=0, predominantly
        # with +z normals (object bottom faces also rest at z=0).
        on_table = np.abs(pts[:, 2]) < 1e-6
        assert on_table.sum() >= 5000
        tn = nrm[on_table]
        up = (np.abs(tn[:, :2]) < 1e-6).all(axis=1) & (tn[:, 2] > 0)
        assert up.mean() > 0.7
        # Unit normals.
        np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0,
                                   atol=1e-5)

    def test_occlusion_culls_hidden_surfaces(self, rng):
        """A small box directly behind a large box (along the view ray)
        must be mostly invisible to the occluded renderer but visible to
        plain backface culling."""
        from gpd_tpu.datasets import synthetic as syn
        front, fn = syn.sample_box(rng, (0.2, 0.2, 0.2), 4000)
        back, bn = syn.sample_box(rng, (0.05, 0.05, 0.05), 2000)
        back = back + np.array([0, 0, -0.4], np.float32)
        pts = np.concatenate([front, back])
        nrm = np.concatenate([fn, bn])
        cam = np.array([0, 0, 1.0], np.float32)
        vis_plain = syn.render_view(rng, pts, nrm, cam, dropout=0.0)
        vis_occl = syn.render_view_occluded(rng, pts, nrm, cam, dropout=0.0)
        behind_plain = (vis_plain[:, 2] < -0.3).sum()
        behind_occl = (vis_occl[:, 2] < -0.3).sum()
        assert behind_plain > 200              # backface culling alone sees it
        assert behind_occl < behind_plain * 0.3  # z-buffer hides most

    def test_fused_views_camera_sources(self, rng):
        from gpd_tpu.datasets import synthetic as syn
        pts, nrm = syn.make_scene(rng, n_objects=2)
        cams = syn.view_cameras(rng, 2, dist=0.7)
        vp, cam_src, vps = syn.render_fused_views(rng, pts, nrm, cams)
        assert vps.shape == (2, 3)
        assert set(np.unique(cam_src)) <= {1, 2}
        assert (cam_src == 1).sum() > 0 and (cam_src == 2).sum() > 0
        assert len(vp) == len(cam_src)
