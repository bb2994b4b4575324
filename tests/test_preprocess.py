"""Tests for config parsing, I/O, eigh3, neighbors, and preprocessing kernels.

NumPy brute-force oracles transcribe the reference's behavior
(src/gpd/util/cloud.cpp) for comparison; golden fixture = krylon.pcd.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpd_tpu.config import ConfigFile, load_config
from gpd_tpu.core.types import CloudArrays
from gpd_tpu.ops.eigh3 import eigh3_sym, eigvals3_sym
from gpd_tpu.ops.neighbors import radius_neighbors
from gpd_tpu.ops import preprocess as pp
from gpd_tpu.ops.normals import estimate_normals, reverse_normals


class TestConfig:
    def test_reference_cfg_parses(self):
        cfg = load_config("/root/reference/cfg/eigen_params.cfg")
        assert cfg.num_samples == 30
        assert cfg.num_orientations == 8
        assert cfg.num_finger_placements == 10
        assert cfg.hand_axes == (2,)
        assert cfg.min_inliers == 0
        assert cfg.num_selected == 5
        assert cfg.hand_geometry.outer_diameter == 0.12
        assert cfg.image_geometry.num_channels == 15
        assert cfg.image_geometry.size == 60

    def test_grammar(self):
        c = ConfigFile(text="a = 1 # comment\n# full comment\nb= 2 3 4\n"
                            "bad line\nc =\n  d\t= x y\n")
        assert c.get_int("a") == 1
        assert c.get_float_list("b") == [2.0, 3.0, 4.0]
        assert "c" not in c.contents
        assert c.get_str("d") == "x y"

    def test_all_reference_cfgs_load(self):
        import glob
        for f in glob.glob("/root/reference/cfg/*.cfg"):
            load_config(f)

    def test_deepen_depths_match_cpp_accumulation(self):
        cfg = load_config("/root/reference/cfg/eigen_params.cfg")
        depths = cfg.hand_geometry.deepen_depths()
        assert len(depths) == 10
        assert abs(depths[0] - 0.015) < 1e-12
        assert depths[-1] <= 0.06


class TestIO:
    def test_krylon(self, krylon_points):
        assert krylon_points.shape == (4467, 3)
        np.testing.assert_allclose(
            krylon_points[0], [-0.002724, -0.019454, -0.054271], atol=1e-6)

    def test_table_mug(self):
        from gpd_tpu.io.pcd import load_pcd
        pts = load_pcd("/root/reference/tutorials/table_mug.pcd")
        assert pts.shape[1] == 3 and pts.shape[0] > 1000

    def test_pcd_roundtrip(self, tmp_path, rng):
        from gpd_tpu.io.pcd import save_pcd, load_pcd
        pts = rng.normal(size=(57, 3)).astype(np.float32)
        save_pcd(str(tmp_path / "t.pcd"), pts)
        back = load_pcd(str(tmp_path / "t.pcd"))
        np.testing.assert_allclose(back, pts, atol=1e-5)


class TestEigh3:
    def test_vs_numpy(self, rng):
        A = rng.normal(size=(500, 3, 3)).astype(np.float32)
        A = A @ np.transpose(A, (0, 2, 1))
        w, V = jax.jit(eigh3_sym)(jnp.asarray(A))
        w, V = np.asarray(w), np.asarray(V)
        w_np = np.linalg.eigvalsh(A.astype(np.float64))
        np.testing.assert_allclose(w, w_np, rtol=2e-4, atol=2e-4)
        # Check eigen equation A v = w v per column.
        for c in range(3):
            Av = np.einsum("nij,nj->ni", A, V[:, :, c])
            wv = w[:, c][:, None] * V[:, :, c]
            np.testing.assert_allclose(Av, wv, atol=5e-3)

    def test_degenerate(self):
        # Isotropic and rank-1 inputs must not produce NaNs.
        A = jnp.stack([jnp.eye(3), jnp.zeros((3, 3)),
                       jnp.outer(jnp.ones(3), jnp.ones(3))])
        w, V = eigh3_sym(A)
        assert np.all(np.isfinite(np.asarray(w)))
        assert np.all(np.isfinite(np.asarray(V)))
        # Orthonormality
        VtV = np.einsum("nij,nik->njk", np.asarray(V), np.asarray(V))
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), (3, 3, 3)),
                                   atol=1e-5)

    def test_eigvals_ascending(self, rng):
        A = rng.normal(size=(100, 3, 3)).astype(np.float32)
        A = A + np.transpose(A, (0, 2, 1))
        w = np.asarray(eigvals3_sym(jnp.asarray(A)))
        assert np.all(np.diff(w, axis=1) >= -1e-4)


class TestNeighbors:
    def test_vs_bruteforce(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.1
        mask = np.ones(300, bool)
        mask[250:] = False
        q = pts[:40]
        qm = np.ones(40, bool)
        idx, valid = radius_neighbors(jnp.asarray(q), jnp.asarray(qm),
                                      jnp.asarray(pts), jnp.asarray(mask),
                                      radius=0.05, k=64)
        idx, valid = np.asarray(idx), np.asarray(valid)
        d = np.linalg.norm(q[:, None] - pts[None], axis=-1)
        d[:, ~mask] = np.inf
        for i in range(40):
            ref = set(np.nonzero(d[i] <= 0.05)[0])
            got = set(idx[i][valid[i]])
            assert got == ref, f"query {i}"
            # sorted ascending by distance (f32 matmul cancellation allows
            # tiny swaps between near-equal distances; ordering is advisory)
            dv = d[i][idx[i][valid[i]]]
            assert np.all(np.diff(dv) >= -1e-4)

    def test_k_cap(self, rng):
        pts = np.zeros((100, 3), np.float32)
        mask = np.ones(100, bool)
        idx, valid = radius_neighbors(jnp.asarray(pts[:5]), jnp.asarray(mask[:5]),
                                      jnp.asarray(pts), jnp.asarray(mask),
                                      radius=1.0, k=16)
        assert np.asarray(valid).sum(axis=1).max() == 16

    def test_radius_moments_vs_bruteforce(self, rng):
        """radius_moments (the masked-matmul accumulation behind frames +
        normals) must equal the per-query brute-force sums over ALL
        in-radius neighbors — exact and uncapped — in both the single-block
        and scanned (Q > block) regimes."""
        from gpd_tpu.ops.neighbors import radius_moments

        n = 500
        pts = (rng.normal(size=(n, 3)) * 0.1).astype(np.float32)
        mask = np.ones(n, bool)
        mask[450:] = False
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        q = pts[:90]
        qm = np.ones(90, bool)
        qm[85:] = False
        for block in (1024, 32):          # single-block and scanned paths
            sums, counts = radius_moments(
                jnp.asarray(q), jnp.asarray(qm), jnp.asarray(pts),
                jnp.asarray(mask), jnp.asarray(feats), 0.06, block=block)
            sums, counts = np.asarray(sums), np.asarray(counts)
            d = np.linalg.norm(q[:, None] - pts[None], axis=-1)
            for i in range(90):
                inr = (d[i] <= 0.06) & mask & qm[i]
                assert counts[i] == inr.sum()
                np.testing.assert_allclose(sums[i], feats[inr].sum(0),
                                           rtol=1e-5, atol=1e-5)

    def test_select_min_max_k_exact(self, rng):
        """select_min_k/select_max_k exact paths equal a NumPy sort."""
        from gpd_tpu.ops.neighbors import select_max_k, select_min_k

        x = rng.normal(size=(7, 40)).astype(np.float32)
        vals, idx = select_min_k(jnp.asarray(x), 5, exact=True)
        np.testing.assert_allclose(np.asarray(vals),
                                   np.sort(x, axis=1)[:, :5], rtol=1e-6)
        vals, idx = select_max_k(jnp.asarray(x), 5, exact=True)
        np.testing.assert_allclose(np.asarray(vals),
                                   -np.sort(-x, axis=1)[:, :5], rtol=1e-6)


def _voxelize_oracle(points, cell):
    """Transcription of cloud.cpp:286-348 semantics (single camera)."""
    min_pt = points.min(axis=0)
    bins = np.floor((points - min_pt) / cell).astype(np.int64)
    seen = {}
    order = []
    for i, b in enumerate(map(tuple, bins)):
        if b not in seen:
            seen[b] = i
            order.append(b)
    cells = sorted(seen.keys())
    out = np.array([min_pt + cell * np.array(c, np.float32) for c in cells],
                   dtype=np.float32)
    return out


class TestVoxelize:
    def test_vs_oracle(self, rng):
        pts = (rng.normal(size=(1000, 3)) * 0.05).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts)
        out = pp.voxelize(cloud, 0.003)
        got = np.asarray(out.points)[np.asarray(out.mask)]
        ref = _voxelize_oracle(pts, np.float32(0.003))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_krylon_count(self, krylon_points):
        cloud = CloudArrays.from_numpy(krylon_points)
        out = pp.voxelize(cloud, 0.003)
        got = int(np.asarray(out.mask).sum())
        ref = _voxelize_oracle(krylon_points, np.float32(0.003)).shape[0]
        assert got == ref

    def test_normal_averaging(self):
        pts = np.array([[0, 0, 0], [0.001, 0, 0], [0.01, 0, 0]], np.float32)
        nrm = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        out = pp.voxelize(cloud, 0.003)
        m = np.asarray(out.mask)
        pts_o = np.asarray(out.points)[m]
        nrm_o = np.asarray(out.normals)[m]
        assert pts_o.shape[0] == 2
        # first cell holds points 0,1 -> avg normal (0.5, 0.5, 0)
        np.testing.assert_allclose(sorted(nrm_o.tolist()),
                                   sorted([[0.5, 0.5, 0.0], [0, 0, 1]]),
                                   atol=1e-6)


class TestWorkspaceFilter:
    def test_strict_box(self):
        pts = np.array([[0, 0, 0], [2, 0, 0], [0.5, 0.5, 0.5],
                        [1.0, 0, 0]], np.float32)
        cloud = CloudArrays.from_numpy(pts)
        out = pp.filter_workspace(cloud, (-1, 1, -1, 1, -1, 1))
        m = np.asarray(out.mask)[:4]
        assert m.tolist() == [True, False, True, False]  # boundary excluded


class TestNormals:
    def test_sphere_normals(self, rng):
        # Points on a sphere: normals should be radial.
        n = 2000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = (v * 0.05).astype(np.float32)
        vp = np.array([[0, 0, 10.0]], np.float32)  # camera above
        cloud = CloudArrays.from_numpy(pts, view_points=vp)
        out = estimate_normals(cloud, radius=0.01, k=64)
        nrm = np.asarray(out.normals)[:n]
        # Radial alignment
        cosang = np.abs(np.sum(nrm * v, axis=1))
        assert np.median(cosang) > 0.98
        # Orientation: normals point toward the camera (negative z side flipped)
        to_cam = vp[0][None] - pts
        assert np.mean(np.sum(nrm * to_cam, axis=1) > 0) > 0.99

    def test_reverse_normals(self):
        pts = np.array([[0, 0, 1.0]], np.float32)
        vp = np.array([[0, 0, 0.0]], np.float32)
        nrm_away = np.array([[0, 0, 1.0]], np.float32)   # away from camera
        cloud = CloudArrays.from_numpy(pts, view_points=vp, normals=nrm_away)
        out = reverse_normals(cloud.points, cloud.normals, cloud.mask,
                              cloud.cam_source, cloud.view_points)
        np.testing.assert_allclose(np.asarray(out)[0], [0, 0, -1.0])

    def test_refine_normals_vs_oracle(self, rng):
        """refine_normals must match the literal NumPy transcription of
        pcl::NormalRefinement (iterative k-NN uniform averaging with RMS
        convergence) as invoked by cloud.cpp:176-204."""
        from oracle import oracle_refine_normals
        from gpd_tpu.ops.normals import refine_normals
        import jax.numpy as jnp

        n = 200
        pts = rng.uniform(-0.05, 0.05, size=(n, 3)).astype(np.float32)
        nrm = rng.normal(size=(n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)

        want = oracle_refine_normals(pts, nrm, k=10)
        got = refine_normals(jnp.asarray(pts), jnp.asarray(nrm),
                             jnp.ones(n, bool), k=10)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)

    def test_refine_normals_smooths(self, rng):
        """On a noisy plane, iterative refinement must tighten normal
        alignment with the true plane normal."""
        from gpd_tpu.ops.normals import refine_normals
        import jax.numpy as jnp

        n = 400
        pts = np.zeros((n, 3), np.float32)
        pts[:, :2] = rng.uniform(-0.05, 0.05, size=(n, 2))
        true = np.array([0, 0, 1.0])
        nrm = true[None, :] + rng.normal(0, 0.3, size=(n, 3))
        nrm = (nrm / np.linalg.norm(nrm, axis=1, keepdims=True)
               ).astype(np.float32)
        out = np.asarray(refine_normals(jnp.asarray(pts), jnp.asarray(nrm),
                                        jnp.ones(n, bool), k=10))
        before = np.mean(nrm @ true)
        after = np.mean(out @ true)
        assert after > before
        assert after > 0.99


class TestOutlierRemoval:
    def test_vs_numpy_oracle(self, rng):
        """remove_statistical_outliers must match a literal NumPy
        transcription of PCL StatisticalOutlierRemoval (cloud.cpp:166-174:
        meanK=50, stddev_mult=1.0)."""
        from gpd_tpu.ops.preprocess import remove_statistical_outliers

        n = 600
        pts = rng.normal(0, 0.02, size=(n, 3)).astype(np.float32)
        pts[:20] += rng.uniform(0.3, 0.5, size=(20, 3)).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts)

        # NumPy oracle.
        d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
        d_sorted = np.sort(d, axis=1)
        mean_d = d_sorted[:, 1:51].mean(axis=1)
        thresh = mean_d.mean() + 1.0 * mean_d.std()
        want_keep = mean_d <= thresh

        out = remove_statistical_outliers(cloud)
        got = int(np.asarray(out.mask).sum())
        assert got == int(want_keep.sum())
        # The kept set itself must match: compacted points == oracle-kept.
        kept = np.asarray(out.points)[np.asarray(out.mask)]
        np.testing.assert_allclose(
            np.sort(kept.ravel()), np.sort(pts[want_keep].ravel()),
            rtol=1e-6)

    def test_blocked_matches_single(self, rng, monkeypatch):
        """The query-blocked path (big clouds) equals the single-block
        result."""
        from gpd_tpu.ops import preprocess as pp

        pts = rng.normal(0, 0.02, size=(700, 3)).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts)
        a = np.asarray(pp._outlier_kernel(cloud.points, cloud.mask, 50,
                                          np.float32(1.0)))
        b = np.asarray(pp._outlier_kernel(cloud.points, cloud.mask, 50,
                                          np.float32(1.0), block=128))
        np.testing.assert_array_equal(a, b)


class TestPlane:
    def test_plane_extraction(self, rng):
        plane = rng.uniform(-0.1, 0.1, size=(3000, 3)).astype(np.float32)
        plane[:, 2] = 0.0
        blob = (rng.normal(size=(500, 3)) * 0.01 + [0, 0, 0.05]).astype(np.float32)
        pts = np.concatenate([plane, blob])
        cloud = CloudArrays.from_numpy(pts)
        above = pp.sample_above_plane(cloud, jax.random.PRNGKey(0))
        above = np.asarray(above)
        n = pts.shape[0]
        # Most plane points excluded, most blob points kept.
        assert above[:3000].mean() < 0.05
        assert above[3000:n].mean() > 0.9


class TestSubsample:
    def test_uniform(self):
        mask = np.zeros(100, bool)
        mask[:60] = True
        idx, valid = pp.subsample_uniform(jax.random.PRNGKey(1),
                                          jnp.asarray(mask), 30)
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert valid.all()
        assert (idx < 60).all()
        assert len(set(idx.tolist())) == 30  # without replacement

    def test_pool_smaller_than_request(self):
        """pool < num_samples: every pool member drawn exactly once, the
        rest of the slots invalid (documented subsample_uniform contract)."""
        mask = np.zeros(100, bool)
        mask[:10] = True
        idx, valid = pp.subsample_uniform(jax.random.PRNGKey(1),
                                          jnp.asarray(mask), 30)
        idx, valid = np.asarray(idx), np.asarray(valid)
        assert valid.sum() == 10
        drawn = sorted(idx[valid].tolist())
        assert drawn == list(range(10))
        # Invalid slots never point at pool members marked valid.
        assert not valid[10:].any()
