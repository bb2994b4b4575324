"""Candidate-engine tests: JAX kernels vs the NumPy oracle transcription of
the reference's control flow (hand_set.cpp / finger_hand.cpp / antipodal.cpp
/ local_frame.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpd_tpu.config import DetectorConfig, HandGeometry
from gpd_tpu.core.types import CloudArrays, Samples
from gpd_tpu.ops.frames import estimate_frames
from gpd_tpu.ops import candidates as cand

from oracle import (OracleFingerHand, oracle_antipodal, oracle_eval_hand_set,
                    oracle_local_frame, finger_spacing)


def make_slab_cloud(rng, n=3000):
    """A graspable vertical slab with two parallel faces + noise."""
    side = rng.integers(0, 2, size=n)
    pts = np.empty((n, 3), np.float32)
    pts[:, 0] = np.where(side == 0, -0.01, 0.01) + rng.normal(0, 5e-4, n)
    pts[:, 1] = rng.uniform(-0.05, 0.05, n)
    pts[:, 2] = rng.uniform(-0.05, 0.05, n)
    nrm = np.zeros((n, 3), np.float32)
    nrm[:, 0] = np.where(side == 0, -1.0, 1.0)
    return pts.astype(np.float32), nrm


class TestFingerSpacing:
    def test_matches_reference_formula(self):
        hg = HandGeometry()
        fs = cand.finger_spacing(hg, 10)
        ref = finger_spacing(hg.outer_diameter, hg.finger_width, 10)
        np.testing.assert_allclose(fs, ref, atol=1e-7)
        assert fs.shape == (20,)
        # Last left placement and first right placement both start at 0.
        assert abs(fs[9]) < 1e-9
        assert fs[10] == 0.0
        assert abs(fs[0] - (-hg.outer_diameter + hg.finger_width)) < 1e-9


class TestFrames:
    def test_vs_oracle_cylinder(self, rng):
        """Cylinder: curvature axis is uniquely the cylinder axis, so the
        eigen-decomposition is non-degenerate and comparable across
        implementations."""
        n = 4000
        theta = rng.uniform(0, 2 * np.pi, n)
        r = 0.03
        pts = np.stack([r * np.cos(theta), r * np.sin(theta),
                        rng.uniform(-0.06, 0.06, n)], axis=1).astype(np.float32)
        nrm = np.stack([np.cos(theta), np.sin(theta),
                        np.zeros(n)], axis=1).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        samples = pts[:20]
        frames, valid = estimate_frames(
            jnp.asarray(samples), jnp.ones(20, bool),
            cloud.points, cloud.mask, cloud.normals, radius=0.01, k=256)
        frames, valid = np.asarray(frames), np.asarray(valid)
        assert valid.all()
        for i in range(20):
            d = np.linalg.norm(pts - samples[i], axis=1)
            nb = nrm[d <= 0.01]
            ref = oracle_local_frame(nb.astype(np.float64))
            # normal column must match including sign (fixed by avg normal)
            assert np.dot(frames[i][:, 0], ref[:, 0]) > 0.999
            # curvature axis matches up to sign (z axis of the cylinder)
            assert abs(np.dot(frames[i][:, 2], ref[:, 2])) > 0.99
            assert abs(frames[i][2, 2]) > 0.99
            # right-handed orthonormal
            assert abs(np.linalg.det(frames[i]) - 1.0) < 1e-3

    def test_no_neighbors_invalid(self):
        pts = np.zeros((10, 3), np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=np.tile([0, 0, 1.0], (10, 1)))
        s = np.array([[5.0, 5.0, 5.0]], np.float32)
        _, valid = estimate_frames(jnp.asarray(s), jnp.ones(1, bool),
                                   cloud.points, cloud.mask, cloud.normals,
                                   radius=0.01, k=8)
        assert not bool(valid[0])


class TestSearchVsOracle:
    @pytest.mark.parametrize("deepen", [True, False])
    def test_slab(self, rng, deepen):
        pts, nrm = make_slab_cloud(rng, n=2500)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(deepen_hand=deepen, search_neighbors_cap=4096,
                             frame_neighbors_cap=256)
        S = 12
        samples = pts[rng.choice(len(pts), S, replace=False)]

        frames, fvalid = estimate_frames(
            jnp.asarray(samples), jnp.ones(S, bool), cloud.points,
            cloud.mask, cloud.normals, radius=cfg.nn_radius_frames,
            k=cfg.frame_neighbors_cap)
        grasps = cand.search_hands_with_frames(cloud, jnp.asarray(samples),
                                               frames, fvalid, cfg)
        g_valid = np.asarray(grasps.valid)
        g_top = np.asarray(grasps.top)
        g_center = np.asarray(grasps.center)
        g_width = np.asarray(grasps.width)
        g_full = np.asarray(grasps.full_antipodal)
        g_half = np.asarray(grasps.half_antipodal)
        g_pos = np.asarray(grasps.position)
        g_mid = np.asarray(grasps.finger_placement)

        frames_np = np.asarray(frames).astype(np.float64)
        M = cfg.num_orientations * len(cfg.hand_axes)
        radius = cfg.hand_search_radius

        n_checked = n_mismatch = 0
        for s in range(S):
            d = np.linalg.norm(pts - samples[s], axis=1)
            nb_mask = d <= radius
            ref = oracle_eval_hand_set(
                pts[nb_mask].astype(np.float64), nrm[nb_mask].astype(np.float64),
                samples[s].astype(np.float64), frames_np[s],
                cfg.angles, cfg.hand_axes, cfg.hand_geometry,
                P=cfg.num_finger_placements, deepen=deepen)
            for o in range(M):
                gi = s * M + o
                n_checked += 1
                if ref[o]["valid"] != bool(g_valid[gi]):
                    n_mismatch += 1
                    continue
                if not ref[o]["valid"]:
                    continue
                if abs(ref[o]["top"] - g_top[gi]) > 1e-5 or \
                   abs(ref[o]["center"] - g_center[gi]) > 1e-5 or \
                   ref[o]["idx"] != g_mid[gi] or \
                   abs(ref[o]["width"] - g_width[gi]) > 1e-4 or \
                   np.abs(ref[o]["pos"] - g_pos[gi]).max() > 1e-4 or \
                   ref[o]["full"] != bool(g_full[gi]) or \
                   ref[o]["half"] != bool(g_half[gi]):
                    n_mismatch += 1
        # Allow a small disagreement rate from f32-vs-f64 threshold flips.
        assert n_checked == S * M
        assert n_mismatch <= max(2, int(0.03 * n_checked)), \
            f"{n_mismatch}/{n_checked} mismatches"
        # And the search must actually find grasps on a graspable slab.
        assert g_valid.sum() > 0

    def test_antipodal_on_slab(self, rng):
        """A clean parallel-faced slab must produce full-antipodal grasps."""
        pts, nrm = make_slab_cloud(rng, n=4000)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(search_neighbors_cap=4096, frame_neighbors_cap=256)
        S = 16
        samples = pts[rng.choice(len(pts), S, replace=False)]
        grasps = cand.search_hands(cloud, jnp.asarray(samples),
                                   jnp.ones(S, bool), cfg)
        assert int(np.asarray(grasps.full_antipodal).sum()) > 0

    def test_empty_space_no_grasps(self):
        pts = np.zeros((100, 3), np.float32)
        nrm = np.tile(np.array([0, 0, 1.0], np.float32), (100, 1))
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig()
        far = np.full((4, 3), 10.0, np.float32)
        grasps = cand.search_hands(cloud, jnp.asarray(far), jnp.ones(4, bool), cfg)
        assert int(np.asarray(grasps.valid).sum()) == 0


class TestAntipodalOracleUnit:
    def test_full_grasp(self):
        # 10 points on each side with inward normals -> FULL
        n = 10
        pts = np.zeros((2 * n, 3))
        pts[:n, 1] = -0.02
        pts[n:, 1] = 0.02
        pts[:, 0] = np.tile(np.linspace(0, 0.01, n), 2)
        nrm = np.zeros((2 * n, 3))
        nrm[:n, 1] = -1.0
        nrm[n:, 1] = 1.0
        assert oracle_antipodal(pts, nrm) == 2

    def test_half_grasp(self):
        n = 10
        pts = np.zeros((n, 3))
        pts[:, 1] = np.linspace(-0.02, 0.02, n)
        nrm = np.zeros((n, 3))
        nrm[:, 1] = -1.0
        assert oracle_antipodal(pts, nrm) == 1


class TestReevaluate:
    def test_labels_on_same_cloud(self, rng):
        """Re-evaluating candidates against the cloud they came from should
        label (most) full-antipodal candidates as full again."""
        pts, nrm = make_slab_cloud(rng, n=2500)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(search_neighbors_cap=4096, frame_neighbors_cap=256)
        S = 16
        samples = pts[rng.choice(len(pts), S, replace=False)]
        grasps = cand.search_hands(cloud, jnp.asarray(samples),
                                   jnp.ones(S, bool), cfg)
        labels, re = cand.reevaluate_hypotheses(cloud, grasps, cfg)
        labels = np.asarray(labels)
        was_full = np.asarray(grasps.full_antipodal)
        if was_full.sum() > 0:
            agree = labels[was_full].mean()
            assert agree > 0.7, f"only {agree:.2f} of full grasps re-labeled"


class TestSampleBlocking:
    def test_blocked_matches_single(self, rng, monkeypatch):
        """The sample-blocked search path (big-scene memory bound) must be
        bit-identical to the single-block path."""
        pts, nrm = make_slab_cloud(rng, n=900)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(search_neighbors_cap=256, frame_neighbors_cap=32)
        spos = jnp.asarray(pts[:300])
        smask = jnp.ones(300, bool)

        g1 = cand.search_hands(cloud, spos, smask, cfg)
        cand._search_kernel.clear_cache()
        # Force tiny blocks: budget for (M=8, B=128, K=256) only.
        monkeypatch.setattr(cand, "_BLOCK_ELEMS", 8 * 128 * 256)
        g2 = cand.search_hands(cloud, spos, smask, cfg)
        cand._search_kernel.clear_cache()

        np.testing.assert_array_equal(np.asarray(g1.valid),
                                      np.asarray(g2.valid))
        v = np.asarray(g1.valid)
        np.testing.assert_allclose(np.asarray(g1.position)[v],
                                   np.asarray(g2.position)[v], atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1.width)[v],
                                   np.asarray(g2.width)[v], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(g1.full_antipodal),
                                      np.asarray(g2.full_antipodal))

    def test_sub128_blocks_identity_match(self, rng, monkeypatch):
        """Very large K (identity search on >32k-point clouds) shrinks the
        sample block below 128 rows; the sub-128 blocked path must be
        bit-identical to the single-block identity path. (Emulated by
        shrinking the budget: blk = _BLOCK_ELEMS // (M*K) < 128.)"""
        pts, nrm = make_slab_cloud(rng, n=900)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        n_cap = cloud.capacity
        # Identity search: cap covers the whole (padded) cloud.
        cfg = DetectorConfig(search_neighbors_cap=n_cap,
                             frame_neighbors_cap=32)
        spos = jnp.asarray(pts[:300])
        smask = jnp.ones(300, bool)

        g1 = cand.search_hands(cloud, spos, smask, cfg)
        cand._search_kernel.clear_cache()
        # Budget for 24-row blocks at this K: exercises the blk < 128 branch.
        monkeypatch.setattr(cand, "_BLOCK_ELEMS", 8 * 24 * n_cap)
        g2 = cand.search_hands(cloud, spos, smask, cfg)
        cand._search_kernel.clear_cache()

        np.testing.assert_array_equal(np.asarray(g1.valid),
                                      np.asarray(g2.valid))
        v = np.asarray(g1.valid)
        assert v.sum() > 0
        np.testing.assert_allclose(np.asarray(g1.position)[v],
                                   np.asarray(g2.position)[v], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(g1.full_antipodal),
                                      np.asarray(g2.full_antipodal))

    def test_blocked_skips_invalid_samples(self, rng, monkeypatch):
        """With a sparse sample mask the blocked path reorders valid-first
        and cond-skips all-invalid blocks; results for valid samples must
        still match the single-block path exactly (in caller order)."""
        pts, nrm = make_slab_cloud(rng, n=900)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(search_neighbors_cap=256, frame_neighbors_cap=32)
        spos = jnp.asarray(pts[:300])
        # Scattered validity: ~1/3 valid, interleaved so the reorder is a
        # real permutation.
        smask = jnp.asarray(np.arange(300) % 3 == 1)

        g1 = cand.search_hands(cloud, spos, smask, cfg)
        cand._search_kernel.clear_cache()
        monkeypatch.setattr(cand, "_BLOCK_ELEMS", 8 * 128 * 256)
        g2 = cand.search_hands(cloud, spos, smask, cfg)
        cand._search_kernel.clear_cache()

        np.testing.assert_array_equal(np.asarray(g1.valid),
                                      np.asarray(g2.valid))
        v = np.asarray(g1.valid)
        assert v.sum() > 0
        # Hands of invalid samples must be invalid in both.
        sid = np.asarray(g1.sample_id)
        assert not v[~np.asarray(smask)[sid]].any()
        np.testing.assert_allclose(np.asarray(g1.position)[v],
                                   np.asarray(g2.position)[v], atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1.score)[v],
                                   np.asarray(g2.score)[v], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(g1.full_antipodal),
                                      np.asarray(g2.full_antipodal))
