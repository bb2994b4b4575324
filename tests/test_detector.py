"""End-to-end detector tests on the reference fixtures (krylon.pcd,
table_mug.pcd) plus filter/clustering unit tests vs NumPy oracles."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpd_tpu.config import DetectorConfig, load_config
from gpd_tpu.core.types import CloudArrays, Grasps
from gpd_tpu.detector import GraspDetector, detect_core, select_and_cluster
from gpd_tpu import select as sel


def small_cfg(**kw):
    base = dict(num_samples=24, search_neighbors_cap=512,
                frame_neighbors_cap=64, normals_neighbors_cap=64,
                shadow_voxel_cap=512, min_inliers=0, num_selected=10)
    base.update(kw)
    return DetectorConfig(**base)


def make_grasps(n, rng):
    R = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    return Grasps(
        position=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)),
        orientation=jnp.asarray(R),
        sample=jnp.zeros((n, 3), jnp.float32),
        width=jnp.asarray(rng.uniform(0, 0.1, n).astype(np.float32)),
        score=jnp.asarray(rng.normal(size=n).astype(np.float32)),
        bottom=jnp.zeros(n), top=jnp.zeros(n), center=jnp.zeros(n),
        finger_placement=jnp.zeros(n, jnp.int32),
        full_antipodal=jnp.zeros(n, bool),
        half_antipodal=jnp.zeros(n, bool),
        valid=jnp.ones(n, bool),
        sample_id=jnp.zeros(n, jnp.int32),
    )


class TestFilters:
    def test_aperture(self, rng):
        g = make_grasps(50, rng)
        out = sel.filter_grasps_workspace(g, (-10, 10, -10, 10, -10, 10),
                                          0.02, 0.05, 0.12, 0.06)
        w = np.asarray(g.width)
        v = np.asarray(out.valid)
        np.testing.assert_array_equal(v, (w >= 0.02) & (w <= 0.05))

    def test_workspace_keypoints(self, rng):
        g = make_grasps(50, rng)
        # Tight box: only grasps whose 5 keypoints fit survive.
        out = sel.filter_grasps_workspace(g, (-0.3, 0.3, -0.3, 0.3, -0.3, 0.3),
                                          0.0, 1.0, 0.12, 0.06)
        pos = np.asarray(g.position)
        v = np.asarray(out.valid)
        # Replicate reference keypoints (incl. right_top quirk).
        for i in range(50):
            p = pos[i]
            binormal = np.array([0, 1, 0.0])
            approach = np.array([1, 0, 0.0])
            lb = p + 0.06 * binormal
            rb = p - 0.06 * binormal
            lt = lb + 0.06 * approach
            rt = lb + 0.06 * approach
            ap = p - 0.05 * approach
            pts = np.stack([lb, rb, lt, rt, ap])
            ok = (pts.min(0) >= -0.3).all() and (pts.max(0) <= 0.3).all()
            assert ok == v[i], i

    def test_direction_filter(self, rng):
        g = make_grasps(30, rng)
        out = sel.filter_grasps_direction(g, (1, 0, 0), 0.5)
        # approach = identity col 0 = (1,0,0): angle 0 <= 0.5 -> all valid
        assert np.asarray(out.valid).all()
        out2 = sel.filter_grasps_direction(g, (-1, 0, 0), 0.5)
        assert not np.asarray(out2.valid).any()


def oracle_clusters(pos, axis, score, min_inliers, remove_inliers=False):
    """Transcription of clustering.cpp:5-105."""
    n = len(pos)
    has_used = np.zeros(n, bool)
    out = []
    for i in range(n):
        inl = []
        for j in range(n):
            if i == j or (remove_inliers and has_used[j]):
                continue
            if abs(axis[i] @ axis[j]) <= math.cos(12 * math.pi / 180):
                continue
            d = pos[i] - pos[j]
            if np.linalg.norm(d) > 0.05:
                continue
            proj = (np.eye(3) - np.outer(axis[i], axis[i])) @ d
            if np.linalg.norm(proj) > 0.005:
                continue
            inl.append(j)
        if len(inl) >= min_inliers:
            if remove_inliers:
                has_used[inl] = True
            mean_pos = pos[inl].mean(0)
            m = score[inl].mean()
            sd = score[inl].std()
            conf = m - 2.576 * sd / math.sqrt(len(inl))
            out.append((i, mean_pos, conf, len(inl)))
    return out


class TestClustering:
    @pytest.mark.parametrize("remove_inliers", [False, True])
    def test_vs_oracle(self, rng, remove_inliers):
        n = 60
        # Clustered positions: 6 centers with jitter
        centers = rng.uniform(-0.3, 0.3, (6, 3))
        pos = (centers[rng.integers(0, 6, n)] +
               rng.normal(0, 0.001, (n, 3))).astype(np.float32)
        axis = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
        score = rng.normal(size=n).astype(np.float32)
        g = make_grasps(n, rng)
        g = dataclasses.replace(g, position=jnp.asarray(pos),
                                score=jnp.asarray(score))
        out = sel.cluster_grasps(g, min_inliers=3,
                                 remove_inliers=remove_inliers)
        ref = oracle_clusters(pos.astype(np.float64),
                              axis.astype(np.float64),
                              score.astype(np.float64), 3, remove_inliers)
        v = np.asarray(out.valid)
        assert v.sum() == len(ref)
        ref_by_i = {i: (mp, c) for i, mp, c, _ in ref}
        outpos = np.asarray(out.position)
        outscore = np.asarray(out.score)
        for i in np.nonzero(v)[0]:
            assert i in ref_by_i
            mp, c = ref_by_i[i]
            np.testing.assert_allclose(outpos[i], mp, atol=1e-5)
            assert abs(outscore[i] - c) < 1e-4


class TestTopK:
    def test_select(self, rng):
        g = make_grasps(40, rng)
        out, _ = sel.select_top_k(g, 5)
        scores = np.asarray(g.score)
        v = np.asarray(out.valid)
        assert v.sum() == 5
        got = set(np.round(np.asarray(out.score)[v], 5).tolist())
        want = set(np.round(np.sort(scores)[-5:], 5).tolist())
        assert got == want

    def test_out_cap_truncates_to_head(self, rng):
        """select_top_k(out_cap=m) must return exactly the leading m rows
        of the full-capacity result (the serving path gathers only the
        selected heads)."""
        g = make_grasps(40, rng)
        full, _ = sel.select_top_k(g, 5)
        trunc, _ = sel.select_top_k(g, 5, out_cap=8)
        assert trunc.capacity == 8
        np.testing.assert_array_equal(np.asarray(trunc.valid),
                                      np.asarray(full.valid)[:8])
        np.testing.assert_allclose(np.asarray(trunc.position),
                                   np.asarray(full.position)[:8])
        np.testing.assert_allclose(np.asarray(trunc.score),
                                   np.asarray(full.score)[:8])


class TestEndToEnd:
    def test_krylon_full_pipeline(self, krylon_points):
        cfg = small_cfg()
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(krylon_points,
                                     view_points=np.zeros((1, 3), np.float32))
        n_pts = int(np.asarray(cloud.mask).sum())
        assert 1000 < n_pts < 4467  # voxelized down
        grasps = det.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        n = int(np.asarray(grasps.valid).sum())
        assert n > 0, "no grasps found on krylon"
        assert n <= cfg.num_selected
        # Scores sorted descending among valid
        s = np.asarray(grasps.score)[np.asarray(grasps.valid)]
        assert np.all(np.diff(s) <= 1e-6)

    def test_krylon_finds_antipodal_candidates(self, krylon_points):
        """The spray can is graspable: with normals flipped outward
        (centered_at_origin — the krylon cloud is object-centered with the
        camera at the origin, so viewpoint orientation points normals
        inward), candidate search must find full-antipodal candidates."""
        from gpd_tpu.ops import candidates as cand
        cfg = small_cfg(num_samples=32, search_neighbors_cap=4096,
                        centered_at_origin=True)
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(krylon_points,
                                     view_points=np.zeros((1, 3), np.float32))
        spos, smask = det.sample_cloud(cloud, jax.random.PRNGKey(1))
        g = cand.search_hands(cloud, spos, smask, cfg)
        assert int(np.asarray(g.valid).sum()) > 10
        assert int(np.asarray(g.full_antipodal).sum()) > 0

    def test_clustering_path(self, krylon_points):
        cfg = small_cfg(min_inliers=1)
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(krylon_points,
                                     view_points=np.zeros((1, 3), np.float32))
        grasps = det.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        assert int(np.asarray(grasps.valid).sum()) > 0

    def test_12_channel_path(self, krylon_points):
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, image_geometry=dataclasses.replace(cfg.image_geometry,
                                                    num_channels=12))
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(krylon_points,
                                     view_points=np.zeros((1, 3), np.float32))
        grasps = det.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        assert int(np.asarray(grasps.valid).sum()) > 0

    def test_determinism(self, krylon_points):
        cfg = small_cfg()
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(krylon_points,
                                     view_points=np.zeros((1, 3), np.float32))
        g1 = det.detect(cloud, key=jax.random.PRNGKey(7), verbose=False)
        g2 = det.detect(cloud, key=jax.random.PRNGKey(7), verbose=False)
        np.testing.assert_array_equal(np.asarray(g1.valid), np.asarray(g2.valid))
        np.testing.assert_allclose(np.asarray(g1.score), np.asarray(g2.score))


class TestMultiCamera:
    def test_two_view_cloud(self, rng):
        """Two-camera cloud: bitmask camera sources flow through preprocess,
        shadows, and detection (reference two-camera ctor cloud.cpp:120-152)."""
        n = 1200
        theta1 = rng.uniform(-np.pi / 2, np.pi / 2, n)
        theta2 = rng.uniform(np.pi / 2, 3 * np.pi / 2, n)
        theta = np.concatenate([theta1, theta2])
        pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        rng.uniform(-0.05, 0.05, 2 * n)], 1).astype(np.float32)
        cam = np.zeros((2, 2 * n), np.int32)
        cam[0, :n] = 1
        cam[1, n:] = 1
        vp = np.array([[0.5, 0, 0], [-0.5, 0, 0]], np.float32)
        cfg = small_cfg(num_samples=16)
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(pts, view_points=vp, cam_source=cam)
        # normals oriented per camera: x>0 points toward cam0 at +x
        g = det.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        assert int(np.asarray(g.valid).sum()) > 0

    def test_fifteen_channel_two_view(self, rng):
        n = 800
        theta = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        rng.uniform(-0.04, 0.04, n)], 1).astype(np.float32)
        cam = np.ones((2, n), np.int32)  # all points seen by both cameras
        vp = np.array([[0.5, 0, 0], [0, 0.5, 0]], np.float32)
        cfg = small_cfg(num_samples=8)
        cfg = dataclasses.replace(
            cfg, image_geometry=dataclasses.replace(cfg.image_geometry,
                                                    num_channels=15))
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(pts, view_points=vp, cam_source=cam)
        g = det.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        assert g.valid.shape[0] > 0


class TestLargeCloud:
    def test_table_mug_detect(self):
        """The bigger table_mug fixture (104k raw points) through the full
        pipeline at a moderate sample count."""
        from gpd_tpu.io.pcd import load_pcd
        pts = load_pcd("/root/reference/tutorials/table_mug.pcd")
        cfg = small_cfg(num_samples=16, sample_above_plane=True)
        det = GraspDetector(cfg)
        cloud = det.preprocess_cloud(pts,
                                     view_points=np.zeros((1, 3), np.float32))
        n = int(np.asarray(cloud.mask).sum())
        assert n > 5000  # voxelized from 104k
        g = det.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        assert int(np.asarray(g.valid).sum()) > 0


class TestChunkedScoring:
    def test_many_samples_chunks(self, rng):
        """More candidates than one image chunk: scores must cover all valid
        hands (chunked image/score path in detect_core)."""  # anchor
        from gpd_tpu.detector import detect_core
        n = 2500
        theta = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        rng.uniform(-0.05, 0.05, n)], 1).astype(np.float32)
        nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                       1).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = small_cfg(num_samples=48)
        det = GraspDetector(cfg)
        spos = jnp.asarray(pts[:48])
        smask = jnp.ones(48, bool)
        # Force 3 chunks: cap 128 < 48*8=384 candidates.
        g, images = detect_core(cloud, spos, smask, det.params,
                                jax.random.PRNGKey(0), cfg, 128)
        valid = np.asarray(g.valid)
        scores = np.asarray(g.score)
        assert valid.sum() > 128, "test needs more valid hands than one chunk"
        assert np.isfinite(scores[valid]).all()
        assert images.shape[0] == g.valid.shape[0]


class TestStagedDetect:
    def test_staged_matches_fused(self, rng):
        """detect(staged=True) reports the reference's four-line runtime
        breakdown and must select the same grasps/scores as the fused path
        (same candidates, same images, same classifier)."""
        n = 1200
        theta = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        rng.uniform(-0.05, 0.05, n)], 1).astype(np.float32)
        nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                       1).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = small_cfg(num_samples=16)
        det = GraspDetector(cfg)
        spos = jnp.asarray(pts[:16])
        smask = jnp.ones(16, bool)
        a = det.detect(cloud, spos, smask, key=jax.random.PRNGKey(3),
                       verbose=False)
        b = det.detect(cloud, spos, smask, key=jax.random.PRNGKey(3),
                       verbose=False, staged=True)
        assert set(det.last_runtimes) == {"candidates", "images",
                                          "classify", "total"}
        va, vb = np.asarray(a.valid), np.asarray(b.valid)
        assert va.sum() == vb.sum() and va.sum() > 0
        np.testing.assert_allclose(np.sort(np.asarray(a.score)[va]),
                                   np.sort(np.asarray(b.score)[vb]),
                                   atol=1e-5)

    def test_active_sample_blocked_imaging_matches_unblocked(self, rng):
        """Big sample sets (> _SAMPLE_BLOCK) route descriptor inputs through
        the active-sample-compacted blocked path; with 3 channels (no shadow
        RNG) the blocked scores must match the unblocked path exactly."""
        import gpd_tpu.detector as det_mod
        from gpd_tpu.config import ImageGeometry

        n = 2000
        theta = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        rng.uniform(-0.3, 0.3, n)], 1).astype(np.float32)
        nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                       1).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        S = 600
        cfg = small_cfg(num_samples=S,
                        image_geometry=ImageGeometry(num_channels=3))
        det = GraspDetector(cfg)
        spos = jnp.asarray(pts[:S])
        smask = jnp.ones(S, bool)
        key = jax.random.PRNGKey(2)
        assert S > det_mod._SAMPLE_BLOCK
        ga, _ = detect_core(cloud, spos, smask, det.params, key, cfg, 256,
                            scores_only=True)
        # Force the unblocked path by raising the block size past S.
        old = det_mod._SAMPLE_BLOCK
        det_mod._SAMPLE_BLOCK = 4096
        det_mod._descriptor_inputs.clear_cache()
        det_mod.score_candidates.clear_cache()
        det_mod.detect_core.clear_cache()
        try:
            gb, _ = detect_core(cloud, spos, smask, det.params, key, cfg,
                                256, scores_only=True)
        finally:
            det_mod._SAMPLE_BLOCK = old
            det_mod._descriptor_inputs.clear_cache()
            det_mod.score_candidates.clear_cache()
            det_mod.detect_core.clear_cache()
        va, vb = np.asarray(ga.valid), np.asarray(gb.valid)
        np.testing.assert_array_equal(va, vb)
        assert va.sum() > 0
        np.testing.assert_allclose(np.asarray(ga.score)[va],
                                   np.asarray(gb.score)[vb], atol=1e-5)

    def test_serve_capacity_warm_path(self, rng):
        """Different-sized clouds in the same serve octave must reuse every
        compiled program: the second detect adds ZERO jit-cache entries
        (the warmup-bounding contract of capacity='serve')."""
        import gpd_tpu.detector as det_mod

        cfg = small_cfg(num_samples=32)
        det = GraspDetector(cfg)

        def make(n):
            theta = rng.uniform(0, 2 * np.pi, n)
            pts = np.stack([0.05 * np.cos(theta), 0.05 * np.sin(theta),
                            rng.uniform(-0.3, 0.3, n)], 1)
            return pts.astype(np.float32)

        c1 = det.preprocess_cloud(make(2300), capacity="serve")
        det.detect(c1, verbose=False)
        probes = (det_mod.detect_core, det_mod.candidates_stage,
                  det_mod.score_candidates, det_mod.select_and_cluster,
                  det_mod._prep_filter_voxel, det_mod._prep_normals)
        sizes = [p._cache_size() for p in probes]

        c2 = det.preprocess_cloud(make(2600), capacity="serve")
        assert c2.capacity == c1.capacity
        det.detect(c2, verbose=False)
        assert [p._cache_size() for p in probes] == sizes

    def test_active_sample_blocked_imaging_matches_unblocked_15ch(self, rng):
        """15-channel variant of the blocked-vs-unblocked parity: shadow
        jitter is keyed by ORIGINAL sample index (compute_shadows
        sample_uid), so results must be invariant to the active-first
        permutation and blocking — not just the shadow-free channels."""
        import gpd_tpu.detector as det_mod
        from gpd_tpu.config import ImageGeometry

        n = 2000
        theta = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        rng.uniform(-0.3, 0.3, n)], 1).astype(np.float32)
        nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                       1).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        S = 600
        cfg = small_cfg(num_samples=S,
                        image_geometry=ImageGeometry(num_channels=15))
        det = GraspDetector(cfg)
        spos = jnp.asarray(pts[:S])
        smask = jnp.ones(S, bool)
        key = jax.random.PRNGKey(2)
        assert S > det_mod._SAMPLE_BLOCK
        ga, _ = detect_core(cloud, spos, smask, det.params, key, cfg, 256,
                            scores_only=True)
        old = det_mod._SAMPLE_BLOCK
        det_mod._SAMPLE_BLOCK = 4096
        det_mod._descriptor_inputs.clear_cache()
        det_mod.score_candidates.clear_cache()
        det_mod.detect_core.clear_cache()
        try:
            gb, _ = detect_core(cloud, spos, smask, det.params, key, cfg,
                                256, scores_only=True)
        finally:
            det_mod._SAMPLE_BLOCK = old
            det_mod._descriptor_inputs.clear_cache()
            det_mod.score_candidates.clear_cache()
            det_mod.detect_core.clear_cache()
        va, vb = np.asarray(ga.valid), np.asarray(gb.valid)
        np.testing.assert_array_equal(va, vb)
        assert va.sum() > 0
        np.testing.assert_allclose(np.asarray(ga.score)[va],
                                   np.asarray(gb.score)[vb], atol=1e-5)

    def test_image_neighbors_cap_truncation_dense_scene(self, rng):
        """image_neighbors_cap (nearest-K descriptor neighborhoods) on a
        dense 15-channel scene must reproduce the uncapped images: the image
        volume (0.10 x 0.06 x 0.04 box) is far smaller than the 0.10-radius
        neighborhood ball, so the nearest K points cover it and truncation
        only drops points the rasterizer would mask out anyway. Validates
        the documented truncation at 15ch on a cloud well above the cap
        (the effective_config override does not fire at n > 1.5*cap)."""
        # Dense tabletop: 0.25 m plane grid + standing cylinder, 3725 pts.
        gx, gy = np.meshgrid(np.linspace(-0.125, 0.125, 50),
                             np.linspace(-0.125, 0.125, 50))
        plane = np.stack([gx.ravel(), gy.ravel(),
                          np.zeros(2500)], 1).astype(np.float32)
        plane_n = np.tile(np.array([0, 0, 1], np.float32), (2500, 1))
        theta = rng.uniform(0, 2 * np.pi, 1225)
        h = rng.uniform(0.005, 0.12, 1225)
        cyl = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        h], 1).astype(np.float32)
        cyl_n = np.stack([np.cos(theta), np.sin(theta),
                          np.zeros(1225)], 1).astype(np.float32)
        pts = np.concatenate([plane, cyl]).astype(np.float32)
        nrm = np.concatenate([plane_n, cyl_n]).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        n = cloud.capacity
        cap = 2048
        assert n > 1.5 * cap, "scene must exceed the override threshold"

        spos = jnp.asarray(cyl[:24])
        smask = jnp.ones(24, bool)
        key = jax.random.PRNGKey(5)
        base = small_cfg(num_samples=24, search_neighbors_cap=1024)
        det = GraspDetector(base)
        cfg_trunc = dataclasses.replace(base, image_neighbors_cap=cap)
        cfg_full = dataclasses.replace(base, image_neighbors_cap=1 << 20)
        ga, _ = detect_core(cloud, spos, smask, det.params, key, cfg_trunc,
                            256, scores_only=True)
        gb, _ = detect_core(cloud, spos, smask, det.params, key, cfg_full,
                            256, scores_only=True)
        va, vb = np.asarray(ga.valid), np.asarray(gb.valid)
        np.testing.assert_array_equal(va, vb)
        assert va.sum() > 20
        sa, sb = np.asarray(ga.score)[va], np.asarray(gb.score)[vb]
        d = np.abs(sa - sb)
        spread = max(sa.max() - sa.min(), 1e-3)
        # Nearest-K truncation must be score-neutral up to shadow-source
        # sampling noise between the identity and gather paths.
        assert np.median(d) < 0.02 * spread, (np.median(d), spread)
        assert d.max() < 0.2 * spread, (d.max(), spread)
        top_a = set(np.argsort(-sa)[:10])
        top_b = set(np.argsort(-sb)[:10])
        assert len(top_a & top_b) >= 8, (top_a, top_b)

    def test_staged_chunks_cover_all_candidates(self, rng):
        """Staged path with more valid candidates than one image chunk: the
        chunk loop must score every valid hand (regression for the former
        silent cap at the first `image_cap` hands), matching the fused
        path's selection exactly."""
        n = 2500
        theta = rng.uniform(0, 2 * np.pi, n)
        pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                        rng.uniform(-0.05, 0.05, n)], 1).astype(np.float32)
        nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                       1).astype(np.float32)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = small_cfg(num_samples=48, num_selected=200)
        det = GraspDetector(cfg)
        spos = jnp.asarray(pts[:48])
        smask = jnp.ones(48, bool)
        a = det.detect(cloud, spos, smask, key=jax.random.PRNGKey(3),
                       verbose=False)
        # cap=128 < 48*8=384 candidates -> 3 chunks, >1 live.
        b = det.detect(cloud, spos, smask, key=jax.random.PRNGKey(3),
                       verbose=False, staged=True, staged_cap=128)
        va, vb = np.asarray(a.valid), np.asarray(b.valid)
        assert va.sum() == vb.sum()
        assert va.sum() > 128, "test needs more valid hands than one chunk"
        np.testing.assert_allclose(np.sort(np.asarray(a.score)[va]),
                                   np.sort(np.asarray(b.score)[vb]),
                                   atol=1e-5)
