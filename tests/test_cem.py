"""CEM (sequential importance sampling) tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gpd_tpu.cem import (SequentialImportanceSampling, draw_max_of_gaussians,
                         draw_sum_of_gaussians, draw_uniform_cloud_samples)
from gpd_tpu.config import CEMConfig, DetectorConfig
from gpd_tpu.core.types import CloudArrays
from gpd_tpu.detector import GraspDetector


def cylinder_cloud(rng, n=1500):
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                    rng.uniform(-0.05, 0.05, n)], 1).astype(np.float32)
    nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                   1).astype(np.float32)
    return pts, nrm


class TestSampling:
    def test_sum_of_gaussians(self, rng):
        centers = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        mask = jnp.ones(20, bool)
        s = draw_sum_of_gaussians(jax.random.PRNGKey(0), centers, mask,
                                  0.02, 100)
        s = np.asarray(s)
        assert s.shape == (100, 3)
        # Every draw within a few sigma of some center.
        d = np.linalg.norm(s[:, None] - np.asarray(centers)[None], axis=-1)
        assert (d.min(1) < 0.02 * 5).all()

    def test_max_of_gaussians(self, rng):
        centers = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        mask = jnp.ones(10, bool)
        s = draw_max_of_gaussians(jax.random.PRNGKey(0), centers, mask,
                                  0.02, 50)
        assert np.asarray(s).shape == (50, 3)

    def _oracle_max_of_gaussians(self, rng, centers, sigma, n):
        """Literal transcription of drawSamplesFromMaxOfGaussians
        (sequential_importance_sampling.cpp:203-237): loop until n draws
        accepted; accept a draw from center idx iff its density under
        center idx >= the max density over all centers (equivalently: no
        other center is strictly closer). Returns (samples, n_proposals)."""
        out = np.empty((n, 3))
        j = 0
        proposals = 0
        V = len(centers)
        while j < n:
            idx = rng.integers(0, V)
            x = centers[idx] + rng.normal(0, sigma, 3)
            proposals += 1
            d2 = np.sum((x[None, :] - centers) ** 2, axis=1)
            if d2[idx] <= d2.min() + 1e-12:
                out[j] = x
                j += 1
        return out, proposals

    def test_max_of_gaussians_matches_reference_distribution(self, rng):
        """Statistical fidelity vs the reference's loop-until-accepted
        rejection sampler: acceptance rate and the distance-to-nearest-
        center density histogram must agree, in BOTH a high-acceptance
        regime (well-separated centers) and the low-acceptance regime
        where the fixed-oversample fill engages."""
        for name, spread, sigma in (("high-acceptance", 1.0, 0.05),
                                    ("low-acceptance", 0.02, 0.5)):
            centers = rng.normal(0, spread, size=(16, 3)).astype(np.float32)
            cj = jnp.asarray(centers)
            mask = jnp.ones(16, bool)
            n = 1000

            # Reference oracle draws + empirical acceptance rate.
            want, proposals = self._oracle_max_of_gaussians(
                rng, centers.astype(np.float64), sigma, 2 * n)
            acc_oracle = 2 * n / proposals

            # Several independent keys: at low acceptance the resample-fill
            # duplicates accepted draws, shrinking the effective sample
            # count per call.
            got = np.concatenate([
                np.asarray(draw_max_of_gaussians(
                    jax.random.PRNGKey(7 + i), cj, mask, sigma, n))
                for i in range(4)])

            # Batched acceptance rate of the proposal pass itself.
            m = 4 * n
            k1, k2 = jax.random.split(jax.random.PRNGKey(3))
            idx = jax.random.choice(k1, 16, shape=(m,))
            x = cj[idx] + jax.random.normal(k2, (m, 3)) * sigma
            d2 = jnp.sum((x[:, None, :] - cj[None, :, :]) ** 2, axis=-1)
            d2o = jnp.sum((x - cj[idx]) ** 2, axis=-1)
            acc_jax = float(jnp.mean(d2o <= jnp.min(d2, axis=1) + 1e-12))
            assert abs(acc_jax - acc_oracle) < 0.08, \
                f"{name}: acceptance {acc_jax:.3f} vs oracle {acc_oracle:.3f}"

            # Density-histogram comparison: distance to nearest center,
            # normalized by sigma, total-variation distance of 10-bin
            # histograms.
            def nearest_d(s):
                d = np.linalg.norm(s[:, None] - centers[None], axis=-1)
                return d.min(1) / sigma
            bins = np.linspace(0, 4, 11)
            h_w, _ = np.histogram(nearest_d(want), bins=bins, density=False)
            h_g, _ = np.histogram(nearest_d(got), bins=bins, density=False)
            tv = 0.5 * np.abs(h_w / len(want) - h_g / len(got)).sum()
            assert tv < 0.1, f"{name}: TV distance {tv:.3f}"

    def test_max_of_gaussians_fill_resamples_accepted(self, rng):
        """When fewer than n proposals are accepted, the shortfall must be
        filled from the ACCEPTED set (correct distribution), not with
        rejected draws: every output row must satisfy the accept rule or
        duplicate an accepted row."""
        # Line of tightly spaced centers + huge sigma: low acceptance.
        centers = np.zeros((32, 3), np.float32)
        centers[:, 0] = np.linspace(0, 0.31, 32)
        cj = jnp.asarray(centers)
        s = np.asarray(draw_max_of_gaussians(
            jax.random.PRNGKey(0), cj, jnp.ones(32, bool), 1.0, 500))
        d2 = np.sum((s[:, None] - centers[None]) ** 2, axis=-1)
        # Which center generated each draw is unknown, but an ACCEPTED draw
        # from center j is closest to j; so every output must be "closest
        # to its own generator", i.e. consistent with acceptance. With the
        # old rejected-draw fill this failed for most of the tail.
        # Output rows are accepted draws (possibly duplicated), so each
        # row's nearest center is its generator: verify by re-testing the
        # accept rule with the nearest center as generator (tautology),
        # and instead assert the tail contains DUPLICATES of head rows
        # rather than fresh rejected geometry: all rows must appear in the
        # accepted subset of the 4*n proposal batch -> uniqueness drops.
        uniq = np.unique(s.round(7), axis=0)
        assert len(uniq) < len(s), \
            "low-acceptance fill produced no resampled duplicates"

    def test_uniform_respects_workspace(self, rng):
        pts = jnp.asarray(rng.uniform(-1, 1, (500, 3)).astype(np.float32))
        mask = jnp.ones(500, bool)
        ws = (-0.2, 0.2, -0.2, 0.2, -0.2, 0.2)
        s = np.asarray(draw_uniform_cloud_samples(
            jax.random.PRNGKey(0), pts, mask, ws, 64))
        assert (np.abs(s) <= 0.2 + 1e-6).all()


class TestCEMDetect:
    def test_fused_matches_loop(self, rng):
        """The single-device fused CEM program (one jit: scan over rounds +
        map over scoring) must reproduce the Python round loop exactly —
        the key-split sequence is replicated, so every sample draw, score,
        and selected grasp is identical."""
        pts, nrm = cylinder_cloud(rng)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(num_samples=16, search_neighbors_cap=256,
                             frame_neighbors_cap=32, shadow_voxel_cap=256,
                             min_inliers=0, num_selected=10)
        cem = CEMConfig(num_init_samples=12, num_iterations=2,
                        num_samples_per_iteration=12)
        det = GraspDetector(cfg)
        sis = SequentialImportanceSampling(det, cem)
        out_fused = sis.detect(cloud, key=jax.random.PRNGKey(7),
                               verbose=False)
        counts_fused = list(sis.last_round_counts)
        sis._force_loop = True
        out_loop = sis.detect(cloud, key=jax.random.PRNGKey(7),
                              verbose=False)
        assert counts_fused == list(sis.last_round_counts)
        vf, vl = np.asarray(out_fused.valid), np.asarray(out_loop.valid)
        np.testing.assert_array_equal(vf, vl)
        np.testing.assert_allclose(np.asarray(out_fused.position)[vf],
                                   np.asarray(out_loop.position)[vl],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out_fused.score)[vf],
                                   np.asarray(out_loop.score)[vl],
                                   atol=1e-5)

    def test_end_to_end(self, rng):
        pts, nrm = cylinder_cloud(rng)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(search_neighbors_cap=256, frame_neighbors_cap=32,
                             normals_neighbors_cap=32, shadow_voxel_cap=256,
                             min_inliers=0, num_selected=20)
        det = GraspDetector(cfg)
        cem = CEMConfig(num_init_samples=8, num_iterations=2,
                        num_samples_per_iteration=8, min_score=-1e9)
        sis = SequentialImportanceSampling(det, cem)
        out = sis.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        assert int(np.asarray(out.valid).sum()) > 0

    def test_single_draw_compile_across_rounds(self, rng):
        """The fixed-capacity mixture-center accumulator means every
        importance-sampling round reuses ONE compiled draw program (a
        growing concatenate would retrace — and remote-compile — per
        round). Probe: _draw_round's jit cache grows by exactly one entry
        over a 4-iteration run, and stays put on a second run."""
        import gpd_tpu.cem as cem_mod

        pts, nrm = cylinder_cloud(rng)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(search_neighbors_cap=256, frame_neighbors_cap=32,
                             normals_neighbors_cap=32, shadow_voxel_cap=256,
                             min_inliers=0, num_selected=20)
        det = GraspDetector(cfg)
        cem = CEMConfig(num_init_samples=8, num_iterations=4,
                        num_samples_per_iteration=8, min_score=-1e9)
        sis = SequentialImportanceSampling(det, cem)
        # The single-device default is the fully fused program (one compile
        # for the entire run); the per-round property under test lives in
        # the Python loop path, still used by mesh mode.
        sis._force_loop = True
        cem_mod._draw_round.clear_cache()
        sis.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        assert cem_mod._draw_round._cache_size() == 1
        assert len(sis.last_round_counts) == 5
        sis.detect(cloud, key=jax.random.PRNGKey(1), verbose=False)
        assert cem_mod._draw_round._cache_size() == 1
        # And the fused path compiles exactly once across repeat runs.
        sis._force_loop = False
        cem_mod._cem_fused.clear_cache()
        sis.detect(cloud, key=jax.random.PRNGKey(2), verbose=False)
        assert cem_mod._cem_fused._cache_size() == 1
        sis.detect(cloud, key=jax.random.PRNGKey(3), verbose=False)
        assert cem_mod._cem_fused._cache_size() == 1

    def test_reference_cem_config_parses(self):
        cem = CEMConfig.from_file("/root/reference/cfg/cem_vino_params.cfg")
        assert cem.num_iterations >= 1
        assert 0.0 <= cem.prob_rand_samples <= 1.0

    def test_end_to_end_sharded_8dev(self, rng):
        """CEM over an 8-device mesh: every round's evaluation is
        candidate-parallel (detect_sharded_raw) and the mixture refit uses
        the gathered survivor set — the docstring contract of gpd_tpu.cem."""
        from gpd_tpu.parallel.sharded import default_mesh

        pts, nrm = cylinder_cloud(rng)
        cloud = CloudArrays.from_numpy(pts, normals=nrm)
        cfg = DetectorConfig(search_neighbors_cap=256, frame_neighbors_cap=32,
                             normals_neighbors_cap=32, shadow_voxel_cap=256,
                             min_inliers=0, num_selected=20)
        det = GraspDetector(cfg)
        cem = CEMConfig(num_init_samples=8, num_iterations=2,
                        num_samples_per_iteration=16, min_score=-1e9)
        mesh = default_mesh(8)
        assert mesh.shape["dp"] == 8
        sis = SequentialImportanceSampling(det, cem, mesh=mesh)
        out = sis.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
        n = int(np.asarray(out.valid).sum())
        assert n > 0
        # Survivors are real geometry: orthonormal rotations, near the cloud.
        R = np.asarray(out.orientation)[np.asarray(out.valid)]
        err = np.abs(R @ np.transpose(R, (0, 2, 1)) - np.eye(3)).max()
        assert err < 1e-3
        pos = np.asarray(out.position)[np.asarray(out.valid)]
        assert (np.linalg.norm(pos, axis=1) < 0.3).all()
