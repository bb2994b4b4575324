"""Sequential importance sampling (CEM) outer loop.

TPU-native equivalent of the reference's
``SequentialImportanceSampling::detectGrasps``
(reference: src/gpd/sequential_importance_sampling.cpp:54-270): each
iteration runs the candidates-only kernel at freshly drawn samples (the
reference's loop does no classification, .cpp:112-157); the Gaussian
mixture refit uses the accumulated surviving hand-set samples; descriptors
+ CNN run once at the end over all accumulated candidates
(pruneGraspCandidates, grasp_detector.cpp:529-552). Sampling uses explicit
jax.random keys instead of the reference's unseeded rand()/mt19937.

Multi-device: pass a ``jax.sharding.Mesh`` (``mesh=``) and every round's
candidate evaluation shards the sample axis across it via
``gpd_tpu.parallel.sharded.candidates_sharded_raw``; the surviving grasp
batch (and with it the mixture centers for the refit) is all-gathered when
the sharded output is consumed — the "psum of sufficient statistics" step
of SURVEY.md §5. Single-device when ``mesh`` is None.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpd_tpu.config import CEMConfig, DetectorConfig
from gpd_tpu.core.types import CloudArrays, Grasps
from gpd_tpu.detector import (GraspDetector, candidates_stage,
                              score_candidates, select_and_cluster)
from gpd_tpu.ops import preprocess as pp

SUM_OF_GAUSSIANS = 0
MAX_OF_GAUSSIANS = 1


@functools.partial(jax.jit, static_argnames=("method", "n_gauss", "n_rand",
                                             "workspace"))
def _draw_round(key, centers, cmask, points, pmask, sigma, workspace,
                method: int, n_gauss: int, n_rand: int):
    """One round's sample draws as a single device program (each eager op
    is a dispatch round trip on remote backends): (1-p)*N Gaussian-mixture
    draws + p*N uniform cloud draws (.cpp:112-157)."""
    kg, ku = jax.random.split(key)
    if method == MAX_OF_GAUSSIANS:
        gs = draw_max_of_gaussians(kg, centers, cmask, sigma, n_gauss)
    else:
        gs = draw_sum_of_gaussians(kg, centers, cmask, sigma, n_gauss)
    us = draw_uniform_cloud_samples(ku, points, pmask, workspace, n_rand)
    return jnp.concatenate([gs, us])


@jax.jit
def _accum_centers(buf, buf_mask, sample, valid, ofs):
    """Write one round's candidate samples into the fixed-capacity mixture-
    center accumulator at offset ``ofs``. Fixed shapes mean every
    importance-sampling round shares ONE compiled draw kernel (a growing
    concatenate would retrace — and remote-compile — per round)."""
    buf = jax.lax.dynamic_update_slice(buf, sample, (ofs, 0))
    buf_mask = jax.lax.dynamic_update_slice(buf_mask, valid, (ofs,))
    return buf, buf_mask


def draw_sum_of_gaussians(key, centers, center_mask, sigma, n):
    """drawSamplesFromSumOfGaussians (sequential_importance_sampling.cpp:
    189-201): pick a random mixture center, add N(0, sigma^2) I noise."""
    k1, k2 = jax.random.split(key)
    probs = center_mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(k1, centers.shape[0], shape=(n,), p=probs)
    noise = jax.random.normal(k2, (n, 3)) * sigma
    return centers[idx] + noise


def draw_max_of_gaussians(key, centers, center_mask, sigma, n, oversample=4):
    """drawSamplesFromMaxOfGaussians (.cpp:203-237): rejection sampling —
    accept a draw from center j if its density under center j is >= the max
    density over all centers (the reference's exp(-d^2/(2 sigma)) densities
    share the normalizer, so accept iff no other center is closer).

    The reference loops until n draws are accepted; this is a fixed-size
    batched pass drawing ``oversample``*n proposals. When fewer than n are
    accepted, the remaining slots RESAMPLE the accepted set with
    replacement — each fill is then itself a draw from the target
    (accepted) distribution, so the output matches the reference's
    loop-until-accepted distribution for any acceptance rate (validated
    statistically in tests/test_cem.py); the earlier rejected-draw fill
    biased the output exactly when acceptance was low."""
    k1, k2, k3 = jax.random.split(key, 3)
    m = n * oversample
    probs = center_mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(k1, centers.shape[0], shape=(m,), p=probs)
    x = centers[idx] + jax.random.normal(k2, (m, 3)) * sigma
    d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(center_mask[None, :], d2, jnp.inf)
    # densities share the normalizer; compare squared distances directly
    # (min distance <=> max density).
    d2_own = jnp.sum((x - centers[idx]) ** 2, axis=-1)
    accept = d2_own <= jnp.min(d2, axis=1) + 1e-12
    # Accepted draws first; fill any shortfall by resampling the accepted
    # prefix with replacement (degenerates to rejected draws only if
    # NOTHING was accepted, which cannot happen for centers with any
    # isolated member and is vanishingly rare otherwise).
    order = jnp.argsort(~accept, stable=True)
    n_acc = jnp.sum(accept)
    fill = jax.random.randint(k3, (n,), 0, jnp.maximum(n_acc, 1))
    take = jnp.where(jnp.arange(n) < n_acc, order[:n], order[fill])
    return x[take]


def draw_uniform_cloud_samples(key, points, pool_mask, workspace, n):
    """drawUniformSamples (.cpp:239-270): uniform over cloud points inside
    the workspace."""
    # Reference uses >=/<= bounds here (unlike the strict preprocess filter).
    w = workspace
    inside = pool_mask & \
        (points[:, 0] >= w[0]) & (points[:, 0] <= w[1]) & \
        (points[:, 1] >= w[2]) & (points[:, 1] <= w[3]) & \
        (points[:, 2] >= w[4]) & (points[:, 2] <= w[5])
    probs = inside.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.choice(key, points.shape[0], shape=(n,), p=probs)
    return points[idx]


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_init", "n_iter", "n_gauss", "n_rand", "method", "image_cap"))
def _cem_fused(cloud, params, key, cfg: DetectorConfig, n_init: int,
               n_iter: int, n_gauss: int, n_rand: int, method: int,
               image_cap: int, sigma, min_score):
    """The whole single-device CEM run as ONE device program: round 0,
    a lax.scan over the importance-sampling rounds (draw -> candidates ->
    accumulate mixture centers at a carried offset), the per-round scoring
    (lax.map), the score prune, and selection/clustering.

    The Python round loop cost ~14 sequential dispatch round trips on the
    remote backend (5-10 ms each — half the CEM total, and the source of
    its ~20% session-to-session variance); this runs in ~3. The key-split
    sequence replicates the unfused loop exactly, so results are
    bit-identical to the Python-loop path (gated by test_cem)."""
    M = cfg.num_orientations * len(cfg.hand_axes)
    per = n_gauss + n_rand
    cap0 = n_init * M
    capr = per * M

    # Round 0: uniform init samples (.cpp:71-78).
    k0, key = jax.random.split(key)
    idx, valid0 = pp.subsample_uniform(k0, cloud.mask, n_init)
    spos0 = jnp.where(valid0[:, None], cloud.points[idx], 1e6)
    kk, key = jax.random.split(key)
    g0 = candidates_stage(cloud, spos0, valid0, cfg)
    centers = jnp.zeros((cap0 + n_iter * capr, 3), jnp.float32)
    cmask = jnp.zeros(cap0 + n_iter * capr, bool)
    centers, cmask = _accum_centers(centers, cmask, g0.sample, g0.valid,
                                    jnp.int32(0))

    def round_body(carry, t):
        centers, cmask, key = carry
        kg, kd, key = jax.random.split(key, 3)
        spos = _draw_round(kg, centers, cmask, cloud.points, cloud.mask,
                           sigma, tuple(cfg.workspace), method, n_gauss,
                           n_rand)
        smask = jnp.ones(per, bool)
        g = candidates_stage(cloud, spos, smask, cfg)
        centers, cmask = _accum_centers(centers, cmask, g.sample, g.valid,
                                        cap0 + t * capr)
        return (centers, cmask, key), (g, spos, kd, jnp.sum(g.valid))

    (_, _, _), (gs, sposs, kds, counts) = jax.lax.scan(
        round_body, (centers, cmask, key), jnp.arange(n_iter))

    # Classify once over all accumulated candidates
    # (pruneGraspCandidates, grasp_detector.cpp:529-552); each round
    # scores with its own sample context (neighborhoods are per-sample).
    sg0, _ = score_candidates(cloud, g0, spos0, valid0, params, kk, cfg,
                              image_cap, scores_only=True, canonical=True)

    def score_one(args):
        g, spos, kd = args
        sg, _ = score_candidates(cloud, g, spos, jnp.ones(per, bool),
                                 params, kd, cfg, image_cap,
                                 scores_only=True, canonical=True)
        return sg

    sgs = jax.lax.map(score_one, (gs, sposs, kds))
    merged = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate(
            [a, b.reshape((n_iter * b.shape[1],) + b.shape[2:])]), sg0, sgs)
    merged = dataclasses.replace(
        merged, valid=merged.valid & (merged.score > min_score))
    out = select_and_cluster(merged, cfg)
    round_counts = jnp.concatenate([jnp.sum(g0.valid)[None], counts])
    return out, round_counts


class SequentialImportanceSampling:
    """CEM grasp detector (reference: include/gpd/
    sequential_importance_sampling.h)."""

    def __init__(self, detector: GraspDetector, cem: CEMConfig,
                 mesh=None, mesh_axis: str = "dp"):
        self.detector = detector
        self.cem = cem
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # Stats of the last detect() call (the reference prints these,
        # sequential_importance_sampling.cpp:105-186; bench.py records them).
        self.last_round_counts = []
        self.last_num_grasps = 0
        self.last_runtime_s = 0.0
        # Test hook: force the Python round loop even without a mesh (the
        # fused-vs-loop equivalence test uses it).
        self._force_loop = False

    def detect(self, cloud: CloudArrays, key: Optional[jax.Array] = None,
               verbose: bool = True) -> Grasps:
        cfg = self.detector.effective_config(cloud)
        cem = self.cem
        key = key if key is not None else jax.random.PRNGKey(0)
        t0 = time.time()

        n_rand = int(cem.prob_rand_samples * cem.num_samples_per_iteration)
        n_gauss = cem.num_samples_per_iteration - n_rand
        sigma = cem.standard_deviation

        if self.mesh is None and not self._force_loop:
            # Single-device: the whole run is one fused program (same key
            # sequence as the loop below -> identical results, ~3 dispatch
            # round trips instead of ~14).
            out, counts = _cem_fused(
                cloud, self.detector.params, key, cfg,
                cem.num_init_samples, cem.num_iterations, n_gauss, n_rand,
                cem.sampling_method,
                self.detector.image_cap(cem.num_samples_per_iteration),
                jnp.float32(sigma), jnp.float32(cem.min_score))
            counts = [int(c) for c in np.asarray(counts)]
            n_final = int(np.asarray(out.valid).sum())
            self.last_round_counts = counts
            self.last_num_grasps = n_final
            self.last_runtime_s = time.time() - t0
            if verbose:
                print(f"Initially detected grasp candidates: {counts[0]}")
                for it, c in enumerate(counts[1:]):
                    print(f"Added {c} grasp candidates in round {it}.")
                print(f"Final result: found {n_final} grasps.")
                print(f"Total runtime: {self.last_runtime_s:.4f}s")
            return out

        # 1. Initial hypotheses at uniform samples (.cpp:71-78).
        k0, key = jax.random.split(key)
        idx, valid = pp.subsample_uniform(k0, cloud.mask, cem.num_init_samples)
        sample_pos = jnp.where(valid[:, None], cloud.points[idx], 1e6)
        cap = self.detector.image_cap(cem.num_samples_per_iteration)

        mesh = self.mesh
        n_dev = mesh.shape[self.mesh_axis] if mesh is not None else 1
        sharded = None
        params = self.detector.params
        if mesh is not None:
            from gpd_tpu.parallel import sharded
            cloud = sharded.replicate(mesh, cloud)
            params = sharded.replicate(mesh, params)
            cap = self.detector.image_cap(
                -(-cem.num_samples_per_iteration // n_dev))

        # Each round stores (candidates, sample_pos, sample_mask, key) so
        # classification can run once at the end; per-round counts stay on
        # device (no host sync inside the loop). Mixture centers accumulate
        # into a FIXED-capacity buffer (one compiled draw kernel for all
        # rounds; a growing concatenate would retrace per round).
        rounds = []
        round_counts = []
        M = cfg.num_orientations * len(cfg.hand_axes)

        def rcap(s):
            # shard_samples pads the sample axis to a multiple of the mesh.
            s_pad = s + ((-s) % n_dev) if n_dev > 1 else s
            return s_pad * M

        round_caps = [rcap(cem.num_init_samples)] + \
            [rcap(cem.num_samples_per_iteration)] * cem.num_iterations
        centers = jnp.zeros((sum(round_caps), 3), jnp.float32)
        cmask = jnp.zeros(sum(round_caps), bool)
        ofs = 0

        def run_round(spos, smask, k):
            """Candidates-only evaluation (the reference's per-iteration
            work: generateGraspCandidates + filters, no CNN)."""
            nonlocal centers, cmask, ofs
            if mesh is not None:
                spos, smask = sharded.shard_samples(mesh, spos, smask,
                                                    self.mesh_axis)
                g = sharded.candidates_sharded_raw(cloud, spos, smask, cfg,
                                                   mesh, self.mesh_axis)
            else:
                g = candidates_stage(cloud, spos, smask, cfg)
            rounds.append((g, spos, smask, k))
            assert ofs + g.valid.shape[0] <= cmask.shape[0], \
                "mixture-center buffer under-sized for round capacities"
            centers, cmask = _accum_centers(centers, cmask, g.sample,
                                            g.valid, jnp.int32(ofs))
            ofs += g.valid.shape[0]
            round_counts.append(jnp.sum(g.valid))
            return g

        kk, key = jax.random.split(key)
        run_round(sample_pos, valid, kk)

        # 2. Importance-sampling rounds (.cpp:112-157): candidates only.
        # Fixed-capacity centers/cmask -> every round reuses ONE compiled
        # draw program.
        for it in range(cem.num_iterations):
            kg, kd, key = jax.random.split(key, 3)
            spos = _draw_round(kg, centers, cmask, cloud.points, cloud.mask,
                               jnp.float32(sigma), tuple(cfg.workspace),
                               cem.sampling_method, n_gauss, n_rand)
            smask = jnp.ones(spos.shape[0], bool)
            run_round(spos, smask, kd)

        # 3. Classify once over all accumulated candidates, then prune by
        # score (pruneGraspCandidates, grasp_detector.cpp:529-552). Each
        # round scores with its own sample context (neighborhoods/shadows
        # are per-sample).
        scored = []
        for g, spos, smask, k in rounds:
            if mesh is not None:
                sg = sharded.score_sharded_raw(cloud, g, spos, smask, params,
                                               k, cfg, cap, mesh,
                                               self.mesh_axis)
            else:
                sg, _ = score_candidates(cloud, g, spos, smask, params, k,
                                         cfg, cap, scores_only=True,
                                         canonical=True)
            scored.append(sg)
        merged = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *scored)
        merged = dataclasses.replace(
            merged, valid=merged.valid & (merged.score > cem.min_score))

        # 4. Cluster + final ordering (.cpp:174-186).
        out = select_and_cluster(merged, cfg)
        # Count fetches happen after the whole pipeline is enqueued — they
        # never serialize the round loop's dispatch.
        counts = [int(np.asarray(c)) for c in round_counts]
        n_final = int(np.asarray(out.valid).sum())
        self.last_round_counts = counts
        self.last_num_grasps = n_final
        self.last_runtime_s = time.time() - t0
        if verbose:
            print(f"Initially detected grasp candidates: {counts[0]}")
            for it, c in enumerate(counts[1:]):
                print(f"Added {c} grasp candidates in round {it}.")
            print(f"Final result: found {n_final} grasps.")
            print(f"Total runtime: {self.last_runtime_s:.4f}s")
        return out
