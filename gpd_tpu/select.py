"""Grasp filtering, selection, and clustering.

Mask-based equivalents of the reference's detector-side filters
(reference: src/gpd/grasp_detector.cpp:334-456 filterGraspsWorkspace /
filterGraspsDirection / selectGrasps) and grasp clustering
(src/gpd/clustering.cpp:5-105) — all O(G) / O(G^2) tensor ops, no loops.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from gpd_tpu.config import DetectorConfig
from gpd_tpu.core.types import Grasps


def filter_grasps_workspace(grasps: Grasps, workspace: Sequence[float],
                            min_aperture: float, max_aperture: float,
                            hand_outer_diameter: float,
                            hand_depth: float) -> Grasps:
    """Aperture + 5-keypoint workspace filter (grasp_detector.cpp:334-398).

    Keypoint set replicates the reference exactly, including its
    right_top = left_bottom + depth*approach quirk (grasp_detector.cpp:362-363
    assigns left_bottom to both *_top expressions), so filter outcomes match.
    """
    pos = grasps.position
    binormal = grasps.binormal
    approach = grasps.approach
    half_w = 0.5 * hand_outer_diameter
    left_bottom = pos + half_w * binormal
    right_bottom = pos - half_w * binormal
    left_top = left_bottom + hand_depth * approach
    right_top = left_bottom + hand_depth * approach   # reference quirk
    appr = pos - 0.05 * approach
    pts = jnp.stack([left_bottom, right_bottom, left_top, right_top, appr],
                    axis=1)                                        # (G, 5, 3)
    w = workspace
    lo = jnp.asarray([w[0], w[2], w[4]], jnp.float32)
    hi = jnp.asarray([w[1], w[3], w[5]], jnp.float32)
    inside = jnp.all((jnp.min(pts, axis=1) >= lo) &
                     (jnp.max(pts, axis=1) <= hi), axis=-1)
    aperture_ok = (grasps.width >= min_aperture) & (grasps.width <= max_aperture)
    valid = grasps.valid & inside & aperture_ok
    return dataclasses.replace(grasps, valid=valid)


def filter_grasps_direction(grasps: Grasps, direction: Sequence[float],
                            thresh_rad: float) -> Grasps:
    """Approach-direction filter (grasp_detector.cpp:422-456)."""
    d = jnp.asarray(direction, jnp.float32)
    d = d / jnp.maximum(jnp.linalg.norm(d), 1e-12)
    cosang = jnp.clip(grasps.approach @ d, -1.0, 1.0)
    angle = jnp.arccos(cosang)
    valid = grasps.valid & (angle <= thresh_rad)
    return dataclasses.replace(grasps, valid=valid)


def select_top_k(grasps: Grasps, k: int, out_cap: int = 0
                 ) -> Tuple[Grasps, jax.Array]:
    """Top-k by score among valid grasps (grasp_detector.cpp:405-420).
    Returns (grasps reordered score-descending with only top-k valid,
    the full permutation). ``out_cap`` > 0 truncates the RETURNED batch to
    its leading out_cap rows (>= k): the downstream consumer only ever
    looks at the selected heads, and gathering the whole candidate-capacity
    pytree just to reorder it dominated the selection stage."""
    scores = jnp.where(grasps.valid, grasps.score, -jnp.inf)
    order = jnp.argsort(-scores, stable=True)
    cap = grasps.capacity if out_cap <= 0 else min(out_cap, grasps.capacity)
    g = grasps.take(order[:cap])
    keep = jnp.arange(cap) < k
    return dataclasses.replace(g, valid=g.valid & keep), order


@functools.partial(jax.jit, static_argnames=("min_inliers", "remove_inliers"))
def _cluster_kernel(pos, axis, score, valid, min_inliers: int,
                    remove_inliers: bool):
    G = pos.shape[0]
    cos_thresh = jnp.float32(math.cos(12.0 * math.pi / 180.0))
    MAX_DIST = 0.05
    PROJ_DIST = 0.005

    aligned = jnp.abs(jnp.einsum("id,jd->ij", axis, axis, precision=jax.lax.Precision.HIGHEST)) > cos_thresh
    delta = pos[:, None, :] - pos[None, :, :]                 # (G, G, 3)
    dist_ok = jnp.linalg.norm(delta, axis=-1) <= MAX_DIST
    proj = delta - axis[:, None, :] * \
        jnp.einsum("id,ijd->ij", axis, delta, precision=jax.lax.Precision.HIGHEST)[..., None]
    proj_ok = jnp.linalg.norm(proj, axis=-1) <= PROJ_DIST
    pair = aligned & dist_ok & proj_ok & valid[:, None] & valid[None, :]
    pair = pair & ~jnp.eye(G, dtype=bool)

    if not remove_inliers:
        n = jnp.sum(pair, axis=1)
        nf = jnp.maximum(n, 1).astype(jnp.float32)
        mean_pos = jnp.einsum("ij,jd->id", pair.astype(jnp.float32), pos) / nf[:, None]
        mean_s = pair @ score / nf
        # Centered (two-pass) variance: the raw-moment form
        # E[s^2] - E[s]^2 cancels catastrophically in f32 for tight
        # clusters (a 1-inlier cluster's std must be exactly 0, and the
        # conf bound = its score — clustering.cpp:80-101 semantics).
        d = score[None, :] - mean_s[:, None]                  # (G, G)
        var = jnp.sum(jnp.where(pair, d * d, 0.0), axis=1) / nf
        std = jnp.sqrt(jnp.maximum(var, 0.0))
        conf_lb = mean_s - 2.576 * std / jnp.sqrt(nf)
        ok = valid & (n >= min_inliers)
        return ok, mean_pos, conf_lb, n
    else:
        # Greedy pass in hand order (clustering.cpp remove_inliers=true):
        # inliers of earlier clusters are unavailable to later ones.
        def body(i, carry):
            used, ok, mp, cl, cnt = carry
            inl = pair[i] & ~used
            n = jnp.sum(inl)
            nf = jnp.maximum(n, 1).astype(jnp.float32)
            w = inl.astype(jnp.float32)
            mean_pos = (w @ pos) / nf
            mean_s = w @ score / nf
            # Centered variance (see the non-greedy branch).
            ds = score - mean_s
            var = w @ (ds * ds) / nf
            std = jnp.sqrt(jnp.maximum(var, 0.0))
            conf = mean_s - 2.576 * std / jnp.sqrt(nf)
            accept = valid[i] & (n >= min_inliers)
            used = jnp.where(accept, used | inl, used)
            ok = ok.at[i].set(accept)
            mp = mp.at[i].set(jnp.where(accept, mean_pos, pos[i]))
            cl = cl.at[i].set(jnp.where(accept, conf, score[i]))
            cnt = cnt.at[i].set(n)
            return used, ok, mp, cl, cnt

        init = (jnp.zeros(G, bool), jnp.zeros(G, bool),
                jnp.zeros_like(pos), jnp.zeros_like(score),
                jnp.zeros(G, jnp.int32))
        _, ok, mp, cl, cnt = jax.lax.fori_loop(0, G, body, init)
        return ok, mp, cl, cnt


def cluster_grasps(grasps: Grasps, min_inliers: int,
                   remove_inliers: bool = False) -> Grasps:
    """Grasp NMS/aggregation (clustering.cpp:5-105): a cluster center keeps
    hand i's orientation, takes the mean inlier position, and scores by the
    99%-confidence lower bound mean - 2.576 sigma / sqrt(n)."""
    ok, mean_pos, conf_lb, _ = _cluster_kernel(
        grasps.position, grasps.axis, grasps.score, grasps.valid,
        min_inliers, remove_inliers)
    return dataclasses.replace(
        grasps,
        position=jnp.where(ok[:, None], mean_pos, grasps.position),
        score=jnp.where(ok, conf_lb, grasps.score),
        valid=ok)


def sort_by_score(grasps: Grasps) -> Grasps:
    """Final score-descending ordering (grasp_detector.cpp:305)."""
    scores = jnp.where(grasps.valid, grasps.score, -jnp.inf)
    order = jnp.argsort(-scores, stable=True)
    return grasps.take(order)
