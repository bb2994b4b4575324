"""Surface-normal estimation.

TPU-native equivalent of the reference's per-view-point PCL
``NormalEstimationOMP`` (reference: src/gpd/util/cloud.cpp:497-535) plus the
``reverseNormals`` pass (cloud.cpp:573-604): one batched kernel — neighbor
search via MXU distance matmul, covariance accumulation, closed-form 3x3
eigendecomposition, viewpoint orientation — instead of kd-tree queries in
OpenMP threads.

Semantics notes:
  - PCL computes each point's covariance over ALL cloud points within
    ``radius`` (the per-camera index list only selects which points get
    normals, not the search set); here every masked point gets a normal in
    one pass.
  - Viewpoint orientation uses the highest-index camera seeing the point
    (the reference's per-camera loop overwrites, so the last camera wins).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpd_tpu.core.types import CloudArrays
from gpd_tpu.ops.eigh3 import eigh3_sym
from gpd_tpu.ops.neighbors import radius_moments, radius_neighbors


@functools.partial(jax.jit, static_argnames=("k",))
def _normals_kernel(points, mask, cam_source, view_points, radius, k: int):
    # Neighborhood covariances as masked moment matmuls (ops/neighbors.py
    # radius_moments): exact and UNCAPPED over all in-radius points — the
    # reference's kd-tree radiusSearch semantics (cloud.cpp:497-535) — with
    # no per-neighbor gather and no nearest-K truncation (``k`` unused).
    # Points are centered on the cloud centroid first: the raw-moment
    # identity cov = E[pp^T] - mu mu^T cancels catastrophically in f32 when
    # |p| >> neighborhood radius, and centering bounds |p| by the cloud
    # extent.
    del k
    w_all = mask.astype(points.dtype)
    centroid = jnp.sum(points * w_all[:, None], axis=0) / \
        jnp.maximum(jnp.sum(w_all), 1.0)
    p = jnp.where(mask[:, None], points - centroid[None, :], 1.0e6)
    feats = jnp.stack([
        p[:, 0] * p[:, 0], p[:, 1] * p[:, 1], p[:, 2] * p[:, 2],
        p[:, 0] * p[:, 1], p[:, 0] * p[:, 2], p[:, 1] * p[:, 2],
        p[:, 0], p[:, 1], p[:, 2],
    ], axis=1)                                          # (N, 9)
    sums, counts = radius_moments(p, mask, p, mask, feats, radius)
    cnt = jnp.maximum(counts, 1.0)
    mean = sums[:, 6:9] / cnt[:, None]                  # (N, 3)
    xx, yy, zz, xy, xz, yz = (sums[:, i] / cnt for i in range(6))
    m2 = jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)                                         # (N, 3, 3)
    cov = m2 - mean[:, :, None] * mean[:, None, :]
    _, V = eigh3_sym(cov)
    normal = V[..., :, 0]                               # smallest eigenvalue

    # Orient toward the viewpoint of the highest-index camera seeing the
    # point (flipNormalTowardsViewpoint; overwrite order cloud.cpp:511-534).
    ncams = view_points.shape[0]
    cam_ids = jnp.arange(ncams, dtype=jnp.uint32)
    seen = (cam_source[:, None] >> cam_ids[None, :]) & 1  # (N, V)
    last_cam = jnp.where(
        jnp.any(seen > 0, axis=1),
        (ncams - 1) - jnp.argmax(jnp.flip(seen, axis=1) > 0, axis=1),
        0)
    vp = view_points[last_cam]                          # (N, 3)
    to_vp = vp - points
    flip = jnp.sum(normal * to_vp, axis=1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)

    has_nbr = counts > 0
    normal = jnp.where((mask & has_nbr)[:, None], normal, 0.0)
    return normal


def estimate_normals(cloud: CloudArrays, radius: float, k: int = 128) -> CloudArrays:
    """Estimate + orient normals for every masked point."""
    normals = _normals_kernel(cloud.points, cloud.mask, cloud.cam_source,
                              cloud.view_points, jnp.float32(radius), k)
    return CloudArrays(points=cloud.points, normals=normals,
                       cam_source=cloud.cam_source, mask=cloud.mask,
                       view_points=cloud.view_points)


@jax.jit
def reverse_normals(points, normals, mask, cam_source, view_points):
    """Flip normals that point away from every camera that sees them
    (reference: cloud.cpp:573-604)."""
    ncams = view_points.shape[0]
    cam_ids = jnp.arange(ncams, dtype=jnp.uint32)
    seen = ((cam_source[:, None] >> cam_ids[None, :]) & 1) > 0  # (N, V)
    cam_to_pt = points[:, None, :] - view_points[None, :, :]    # (N, V, 3)
    toward = jnp.sum(normals[:, None, :] * cam_to_pt, axis=-1) < 0.0
    ok = jnp.any(seen & toward, axis=1)
    needs_reverse = mask & ~ok
    return jnp.where(needs_reverse[:, None], -normals, normals)


def reverse_normals_cloud(cloud: CloudArrays) -> CloudArrays:
    normals = reverse_normals(cloud.points, cloud.normals, cloud.mask,
                              cloud.cam_source, cloud.view_points)
    return CloudArrays(points=cloud.points, normals=normals,
                       cam_source=cloud.cam_source, mask=cloud.mask,
                       view_points=cloud.view_points)


@functools.partial(jax.jit, static_argnames=("k", "max_iterations"))
def refine_normals(points, normals, mask, k: int = 10,
                   max_iterations: int = 15,
                   convergence_rms: float = 1e-4):
    """pcl::NormalRefinement semantics (reference: cloud.cpp:176-204 calls
    it with k-NN indices and default parameters): ITERATIVE smoothing — per
    iteration every normal becomes the normalized uniform-weight average of
    its k nearest neighbors' previous-iteration normals (PCL's
    assignNormalWeights is uniform; no sign alignment — the reference runs
    this after viewpoint orientation, so signs are already consistent) —
    for up to ``max_iterations`` (PCL default 15) or until the RMS normal
    change drops below ``convergence_rms``. Neighbor sets are fixed across
    iterations (PCL precomputes them once, cloud.cpp:178-183)."""
    # exact=True: refinement is a one-time preprocessing pass; identical
    # neighbor sets across backends. nearestKSearch includes the query
    # point itself (d=0), as does this.
    idx, valid = radius_neighbors(points, mask, points, mask, radius=1e5,
                                  k=k, exact=True)
    vmaskf = valid[..., None].astype(normals.dtype)
    n_pts = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)

    def body(state):
        it, cur, _ = state
        avg = jnp.sum(cur[idx] * vmaskf, axis=1)
        nrm = jnp.linalg.norm(avg, axis=1, keepdims=True)
        new = jnp.where(nrm > 0.0, avg / jnp.maximum(nrm, 1e-20), cur)
        new = jnp.where(mask[:, None], new, cur)
        diff = new - cur
        rms = jnp.sqrt(jnp.sum(diff * diff) / n_pts)
        return it + 1, new, rms

    def cond(state):
        it, _, rms = state
        return (it < max_iterations) & (rms >= convergence_rms)

    _, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), normals, jnp.float32(jnp.inf)))
    return out
