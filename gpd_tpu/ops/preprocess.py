"""Point-cloud preprocessing kernels.

TPU-native equivalents of the reference's ``util::Cloud`` preprocessing
(reference: src/gpd/util/cloud.cpp): all operations are fixed-shape and
mask-based — nothing changes array sizes on device; compaction (if desired)
is a host-side step.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from gpd_tpu.core.types import PAD_COORD, CloudArrays
from gpd_tpu.ops.neighbors import radius_neighbors


def remove_nans(cloud: CloudArrays) -> CloudArrays:
    """Mask out non-finite points (reference: cloud.cpp:154-164)."""
    ok = jnp.all(jnp.isfinite(cloud.points), axis=1) & cloud.mask
    return _apply_mask(cloud, ok)


def _apply_mask(cloud: CloudArrays, mask: jax.Array) -> CloudArrays:
    pts = jnp.where(mask[:, None], cloud.points, PAD_COORD)
    return CloudArrays(points=pts, normals=cloud.normals,
                       cam_source=cloud.cam_source, mask=mask,
                       view_points=cloud.view_points)


def in_workspace(points: jax.Array, workspace: Sequence[float]) -> jax.Array:
    """Strict-inequality axis-aligned box test (cloud.cpp:243-249)."""
    w = workspace
    return ((points[:, 0] > w[0]) & (points[:, 0] < w[1]) &
            (points[:, 1] > w[2]) & (points[:, 1] < w[3]) &
            (points[:, 2] > w[4]) & (points[:, 2] < w[5]))


def filter_workspace(cloud: CloudArrays, workspace: Sequence[float]) -> CloudArrays:
    """Axis-aligned workspace crop (reference: cloud.cpp:206-267)."""
    keep = cloud.mask & in_workspace(cloud.points, workspace)
    return _apply_mask(cloud, keep)


@functools.partial(jax.jit, static_argnames=())
def _voxel_kernel(points, normals, cam_source, mask, cell_size):
    n = points.shape[0]
    # min over valid points (reference uses pcl::getMinMax3D, cloud.cpp:288-291)
    big = jnp.where(mask[:, None], points, jnp.inf)
    min_pt = jnp.min(big, axis=0)
    rel = (points - min_pt[None, :]) / cell_size
    bins = jnp.floor(rel).astype(jnp.int32)
    # Push invalid points to a sentinel cell that sorts last.
    SENT = jnp.int32(1 << 24)
    bins = jnp.where(mask[:, None], bins, SENT)

    idx0 = jnp.arange(n, dtype=jnp.int32)
    # Lexicographic (x, y, z, original-index) order: matches the reference's
    # std::set<Vector4i, first-3-coords comparator> iteration order
    # (cloud.cpp:292-333) with first-inserted point as cell representative.
    order = jnp.lexsort((idx0, bins[:, 2], bins[:, 1], bins[:, 0]))
    sb = bins[order]
    svalid = mask[order]
    new_cell = jnp.any(sb != jnp.roll(sb, 1, axis=0), axis=1)
    new_cell = new_cell.at[0].set(True)
    is_rep = new_cell & svalid

    seg = jnp.cumsum(new_cell) - 1                 # (n,) segment id in sorted order
    ones = svalid.astype(jnp.float32)
    counts = jax.ops.segment_sum(ones, seg, num_segments=n)
    nrm_sorted = normals[order] * ones[:, None]
    nrm_sum = jax.ops.segment_sum(nrm_sorted, seg, num_segments=n)

    # Per-representative outputs (scattered back to dense sorted slots).
    rep_pts = min_pt[None, :] + cell_size * sb.astype(jnp.float32)
    avg_nrm = nrm_sum[seg] / jnp.maximum(counts[seg], 1.0)[:, None]
    rep_cam = cam_source[order]

    out_pts = jnp.where(is_rep[:, None], rep_pts, PAD_COORD)
    out_nrm = jnp.where(is_rep[:, None], avg_nrm, 0.0)
    out_cam = jnp.where(is_rep, rep_cam, 0)
    return out_pts, out_nrm, out_cam, is_rep


def voxelize(cloud: CloudArrays, cell_size: float) -> CloudArrays:
    """Voxel downsample matching reference semantics (cloud.cpp:286-348):
    one representative per cell (first point in original order), output point
    snapped to the voxel corner, normals averaged over the cell, camera
    source taken from the representative, output in lexicographic cell order.
    """
    pts, nrm, cam, mask = _voxel_kernel(
        cloud.points, cloud.normals, cloud.cam_source, cloud.mask,
        jnp.float32(cell_size))
    return CloudArrays(points=pts, normals=nrm, cam_source=cam, mask=mask,
                       view_points=cloud.view_points)


@functools.partial(jax.jit, static_argnames=("mean_k", "block"))
def _outlier_kernel(points, mask, mean_k: int, stddev_mult,
                    block: int = 1024):
    # Mean distance to the mean_k nearest neighbors (excluding self),
    # gather-free: the blocked distance matmul's top_k VALUES are the
    # neighbor distances directly — no (N, k, 3) index gather / renorm
    # (gathers are lane-bound; at the 65k serve buckets the old gather
    # path dominated). exact top_k keeps the outlier set identical across
    # backends (one-time preprocessing cost).
    n = points.shape[0]
    p2 = jnp.sum(points * points, axis=1)

    def one_block(bq, bm):
        q2 = jnp.sum(bq * bq, axis=1)
        cross = jnp.matmul(bq, points.T,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = q2[:, None] + p2[None, :] - 2.0 * cross
        d2 = jnp.where(mask[None, :] & bm[:, None], d2, jnp.float32(1e12))
        neg, _ = jax.lax.top_k(-d2, mean_k + 1)
        d2k = -neg                                 # ascending; [0] = self
        v_k = d2k[:, 1:] < 1e11
        d_k = jnp.sqrt(jnp.maximum(d2k[:, 1:], 0.0))
        return jnp.sum(jnp.where(v_k, d_k, 0.0), axis=1) / \
            jnp.maximum(jnp.sum(v_k, axis=1), 1)

    if n <= block:
        mean_d = one_block(points, mask)
    else:
        nblk = -(-n // block)
        pad = nblk * block - n
        qp = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e6)
        qm = jnp.pad(mask, (0, pad))

        def body(carry, blk):
            return carry, one_block(*blk)

        _, md = jax.lax.scan(body, None, (qp.reshape(nblk, block, 3),
                                          qm.reshape(nblk, block)))
        mean_d = md.reshape(-1)[:n]

    mvalid = mask
    mu = jnp.sum(jnp.where(mvalid, mean_d, 0.0)) / jnp.maximum(jnp.sum(mvalid), 1)
    var = jnp.sum(jnp.where(mvalid, (mean_d - mu) ** 2, 0.0)) / \
        jnp.maximum(jnp.sum(mvalid), 1)
    thresh = mu + stddev_mult * jnp.sqrt(var)
    return mask & (mean_d <= thresh)


def remove_statistical_outliers(cloud: CloudArrays, mean_k: int = 50,
                                stddev_mult: float = 1.0) -> CloudArrays:
    """PCL StatisticalOutlierRemoval semantics (cloud.cpp:166-174):
    drop points whose mean distance to their mean_k nearest neighbors exceeds
    global mean + stddev_mult * stddev."""
    keep = _outlier_kernel(cloud.points, cloud.mask, mean_k,
                           jnp.float32(stddev_mult))
    return _apply_mask(cloud, keep)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def fit_plane_ransac(points: jax.Array, mask: jax.Array, key: jax.Array,
                     dist_thresh: float = 0.01, num_iters: int = 128):
    """RANSAC plane fit (reference uses pcl::SACSegmentation,
    cloud.cpp:407-435 & image_generator.cpp:101-129).

    Returns (inlier_mask, plane[4]) for the best plane n.x + d = 0.
    All candidate planes are evaluated in one batched pass.
    """
    n = points.shape[0]
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    trip = jax.random.choice(key, n, shape=(num_iters, 3), p=probs)
    p0, p1, p2 = (points[trip[:, i]] for i in range(3))
    nvec = jnp.cross(p1 - p0, p2 - p0)
    nlen = jnp.linalg.norm(nvec, axis=1, keepdims=True)
    nvec = nvec / jnp.maximum(nlen, 1e-12)
    d = -jnp.sum(nvec * p0, axis=1)
    # (num_iters, n) distances
    dist = jnp.abs(jnp.matmul(points, nvec.T,
                          precision=jax.lax.Precision.HIGHEST)
               + d[None, :]).T
    inl = (dist <= dist_thresh) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    degenerate = nlen[:, 0] < 1e-9
    scores = jnp.where(degenerate, -1, scores)
    best = jnp.argmax(scores)
    plane = jnp.concatenate([nvec[best], d[best][None]])
    return inl[best], plane


def sample_above_plane(cloud: CloudArrays, key: jax.Array,
                       dist_thresh: float = 0.01) -> jax.Array:
    """Mask of points NOT on the dominant plane (cloud.cpp:407-435)."""
    inliers, _ = fit_plane_ransac(cloud.points, cloud.mask, key, dist_thresh)
    above = cloud.mask & ~inliers
    # Reference falls back to the whole cloud if the fit leaves nothing.
    return jnp.where(jnp.any(above), above, cloud.mask)


def subsample_uniform(key: jax.Array, candidate_mask: jax.Array,
                      num_samples: int) -> Tuple[jax.Array, jax.Array]:
    """Draw ``num_samples`` indices uniformly WITHOUT replacement from the
    masked set; returns (indices, valid_mask).

    Deliberate divergence from the reference (cloud.cpp:350-405: rand()%n is
    with replacement and can draw duplicates): duplicates only repeat the
    identical hand search, so distinct draws dominate. When the pool is
    smaller than ``num_samples``, every pool member is drawn exactly once
    and the remaining slots come back with ``valid_mask=False`` (Gumbel
    top-k puts the zero-probability entries last; the count guard masks
    them)."""
    n = candidate_mask.shape[0]
    probs = candidate_mask.astype(jnp.float32)
    total = jnp.sum(probs)
    probs = probs / jnp.maximum(total, 1.0)
    idx = jax.random.choice(key, n, shape=(num_samples,), replace=False, p=probs)
    valid = candidate_mask[idx] & (jnp.arange(num_samples) < total)
    return idx.astype(jnp.int32), valid
