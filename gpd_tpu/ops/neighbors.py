"""Fixed-radius neighbor search, TPU-native.

Replaces the reference's PCL kd-tree ``radiusSearch`` calls
(reference: src/gpd/candidate/hand_search.cpp:29-31,178;
src/gpd/candidate/frame_estimator.cpp:74; src/gpd/descriptor/
image_generator.cpp:37-64) with a dense design that maps onto the MXU:

    dist^2(q, p) = |q|^2 + |p|^2 - 2 q . p

The cross term is a (Q,3)x(3,N) matmul; per-query top-K then yields padded
neighbor indices sorted by distance ascending — the same ordering PCL's
radiusSearch returns — with a validity mask for entries beyond the radius
(or padding). Queries are processed in blocks to bound memory.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from gpd_tpu.core.types import PAD_COORD

_BIG = jnp.float32(1e12)

# Force every nearest-K selection to the exact path (used by
# tools/check_neighbors_tpu.py to compare the shipped approximate settings
# against fully-exact runs on the real chip). Flip the module global and
# call jax.clear_caches() — the flag is read at trace time, so cached
# programs must be dropped for it to take effect.
FORCE_EXACT = os.environ.get("GPD_TPU_EXACT_NEIGHBORS", "") == "1"


def _use_approx() -> bool:
    """Accelerator backends select nearest-K with approx_min_k (TPU
    PartialReduce: ~8x faster than lax.top_k at small k, exact at large
    k/n ratios where it degenerates to a full select). CPU keeps the exact
    lax.top_k so the NumPy-oracle parity tests stay bit-identical.

    The serving paths whose results feed geometry decisions directly
    (hand-search collision neighborhoods, reevaluateHypotheses labeling)
    pass ``exact=True`` instead — recall < 1 there can silently drop
    in-radius collision/contact points (the reference's kd-tree search is
    uncapped and exact, src/gpd/candidate/hand_search.cpp:29-31)."""
    return (not FORCE_EXACT) and jax.default_backend() not in ("cpu",)


def select_min_k(d2: jax.Array, k: int, exact: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    """Smallest-k of each row of ``d2``: (vals, idx), ascending.

    exact=False uses TPU approx_min_k (default recall 0.95) on accelerator
    backends; exact=True (or FORCE_EXACT) always returns the true nearest
    k via a full top_k sort."""
    if _use_approx() and not exact:
        return jax.lax.approx_min_k(d2, k)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def select_max_k(x: jax.Array, k: int, exact: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
    """Largest-k of each row of ``x``: (vals, idx), descending."""
    if _use_approx() and not exact:
        return jax.lax.approx_max_k(x, k)
    return jax.lax.top_k(x, k)


def radius_mask(query: jax.Array, query_mask: jax.Array, points: jax.Array,
                points_mask: jax.Array, radius) -> Tuple[jax.Array, jax.Array]:
    """(Q, N) in-radius membership mask + squared distances.

    The sort-free special case of radius_neighbors for callers that keep the
    whole cloud as every query's neighborhood (identity indexing): one MXU
    distance matmul, no top_k, no gather downstream.
    """
    p2 = jnp.sum(points * points, axis=1)
    q2 = jnp.sum(query * query, axis=1)
    cross = jnp.matmul(query, points.T, precision=jax.lax.Precision.HIGHEST)
    d2 = q2[:, None] + p2[None, :] - 2.0 * cross
    r2 = jnp.float32(radius) ** 2
    valid = (d2 <= r2) & points_mask[None, :] & query_mask[:, None]
    return valid, d2


def _block_topk(qpos, qmask, points, pmask, k: int, exact: bool = False):
    """One block: (B,3) queries vs (N,3) points -> (B,k) idx + dist2."""
    p2 = jnp.sum(points * points, axis=1)                      # (N,)
    q2 = jnp.sum(qpos * qpos, axis=1)                          # (B,)
    cross = jnp.matmul(qpos, points.T,
                       precision=jax.lax.Precision.HIGHEST)  # (B,N)
    d2 = q2[:, None] + p2[None, :] - 2.0 * cross
    d2 = jnp.where(pmask[None, :], d2, _BIG)
    d2 = jnp.where(qmask[:, None], d2, _BIG)
    d2k, idx = select_min_k(d2, k, exact=exact)                # ascending dist
    return idx.astype(jnp.int32), d2k


@functools.partial(jax.jit, static_argnames=("k", "block", "exact"))
def radius_neighbors(query: jax.Array, query_mask: jax.Array,
                     points: jax.Array, points_mask: jax.Array,
                     radius: float, k: int, block: int = 1024,
                     exact: bool = False,
                     ) -> Tuple[jax.Array, jax.Array]:
    """Padded radius search.

    Args:
      query: (Q, 3) query positions.
      query_mask: (Q,) bool.
      points: (N, 3) database points (padded slots at PAD_COORD).
      points_mask: (N,) bool.
      radius: search radius (inclusive, PCL semantics: d <= r).
      k: neighbor cap per query.
      block: query block size.
      exact: require the true nearest k on accelerator backends (geometry-
        critical callers: hand search, reevaluateHypotheses).

    Returns:
      (idx, valid): (Q, k) int32 neighbor indices sorted by distance
      ascending, and (Q, k) bool marking entries within radius.
    """
    q = query.shape[0]
    n = points.shape[0]
    k_eff = min(k, n)
    r2 = jnp.float32(radius) ** 2

    if k_eff == n:
        # Cap covers the whole cloud: no truncation, so the distance-ascending
        # ordering (only needed to decide WHICH neighbors survive the cap)
        # is irrelevant — skip the expensive per-row top_k sort entirely and
        # return identity indices with an in-radius mask.
        valid, _ = radius_mask(query, query_mask, points, points_mask, radius)
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (q, n))
        if k > n:
            idx = jnp.pad(idx, ((0, 0), (0, k - n)))
            valid = jnp.pad(valid, ((0, 0), (0, k - n)))
        return idx, valid

    if q <= block:
        # Single block: no padding to a full block width — small query
        # sets (CEM rounds, reevaluate blocks) would otherwise pay the
        # per-row top_k sort for every PAD row (a 64-query call padded to
        # 1024 rows cost ~13.5 ms on chip; unpadded it is ~1.5 ms).
        idx, d2 = _block_topk(query, query_mask, points, points_mask,
                              k_eff, exact=exact)
    else:
        nblk = -(-q // block)
        pad_q = nblk * block - q
        qpos = jnp.pad(query, ((0, pad_q), (0, 0)),
                       constant_values=PAD_COORD)
        qm = jnp.pad(query_mask, (0, pad_q))

        qpos = qpos.reshape(nblk, block, 3)
        qm = qm.reshape(nblk, block)

        def body(carry, blk):
            bq, bm = blk
            idx, d2 = _block_topk(bq, bm, points, points_mask, k_eff,
                                  exact=exact)
            return carry, (idx, d2)

        _, (idx, d2) = jax.lax.scan(body, None, (qpos, qm))
        idx = idx.reshape(nblk * block, k_eff)[:q]
        d2 = d2.reshape(nblk * block, k_eff)[:q]
    if k_eff < k:
        idx = jnp.pad(idx, ((0, 0), (0, k - k_eff)))
        d2 = jnp.pad(d2, ((0, 0), (0, k - k_eff)), constant_values=_BIG)
    valid = (d2 <= r2) & query_mask[:, None]
    return idx, valid


@functools.partial(jax.jit, static_argnames=("block",))
def radius_moments(query: jax.Array, query_mask: jax.Array,
                   points: jax.Array, points_mask: jax.Array,
                   feats: jax.Array, radius: float, block: int = 1024,
                   ) -> Tuple[jax.Array, jax.Array]:
    """Per-query sums of per-point features over ALL in-radius neighbors.

    The moment-matrix form of radius search: when a consumer only needs
    neighborhood sums (normal-covariance / Darboux M = sum n n^T, means,
    counts), the whole gather+reduce collapses into one masked matmul

        out[q] = sum_p [d2(q,p) <= r^2] * feats[p]  =  W @ feats

    which is exact, UNCAPPED (matching the reference's kd-tree radiusSearch
    semantics, frame_estimator.cpp:74 / cloud.cpp:497-535), and rides the
    MXU with no per-neighbor gather and no top-k sort. Queries are blocked
    to bound the (B, N) mask working set.

    Args:
      query: (Q, 3); query_mask: (Q,) bool.
      points: (N, 3); points_mask: (N,) bool.
      feats: (N, F) float32 per-point features to accumulate.
      radius: inclusive search radius.

    Returns:
      (sums, counts): (Q, F) per-query feature sums and (Q,) in-radius
      neighbor counts (0 where query is masked out).
    """
    q = query.shape[0]
    r2 = jnp.float32(radius) ** 2
    f32 = jnp.float32

    def one_block(qpos, qmask):
        p2 = jnp.sum(points * points, axis=1)
        q2 = jnp.sum(qpos * qpos, axis=1)
        cross = jnp.matmul(qpos, points.T,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = q2[:, None] + p2[None, :] - 2.0 * cross
        w = ((d2 <= r2) & points_mask[None, :]
             & qmask[:, None]).astype(f32)                    # (B, N)
        sums = jnp.matmul(w, feats, precision=jax.lax.Precision.HIGHEST)
        counts = jnp.sum(w, axis=1)
        return sums, counts

    if q <= block:
        return one_block(query, query_mask)

    nblk = -(-q // block)
    pad_q = nblk * block - q
    qpos = jnp.pad(query, ((0, pad_q), (0, 0)), constant_values=PAD_COORD)
    qm = jnp.pad(query_mask, (0, pad_q))

    def body(carry, blk):
        bq, bm = blk
        return carry, one_block(bq, bm)

    _, (sums, counts) = jax.lax.scan(
        body, None, (qpos.reshape(nblk, block, 3), qm.reshape(nblk, block)))
    return (sums.reshape(nblk * block, -1)[:q],
            counts.reshape(nblk * block)[:q])


def gather_neighborhoods(idx: jax.Array, valid: jax.Array, *arrays):
    """Gather per-neighbor attributes: each (N, ...) array -> (Q, K, ...)."""
    out = []
    for a in arrays:
        g = a[idx]
        out.append(g)
    return tuple(out) if len(out) > 1 else out[0]
