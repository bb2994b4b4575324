"""Local (Darboux) reference-frame estimation.

Batched TPU equivalent of ``FrameEstimator::calculateLocalFrames`` +
``LocalFrame::findAverageNormalAxis`` (reference:
src/gpd/candidate/frame_estimator.cpp:6-98, src/gpd/candidate/
local_frame.cpp:14-40): one kernel computes every sample's frame at once.

The reference does a kd-tree ``radiusSearch`` per sample and accumulates
M = N N^T over the found normals (uncapped). Here the whole accumulation is
a single masked matmul over per-point normal outer products
(ops/neighbors.py radius_moments) — exact and uncapped like the reference's
kd-tree, with no per-neighbor gather and no nearest-K truncation — followed
by a closed-form 3x3 eigendecomposition and the sign fix against the mean
neighborhood normal.

Frame columns: [normal, binormal, curvature_axis] with
binormal = curvature_axis x normal (right-handed, det +1).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from gpd_tpu.ops.eigh3 import eigh3_sym
from gpd_tpu.ops.neighbors import radius_moments


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_frames(sample_pos: jax.Array, sample_mask: jax.Array,
                    points: jax.Array, points_mask: jax.Array,
                    normals: jax.Array, radius: float, k: int = 64,
                    ) -> Tuple[jax.Array, jax.Array]:
    """Estimate local frames at sample positions.

    ``k`` is accepted for API compatibility but unused: the moment-matmul
    accumulation covers ALL in-radius neighbors (the reference's uncapped
    radiusSearch semantics, frame_estimator.cpp:74).

    Returns:
      frames: (S, 3, 3) with columns [normal, binormal, curvature_axis].
      valid: (S,) bool — sample had >= 1 neighbor within radius
        (frame_estimator.cpp:74-86 returns nullptr otherwise).
    """
    del k
    n = normals
    # Per-point features: the 6 unique entries of n n^T plus n itself.
    feats = jnp.stack([
        n[:, 0] * n[:, 0], n[:, 1] * n[:, 1], n[:, 2] * n[:, 2],
        n[:, 0] * n[:, 1], n[:, 0] * n[:, 2], n[:, 1] * n[:, 2],
        n[:, 0], n[:, 1], n[:, 2],
    ], axis=1)                                          # (N, 9)
    sums, counts = radius_moments(sample_pos, sample_mask, points,
                                  points_mask, feats, radius)
    xx, yy, zz, xy, xz, yz = (sums[:, i] for i in range(6))
    M = jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)                                         # (S, 3, 3)
    _, V = eigh3_sym(M)
    curvature = V[..., :, 0]                            # min eigenvalue
    normal = V[..., :, 2]                               # max eigenvalue

    avg = sums[:, 6:9]                                  # sum of normals
    flip = jnp.sum(avg * normal, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    binormal = jnp.cross(curvature, normal)

    frames = jnp.stack([normal, binormal, curvature], axis=-1)
    valid = sample_mask & (counts > 0)
    return frames, valid
