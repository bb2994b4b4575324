"""Local (Darboux) reference-frame estimation.

Batched TPU equivalent of ``FrameEstimator::calculateLocalFrames`` +
``LocalFrame::findAverageNormalAxis`` (reference:
src/gpd/candidate/frame_estimator.cpp:6-98, src/gpd/candidate/
local_frame.cpp:14-40): one kernel computes every sample's frame at once —
fixed-K neighbor gather, M = N N^T outer-product accumulation (an MXU
contraction), closed-form 3x3 eigendecomposition, sign fix against the mean
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
from gpd_tpu.ops.neighbors import radius_neighbors


@functools.partial(jax.jit, static_argnames=("k",))
def estimate_frames(sample_pos: jax.Array, sample_mask: jax.Array,
                    points: jax.Array, points_mask: jax.Array,
                    normals: jax.Array, radius: float, k: int = 64,
                    ) -> Tuple[jax.Array, jax.Array]:
    """Estimate local frames at sample positions.

    Returns:
      frames: (S, 3, 3) with columns [normal, binormal, curvature_axis].
      valid: (S,) bool — sample had >= 1 neighbor within radius
        (frame_estimator.cpp:74-86 returns nullptr otherwise).
    """
    idx, nvalid = radius_neighbors(sample_pos, sample_mask, points,
                                   points_mask, radius=radius, k=k)
    nn = normals[idx]                                   # (S, K, 3)
    w = nvalid.astype(normals.dtype)
    nnw = nn * w[..., None]
    M = jnp.einsum("ski,skj->sij", nnw, nn, precision=jax.lax.Precision.HIGHEST)  # sum n n^T
    # (w applied once is enough: nnw x nn counts valid rows, invalid rows zero)
    _, V = eigh3_sym(M)
    curvature = V[..., :, 0]                            # min eigenvalue
    normal = V[..., :, 2]                               # max eigenvalue

    avg = jnp.sum(nnw, axis=1)
    flip = jnp.sum(avg * normal, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    binormal = jnp.cross(curvature, normal)

    frames = jnp.stack([normal, binormal, curvature], axis=-1)
    valid = sample_mask & jnp.any(nvalid, axis=1)
    return frames, valid
