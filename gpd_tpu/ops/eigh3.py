"""Batched closed-form 3x3 symmetric eigendecomposition.

Replaces the reference's per-sample ``Eigen::SelfAdjointEigenSolver``
(reference: src/gpd/candidate/local_frame.cpp:14-40) with an analytic,
fully-vectorized routine so thousands of frames decompose in one fused
XLA program (no per-sample loops, no iterative solver).

Algorithm: trigonometric solution of the characteristic polynomial for the
eigenvalues, then eigenvectors via cross products of the two best-conditioned
rows of (A - lambda I), with graceful fallback for (near-)degenerate spectra.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def eigvals3_sym(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3) matrices, ascending."""
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    detB = (B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
            - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
            + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0]))
    r = detB / (2.0 * jnp.maximum(p, _EPS) ** 3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    big = q + 2.0 * p * jnp.cos(phi)
    small = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    mid = 3.0 * q - big - small
    return jnp.stack([small, mid, big], axis=-1)


def _eigvec(A: jax.Array, lam: jax.Array, fallback: jax.Array) -> jax.Array:
    """One eigenvector of symmetric A for eigenvalue lam via row cross
    products; ``fallback`` used when the eigenspace is (near-)degenerate."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    best = jnp.argmax(norms, axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3, 3)
    v = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32)
                            .repeat(3, axis=-1), axis=-2)[..., 0, :]
    nbest = jnp.max(norms, axis=-1)
    good = nbest > _EPS
    v = jnp.where(good[..., None], v, fallback)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


def eigh3_sym(A: jax.Array):
    """Full decomposition of symmetric (..., 3, 3) matrices.

    Returns (eigenvalues ascending (..., 3), eigenvectors (..., 3, 3) with
    column i corresponding to eigenvalue i). Robust to rank-deficient and
    isotropic inputs (both common for N N^T normal outer-product sums).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    An = A / scale[..., None, None]
    w = eigvals3_sym(An)

    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], An.dtype), An[..., 0, :].shape)
    v2 = _eigvec(An, w[..., 2], ex)              # largest — best conditioned
    # Second vector: orthogonalize candidate against v2 for stability.
    v0_raw = _eigvec(An, w[..., 0], _perp(v2))
    v0 = v0_raw - jnp.sum(v0_raw * v2, axis=-1, keepdims=True) * v2
    small = jnp.linalg.norm(v0, axis=-1, keepdims=True) < 1e-6
    v0 = jnp.where(small, _perp(v2), v0)
    v0 = v0 / jnp.maximum(jnp.linalg.norm(v0, axis=-1, keepdims=True), _EPS)
    v1 = jnp.cross(v2, v0)

    V = jnp.stack([v0, v1, v2], axis=-1)
    return w * scale[..., None], V


def _perp(v: jax.Array) -> jax.Array:
    """Any unit vector perpendicular to v."""
    # Pick the axis least aligned with v to cross against.
    ax = jnp.argmin(jnp.abs(v), axis=-1)
    basis = jnp.eye(3, dtype=v.dtype)
    e = basis[ax]
    p = jnp.cross(v, e)
    return p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), _EPS)
