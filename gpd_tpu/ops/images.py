"""Grasp-image descriptor extraction.

TPU-native equivalent of the reference's descriptor layer
(reference: src/gpd/descriptor/image_strategy.cpp,
image_{1,3,12,15}_channels_strategy.cpp, image_generator.cpp,
src/gpd/candidate/hand_set.cpp:118-233 shadow computation): rasterization is
a batched scatter (segment-sum) over all candidates at once, dilation is a
3x3 max-pool, normalization a per-image minmax — no per-hand cv::Mat loops.

Deliberate divergences (documented):
  - createNormalsImage (image_strategy.cpp:124-156) does an order-dependent
    incremental blend of |n| per cell, where the order is the kd-tree result
    order; here each cell takes the mean of |n| — order-independent and
    batched. Downstream effect is sub-quantization after the joint minmax +
    uint8 step for typical cells.
  - shadow voxel jitter uses jax.random instead of the reference's unseeded
    LCG/mt19937 (hand_set.cpp:263-266, 187-206) — the reference is not
    reproducible by design, so equivalence is statistical.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpd_tpu.config import ImageGeometry

SHADOW_VOXEL = 0.003
_POS = jnp.float32(1e9)

# Invertible multiplicative mix on the 30-bit packed voxel keys: C is odd so
# key -> key*C mod 2^30 is a bijection (dedup via sort stays exact), and the
# image is pseudo-uniform over [0, 2^30) — so "smallest v_cap hashed keys"
# selects a spatially SPREAD subset of the occupied voxels. The unhashed
# smallest-key selection kept the lexicographically-lowest slab of the shadow
# region (on the bench workload every sample has 6-9k unique voxels vs the
# 2048 cap, so the cap always binds and the slab bias was the whole story).
_KEY_HASH = 0x1E3779B1            # golden-ratio constant mod 2^30 (odd)
_KEY_UNHASH = pow(_KEY_HASH, -1, 1 << 30)
_KEY_MASK = (1 << 30) - 1


def _use_pallas() -> bool:
    return jax.default_backend() not in ("cpu",)


def _raster_sums_pallas(rows, cols, aug, size: int,
                        precision=jax.lax.Precision.DEFAULT):
    """Per-cell sums via a Pallas TPU kernel, one grid step per hand.

    Factorized-onehot formulation: instead of materializing the full
    (K, size*size) cell onehot (work G*K*size^2, VPU-bound), build a row
    onehot (R, K) and a column-kron operand (size*Cp, K) and contract over
    K on the MXU:

        out[r, col*Cp + c] = sum_k rowhotT[r, k] * (colmaskT * vals_t)[j, k]

    where vals_t[j, k] = vals[j % Cp, k] rides along via a tiny
    (N, Cp) @ (Cp, K) matmul. Work drops to G * (R + size*Cp) * K onehot
    elements + one (R, K) x (N, K) NT contraction per hand.

    Layout rules honored (see CLAUDE.md): K stays in the lane dimension for
    every operand (tiny minor dims get padded to 128 lanes in HBM);
    onehot comparisons use f32 where() (1-bit minor-dim broadcasts are
    unsupported); output rows land in an (R = size+1 rounded to 8)-row
    block so sentinel rows fall in the sliced-off tail.

    rows/cols: (G, K) int32 (invalid entries == size).
    aug: (G, K, Cp) f32 value channels (+count column), pre-masked.
    Returns (G, size, size, Cp) f32 sums.
    """
    G, K = rows.shape
    Cp = aug.shape[-1]
    N = size * Cp
    R = -(-(size + 1) // 8) * 8
    Kp = -(-K // 128) * 128
    if Kp != K:
        # Explicit sentinel padding: Mosaic lane padding is undefined data,
        # which the onehot compares must never see.
        rows = jnp.pad(rows, ((0, 0), (0, Kp - K)), constant_values=size)
        cols = jnp.pad(cols, ((0, 0), (0, Kp - K)), constant_values=size)
        aug = jnp.pad(aug, ((0, 0), (0, Kp - K), (0, 0)))

    rc = jnp.stack([rows, cols], axis=1)                 # (G, 2, Kp)
    augT = jnp.swapaxes(aug, 1, 2)                       # (G, Cp, Kp)

    # Channel-minor j = col*Cp + c, matching pltpu.repeat's tile semantics:
    # row j of the tiled value operand is vals[j % Cp]; colj is a static
    # per-row constant.
    jj = np.arange(N, dtype=np.int32)
    colj = jnp.asarray((jj // Cp).reshape(N, 1))         # (N, 1) i32

    def kernel(rc_ref, v_ref, colj_ref, o_ref):
        rows_k = rc_ref[0, 0:1, :]                       # (1, Kp) i32
        cols_k = rc_ref[0, 1:2, :]                       # (1, Kp)
        # pltpu.repeat tiles whole blocks: (Cp, Kp) -> (N, Kp) with row
        # j = vals[j % Cp].
        vals_rep = pltpu.repeat(v_ref[0], size, axis=0)  # (N, Kp)
        cv = jnp.where(colj_ref[:] == cols_k, vals_rep, 0.0)   # (N, Kp)
        rr = jax.lax.broadcasted_iota(jnp.int32, (R, Kp), 0)
        rowhot = jnp.where(rows_k == rr, 1.0, 0.0)       # (R, Kp)
        # The rowhot operand is exact in any matmul dtype, so counts are
        # exact at every precision. DEFAULT (one bf16 MXU pass, 6x fewer
        # passes than HIGHEST) costs ~2e-3 relative on the value channels —
        # sub-uint8-step after the minmax normalize — and is the default;
        # pass HIGHEST for bit-level histogram comparisons.
        o_ref[0] = jax.lax.dot_general(
            rowhot, cv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                         # (R, N)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, R, N), jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 2, Kp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, Kp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, N), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rc, augT, colj)
    # out[g, r, col*Cp + c] -> (G, size, size, Cp); sentinel rows sliced off.
    return out[:, :size, :].reshape(G, size, size, Cp)


def _raster_sums_pallas2(rows_a, rows_b, cols, aug, size: int,
                         precision=jax.lax.Precision.DEFAULT):
    """Two histograms sharing one col-kron operand (the expensive build).

    The 12/15-channel projections overlap: P0 (rows u, cols v) and P1
    (rows w, cols v) share their column index AND 4 of 5 value channels
    (|n| x3 + count; only the depth coordinate differs), so one merged
    aug = [|n|, depth_a, depth_b, count] col-kron serves both — ~40% less
    VPU operand build than two separate calls — and the two row-onehots
    stack into a single (2R = 128)-row MXU operand (full systolic-array
    height, vs 64 rows half-idle in the single-projection kernel).

    rows_a/rows_b/cols: (G, K) int32 (invalid entries == size).
    aug: (G, K, Cp) f32 value channels, pre-masked.
    Returns (G, 2, size, size, Cp) f32 sums: [:, 0] contracted with
    rows_a, [:, 1] with rows_b.
    """
    G, K = rows_a.shape
    Cp = aug.shape[-1]
    N = size * Cp
    R = -(-(size + 1) // 8) * 8
    Kp = -(-K // 128) * 128
    if Kp != K:
        pad = ((0, 0), (0, Kp - K))
        rows_a = jnp.pad(rows_a, pad, constant_values=size)
        rows_b = jnp.pad(rows_b, pad, constant_values=size)
        cols = jnp.pad(cols, pad, constant_values=size)
        aug = jnp.pad(aug, ((0, 0), (0, Kp - K), (0, 0)))

    rc = jnp.stack([rows_a, rows_b, cols], axis=1)       # (G, 3, Kp)
    augT = jnp.swapaxes(aug, 1, 2)                       # (G, Cp, Kp)
    jj = np.arange(N, dtype=np.int32)
    colj = jnp.asarray((jj // Cp).reshape(N, 1))         # (N, 1) i32

    def kernel(rc_ref, v_ref, colj_ref, o_ref):
        ra_k = rc_ref[0, 0:1, :]                         # (1, Kp)
        rb_k = rc_ref[0, 1:2, :]
        cols_k = rc_ref[0, 2:3, :]
        vals_rep = pltpu.repeat(v_ref[0], size, axis=0)  # (N, Kp)
        cv = jnp.where(colj_ref[:] == cols_k, vals_rep, 0.0)
        rr = jax.lax.broadcasted_iota(jnp.int32, (R, Kp), 0)
        rowhot2 = jnp.concatenate(
            [jnp.where(ra_k == rr, 1.0, 0.0),
             jnp.where(rb_k == rr, 1.0, 0.0)], axis=0)   # (2R, Kp)
        o_ref[0] = jax.lax.dot_general(
            rowhot2, cv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision)                         # (2R, N)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, 2 * R, N), jnp.float32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 3, Kp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, Kp), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * R, N), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )(rc, augT, colj)
    a = out[:, :size, :].reshape(G, size, size, Cp)
    b = out[:, R:R + size, :].reshape(G, size, size, Cp)
    return jnp.stack([a, b], axis=1)


def _raster_blocks_pallas(midx, mvalsT, sidx, svalsT, size: int,
                          with_shadow: bool):
    """All per-cell sums for the 12/15-channel stacks in ONE Pallas kernel.

    Row-side-channel formulation: instead of building a wide column-kron
    value operand (N = size*Cp lanes worth of select passes per hand), each
    channel becomes a 64-row block of (rowhot * value) and a single
    column-onehot serves as the shared right operand:

        out[c*R + r, col] = sum_k rowhot[r,k] * value_c[k] * colhot[col,k]

    Per hand this needs 4 onehot builds (rows u/w, cols v/u — the
    projection structure P0=(u,v,w), P1=(w,v,u), P2=(w,u,v) shares them),
    one multiply pass per value channel, and 2 (4 with shadows) MXU dots —
    about half the VPU passes of the col-kron kernels it replaces, and one
    kernel launch instead of four (on-chip: ~1.9x on the raster chunk).
    Counts ride as the bare rowhot block (exact 0/1 in bf16; f32
    accumulate). Value channels are bf16 — same rounding class as the
    previous Precision.DEFAULT kernels, sub-uint8-step after minmax
    (gated on chip by tools/check_raster_tpu.py).

    midx: (G, 4, Km) int32 [rows_u, rows_w, cols_v, cols_u], sentinel=size.
    mvalsT: (G, 6, Km) bf16 [|n| x3, u, v, w], pre-masked.
    sidx/svalsT: same for shadow points ((G, 4, Ks) / (G, 3, Ks) [u, v, w]).
    Returns (G, NB, R, R) f32 block sums, NB = 15 main (+ 6 shadow) blocks:
    per projection [ax, ay, az, depth, count], shadows [depth, count];
    depth_P0 = w, depth_P1 = u, depth_P2 = v. Crop blocks to [:size, :size].
    """
    G = midx.shape[0]
    Km = midx.shape[-1]
    Ks = sidx.shape[-1] if with_shadow else 0
    R = -(-(size + 1) // 8) * 8
    NB = 21 if with_shadow else 15
    OUT = NB * R

    def kernel(*refs):
        if with_shadow:
            mi_ref, mv_ref, si_ref, sv_ref, o_ref = refs
        else:
            mi_ref, mv_ref, o_ref = refs

        def onehot(idx_row, rr):
            # f32 select then cast: a direct bf16 select from an i32
            # compare hits a Mosaic i1 relayout (8,128)->(16,128).
            # rr < size: sentinel entries (idx == size) activate NO row, so
            # output row/col `size` is exactly zero — downstream can then
            # dilate the full (R, R) block with zero padding (equivalent to
            # the -inf-border dilate on the crop: images are non-negative).
            return jnp.where((idx_row == rr) & (rr < size),
                             1.0, 0.0).astype(jnp.bfloat16)

        rrm = jax.lax.broadcasted_iota(jnp.int32, (R, Km), 0)
        hot_u = onehot(mi_ref[0, 0:1, :], rrm)
        hot_w = onehot(mi_ref[0, 1:2, :], rrm)
        chot_v = onehot(mi_ref[0, 2:3, :], rrm)
        chot_u = onehot(mi_ref[0, 3:4, :], rrm)
        ax = mv_ref[0, 0:1, :]
        ay = mv_ref[0, 1:2, :]
        az = mv_ref[0, 2:3, :]
        uu = mv_ref[0, 3:4, :]
        vv = mv_ref[0, 4:5, :]
        ww = mv_ref[0, 5:6, :]
        # P0 (rows u, cols v, depth w) + P1 (rows w, cols v, depth u) share
        # the cols_v onehot; P2 (rows w, cols u, depth v). Dots run per
        # 5-block (320-row) group rather than one 10-block operand: VMEM is
        # ~16 MB/core and the big concatenated operand (3.3 MB each, on top
        # of the onehots and products) left Mosaic no room to double-buffer
        # the grid pipeline in the fused program.
        def dot_to(lo, A, chot):
            o_ref[0, lo * R:(lo + A.shape[0] // R) * R, :] = \
                jax.lax.dot_general(A, chot, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)

        dot_to(0, jnp.concatenate([hot_u * ax, hot_u * ay, hot_u * az,
                                   hot_u * ww, hot_u], 0), chot_v)
        dot_to(5, jnp.concatenate([hot_w * ax, hot_w * ay, hot_w * az,
                                   hot_w * uu, hot_w], 0), chot_v)
        dot_to(10, jnp.concatenate([hot_w * ax, hot_w * ay, hot_w * az,
                                    hot_w * vv, hot_w], 0), chot_u)

        if with_shadow:
            rrs = jax.lax.broadcasted_iota(jnp.int32, (R, Ks), 0)
            shot_u = onehot(si_ref[0, 0:1, :], rrs)
            shot_w = onehot(si_ref[0, 1:2, :], rrs)
            schot_v = onehot(si_ref[0, 2:3, :], rrs)
            schot_u = onehot(si_ref[0, 3:4, :], rrs)
            su = sv_ref[0, 0:1, :]
            sv = sv_ref[0, 1:2, :]
            sw = sv_ref[0, 2:3, :]
            o_ref[0, 15 * R:19 * R, :] = jax.lax.dot_general(
                jnp.concatenate([shot_u * sw, shot_u,
                                 shot_w * su, shot_w], 0), schot_v,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, 19 * R:21 * R, :] = jax.lax.dot_general(
                jnp.concatenate([shot_w * sv, shot_w], 0), schot_u,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    in_specs = [
        pl.BlockSpec((1, 4, Km), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 6, Km), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [midx, mvalsT]
    if with_shadow:
        in_specs += [
            pl.BlockSpec((1, 4, Ks), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Ks), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [sidx, svalsT]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, OUT, R), jnp.float32),
        grid=(G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, OUT, R), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )(*args)
    # (G, NB, R, R) block layout. (A raw (G, NB*R, R) return with static
    # per-block slices was tried to kill the reshape's layout copies, but
    # reduce_window on the strided slices ran ~6x slower than the copies —
    # the reshape is the cheaper relayout on this backend.)
    return out.reshape(out.shape[0], -1, -(-(size + 1) // 8) * 8, R)


def num_shadow_points(image: ImageGeometry) -> int:
    """floor(shadow_length / voxel); shadow_length = max image dim
    (image_15_channels_strategy.h:75, hand_set.cpp:121-123)."""
    shadow_length = max(image.outer_diameter, image.depth, image.height / 2.0)
    return int(shadow_length // SHADOW_VOXEL)


def shadow_length_of(image: ImageGeometry) -> float:
    return max(image.outer_diameter, image.depth, image.height / 2.0)


@functools.partial(jax.jit, static_argnames=("n_sp", "v_cap"))
def compute_shadows(key, nn_pts, nn_valid, nn_cam, view_points,
                    shadow_length, n_sp: int, v_cap: int,
                    sample_uid=None):
    """Per-sample occluded-region point sets (HandSet::calculateShadow,
    hand_set.cpp:118-233).

    Args:
      nn_pts: (S, K, 3) world-frame neighborhood points.
      nn_valid: (S, K) bool.
      nn_cam: (S, K) uint32 camera bitmask per neighborhood point.
      view_points: (V, 3) camera positions.
      n_sp: shadow points cast per cloud point.
      v_cap: output cap on unique shadow voxels per sample.
      sample_uid: optional (S,) int32 stable per-sample ids. Per-sample
        randomness is keyed on fold_in(key, uid) rather than the row index,
        so results are invariant to how callers permute or block the sample
        axis (the active-first compaction path). Defaults to arange(S).

    Returns:
      (shadow_pts (S, v_cap, 3), shadow_valid (S, v_cap)).
    """
    S, K, _ = nn_pts.shape
    if sample_uid is None:
        sample_uid = jnp.arange(S, dtype=jnp.int32)
    row_keys = jax.vmap(jax.random.fold_in, (None, 0))(key, sample_uid)
    V = view_points.shape[0]
    w = nn_valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    center = jnp.sum(nn_pts * w[..., None], axis=1) / cnt[:, None]   # (S, 3)

    # Which cameras see >= 1 point of each neighborhood (hand_set.cpp:130).
    cam_ids = jnp.arange(V, dtype=jnp.uint32)
    seen_pt = ((nn_cam[..., None] >> cam_ids) & 1) > 0               # (S,K,V)
    seen_pt = seen_pt & nn_valid[..., None]
    cam_seen = jnp.any(seen_pt, axis=1)                              # (S, V)

    inv_vox = 1.0 / SHADOW_VOXEL

    # Voxel keys are packed relative to a per-sample base voxel so the
    # 10-bit fields never alias regardless of where the workspace sits
    # (world-frame packing with a fixed 512 offset aliased beyond ~1.5 m).
    # Cell boundaries stay world-anchored with the reference's cast<int>
    # truncation semantics (hand_set.cpp:156-160); only the *encoding* is
    # relative. Ray points lie within shadow_length of a source point, so
    # base = trunc((min source coord - shadow_length) / voxel) - 2 bounds
    # every offset into [0, ~2*(radius+shadow)/voxel + 4] << 1024.
    pmin = jnp.min(jnp.where(nn_valid[..., None], nn_pts, _POS), axis=1)
    base = jnp.clip(jnp.trunc((pmin - shadow_length) * inv_vox),
                    -2.0 ** 30, 2.0 ** 30).astype(jnp.int32) - 2     # (S, 3)

    def cam_voxels(c):
        vec = center - view_points[c][None, :]                       # (S, 3)
        vec = shadow_length * vec / jnp.maximum(
            jnp.linalg.norm(vec, axis=1, keepdims=True), 1e-12)
        # Even stream ids for cameras, odd reserved for the voxel jitter —
        # with 8+ view points, fold_in(rk, c) for camera 7 would collide
        # with a jitter stream keyed on a small constant.
        u = jax.vmap(
            lambda rk: jax.random.uniform(jax.random.fold_in(rk, 2 * c),
                                          (K, n_sp)))(row_keys)
        q = nn_pts[:, :, None, :] + u[..., None] * vec[:, None, None, :]
        vox = jnp.trunc(q * inv_vox).astype(jnp.int32)               # C++ cast<int>
        rel = vox - base[:, None, None, :]
        key_ = (rel[..., 0] << 20) | (rel[..., 1] << 10) | rel[..., 2]
        # Sort/select in hashed key space (see _KEY_HASH note above). The
        # multiply wraps mod 2^32 in uint32; masking to 30 bits keeps the
        # map bijective on the 30-bit key domain.
        key_ = ((key_.astype(jnp.uint32) * jnp.uint32(_KEY_HASH))
                & jnp.uint32(_KEY_MASK)).astype(jnp.int32)
        key_ = jnp.where(nn_valid[:, :, None], key_, jnp.int32(2 ** 30))
        return key_.reshape(S, K * n_sp)

    cam0 = jnp.sort(cam_voxels(0), axis=1)                  # (S, K*n_sp)
    uniq = jnp.concatenate(
        [jnp.ones((S, 1), bool), cam0[:, 1:] != cam0[:, :-1]], axis=1)
    valid = uniq & (cam0 < 2 ** 30) & cam_seen[:, 0:1]

    # Intersect with every other camera that sees the neighborhood
    # (hand_set.cpp:168-176).
    for c in range(1, V):
        oc = jnp.sort(cam_voxels(c), axis=1)
        pos = jax.vmap(jnp.searchsorted)(oc, cam0)
        pos = jnp.clip(pos, 0, oc.shape[1] - 1)
        member = jnp.take_along_axis(oc, pos, axis=1) == cam0
        valid = valid & jnp.where(cam_seen[:, c:c + 1], member, True)

    # Compact unique voxels to the front, cap at v_cap. The hashed keys are
    # unique among valid entries, so a top_k of the v_cap smallest IS the
    # compaction, and because the hash is pseudo-uniform, the kept subset
    # is a spatially spread sample of the occupied region rather than a
    # low-key slab. (On-chip A/B, tools/bench_compact.py: top_k is the
    # fastest compaction here — a vmapped searchsorted over the rank cumsum
    # is ~40x slower pipelined (lane-gather-bound), and unique-index
    # scatter ~2x slower; the sort+top_k pair costs only ~2-4 ms pipelined
    # at (512, 8184) — earlier per-dispatch timings were dominated by the
    # ~24 ms sync floor.)
    v_cap = min(v_cap, K * n_sp)
    skey = jnp.where(valid, cam0, jnp.int32(2 ** 30))
    neg, _ = jax.lax.top_k(-skey, v_cap)
    hashed = -neg
    validc = hashed < 2 ** 30
    # Invert the hash (C * C^-1 = 1 mod 2^30) to recover packed rel coords.
    cam0c = ((hashed.astype(jnp.uint32) * jnp.uint32(_KEY_UNHASH))
             & jnp.uint32(_KEY_MASK)).astype(jnp.int32)
    cam0c = jnp.where(validc, cam0c, jnp.int32(2 ** 30))

    vx = ((cam0c >> 20) & 0x3FF) + base[:, None, 0]
    vy = ((cam0c >> 10) & 0x3FF) + base[:, None, 1]
    vz = (cam0c & 0x3FF) + base[:, None, 2]
    vox = jnp.stack([vx, vy, vz], axis=-1).astype(jnp.float32)

    # Voxels -> points with shared-scalar N(0,1)*0.3*voxel jitter
    # (hand_set.cpp:187-206: same scalar for all 3 coords of a voxel).
    jit = jax.vmap(
        lambda rk: jax.random.normal(jax.random.fold_in(rk, 1),
                                     (v_cap, 1)))(row_keys) \
        * (0.3 * SHADOW_VOXEL)
    pts = vox * SHADOW_VOXEL + jit
    return pts, validc


def _unit_transform(pts_hand, bottom, center, image: ImageGeometry):
    """findPointsInUnitImage + transformPointsToUnitImage
    (image_strategy.cpp:53-90). pts_hand: (..., 3) in hand frame.
    Returns (unit coords (..., 3), in-volume mask)."""
    half_od = image.outer_diameter / 2.0
    x, y, z = pts_hand[..., 0], pts_hand[..., 1], pts_hand[..., 2]
    b = bottom[..., None]
    c = center[..., None]
    inside = ((x > b) & (x < b + image.depth) &
              (y > c - half_od) & (y < c + half_od) &
              (z > -image.height) & (z < image.height))
    u = (x - b) / image.depth
    v = (y - (c - half_od)) / image.outer_diameter
    w = (z + image.height) / (2.0 * image.height)
    return jnp.stack([u, v, w], axis=-1), inside


def _cell_coord(c, size: int):
    """One axis of findCellIndices (image_strategy.cpp:92-102): clamped
    floor to the grid."""
    return jnp.minimum(jnp.floor(c * size).astype(jnp.int32), size - 1)


def _cells(c0, c1, size: int):
    """findCellIndices (image_strategy.cpp:92-102) + the row flip applied at
    write time (createBinaryImage etc.: row = size-1 - idx/size, col = idx%size).
    Returns flat pixel index row*size + col."""
    vert = _cell_coord(c0, size)
    horz = _cell_coord(c1, size)
    row = (size - 1) - vert
    col = horz
    return row * size + col


def _scatter_mean(cell, mask, values, num_hands: int, size: int):
    """Masked per-cell mean: cell (G, K), values (G, K, C) -> (G, npx, C).

    TPU-native formulation: XLA scatter with duplicate indices serializes,
    and binary-search/gather schemes are lane-gather-bound; instead exploit
    cell = row*size + col and factor the 2D histogram into ONE batched MXU
    contraction per hand block:

        out[g, r, l, c] = sum_k rowhot[g,k,r] * (colhot ox [values,1])[g,k,l,c]

    Row/col one-hots are exact in any float dtype; counts ride along as an
    extra channel. Blocked over hands to bound the materialized col-kron
    operand.
    """
    G, K = cell.shape
    C = values.shape[-1]
    row = cell // size
    col = cell - row * size
    m = mask.astype(values.dtype)

    if _use_pallas():
        rows = jnp.where(mask, row, size).astype(jnp.int32)
        cols = jnp.where(mask, col, size).astype(jnp.int32)
        aug = jnp.concatenate(
            [values * m[..., None], m[..., None]], -1).astype(jnp.float32)
        out = _raster_sums_pallas(rows, cols, aug, size)
        sums = out[..., :C].reshape(G, size * size, C)
        cnts = out[..., C].reshape(G, size * size)
        mean = sums / jnp.maximum(cnts, 1.0)[..., None]
        return mean, cnts

    rid = jnp.arange(size, dtype=cell.dtype)
    # Cap the materialized col-kron operand at ~768 MB f32 per block.
    budget = 192 * 1024 * 1024
    blk = max(8, budget // max(K * size * (C + 1), 1))
    blk = min(G, blk)
    nblk = -(-G // blk)
    pad = nblk * blk - G

    def pad0(a):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

    rows_b = pad0(row).reshape(nblk, blk, K)
    cols_b = pad0(col).reshape(nblk, blk, K)
    m_b = pad0(m).reshape(nblk, blk, K)
    v_b = pad0(values).reshape(nblk, blk, K, C)

    def block(args):
        rw, cl, mm, vv = args
        R = (rw[..., None] == rid).astype(vv.dtype) * mm[..., None]
        Ch = (cl[..., None] == rid).astype(vv.dtype)          # (b, K, size)
        aug = jnp.concatenate([vv, jnp.ones_like(vv[..., :1])], -1)
        CV = (Ch[..., :, None] * aug[..., None, :]).reshape(
            blk, K, size * (C + 1))
        out = jnp.einsum("gkr,gkn->grn", R, CV,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(blk, size, size, C + 1)

    out = jax.lax.map(block, (rows_b, cols_b, m_b, v_b))
    out = out.reshape(nblk * blk, size, size, C + 1)[:G]
    sums = out[..., :C].reshape(G, size * size, C)
    cnts = out[..., C].reshape(G, size * size)
    mean = sums / jnp.maximum(cnts, 1.0)[..., None]
    return mean, cnts


def _dilate3(img):
    """3x3 max dilation (cv::dilate with MORPH_RECT 3x3), border = -inf
    so padding never injects values. img: (G, H, W, C)."""
    return jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _minmax_u8(img, joint_axes):
    """cv::normalize NORM_MINMAX to [0,1] then convertTo(CV_8U, 255)
    (image_strategy.cpp:149-155). joint_axes: axes sharing one min/max
    (the 3 normal channels normalize jointly)."""
    mn = jnp.min(img, axis=joint_axes, keepdims=True)
    mx = jnp.max(img, axis=joint_axes, keepdims=True)
    rng = mx - mn
    out = jnp.where(rng > 0, (img - mn) / jnp.where(rng > 0, rng, 1.0), 0.0)
    return jnp.rint(out * 255.0).astype(jnp.uint8)


# Projection index permutations (image_12_channels_strategy.cpp:42-56 /
# image_15_channels_strategy.cpp:55-71): sequential row swaps (0,2) then (1,2)
# of the unit-coordinate rows give projections P0=(u,v,w), P1=(w,v,u),
# P2=(w,u,v).
_PROJECTIONS = ((0, 1, 2), (2, 1, 0), (2, 0, 1))


def _unit_transform_cm(x, y, z, bottom, center, image: ImageGeometry):
    """Channel-major _unit_transform: x/y/z are (G, K) hand-frame coord
    ROWS (not an (..., 3) minor axis). Returns (u, v, w, inside), each
    (G, K). Keeping channels on the second-major axis lets the Pallas
    raster operands assemble without layout copies (profiler traces showed
    ~1.6 ms/chunk of pure relayout when transposing (G, K, 3) tensors)."""
    half_od = image.outer_diameter / 2.0
    b = bottom[..., None]
    c = center[..., None]
    inside = ((x > b) & (x < b + image.depth) &
              (y > c - half_od) & (y < c + half_od) &
              (z > -image.height) & (z < image.height))
    u = (x - b) / image.depth
    v = (y - (c - half_od)) / image.outer_diameter
    w = (z + image.height) / (2.0 * image.height)
    return u, v, w, inside


def _cm_operands(u, v, w, inside, extra_rows, size: int):
    """Assemble Pallas raster operands from channel-major rows: index
    stack [rows_u, rows_w, cols_v, cols_u] (sentinel=size) and value stack
    [*extra_rows, u, v, w] (masked), lane-padded to a multiple of 128."""
    sent = jnp.int32(size)
    cu = _cell_coord(u, size)
    cv_ = _cell_coord(v, size)
    cw = _cell_coord(w, size)
    idx = jnp.stack([jnp.where(inside, (size - 1) - cu, sent),
                     jnp.where(inside, (size - 1) - cw, sent),
                     jnp.where(inside, cv_, sent),
                     jnp.where(inside, cu, sent)], axis=1)
    mf = inside.astype(jnp.float32)
    vals = jnp.stack([*extra_rows, u, v, w], axis=1) * mf[:, None, :]

    def pad_lanes(a, cval):
        k = a.shape[-1]
        kp = -(-k // 128) * 128
        if kp == k:
            return a
        return jnp.pad(a, ((0, 0), (0, 0), (0, kp - k)),
                       constant_values=cval)

    return (pad_lanes(idx, size).astype(jnp.int32),
            pad_lanes(vals, 0.0).astype(jnp.bfloat16))


def _raster_finish(blocks, size: int, num_channels: int):
    """Final channel assembly from the fused kernel's per-cell sums
    (G, NB, R, R): per projection [ax, ay, az, depth, count] (+ shadow
    [depth, count] blocks 15..20); depth_P0 = w, depth_P1 = u,
    depth_P2 = v.

    (An NCHW assembly that dilated the full zero-masked blocks without
    relayout was tried and measured SLOWER — the channel-first (G, C, 64,
    64) elementwise/window ops underuse the 128-lane VPU; one NHWC
    relayout is the cheaper option on this backend. EVERY consumer reads
    through the same block-minor moveaxis so XLA emits ONE layout copy of
    the kernel output, not one per consumer layout — traces showed two
    full-tensor copies when the mean channels took an NHWC view while the
    shadow/count blocks read the NCHW view directly.)"""
    with_shadow = num_channels == 15
    nb = jnp.moveaxis(blocks[..., :size, :size], 1, -1)  # (G, s, s, NB)

    chans = []
    for pi in range(3):
        b = 5 * pi
        cnt = nb[..., b + 4:b + 5]
        mean = nb[..., b:b + 4] / jnp.maximum(cnt, 1.0)
        nimg = _dilate3(mean[..., 0:3])
        chans.append(_minmax_u8(nimg, joint_axes=(1, 2, 3)))
        dimg = jnp.where(cnt > 0, 1.0 - mean[..., 3:4], 0.0)
        chans.append(_minmax_u8(_dilate3(dimg), joint_axes=(1, 2, 3)))
        if with_shadow:
            ssum = nb[..., 15 + 2 * pi]
            scnt = nb[..., 16 + 2 * pi]
            smean = ssum / jnp.maximum(scnt, 1.0)
            nonzero = scnt > 0
            mx = jnp.max(jnp.where(nonzero, smean, -jnp.inf), axis=(1, 2),
                         keepdims=True)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            simg = jnp.where(nonzero, mx - smean, 0.0)[..., None]
            chans.append(_minmax_u8(_dilate3(simg), joint_axes=(1, 2, 3)))
    return jnp.concatenate(chans, axis=-1)


@functools.partial(jax.jit, static_argnames=("image", "num_channels"))
def _raster_kernel(unit, inside, nrm_hand, shadow_unit, shadow_inside,
                   image: ImageGeometry, num_channels: int):
    """Rasterize all channel stacks for a batch of hands.

    unit: (G, K, 3) unit-volume coords; inside: (G, K);
    nrm_hand: (G, K, 3) hand-frame normals;
    shadow_unit/(G, Ks, 3), shadow_inside (G, Ks) — only for 15 channels.
    Returns (G, size, size, num_channels) uint8.
    """
    size = image.size
    G = unit.shape[0]
    absn = jnp.abs(nrm_hand)

    if _use_pallas() and num_channels in (12, 15):
        # Channel-minor entry into the fused-kernel path (used by tests and
        # the on-chip equivalence gate; the serving path assembles
        # channel-major operands directly in make_images).
        midx, mvals = _cm_operands(
            unit[..., 0].astype(jnp.float32), unit[..., 1].astype(jnp.float32),
            unit[..., 2].astype(jnp.float32), inside,
            [absn[..., 0], absn[..., 1], absn[..., 2]], size)
        if num_channels == 15:
            sidx, svals0 = _cm_operands(
                shadow_unit[..., 0], shadow_unit[..., 1], shadow_unit[..., 2],
                shadow_inside, [], size)
            svals = svals0
        else:
            sidx = jnp.zeros((G, 4, 128), jnp.int32)
            svals = jnp.zeros((G, 3, 128), jnp.bfloat16)
        raw = _raster_blocks_pallas(midx, mvals, sidx, svals, size,
                                    num_channels == 15)
        return _raster_finish(raw, size, num_channels)

    n_proj = 3 if num_channels in (12, 15) else 1
    chans = []
    for pi in range(n_proj):
        p = _PROJECTIONS[pi]
        c0, c1, c2 = unit[..., p[0]], unit[..., p[1]], unit[..., p[2]]
        cell = _cells(c0, c1, size)

        # Normals + depth share cell indices: one fused scatter per
        # projection (channels [|n| x3, z]).
        if num_channels in (12, 15):
            vals = jnp.concatenate([absn, c2[..., None]], axis=-1)
            mean, cnt = _scatter_mean(cell, inside, vals, G, size)
            nimg = _dilate3(mean[..., :3].reshape(G, size, size, 3))
            chans.append(_minmax_u8(nimg, joint_axes=(1, 2, 3)))
            dimg = jnp.where(cnt[..., None] > 0, 1.0 - mean[..., 3:], 0.0)
            dimg = _dilate3(dimg.reshape(G, size, size, 1))
            chans.append(_minmax_u8(dimg, joint_axes=(1, 2, 3)))
        elif num_channels == 3:
            nimg, _ = _scatter_mean(cell, inside, absn, G, size)
            nimg = _dilate3(nimg.reshape(G, size, size, 3))
            chans.append(_minmax_u8(nimg, joint_axes=(1, 2, 3)))
        elif num_channels == 1:
            dmean, dcnt = _scatter_mean(cell, inside, c2[..., None], G, size)
            dimg = jnp.where(dcnt[..., None] > 0, 1.0 - dmean, 0.0)
            dimg = _dilate3(dimg.reshape(G, size, size, 1))
            chans.append(_minmax_u8(dimg, joint_axes=(1, 2, 3)))

        if num_channels == 15:
            s0, s1, s2 = (shadow_unit[..., p[0]], shadow_unit[..., p[1]],
                          shadow_unit[..., p[2]])
            scell = _cells(s0, s1, size)
            smean, scnt = _scatter_mean(scell, shadow_inside, s2[..., None],
                                        G, size)
            nonzero = scnt > 0
            mx = jnp.max(jnp.where(nonzero, smean[..., 0], -jnp.inf),
                         axis=1, keepdims=True)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
            simg = jnp.where(nonzero, mx - smean[..., 0], 0.0)
            simg = simg.reshape(G, size, size, 1)
            simg = _dilate3(simg)
            chans.append(_minmax_u8(simg, joint_axes=(1, 2, 3)))

    return jnp.concatenate(chans, axis=-1)


@functools.partial(jax.jit, static_argnames=("image",))
def make_images(nn_pts, nn_nrm, nn_valid, hand_R, hand_sample, hand_bottom,
                hand_center, hand_valid, image: ImageGeometry,
                shadow_pts: Optional[jax.Array] = None,
                shadow_valid: Optional[jax.Array] = None) -> jax.Array:
    """Create grasp images for a flat batch of hands.

    Args:
      nn_pts/nn_nrm/nn_valid: (G, K, ...) per-hand world-frame neighborhoods
        (a hand's neighborhood is its sample's image-radius neighborhood,
        image_generator.cpp:42-64).
      hand_R: (G, 3, 3); hand_sample: (G, 3); hand_bottom/center: (G,).
      shadow_pts/shadow_valid: (G, Ks, 3)/(G, Ks) world-frame occluded points
        (required for 15 channels).

    Returns (G, size, size, num_channels) uint8.
    """
    hp = jax.lax.Precision.HIGHEST
    if _use_pallas() and image.num_channels in (12, 15):
        # Channel-MAJOR pipeline: the transform einsums emit (G, 3, K)
        # directly (XLA folds the transpose into the dot's output layout),
        # so the fused raster kernel's operand stacks assemble with no
        # relayout copies — the (G, K, 3)->(G, Cp, K) transposes cost
        # ~1.6 ms/chunk of pure copy in profiler traces.
        size = image.size
        G = nn_valid.shape[0]
        if nn_pts.ndim == 2:
            # Shared (identity) neighborhood: R^T (p - s) = R^T p - R^T s,
            # so the whole cloud rotates in ONE batched dot with no
            # per-hand broadcast of the (N, 3) arrays.
            pts_cm = jnp.einsum("kj,gji->gik", nn_pts, hand_R, precision=hp)
            t = jnp.einsum("gj,gji->gi", hand_sample, hand_R, precision=hp)
            pts_cm = pts_cm - t[:, :, None]
            nrm_cm = jnp.einsum("kj,gji->gik", nn_nrm, hand_R, precision=hp)
        else:
            rel = nn_pts - hand_sample[:, None, :]
            pts_cm = jnp.einsum("gkj,gji->gik", rel, hand_R, precision=hp)
            nrm_cm = jnp.einsum("gkj,gji->gik", nn_nrm, hand_R, precision=hp)
        u, v, w, ins = _unit_transform_cm(
            pts_cm[:, 0], pts_cm[:, 1], pts_cm[:, 2], hand_bottom,
            hand_center, image)
        ins = ins & nn_valid & hand_valid[:, None]
        absn = jnp.abs(nrm_cm)
        midx, mvals = _cm_operands(
            u, v, w, ins, [absn[:, 0], absn[:, 1], absn[:, 2]], size)
        if image.num_channels == 15:
            srel = shadow_pts - hand_sample[:, None, :]
            sh_cm = jnp.einsum("gkj,gji->gik", srel, hand_R, precision=hp)
            su, sv, sw, sins = _unit_transform_cm(
                sh_cm[:, 0], sh_cm[:, 1], sh_cm[:, 2], hand_bottom,
                hand_center, image)
            sins = sins & shadow_valid & hand_valid[:, None]
            sidx, svals = _cm_operands(su, sv, sw, sins, [], size)
        else:
            sidx = jnp.zeros((G, 4, 128), jnp.int32)
            svals = jnp.zeros((G, 3, 128), jnp.bfloat16)
        raw = _raster_blocks_pallas(midx, mvals, sidx, svals, size,
                                    image.num_channels == 15)
        return _raster_finish(raw, size, image.num_channels)

    if nn_pts.ndim == 2:
        # Shared (identity) neighborhood (see the channel-major branch).
        pts_hand = jnp.einsum("kj,gji->gki", nn_pts, hand_R, precision=hp)
        t = jnp.einsum("gj,gji->gi", hand_sample, hand_R, precision=hp)
        pts_hand = pts_hand - t[:, None, :]
        nrm_hand = jnp.einsum("kj,gji->gki", nn_nrm, hand_R, precision=hp)
    else:
        rel = nn_pts - hand_sample[:, None, :]
        pts_hand = jnp.einsum("gkj,gji->gki", rel, hand_R, precision=hp)
        nrm_hand = jnp.einsum("gkj,gji->gki", nn_nrm, hand_R, precision=hp)
    unit, ins = _unit_transform(pts_hand, hand_bottom, hand_center, image)
    ins = ins & nn_valid & hand_valid[:, None]

    if image.num_channels == 15:
        srel = shadow_pts - hand_sample[:, None, :]
        sh = jnp.einsum("gkj,gji->gki", srel, hand_R, precision=jax.lax.Precision.HIGHEST)
        sunit, sins = _unit_transform(sh, hand_bottom, hand_center, image)
        sins = sins & shadow_valid & hand_valid[:, None]
    else:
        sunit = jnp.zeros((unit.shape[0], 1, 3), unit.dtype)
        sins = jnp.zeros((unit.shape[0], 1), bool)

    return _raster_kernel(unit, ins, nrm_hand, sunit, sins, image,
                          image.num_channels)
