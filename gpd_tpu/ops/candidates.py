"""Grasp-candidate search: the geometric core.

TPU-native re-design of the reference's hot loop
(reference: src/gpd/candidate/hand_search.cpp:144-188,
src/gpd/candidate/hand_set.cpp:31-116, src/gpd/candidate/finger_hand.cpp,
src/gpd/candidate/antipodal.cpp:10-96): instead of per-sample OpenMP threads
mutating FingerHand objects, the whole (samples x axes x orientations x
finger-placements x neighborhood) grid is evaluated as one fixed-shape XLA
program. The reference's early-exit control flow becomes masked computation:

  - evaluateFingers's "back-of-hand collision => abort" is an any() reduction,
  - deepenHand's break-on-first-failure scan is a cumulative-AND over the
    statically-unrolled depth schedule (identical depths as the C++ double
    accumulation loop, see HandGeometry.deepen_depths),
  - the antipodal force-closure test is pure elementwise math + reductions.

Memory is bounded by scanning over the (axis x orientation) grid, keeping
(S, K) working sets per step.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpd_tpu.config import DetectorConfig, HandGeometry
from gpd_tpu.core.types import Grasps
from gpd_tpu.ops.neighbors import radius_mask, radius_neighbors

_NEG = jnp.float32(-1e9)
_POS = jnp.float32(1e9)


def _ceil128(n: int) -> int:
    return -(-n // 128) * 128


# Per-sample-block working-set budget for the hand search, in f32 elements
# of one (M, B, K) tensor (~270 MB): big scenes scan over sample blocks
# instead of materializing the whole orientation grid at once.
_BLOCK_ELEMS = 1 << 26


def finger_spacing(hand: HandGeometry, num_placements: int) -> np.ndarray:
    """Finger placement offsets (finger_hand.cpp:12-18): 2P values — first P
    are left-finger slab starts, last P right-finger slab starts."""
    fs_half = np.linspace(0.0, hand.outer_diameter - hand.finger_width,
                          num_placements)
    left = fs_half - hand.outer_diameter + hand.finger_width
    return np.concatenate([left, fs_half]).astype(np.float32)


def rotation_grid(angles: Sequence[float], hand_axes: Sequence[int]) -> np.ndarray:
    """Static per-(axis, orientation) rotations: RotY(pi) @ AngleAxis(angle,
    e_axis) (hand_set.cpp:49-73). Full hand frame = local_frame @ this."""
    rot_binormal = np.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    mats = []
    for ax in hand_axes:
        for ang in angles:
            c, s = math.cos(ang), math.sin(ang)
            if ax == 0:
                R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
            elif ax == 1:
                R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            else:
                R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            mats.append(rot_binormal @ R)
    return np.stack(mats).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """Static parameters of the search kernel (hashable for jit)."""

    finger_width: float
    outer_diameter: float
    hand_depth: float
    hand_height: float
    init_bite: float
    num_placements: int
    deepen_hand: bool
    friction_cos: float
    min_viable: int
    depths: Tuple[float, ...]
    spacing: Tuple[float, ...]

    @staticmethod
    def from_config(cfg: DetectorConfig) -> "SearchParams":
        hg = cfg.hand_geometry
        return SearchParams(
            finger_width=hg.finger_width,
            outer_diameter=hg.outer_diameter,
            hand_depth=hg.depth,
            hand_height=hg.height,
            init_bite=hg.init_bite,
            num_placements=cfg.num_finger_placements,
            deepen_hand=cfg.deepen_hand,
            friction_cos=math.cos(cfg.friction_coeff * math.pi / 180.0),
            min_viable=cfg.min_viable,
            depths=tuple(hg.deepen_depths()),
            spacing=tuple(finger_spacing(hg, cfg.num_finger_placements).tolist()),
        )


def _masked_min(x, m, axis=None):
    return jnp.min(jnp.where(m, x, _POS), axis=axis)


def _masked_max(x, m, axis=None):
    return jnp.max(jnp.where(m, x, _NEG), axis=axis)


def _evaluate_placements(x, y, hcrop, bite, fs, fw, p: SearchParams):
    """evaluateFingers for all 2P placements at a given bite
    (finger_hand.cpp:26-73). x/y: (..., K) hand-frame coords; hcrop: (..., K)
    height-crop-and-validity mask. Returns (fingers (..., 2P), cropped mask)."""
    minx_all, minx_slab = _placement_minima(x, y, hcrop, fs, fw)
    fingers = _placements_at_bite(minx_all, minx_slab, bite, p)
    return fingers, hcrop & (x < bite)


def _placement_minima(x, y, hcrop, fs, fw):
    """Sufficient statistics for every bite test (finger_hand.cpp:26-73):
    because ``crop = hcrop & (x < bite)`` and collisions/aborts are
    existentials over crop, each reduces to comparing a masked min-x against
    the bite. One (..., 2P, K) reduction replaces the per-depth slab scans.

    Returns (minx_all (...,), minx_slab (..., 2P)): min hand-frame x over the
    height-cropped points, and over those inside each finger slab.
    """
    minx_all = _masked_min(x, hcrop, axis=-1)
    in_slab = hcrop[..., None, :] & (y[..., None, :] > fs[:, None]) & \
        (y[..., None, :] < (fs + fw)[:, None])             # (..., 2P, K)
    minx_slab = _masked_min(x[..., None, :], in_slab, axis=-1)
    return minx_all, minx_slab


def _placements_at_bite(minx_all, minx_slab, bite, p: SearchParams):
    """fingers(..., 2P) at a given bite from the min-x statistics:
    any_crop = exists x < bite; abort = exists x < bite - depth;
    collision(p) = exists slab-p point with x < bite."""
    any_crop = minx_all < bite
    abort = minx_all < bite - p.hand_depth
    coll = minx_slab < bite
    return (any_crop & ~abort)[..., None] & ~coll


def _middle_placement(hand_ok):
    """chooseMiddleHand (finger_hand.cpp:89-105): index
    hand_idx[ceil(n/2)-1] of the valid placements."""
    cnt = jnp.sum(hand_ok, axis=-1)
    target = (cnt + 1) // 2                        # ceil(cnt/2)
    cs = jnp.cumsum(hand_ok, axis=-1)
    sel = hand_ok & (cs == target[..., None])
    return jnp.argmax(sel, axis=-1).astype(jnp.int32)


def _antipodal_label(x, y, z, ny, closing, p: SearchParams):
    """Antipodal::evaluateGrasp on the closing-region point set
    (antipodal.cpp:10-96). lateral=y, forward=x, vertical=z; closing normals
    are hand-frame; l=(0,-1,0), r=(0,1,0). Returns (full, half)."""
    any_close = jnp.any(closing, axis=-1)
    min_y = _masked_min(y, closing, axis=-1) + 0.003
    max_y = _masked_max(y, closing, axis=-1) - 0.003
    cone_l = (-ny) > p.friction_cos
    cone_r = ny > p.friction_cos
    left = closing & cone_l & (y < min_y[..., None])
    right = closing & cone_r & (y > max_y[..., None])
    any_l = jnp.any(left, axis=-1)
    any_r = jnp.any(right, axis=-1)
    half = any_l | any_r

    top_x = jnp.minimum(_masked_max(x, left, axis=-1),
                        _masked_max(x, right, axis=-1))
    bot_x = jnp.maximum(_masked_min(x, left, axis=-1),
                        _masked_min(x, right, axis=-1))
    top_z = jnp.minimum(_masked_max(z, left, axis=-1),
                        _masked_max(z, right, axis=-1))
    bot_z = jnp.maximum(_masked_min(z, left, axis=-1),
                        _masked_min(z, right, axis=-1))
    in_box = (x >= bot_x[..., None]) & (x <= top_x[..., None]) & \
             (z >= bot_z[..., None]) & (z <= top_z[..., None])
    nl = jnp.sum(left & in_box, axis=-1)
    nr = jnp.sum(right & in_box, axis=-1)
    full = any_l & any_r & (nl >= p.min_viable) & (nr >= p.min_viable)
    return full, half & any_close


def _eval_orientations(rel, nrm, nvalid, frames, rfix, p: SearchParams):
    """Evaluate EVERY (axis, orientation) slot for all samples in one fused
    batch — no sequential orientation loop, so the VPU sees one large
    (M, S, K) program instead of M small ones.

    rel: (S, K, 3) neighbor offsets from sample; nrm: (S, K, 3) normals;
    nvalid: (S, K); frames: (S, 3, 3); rfix: (M, 3, 3) static rotations.
    Implements hand_set.cpp:49-116 + finger_hand.cpp + antipodal labeling.
    deepenHand's break-on-first-failure scan collapses to closed form via
    the min-x statistics (see _placement_minima): the hand stays collision-
    free up to depth Dmax = min(minx_slab_l, minx_slab_r, minx_all + depth),
    and needs a cropped point at the first step (d0 > minx_all).
    """
    R = jnp.einsum("sij,mjk->msik", frames, rfix,
                   precision=jax.lax.Precision.HIGHEST)   # (M, S, 3, 3)
    pts = jnp.einsum("skj,msji->mski", rel, R,
                     precision=jax.lax.Precision.HIGHEST)  # hand-frame points
    nh = jnp.einsum("skj,msji->mski", nrm, R,
                    precision=jax.lax.Precision.HIGHEST)   # hand-frame normals
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    ny = nh[..., 1]

    hcrop = nvalid[None] & (z > -p.hand_height) & (z < p.hand_height)

    fs = jnp.asarray(p.spacing, jnp.float32)
    fw = jnp.float32(p.finger_width)
    P = p.num_placements

    minx_all, minx_slab = _placement_minima(x, y, hcrop, fs, fw)
    fingers = _placements_at_bite(minx_all, minx_slab,
                                  jnp.float32(p.init_bite), p)
    hand_ok = fingers[..., :P] & fingers[..., P:]        # (M, S, P)
    valid0 = jnp.any(hand_ok, axis=-1)
    mid = _middle_placement(hand_ok)                     # (M, S)

    minx_l = jnp.take_along_axis(minx_slab, mid[..., None],
                                 axis=-1)[..., 0]
    minx_r = jnp.take_along_axis(minx_slab, (mid + P)[..., None],
                                 axis=-1)[..., 0]
    fs_l = fs[mid]                                       # left slab start
    fs_r = fs[mid + P]                                   # right slab start

    if p.deepen_hand and len(p.depths) > 0:
        # deepenHand (finger_hand.cpp:107-139): ok(d) factors into a
        # monotone-increasing condition (any cropped point: d > minx_all,
        # decided at the first step) and monotone-decreasing ones
        # (no collision/abort: d <= Dmax), so the cumulative-AND survivor
        # count is just #{depths <= Dmax}, gated on the first step.
        depths = jnp.asarray(p.depths, jnp.float32)      # (T,)
        dmax = jnp.minimum(jnp.minimum(minx_l, minx_r),
                           minx_all + p.hand_depth)      # (M, S)
        first_ok = depths[0] > minx_all
        n_alive = jnp.where(
            first_ok,
            jnp.sum(depths[:, None, None] <= dmax[None], axis=0), 0)
        top = jnp.where(n_alive > 0, depths[jnp.maximum(n_alive - 1, 0)],
                        jnp.float32(p.init_bite))
    else:
        top = jnp.full(x.shape[:2], p.init_bite, jnp.float32)

    bottom = top - p.hand_depth
    left = fs_l + fw
    right = fs_r
    center = 0.5 * (left + right)

    closing = hcrop & (x > bottom[..., None]) & (x < top[..., None]) & \
        (y > left[..., None]) & (y < right[..., None])
    any_closing = jnp.any(closing, axis=-1)
    valid = valid0 & any_closing

    width = _masked_max(y, closing, axis=-1) - _masked_min(y, closing, axis=-1)
    width = jnp.where(valid, width, 0.0)

    full, half = _antipodal_label(x, y, z, ny, closing, p)

    # Hand pose (hand.cpp:41-45): position = frame * [bottom, center, 0]^T + s.
    pos_local = jnp.stack(
        [bottom, center, jnp.zeros_like(bottom)], axis=-1)   # (M, S, 3)
    pos_world = jnp.einsum("msij,msj->msi", R, pos_local,
                           precision=jax.lax.Precision.HIGHEST)

    return dict(R=R, pos=pos_world, top=top, bottom=bottom, center=center,
                width=width, mid=mid, valid=valid,
                full=full & valid, half=half & valid)


@functools.partial(jax.jit, static_argnames=("params", "k"))
def _search_kernel(points, normals, pmask, sample_pos, frames, frame_valid,
                   radius, rfix, params: SearchParams, k: int):
    S = sample_pos.shape[0]
    M = rfix.shape[0]
    # The bench workload (S=500) runs as a single block; big scenes (e.g.
    # table_mug at 5000 samples x 8k points) scan over sample blocks. For
    # very large K (identity search on >32k-point clouds) the block shrinks
    # below 128 — down to 8-row (sublane-aligned) blocks — so the uncapped
    # identity path scales to any cloud size at a bounded working set
    # instead of falling back to a lossy nearest-K cap (the repo's own
    # on-chip A/B measured 104 flipped candidates at cap 4096 on a 16k
    # cloud, NEIGHBORS_TPU.md).
    budget = _BLOCK_ELEMS // max(M * k, 1)
    if budget >= 128:
        blk = max(128, min(_ceil128(S), budget & ~127))
    else:
        blk = max(8, budget & ~7)
    nblk = -(-S // blk)

    def eval_block(spos_b, fval_b, frames_b):
        if k >= points.shape[0]:
            # Whole-cloud neighborhoods: broadcast instead of gathering —
            # TPU gathers are lane-bound while broadcasts fuse.
            nvalid, _ = radius_mask(spos_b, fval_b, points, pmask, radius)
            rel = points[None, :, :] - spos_b[:, None, :]
            nrm = jnp.broadcast_to(normals[None, :, :], rel.shape)
        else:
            # exact=True: approx_min_k recall < 1 here could silently drop
            # in-radius collision/contact points from the finger tests
            # (the reference's kd-tree search is uncapped and exact,
            # hand_search.cpp:29-31).
            idx, nvalid = radius_neighbors(spos_b, fval_b, points, pmask,
                                           radius=radius, k=k, exact=True)
            rel = points[idx] - spos_b[:, None, :]
            nrm = normals[idx]
        return _eval_orientations(rel, nrm, nvalid, frames_b, rfix, params)

    if nblk == 1:
        return eval_block(sample_pos, frame_valid, frames)

    # Valid-first sample ordering: blocks past the valid-sample count are
    # all-padding and lax.cond skips their whole (M, blk, K) evaluation.
    # Big-scene sample sets are often sparse (e.g. table_mug's above-plane
    # pool holds ~2k of the 5k requested samples), and the reference would
    # spend the difference on with-replacement duplicates (cloud.cpp:382)
    # rather than new work. Identity when every sample is valid (the stable
    # argsort of an all-False key is the identity permutation).
    order = jnp.argsort(~frame_valid, stable=True)
    inv_order = jnp.argsort(order)
    spos_o = sample_pos[order]
    fval_o = frame_valid[order]
    frames_o = frames[order]
    n_valid = jnp.sum(frame_valid)

    pad = nblk * blk - S
    spos_p = jnp.pad(spos_o, ((0, pad), (0, 0)), constant_values=1e6)
    fval_p = jnp.pad(fval_o, (0, pad))
    frames_p = jnp.pad(frames_o, ((0, pad), (0, 0), (0, 0)))

    def dead_block(args):
        z = jnp.zeros((M, blk), jnp.float32)
        zb = jnp.zeros((M, blk), bool)
        return dict(R=jnp.zeros((M, blk, 3, 3), jnp.float32),
                    pos=jnp.zeros((M, blk, 3), jnp.float32),
                    top=z, bottom=z, center=z, width=z,
                    mid=jnp.zeros((M, blk), jnp.int32),
                    valid=zb, full=zb, half=zb)

    def blk_fn(args):
        b = args[0]
        return jax.lax.cond(
            b * blk < n_valid,
            lambda a: eval_block(a[1], a[2], a[3]),
            dead_block, args)

    out = jax.lax.map(
        blk_fn,
        (jnp.arange(nblk), spos_p.reshape(nblk, blk, 3),
         fval_p.reshape(nblk, blk), frames_p.reshape(nblk, blk, 3, 3)))
    # (nblk, M, blk, ...) -> (M, S, ...) then un-permute to caller order.
    merged = {kk: jnp.moveaxis(v, 0, 1).reshape((M, nblk * blk) + v.shape[3:])
              [:, :S] for kk, v in out.items()}
    return {kk: v[:, inv_order] for kk, v in merged.items()}


def search_hands(cloud, sample_pos: jax.Array, sample_mask: jax.Array,
                 cfg: DetectorConfig) -> Grasps:
    """Full candidate search: frames assumed already estimated by caller via
    ops.frames.estimate_frames; this wrapper runs both stages.
    Returns a flat Grasps batch of size S * num_axes * num_orientations, laid
    out sample-major then (axis, orientation) — the reference's HandSet order
    (hand_set.cpp:31-47)."""
    from gpd_tpu.ops.frames import estimate_frames

    frames, fvalid = estimate_frames(
        sample_pos, sample_mask, cloud.points, cloud.mask, cloud.normals,
        radius=cfg.nn_radius_frames, k=cfg.frame_neighbors_cap)

    return search_hands_with_frames(cloud, sample_pos, frames, fvalid, cfg)


def search_hands_with_frames(cloud, sample_pos, frames, fvalid,
                             cfg: DetectorConfig) -> Grasps:
    params = SearchParams.from_config(cfg)
    rgrid = rotation_grid(cfg.angles, cfg.hand_axes)

    out = _search_kernel(cloud.points, cloud.normals, cloud.mask,
                         sample_pos, frames, fvalid,
                         jnp.float32(cfg.hand_search_radius),
                         jnp.asarray(rgrid), params,
                         cfg.search_neighbors_cap)

    S = sample_pos.shape[0]
    M = rgrid.shape[0]

    def flat(a):
        # (M, S, ...) -> (S, M, ...) -> (S*M, ...)
        moved = jnp.moveaxis(a, 0, 1)
        return moved.reshape((S * M,) + moved.shape[2:])

    sample_rep = jnp.repeat(sample_pos, M, axis=0)
    sample_ids = jnp.repeat(jnp.arange(S, dtype=jnp.int32), M)

    return Grasps(
        position=flat(out["pos"]) + sample_rep,
        orientation=flat(out["R"]),
        sample=sample_rep,
        width=flat(out["width"]),
        score=jnp.zeros(S * M, jnp.float32),
        bottom=flat(out["bottom"]),
        top=flat(out["top"]),
        center=flat(out["center"]),
        finger_placement=flat(out["mid"]),
        full_antipodal=flat(out["full"]),
        half_antipodal=flat(out["half"]),
        valid=flat(out["valid"]),
        sample_id=sample_ids,
    )


@functools.partial(jax.jit, static_argnames=("params", "k", "block"))
def _reevaluate_kernel(points, normals, pmask, g_sample, g_R, g_top, g_mid,
                       g_valid, radius, params: SearchParams, k: int,
                       block: int = 512):
    """HandSearch::reevaluateHypotheses (hand_search.cpp:66-134,190-228):
    re-check stored grasps against a (ground-truth) cloud at their stored
    finger placement index and stored top depth. Scans over grasp blocks so
    the (B, K) neighborhood working set stays bounded for any mesh size /
    neighbor cap (dense scene meshes at K ~ 12k OOM'd unblocked)."""
    G = g_sample.shape[0]
    if G > block:
        nblk = -(-G // block)
        pad = nblk * block - G

        def p(a, cv=0):
            widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=cv).reshape(
                (nblk, block) + a.shape[1:])

        def body(carry, blk):
            s, R, top, mid, valid = blk
            return carry, _reevaluate_kernel(
                points, normals, pmask, s, R, top, mid, valid, radius,
                params, k, block)

        _, (full, half) = jax.lax.scan(
            body, None, (p(g_sample, 1e6), p(g_R), p(g_top), p(g_mid),
                         p(g_valid, False)))
        return full.reshape(-1)[:G], half.reshape(-1)[:G]

    # exact=True: ground-truth labeling must see every in-radius point
    # (mesh clouds are dense; a dropped contact point flips a label).
    idx, nvalid = radius_neighbors(g_sample, g_valid, points, pmask,
                                   radius=radius, k=k, exact=True)
    rel = points[idx] - g_sample[:, None, :]
    nrm = normals[idx]
    pts = jnp.einsum("gkj,gji->gki", rel, g_R, precision=jax.lax.Precision.HIGHEST)
    nh = jnp.einsum("gkj,gji->gki", nrm, g_R, precision=jax.lax.Precision.HIGHEST)
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    ny = nh[..., 1]
    hcrop = nvalid & (z > -params.hand_height) & (z < params.hand_height)

    fs = jnp.asarray(params.spacing, jnp.float32)
    fw = jnp.float32(params.finger_width)
    P = params.num_placements
    bite = g_top
    fs_l = fs[g_mid]
    fs_r = fs[g_mid + P]

    crop = hcrop & (x < bite[:, None])
    abort = jnp.any(hcrop & (x < (bite - params.hand_depth)[:, None]), axis=-1)
    any_crop = jnp.any(crop, axis=-1)
    coll_l = jnp.any(crop & (y > fs_l[:, None]) & (y < (fs_l + fw)[:, None]),
                     axis=-1)
    coll_r = jnp.any(crop & (y > fs_r[:, None]) & (y < (fs_r + fw)[:, None]),
                     axis=-1)
    feasible = any_crop & ~abort & ~coll_l & ~coll_r & jnp.any(nvalid, axis=-1)

    bottom = bite - params.hand_depth
    left = fs_l + fw
    right = fs_r
    closing = hcrop & (x > bottom[:, None]) & (x < bite[:, None]) & \
        (y > left[:, None]) & (y < right[:, None])
    has_close = jnp.any(closing, axis=-1)

    full, half = _antipodal_label(x, y, z, ny, closing, params)
    ok = feasible & has_close & g_valid
    return ok & full, ok & half


def reevaluate_hypotheses(cloud, grasps: Grasps, cfg: DetectorConfig):
    """Returns (labels (G,) int32 1=full-antipodal, updated Grasps)."""
    params = SearchParams.from_config(cfg)
    full, half = _reevaluate_kernel(
        cloud.points, cloud.normals, cloud.mask, grasps.sample,
        grasps.orientation, grasps.top, grasps.finger_placement,
        grasps.valid, jnp.float32(cfg.hand_search_radius), params,
        cfg.search_neighbors_cap)
    labels = full.astype(jnp.int32)
    new = dataclasses.replace(grasps, full_antipodal=full, half_antipodal=half)
    return labels, new
