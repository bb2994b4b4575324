"""Grasp detection pipeline orchestration.

TPU-native equivalent of the reference's ``GraspDetector``
(reference: src/gpd/grasp_detector.cpp): preprocessing runs as device kernels
with one host compaction; the detection core — local frames, hand search,
filters, candidate compaction, descriptor extraction, CNN scoring — is a
single jitted fixed-shape XLA program (``detect_core``), so the whole
cloud -> scored-grasps path stays on-chip.

Stage timing is reported in the reference's format
(grasp_detector.cpp:313-320).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gpd_tpu.config import DetectorConfig, load_config
from gpd_tpu.core.types import CloudArrays, Grasps, _next_size
from gpd_tpu import select as sel
from gpd_tpu.net import lenet
from gpd_tpu.ops import candidates as cand
from gpd_tpu.ops import images as img
from gpd_tpu.ops import preprocess as pp
from gpd_tpu.ops.frames import estimate_frames
from gpd_tpu.ops import neighbors as nbr
from gpd_tpu.ops.neighbors import radius_mask, radius_neighbors
from gpd_tpu.ops.normals import (estimate_normals, refine_normals,
                                 reverse_normals_cloud)


@functools.partial(jax.jit, static_argnames=("workspace", "cell_size",
                                             "do_voxel"))
def _prep_filter_voxel(cloud: CloudArrays, workspace, cell_size: float,
                       do_voxel: bool) -> CloudArrays:
    """Fused workspace filter + voxel downsample (one compile: on remote-
    compile TPU backends every eager op costs a compilation round-trip)."""
    cloud = pp.filter_workspace(cloud, workspace)
    if do_voxel:
        cloud = pp.voxelize(cloud, cell_size)
    return cloud


@functools.partial(jax.jit, static_argnames=("radius", "k", "do_estimate",
                                             "refine_k", "flip"))
def _prep_normals(cloud: CloudArrays, radius: float, k: int,
                  do_estimate: bool, refine_k: int, flip: bool) -> CloudArrays:
    """Fused normal estimation + reverse pass + optional refinement/flip."""
    if do_estimate:
        cloud = estimate_normals(cloud, radius, k=k)
    cloud = reverse_normals_cloud(cloud)
    if refine_k > 0:
        refined = refine_normals(cloud.points, cloud.normals, cloud.mask,
                                 k=refine_k)
        cloud = dataclasses.replace(cloud, normals=refined)
    if flip:
        cloud = dataclasses.replace(cloud, normals=-cloud.normals)
    return cloud


@functools.partial(jax.jit, static_argnames=("num_samples",
                                             "above_plane"))
def _sample_kernel(cloud: CloudArrays, key, num_samples: int,
                   above_plane: bool):
    pool = cloud.mask
    if above_plane:
        pool = pp.sample_above_plane(cloud, jax.random.fold_in(key, 3))
    idx, valid = pp.subsample_uniform(jax.random.fold_in(key, 4), pool,
                                      num_samples)
    pos = jnp.where(valid[:, None], cloud.points[idx], 1e6)
    return pos, valid


def _sync(x):
    """Synchronize on a computation via a device->host fetch of one element
    (block_until_ready can return early on the axon backend, CLAUDE.md)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])
    return x


_SERVE_BUCKETS = (2048, 4096, 8192, 16384, 32768, 65536, 131072)


def serve_capacity(n_points: int) -> int:
    """Coarse power-of-two capacity bucket for SERVING entry points
    (detect_file / the CLI apps): a robot loop sees a different cloud size
    every frame, and the snug `_next_size` buckets (~12.5% apart) would
    recompile the whole fused pipeline at each boundary crossing (tens of
    seconds per compile on remote backends). One bucket per octave bounds
    warm-up to a handful of compiles for the lifetime of the process, at a
    bounded padding cost. Batch jobs that control their inputs should keep
    pinning exact capacities instead (tools/gen_dataset.py)."""
    for b in _SERVE_BUCKETS:
        if n_points <= b:
            return b
    return _next_size(n_points)


def _compact_hands(grasps: Grasps, cap: int) -> Grasps:
    """Device-side compaction: bring valid hands to the front (stable), keep
    ``cap`` slots. Mirrors the reference's createImageList compaction
    (image_generator.cpp:91-98) without leaving the device."""
    order = jnp.argsort(~grasps.valid, stable=True)
    g = grasps.take(order[:cap])
    return g


@functools.partial(jax.jit, static_argnames=("cfg",))
def candidates_stage(cloud: CloudArrays, sample_pos: jax.Array,
                     sample_mask: jax.Array, cfg: DetectorConfig) -> Grasps:
    """Steps 1-2 of detectGrasps: frames -> hand search -> filters
    (grasp_detector.cpp:192-258). Jitted on its own so the staged-timing
    path can report candidate generation separately; inside detect_core it
    inlines into the fused program."""
    frames, fvalid = estimate_frames(
        sample_pos, sample_mask, cloud.points, cloud.mask, cloud.normals,
        radius=cfg.nn_radius_frames, k=cfg.frame_neighbors_cap)
    grasps = cand.search_hands_with_frames(cloud, sample_pos, frames, fvalid,
                                           cfg)

    hg = cfg.hand_geometry
    grasps = sel.filter_grasps_workspace(
        grasps, cfg.workspace_grasps, cfg.min_aperture, cfg.max_aperture,
        hg.outer_diameter, hg.depth)
    if cfg.filter_approach_direction:
        grasps = sel.filter_grasps_direction(grasps, cfg.direction,
                                             cfg.thresh_rad)
    return grasps


def _image_point_mask(cloud: CloudArrays, key: jax.Array,
                      cfg: DetectorConfig) -> jax.Array:
    """Cloud-level point mask for descriptor extraction: optional RANSAC
    plane removal (image_generator.cpp:101-129). Shared by every sample."""
    img_mask = cloud.mask
    if cfg.remove_plane_before_image_calculation:
        inl, _ = pp.fit_plane_ransac(cloud.points, cloud.mask,
                                     jax.random.fold_in(key, 1))
        img_mask = cloud.mask & ~inl
    return img_mask


def _per_sample_inputs(cloud: CloudArrays, img_mask: jax.Array,
                       sample_pos: jax.Array, sample_mask: jax.Array,
                       key: jax.Array, cfg: DetectorConfig,
                       sample_uid=None):
    """Per-sample descriptor inputs for one block of samples: image-radius
    neighborhoods + shadow point sets (image_generator.cpp:17-70).

    ``sample_uid`` (optional (S,) int32) keys each sample's shadow jitter by
    its ORIGINAL index, so results are invariant to the active-first
    permutation and blocking of the sample axis."""
    # Per-sample image-radius neighborhoods, shared by the sample's hands
    # (image_generator.cpp:42-64). When the cap covers the cloud, use
    # identity neighborhoods (whole cloud + in-radius mask): per-chunk
    # (G, K, 3) point/normal gathers become broadcasts, which fuse — TPU
    # gathers are lane-bound. Otherwise nearest-K keeps the closest points,
    # which cover the (much smaller) image volume.
    k_img = min(cfg.image_neighbors_cap, cloud.points.shape[0])
    identity_nn = k_img >= cloud.points.shape[0]
    if identity_nn:
        nn_valid, nn_d2 = radius_mask(sample_pos, sample_mask, cloud.points,
                                      img_mask, cfg.image_radius)
        nn_idx = None
    else:
        # exact=True: on-chip A/B (tools/check_neighbors_tpu.py,
        # NEIGHBORS_TPU.md) measured approx_min_k recall 0.95 here at
        # 3/10 top-10 overlap vs exact on table_mug for a ~1% latency
        # difference — exactness is effectively free now that frames and
        # normals use the moment-matmul path instead of nearest-K.
        nn_idx, nn_valid = radius_neighbors(
            sample_pos, sample_mask, cloud.points, img_mask,
            radius=cfg.image_radius, k=k_img, exact=True)
        nn_d2 = None

    if cfg.image_geometry.num_channels == 15:
        # Shadow sources: up to shadow_source_cap of the nearest neighborhood
        # points (occupied-voxel sets saturate quickly, so capping the ray
        # sources bounds the dedup-sort cost with negligible occupancy
        # change). exact=True keeps source selection identical across
        # backends (free: the chip-side cost difference is noise,
        # NEIGHBORS_TPU.md).
        sc = min(cfg.shadow_source_cap, nn_valid.shape[1])
        if sc < nn_valid.shape[1]:
            if nn_d2 is None:
                nn_d2 = jnp.sum(
                    (sample_pos[:, None, :] - cloud.points[nn_idx]) ** 2,
                    axis=-1)
            negd, src_pos = nbr.select_max_k(
                jnp.where(nn_valid, -nn_d2, -jnp.inf), sc, exact=True)
            src_idx = (src_pos if identity_nn
                       else jnp.take_along_axis(nn_idx, src_pos, axis=1))
            src_valid = negd > -jnp.inf
        elif identity_nn:
            src_idx = jnp.broadcast_to(
                jnp.arange(nn_valid.shape[1], dtype=jnp.int32),
                nn_valid.shape)
            src_valid = nn_valid
        else:
            src_idx, src_valid = nn_idx, nn_valid
        shadow_pts, shadow_valid = img.compute_shadows(
            jax.random.fold_in(key, 2), cloud.points[src_idx], src_valid,
            cloud.cam_source[src_idx], cloud.view_points,
            jnp.float32(img.shadow_length_of(cfg.image_geometry)),
            n_sp=img.num_shadow_points(cfg.image_geometry),
            v_cap=cfg.shadow_voxel_cap, sample_uid=sample_uid)
    else:
        shadow_pts = shadow_valid = None
    return nn_idx, nn_valid, shadow_pts, shadow_valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def image_inputs_stage(cloud: CloudArrays, sample_pos: jax.Array,
                       sample_mask: jax.Array, key: jax.Array,
                       cfg: DetectorConfig):
    """Shared per-sample descriptor inputs (image_generator.cpp:17-70):
    optional plane removal, image-radius neighborhoods, shadow point sets.

    Returns (nn_idx | None if identity neighborhoods, nn_valid, shadow_pts,
    shadow_valid)."""
    img_mask = _image_point_mask(cloud, key, cfg)
    return _per_sample_inputs(cloud, img_mask, sample_pos, sample_mask, key,
                              cfg)


# Sample-block size for the active-sample-compacted descriptor-input path:
# big scenes (e.g. table_mug at 5000 samples) typically have valid hands at
# only a fraction of the samples, and the per-sample shadow dedup sort +
# neighborhood top_k are the dominant imaging costs — so samples are
# reordered active-first and whole inactive blocks are skipped by lax.cond.
_SAMPLE_BLOCK = 512


@functools.partial(jax.jit, static_argnames=("cfg", "block"))
def _image_inputs_blocked(cloud: CloudArrays, sample_pos: jax.Array,
                          sample_mask: jax.Array, sample_uid: jax.Array,
                          n_active: jax.Array, key: jax.Array,
                          cfg: DetectorConfig, block: int):
    """_per_sample_inputs over sample blocks, skipping blocks past the
    active count (callers order samples active-first). ``sample_uid`` holds
    each row's ORIGINAL sample index so shadow jitter is invariant to the
    permutation/blocking. Returns the same tuple as image_inputs_stage."""
    img_mask = _image_point_mask(cloud, key, cfg)
    S = sample_pos.shape[0]
    nblk = -(-S // block)
    pad = nblk * block - S
    spos = jnp.pad(sample_pos, ((0, pad), (0, 0)), constant_values=1e6)
    smask = jnp.pad(sample_mask, (0, pad))
    suid = jnp.pad(sample_uid, (0, pad))
    identity_nn = min(cfg.image_neighbors_cap,
                      cloud.points.shape[0]) >= cloud.points.shape[0]
    with_shadows = cfg.image_geometry.num_channels == 15

    def live(args):
        b, sp, sm, su = args
        out = _per_sample_inputs(cloud, img_mask, sp, sm, key, cfg,
                                 sample_uid=su)
        nn_idx, nn_valid, spts, svalid = out
        res = (nn_valid,) if identity_nn else (nn_idx, nn_valid)
        if with_shadows:
            res = res + (spts, svalid)
        return res

    def dead(args):
        b, sp, sm, su = args
        k_img = min(cfg.image_neighbors_cap, cloud.points.shape[0])
        nn_valid = jnp.zeros(
            (block, cloud.points.shape[0] if identity_nn else k_img), bool)
        res = ((nn_valid,) if identity_nn
               else (jnp.zeros((block, k_img), jnp.int32), nn_valid))
        if with_shadows:
            v_cap = min(cfg.shadow_voxel_cap,
                        min(cfg.shadow_source_cap, k_img)
                        * img.num_shadow_points(cfg.image_geometry))
            res = res + (jnp.zeros((block, v_cap, 3), jnp.float32),
                         jnp.zeros((block, v_cap), bool))
        return res

    def blk_fn(args):
        b = args[0]
        return jax.lax.cond(b * block < n_active, live, dead, args)

    out = jax.lax.map(blk_fn, (jnp.arange(nblk),
                               spos.reshape(nblk, block, 3),
                               smask.reshape(nblk, block),
                               suid.reshape(nblk, block)))
    out = [a.reshape((nblk * block,) + a.shape[2:])[:S] for a in out]
    i = 0
    if identity_nn:
        nn_idx, nn_valid = None, out[0]
        i = 1
    else:
        nn_idx, nn_valid = out[0], out[1]
        i = 2
    if with_shadows:
        shadow_pts, shadow_valid = out[i], out[i + 1]
    else:
        shadow_pts = shadow_valid = None
    return nn_idx, nn_valid, shadow_pts, shadow_valid


def _sample_activity(grasps: Grasps, num_samples: int,
                     canonical: bool) -> jax.Array:
    """(S,) bool: sample has >= 1 valid candidate.

    ``canonical=True`` asserts (statically, from the caller) that the batch
    is the hand search's sample-major layout (sample_id ==
    repeat(arange(S), M)) and takes a scatter-free reshape; any other batch
    — compacted, reordered, or merely divisible-capacity — must use the
    segment reduce (a reshape on a reordered batch would assign activity
    bits to the wrong samples)."""
    cap = grasps.capacity
    if canonical and cap % num_samples == 0:
        m = cap // num_samples
        return jnp.any(grasps.valid.reshape(num_samples, m), axis=1)
    seg = jax.ops.segment_max(grasps.valid.astype(jnp.int32),
                              grasps.sample_id, num_segments=num_samples)
    return seg > 0


@functools.partial(jax.jit, static_argnames=("cfg", "canonical"))
def _descriptor_inputs(cloud: CloudArrays, grasps: Grasps,
                       sample_pos: jax.Array, sample_mask: jax.Array,
                       key: jax.Array, cfg: DetectorConfig,
                       canonical: bool = False):
    """Descriptor inputs with active-sample compaction for big sample sets.

    ``canonical`` (static): caller guarantees ``grasps`` is the hand
    search's sample-major layout (see _sample_activity).

    Returns (nn_idx, nn_valid, shadow_pts, shadow_valid, sid_map) where
    sid_map (or None) remaps grasp sample ids into the reordered sample
    axis of the returned per-sample tensors."""
    S = sample_pos.shape[0]
    if S <= _SAMPLE_BLOCK:
        out = image_inputs_stage(cloud, sample_pos, sample_mask, key, cfg)
        return out + (None,)
    active = _sample_activity(grasps, S, canonical) & sample_mask
    sorder = jnp.argsort(~active, stable=True)
    sid_map = jnp.argsort(sorder)          # old sample id -> new row
    spos2 = sample_pos[sorder]
    smask2 = sample_mask[sorder] & active[sorder]
    nn_idx, nn_valid, spts, svalid = _image_inputs_blocked(
        cloud, spos2, smask2, sorder.astype(jnp.int32), jnp.sum(active),
        key, cfg, _SAMPLE_BLOCK)
    return nn_idx, nn_valid, spts, svalid, sid_map


@functools.partial(jax.jit, static_argnames=("cfg",))
def _images_for(cloud: CloudArrays, g: Grasps, nn_idx, nn_valid,
                shadow_pts, shadow_valid, cfg: DetectorConfig,
                sid_map=None) -> jax.Array:
    """Rasterize grasp images for an (already compacted) batch of hands
    (createImageList, image_generator.cpp:72-99). ``sid_map`` remaps grasp
    sample ids into a reordered per-sample tensor axis (active-sample
    compaction path)."""
    identity_nn = nn_idx is None
    sid = g.sample_id if sid_map is None else sid_map[g.sample_id]
    h_nvalid = nn_valid[sid] & g.valid[:, None]
    if identity_nn:
        # SHARED neighborhood: pass the (N, 3) cloud arrays unexpanded;
        # make_images factors the per-hand transform as R^T p - R^T s so
        # the cloud is never broadcast per hand (the materialized
        # (G, N, 3) broadcast copies cost ~1.6 ms/chunk in traces).
        h_pts = cloud.points
        h_nrm = cloud.normals
    else:
        h_idx = nn_idx[sid]
        h_pts = cloud.points[h_idx]
        h_nrm = cloud.normals[h_idx]
    return img.make_images(
        h_pts, h_nrm, h_nvalid, g.orientation, g.sample, g.bottom,
        g.center, g.valid, cfg.image_geometry,
        shadow_pts=None if shadow_pts is None else shadow_pts[sid],
        shadow_valid=None if shadow_valid is None else shadow_valid[sid])


@functools.partial(jax.jit, static_argnames=("cfg", "image_cap"))
def descriptors_stage(cloud: CloudArrays, grasps: Grasps, nn_idx, nn_valid,
                      shadow_pts, shadow_valid, cfg: DetectorConfig,
                      image_cap: int) -> Tuple[Grasps, jax.Array]:
    """Step 3 alone (createImages, grasp_detector.cpp:260-265) for the
    staged-timing path: valid-first compaction to ``image_cap`` hands, one
    rasterization pass. Returns (compacted Grasps, images)."""
    g = _compact_hands(grasps, image_cap)
    images = _images_for(cloud, g, nn_idx, nn_valid, shadow_pts,
                         shadow_valid, cfg)
    return g, images


@functools.partial(jax.jit, static_argnames=("padded",))
def _order_valid_first(grasps: Grasps, padded: int) -> Grasps:
    """Reorder valid-first (stable) and pad to ``padded`` slots with invalid
    entries, so fixed-size chunks cover every candidate."""
    total = grasps.capacity
    order = jnp.argsort(~grasps.valid, stable=True)
    order = jnp.pad(order, (0, padded - total))
    g_all = grasps.take(order)
    if padded > total:
        g_all = dataclasses.replace(
            g_all, valid=g_all.valid & (jnp.arange(padded) < total))
    return g_all


@functools.partial(jax.jit, static_argnames=("cap",))
def _slice_grasps(g_all: Grasps, start, cap: int) -> Grasps:
    """One-compile chunk slicer (start is traced, so every chunk index
    reuses the same program)."""
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, start, cap, 0), g_all)


@functools.partial(jax.jit, static_argnames=("cfg", "image_cap",
                                             "scores_only", "canonical"))
def score_candidates(cloud: CloudArrays, grasps: Grasps,
                     sample_pos: jax.Array, sample_mask: jax.Array, params,
                     key: jax.Array, cfg: DetectorConfig, image_cap: int,
                     scores_only: bool = True,
                     canonical: bool = False) -> Tuple[Grasps, jax.Array]:
    """Images + CNN scores for an *existing* candidate batch — the
    reference's pruneGraspCandidates shape (grasp_detector.cpp:529-552):
    descriptor inputs, valid-first ordering, then image + score in
    fixed-size chunks so the candidate count is unbounded while per-chunk
    memory stays capped. ``sample_pos``/``key`` must be the ones the
    candidates were generated from (neighborhoods and shadows are
    per-sample). ``canonical=True`` asserts the batch is still in the hand
    search's sample-major layout (enables a scatter-free activity reduce).
    Returns (scored Grasps in valid-first order, images)."""
    # 3. Descriptor inputs (plane removal, neighborhoods, shadows), with
    # active-sample compaction for big sample sets.
    nn_idx, nn_valid, shadow_pts, shadow_valid, sid_map = _descriptor_inputs(
        cloud, grasps, sample_pos, sample_mask, key, cfg,
        canonical=canonical)

    total = grasps.capacity
    n_chunks = max(1, -(-total // image_cap))
    g_all = _order_valid_first(grasps, n_chunks * image_cap)

    ig = cfg.image_geometry

    def run_chunk(gc: Grasps):
        images = _images_for(cloud, gc, nn_idx, nn_valid, shadow_pts,
                             shadow_valid, cfg, sid_map)
        scores = lenet.score(params, images)
        if scores_only:
            return (scores,)
        return scores, images

    def skip_chunk(gc: Grasps):
        n = gc.valid.shape[0]
        scores = jnp.full((n,), -jnp.inf, jnp.float32)
        if scores_only:
            return (scores,)
        return scores, jnp.zeros((n, ig.size, ig.size, ig.num_channels),
                                 jnp.uint8)

    def chunk_fn(gc: Grasps):
        # Valid-first ordering means trailing chunks are often all-invalid;
        # cond skips their image/score work entirely.
        return jax.lax.cond(jnp.any(gc.valid), run_chunk, skip_chunk, gc)

    g = g_all
    if n_chunks == 1:
        out = chunk_fn(g)
        scores = out[0]
        images = None if scores_only else out[1]
    elif scores_only:
        # Serving path: a while_loop over LIVE chunks only. The previous
        # lax.map + lax.cond ran a conditional for every chunk — profiler
        # traces showed each *skipped* chunk still costing ~0.8 ms on chip
        # (conditional overhead + operand copies); the while_loop's trip
        # count is the live-chunk count, so dead chunks never execute.
        n_live = (jnp.sum(grasps.valid) + image_cap - 1) // image_cap

        def cond_fn(state):
            return state[0] < n_live

        def body_fn(state):
            i, scores = state
            gc = _slice_grasps(g_all, i * image_cap, image_cap)
            im = _images_for(cloud, gc, nn_idx, nn_valid, shadow_pts,
                             shadow_valid, cfg, sid_map)
            s = lenet.score(params, im)
            return i + 1, jax.lax.dynamic_update_slice(
                scores, s, (i * image_cap,))

        scores0 = jnp.full((n_chunks * image_cap,), -jnp.inf, jnp.float32)
        _, scores = jax.lax.while_loop(cond_fn, body_fn,
                                       (jnp.int32(0), scores0))
        images = None
    else:
        g_chunks = jax.tree_util.tree_map(
            lambda a: a.reshape((n_chunks, image_cap) + a.shape[1:]), g_all)
        out = jax.lax.map(chunk_fn, g_chunks)
        scores = out[0].reshape(-1)
        images = None if scores_only else out[1].reshape(
            (-1,) + out[1].shape[2:])

    # 4. Classification scores attach to the ordered batch
    # (grasp_detector.cpp:267-273).
    g = dataclasses.replace(g, score=jnp.where(g.valid, scores, -jnp.inf))
    return g, images


@functools.partial(jax.jit, static_argnames=("cfg", "image_cap",
                                             "scores_only"))
def detect_core(cloud: CloudArrays, sample_pos: jax.Array,
                sample_mask: jax.Array, params, key: jax.Array,
                cfg: DetectorConfig, image_cap: int,
                scores_only: bool = False) -> Tuple[Grasps, jax.Array]:
    """frames -> candidates -> filters -> images -> CNN scores.

    Returns (scored Grasps in valid-first order, images). With
    ``scores_only=True`` the image tensor is not returned (``None``): the
    serving path never materializes the (G, 60, 60, C) uint8 batch in HBM.
    Pipeline = grasp_detector.cpp:192-273 steps 1-4.
    """
    # 1-2. Candidates + filters.
    grasps = candidates_stage(cloud, sample_pos, sample_mask, cfg)
    return score_candidates(cloud, grasps, sample_pos, sample_mask, params,
                            key, cfg, image_cap, scores_only,
                            canonical=True)


@functools.partial(jax.jit, static_argnames=("cfg",))
def select_and_cluster(grasps: Grasps, cfg: DetectorConfig) -> Grasps:
    """Steps 5-7 of detectGrasps (grasp_detector.cpp:275-311): top-k
    selection, optional clustering with the reference's <=3-clusters
    fallback (append the selected hands), final score-descending sort."""
    # select_top_k truncates to the selected heads: downstream only ever
    # consumes the top num_selected rows, and the O(G^2) clustering runs on
    # the *selected* set like the reference (grasp_detector.cpp:283-295; at
    # 40k candidates the full pairwise matrix alone would be ~6 GB HBM).
    k = min(grasps.capacity, _next_size(cfg.num_selected, 64))
    g, _ = sel.select_top_k(grasps, cfg.num_selected, out_cap=k)
    if cfg.min_inliers > 0:
        clustered = sel.cluster_grasps(g, cfg.min_inliers)
        n_clusters = jnp.sum(clustered.valid)
        keep_originals = n_clusters <= 3
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), clustered, g)
        merged = dataclasses.replace(
            merged,
            valid=jnp.concatenate(
                [clustered.valid, g.valid & keep_originals]))
        return sel.sort_by_score(merged)
    # select_top_k already returned the batch score-descending with only the
    # top-k valid; a final sort_by_score is the identity permutation here.
    return g


class GraspDetector:
    """End-to-end detector (reference: include/gpd/grasp_detector.h)."""

    def __init__(self, config, params=None):
        if isinstance(config, str):
            config = load_config(config)
        self.cfg: DetectorConfig = config
        if params is not None:
            self.params = params
        else:
            C = self.cfg.image_geometry.num_channels
            try:
                if not self.cfg.weights_file:
                    # Empty weights_file means "use the packaged trained
                    # checkpoint" (the reference always ships weights,
                    # eigen_classifier.cpp:28-50); random init is only the
                    # last-resort fallback below.
                    raise FileNotFoundError("no weights_file configured")
                self.params = lenet.load_params(self.cfg.weights_file, C)
            except (FileNotFoundError, ValueError, OSError) as e:
                # Fall back to the packaged trained checkpoint (the
                # reference's models/lenet equivalent; needed e.g. for the
                # reference cfgs whose ip1_weights.bin blob is missing from
                # the snapshot).
                default = lenet.default_params_path(C)
                if os.path.exists(default):
                    print(f"NOTE: {e}; using packaged checkpoint {default}.")
                    self.params = lenet.load_params_npz(default)
                else:
                    print(f"WARNING: could not load classifier weights "
                          f"({e}); using random initialization.")
                    self.params = lenet.init_params(jax.random.PRNGKey(0), C)
        self.last_runtimes = {}

    # ---------------- preprocessing (stack 3.1 preprocess) ----------------

    def preprocess_cloud(self, points: np.ndarray,
                         view_points: Optional[np.ndarray] = None,
                         cam_source: Optional[np.ndarray] = None,
                         normals: Optional[np.ndarray] = None,
                         key: Optional[jax.Array] = None,
                         capacity=None) -> CloudArrays:
        """removeNans -> filterWorkspace -> voxelize -> normals(+reverse)
        -> [refine] (candidates_generator.cpp:14-37). Returns a compacted
        CloudArrays ready for detection.

        ``capacity`` pins the padded size of every stage (batch jobs over
        many clouds compile each kernel once instead of per size bucket).
        ``capacity="serve"`` buckets each stage's padded size per octave
        (serve_capacity): repeat calls with different-sized clouds reuse
        the compiled pipeline instead of recompiling at every ~12.5%
        size-bucket boundary."""
        cfg = self.cfg
        serve = capacity == "serve"
        points = np.asarray(points, np.float32).reshape(-1, 3)
        finite = np.isfinite(points).all(axis=1)
        points = points[finite]
        if normals is not None:
            normals = np.asarray(normals, np.float32).reshape(-1, 3)[finite]
        if cam_source is not None:
            cam_source = np.asarray(cam_source)[..., finite]

        def _compact(c):
            if serve:
                n = int(np.asarray(c.mask).sum())
                return c.compact_host(serve_capacity(n))
            return c.compact_host(capacity)

        cloud = CloudArrays.from_numpy(
            points, view_points=view_points, cam_source=cam_source,
            normals=normals,
            capacity=serve_capacity(len(points)) if serve else capacity)
        cloud = _prep_filter_voxel(cloud, tuple(cfg.workspace),
                                   cfg.voxel_size, cfg.voxelize)
        cloud = _compact(cloud)
        if cfg.remove_outliers:
            cloud = pp.remove_statistical_outliers(cloud)
            cloud = _compact(cloud)
        cloud = _prep_normals(
            cloud, cfg.normals_radius, cfg.normals_neighbors_cap,
            do_estimate=(normals is None or cfg.voxelize),
            refine_k=cfg.refine_normals_k, flip=cfg.centered_at_origin)
        return cloud

    def sample_cloud(self, cloud: CloudArrays,
                     key: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
        """sampleAbovePlane? -> subsample(num_samples) -> (positions, mask)."""
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        return _sample_kernel(cloud, key, cfg.num_samples,
                              cfg.sample_above_plane)

    # ---------------- detection ----------------

    def image_cap(self, num_samples: int) -> int:
        """Image/score chunk size: small enough that valid-first compaction
        skips the all-invalid tail chunks (the usual case: well under half of
        the raw orientation grid survives the feasibility filters)."""
        cfg = self.cfg
        total = num_samples * cfg.num_orientations * len(cfg.hand_axes)
        return min(_next_size(total, 256), 512)

    def effective_config(self, cloud: CloudArrays) -> DetectorConfig:
        """Clamp the neighbor caps to the cloud's padded capacity: truncated
        search neighborhoods would silently drop collision points (the
        reference's kd-tree search is uncapped), so K must cover the densest
        plausible neighborhood — and any cap >= capacity takes the sort-free
        full-cloud path in radius_neighbors."""
        n = cloud.capacity
        changes = {}
        if self.cfg.search_neighbors_cap > n:
            changes["search_neighbors_cap"] = n
        elif self.cfg.search_neighbors_cap < n <= self.cfg.search_identity_max:
            # Mid-size clouds: identity search neighborhoods (whole cloud +
            # in-radius mask) are both sort-free and UNCAPPED — the
            # reference's exact kd-tree radiusSearch semantics
            # (hand_search.cpp:29-31) with no nearest-K truncation at all.
            changes["search_neighbors_cap"] = n
        # Image neighborhoods: when the cloud is close to (or under) the cap,
        # covering it exactly is cheaper than the nearest-K truncation sort
        # and drops no in-radius point the reference would keep.
        if n <= 1.5 * self.cfg.image_neighbors_cap:
            if self.cfg.image_neighbors_cap != n:
                changes["image_neighbors_cap"] = n
        if changes:
            return dataclasses.replace(self.cfg, **changes)
        return self.cfg

    def detect(self, cloud: CloudArrays,
               sample_pos: Optional[jax.Array] = None,
               sample_mask: Optional[jax.Array] = None,
               key: Optional[jax.Array] = None,
               verbose: bool = True, staged: bool = False,
               staged_cap: Optional[int] = None) -> Grasps:
        """Full detectGrasps pipeline with per-stage timing.

        ``staged=True`` runs the stages as separate device programs so the
        report matches the reference's four-line runtime breakdown
        (grasp_detector.cpp:313-320: candidates / descriptors /
        classification / total) at a small fusion cost; the default keeps
        everything fused in one program and reports the combined number."""
        if staged:
            return self._detect_staged(cloud, sample_pos, sample_mask, key,
                                       verbose, staged_cap)
        from gpd_tpu import profiling
        cfg = self.effective_config(cloud)
        key = key if key is not None else jax.random.PRNGKey(0)
        with profiling.maybe_trace():
            t0 = time.time()
            if sample_pos is None:
                sample_pos, sample_mask = self.sample_cloud(cloud, key)
            cap = self.image_cap(sample_pos.shape[0])

            t_c0 = time.time()
            with profiling.span("detect_core"):
                g, _ = detect_core(cloud, sample_pos, sample_mask,
                                   self.params, key, cfg, cap,
                                   scores_only=True)
                _sync(g)
            t_detect = time.time() - t_c0

            t_s0 = time.time()
            with profiling.span("select_and_cluster"):
                out = select_and_cluster(g, cfg)
                _sync(out)
            t_select = time.time() - t_s0
            t_total = time.time() - t0

        self.last_runtimes = dict(detect=t_detect, select=t_select,
                                  total=t_total)
        if verbose:
            n = int(np.asarray(out.valid).sum())
            print("======== Selected grasps ========")
            scores = np.asarray(out.score)
            valid = np.asarray(out.valid)
            for i in np.nonzero(valid)[0][:10]:
                print(f"Grasp {i}: {scores[i]:.4f}")
            print(f"Selected the {n} best grasps.")
            print("======== RUNTIMES ========")
            print(f" 1. Candidate generation + descriptors + classification:"
                  f" {t_detect:.4f}s")
            print(f" 2. Selection/clustering: {t_select:.4f}s")
            print("==========")
            print(f" TOTAL: {t_total:.4f}s")
        return out

    def _detect_staged(self, cloud: CloudArrays, sample_pos, sample_mask,
                       key, verbose: bool,
                       staged_cap: Optional[int] = None) -> Grasps:
        """Stage-separated detection with the reference's four-line runtime
        report (grasp_detector.cpp:313-320). Images + scores run in
        fixed-size chunks over *all* candidates (matching detect_core's
        coverage; no candidate cap), with per-chunk device->host syncs to
        attribute time to the descriptor vs classification stages."""
        cfg = self.effective_config(cloud)
        key = key if key is not None else jax.random.PRNGKey(0)
        t0 = time.time()
        if sample_pos is None:
            sample_pos, sample_mask = self.sample_cloud(cloud, key)
        total = sample_pos.shape[0] * cfg.num_orientations * len(cfg.hand_axes)
        cap = staged_cap or min(_next_size(total, 256), 4096)
        n_chunks = max(1, -(-total // cap))

        t = time.time()
        grasps = _sync(candidates_stage(cloud, sample_pos, sample_mask, cfg))
        # Valid-first ordering lets the chunk loop stop at the last chunk
        # containing a valid candidate (the tail is all-invalid by
        # construction); one count fetch decides how many chunks run.
        g_all = _order_valid_first(grasps, n_chunks * cap)
        n_valid = int(np.asarray(jnp.sum(g_all.valid)))
        t_cand = time.time() - t

        t = time.time()
        nn_idx, nn_valid, spts, svalid, sid_map = _sync(_descriptor_inputs(
            cloud, grasps, sample_pos, sample_mask, key, cfg,
            canonical=True))
        live_chunks = max(1, -(-n_valid // cap)) if n_valid else 1
        chunk_images = []
        for ci in range(live_chunks):
            gc = _slice_grasps(g_all, ci * cap, cap)
            chunk_images.append(_sync(_images_for(
                cloud, gc, nn_idx, nn_valid, spts, svalid, cfg, sid_map)))
        t_img = time.time() - t

        t = time.time()
        chunk_scores = [_sync(lenet.score(self.params, im))
                        for im in chunk_images]
        t_cls = time.time() - t

        pad = n_chunks * cap - live_chunks * cap
        scores = jnp.concatenate(
            chunk_scores + ([jnp.full((pad,), -jnp.inf, jnp.float32)]
                            if pad else []))
        g = dataclasses.replace(
            g_all, score=jnp.where(g_all.valid, scores, -jnp.inf))
        out = _sync(select_and_cluster(g, cfg))
        t_total = time.time() - t0

        self.last_runtimes = dict(candidates=t_cand, images=t_img,
                                  classify=t_cls, total=t_total)
        if verbose:
            n = int(np.asarray(out.valid).sum())
            print(f"Selected the {n} best grasps.")
            print("======== RUNTIMES ========")
            print(f" 1. Candidate generation: {t_cand:.4f}s")
            print(f" 2. Descriptors/images: {t_img:.4f}s")
            print(f" 3. Classification: {t_cls:.4f}s")
            print("==========")
            print(f" TOTAL: {t_total:.4f}s")
        return out

    def detect_file(self, pcd_path: str, key=None, verbose=True) -> Grasps:
        """CONFIG+PCD -> grasps (the detect_grasps app path,
        src/detect_grasps.cpp). Capacity is bucketed per octave
        (serve_capacity) so repeat calls with different-sized clouds reuse
        the compiled pipeline."""
        from gpd_tpu.io.pcd import load_cloud_file
        points = load_cloud_file(pcd_path)
        vp = np.asarray(self.cfg.camera_position, np.float32).reshape(1, 3)
        cloud = self.preprocess_cloud(points, view_points=vp,
                                      capacity="serve")
        return self.detect(cloud, key=key, verbose=verbose)
