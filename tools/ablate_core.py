"""End-to-end cost attribution for detect_core on the real chip.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/ablate_core.py

Per-stage *standalone* timings (tools/profile_stages.py) include ~5-10 ms
of per-dispatch overhead each and miss cross-stage fusion, so they cannot
rank optimization targets (CLAUDE.md: only trust end-to-end). This tool
instead re-times the FUSED detect_core+select with one stage at a time
replaced by a trivially-cheap stub; XLA dead-code-eliminates everything
only that stage consumed, so "full - ablated" is the true end-to-end cost
of the stage *including* whatever it prevents from fusing.

Stubs keep shapes/dtypes identical so downstream programs are unchanged.
"""

import contextlib
import dataclasses
import time

import numpy as np


def sync(x):
    import jax
    leaf = [a for a in jax.tree_util.tree_leaves(x)
            if hasattr(a, "ravel")][0]
    return np.asarray(leaf.ravel()[:1])


N_ITERS = 20


def timeit(fn, n=None):
    n = n or N_ITERS
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


@contextlib.contextmanager
def patched(obj, name, repl):
    orig = getattr(obj, name)
    setattr(obj, name, repl)
    try:
        yield
    finally:
        setattr(obj, name, orig)


def main():
    import sys

    import jax
    import jax.numpy as jnp

    from gpd_tpu.config import load_config
    from gpd_tpu import detector as det_mod
    from gpd_tpu.detector import GraspDetector, detect_core, select_and_cluster
    from gpd_tpu.io.pcd import load_pcd
    from gpd_tpu.net import lenet
    from gpd_tpu.ops import images as img_mod

    global N_ITERS
    mug = "--mug" in sys.argv
    if mug:
        N_ITERS = 5
    cfg0 = load_config("/root/reference/cfg/eigen_params.cfg")
    if mug:
        cfg0 = dataclasses.replace(cfg0, num_samples=5000, min_inliers=1,
                                   num_selected=100, sample_above_plane=True)
        pcd = "/root/reference/tutorials/table_mug.pcd"
    else:
        cfg0 = dataclasses.replace(cfg0, num_samples=500, min_inliers=0,
                                   num_selected=100)
        pcd = "/root/reference/tutorials/krylon.pcd"
    det = GraspDetector(cfg0)
    pts = load_pcd(pcd)
    cloud = det.preprocess_cloud(pts, view_points=np.zeros((1, 3), np.float32))
    cfg = det.effective_config(cloud)
    key = jax.random.PRNGKey(0)
    spos, smask = det.sample_cloud(cloud, key)
    n_cand = spos.shape[0] * cfg.num_orientations * len(cfg.hand_axes)
    cap = det.image_cap(spos.shape[0])

    def step():
        g, _ = detect_core(cloud, spos, smask, det.params, key, cfg, cap,
                           scores_only=True)
        return select_and_cluster(g, cfg)

    # --- stage stubs (shape-preserving, near-zero cost) ---
    def stub_score(params, images_u8, conv_relu=True):
        # one cheap reduce: keeps the (G,) score shape, drops the CNN tower
        return jnp.sum(images_u8, axis=(1, 2, 3)).astype(jnp.float32)

    def stub_make_images(nn_pts, nn_nrm, nn_valid, hand_R, hand_sample,
                         hand_bottom, hand_center, hand_valid, image,
                         shadow_pts=None, shadow_valid=None):
        G = hand_valid.shape[0]
        # depend on one scalar per input so neighborhoods/transforms are
        # not *entirely* DCE'd away (we want to ablate only the raster).
        # Identity neighborhoods pass the SHARED (N, 3) cloud (2-D).
        tick = (jnp.sum(nn_pts[..., 0]) + jnp.sum(nn_nrm[..., 0])).astype(
            jnp.uint8)
        return jnp.full((G, image.size, image.size, image.num_channels),
                        tick, jnp.uint8)

    def stub_shadows(key, nn_pts, nn_valid, nn_cam, view_points,
                     shadow_length, n_sp, v_cap, sample_uid=None):
        S = nn_pts.shape[0]
        v_cap = min(v_cap, nn_pts.shape[1] * n_sp)
        return (jnp.zeros((S, v_cap, 3), jnp.float32),
                jnp.zeros((S, v_cap), bool))

    def nosort_shadows(key, nn_pts, nn_valid, nn_cam, view_points,
                       shadow_length, n_sp, v_cap, sample_uid=None):
        # full ray casting + voxelization, but no dedup sort/top_k:
        # isolates the sort cost inside compute_shadows
        S, K, _ = nn_pts.shape
        v_cap = min(v_cap, K * n_sp)
        vec = jnp.mean(nn_pts, axis=1) - view_points[0][None, :]
        vec = shadow_length * vec / jnp.maximum(
            jnp.linalg.norm(vec, axis=1, keepdims=True), 1e-12)
        u = jax.random.uniform(key, (S, K, n_sp))
        q = nn_pts[:, :, None, :] + u[..., None] * vec[:, None, None, :]
        vox = jnp.trunc(q * (1.0 / img_mod.SHADOW_VOXEL))
        pts = (vox * img_mod.SHADOW_VOXEL).reshape(S, K * n_sp, 3)
        return (pts[:, :v_cap], nn_valid[:, :, None].repeat(
            n_sp, 2).reshape(S, K * n_sp)[:, :v_cap])

    real_raster = img_mod._raster_kernel

    def stub_raster(unit, inside, nrm_hand, shadow_unit, shadow_inside,
                    image, num_channels):
        # transforms/unit coords stay live; only the scatter/histogram work
        # is removed
        G = unit.shape[0]
        tick = (jnp.sum(unit[:, 0, 0]) + jnp.sum(nrm_hand[:, 0, 0]) +
                jnp.sum(shadow_unit[:, 0, 0]) +
                jnp.sum(inside[:, 0]) + jnp.sum(shadow_inside[:, 0])
                ).astype(jnp.uint8)
        return jnp.full((G, image.size, image.size, num_channels), tick,
                        jnp.uint8)

    # --- search-stage stubs ---
    from gpd_tpu.ops import candidates as cand_mod

    real_rn = cand_mod.radius_neighbors

    def stub_radius_neighbors(query, query_mask, points, points_mask,
                              radius, k, block=1024, exact=False):
        # identity-ish neighborhoods: removes the per-sample top_k sort and
        # keeps the gather + eval costs (indices still exercise the gather)
        q = query.shape[0]
        n = points.shape[0]
        idx = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32) % n, (q, k))
        valid = jnp.ones((q, k), bool) & query_mask[:, None]
        return idx, valid

    real_eval = cand_mod._eval_orientations

    def stub_eval(rel, nrm, nvalid, frames, rfix, p):
        # shape-correct near-zero eval: isolates the orientation-eval cost
        M = rfix.shape[0]
        S = rel.shape[0]
        t = jnp.sum(rel[:, 0, 0]) + jnp.sum(nrm[:, 0, 0])
        z = jnp.zeros((M, S)) + t * 0.0
        R = jnp.broadcast_to(jnp.eye(3), (M, S, 3, 3))
        # all-invalid so downstream image chunks cond-skip: this variant
        # isolates the nn/top_k/gather side of the search (eval + most of
        # the imaging drop out; compare against no_lenet+images)
        return dict(R=R, pos=jnp.zeros((M, S, 3)), top=z, bottom=z,
                    center=z, width=z, mid=z.astype(jnp.int32),
                    valid=z > 0.5, full=z > 0.5, half=z > 0.5)

    # Pallas-only stubs: keep the operand builds (rows/cols/aug) LIVE via a
    # cheap consumption, drop only the onehot-matmul kernels — isolates the
    # kernels' in-situ cost from the XLA-side index/value construction.
    def stub_pallas1(rows, cols, aug, size,
                     precision=None):
        G = rows.shape[0]
        Cp = aug.shape[-1]
        tick = (jnp.sum(rows[:, :1].astype(jnp.float32), axis=1)
                + jnp.sum(cols[:, :1].astype(jnp.float32), axis=1)
                + jnp.sum(aug[:, 0, :], axis=1))
        return jnp.zeros((G, size, size, Cp), jnp.float32) \
            + tick[:, None, None, None] * 0.0 + 1.0

    def stub_pallas2(rows_a, rows_b, cols, aug, size,
                     precision=None):
        G = rows_a.shape[0]
        Cp = aug.shape[-1]
        tick = (jnp.sum(rows_a[:, :1].astype(jnp.float32), axis=1)
                + jnp.sum(rows_b[:, :1].astype(jnp.float32), axis=1)
                + jnp.sum(cols[:, :1].astype(jnp.float32), axis=1)
                + jnp.sum(aug[:, 0, :], axis=1))
        return jnp.zeros((G, 2, size, size, Cp), jnp.float32) \
            + tick[:, None, None, None, None] * 0.0 + 1.0

    def stub_blocks(midx, mvalsT, sidx, svalsT, size, with_shadow):
        G = midx.shape[0]
        R = -(-(size + 1) // 8) * 8
        NB = 21 if with_shadow else 15
        tick = (jnp.sum(midx[:, 0, :1].astype(jnp.float32), axis=1)
                + jnp.sum(mvalsT[:, 0, :].astype(jnp.float32), axis=1)
                + jnp.sum(sidx[:, 0, :1].astype(jnp.float32), axis=1)
                + jnp.sum(svalsT[:, 0, :].astype(jnp.float32), axis=1))
        return jnp.zeros((G, NB, R, R), jnp.float32) \
            + tick[:, None, None, None] * 0.0 + 1.0

    variants = [("full", {})]
    variants.append(("no_lenet", {"score": stub_score}))
    variants.append(("no_images", {"make_images": stub_make_images}))
    variants.append(("no_shadows", {"shadows": stub_shadows}))
    variants.append(("shadow_nosort", {"shadows": nosort_shadows}))
    variants.append(("no_raster", {"raster": stub_raster}))
    variants.append(("no_raster_mm", {"pallas1": stub_pallas1,
                                      "pallas2": stub_pallas2,
                                      "pallas_blocks": stub_blocks}))
    variants.append(("no_lenet+images", {"score": stub_score,
                                         "make_images": stub_make_images}))
    variants.append(("search_no_topk", {"search_nn": stub_radius_neighbors}))
    variants.append(("search_no_eval", {"search_eval": stub_eval}))

    base = None
    for name, stubs in variants:
        with contextlib.ExitStack() as st:
            if "score" in stubs:
                st.enter_context(patched(lenet, "score", stubs["score"]))
            if "make_images" in stubs:
                st.enter_context(
                    patched(img_mod, "make_images", stubs["make_images"]))
            if "shadows" in stubs:
                st.enter_context(
                    patched(img_mod, "compute_shadows", stubs["shadows"]))
            if "raster" in stubs:
                st.enter_context(
                    patched(img_mod, "_raster_kernel", stubs["raster"]))
            if "pallas1" in stubs:
                st.enter_context(patched(img_mod, "_raster_sums_pallas",
                                         stubs["pallas1"]))
            if "pallas2" in stubs:
                st.enter_context(patched(img_mod, "_raster_sums_pallas2",
                                         stubs["pallas2"]))
            if "pallas_blocks" in stubs:
                st.enter_context(patched(img_mod, "_raster_blocks_pallas",
                                         stubs["pallas_blocks"]))
            if "search_nn" in stubs:
                st.enter_context(patched(cand_mod, "radius_neighbors",
                                         stubs["search_nn"]))
            if "search_eval" in stubs:
                st.enter_context(patched(cand_mod, "_eval_orientations",
                                         stubs["search_eval"]))
            # the patched functions are looked up at trace time, so force a
            # retrace of every program that closes over them
            for f in (detect_core, det_mod.candidates_stage,
                      det_mod.score_candidates, det_mod.image_inputs_stage,
                      det_mod._images_for, det_mod._descriptor_inputs,
                      det_mod._image_inputs_blocked, cand_mod._search_kernel):
                f.clear_cache()
            if hasattr(img_mod.make_images, "clear_cache"):
                img_mod.make_images.clear_cache()
            if hasattr(img_mod._raster_kernel, "clear_cache"):
                img_mod._raster_kernel.clear_cache()
            t = timeit(step)
        if base is None:
            base = t
        delta = base - t
        print(f"{name:18s} {t*1e3:8.2f} ms   saved {delta*1e3:7.2f} ms"
              f"   -> {n_cand/t:8.0f} cand/s", flush=True)

    # candidates+select only (no scoring at all): lower bound.
    # Re-clear the jit caches first — they still hold the LAST variant's
    # stubbed traces (the ExitStack restored the attrs, not the caches).
    for f in (detect_core, det_mod.candidates_stage,
              det_mod.score_candidates, det_mod.image_inputs_stage,
              det_mod._images_for, det_mod._descriptor_inputs,
              det_mod._image_inputs_blocked, cand_mod._search_kernel):
        f.clear_cache()

    def cand_only():
        g = det_mod.candidates_stage(cloud, spos, smask, cfg)
        g2 = dataclasses.replace(
            g, score=jnp.where(g.valid, 1.0, -jnp.inf))
        return select_and_cluster(g2, cfg)

    t = timeit(cand_only)
    print(f"{'cand+select only':18s} {t*1e3:8.2f} ms   saved "
          f"{(base-t)*1e3:7.2f} ms   -> {n_cand/t:8.0f} cand/s", flush=True)


if __name__ == "__main__":
    main()
