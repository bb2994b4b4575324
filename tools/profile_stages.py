"""Per-stage TPU timing of the detection pipeline on the bench workload.

Times each jitted stage separately (frames, hand search, shadow, raster,
LeNet) with device->host sync between repetitions, to locate the bottleneck
behind bench.py's single number. Run on the real chip:

    python tools/profile_stages.py [num_samples]
"""

import dataclasses
import sys
import time

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, n=5):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n, out


def main():
    import jax
    import jax.numpy as jnp

    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector, detect_core, select_and_cluster
    from gpd_tpu.io.pcd import load_pcd
    from gpd_tpu.net import lenet
    from gpd_tpu.ops import candidates as cand
    from gpd_tpu.ops import images as img
    from gpd_tpu.ops.frames import estimate_frames
    from gpd_tpu.ops.neighbors import radius_neighbors

    ns = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    cfg = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg = dataclasses.replace(cfg, num_samples=ns, min_inliers=0,
                              num_selected=100)
    det = GraspDetector(cfg)
    pts = load_pcd("/root/reference/tutorials/krylon.pcd")
    cloud = det.preprocess_cloud(pts, view_points=np.zeros((1, 3), np.float32))
    cfg = det.effective_config(cloud)
    key = jax.random.PRNGKey(0)
    spos, smask = det.sample_cloud(cloud, key)
    cap = det.image_cap(spos.shape[0])
    print(f"cloud={int(np.asarray(cloud.mask).sum())} cap={cap} "
          f"search_k={cfg.search_neighbors_cap} image_k={cfg.image_neighbors_cap}",
          file=sys.stderr)

    # Stage 1: frames.
    t_frames, (frames, fvalid) = timeit(lambda: estimate_frames(
        spos, smask, cloud.points, cloud.mask, cloud.normals,
        radius=cfg.nn_radius_frames, k=cfg.frame_neighbors_cap))
    print(f"frames:        {t_frames*1e3:9.2f} ms")

    # Stage 2: hand search.
    t_search, grasps = timeit(lambda: cand.search_hands_with_frames(
        cloud, spos, frames, fvalid, cfg))
    print(f"hand search:   {t_search*1e3:9.2f} ms")

    # Stage 3: image neighborhoods.
    k_img = min(cfg.image_neighbors_cap, cloud.points.shape[0])
    t_nn, (nn_idx, nn_valid) = timeit(lambda: radius_neighbors(
        spos, smask, cloud.points, cloud.mask, radius=cfg.image_radius,
        k=k_img))
    print(f"image nn:      {t_nn*1e3:9.2f} ms")

    # Stage 4: shadows (nearest-sc source selection as in detect_core).
    @jax.jit
    def shadow_fn():
        sc = min(cfg.shadow_source_cap, nn_idx.shape[1])
        if sc < nn_idx.shape[1]:
            d2 = jnp.sum(
                (spos[:, None, :] - cloud.points[nn_idx]) ** 2, axis=-1)
            negd, src_pos = jax.lax.approx_max_k(
                jnp.where(nn_valid, -d2, -jnp.inf), sc)
            src_idx = jnp.take_along_axis(nn_idx, src_pos, axis=1)
            src_valid = negd > -jnp.inf
        else:
            src_idx, src_valid = nn_idx, nn_valid
        return img.compute_shadows(
            key, cloud.points[src_idx], src_valid,
            cloud.cam_source[src_idx], cloud.view_points,
            jnp.float32(img.shadow_length_of(cfg.image_geometry)),
            n_sp=img.num_shadow_points(cfg.image_geometry),
            v_cap=cfg.shadow_voxel_cap)

    t_sh, (shadow_pts, shadow_valid) = timeit(shadow_fn)
    print(f"shadows:       {t_sh*1e3:9.2f} ms")

    # Stage 5: rasterization for one full valid-first chunk of size cap.
    order = jnp.argsort(~grasps.valid, stable=True)
    g = grasps.take(order[:cap])
    n_valid_cand = int(np.asarray(grasps.valid).sum())
    print(f"valid candidates: {n_valid_cand} / {grasps.capacity}")
    sid = g.sample_id
    h_idx = nn_idx[sid]
    h_nvalid = nn_valid[sid] & g.valid[:, None]
    h_pts = cloud.points[h_idx]
    h_nrm = cloud.normals[h_idx]
    ig = cfg.image_geometry

    t_img, images = timeit(lambda: img.make_images(
        h_pts, h_nrm, h_nvalid, g.orientation, g.sample, g.bottom,
        g.center, g.valid, ig, shadow_pts=shadow_pts[sid],
        shadow_valid=shadow_valid[sid]))
    print(f"raster ({cap}): {t_img*1e3:8.2f} ms")

    # Stage 6: LeNet.
    t_net, _ = timeit(lambda: lenet.score(det.params, images))
    print(f"lenet ({cap}):  {t_net*1e3:8.2f} ms")

    # Full fused pipelines for comparison.
    t_core, (gout, _) = timeit(lambda: detect_core(
        cloud, spos, smask, det.params, key, cfg, cap, scores_only=True))
    print(f"detect_core:   {t_core*1e3:9.2f} ms")
    t_sel, _ = timeit(lambda: select_and_cluster(gout, cfg))
    print(f"select:        {t_sel*1e3:9.2f} ms")

    n_cand = ns * cfg.num_orientations * len(cfg.hand_axes)
    print(f"TOTAL core+sel: {(t_core+t_sel)*1e3:.2f} ms "
          f"-> {n_cand/(t_core+t_sel):.0f} cand/s")


if __name__ == "__main__":
    main()
