"""Benchmark: grasp candidates evaluated + CNN-scored per second per chip.

Workload: krylon.pcd (the reference's tutorial fixture) with the
eigen_params-style 15-channel config at num_samples=500 — the BASELINE.md
protocol. One full pipeline iteration = local frames + hand search over
(500 samples x 8 orientations) + workspace filter + 15-channel descriptor
rasterization + LeNet scoring, all as one jitted XLA program on device.

Prints ONE JSON line:
  {"metric": "candidates_per_sec", "value": N, "unit": "cand/s/chip",
   "vs_baseline": N / 50000}
(vs_baseline: BASELINE.json target >= 50k candidates/s/chip; the reference
publishes no numbers — see BASELINE.md.)
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector, detect_core, select_and_cluster
    from gpd_tpu.io.pcd import load_pcd

    cfg = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg = dataclasses.replace(cfg, num_samples=500, min_inliers=0,
                              num_selected=100)
    det = GraspDetector(cfg)

    pts = load_pcd("/root/reference/tutorials/krylon.pcd")
    cloud = det.preprocess_cloud(pts, view_points=np.zeros((1, 3), np.float32))
    cfg = det.effective_config(cloud)

    key = jax.random.PRNGKey(0)
    spos, smask = det.sample_cloud(cloud, key)
    cap = det.image_cap(spos.shape[0])

    def step(k):
        g, _ = detect_core(cloud, spos, smask, det.params, k, cfg, cap,
                           scores_only=True)
        out = select_and_cluster(g, cfg)
        return out

    import jax.numpy as jnp_mod
    jnp_asarray = jnp_mod.asarray

    def sync(g):
        # On remote TPU backends block_until_ready can return early; a
        # device->host fetch is the reliable synchronization point.
        leaf = jax.tree_util.tree_leaves(g)[0]
        return np.asarray(leaf.ravel()[:1])

    # Warmup / compile.
    t0 = time.perf_counter()
    out = step(key)
    sync(out)
    print(f"# warmup (incl. compile): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # Distinct per-iteration keys, materialized on device BEFORE the timed
    # loop: an eager fold_in per iteration costs a dispatch round trip on
    # remote backends and would serialize the pipeline (CLAUDE.md).
    n_iters = 10
    keys = [jnp_asarray(k) for k in
            np.asarray(jax.random.split(key, n_iters))]
    sync(keys[-1])

    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(keys[i])
    sync(out)
    dt = (time.perf_counter() - t0) / n_iters

    n_candidates = spos.shape[0] * cfg.num_orientations * len(cfg.hand_axes)
    cps = n_candidates / dt

    n_valid = int(np.asarray(out.valid).sum())
    print(f"# cloud points: {int(np.asarray(cloud.mask).sum())}, "
          f"candidates/iter: {n_candidates}, valid grasps: {n_valid}, "
          f"time/iter: {dt*1000:.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "candidates_per_sec",
        "value": round(cps, 1),
        "unit": "cand/s/chip",
        "vs_baseline": round(cps / 50000.0, 3),
    }))


if __name__ == "__main__":
    main()
