"""A/B timing of detect_core variants on the bench workload (real chip).

    python tools/bench_variants.py

Times detect_core+select at several image-chunk sizes and LeNet dtypes to
pick the serving defaults. Complements tools/profile_stages.py (per-stage).
"""

import dataclasses
import sys
import time

import numpy as np


def sync(x):
    leaf = [a for a in __import__("jax").tree_util.tree_leaves(x)
            if hasattr(a, "ravel")][0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, n=10):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax

    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector, detect_core, select_and_cluster
    from gpd_tpu.io.pcd import load_pcd

    workloads = []
    cfg0 = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg0 = dataclasses.replace(cfg0, num_samples=500, min_inliers=0,
                               num_selected=100)
    workloads.append(("krylon", "/root/reference/tutorials/krylon.pcd",
                      cfg0, 10))
    cfgm = dataclasses.replace(cfg0, num_samples=5000, min_inliers=1,
                               sample_above_plane=True)
    workloads.append(("table_mug", "/root/reference/tutorials/table_mug.pcd",
                      cfgm, 5))

    for name, pcd, wcfg, iters in workloads:
        det = GraspDetector(wcfg)
        pts = load_pcd(pcd)
        cloud = det.preprocess_cloud(pts,
                                     view_points=np.zeros((1, 3), np.float32))
        cfg = det.effective_config(cloud)
        key = jax.random.PRNGKey(0)
        spos, smask = det.sample_cloud(cloud, key)
        sync((spos, smask))
        n_cand = spos.shape[0] * cfg.num_orientations * len(cfg.hand_axes)

        for cap in (512, 1024, 2048, 4096):
            def step(k, cap=cap):
                g, _ = detect_core(cloud, spos, smask, det.params, k, cfg,
                                   cap, scores_only=True)
                return select_and_cluster(g, cfg)
            t = timeit(lambda: step(key), n=iters)
            print(f"{name} cap={cap}: {t*1e3:8.2f} ms  -> "
                  f"{n_cand/t:7.0f} cand/s", flush=True)


if __name__ == "__main__":
    main()
