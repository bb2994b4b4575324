"""A/B the hand-search neighborhood strategy on the big-scene workload.

candidates_stage on table_mug costs ~76 ms of the 292 ms pipeline
(tools/ablate_core.py), dominated by the orientation-eval over identity
neighborhoods (K = cloud capacity = 16384). The alternative is exact
nearest-K truncation (sort cost, 'K/16384' of the eval work, small
reference deviation when a search ball exceeds K — ball p99 is ~5.7k
points on table_mug). This times both at several K.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_search.py
"""

import dataclasses
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

    from gpd_tpu.config import load_config
    from gpd_tpu.detector import (GraspDetector, candidates_stage,
                                  detect_core, select_and_cluster)
    from gpd_tpu.io.pcd import load_pcd

    cfg0 = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg0 = dataclasses.replace(cfg0, num_samples=5000, min_inliers=1,
                               num_selected=100, sample_above_plane=True)
    det = GraspDetector(cfg0)
    pts = load_pcd("/root/reference/tutorials/table_mug.pcd")
    cloud = det.preprocess_cloud(pts, view_points=np.zeros((1, 3), np.float32))
    base = det.effective_config(cloud)
    key = jax.random.PRNGKey(0)
    spos, smask = det.sample_cloud(cloud, key)
    sync((spos, smask))
    n_cand = spos.shape[0] * base.num_orientations * len(base.hand_axes)
    cap = det.image_cap(spos.shape[0])

    ref_valid = None
    for name, k, ident in (("identity-16384", 16384, True),
                           ("exact-8192", 8192, False),
                           ("exact-6144", 6144, False),
                           ("exact-4096", 4096, False)):
        cfg = dataclasses.replace(base, search_neighbors_cap=k,
                                  search_identity_max=16384 if ident else 1)
        t_c, g = timeit(lambda: candidates_stage(cloud, spos, smask, cfg))

        def full():
            gg, _ = detect_core(cloud, spos, smask, det.params, key, cfg,
                                cap, scores_only=True)
            return select_and_cluster(gg, cfg)
        t_f, _ = timeit(full)
        v = np.asarray(g.valid)
        if ref_valid is None:
            ref_valid = v
            delta = 0
        else:
            delta = int((v != ref_valid).sum())
        print(f"{name:16s} candidates {t_c*1e3:7.2f} ms   full "
              f"{t_f*1e3:7.2f} ms -> {n_cand/t_f:7.0f} cand/s   "
              f"valid-XOR vs identity: {delta}", flush=True)


if __name__ == "__main__":
    main()
