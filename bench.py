"""Benchmark: grasp candidates evaluated + CNN-scored per second per chip.

Two workloads per the BASELINE.md protocol:
  1. krylon.pcd, eigen_params-style 15-channel config, num_samples=500 —
     the headline candidates/sec/chip number (target >= 50k).
  2. table_mug.pcd, num_samples=5000, clustering on — the big-scene
     workload; reports cand/s and p50 cloud->grasps latency.

One full pipeline iteration = local frames + hand search over
(samples x 8 orientations) + workspace filter + 15-channel descriptor
rasterization + LeNet scoring + selection/clustering, all on device.

Prints ONE JSON line; the headline metric is krylon cand/s, with the
table_mug workload and compile-time tracking nested in the same object:
  {"metric": "candidates_per_sec", "value": N, "unit": "cand/s/chip",
   "vs_baseline": N/50000, "warmup_s": W,
   "table_mug": {"candidates_per_sec": N2, "p50_latency_s": L,
                 "num_samples": 5000, "warmup_s": W2}}
(vs_baseline: BASELINE.json target >= 50k candidates/s/chip; the reference
publishes no numbers — see BASELINE.md.)
"""

import dataclasses
import json
import sys
import time

import numpy as np


def _sync(tree):
    """Device->host fetch of one element: on remote TPU backends
    block_until_ready can return early (CLAUDE.md)."""
    import jax
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf.ravel()[:1])


def bench_workload(det, cloud, cfg, n_iters=20):
    """Times the fused detect_core + select_and_cluster pipeline at the
    detector's sample set. Returns (cand_per_sec, p50_latency_s, warmup_s,
    n_candidates, n_valid)."""
    import jax
    import jax.numpy as jnp

    from gpd_tpu.detector import detect_core, select_and_cluster

    key = jax.random.PRNGKey(0)
    spos, smask = det.sample_cloud(cloud, key)
    cap = det.image_cap(spos.shape[0])

    def step(k):
        g, _ = detect_core(cloud, spos, smask, det.params, k, cfg, cap,
                           scores_only=True)
        return select_and_cluster(g, cfg)

    # Warmup / compile.
    t0 = time.perf_counter()
    out = step(key)
    _sync(out)
    warmup_s = time.perf_counter() - t0

    # Distinct per-iteration keys, materialized on device BEFORE the timed
    # loop: an eager fold_in per iteration costs a dispatch round trip on
    # remote backends and would serialize the pipeline (CLAUDE.md).
    keys = [jnp.asarray(k) for k in np.asarray(jax.random.split(key, n_iters))]
    _sync(keys[-1])

    # Throughput: pipelined dispatch, one sync at the end.
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(keys[i])
    _sync(out)
    dt = (time.perf_counter() - t0) / n_iters

    # Latency: per-iteration sync (what a robot-serving caller sees).
    lats = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = step(keys[i])
        _sync(out)
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats))

    n_candidates = spos.shape[0] * cfg.num_orientations * len(cfg.hand_axes)
    n_valid = int(np.asarray(out.valid).sum())
    return n_candidates / dt, p50, warmup_s, n_candidates, n_valid


def bench_workload_sharded(det, cloud, cfg, n_iters=10):
    """Same fused pipeline through the shard_map candidate-parallel path
    over a 1-device mesh (bench.py --sharded): measures the shard_map
    overhead on the real chip. Returns (cand_per_sec, p50_latency_s,
    warmup_s)."""
    import jax
    import jax.numpy as jnp

    from gpd_tpu.detector import select_and_cluster
    from gpd_tpu.parallel.sharded import (default_mesh, detect_sharded_raw,
                                          replicate, shard_samples)

    key = jax.random.PRNGKey(0)
    spos, smask = det.sample_cloud(cloud, key)
    cap = det.image_cap(spos.shape[0])
    mesh = default_mesh(1)
    spos_s, smask_s = shard_samples(mesh, spos, smask)
    cloud_r = replicate(mesh, cloud)
    params_r = replicate(mesh, det.params)

    def step(k):
        g = detect_sharded_raw(cloud_r, spos_s, smask_s, params_r, k, cfg,
                               cap, mesh)
        return select_and_cluster(g, cfg)

    t0 = time.perf_counter()
    out = step(key)
    _sync(out)
    warmup_s = time.perf_counter() - t0
    keys = [jnp.asarray(k) for k in np.asarray(jax.random.split(key, n_iters))]
    _sync(keys[-1])
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = step(keys[i])
    _sync(out)
    dt = (time.perf_counter() - t0) / n_iters
    lats = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = step(keys[i])
        _sync(out)
        lats.append(time.perf_counter() - t0)
    n_candidates = spos.shape[0] * cfg.num_orientations * len(cfg.hand_axes)
    return n_candidates / dt, float(np.median(lats)), warmup_s


def main():
    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector
    from gpd_tpu.io.pcd import load_pcd

    sharded_mode = "--sharded" in sys.argv

    # Workload 1: krylon @ 500 samples (headline).
    cfg = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg = dataclasses.replace(cfg, num_samples=500, min_inliers=0,
                              num_selected=100)
    det = GraspDetector(cfg)
    pts = load_pcd("/root/reference/tutorials/krylon.pcd")
    cloud = det.preprocess_cloud(pts, view_points=np.zeros((1, 3), np.float32))
    kcfg = det.effective_config(cloud)
    det.cfg = kcfg
    cps, p50_k, warm_k, n_cand, n_valid = bench_workload(det, cloud, kcfg)
    print(f"# krylon: cloud points {int(np.asarray(cloud.mask).sum())}, "
          f"candidates/iter {n_cand}, valid grasps {n_valid}, "
          f"p50 {p50_k*1000:.2f} ms, warmup {warm_k:.1f}s", file=sys.stderr)

    # Workload 2: table_mug @ 5000 samples, clustering on (BASELINE.md:28-35).
    cfg2 = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg2 = dataclasses.replace(cfg2, num_samples=5000, min_inliers=1,
                               num_selected=100, sample_above_plane=True)
    det2 = GraspDetector(cfg2, params=det.params)
    pts2 = load_pcd("/root/reference/tutorials/table_mug.pcd")
    cloud2 = det2.preprocess_cloud(pts2,
                                   view_points=np.zeros((1, 3), np.float32))
    mcfg = det2.effective_config(cloud2)
    det2.cfg = mcfg
    cps2, p50_m, warm_m, n_cand2, n_valid2 = bench_workload(det2, cloud2,
                                                            mcfg, n_iters=5)
    print(f"# table_mug: cloud points {int(np.asarray(cloud2.mask).sum())}, "
          f"candidates/iter {n_cand2}, valid grasps {n_valid2}, "
          f"p50 {p50_m*1000:.2f} ms, warmup {warm_m:.1f}s", file=sys.stderr)

    # Workload 3: CEM on krylon at cem_vino_params scale (50 init + 5x50,
    # SUM sampling; reference: sequential_importance_sampling.cpp:54-187).
    import jax

    from gpd_tpu.cem import SequentialImportanceSampling
    from gpd_tpu.config import CEMConfig

    cfg3 = dataclasses.replace(cfg, min_inliers=0)
    det3 = GraspDetector(cfg3, params=det.params)
    det3.cfg = dataclasses.replace(kcfg, min_inliers=0)
    sis = SequentialImportanceSampling(det3, CEMConfig())
    t0 = time.perf_counter()
    sis.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
    cem_warm = time.perf_counter() - t0
    times = []
    for i in range(3):
        sis.detect(cloud, key=jax.random.PRNGKey(i), verbose=False)
        times.append(sis.last_runtime_s)
    cem_p50 = float(np.median(times))
    print(f"# cem: rounds {sis.last_round_counts}, grasps "
          f"{sis.last_num_grasps}, p50 {cem_p50*1000:.1f} ms, "
          f"warmup {cem_warm:.1f}s", file=sys.stderr)

    # CEM matrix (VERDICT r4 #4): MAX_OF_GAUSSIANS on chip + a big-scene
    # (table_mug) CEM workload — previously only krylon + SUM ever ran on
    # the real device.
    sis_max = SequentialImportanceSampling(det3, CEMConfig(sampling_method=1))
    t0 = time.perf_counter()
    sis_max.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
    cem_max_warm = time.perf_counter() - t0
    times = []
    for i in range(3):
        sis_max.detect(cloud, key=jax.random.PRNGKey(i), verbose=False)
        times.append(sis_max.last_runtime_s)
    cem_max_p50 = float(np.median(times))
    print(f"# cem max_of_gaussians: rounds {sis_max.last_round_counts}, "
          f"grasps {sis_max.last_num_grasps}, p50 {cem_max_p50*1000:.1f} ms, "
          f"warmup {cem_max_warm:.1f}s", file=sys.stderr)

    det4 = GraspDetector(dataclasses.replace(cfg2, min_inliers=1),
                         params=det.params)
    det4.cfg = mcfg
    sis_mug = SequentialImportanceSampling(det4, CEMConfig())
    t0 = time.perf_counter()
    sis_mug.detect(cloud2, key=jax.random.PRNGKey(0), verbose=False)
    cem_mug_warm = time.perf_counter() - t0
    times = []
    for i in range(3):
        sis_mug.detect(cloud2, key=jax.random.PRNGKey(i), verbose=False)
        times.append(sis_mug.last_runtime_s)
    cem_mug_p50 = float(np.median(times))
    print(f"# cem table_mug: rounds {sis_mug.last_round_counts}, grasps "
          f"{sis_mug.last_num_grasps}, p50 {cem_mug_p50*1000:.1f} ms, "
          f"warmup {cem_mug_warm:.1f}s", file=sys.stderr)

    sharded_obj = None
    if sharded_mode:
        scps, sp50, swarm = bench_workload_sharded(det, cloud, kcfg)
        print(f"# sharded (1-dev mesh): {scps:.0f} cand/s, p50 "
              f"{sp50*1000:.2f} ms, overhead {(sp50/p50_k-1)*100:+.1f}%, "
              f"warmup {swarm:.1f}s", file=sys.stderr)
        sharded_obj = {
            "candidates_per_sec": round(scps, 1),
            "p50_latency_s": round(sp50, 4),
            "overhead_vs_direct_pct": round((sp50 / p50_k - 1) * 100, 1),
            "mesh_devices": 1,
            "warmup_s": round(swarm, 1),
        }

    print(json.dumps({
        "metric": "candidates_per_sec",
        "value": round(cps, 1),
        "unit": "cand/s/chip",
        "vs_baseline": round(cps / 50000.0, 3),
        "warmup_s": round(warm_k, 1),
        # Stated regression budgets (VERDICT r3 #6): cold compile must stay
        # under these; cache-warm reruns are typically a few seconds
        # (persistent cache + serve-capacity octave bucketing).
        "warmup_budget_s": 30.0,
        "p50_latency_s": round(p50_k, 4),
        "table_mug": {
            "candidates_per_sec": round(cps2, 1),
            "p50_latency_s": round(p50_m, 4),
            "num_samples": 5000,
            "valid_grasps": n_valid2,
            "warmup_s": round(warm_m, 1),
            "warmup_budget_s": 45.0,
        },
        "cem": {
            "total_s_p50": round(cem_p50, 4),
            "round_candidates": sis.last_round_counts,
            "final_grasps": sis.last_num_grasps,
            "num_init_samples": 50,
            "num_iterations": 5,
            "samples_per_iteration": 50,
            "sampling": "sum_of_gaussians",
            "warmup_s": round(cem_warm, 1),
            "max_of_gaussians": {
                "total_s_p50": round(cem_max_p50, 4),
                "round_candidates": sis_max.last_round_counts,
                "final_grasps": sis_max.last_num_grasps,
                "warmup_s": round(cem_max_warm, 1),
            },
            "table_mug": {
                "total_s_p50": round(cem_mug_p50, 4),
                "round_candidates": sis_mug.last_round_counts,
                "final_grasps": sis_mug.last_num_grasps,
                "sampling": "sum_of_gaussians",
                "warmup_s": round(cem_mug_warm, 1),
            },
        },
        **({"sharded": sharded_obj} if sharded_obj else {}),
    }))


if __name__ == "__main__":
    main()
