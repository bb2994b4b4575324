"""On-chip validation of the shard_map (multi-device) code paths.

Every multi-device artifact so far (test_sharding.py, test_multihost.py,
MULTICHIP dryruns) ran on virtual CPU meshes; this tool executes the same
shard_map programs on the REAL TPU backend over a 1-device mesh — the only
mesh the single-chip harness can build — and records:

  * geometry parity: candidates_sharded_raw vs candidates_stage (exact —
    the candidate stage is deterministic) and detect_sharded_raw vs
    detect_core valid-geometry sets (scores differ by per-shard key folds;
    geometry may not),
  * shard_map overhead: p50 latency of the sharded fused pipeline vs the
    direct single-device path, per workload,
  * mesh-CEM: a full SequentialImportanceSampling run with ``mesh=`` set,
    driving candidates_sharded_raw + score_sharded_raw on chip.

Writes SHARDED_TPU.md at the repo root. Run on the TPU backend:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/check_sharded_tpu.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sync(tree):
    import jax
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf.ravel()[:1])


def geom_set(g):
    v = np.asarray(g.valid)
    rows = np.concatenate([
        np.asarray(g.position)[v],
        np.asarray(g.orientation)[v].reshape(-1, 9),
        np.asarray(g.width)[v, None]], axis=1)
    return rows[np.lexsort(rows.T[::-1])]


def time_step(step, key, n_iters=5):
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    out = step(key)
    _sync(out)
    warm = time.perf_counter() - t0
    keys = [jnp.asarray(k) for k in np.asarray(jax.random.split(key, n_iters))]
    _sync(keys[-1])
    lats = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = step(keys[i])
        _sync(out)
        lats.append(time.perf_counter() - t0)
    return out, float(np.median(lats)), warm


def run_workload(name, pcd_path, wcfg, lines, summary):
    import jax

    from gpd_tpu.detector import (GraspDetector, candidates_stage,
                                  detect_core, select_and_cluster)
    from gpd_tpu.io.pcd import load_pcd
    from gpd_tpu.parallel.sharded import (candidates_sharded_raw,
                                          default_mesh, detect_sharded_raw,
                                          replicate, shard_samples)

    det = GraspDetector(wcfg)
    pts = load_pcd(pcd_path)
    cloud = det.preprocess_cloud(pts, view_points=np.zeros((1, 3), np.float32))
    cfg = det.effective_config(cloud)
    det.cfg = cfg
    key = jax.random.PRNGKey(0)
    spos, smask = det.sample_cloud(cloud, key)
    _sync((spos, smask))
    cap = det.image_cap(spos.shape[0])

    mesh = default_mesh(1)
    spos_s, smask_s = shard_samples(mesh, spos, smask)
    cloud_r = replicate(mesh, cloud)
    params_r = replicate(mesh, det.params)

    # Candidate-stage parity (deterministic -> exact equality expected).
    c1 = candidates_stage(cloud, spos, smask, cfg)
    c2 = candidates_sharded_raw(cloud_r, spos_s, smask_s, cfg, mesh)
    v1 = np.asarray(c1.valid)
    v2 = np.asarray(c2.valid)[:v1.size]
    cand_xor = int(np.sum(v1 != v2))
    pos_drift = float(np.max(np.abs(
        np.asarray(c1.position)[v1] - np.asarray(c2.position)[:v1.size][v1]
    ))) if v1.any() else 0.0

    # Full-pipeline geometry parity + latency. detect_sharded_raw scores
    # shard d with fold_in(key, d); on a 1-device mesh the direct path can
    # use the identical stream (fold_in(key, 0)), making the comparison
    # bit-for-bit — selection included.
    def direct_step(k):
        g, _ = detect_core(cloud, spos, smask, det.params,
                           jax.random.fold_in(k, 0), cfg, cap,
                           scores_only=True)
        return select_and_cluster(g, cfg)

    def sharded_step(k):
        g = detect_sharded_raw(cloud_r, spos_s, smask_s, params_r, k,
                               cfg, cap, mesh)
        return select_and_cluster(g, cfg)

    out_d, p50_d, warm_d = time_step(direct_step, key)
    out_s, p50_s, warm_s = time_step(sharded_step, key)

    gd, gs = geom_set(out_d), geom_set(out_s)
    geom_ok = gd.shape == gs.shape and (
        gd.shape[0] == 0 or np.allclose(gd, gs, atol=1e-5))
    overhead = (p50_s - p50_d) / p50_d * 100.0

    lines.append(f"## {name}")
    lines.append("")
    lines.append(f"- cloud {int(np.asarray(cloud.mask).sum())} pts "
                 f"(capacity {cloud.capacity}), {spos.shape[0]} samples, "
                 f"mesh: 1 device on `{jax.default_backend()}`")
    lines.append(f"- candidate validity XOR (sharded vs direct): "
                 f"**{cand_xor}** of {v1.size} ({int(v1.sum())} valid); "
                 f"position drift {pos_drift:.2e}")
    lines.append(f"- selected-grasp geometry sets: "
                 f"{'**identical**' if geom_ok else '**DIFFER**'} "
                 f"({gd.shape[0]} vs {gs.shape[0]} valid)")
    lines.append(f"- p50 latency: direct {p50_d*1e3:.1f} ms vs sharded "
                 f"{p50_s*1e3:.1f} ms -> shard_map overhead "
                 f"**{overhead:+.1f}%**")
    lines.append(f"- warmup: direct {warm_d:.1f}s, sharded {warm_s:.1f}s")
    lines.append("")
    print(f"# {name}: cand XOR {cand_xor}, geom "
          f"{'ok' if geom_ok else 'DIFFER'}, direct {p50_d*1e3:.1f} ms, "
          f"sharded {p50_s*1e3:.1f} ms ({overhead:+.1f}%)", file=sys.stderr)
    summary.append((name, dict(cand_xor=cand_xor, geom_ok=bool(geom_ok),
                               p50_direct=p50_d, p50_sharded=p50_s,
                               overhead_pct=overhead)))
    return det, cloud


def run_cem(det, cloud, lines, summary):
    import jax

    from gpd_tpu.cem import SequentialImportanceSampling
    from gpd_tpu.config import CEMConfig
    from gpd_tpu.parallel.sharded import default_mesh

    mesh = default_mesh(1)
    det.cfg = dataclasses.replace(det.cfg, min_inliers=0)
    sis = SequentialImportanceSampling(det, CEMConfig(), mesh=mesh)
    t0 = time.time()
    sis.detect(cloud, key=jax.random.PRNGKey(0), verbose=False)
    warm = time.time() - t0
    times = []
    for i in range(3):
        sis.detect(cloud, key=jax.random.PRNGKey(i), verbose=False)
        times.append(sis.last_runtime_s)
    p50 = float(np.median(times))

    lines.append("## mesh-CEM (krylon, cem_vino_params scale, "
                 "SUM_OF_GAUSSIANS)")
    lines.append("")
    lines.append(f"- every round ran candidates_sharded_raw + "
                 f"score_sharded_raw over the 1-device mesh")
    lines.append(f"- rounds {sis.last_round_counts}, final grasps "
                 f"{sis.last_num_grasps}")
    lines.append(f"- p50 total {p50*1e3:.1f} ms (warmup {warm:.1f}s); "
                 f"direct-path BENCH baseline for comparison lives in the "
                 f"bench JSON `cem.total_s_p50`")
    lines.append("")
    print(f"# mesh-CEM: p50 {p50*1e3:.1f} ms, grasps {sis.last_num_grasps}",
          file=sys.stderr)
    summary.append(("mesh-CEM", dict(p50=p50, grasps=sis.last_num_grasps)))


def main():
    import jax

    from gpd_tpu.config import load_config

    backend = jax.default_backend()
    lines = [
        "# SHARDED_TPU — shard_map parity + overhead on the real chip",
        "",
        f"Backend: `{backend}`, {len(jax.devices())} device(s). The "
        "shard_map programs (gpd_tpu/parallel/sharded.py) and mesh-CEM "
        "(cem.py mesh=) executed on a 1-device TPU mesh — the largest mesh "
        "this harness exposes — vs the direct single-device path. "
        "Generated by tools/check_sharded_tpu.py.",
        "",
    ]

    summary = []
    cfg = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg = dataclasses.replace(cfg, num_samples=500, min_inliers=0,
                              num_selected=100)
    det_k, cloud_k = run_workload(
        "krylon @ 500 samples", "/root/reference/tutorials/krylon.pcd", cfg,
        lines, summary)

    cfg2 = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg2 = dataclasses.replace(cfg2, num_samples=5000, min_inliers=1,
                               num_selected=100, sample_above_plane=True)
    run_workload("table_mug @ 5000 samples + clustering",
                 "/root/reference/tutorials/table_mug.pcd", cfg2,
                 lines, summary)

    run_cem(det_k, cloud_k, lines, summary)

    lines.append("## Verdict")
    lines.append("")
    ok = all(s.get("cand_xor", 0) == 0 and s.get("geom_ok", True)
             for _, s in summary)
    for name, s in summary:
        if "cand_xor" in s:
            lines.append(f"- {name}: candidate XOR {s['cand_xor']}, geometry "
                         f"{'identical' if s['geom_ok'] else 'DIFFERS'}, "
                         f"overhead {s['overhead_pct']:+.1f}%")
    lines.append("")
    lines.append(
        "**PASS**: shard_map lowers correctly on the TPU backend and is "
        "geometry-identical to the direct path." if ok else
        "**FAIL**: shard_map output diverges from the direct path on TPU.")

    with open(os.path.join(REPO, "SHARDED_TPU.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
