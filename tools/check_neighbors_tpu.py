"""On-chip validation of the approximate nearest-K serving paths.

Round-3 shipped TPU perf numbers rode `jax.lax.approx_min_k` /
`approx_max_k` (recall_target 0.95) in several neighbor selections while
every parity test runs exact `top_k` on CPU. This tool closes that gap: it
runs the bench workloads (BASELINE.md protocol: krylon @ 500 samples,
table_mug @ 5000 samples + clustering) on the REAL chip twice —

  shipped:  the default settings (exact hand search / frames / normals
            after the round-4 redesign; approx still allowed in the
            descriptor neighborhoods + shadow-source picking)
  exact:    gpd_tpu.ops.neighbors.FORCE_EXACT = True (every nearest-K a
            full top_k sort)

— and reports, per workload:
  * candidate-set delta: XOR count of the hand-search validity masks
    (reference semantics: uncapped kd-tree, hand_search.cpp:29-31)
  * frame drift: max |frames_shipped - frames_exact|
  * score drift on the common valid set, and top-10 overlap (by position,
    1e-4 tolerance) of the final selected grasps
  * p50 latency of the fused pipeline in both modes (the price of
    exactness)

Writes NEIGHBORS_TPU.md at the repo root. Run on the TPU backend:
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/check_neighbors_tpu.py
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


def run_mode(det, cloud, cfg, spos, smask, n_iters=5):
    """One mode's artifacts: candidate validity, frames, scored batch,
    selected output, p50 latency."""
    import jax
    import jax.numpy as jnp

    from gpd_tpu.detector import (candidates_stage, detect_core,
                                  select_and_cluster)
    from gpd_tpu.ops.frames import estimate_frames

    key = jax.random.PRNGKey(0)
    cap = det.image_cap(spos.shape[0])

    frames, fvalid = estimate_frames(
        spos, smask, cloud.points, cloud.mask, cloud.normals,
        radius=cfg.nn_radius_frames, k=cfg.frame_neighbors_cap)
    cand = candidates_stage(cloud, spos, smask, cfg)

    def step(k):
        g, _ = detect_core(cloud, spos, smask, det.params, k, cfg, cap,
                           scores_only=True)
        return select_and_cluster(g, cfg)

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

    return dict(
        frames=np.asarray(frames), fvalid=np.asarray(fvalid),
        cand_valid=np.asarray(cand.valid),
        cand_full=np.asarray(cand.full_antipodal),
        out_pos=np.asarray(out.position), out_score=np.asarray(out.score),
        out_valid=np.asarray(out.valid),
        p50=float(np.median(lats)), warm=warm,
    )


def top10(res):
    v = res["out_valid"]
    order = np.argsort(-np.where(v, res["out_score"], -np.inf))[:10]
    return res["out_pos"][order], res["out_score"][order]


def compare(name, a, b, lines):
    """a = shipped, b = exact."""
    xor = int(np.sum(a["cand_valid"] != b["cand_valid"]))
    n_valid = int(a["cand_valid"].sum())
    fxor = int(np.sum(a["cand_full"] != b["cand_full"]))
    fdrift = float(np.max(np.abs(a["frames"] - b["frames"])))
    common = a["cand_valid"] & b["cand_valid"]

    pa, sa = top10(a)
    pb, sb = top10(b)
    d = np.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=-1)
    overlap = int(np.sum(np.min(d, axis=1) < 1e-4))
    sdrift = float(np.max(np.abs(np.sort(sa) - np.sort(sb)))) \
        if overlap == 10 else float("nan")

    lines.append(f"## {name}")
    lines.append("")
    lines.append(f"- candidate validity XOR: **{xor}** of {a['cand_valid'].size} "
                 f"slots ({n_valid} valid)")
    lines.append(f"- full-antipodal flag XOR: {fxor}")
    lines.append(f"- frame drift (max abs): {fdrift:.2e}")
    lines.append(f"- top-10 overlap (position < 1e-4): **{overlap}/10**")
    lines.append(f"- top-10 score drift (sorted, max abs): {sdrift:.4g}")
    lines.append(f"- p50 latency: shipped {a['p50']*1e3:.1f} ms vs "
                 f"exact {b['p50']*1e3:.1f} ms "
                 f"(warmup {a['warm']:.1f}s / {b['warm']:.1f}s)")
    lines.append(f"- common-valid count: {int(common.sum())}")
    lines.append("")
    return dict(xor=xor, overlap=overlap, fdrift=fdrift)


def main():
    import jax

    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector
    from gpd_tpu.io.pcd import load_pcd
    from gpd_tpu.ops import neighbors

    backend = jax.default_backend()
    lines = [
        "# NEIGHBORS_TPU — approximate vs exact nearest-K, end to end",
        "",
        f"Backend: `{backend}`. Shipped settings vs "
        "`neighbors.FORCE_EXACT=True` (every nearest-K a full top_k). "
        "Generated by tools/check_neighbors_tpu.py.",
        "",
    ]

    workloads = []
    cfg = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg = dataclasses.replace(cfg, num_samples=500, min_inliers=0,
                              num_selected=100)
    workloads.append(("krylon @ 500 samples",
                      "/root/reference/tutorials/krylon.pcd", cfg))
    cfg2 = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg2 = dataclasses.replace(cfg2, num_samples=5000, min_inliers=1,
                               num_selected=100, sample_above_plane=True)
    workloads.append(("table_mug @ 5000 samples + clustering",
                      "/root/reference/tutorials/table_mug.pcd", cfg2))
    # >32k-point fixture: three x-shifted copies of table_mug (~48k
    # processed points). Exercises the blocked identity search past the old
    # search_identity_max=32768 boundary, where the previous fallback was a
    # lossy nearest-4096 cap (104 candidate flips on even a 16k cloud).
    raw_tm = load_pcd("/root/reference/tutorials/table_mug.pcd")
    raw_x3 = np.concatenate([raw_tm + np.array([dx, 0, 0], np.float32)
                             for dx in (-0.35, 0.0, 0.35)])
    workloads.append(("table_mug x3 @ 5000 samples (>32k identity)",
                      raw_x3, cfg2))

    summary = []
    for name, pcd, wcfg in workloads:
        det = GraspDetector(wcfg)
        pts = pcd if isinstance(pcd, np.ndarray) else load_pcd(pcd)
        cloud = det.preprocess_cloud(pts,
                                     view_points=np.zeros((1, 3), np.float32))
        ecfg = det.effective_config(cloud)
        det.cfg = ecfg
        spos, smask = det.sample_cloud(cloud, jax.random.PRNGKey(0))
        _sync((spos, smask))

        lines.append(f"_{name}: cloud {int(np.asarray(cloud.mask).sum())} pts"
                     f" (capacity {cloud.capacity}), search cap "
                     f"{ecfg.search_neighbors_cap}, image cap "
                     f"{ecfg.image_neighbors_cap}_")
        lines.append("")

        neighbors.FORCE_EXACT = False
        jax.clear_caches()
        shipped = run_mode(det, cloud, ecfg, spos, smask)
        print(f"# {name}: shipped p50 {shipped['p50']*1e3:.1f} ms",
              file=sys.stderr)

        neighbors.FORCE_EXACT = True
        jax.clear_caches()
        exact = run_mode(det, cloud, ecfg, spos, smask)
        print(f"# {name}: exact p50 {exact['p50']*1e3:.1f} ms",
              file=sys.stderr)
        neighbors.FORCE_EXACT = False
        jax.clear_caches()

        summary.append((name, compare(name, shipped, exact, lines)))

        if cloud.capacity > 32768:
            # Extra gates for the big-cloud identity path:
            #  (a) legacy fallback (nearest-K at search_neighbors_cap=4096,
            #      what shipped before search_identity_max was raised) —
            #      expected to FLIP candidates vs the uncapped result;
            #  (b) an alternate sample-block size — expected XOR 0 (the
            #      blocked identity evaluation is blocking-invariant).
            from gpd_tpu.detector import candidates_stage
            from gpd_tpu.ops import candidates as cand_mod

            legacy_cfg = dataclasses.replace(
                wcfg, search_identity_max=0, search_neighbors_cap=4096)
            legacy = candidates_stage(cloud, spos, smask, legacy_cfg)
            legacy_valid = np.asarray(legacy.valid)
            legacy_xor = int(np.sum(legacy_valid != shipped["cand_valid"]))

            old_budget = cand_mod._BLOCK_ELEMS
            cand_mod._BLOCK_ELEMS = old_budget // 4
            jax.clear_caches()
            reblocked = candidates_stage(cloud, spos, smask, ecfg)
            reblock_xor = int(np.sum(np.asarray(reblocked.valid)
                                     != shipped["cand_valid"]))
            cand_mod._BLOCK_ELEMS = old_budget
            jax.clear_caches()

            lines.append(f"- legacy nearest-4096 fallback XOR vs uncapped "
                         f"identity: **{legacy_xor}** (the old "
                         f">search_identity_max behavior — the loss the "
                         f"raised limit removes)")
            lines.append(f"- alternate block size (budget/4) XOR: "
                         f"**{reblock_xor}** (expected 0)")
            lines.append("")
            summary[-1][1]["reblock_xor"] = reblock_xor
            print(f"# {name}: legacy-cap XOR {legacy_xor}, reblock XOR "
                  f"{reblock_xor}", file=sys.stderr)

    lines.append("## Verdict")
    lines.append("")
    ok = all(s["xor"] == 0 and s["overlap"] == 10
             and s.get("reblock_xor", 0) == 0 for _, s in summary)
    for name, s in summary:
        lines.append(f"- {name}: candidate XOR {s['xor']}, top-10 "
                     f"{s['overlap']}/10, frame drift {s['fdrift']:.1e}")
    lines.append("")
    lines.append(
        "**PASS**: approximate settings are output-equivalent to exact."
        if ok else
        "**DELTAS PRESENT**: see above; pin recall/k or widen exactness.")

    # Preserve the historical hand-search strategy A/B (r4,
    # tools/bench_search.py) — it is the evidence base for the identity-
    # neighborhood design and must survive regeneration of this file.
    lines += [
        "",
        "## Hand-search neighborhood strategy A/B "
        "(tools/bench_search.py, on-chip, r4)",
        "",
        "table_mug @ 5000 samples, full pipeline; \"valid-XOR\" counts "
        "candidate",
        "validity flips vs the uncapped identity baseline:",
        "",
        "| strategy | candidates | full pipeline | cand/s | valid-XOR |",
        "|---|---|---|---|---|",
        "| identity-16384 (shipped) | 72.6 ms | 258.8 ms | 154,566 | 0 |",
        "| exact nearest-8192 | 151.5 ms | 343.7 ms | 116,369 | 0 |",
        "| exact nearest-6144 | 173.5 ms | 365.4 ms | 109,456 | 0 |",
        "| exact nearest-4096 | 93.9 ms | 284.2 ms | 140,761 | **104** |",
        "",
        "The identity path (whole cloud + in-radius mask, no sort, no "
        "gather) is",
        "both the fastest and the only strategy with zero deviation "
        "headroom: the",
        "search-ball p99 on this scene is ~5.7k points, so nearest-4096 "
        "truncates",
        "real neighborhoods. In r5 the identity path tiles the sample axis "
        "down to",
        "8-row blocks so it runs UNCAPPED at any cloud size "
        "(search_identity_max=131072);",
        "the >32k workload above shows the retired nearest-4096 fallback "
        "would flip",
        "211 candidates on a 48k-point scene.",
    ]

    out_path = os.path.join(REPO, "NEIGHBORS_TPU.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
