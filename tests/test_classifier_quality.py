"""Trained-classifier quality tests (VERDICT r1 #2/#6).

These run against the packaged checkpoint (gpd_tpu/models/lenet_15ch.npz,
produced by tools/gen_dataset.py + tools/train_classifier.py — the
TPU-native analog of the reference's shipped models/lenet weights,
eigen_classifier.cpp:28-50) and are skipped if it is absent.

1. Scores must correlate with ground truth: AUC of the classifier score
   against full-mesh antipodal labels (reevaluateHypotheses against the
   dense object cloud, the same signal the training labels use).
2. The documented normals blend->mean rasterizer divergence
   (image_strategy.cpp:133-142 vs gpd_tpu/ops/images.py) must be score-
   neutral: swapping the normals channels for the reference's
   order-dependent blend changes the positive-class probability only
   marginally.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpd_tpu.config import ImageGeometry
from gpd_tpu.net import lenet
from gpd_tpu.ops import images as img

from test_images import np_unit_and_cells, np_normals_image

CKPT = lenet.default_params_path(15)

pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT),
    reason="packaged 15-channel checkpoint not trained yet")


def _auc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based AUC (probability a random positive outscores a random
    negative)."""
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    npos = int(labels.sum())
    nneg = len(labels) - npos
    assert npos > 0 and nneg > 0
    return (ranks[labels == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)


class TestTrainedClassifier:
    def test_score_label_auc(self):
        """Classifier scores rank true (full-mesh antipodal) grasps above
        false candidates: AUC well above chance on unseen synthetic objects."""
        from gpd_tpu.config import load_config
        from gpd_tpu.core.types import CloudArrays
        from gpd_tpu.datasets import synthetic as syn
        from gpd_tpu.detector import GraspDetector, detect_core
        from gpd_tpu.ops import candidates as cand

        cfg = load_config("/root/reference/cfg/eigen_params.cfg")
        cfg = dataclasses.replace(cfg, num_samples=80, min_inliers=0,
                                  weights_file="")
        det = GraspDetector(cfg)

        # Held-out objects: seed differs from the training zoo (seed=0).
        rng = np.random.default_rng(99)
        scores, labels = [], []
        for name, mpts, mnrm in syn.object_zoo(3, seed=17):
            mesh = CloudArrays.from_numpy(
                mpts, normals=mnrm, view_points=np.zeros((1, 3), np.float32))
            cam = syn.view_cameras(rng, 1)[0]
            vpts = syn.render_view(rng, mpts, mnrm, cam)
            view = det.preprocess_cloud(vpts, view_points=cam.reshape(1, 3))
            ecfg = det.effective_config(view)
            key = jax.random.PRNGKey(7)
            spos, smask = det.sample_cloud(view, key)
            grasps, _ = detect_core(view, spos, smask, det.params, key, ecfg,
                                    det.image_cap(spos.shape[0]),
                                    scores_only=True)
            lab, _ = cand.reevaluate_hypotheses(mesh, grasps, ecfg)
            n_valid = int(np.asarray(jnp.sum(grasps.valid)))
            scores.append(np.asarray(grasps.score[:n_valid]))
            labels.append(np.asarray(lab[:n_valid]))
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        auc = _auc(scores, labels)
        print(f"score/label AUC over {len(labels)} candidates "
              f"({int(labels.sum())} pos): {auc:.3f}")
        # r4 checkpoint (201k clutter/two-camera set): 0.826 here. The
        # retrain moved the clutter-scene AUC 0.754 -> 0.928 (next test,
        # gated at 0.85) while this single-isolated-object eval held at
        # ~0.82-0.83; the floor is set just under the achieved level.
        assert auc > 0.80, f"trained classifier AUC {auc:.3f} <= 0.80"

    def test_clutter_scene_auc(self):
        """Dense-clutter quality (the reference's serving claim regime,
        README.md:237-244): detect on a two-camera fused capture of a
        multi-object table scene and rank-score against full-scene
        antipodal ground truth (table + neighbor collisions label
        negative). Guards the round-4 clutter/two-camera retraining."""
        from gpd_tpu.config import load_config
        from gpd_tpu.core.types import CloudArrays
        from gpd_tpu.datasets import synthetic as syn
        from gpd_tpu.detector import GraspDetector, detect_core
        from gpd_tpu.ops import candidates as cand

        cfg = load_config("/root/reference/cfg/eigen_params.cfg")
        cfg = dataclasses.replace(cfg, num_samples=120, min_inliers=0,
                                  weights_file="")
        det = GraspDetector(cfg)

        # Held-out scenes: seed differs from the training scene stream
        # (tools/gen_dataset.py uses seed+7 on the training seed).
        rng = np.random.default_rng(1234)
        scores, labels = [], []
        for s in range(2):
            spts, snrm = syn.make_scene(rng, n_objects=3)
            mesh = CloudArrays.from_numpy(
                spts, normals=snrm,
                view_points=np.zeros((1, 3), np.float32))
            cams = syn.view_cameras(rng, 2, dist=0.7)
            vpts, vcam, vps = syn.render_fused_views(rng, spts, snrm, cams,
                                                     occluded=True)
            view = det.preprocess_cloud(vpts, view_points=vps,
                                        cam_source=vcam)
            ecfg = det.effective_config(view)
            key = jax.random.PRNGKey(5 + s)
            spos, smask = det.sample_cloud(view, key)
            grasps, _ = detect_core(view, spos, smask, det.params, key,
                                    ecfg, det.image_cap(spos.shape[0]),
                                    scores_only=True)
            lab, _ = cand.reevaluate_hypotheses(mesh, grasps, ecfg)
            n_valid = int(np.asarray(jnp.sum(grasps.valid)))
            scores.append(np.asarray(grasps.score[:n_valid]))
            labels.append(np.asarray(lab[:n_valid]))
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        auc = _auc(scores, labels)
        print(f"clutter-scene score/label AUC over {len(labels)} candidates "
              f"({int(labels.sum())} pos): {auc:.3f}")
        # r3 single-view-trained checkpoint scored 0.754 here; the r4
        # clutter/two-camera retrain reaches 0.928. Gate at the tightened
        # 0.85 (VERDICT r3 #4) on this distribution — the regime the
        # reference's serving claims are about.
        assert auc > 0.85, f"clutter AUC {auc:.3f} <= 0.85"

    def test_blend_vs_mean_score_delta(self, rng):
        """Quantify the normals blend->mean design change as a score delta:
        rebuild each projection's normals channels with the reference's
        order-dependent blend oracle and compare positive-class
        probabilities under the trained weights."""
        params = lenet.load_params_npz(CKPT)
        geom = ImageGeometry(num_channels=15)
        G, K, Ks = 24, 600, 400

        pts = rng.uniform(-0.06, 0.08, size=(G, K, 3)).astype(np.float32)
        nrm = rng.normal(size=(G, K, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        spts = rng.uniform(-0.06, 0.08, size=(G, Ks, 3)).astype(np.float32)
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (G, 3, 3))
        bottom = np.full(G, -0.01, np.float32)
        center = np.full(G, 0.005, np.float32)

        ours = np.asarray(img.make_images(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.ones((G, K), bool),
            jnp.asarray(R), jnp.zeros((G, 3), jnp.float32),
            jnp.asarray(bottom), jnp.asarray(center), jnp.ones(G, bool),
            geom, shadow_pts=jnp.asarray(spts),
            shadow_valid=jnp.ones((G, Ks), bool)))

        blended = ours.copy()
        for g in range(G):
            unit, ins = np_unit_and_cells(pts[g].astype(np.float64),
                                          float(bottom[g]), float(center[g]),
                                          geom)
            absn = np.abs(nrm[g]).astype(np.float64)
            for pi, p in enumerate(((0, 1, 2), (2, 1, 0), (2, 0, 1))):
                b = np_normals_image(unit[:, p], ins, absn, geom, blend=True)
                blended[g, :, :, 5 * pi:5 * pi + 3] = b

        def pos_prob(batch):
            logits = lenet.forward(params, jnp.asarray(batch))
            return np.asarray(jax.nn.softmax(logits, axis=-1)[:, 1])

        p_ours = pos_prob(ours)
        p_blend = pos_prob(blended)
        delta = np.abs(p_ours - p_blend)
        print(f"blend->mean |dP(pos)|: mean {delta.mean():.4f} "
              f"max {delta.max():.4f}")
        # The divergence must be score-marginal: well inside the margin
        # that would flip top-k selection systematically.
        assert delta.mean() < 0.05, f"mean score delta {delta.mean():.4f}"
        assert delta.max() < 0.25, f"max score delta {delta.max():.4f}"


class TestForeignGeometry:
    """Quality gates on EXTERNALLY-authored geometry (the reference's own
    sensor fixtures) — every other quality number shares its generator with
    the training data (VERDICT r4 weak #6).

    Single-view fixtures have no back surfaces, so FULL-antipodal labels
    are degenerate (no opposing-normal contacts are observable: krylon has
    zero positives at any threshold). The view-cloud-feasible signals are
    (a) the half-antipodal label on the clutter fixture — a noisy but
    reference-authored proxy (antipodal.cpp:6-8) — and (b) cross-seed
    stability of the selected top-10 on krylon."""

    def _detect(self, name, num_samples, sample_above_plane, seed=0,
                num_selected=10):
        from gpd_tpu.config import load_config
        from gpd_tpu.detector import (GraspDetector, detect_core,
                                      select_and_cluster)
        from gpd_tpu.io.pcd import load_pcd

        cfg = load_config("/root/reference/cfg/eigen_params.cfg")
        cfg = dataclasses.replace(cfg, num_samples=num_samples,
                                  sample_above_plane=sample_above_plane,
                                  min_inliers=0, num_selected=num_selected)
        det = GraspDetector(cfg)
        pts = load_pcd(f"/root/reference/tutorials/{name}.pcd")
        cloud = det.preprocess_cloud(pts,
                                     view_points=np.zeros((1, 3), np.float32))
        ecfg = det.effective_config(cloud)
        k = jax.random.PRNGKey(seed)
        spos, smask = det.sample_cloud(cloud, k)
        g, _ = detect_core(cloud, spos, smask, det.params, k, ecfg,
                           det.image_cap(spos.shape[0]), scores_only=True)
        out = select_and_cluster(g, ecfg)
        return g, out

    def test_table_mug_half_antipodal_auc(self):
        """Classifier scores must rank half-antipodal candidates above
        non-antipodal ones on the reference's clutter fixture. Floor 0.55:
        a SANITY gate (the label is a single-view proxy, not grasp
        success), measured 0.60 on the shipped checkpoint."""
        g, _ = self._detect("table_mug", 400, True)
        v = np.asarray(g.valid)
        scores = np.asarray(g.score)[v]
        labels = np.asarray(g.half_antipodal)[v].astype(int)
        assert labels.sum() > 50 and (1 - labels).sum() > 50
        auc = _auc(scores, labels)
        assert auc >= 0.55, f"foreign-geometry half-antipodal AUC {auc:.3f}"

    def test_krylon_top10_cross_seed_stability(self):
        """Top-10 selected grasps from two INDEPENDENT sample sets must
        agree geometrically (>= 7/10 within 5 cm of the other run's
        top-10) and in score level — an end-to-end robustness gate on a
        real sensor cloud with no shared randomness."""
        tops = []
        for seed in (0, 1):
            _, out = self._detect("krylon", 200, False, seed=seed)
            v = np.asarray(out.valid)
            tops.append((np.asarray(out.position)[v][:10],
                         np.asarray(out.score)[v][:10]))
        (pa, sa), (pb, sb) = tops
        assert len(pa) == 10 and len(pb) == 10
        d = np.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=-1)
        close = int(np.sum(np.min(d, axis=1) < 0.05))
        assert close >= 7, f"only {close}/10 top grasps reproduce across seeds"
        assert abs(float(sa.mean()) - float(sb.mean())) < 2.0
