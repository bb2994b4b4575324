"""CLI: label candidates from a view cloud against a ground-truth mesh cloud
(reference: src/label_grasps.cpp).

Usage: python -m gpd_tpu.apps.label_grasps CONFIG_FILE PCD_FILE MESH_PCD_FILE
"""

import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print("Usage: label_grasps CONFIG_FILE PCD_FILE MESH_PCD_FILE")
        return -1

    import jax
    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector, detect_core
    from gpd_tpu.io.pcd import load_cloud_file
    from gpd_tpu.ops import candidates as cand

    cfg = load_config(argv[0])
    detector = GraspDetector(cfg)
    vp = np.asarray(cfg.camera_position, np.float32).reshape(1, 3)

    view_cloud = detector.preprocess_cloud(load_cloud_file(argv[1]),
                                           view_points=vp)
    mesh_cloud = detector.preprocess_cloud(load_cloud_file(argv[2]),
                                           view_points=vp)

    key = jax.random.PRNGKey(0)
    spos, smask = detector.sample_cloud(view_cloud, key)
    cap = detector.image_cap(spos.shape[0])
    grasps, images = detect_core(view_cloud, spos, smask, detector.params,
                                 key, cfg, cap)
    n = int(np.asarray(grasps.valid).sum())
    print(f"Created {n} grasp candidates with images.")

    labels, relabeled = cand.reevaluate_hypotheses(mesh_cloud, grasps, cfg)
    n_pos = int(np.asarray(labels).sum())
    print(f"Ground-truth antipodal grasps: {n_pos}/{n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
