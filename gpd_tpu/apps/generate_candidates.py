"""CLI: generate grasp candidates only, no CNN scoring
(reference: src/generate_candidates.cpp).

Usage: python -m gpd_tpu.apps.generate_candidates CONFIG_FILE PCD_FILE [OUT_CSV]
"""

import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("Usage: generate_candidates CONFIG_FILE PCD_FILE [OUT_CSV]")
        return -1

    import jax
    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector
    from gpd_tpu.io.pcd import load_cloud_file
    from gpd_tpu.ops import candidates as cand
    from gpd_tpu.core.types import write_grasps_csv

    cfg = load_config(argv[0])
    detector = GraspDetector(cfg)
    points = load_cloud_file(argv[1])
    vp = np.asarray(cfg.camera_position, np.float32).reshape(1, 3)
    cloud = detector.preprocess_cloud(points, view_points=vp,
                                      capacity="serve")
    spos, smask = detector.sample_cloud(cloud, jax.random.PRNGKey(0))
    grasps = cand.search_hands(cloud, spos, smask, cfg)
    n = int(np.asarray(grasps.valid).sum())
    nfull = int(np.asarray(grasps.full_antipodal).sum())
    print(f"Generated {n} grasp candidates ({nfull} full-antipodal).")
    if len(argv) > 2:
        write_grasps_csv(argv[2], grasps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
