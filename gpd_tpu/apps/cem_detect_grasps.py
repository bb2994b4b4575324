"""CLI: CEM-based grasp detection (reference: src/cem_detect_grasps.cpp).

Usage: python -m gpd_tpu.apps.cem_detect_grasps CONFIG_FILE PCD_FILE
"""

import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("Usage: cem_detect_grasps CONFIG_FILE PCD_FILE")
        return -1

    from gpd_tpu.config import CEMConfig, load_config
    from gpd_tpu.cem import SequentialImportanceSampling
    from gpd_tpu.detector import GraspDetector
    from gpd_tpu.io.pcd import load_cloud_file

    cfg = load_config(argv[0])
    cem_cfg = CEMConfig.from_file(argv[0])
    detector = GraspDetector(cfg)
    points = load_cloud_file(argv[1])
    vp = np.asarray(cfg.camera_position, np.float32).reshape(1, 3)
    cloud = detector.preprocess_cloud(points, view_points=vp,
                                      capacity="serve")
    sis = SequentialImportanceSampling(detector, cem_cfg)
    sis.detect(cloud)
    return 0


if __name__ == "__main__":
    sys.exit(main())
