"""CLI: detect grasp poses in a point cloud.

Equivalent of the reference's ``detect_grasps`` app
(reference: src/detect_grasps.cpp): CONFIG_FILE PCD_FILE [NORMALS_FILE].

Usage: python -m gpd_tpu.apps.detect_grasps cfg/eigen_params.cfg cloud.pcd
"""

import sys

import numpy as np


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    # --staged: per-stage runtime report (candidates / descriptors /
    # classification / total, grasp_detector.cpp:313-320) at a small
    # fusion cost; default is the fully fused fast path.
    staged = "--staged" in argv
    if staged:
        argv.remove("--staged")
    if len(argv) < 2:
        print("Error: Not enough input arguments!\n")
        print("Usage: detect_grasps CONFIG_FILE PCD_FILE [NORMALS_FILE] "
              "[OUT_CSV] [--staged]\n")
        print("Detect grasp poses for a point cloud, PCD_FILE (*.pcd), "
              "using parameters from CONFIG_FILE (*.cfg).\n")
        return -1

    config_filename, pcd_filename = argv[0], argv[1]

    import os
    # File checks mirroring the reference (src/detect_grasps.cpp
    # checkFileExists): friendly error + -1, not a traceback.
    for f in [config_filename, pcd_filename] + ([argv[2]] if len(argv) > 2
                                                else []):
        if not os.path.exists(f):
            print(f"File {f} could not be found!")
            return -1

    from gpd_tpu.config import load_config
    from gpd_tpu.detector import GraspDetector
    from gpd_tpu.io.pcd import load_cloud_file, load_normals_csv
    from gpd_tpu.core.types import write_grasps_csv

    cfg = load_config(config_filename)
    detector = GraspDetector(cfg)

    points = load_cloud_file(pcd_filename)
    print(f"Loaded point cloud with {points.shape[0]} points.")
    normals = None
    if len(argv) > 2:
        normals = load_normals_csv(argv[2])
        print(f"Loaded surface normals from file: {argv[2]}")

    vp = np.asarray(cfg.camera_position, np.float32).reshape(1, 3)
    # "serve": octave capacity buckets — repeat invocations on different-
    # sized clouds hit the persistent compile cache instead of recompiling.
    cloud = detector.preprocess_cloud(points, view_points=vp, normals=normals,
                                      capacity="serve")
    print(f"Processed cloud: {int(np.asarray(cloud.mask).sum())} points.")

    grasps = detector.detect(cloud, staged=staged)
    if len(argv) > 3:
        write_grasps_csv(argv[3], grasps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
