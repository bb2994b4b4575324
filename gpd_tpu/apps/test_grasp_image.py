"""CLI: descriptor debug path — candidates + grasp image for one sample
(reference: src/tests/test_grasp_image.cpp; README.md:223).

Usage: python -m gpd_tpu.apps.test_grasp_image PCD_FILE SAMPLE_INDEX [OUT_PNG]
"""

import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("Usage: test_grasp_image PCD_FILE SAMPLE_INDEX [OUT_PNG]")
        return -1

    import jax
    import jax.numpy as jnp
    from gpd_tpu.config import DetectorConfig
    from gpd_tpu.detector import GraspDetector, detect_core
    from gpd_tpu.io.pcd import load_cloud_file
    from gpd_tpu import viz

    pcd, sample_idx = argv[0], int(argv[1])
    # Hardcoded params like the reference test (hand 0.01/0.12/0.06/0.02,
    # image 0.10/0.06/0.02/60/15).
    cfg = DetectorConfig(num_samples=1)
    det = GraspDetector(cfg)
    points = load_cloud_file(pcd)
    cloud = det.preprocess_cloud(points,
                                 view_points=np.zeros((1, 3), np.float32))
    cpts = np.asarray(cloud.points)
    mask = np.asarray(cloud.mask)
    sample_idx = min(sample_idx, int(mask.sum()) - 1)
    spos = jnp.asarray(cpts[sample_idx:sample_idx + 1])
    smask = jnp.ones(1, bool)

    key = jax.random.PRNGKey(0)
    grasps, images = detect_core(cloud, spos, smask, det.params, key, cfg, 16)
    valid = np.asarray(grasps.valid)
    print(f"sample {sample_idx}: {int(valid.sum())} valid hand poses")
    for i in np.nonzero(valid)[0]:
        print(f"  orientation {i}: full_antipodal="
              f"{bool(np.asarray(grasps.full_antipodal)[i])} "
              f"half={bool(np.asarray(grasps.half_antipodal)[i])} "
              f"width={float(np.asarray(grasps.width)[i]):.4f}")
    if valid.any():
        first = int(np.nonzero(valid)[0][0])
        out_png = argv[2] if len(argv) > 2 else "grasp_image.png"
        viz.grasp_image_grid(np.asarray(images)[first], out_png)
        print(f"wrote {out_png}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
