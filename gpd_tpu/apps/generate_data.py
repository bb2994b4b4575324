"""CLI: generate labeled training data (reference: src/generate_data.cpp).

Usage: python -m gpd_tpu.apps.generate_data CONFIG_FILE

The config follows cfg/generate_data.cfg: a data root with per-object view
clouds and ground-truth mesh clouds (BigBIRD layout). Progress is journaled
per (object, view); re-running resumes.
"""

import os
import sys

import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 1:
        print("Usage: generate_data CONFIG_FILE")
        return -1

    from gpd_tpu.config import load_config
    from gpd_tpu.datagen import DataGenConfig, DataGenerator, HDF5ShardWriter
    from gpd_tpu.detector import GraspDetector
    from gpd_tpu.io.pcd import load_cloud_file

    cfg = load_config(argv[0])
    gen_cfg = DataGenConfig.from_file(argv[0])
    det = GraspDetector(cfg)
    gen = DataGenerator(det, gen_cfg)

    with open(gen_cfg.objects_file) as f:
        objects = [ln.strip() for ln in f if ln.strip()]
    print(f"Generating data for {len(objects)} objects, "
          f"{gen_cfg.num_views_per_object} views each.")

    def iter_items():
        for obj in objects:
            mesh_path = os.path.join(gen_cfg.data_root, obj, "gt_cloud.pcd")
            mesh_pts = load_cloud_file(mesh_path)
            mesh = det.preprocess_cloud(mesh_pts, capacity="serve")
            for view in range(gen_cfg.num_views_per_object):
                vp = os.path.join(gen_cfg.data_root, obj,
                                  f"view_{view:02d}.pcd")
                if not os.path.exists(vp):
                    continue
                view_cloud = det.preprocess_cloud(load_cloud_file(vp),
                                                  capacity="serve")
                yield obj, view, view_cloud, mesh

    C = cfg.image_geometry.num_channels
    size = cfg.image_geometry.size
    os.makedirs(gen_cfg.output_root, exist_ok=True)
    train_w = HDF5ShardWriter(
        os.path.join(gen_cfg.output_root, "train.h5"), size, C,
        gen_cfg.chunk_size)
    test_w = HDF5ShardWriter(
        os.path.join(gen_cfg.output_root, "test.h5"), size, C,
        gen_cfg.chunk_size)
    try:
        gen.generate(list(iter_items()), train_w, test_w)
        train_w.shuffle_in_place()
    finally:
        train_w.close()
        test_w.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
