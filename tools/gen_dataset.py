"""Generate a labeled grasp-image training set from the synthetic object zoo.

The TPU-native stand-in for the reference's `generate_data` over BigBIRD
(reference: src/gpd/data_generator.cpp:73-277, src/generate_data.cpp): each
(object, view) pair runs candidates + descriptors on the partial view cloud
and labels each candidate by re-evaluating it against the object's dense
ground-truth cloud, then balances 50/50 and appends to train/test HDF5.

    python tools/gen_dataset.py OUT_DIR [num_objects] [views_per_object]

Writes OUT_DIR/train.h5 and OUT_DIR/test.h5 (reference dataset layout:
'images' (N, 60, 60, C) uint8, 'labels' (N, 1) uint8).
"""

import dataclasses
import os
import sys
import time

import numpy as np


VIEW_CAPACITY = int(os.environ.get("GPD_VIEW_CAPACITY", 4096))
                         # fixed padding -> one detect_core compile for all
                         # views (remote compiles are minutes each)
NUM_SAMPLES = int(os.environ.get("GPD_NUM_SAMPLES", 300))


def build_items(det, num_objects: int, views_per_object: int, seed: int = 0):
    """Work-list of (name, view_id, view CloudArrays, mesh CloudArrays)."""
    import jax
    from gpd_tpu.core.types import CloudArrays
    from gpd_tpu.datasets import synthetic as syn

    rng = np.random.default_rng(seed + 1)
    for name, mpts, mnrm in syn.object_zoo(num_objects, seed=seed):
        mesh = CloudArrays.from_numpy(
            mpts, normals=mnrm,
            view_points=np.zeros((1, 3), np.float32))
        cams = syn.view_cameras(rng, views_per_object)
        for v in range(views_per_object):
            vpts = syn.render_view(rng, mpts, mnrm, cams[v])
            if len(vpts) < 200:
                continue
            view = det.preprocess_cloud(
                vpts, view_points=cams[v].reshape(1, 3),
                capacity=VIEW_CAPACITY)
            yield name, v, view, mesh


def main():
    import jax
    if os.environ.get("GPD_FORCE_CPU"):
        # In-process override (env JAX_PLATFORMS=cpu does not stick under the
        # axon sitecustomize, CLAUDE.md); effective until first backend use.
        jax.config.update("jax_platforms", "cpu")

    from gpd_tpu.config import load_config
    from gpd_tpu.datagen import DataGenConfig, DataGenerator, HDF5ShardWriter
    from gpd_tpu.detector import GraspDetector

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gpd_dataset"
    num_objects = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    views_per_object = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(out_dir, exist_ok=True)

    cfg = load_config("/root/reference/cfg/eigen_params.cfg")
    cfg = dataclasses.replace(cfg, num_samples=NUM_SAMPLES, min_inliers=0,
                              weights_file="")
    det = GraspDetector(cfg)

    gen_cfg = DataGenConfig(min_grasps_per_view=30, max_grasps_per_view=400,
                            num_views_per_object=views_per_object,
                            test_views=(views_per_object - 1,))
    gen = DataGenerator(det, gen_cfg)

    C = cfg.image_geometry.num_channels
    size = cfg.image_geometry.size
    wtrain = HDF5ShardWriter(os.path.join(out_dir, "train.h5"), size, C)
    wtest = HDF5ShardWriter(os.path.join(out_dir, "test.h5"), size, C)

    t0 = time.time()
    items = build_items(det, num_objects, views_per_object)
    gen.generate(items, wtrain, writer_test=wtest)
    wtrain.shuffle_in_place()
    wtest.shuffle_in_place()
    ntr = wtrain.h5["labels"].shape[0]
    nte = wtest.h5["labels"].shape[0]
    wtrain.close()
    wtest.close()
    print(f"done: train={ntr} test={nte} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
