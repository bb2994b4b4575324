"""Generate a labeled grasp-image training set from the synthetic object zoo.

The TPU-native stand-in for the reference's `generate_data` over BigBIRD
(reference: src/gpd/data_generator.cpp:73-277, src/generate_data.cpp): each
(object, view) pair runs candidates + descriptors on the partial view cloud
and labels each candidate by re-evaluating it against the object's dense
ground-truth cloud, then balances 50/50 and appends to train/test HDF5.

Round-4 distribution matches the reference's claims (README.md:237-244
dense clutter; data_generator.cpp:617-665 multi-view fusion):
  - single-object items alternate 1-camera and 2-camera FUSED views
    (synthetic.render_fused_views — the analog of createMultiViewCloud),
  - multi-object TABLE SCENES (2-4 objects on a plane, synthetic.make_scene)
    captured with 2 fused cameras and occlusion-aware rendering; their
    ground truth includes the table and neighboring objects, so
    collision-with-clutter labels negative.

    python tools/gen_dataset.py OUT_DIR [num_objects] [views_per_object] \
        [num_scenes]

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
                         # single-object views (remote compiles are minutes)
SCENE_VIEW_CAPACITY = int(os.environ.get("GPD_SCENE_VIEW_CAPACITY", 12288))
MESH_CAPACITY = int(os.environ.get("GPD_MESH_CAPACITY", 6144))
SCENE_MESH_CAPACITY = int(os.environ.get("GPD_SCENE_MESH_CAPACITY", 33792))
NUM_SAMPLES = int(os.environ.get("GPD_NUM_SAMPLES", 300))


def _mesh_arrays(mpts, mnrm, capacity):
    from gpd_tpu.core.types import CloudArrays
    return CloudArrays.from_numpy(
        mpts, normals=mnrm, view_points=np.zeros((1, 3), np.float32),
        capacity=capacity)


def _fit_capacity(rng, vpts, vcam, cap):
    """Random downsample a raw rendered view to the pinned capacity (the
    synthetic sensor's resolution limit): fused 2-camera captures can
    exceed it before voxelization."""
    if len(vpts) > cap:
        idx = rng.choice(len(vpts), cap, replace=False)
        vpts = vpts[idx]
        vcam = None if vcam is None else vcam[idx]
    return vpts, vcam


def build_items(det, num_objects: int, views_per_object: int, seed: int = 0,
                num_scenes: int = 0):
    """Work-list of (name, view_id, view CloudArrays, mesh CloudArrays).

    Single objects: odd views render TWO fused cameras (multi-camera
    normals orientation + shadow intersection see real 2-cam statistics).
    Scenes: every capture is 2 fused cameras with occlusion rendering.

    Scene items stream FIRST: they are the scarcer signal, so a run cut
    short (or resumed) always has full clutter coverage.
    """
    from gpd_tpu.datasets import synthetic as syn

    srng = np.random.default_rng(seed + 7)
    for s in range(num_scenes):
        spts, snrm = syn.make_scene(srng)
        mesh = _mesh_arrays(spts, snrm, SCENE_MESH_CAPACITY)
        cams = syn.view_cameras(srng, 2 * views_per_object, dist=0.7)
        for v in range(views_per_object):
            vpts, vcam, vps = syn.render_fused_views(
                srng, spts, snrm, cams[2 * v:2 * v + 2], occluded=True)
            if len(vpts) < 500:
                continue
            vpts, vcam = _fit_capacity(srng, vpts, vcam, SCENE_VIEW_CAPACITY)
            view = det.preprocess_cloud(
                vpts, view_points=vps, cam_source=vcam,
                capacity=SCENE_VIEW_CAPACITY)
            yield f"scene_{s:03d}", v, view, mesh

    rng = np.random.default_rng(seed + 1)
    for name, mpts, mnrm in syn.object_zoo(num_objects, seed=seed):
        mesh = _mesh_arrays(mpts, mnrm, MESH_CAPACITY)
        cams = syn.view_cameras(rng, 2 * views_per_object)
        for v in range(views_per_object):
            if v % 2 == 1:
                vpts, vcam, vps = syn.render_fused_views(
                    rng, mpts, mnrm, cams[2 * v:2 * v + 2], occluded=False)
            else:
                vpts = syn.render_view(rng, mpts, mnrm, cams[2 * v])
                vcam, vps = None, cams[2 * v].reshape(1, 3)
            if len(vpts) < 200:
                continue
            vpts, vcam = _fit_capacity(rng, vpts, vcam, VIEW_CAPACITY)
            view = det.preprocess_cloud(
                vpts, view_points=vps, cam_source=vcam,
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
    num_scenes = int(sys.argv[4]) if len(sys.argv) > 4 else \
        max(num_objects // 3, 1)
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
    items = build_items(det, num_objects, views_per_object,
                        num_scenes=num_scenes)
    total = (num_objects + num_scenes) * views_per_object
    gen.generate(items, wtrain, writer_test=wtest, total_items=total)
    wtrain.shuffle_in_place()
    wtest.shuffle_in_place()
    ntr = wtrain.h5["labels"].shape[0]
    nte = wtest.h5["labels"].shape[0]
    wtrain.close()
    wtest.close()
    print(f"done: train={ntr} test={nte} in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
