"""Worker for the 2-process jax.distributed test (run by test_multihost.py).

Usage: python multihost_worker.py PORT PROCESS_ID OUT_JSON

Each process: initializes jax.distributed against a localhost coordinator,
builds the global 2x2-device CPU mesh, runs (a) a global psum over a
process-sharded array, (b) a detection round on its shard_work slice of a
sample work-list with process_allgather of the merged survivors — the
multi-host execution model of gpd_tpu.parallel.multihost.
"""

import json
import os
import sys


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    # The harness forces its TPU platform via sitecustomize env; the only
    # effective in-process override is jax.config before first backend use
    # (see tests/conftest.py). 2 virtual CPU devices per process.
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from gpd_tpu.parallel import multihost
    multihost.initialize(f"127.0.0.1:{port}", num_processes=2,
                         process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    res = {"pid": pid}
    res["process_count"] = jax.process_count()
    res["global_devices"] = jax.device_count()
    res["local_devices"] = jax.local_device_count()

    # (a) Global collective over the 2-host x 2-device mesh: psum of a
    # process-sharded array must see every host's contribution.
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    local = np.full((2, 1), float(pid + 1), np.float32)   # 2 rows per host
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("dp"))

    def f(x):
        return jax.lax.psum(jnp.sum(x), "dp")

    tot = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("dp"),
                                out_specs=P()))(garr)
    # Replicated output: every host reads its local shard.
    res["psum"] = float(np.asarray(tot.addressable_data(0)))

    # (b) Sharded detection work: each host detects on its shard_work slice
    # of the sample list; survivors merge with process_allgather.
    from gpd_tpu.config import DetectorConfig
    from gpd_tpu.core.types import CloudArrays
    from gpd_tpu.detector import GraspDetector, detect_core

    rng = np.random.default_rng(7)
    n = 1200
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                    rng.uniform(-0.05, 0.05, n)], 1).astype(np.float32)
    nrm = np.stack([np.cos(theta), np.sin(theta), np.zeros(n)],
                   1).astype(np.float32)
    cloud = CloudArrays.from_numpy(pts, normals=nrm)
    cfg = DetectorConfig(search_neighbors_cap=256, frame_neighbors_cap=32,
                         normals_neighbors_cap=32, shadow_voxel_cap=256,
                         image_geometry=__import__(
                             "gpd_tpu.config", fromlist=["ImageGeometry"]
                         ).ImageGeometry(num_channels=3),
                         min_inliers=0, num_selected=10)
    det = GraspDetector(cfg)

    all_samples = list(range(16))
    mine = multihost.shard_work(all_samples)
    res["my_items"] = mine
    spos = jnp.asarray(pts[np.asarray(mine, np.int64)])
    smask = jnp.ones(len(mine), bool)
    g, _ = detect_core(cloud, spos, smask, det.params, jax.random.PRNGKey(0),
                       cfg, det.image_cap(len(mine)), scores_only=True)
    local_valid = np.asarray(g.valid)
    local_pos = np.asarray(g.position)[local_valid]
    merged_counts = multihost_utils.process_allgather(
        jnp.asarray([int(local_valid.sum())]))
    res["local_valid"] = int(local_valid.sum())
    res["merged_counts"] = [int(x) for x in np.asarray(merged_counts).ravel()]
    res["local_pos_norm_max"] = float(
        np.abs(local_pos).max() if len(local_pos) else 0.0)

    # (c) One CEM round over the GLOBAL 2-host x 2-device mesh: per-round
    # candidate evaluation shards the sample axis across all 4 devices
    # (candidates_sharded_raw), the mixture refit consumes the all-gathered
    # survivor set, and classification runs sharded at the final prune —
    # the multi-host story for the L4 loop (SURVEY.md §5).
    from gpd_tpu.cem import SequentialImportanceSampling
    from gpd_tpu.config import CEMConfig

    cem = CEMConfig(num_init_samples=4, num_iterations=1,
                    num_samples_per_iteration=8, min_score=-1e9)
    sis = SequentialImportanceSampling(det, cem, mesh=mesh)
    cem_out = sis.detect(cloud, key=jax.random.PRNGKey(1), verbose=False)
    res["cem_valid"] = int(np.asarray(jnp.sum(cem_out.valid)))

    # (d) 2-shard data generation: the (object, view) work-list round-robins
    # across processes, each host writing its own HDF5 shard; merged row
    # counts must cover the whole list (the multi-host story for L4').
    import tempfile
    from gpd_tpu.core.types import CloudArrays as CA
    from gpd_tpu.datagen import DataGenConfig, DataGenerator, HDF5ShardWriter
    from gpd_tpu.datasets import synthetic as syn

    gen_rng = np.random.default_rng(11)
    items = []
    for name, mpts, mnrm in syn.object_zoo(2, seed=3, points_per_object=2500):
        mesh_c = CA.from_numpy(mpts, normals=mnrm,
                               view_points=np.zeros((1, 3), np.float32))
        cam = syn.view_cameras(gen_rng, 1)[0]
        vpts = syn.render_view(gen_rng, mpts, mnrm, cam)
        view_c = det.preprocess_cloud(vpts, view_points=cam.reshape(1, 3))
        items.append((name, 0, view_c, mesh_c))

    gcfg = DataGenConfig(min_grasps_per_view=4, max_grasps_per_view=50,
                         num_samples=16, test_views=())
    import dataclasses
    det_dg = GraspDetector(dataclasses.replace(cfg, num_samples=16),
                           params=det.params)
    gen = DataGenerator(det_dg, gcfg)
    shard_dir = os.path.join(os.path.dirname(out_path), "dgen")
    os.makedirs(shard_dir, exist_ok=True)
    wtr = HDF5ShardWriter(os.path.join(shard_dir, f"train_{pid}.h5"),
                          image_size=cfg.image_geometry.size,
                          channels=cfg.image_geometry.num_channels)
    gen.generate(items, wtr, seed=5, process_index=pid, process_count=2)
    my_rows = int(wtr.h5["labels"].shape[0])
    my_items_dg = sorted(wtr.done)
    wtr.close()
    merged_rows = multihost_utils.process_allgather(jnp.asarray([my_rows]))
    res["dgen_rows"] = my_rows
    res["dgen_items"] = [list(t) for t in my_items_dg]
    res["dgen_merged_rows"] = [int(x)
                               for x in np.asarray(merged_rows).ravel()]

    with open(out_path, "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
