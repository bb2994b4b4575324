"""Multi-device / multi-host parallel detection.

The reference is a single-process OpenMP program (SURVEY.md §2 parallelism
inventory); the TPU framework's two first-class axes are:

  - **candidate parallelism** (the "sequence parallel" analog): a cloud's
    sample axis sharded across devices with ``shard_map``; the cloud is
    replicated; each device runs the full detection core on its sample
    shard; survivors are all-gathered for global selection/clustering.
  - **data parallelism**: classifier training batches and data-generation
    (object, view) work items sharded across devices/hosts.

Collectives ride ICI via XLA (`all_gather` of surviving grasp sets, global
top-k after gather, `psum` for CEM sufficient statistics) — there is no
hand-written communication.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpd_tpu.config import DetectorConfig
from gpd_tpu.core.types import CloudArrays, Grasps
from gpd_tpu.detector import (candidates_stage, detect_core,
                              score_candidates, select_and_cluster)


def default_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    import numpy as np
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_samples(mesh: Mesh, sample_pos, sample_mask, axis: str = "dp"):
    """Place samples sharded over the mesh; pads to a multiple of the axis."""
    n = mesh.shape[axis]
    s = sample_pos.shape[0]
    pad = (-s) % n
    if pad:
        sample_pos = jnp.pad(sample_pos, ((0, pad), (0, 0)),
                             constant_values=1e6)
        sample_mask = jnp.pad(sample_mask, (0, pad))
    sharding = NamedSharding(mesh, P(axis))
    return (jax.device_put(sample_pos, sharding),
            jax.device_put(sample_mask, sharding))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


@functools.partial(jax.jit, static_argnames=("cfg", "image_cap", "mesh",
                                             "axis"))
def sharded_detect(cloud: CloudArrays, sample_pos, sample_mask, params,
                   key, cfg: DetectorConfig, image_cap: int, mesh: Mesh,
                   axis: str = "dp") -> Grasps:
    """Candidate-parallel detection: sample axis sharded, cloud replicated.

    Each device evaluates its shard with the full single-chip kernel, then
    the surviving grasp batches concatenate along the sharded axis (an XLA
    all-gather when the result is consumed replicated) and global
    selection/clustering runs on the merged set.
    """
    gshard = detect_sharded_raw(cloud, sample_pos, sample_mask, params, key,
                                cfg, image_cap, mesh, axis)
    return select_and_cluster(gshard, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "image_cap", "mesh",
                                             "axis"))
def detect_sharded_raw(cloud: CloudArrays, sample_pos, sample_mask, params,
                       key, cfg: DetectorConfig, image_cap: int, mesh: Mesh,
                       axis: str = "dp") -> Grasps:
    """Candidate-parallel detect_core WITHOUT selection: each device scores
    its sample shard; the concatenated (all-gathered when consumed
    replicated) Grasps batch comes back for the caller's own outer loop —
    CEM uses this to refit its Gaussian mixture on the merged survivor set
    (the psum/all_gather-of-sufficient-statistics step, SURVEY.md §5;
    reference: sequential_importance_sampling.cpp:112-157)."""
    def local(cloud_l, spos_l, smask_l, params_l, key_l):
        me = jax.lax.axis_index(axis)
        g, _ = detect_core(cloud_l, spos_l, smask_l, params_l,
                           jax.random.fold_in(key_l, me), cfg, image_cap,
                           scores_only=True)
        return g

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )(cloud, sample_pos, sample_mask, params, key)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def candidates_sharded_raw(cloud: CloudArrays, sample_pos, sample_mask,
                           cfg: DetectorConfig, mesh: Mesh,
                           axis: str = "dp") -> Grasps:
    """Candidate-parallel candidates_stage (no descriptors, no CNN): the
    per-round cost shape of the reference's CEM loop
    (sequential_importance_sampling.cpp:112-157 runs candidates-only per
    iteration; classification happens once at the final prune). Sample axis
    sharded; the returned Grasps batch concatenates device shards in axis
    order, so slicing it back with in_specs=P(axis) restores each device's
    own candidates (sample_id stays local to the device's sample shard)."""
    def local(cloud_l, spos_l, smask_l):
        return candidates_stage(cloud_l, spos_l, smask_l, cfg)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(cloud, sample_pos, sample_mask)


@functools.partial(jax.jit, static_argnames=("cfg", "image_cap", "mesh",
                                             "axis"))
def score_sharded_raw(cloud: CloudArrays, grasps: Grasps, sample_pos,
                      sample_mask, params, key, cfg: DetectorConfig,
                      image_cap: int, mesh: Mesh, axis: str = "dp") -> Grasps:
    """Candidate-parallel score_candidates: grasps produced by
    candidates_sharded_raw (same sample shards, same axis order) get their
    descriptors + CNN scores on the device that owns their sample shard —
    the distributed pruneGraspCandidates step of the CEM loop."""
    def local(cloud_l, g_l, spos_l, smask_l, params_l, key_l):
        me = jax.lax.axis_index(axis)
        # Per-shard batches keep the local hand search's sample-major
        # layout, so the scatter-free activity path is safe.
        g, _ = score_candidates(cloud_l, g_l, spos_l, smask_l, params_l,
                                jax.random.fold_in(key_l, me), cfg,
                                image_cap, scores_only=True, canonical=True)
        return g

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )(cloud, grasps, sample_pos, sample_mask, params, key)


def sharded_detect_host(detector, cloud: CloudArrays, sample_pos, sample_mask,
                        key=None, mesh: Optional[Mesh] = None) -> Grasps:
    """Convenience wrapper: build mesh, place data, run sharded_detect."""
    mesh = mesh or default_mesh()
    key = key if key is not None else jax.random.PRNGKey(0)
    spos, smask = shard_samples(mesh, sample_pos, sample_mask)
    cloud_r = replicate(mesh, cloud)
    params_r = replicate(mesh, detector.params)
    n_per_dev = spos.shape[0] // mesh.shape["dp"]
    cap = detector.image_cap(n_per_dev)
    return sharded_detect(cloud_r, spos, smask, params_r, key,
                          detector.cfg, cap, mesh)
