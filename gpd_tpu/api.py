"""Stable functional API.

Equivalent of the reference's C-ABI binding surface
(reference: src/detect_grasps_python.cpp: detectGraspsInCloud :431,
detectGraspsInFile :468, calcGraspDescriptors :579) — in the TPU framework
the Python API *is* the binding, so these are plain functions returning
NumPy structures. Each mirrors one extern-C entry point.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from gpd_tpu.config import DetectorConfig, load_config
from gpd_tpu.detector import GraspDetector, detect_core


def _as_detector(config) -> GraspDetector:
    if isinstance(config, GraspDetector):
        return config
    return GraspDetector(config)


def detect_grasps_in_cloud(config, points: np.ndarray,
                           view_points: Optional[np.ndarray] = None,
                           normals: Optional[np.ndarray] = None,
                           cam_source: Optional[np.ndarray] = None,
                           seed: int = 0) -> List[Dict]:
    """Cloud (N,3) -> list of grasp dicts (detectGraspsInCloud :431)."""
    import jax
    det = _as_detector(config)
    if view_points is None:
        view_points = np.asarray(det.cfg.camera_position,
                                 np.float32).reshape(-1, 3)
    # "serve": octave capacity buckets so a caller streaming varied-size
    # clouds reuses the compiled pipeline (detector.serve_capacity).
    cloud = det.preprocess_cloud(points, view_points=view_points,
                                 normals=normals, cam_source=cam_source,
                                 capacity="serve")
    grasps = det.detect(cloud, key=jax.random.PRNGKey(seed), verbose=False)
    return grasps.to_host_list()


def detect_grasps_in_file(config, pcd_path: str, seed: int = 0) -> List[Dict]:
    """PCD path -> grasps (detectGraspsInFile :468)."""
    from gpd_tpu.io.pcd import load_cloud_file
    det = _as_detector(config)
    return detect_grasps_in_cloud(det, load_cloud_file(pcd_path), seed=seed)


def calc_grasp_descriptors(config, points: np.ndarray,
                           view_points: Optional[np.ndarray] = None,
                           seed: int = 0) -> Tuple[List[Dict], np.ndarray]:
    """Cloud -> (grasps, images (G, s, s, C) uint8)
    (calcGraspDescriptors :579): candidates + their grasp images without
    final selection."""
    import jax
    det = _as_detector(config)
    if view_points is None:
        view_points = np.asarray(det.cfg.camera_position,
                                 np.float32).reshape(-1, 3)
    cloud = det.preprocess_cloud(points, view_points=view_points)
    key = jax.random.PRNGKey(seed)
    spos, smask = det.sample_cloud(cloud, key)
    cap = det.image_cap(spos.shape[0])
    grasps, images = detect_core(cloud, spos, smask, det.params, key,
                                 det.cfg, cap)
    valid = np.asarray(grasps.valid)
    return grasps.to_host_list(), np.asarray(images)[valid]
