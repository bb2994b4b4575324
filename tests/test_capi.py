"""Native C ABI binding tests (native/gpd_c_api.cpp + gpd_tpu/capi.py).

Loads libgpd_tpu_c.so into this (already-initialized, CPU-forced) process
via ctypes and exercises the extern-C surface end to end — the parity check
for the reference's Python binding (src/detect_grasps_python.cpp).
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
LIB = os.path.join(NATIVE, "libgpd_tpu_c.so")


class GpdGrasp(ctypes.Structure):
    _fields_ = [
        ("position", ctypes.c_double * 3),
        ("orientation", ctypes.c_double * 9),
        ("sample", ctypes.c_double * 3),
        ("width", ctypes.c_double),
        ("score", ctypes.c_double),
        ("full_antipodal", ctypes.c_int),
        ("half_antipodal", ctypes.c_int),
    ]


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB):
        r = subprocess.run(["sh", os.path.join(NATIVE, "build.sh")],
                           capture_output=True, text=True)
        if not os.path.exists(LIB):
            pytest.skip(f"could not build libgpd_tpu_c.so: {r.stderr}")
    lib = ctypes.CDLL(LIB)
    lib.gpd_last_error.restype = ctypes.c_char_p
    lib.gpd_detector_create.restype = ctypes.c_int64
    lib.gpd_detector_create.argtypes = [ctypes.c_char_p]
    lib.gpd_detector_destroy.argtypes = [ctypes.c_int64]
    lib.gpd_detect_grasps_in_cloud.restype = ctypes.c_int
    lib.gpd_detect_grasps_in_cloud.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.POINTER(GpdGrasp)),
        ctypes.POINTER(ctypes.c_int)]
    lib.gpd_calc_grasp_descriptors.restype = ctypes.c_int
    lib.gpd_calc_grasp_descriptors.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(GpdGrasp)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.gpd_free.argtypes = [ctypes.c_void_p]
    return lib


@pytest.fixture(scope="module")
def cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("capi") / "capi.cfg"
    p.write_text(
        "num_samples = 16\n"
        "num_orientations = 4\n"
        "voxelize = 0\n"
        "min_inliers = 0\n"
        "num_selected = 10\n"
        "workspace = -1 1 -1 1 -1 1\n"
        "workspace_grasps = -1 1 -1 1 -1 1\n"
        "image_num_channels = 3\n"
    )
    return str(p)


def _cylinder(n=600, seed=0):
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    pts = np.stack([0.03 * np.cos(theta), 0.03 * np.sin(theta),
                    rng.uniform(-0.05, 0.05, n)], 1).astype(np.float32)
    return np.ascontiguousarray(pts)


def test_create_error(lib):
    h = lib.gpd_detector_create(b"/no/such/file.cfg")
    assert h == 0
    assert b"" != lib.gpd_last_error()


def test_detect_in_cloud(lib, cfg_path):
    h = lib.gpd_detector_create(cfg_path.encode())
    assert h > 0, lib.gpd_last_error()
    try:
        pts = _cylinder()
        out = ctypes.POINTER(GpdGrasp)()
        n = ctypes.c_int(-1)
        rc = lib.gpd_detect_grasps_in_cloud(
            h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
            None, 0, None, ctypes.byref(out), ctypes.byref(n))
        assert rc == 0, lib.gpd_last_error()
        assert n.value >= 1
        g = out[0]
        R = np.array(g.orientation).reshape(3, 3)
        # Proper rotation.
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)
        assert np.isfinite(g.score)
        assert 0.0 <= g.width <= 0.12
        assert np.all(np.abs(np.array(g.position)) < 1.0)
        lib.gpd_free(out)
    finally:
        lib.gpd_detector_destroy(h)


def test_calc_descriptors(lib, cfg_path):
    h = lib.gpd_detector_create(cfg_path.encode())
    assert h > 0, lib.gpd_last_error()
    try:
        pts = _cylinder(seed=1)
        out = ctypes.POINTER(GpdGrasp)()
        imgs = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_int(-1)
        size = ctypes.c_int(-1)
        chans = ctypes.c_int(-1)
        rc = lib.gpd_calc_grasp_descriptors(
            h, pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
            None, 0, ctypes.byref(out), ctypes.byref(imgs),
            ctypes.byref(n), ctypes.byref(size), ctypes.byref(chans))
        assert rc == 0, lib.gpd_last_error()
        assert n.value >= 1
        assert size.value == 60 and chans.value == 3
        total = n.value * size.value * size.value * chans.value
        arr = np.ctypeslib.as_array(imgs, shape=(total,))
        assert arr.max() > 0  # something rasterized
        lib.gpd_free(out)
        lib.gpd_free(imgs)
    finally:
        lib.gpd_detector_destroy(h)
