"""Descriptor (grasp-image) tests: rasterizer vs a NumPy transcription of
image_strategy.cpp, channel layout checks, shadow statistics, LeNet shapes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpd_tpu.config import ImageGeometry
from gpd_tpu.ops import images as img
from gpd_tpu.net import lenet


def np_unit_and_cells(pts_hand, bottom, center, geom):
    """findPointsInUnitImage + transformPointsToUnitImage + findCellIndices
    oracle (image_strategy.cpp:53-102)."""
    half = geom.outer_diameter / 2.0
    x, y, z = pts_hand[:, 0], pts_hand[:, 1], pts_hand[:, 2]
    ins = ((x > bottom) & (x < bottom + geom.depth) &
           (y > center - half) & (y < center + half) &
           (z > -geom.height) & (z < geom.height))
    u = (x - bottom) / geom.depth
    v = (y - (center - half)) / geom.outer_diameter
    w = (z + geom.height) / (2 * geom.height)
    unit = np.stack([u, v, w], 1)
    return unit, ins


def np_depth_image(unit, ins, geom):
    """createDepthImage oracle (image_strategy.cpp:158-191)."""
    size = geom.size
    cell_v = np.minimum(np.floor(unit[:, 0] * size).astype(int), size - 1)
    cell_h = np.minimum(np.floor(unit[:, 1] * size).astype(int), size - 1)
    sums = np.zeros((size, size))
    cnts = np.zeros((size, size))
    for i in np.nonzero(ins)[0]:
        r, c = size - 1 - cell_v[i], cell_h[i]
        sums[r, c] += unit[i, 2]
        cnts[r, c] += 1
    im = np.where(cnts > 0, 1.0 - sums / np.maximum(cnts, 1), 0.0)
    # dilate 3x3
    dil = np.full_like(im, -np.inf)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            sh = np.full_like(im, -np.inf)
            r0, r1 = max(0, dr), min(60, 60 + dr)
            c0, c1 = max(0, dc), min(60, 60 + dc)
            sh[r0:r1, c0:c1] = im[r0 - dr:r1 - dr, c0 - dc:c1 - dc]
            dil = np.maximum(dil, sh)
    mn, mx = dil.min(), dil.max()
    out = (dil - mn) / (mx - mn) if mx > mn else np.zeros_like(dil)
    return np.rint(out * 255).astype(np.uint8)


def _np_dilate3(im):
    dil = np.full_like(im, -np.inf)
    n = im.shape[0]
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            sh = np.full_like(im, -np.inf)
            r0, r1 = max(0, dr), min(n, n + dr)
            c0, c1 = max(0, dc), min(n, n + dc)
            sh[r0:r1, c0:c1] = im[r0 - dr:r1 - dr, c0 - dc:c1 - dc]
            dil = np.maximum(dil, sh)
    return dil


def _np_minmax_u8(im):
    mn, mx = im.min(), im.max()
    out = (im - mn) / (mx - mn) if mx > mn else np.zeros_like(im)
    return np.rint(out * 255).astype(np.uint8)


def np_normals_image(unit, ins, absn, geom, blend: bool):
    """createNormalsImage oracle (image_strategy.cpp:124-156).

    blend=True transcribes the reference's order-dependent incremental
    blend; blend=False is the documented order-independent per-cell mean
    the TPU rasterizer uses (gpd_tpu/ops/images.py module docstring)."""
    size = geom.size
    cv = np.minimum(np.floor(unit[:, 0] * size).astype(int), size - 1)
    ch = np.minimum(np.floor(unit[:, 1] * size).astype(int), size - 1)
    acc = np.zeros((size, size, 3))
    cnt = np.zeros((size, size))
    for i in np.nonzero(ins)[0]:
        r, c = size - 1 - cv[i], ch[i]
        if blend:
            v = acc[r, c]
            if (v == 0).all():
                acc[r, c] = absn[i]
            else:
                acc[r, c] = v + (absn[i] - v) / np.sqrt((v * v).sum())
        else:
            cnt[r, c] += 1
            acc[r, c] += (absn[i] - acc[r, c]) / cnt[r, c]
    dil = np.stack([_np_dilate3(acc[:, :, k]) for k in range(3)], -1)
    # Joint minmax over all 3 channels (cv::normalize on a CV_32FC3 Mat).
    return _np_minmax_u8(dil)


def np_shadow_image(sunit, sins, geom):
    """createShadowImage oracle (image_strategy.cpp:193-233): per-cell
    running mean of depth, reversed against the max over nonzero cells,
    dilated, minmax-normalized."""
    size = geom.size
    cv = np.minimum(np.floor(sunit[:, 0] * size).astype(int), size - 1)
    ch = np.minimum(np.floor(sunit[:, 1] * size).astype(int), size - 1)
    mean = np.zeros((size, size))
    cnt = np.zeros((size, size))
    for i in np.nonzero(sins)[0]:
        r, c = size - 1 - cv[i], ch[i]
        cnt[r, c] += 1
        mean[r, c] += (sunit[i, 2] - mean[r, c]) / cnt[r, c]
    nonzero = cnt > 0
    mx = mean[nonzero].max() if nonzero.any() else 0.0
    im = np.where(nonzero, mx - mean, 0.0)
    return _np_minmax_u8(_np_dilate3(im))


class TestRasterizer:
    def test_depth_channel_vs_oracle(self, rng):
        geom = ImageGeometry(num_channels=1)
        K = 500
        # Points already in hand frame: identity rotation, sample at origin.
        pts = rng.uniform(-0.06, 0.08, size=(K, 3)).astype(np.float32)
        nrm = rng.normal(size=(K, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        R = np.eye(3, dtype=np.float32)[None]
        out = img.make_images(
            jnp.asarray(pts[None]), jnp.asarray(nrm[None]),
            jnp.ones((1, K), bool), jnp.asarray(R),
            jnp.zeros((1, 3), jnp.float32),
            jnp.asarray([-0.01], jnp.float32), jnp.asarray([0.005], jnp.float32),
            jnp.ones(1, bool), geom)
        got = np.asarray(out)[0, :, :, 0]

        unit, ins = np_unit_and_cells(pts.astype(np.float64), -0.01, 0.005, geom)
        ref = np_depth_image(unit, ins, geom)
        # Allow off-by-one uint8 from f32/f64 rounding at cell boundaries.
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert (diff <= 1).mean() > 0.995, f"max diff {diff.max()}"

    def test_normals_channels_vs_oracle(self, rng):
        """Normals channels match the per-cell-mean oracle exactly; the
        reference's order-dependent blend (image_strategy.cpp:133-142)
        stays within a bounded uint8 divergence — quantifying the
        documented blend->mean design change."""
        geom = ImageGeometry(num_channels=3)
        K = 600
        pts = rng.uniform(-0.06, 0.08, size=(K, 3)).astype(np.float32)
        nrm = rng.normal(size=(K, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        out = img.make_images(
            jnp.asarray(pts[None]), jnp.asarray(nrm[None]),
            jnp.ones((1, K), bool),
            jnp.asarray(np.eye(3, dtype=np.float32)[None]),
            jnp.zeros((1, 3), jnp.float32),
            jnp.asarray([-0.01], jnp.float32),
            jnp.asarray([0.005], jnp.float32),
            jnp.ones(1, bool), geom)
        got = np.asarray(out)[0]

        unit, ins = np_unit_and_cells(pts.astype(np.float64), -0.01, 0.005,
                                      geom)
        absn = np.abs(nrm).astype(np.float64)
        ref_mean = np_normals_image(unit, ins, absn, geom, blend=False)
        diff = np.abs(got.astype(int) - ref_mean.astype(int))
        assert (diff <= 1).mean() > 0.995, f"max diff {diff.max()}"

        ref_blend = np_normals_image(unit, ins, absn, geom, blend=True)
        bdiff = np.abs(got.astype(float) - ref_blend.astype(float))
        # The divergence is real but bounded; it averages out over cells.
        assert bdiff.mean() < 12.0, f"blend divergence mean {bdiff.mean()}"

    def test_shadow_channel_vs_oracle(self, rng):
        """The shadow channel (channel 4 of each projection) matches the
        createShadowImage oracle given identical shadow points."""
        geom = ImageGeometry(num_channels=15)
        K, Ks = 300, 400
        pts = rng.uniform(-0.05, 0.07, size=(K, 3)).astype(np.float32)
        nrm = rng.normal(size=(K, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        spts = rng.uniform(-0.06, 0.08, size=(Ks, 3)).astype(np.float32)
        out = img.make_images(
            jnp.asarray(pts[None]), jnp.asarray(nrm[None]),
            jnp.ones((1, K), bool),
            jnp.asarray(np.eye(3, dtype=np.float32)[None]),
            jnp.zeros((1, 3), jnp.float32),
            jnp.asarray([-0.01], jnp.float32),
            jnp.asarray([0.005], jnp.float32),
            jnp.ones(1, bool), geom,
            shadow_pts=jnp.asarray(spts[None]),
            shadow_valid=jnp.ones((1, Ks), bool))
        got = np.asarray(out)[0, :, :, 4]    # projection 0 shadow channel

        sunit, sins = np_unit_and_cells(spts.astype(np.float64), -0.01,
                                        0.005, geom)
        ref = np_shadow_image(sunit, sins, geom)
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert (diff <= 1).mean() > 0.995, f"max diff {diff.max()}"

    def test_channel_counts(self, rng):
        K = 200
        pts = rng.uniform(-0.05, 0.05, size=(2, K, 3)).astype(np.float32)
        nrm = np.tile(np.array([0, 0, 1.0], np.float32), (2, K, 1))
        R = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
        zeros = np.zeros((2, 3), np.float32)
        for C in (1, 3, 12, 15):
            geom = ImageGeometry(num_channels=C)
            kw = {}
            if C == 15:
                kw = dict(shadow_pts=jnp.asarray(pts),
                          shadow_valid=jnp.ones((2, K), bool))
            out = img.make_images(
                jnp.asarray(pts), jnp.asarray(nrm), jnp.ones((2, K), bool),
                jnp.asarray(R), jnp.asarray(zeros),
                jnp.asarray([-0.01, -0.01], np.float32),
                jnp.asarray([0.0, 0.0], np.float32),
                jnp.ones(2, bool), geom, **kw)
            assert out.shape == (2, 60, 60, C), f"C={C}"
            assert out.dtype == jnp.uint8

    def test_projections_differ(self, rng):
        """12-channel projections must actually view different planes."""
        K = 400
        pts = rng.uniform(-0.015, 0.015, size=(1, K, 3)).astype(np.float32)
        pts[..., 0] = np.abs(pts[..., 0]) * 2  # asymmetric in x
        nrm = np.tile(np.array([1.0, 0, 0], np.float32), (1, K, 1))
        geom = ImageGeometry(num_channels=12)
        out = np.asarray(img.make_images(
            jnp.asarray(pts), jnp.asarray(nrm), jnp.ones((1, K), bool),
            jnp.asarray(np.eye(3, dtype=np.float32)[None]),
            jnp.zeros((1, 3), np.float32),
            jnp.asarray([-0.01], np.float32), jnp.asarray([0.0], np.float32),
            jnp.ones(1, bool), geom))
        d0 = out[0, :, :, 3]
        d1 = out[0, :, :, 7]
        assert not np.array_equal(d0, d1)


class TestShadow:
    def test_single_camera(self, rng):
        geom = ImageGeometry(num_channels=15)
        S, K = 2, 100
        pts = rng.uniform(-0.02, 0.02, size=(S, K, 3)).astype(np.float32)
        cam = np.ones((S, K), np.uint32)
        vp = np.array([[0, 0, 1.0]], np.float32)
        sp, sv = img.compute_shadows(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.ones((S, K), bool),
            jnp.asarray(cam), jnp.asarray(vp),
            jnp.float32(img.shadow_length_of(geom)),
            n_sp=img.num_shadow_points(geom), v_cap=4096)
        sp, sv = np.asarray(sp), np.asarray(sv)
        assert sv.sum() > 0
        # Shadow points lie "behind" the cloud along -z (camera at +z).
        valid_pts = sp[0][sv[0]]
        assert valid_pts[:, 2].mean() < pts[0, :, 2].mean() + 0.01
        # All shadow points within shadow_length + jitter of the cloud.
        assert np.abs(valid_pts).max() < 0.02 + img.shadow_length_of(geom) + 0.01

    def test_num_shadow_points(self):
        assert img.num_shadow_points(ImageGeometry()) == 33

    def test_translation_invariance_far_workspace(self, rng):
        """Voxel keys must not alias for clouds far from the origin
        (regression: the old world-frame 10-bit packing with OFF=512 wrapped
        beyond ~1.5 m): a cloud translated to (2, 2, 0.5) m must yield the
        same shadow voxel pattern, up to the world-anchored trunc() grid
        shift — so compare occupancy counts and relative geometry."""
        geom = ImageGeometry(num_channels=15)
        S, K = 2, 120
        # Base cloud in the positive octant (the reference's cast<int>
        # truncation grid is only shift-equivariant away from the origin —
        # same in C++), shifted to a 2 m workspace.
        pts = (0.3 + rng.uniform(-0.02, 0.02, size=(S, K, 3))).astype(
            np.float32)
        vp = np.array([[0.3, 0.3, 1.3]], np.float32)
        t = np.array([2.0, 2.0, 0.5], np.float32)
        # Multiple of the voxel size so the trunc() grid lands identically
        # and the comparison can be exact.
        t = (np.round(t / img.SHADOW_VOXEL) * img.SHADOW_VOXEL).astype(
            np.float32)
        kwargs = dict(n_sp=img.num_shadow_points(geom), v_cap=4096)
        sp0, sv0 = img.compute_shadows(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.ones((S, K), bool),
            jnp.ones((S, K), np.uint32), jnp.asarray(vp),
            jnp.float32(img.shadow_length_of(geom)), **kwargs)
        sp1, sv1 = img.compute_shadows(
            jax.random.PRNGKey(0), jnp.asarray(pts + t),
            jnp.ones((S, K), bool), jnp.ones((S, K), np.uint32),
            jnp.asarray(vp + t), jnp.float32(img.shadow_length_of(geom)),
            **kwargs)
        sv0, sv1 = np.asarray(sv0), np.asarray(sv1)
        sp0, sp1 = np.asarray(sp0), np.asarray(sp1)
        # Same unique-voxel count up to f32 cell-boundary flips (the old
        # aliased packing collapsed distinct voxels onto shared keys, which
        # slashes the count and scrambles decoded positions).
        n0, n1 = sv0.sum(1), sv1.sum(1)
        assert (np.abs(n0 - n1) <= 0.02 * n0 + 2).all(), (n0, n1)
        # Decoded positions stay near the translated cloud.
        for s in range(S):
            d = np.linalg.norm(sp1[s][sv1[s]] - (pts[s].mean(0) + t), axis=1)
            assert d.max() < img.shadow_length_of(geom) + 0.05

    def test_two_camera_intersection_smaller(self, rng):
        geom = ImageGeometry(num_channels=15)
        S, K = 1, 150
        pts = rng.uniform(-0.02, 0.02, size=(S, K, 3)).astype(np.float32)
        vp2 = np.array([[0, 0, 1.0], [1.0, 0, 0]], np.float32)
        cam_both = np.full((S, K), 3, np.uint32)    # seen by both cameras
        _, sv2 = img.compute_shadows(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.ones((S, K), bool),
            jnp.asarray(cam_both), jnp.asarray(vp2),
            jnp.float32(img.shadow_length_of(geom)),
            n_sp=img.num_shadow_points(geom), v_cap=8192)
        vp1 = vp2[:1]
        cam_one = np.ones((S, K), np.uint32)
        _, sv1 = img.compute_shadows(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.ones((S, K), bool),
            jnp.asarray(cam_one), jnp.asarray(vp1),
            jnp.float32(img.shadow_length_of(geom)),
            n_sp=img.num_shadow_points(geom), v_cap=8192)
        assert int(np.asarray(sv2).sum()) < int(np.asarray(sv1).sum())


class TestLeNet:
    def test_forward_shapes(self, rng):
        params = lenet.init_params(jax.random.PRNGKey(0), 15)
        x = rng.integers(0, 256, size=(7, 60, 60, 15)).astype(np.uint8)
        logits = lenet.forward(params, jnp.asarray(x))
        assert logits.shape == (7, 2)
        s = lenet.score(params, jnp.asarray(x))
        assert s.shape == (7,)

    def test_matches_torch(self, rng):
        """Cross-check the JAX forward against the reference's pytorch Net."""
        torch = pytest.importorskip("torch")
        import torch.nn as nn
        import torch.nn.functional as F

        class Net(nn.Module):  # pytorch/network.py:33-47
            def __init__(self, c):
                super().__init__()
                self.conv1 = nn.Conv2d(c, 20, 5)
                self.pool = nn.MaxPool2d(2, 2)
                self.conv2 = nn.Conv2d(20, 50, 5)
                self.fc1 = nn.Linear(50 * 12 * 12, 500)
                self.fc2 = nn.Linear(500, 2)

            def forward(self, x):
                x = self.pool(F.relu(self.conv1(x)))
                x = self.pool(F.relu(self.conv2(x)))
                x = x.reshape(-1, 7200)
                x = F.relu(self.fc1(x))
                return self.fc2(x)

        net = Net(3).eval()
        params = {
            "conv1_w": jnp.asarray(net.conv1.weight.detach().numpy()),
            "conv1_b": jnp.asarray(net.conv1.bias.detach().numpy()),
            "conv2_w": jnp.asarray(net.conv2.weight.detach().numpy()),
            "conv2_b": jnp.asarray(net.conv2.bias.detach().numpy()),
            "fc1_w": jnp.asarray(net.fc1.weight.detach().numpy()),
            "fc1_b": jnp.asarray(net.fc1.bias.detach().numpy()),
            "fc2_w": jnp.asarray(net.fc2.weight.detach().numpy()),
            "fc2_b": jnp.asarray(net.fc2.bias.detach().numpy()),
        }
        x = rng.integers(0, 256, size=(5, 60, 60, 3)).astype(np.uint8)
        ours = np.asarray(lenet.forward(params, jnp.asarray(x)))
        xt = torch.from_numpy(x).float().permute(0, 3, 1, 2) / 256.0
        with torch.no_grad():
            ref = net(xt).numpy()
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_bin_weight_loader_conv(self, tmp_path, rng):
        """Round-trip the reference .bin format for available files."""
        d = tmp_path / "params"
        d.mkdir()
        arrs = {
            "conv1_weights.bin": rng.normal(size=(20, 15, 5, 5)),
            "conv1_biases.bin": rng.normal(size=20),
            "conv2_weights.bin": rng.normal(size=(50, 20, 5, 5)),
            "conv2_biases.bin": rng.normal(size=50),
            "ip1_weights.bin": rng.normal(size=(500, 7200)),
            "ip1_biases.bin": rng.normal(size=500),
            "ip2_weights.bin": rng.normal(size=(2, 500)),
            "ip2_biases.bin": rng.normal(size=2),
        }
        for name, a in arrs.items():
            a.astype(np.float32).tofile(str(d / name))
        p = lenet.load_params_bin(str(d), 15)
        np.testing.assert_allclose(np.asarray(p["conv1_w"]),
                                   arrs["conv1_weights.bin"], atol=1e-6)
        np.testing.assert_allclose(np.asarray(p["fc2_w"]),
                                   arrs["ip2_weights.bin"], atol=1e-6)

    def test_reference_shipped_conv_weights_load(self):
        """The repo's shipped conv/ip2 .bin blobs parse with correct sizes
        (ip1_weights.bin is a missing large blob in the snapshot)."""
        import os
        d = "/root/reference/models/lenet/15channels/params/"
        w = np.fromfile(os.path.join(d, "conv1_weights.bin"), np.float32)
        assert w.size == 20 * 15 * 5 * 5
        w2 = np.fromfile(os.path.join(d, "conv2_weights.bin"), np.float32)
        assert w2.size == 50 * 20 * 5 * 5


class TestPallasRaster:
    def test_interpret_matches_xla(self, rng):
        """The Pallas rasterizer (interpret mode on CPU) must match the XLA
        fallback path exactly."""
        import jax
        import gpd_tpu.ops.images as img_mod
        G, K, size = 8, 300, 60
        cell = jnp.asarray(rng.integers(0, size * size, (G, K)).astype(np.int32))
        mask = jnp.asarray(rng.random((G, K)) < 0.5)
        vals = jnp.asarray(rng.random((G, K, 3)).astype(np.float32))

        mean_xla, cnt_xla = img_mod._scatter_mean(cell, mask, vals, G, size)

        rows = jnp.where(mask, cell // size, size).astype(jnp.int32)
        cols = jnp.where(mask, cell % size, size).astype(jnp.int32)
        m = mask.astype(jnp.float32)
        aug = jnp.concatenate([vals * m[..., None], m[..., None]], -1)
        import unittest.mock as mock
        with mock.patch.object(img_mod.pl, "pallas_call",
                               functools_partial_interpret(img_mod.pl)):
            out = img_mod._raster_sums_pallas(rows, cols, aug, size)
        sums = np.asarray(out[..., :3]).reshape(G, size * size, 3)
        cnts = np.asarray(out[..., 3]).reshape(G, size * size)
        mean = sums / np.maximum(cnts, 1.0)[..., None]
        np.testing.assert_allclose(np.asarray(cnt_xla), cnts, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mean_xla), mean, atol=1e-5)


def functools_partial_interpret(pl_mod):
    import functools
    orig = pl_mod.pallas_call

    def wrapper(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)
    return wrapper
