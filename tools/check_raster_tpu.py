"""Numerical check of the Pallas rasterizer against a NumPy histogram on the
real device, plus a microbenchmark. (CPU tests exercise the XLA fallback
only, so this is the TPU-side equivalence gate.)

    python tools/check_raster_tpu.py [G] [K]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpd_tpu.ops.images import _raster_sums_pallas

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    size = 60
    for Cp in (5, 2):
        rng = np.random.default_rng(0)
        rows = rng.integers(0, size + 1, size=(G, K)).astype(np.int32)
        cols = rng.integers(0, size + 1, size=(G, K)).astype(np.int32)
        # Mark ~10% invalid with both sentinels like _scatter_mean does.
        inv = rng.random((G, K)) < 0.1
        rows[inv] = size
        cols[inv] = size
        aug = rng.normal(size=(G, K, Cp)).astype(np.float32)

        # NumPy reference histogram.
        ref = np.zeros((G, size, size, Cp), np.float32)
        for g in range(G):
            ok = (rows[g] < size) & (cols[g] < size)
            np.add.at(ref[g], (rows[g][ok], cols[g][ok]), aug[g][ok])
        denom = np.abs(ref).max()
        for prec, tol in ((jax.lax.Precision.HIGHEST, 1e-5),
                          (jax.lax.Precision.DEFAULT, 5e-3)):
            out = np.asarray(_raster_sums_pallas(
                jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(aug),
                size, precision=prec))
            rel = np.abs(out - ref).max() / denom
            print(f"Cp={Cp} {prec}: rel err {rel:.3e}")
            # HIGHEST is the bit-level mode; DEFAULT is one bf16 MXU pass
            # (~2e-3 relative on the value channels, documented in
            # _raster_sums_pallas).
            assert rel < tol, "pallas rasterizer mismatch"

    # Two-output merged-kron kernel vs the same NumPy reference.
    from gpd_tpu.ops.images import _raster_sums_pallas2
    for Cp in (6, 3):
        rng = np.random.default_rng(4)
        rows_a = rng.integers(0, size + 1, size=(G, K)).astype(np.int32)
        rows_b = rng.integers(0, size + 1, size=(G, K)).astype(np.int32)
        cols = rng.integers(0, size + 1, size=(G, K)).astype(np.int32)
        inv = rng.random((G, K)) < 0.1
        rows_a[inv] = size
        rows_b[inv] = size
        cols[inv] = size
        aug = rng.normal(size=(G, K, Cp)).astype(np.float32)
        out2 = np.asarray(_raster_sums_pallas2(
            jnp.asarray(rows_a), jnp.asarray(rows_b), jnp.asarray(cols),
            jnp.asarray(aug), size, precision=jax.lax.Precision.HIGHEST))
        for side, rows in ((0, rows_a), (1, rows_b)):
            ref = np.zeros((G, size, size, Cp), np.float32)
            for g in range(G):
                ok = (rows[g] < size) & (cols[g] < size)
                np.add.at(ref[g], (rows[g][ok], cols[g][ok]), aug[g][ok])
            rel = np.abs(out2[:, side] - ref).max() / np.abs(ref).max()
            print(f"pallas2 Cp={Cp} side={side}: rel err {rel:.3e}")
            assert rel < 1e-5, "pallas2 rasterizer mismatch"

    # End-to-end: shared multi-projection path vs the generic loop on TPU.
    import gpd_tpu.ops.images as img_mod
    rng = np.random.default_rng(5)
    Gh, Kh, Ks = 32, 512, 256
    unit = rng.random((Gh, Kh, 3)).astype(np.float32)
    inside = rng.random((Gh, Kh)) < 0.4
    nrm = rng.normal(size=(Gh, Kh, 3)).astype(np.float32)
    sunit = rng.random((Gh, Ks, 3)).astype(np.float32)
    sins = rng.random((Gh, Ks)) < 0.4
    from gpd_tpu.config import ImageGeometry
    for C in (12, 15):
        geom = ImageGeometry(num_channels=C)
        shared = np.asarray(img_mod._raster_kernel(
            jnp.asarray(unit), jnp.asarray(inside), jnp.asarray(nrm),
            jnp.asarray(sunit), jnp.asarray(sins), geom, C))
        real = img_mod._use_pallas
        img_mod._use_pallas = lambda: False
        try:
            img_mod._raster_kernel.clear_cache()
            generic = np.asarray(img_mod._raster_kernel(
                jnp.asarray(unit), jnp.asarray(inside), jnp.asarray(nrm),
                jnp.asarray(sunit), jnp.asarray(sins), geom, C))
        finally:
            img_mod._use_pallas = real
            img_mod._raster_kernel.clear_cache()
        diff = np.abs(shared.astype(np.int32) - generic.astype(np.int32))
        frac = (diff > 1).mean()
        print(f"{C}ch shared-vs-generic: max u8 diff {diff.max()}, "
              f"frac |diff|>1 = {frac:.2e}")
        # bf16 matmul vs f32 einsum: sub-uint8-step except boundary pixels
        assert frac < 5e-3, "shared multi-projection path diverges"

    # Microbench at bench-like shapes.
    G, K, Cp = 4096, 2048, 5
    rows = jnp.asarray(np.random.default_rng(1).integers(
        0, size, size=(G, K)).astype(np.int32))
    cols = jnp.asarray(np.random.default_rng(2).integers(
        0, size, size=(G, K)).astype(np.int32))
    aug = jnp.asarray(np.random.default_rng(3).normal(
        size=(G, K, Cp)).astype(np.float32))
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT):
        f = jax.jit(lambda r, c, a: _raster_sums_pallas(r, c, a, size,
                                                        precision=prec))
        o = f(rows, cols, aug)
        np.asarray(o.ravel()[:1])
        t0 = time.perf_counter()
        for _ in range(5):
            o = f(rows, cols, aug)
        np.asarray(o.ravel()[:1])
        dt = (time.perf_counter() - t0) / 5
        print(f"raster({G}x{K}x{Cp}) {prec}: {dt*1e3:.2f} ms/call")


if __name__ == "__main__":
    main()
