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

        out = np.asarray(_raster_sums_pallas(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(aug), size))

        # NumPy reference histogram.
        ref = np.zeros((G, size, size, Cp), np.float32)
        for g in range(G):
            ok = (rows[g] < size) & (cols[g] < size)
            np.add.at(ref[g], (rows[g][ok], cols[g][ok]), aug[g][ok])
        err = np.abs(out - ref).max()
        denom = np.abs(ref).max()
        print(f"Cp={Cp}: max |pallas - numpy| = {err:.3e} "
              f"(rel {err/denom:.3e})")
        assert err < 1e-3, "pallas rasterizer mismatch"

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
