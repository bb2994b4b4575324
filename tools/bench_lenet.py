"""LeNet inference micro-bench on the real chip: layout/dtype/batch sweep.

The classifier is the lowest-MFU stage of detect_core (PROFILE_r3: 0.62%),
so this sweeps the knobs VERDICT round 3 called out:
  - batch (chunk) size: 512 (current image_cap) vs 1k/2k/4k
  - conv layout: NCHW (current, needs a transpose of the uint8 HWC input)
    vs NHWC (TPU-native, no transpose)
  - compute dtype: bf16 vs f32

Prints images/s and effective TFLOP/s per variant. Standalone timings here
pick the candidates; the winner must then be confirmed with
tools/ablate_core.py (fused-path attribution) per CLAUDE.md.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_lenet.py
"""

import functools
import sys
import time

import numpy as np

FLOP_PER_IMAGE = 2 * (56 * 56 * 20 * 15 * 25 + 24 * 24 * 50 * 20 * 25
                      + 7200 * 500 + 500 * 2)


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, n=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from gpd_tpu.net import lenet

    params = lenet.load_params_npz(lenet.default_params_path(15))
    params = {k: jnp.asarray(v) for k, v in params.items()}

    @functools.partial(jax.jit, static_argnames=("dtype",))
    def fwd_nchw(params, img, dtype):
        return lenet._forward_impl(params, img, True, dtype)

    @functools.partial(jax.jit, static_argnames=("dtype",))
    def fwd_nhwc(params, img, dtype):
        x = img.astype(jnp.float32) * (1.0 / 256.0)
        x = x.astype(dtype)

        def conv(x, w, b):
            w = jnp.transpose(w, (2, 3, 1, 0)).astype(dtype)   # OIHW->HWIO
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return y + b

        def pool2(x):
            return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                         (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

        x = jnp.maximum(conv(x, params["conv1_w"], params["conv1_b"]), 0.0)
        x = pool2(x)
        x = jnp.maximum(conv(x.astype(dtype), params["conv2_w"],
                             params["conv2_b"]), 0.0)
        x = pool2(x)
        # fc1 weights are (500, 50*12*12) with CHW-flattened input; the NHWC
        # activation flattens HWC, so permute the weight columns once.
        w1 = params["fc1_w"].reshape(500, 50, 12, 12)
        w1 = jnp.transpose(w1, (0, 2, 3, 1)).reshape(500, -1)
        x = x.reshape(x.shape[0], -1)
        x = jax.lax.dot_general(x.astype(dtype), w1.astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        x = jnp.maximum(x + params["fc1_b"], 0.0)
        x = jax.lax.dot_general(x.astype(dtype), params["fc2_w"].astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return x + params["fc2_b"]

    rng = np.random.default_rng(0)
    for G in (512, 1024, 2048, 4096):
        img = jnp.asarray(rng.integers(0, 256, (G, 60, 60, 15),
                                       dtype=np.uint8))
        sync(img)
        rows = []
        for name, fn, dt in (
            ("nchw/bf16", fwd_nchw, jnp.bfloat16),
            ("nchw/f32", fwd_nchw, jnp.float32),
            ("nhwc/bf16", fwd_nhwc, jnp.bfloat16),
            ("nhwc/f32", fwd_nhwc, jnp.float32),
        ):
            t = timeit(fn, params, img, dt)
            tf = FLOP_PER_IMAGE * G / t / 1e12
            rows.append(f"{name}: {t*1e3:7.2f} ms  {G/t:9.0f} img/s  "
                        f"{tf:6.2f} TFLOP/s")
        print(f"G={G}")
        for r in rows:
            print("  " + r)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
