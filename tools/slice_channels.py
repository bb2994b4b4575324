"""Derive a 3-channel training set from a 15-channel one by slicing.

The 15-channel image layout is [proj0: normals x3, depth, shadow; proj1: ...;
proj2: ...] (ops/images.py _raster_kernel; reference:
image_15_channels_strategy.cpp:47-105), and the 3-channel strategy is exactly
proj0's normals image (image_3_channels_strategy.cpp) — so channels 0:3 of a
15-channel dataset ARE the 3-channel dataset. One generation run serves both
classifiers.

    PYTHONPATH=/root/repo python tools/slice_channels.py in.h5 out.h5 [C0 C1]
"""

import sys

import h5py
import numpy as np


def main():
    src, dst = sys.argv[1], sys.argv[2]
    c0 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    c1 = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    block = 8192
    with h5py.File(src, "r") as fi, h5py.File(dst, "w") as fo:
        n, s, _, _ = fi["images"].shape
        shape = (s, s, c1 - c0)
        fo.create_dataset("images", shape=(n,) + shape, dtype=np.uint8,
                          chunks=(1000,) + shape)
        fo.create_dataset("labels", data=fi["labels"][:])
        for i in range(0, n, block):
            fo["images"][i:i + block] = fi["images"][i:i + block, :, :, c0:c1]
    print(f"{dst}: {n} examples, channels [{c0}:{c1}]")


if __name__ == "__main__":
    main()
