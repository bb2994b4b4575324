"""CLI: convert classifier weights between formats
(replaces pytorch/torch_to_onnx.py — the TPU framework consumes npz or torch
checkpoints directly; this converts torch/.bin -> npz).

Usage: python -m gpd_tpu.apps.convert_weights SRC DST.npz [NUM_CHANNELS]
"""

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("Usage: convert_weights SRC DST.npz [NUM_CHANNELS]")
        return -1
    from gpd_tpu.net import lenet

    channels = int(argv[2]) if len(argv) > 2 else 15
    params = lenet.load_params(argv[0], channels)
    lenet.save_params_npz(argv[1], params)
    print(f"wrote {argv[1]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
