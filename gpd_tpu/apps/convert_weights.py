"""CLI: convert classifier weights between formats.

Covers the reference's weight-interchange tooling
(reference: pytorch/torch_to_onnx.py; the EigenClassifier raw-.bin loader
eigen_classifier.cpp:28-50): any supported source (raw .bin directory,
torch checkpoint, npz) converts to npz, and `--to-onnx` exports the LeNet
to ONNX (via the baked-in torch, mirroring torch_to_onnx.py:13-26) for
OpenVINO-style deployment elsewhere.

Usage:
  python -m gpd_tpu.apps.convert_weights SRC DST.npz  [NUM_CHANNELS]
  python -m gpd_tpu.apps.convert_weights SRC DST.onnx [NUM_CHANNELS] --to-onnx
"""

import sys


def export_onnx(params, path: str, num_channels: int,
                image_size: int = 60) -> None:
    """Rebuild the LeNet as a torch module from JAX params and export ONNX
    (shapes per pytorch/torch_to_onnx.py:13-26)."""
    import numpy as np
    import torch

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(num_channels, 20, 5)
            self.conv2 = torch.nn.Conv2d(20, 50, 5)
            flat = params["fc1_w"].shape[1]
            self.fc1 = torch.nn.Linear(flat, 500)
            self.fc2 = torch.nn.Linear(500, 2)

        def forward(self, x):
            pool = torch.nn.functional.max_pool2d
            relu = torch.nn.functional.relu
            x = pool(relu(self.conv1(x)), 2)
            x = pool(relu(self.conv2(x)), 2)
            x = x.view(x.shape[0], -1)
            x = relu(self.fc1(x))
            return self.fc2(x)

    net = Net()
    sd = {
        "conv1.weight": params["conv1_w"], "conv1.bias": params["conv1_b"],
        "conv2.weight": params["conv2_w"], "conv2.bias": params["conv2_b"],
        "fc1.weight": params["fc1_w"], "fc1.bias": params["fc1_b"],
        "fc2.weight": params["fc2_w"], "fc2.bias": params["fc2_b"],
    }
    net.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()})
    net.eval()
    dummy = torch.randn(1, num_channels, image_size, image_size)
    # dynamo=False selects the stable TorchScript exporter (the dynamo path
    # needs onnxscript, which is not in the base image).
    torch.onnx.export(net, (dummy,), path, input_names=["input"],
                      output_names=["logits"],
                      dynamic_axes={"input": {0: "batch"},
                                    "logits": {0: "batch"}},
                      dynamo=False)


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    to_onnx = "--to-onnx" in argv
    if to_onnx:
        argv.remove("--to-onnx")
    if len(argv) < 2:
        print("Usage: convert_weights SRC DST.{npz,onnx} [NUM_CHANNELS] "
              "[--to-onnx]")
        return -1
    from gpd_tpu.net import lenet

    channels = int(argv[2]) if len(argv) > 2 else 15
    params = lenet.load_params(argv[0], channels)
    if to_onnx or argv[1].endswith(".onnx"):
        # Self-contained wire-format writer (gpd_tpu.net.onnx_io) — works
        # without the onnx package; the torch exporter path (export_onnx)
        # remains for environments that have onnx installed.
        from gpd_tpu.net.onnx_io import export_params_onnx
        export_params_onnx(params, argv[1], channels)
    else:
        lenet.save_params_npz(argv[1], params)
    print(f"wrote {argv[1]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
