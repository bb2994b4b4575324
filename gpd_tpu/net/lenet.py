"""LeNet grasp classifier — single JAX forward over the whole candidate batch.

Replaces the reference's three interchangeable CNN backends
(reference: src/gpd/net/classifier.cpp:4-34 factory; eigen_classifier.cpp
hand-rolled Eigen forward; caffe_classifier.cpp; openvino_classifier.cpp)
with one XLA program. Architecture (pytorch/network.py:32-47 ==
models/caffe/15channels/lenet_15_channels.prototxt == eigen_classifier.cpp):

    conv(C->20, 5x5) -> maxpool2 -> conv(20->50, 5x5) -> maxpool2
    -> fc(7200->500) -> ReLU -> fc(500->2)

Note the reference's backends disagree about activations: the pytorch
trainer applies ReLU after each conv (network.py:41-47) while the Eigen
backend does not (eigen_classifier.cpp:81-128). The canonical forward here
follows the *training* network (ReLU after convs); `conv_relu=False`
reproduces the Eigen backend for weight-compat checks.

Score = logit(positive) - logit(negative) (eigen_classifier.cpp:74).

Input convention follows the training pipeline (pytorch/hdf5_dataset.py:18):
uint8 HWC images scaled by 1/256.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


def init_params(key: jax.Array, num_channels: int = 15,
                image_size: int = 60) -> Params:
    """He-style init for the LeNet tower."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = (image_size - 4) // 2
    s = (s - 4) // 2
    flat = 50 * s * s

    def he(k, shape, fan_in):
        return jax.random.normal(k, shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    return {
        "conv1_w": he(k1, (20, num_channels, 5, 5), num_channels * 25),
        "conv1_b": jnp.zeros(20),
        "conv2_w": he(k2, (50, 20, 5, 5), 20 * 25),
        "conv2_b": jnp.zeros(50),
        "fc1_w": he(k3, (500, flat), flat),
        "fc1_b": jnp.zeros(500),
        "fc2_w": he(k4, (2, 500), 500),
        "fc2_b": jnp.zeros(2),
    }


def init_params_ccfff(key: jax.Array, num_channels: int = 15,
                      image_size: int = 60,
                      hidden: Tuple[int, int] = (120, 84)) -> Params:
    """The reference's NetCCFFF 3-fc variant (pytorch/network.py:13-30):
    conv-conv-fc-fc-fc with an extra hidden layer."""
    ks = jax.random.split(key, 5)
    s = (image_size - 4) // 2
    s = (s - 4) // 2
    flat = 50 * s * s

    def he(k, shape, fan_in):
        return jax.random.normal(k, shape, jnp.float32) * np.sqrt(2.0 / fan_in)

    return {
        "conv1_w": he(ks[0], (20, num_channels, 5, 5), num_channels * 25),
        "conv1_b": jnp.zeros(20),
        "conv2_w": he(ks[1], (50, 20, 5, 5), 20 * 25),
        "conv2_b": jnp.zeros(50),
        "fc1_w": he(ks[2], (hidden[0], flat), flat),
        "fc1_b": jnp.zeros(hidden[0]),
        "fc2_w": he(ks[3], (hidden[1], hidden[0]), hidden[0]),
        "fc2_b": jnp.zeros(hidden[1]),
        "fc3_w": he(ks[4], (2, hidden[1]), hidden[1]),
        "fc3_b": jnp.zeros(2),
    }


@functools.partial(jax.jit, static_argnames=("conv_relu", "compute_dtype"))
def _forward_impl(params: Params, images_u8: jax.Array, conv_relu: bool,
                  compute_dtype) -> jax.Array:
    """NHWC forward: images stay in their native HWC layout (no relayout of
    the big activation tensor); the stored caffe-layout weights (OIHW convs,
    CHW-flattened fc1 columns) are permuted instead — tiny tensors whose
    transposes XLA hoists out of any chunk loop. ~10% faster than NCHW on
    the chip at every batch size (tools/bench_lenet.py)."""
    x = images_u8.astype(jnp.float32) * (1.0 / 256.0)
    x = x.astype(compute_dtype)                                 # NHWC

    def conv(x, w, b):
        # Inputs in compute_dtype with f32 accumulation: full MXU rate, and
        # the uint8/256 input quantization already dwarfs bf16 rounding.
        y = jax.lax.conv_general_dilated(
            x, jnp.transpose(w, (2, 3, 1, 0)).astype(compute_dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y + b

    def pool2(x):
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def dense(x, w, b):
        y = jax.lax.dot_general(
            x.astype(compute_dtype), w.astype(compute_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return y + b

    x = conv(x, params["conv1_w"], params["conv1_b"])
    if conv_relu:
        x = jnp.maximum(x, 0.0)
    x = pool2(x)
    x = conv(x.astype(compute_dtype), params["conv2_w"], params["conv2_b"])
    if conv_relu:
        x = jnp.maximum(x, 0.0)
    x = pool2(x)
    # fc1 weights are (500, C*H*W) over a CHW flatten; the NHWC activation
    # flattens HWC, so permute the weight columns to match.
    s = x.shape[1]
    n1 = params["fc1_w"].shape[0]          # 500 (Net) or hidden[0] (NetCCFFF)
    w1 = params["fc1_w"].reshape(n1, -1, s, s)
    w1 = jnp.transpose(w1, (0, 2, 3, 1)).reshape(n1, -1)
    x = x.reshape(x.shape[0], -1)                           # HWC flatten
    x = dense(x, w1, params["fc1_b"])
    x = jnp.maximum(x, 0.0)
    x = dense(x, params["fc2_w"], params["fc2_b"])
    if "fc3_w" in params:                                   # NetCCFFF
        x = jnp.maximum(x, 0.0)
        x = dense(x, params["fc3_w"], params["fc3_b"])
    return x


def forward(params: Params, images_u8: jax.Array, conv_relu: bool = True,
            compute_dtype=None) -> jax.Array:
    """images_u8: (G, H, W, C) uint8 -> logits (G, 2). Supports both the
    2-fc Net and (when 'fc3_w' is present) the 3-fc NetCCFFF variant.

    compute_dtype: matmul/conv input dtype. Default bfloat16 on accelerator
    backends (the CNN tolerates it — CLAUDE.md precision notes apply to
    geometry, not the classifier), float32 on CPU (keeps oracle tests exact).
    """
    if compute_dtype is None:
        compute_dtype = (jnp.float32 if jax.default_backend() == "cpu"
                         else jnp.bfloat16)
    return _forward_impl(params, images_u8, conv_relu, compute_dtype)


def score(params: Params, images_u8: jax.Array, conv_relu: bool = True) -> jax.Array:
    """Grasp score = positive - negative logit (eigen_classifier.cpp:74)."""
    logits = forward(params, images_u8, conv_relu=conv_relu)
    return logits[:, 1] - logits[:, 0]


def load_params_bin(params_dir: str, num_channels: int = 15) -> Params:
    """Load the reference's raw-float32 weight files
    (eigen_classifier.cpp:28-50,185-204; models/lenet/<C>channels/params/).

    Layouts: conv weights are caffe (O, I, KH, KW) row-major; fc weights are
    (out, in) row-major with CHW-flattened input. Missing files (the repo
    snapshot lacks ip1_weights.bin) raise FileNotFoundError.
    """
    def rd(name, shape):
        path = os.path.join(params_dir, name)
        arr = np.fromfile(path, dtype=np.float32)
        expect = int(np.prod(shape))
        if arr.size != expect:
            raise ValueError(f"{name}: got {arr.size} floats, want {expect}")
        return jnp.asarray(arr.reshape(shape))

    flat = 50 * 12 * 12
    return {
        "conv1_w": rd("conv1_weights.bin", (20, num_channels, 5, 5)),
        "conv1_b": rd("conv1_biases.bin", (20,)),
        "conv2_w": rd("conv2_weights.bin", (50, 20, 5, 5)),
        "conv2_b": rd("conv2_biases.bin", (50,)),
        "fc1_w": rd("ip1_weights.bin", (500, flat)),
        "fc1_b": rd("ip1_biases.bin", (500,)),
        "fc2_w": rd("ip2_weights.bin", (2, 500)),
        "fc2_b": rd("ip2_biases.bin", (2,)),
    }


def load_params_npz(path: str) -> Params:
    # Checkpoints may be stored float16 to halve repo size; compute in f32.
    data = np.load(path)
    return {k: jnp.asarray(data[k].astype(np.float32)) for k in data.files}


def default_params_path(num_channels: int) -> str:
    """Path of the packaged trained checkpoint for a channel count (the
    TPU-native analog of the reference's shipped models/lenet/<C>channels
    weights, eigen_classifier.cpp:28-50)."""
    return os.path.join(os.path.dirname(__file__), "..", "models",
                        f"lenet_{num_channels}ch.npz")


def save_params_npz(path: str, params: Params) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params_torch(path: str) -> Params:
    """Load a pytorch Net state_dict checkpoint (train_net3.py:154-174)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # Strip DataParallel "module." prefixes.
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    return {
        "conv1_w": jnp.asarray(sd["conv1.weight"].numpy()),
        "conv1_b": jnp.asarray(sd["conv1.bias"].numpy()),
        "conv2_w": jnp.asarray(sd["conv2.weight"].numpy()),
        "conv2_b": jnp.asarray(sd["conv2.bias"].numpy()),
        "fc1_w": jnp.asarray(sd["fc1.weight"].numpy()),
        "fc1_b": jnp.asarray(sd["fc1.bias"].numpy()),
        "fc2_w": jnp.asarray(sd["fc2.weight"].numpy()),
        "fc2_b": jnp.asarray(sd["fc2.bias"].numpy()),
    }


def load_params(weights_file: str, num_channels: int = 15) -> Params:
    """Dispatch on weights_file like the reference classifier factory
    (classifier.cpp:17-33): directory -> raw .bin; .npz; .pt/.pth/.pwf ->
    torch; .onnx -> ONNX initializers; .xml -> OpenVINO IR (+ sibling
    .bin); empty -> deterministic random init."""
    if not weights_file:
        return init_params(jax.random.PRNGKey(0), num_channels)
    if os.path.isdir(weights_file):
        return load_params_bin(weights_file, num_channels)
    ext = os.path.splitext(weights_file)[1].lower()
    if ext == ".npz":
        return load_params_npz(weights_file)
    if ext in (".pt", ".pth", ".pwf", ".model"):
        return load_params_torch(weights_file)
    if ext == ".onnx":
        from gpd_tpu.net.onnx_io import load_params_onnx
        return {k: jnp.asarray(v)
                for k, v in load_params_onnx(weights_file).items()}
    if ext == ".xml":
        from gpd_tpu.net.onnx_io import load_params_openvino
        return {k: jnp.asarray(v)
                for k, v in load_params_openvino(weights_file).items()}
    raise ValueError(f"Unrecognized weights file: {weights_file}")
