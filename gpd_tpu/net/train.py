"""Classifier training.

JAX/optax equivalent of the reference training stack
(reference: pytorch/train_net3.py — the canonical trainer per README.md:207):
Adam lr=1e-3 with L2 weight decay 5e-4 (torch-style: decay added to the
gradient before Adam), cross-entropy loss, batch 64, block-wise HDF5
loading, eval + checkpoint per block.

Data parallelism: batches are sharded over all available devices via a
NamedSharding (replacing nn.DataParallel, train_net3.py:97-99); gradients
reduce over ICI automatically.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpd_tpu.net import lenet


def make_optimizer(lr: float = 1e-3, weight_decay: float = 5e-4):
    """torch.optim.Adam(lr, weight_decay) semantics: L2 term enters the
    gradient before the Adam moments (train_net3.py:100-103)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr),
    )


def loss_fn(params, images_u8, labels):
    # Train in float32: the bf16 inference path uses preferred_element_type
    # f32, whose conv transpose (f32 cotangent vs bf16 weights) does not
    # type-check under grad; LeNet is tiny so f32 training costs nothing.
    logits = lenet.forward(params, images_u8, compute_dtype=jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(ce), logits


@functools.partial(jax.jit, static_argnames=("tx",), donate_argnums=(0, 1))
def train_step(params, opt_state, images_u8, labels, tx):
    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, images_u8, labels)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return params, opt_state, loss, acc


@jax.jit
def eval_step(params, images_u8, labels, weight):
    """Per-example-weighted eval so padded tail batches count correctly."""
    logits = lenet.forward(params, images_u8, compute_dtype=jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_sum = jnp.sum(ce * weight)
    hit = (jnp.argmax(logits, -1) == labels) & (weight > 0)
    return loss_sum, jnp.sum(hit.astype(jnp.int32))


class HDF5Dataset:
    """Block-wise HDF5 loader compatible with the reference's dataset format
    (data_generator.cpp:279-304: 'images' (N,60,60,C) uint8, 'labels' (N,1))
    and its max-in-memory blocking (train_net3.py:60-96)."""

    def __init__(self, path: str, max_in_memory: int = 80000):
        import h5py
        self.path = path
        self.max_in_memory = max_in_memory
        with h5py.File(path, "r") as f:
            self.n = f["labels"].shape[0]
            self.image_shape = f["images"].shape[1:]

    def blocks(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        import h5py
        with h5py.File(self.path, "r") as f:
            for start in range(0, self.n, self.max_in_memory):
                end = min(start + self.max_in_memory, self.n)
                images = f["images"][start:end]
                labels = f["labels"][start:end].reshape(-1).astype(np.int32)
                yield images, labels


def _device_batch(mesh: Optional[Mesh], images, labels):
    if mesh is None:
        return jnp.asarray(images), jnp.asarray(labels)
    sh = NamedSharding(mesh, P("dp"))
    return (jax.device_put(jnp.asarray(images), sh),
            jax.device_put(jnp.asarray(labels), sh))


def evaluate(params, dataset: HDF5Dataset, batch_size: int = 256,
             mesh: Optional[Mesh] = None) -> Tuple[float, float]:
    """Accuracy evaluation (network.py:66-88 eval helpers)."""
    total = correct = 0
    loss_sum = 0.0
    for images, labels in dataset.blocks():
        for i in range(0, len(labels), batch_size):
            bi_np = images[i:i + batch_size]
            bl_np = labels[i:i + batch_size]
            n = len(bl_np)
            w_np = np.ones(n, np.float32)
            if n < batch_size:   # pad the tail batch; weight masks the pad
                pad = batch_size - n
                bi_np = np.concatenate(
                    [bi_np, np.zeros((pad,) + bi_np.shape[1:], bi_np.dtype)])
                bl_np = np.concatenate([bl_np, np.zeros(pad, bl_np.dtype)])
                w_np = np.concatenate([w_np, np.zeros(pad, np.float32)])
            bi, bl = _device_batch(mesh, bi_np, bl_np)
            loss, c = eval_step(params, bi, bl, jnp.asarray(w_np))
            total += n
            correct += int(c)
            loss_sum += float(loss)
    if total == 0:
        return float("nan"), float("nan")
    return loss_sum / total, correct / total


def train(train_path: str, test_path: Optional[str], num_channels: int,
          epochs: int = 10, batch_size: int = 64, lr: float = 1e-3,
          weight_decay: float = 5e-4, seed: int = 0,
          checkpoint_dir: Optional[str] = None,
          eval_every_blocks: int = 1,
          data_parallel: bool = True,
          max_in_memory: int = 80000,
          log_file: Optional[str] = None) -> Dict[str, jax.Array]:
    """Full training loop (train_net3.py:60-181)."""
    params = lenet.init_params(jax.random.PRNGKey(seed), num_channels)
    tx = make_optimizer(lr, weight_decay)
    opt_state = tx.init(params)

    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        mesh = Mesh(np.array(jax.devices()), ("dp",))
        # Batch must divide across devices.
        batch_size = max(batch_size, len(jax.devices()))
        batch_size -= batch_size % len(jax.devices())

    ds = HDF5Dataset(train_path, max_in_memory=max_in_memory)
    test_ds = HDF5Dataset(test_path, max_in_memory=max_in_memory) \
        if test_path else None
    rng = np.random.default_rng(seed)
    stats = []

    step = 0
    for epoch in range(epochs):
        t0 = time.time()
        block_i = 0
        for images, labels in ds.blocks():
            perm = rng.permutation(len(labels))
            images, labels = images[perm], labels[perm]
            for i in range(0, len(labels) - batch_size + 1, batch_size):
                bi, bl = _device_batch(mesh, images[i:i + batch_size],
                                       labels[i:i + batch_size])
                params, opt_state, loss, acc = train_step(
                    params, opt_state, bi, bl, tx)
                step += 1
                if step % 100 == 0:
                    stats.append((step, float(loss), float(acc)))
            block_i += 1
            if test_ds is not None and block_i % eval_every_blocks == 0:
                tl, ta = evaluate(params, test_ds, mesh=mesh)
                print(f"epoch {epoch} block {block_i}: test loss {tl:.4f} "
                      f"acc {ta:.4f}")
                if checkpoint_dir:
                    os.makedirs(checkpoint_dir, exist_ok=True)
                    lenet.save_params_npz(
                        os.path.join(checkpoint_dir,
                                     f"lenet_e{epoch}_b{block_i}.npz"), params)
        print(f"epoch {epoch} done in {time.time() - t0:.1f}s")

    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        lenet.save_params_npz(os.path.join(checkpoint_dir, "lenet_final.npz"),
                              params)
    if log_file and stats:
        with open(log_file, "w") as f:
            for s, l, a in stats:
                f.write(f"{s},{l},{a}\n")
    return params
