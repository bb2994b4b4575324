"""Train the grasp classifier and emit the packaged checkpoint.

The TPU-native equivalent of the reference's canonical trainer invocation
(reference: pytorch/train_net3.py __main__ block): train LeNet on an HDF5
dataset produced by tools/gen_dataset.py (or the reference's own
generate_data layout) and save the final parameters where
`gpd_tpu.net.lenet.default_params_path` looks for them.

    PYTHONPATH=/root/repo python tools/train_classifier.py DATA_DIR \
        [epochs] [out.npz]

Checkpoints are stored float16 (halves repo size; load_params_npz upcasts
to float32 at load time).
"""

import os
import sys

import numpy as np


def main():
    import h5py
    import jax
    if os.environ.get("GPD_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from gpd_tpu.net import lenet, train

    data_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gpd_dataset"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    # Batch-queue control: a wall-clock-constrained operator can clamp the
    # epoch count of already-queued trainings without killing the queue.
    # Opt-in only (the override file must be named explicitly — no
    # world-writable /tmp default that could silently under-train a shipped
    # checkpoint), and malformed content fails loudly.
    ov = os.environ.get("GPD_EPOCHS_OVERRIDE_FILE")
    if ov and os.path.exists(ov):
        with open(ov) as f:
            raw = f.read().strip()
        if not raw.isdigit() or int(raw) <= 0:
            raise SystemExit(
                f"GPD_EPOCHS_OVERRIDE_FILE {ov}: expected a positive int, "
                f"got {raw!r}")
        epochs = min(epochs, int(raw))
        print(f"epoch count clamped to {epochs} by {ov}")
    train_path = os.path.join(data_dir, "train.h5")
    test_path = os.path.join(data_dir, "test.h5")

    with h5py.File(train_path, "r") as f:
        num_channels = f["images"].shape[-1]
        n = f["labels"].shape[0]
    out = (sys.argv[3] if len(sys.argv) > 3
           else lenet.default_params_path(num_channels))
    if not out.endswith(".npz"):
        out += ".npz"   # np.savez appends it silently otherwise
    print(f"training on {n} examples ({num_channels} channels), "
          f"{epochs} epochs -> {out}")

    params = train.train(
        train_path, test_path if os.path.exists(test_path) else None,
        num_channels=num_channels, epochs=epochs, batch_size=256,
        checkpoint_dir=None)

    tl, ta = train.evaluate(params, train.HDF5Dataset(test_path)) \
        if os.path.exists(test_path) else (float("nan"), float("nan"))
    print(f"final test loss {tl:.4f} acc {ta:.4f}")

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    np.savez(out, **{k: np.asarray(v).astype(np.float16)
                     for k, v in params.items()})
    print(f"saved {out} ({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
