"""CLI: train the grasp classifier (reference: pytorch/train_net3.py).

Usage: python -m gpd_tpu.apps.train_net TRAIN_H5 TEST_H5 NUM_CHANNELS
       [EPOCHS] [CHECKPOINT_DIR]
"""

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print("Usage: train_net TRAIN_H5 TEST_H5 NUM_CHANNELS "
              "[EPOCHS] [CHECKPOINT_DIR]")
        return -1

    from gpd_tpu.net.train import train

    train(
        train_path=argv[0],
        test_path=argv[1],
        num_channels=int(argv[2]),
        epochs=int(argv[3]) if len(argv) > 3 else 10,
        checkpoint_dir=argv[4] if len(argv) > 4 else "checkpoints",
        log_file="loss_stats.txt",
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
