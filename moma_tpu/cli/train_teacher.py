"""CLI: supervised teacher / vanilla-student training.

Mirrors the reference `train_teacher.py` flags (reference :35-118) on a
TPU mesh.  Usage:

    python -m moma_tpu.cli.train_teacher --model resnet32x4 --dataset cifar100 \
        --data_dir ./data --epochs 240 --learning_rate 0.05 --cosine

    python -m moma_tpu.cli.train_teacher --synthetic --epochs 2   # smoke
"""

from __future__ import annotations

import sys

from moma_tpu.core.config import parse_teacher_args
from moma_tpu.train.teacher import run_teacher


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = "--synthetic" in argv
    if synthetic:
        argv.remove("--synthetic")
    cfg = parse_teacher_args(argv)
    _, result = run_teacher(cfg, synthetic=synthetic)
    print(f"done: best val acc {result['best_acc']:.2f} f1 {result['best_f1']:.4f}")
    return result


if __name__ == "__main__":
    main()
