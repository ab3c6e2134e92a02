"""CLI: knowledge-distillation student training.

Mirrors the union of the reference's train_student_moma.py and
train_student_comparison.py flag surfaces (reference :46-176).  The
--distill flag routes: 'moma' -> the paper's momentum-queue + attention
method; everything else -> the comparison distiller zoo.

    python -m moma_tpu.cli.train_student --distill kd --model_s resnet8x4 \
        --model_t resnet32x4 --path_t <ckpt> -c1 -d1 -b1 --dataset cifar100

    python -m moma_tpu.cli.train_student --distill moma --mem MoCo --head mlp \
        --attn self --feat_dim 512 --synthetic --epochs 2     # smoke
"""

from __future__ import annotations

import sys

from moma_tpu.core.config import parse_student_args
from moma_tpu.train.student import run_student


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    synthetic = "--synthetic" in argv
    if synthetic:
        argv.remove("--synthetic")
    cfg = parse_student_args(argv)
    _, result = run_student(cfg, synthetic=synthetic)
    print(f"done: best val acc {result['best_acc']:.2f} f1 {result['best_f1']:.4f}")
    return result


if __name__ == "__main__":
    main()
