#!/usr/bin/env bash
# Comparison-KD sweep with the reference's tuned loss weights
# (scripts/run_comparison.sh: kd 1/0/1, hint b=100, correlation b=0.02,
# crd b=0.8, attention b=1000, semckd -c1 -d0 b=50, simkd c0 d0 b1).
set -e
DATA_DIR=${DATA_DIR:-./patch_data/prostate_HV_patch_750}
COMMON="--dataset prostate_hv --data_dir $DATA_DIR --model_s effiB0 --model_t effiB0 \
  --batch_size 64 --image_size 512 --epochs 50 --learning_rate 0.05 --cosine --weight_decay 1e-4"

for trial in 0 1 2 3 4; do
  python -m moma_tpu.cli.train_student $COMMON --distill kd          -c 1 -d 0 -b 1    --trial "$trial"
  python -m moma_tpu.cli.train_student $COMMON --distill hint        -c 1 -d 1 -b 100  --trial "$trial"
  python -m moma_tpu.cli.train_student $COMMON --distill correlation -c 1 -d 1 -b 0.02 --trial "$trial"
  python -m moma_tpu.cli.train_student $COMMON --distill crd         -c 1 -d 1 -b 0.8  --trial "$trial"
  python -m moma_tpu.cli.train_student $COMMON --distill attention   -c 1 -d 1 -b 1000 --trial "$trial"
  python -m moma_tpu.cli.train_student $COMMON --distill semckd      -c 1 -d 0 -b 50   --trial "$trial"
  python -m moma_tpu.cli.train_student $COMMON --distill simkd       -c 0 -d 0 -b 1    --trial "$trial"
done
