#!/usr/bin/env bash
# 5-trial supervised teacher sweep — parity with reference scripts/run_vanilla.sh
# (prostate_hv, effiB0, BS 64, 512px, 50 epochs, cosine LR 0.05, PANDA pretrain).
set -e
DATA_DIR=${DATA_DIR:-./patch_data/prostate_HV_patch_750}
PRETRAIN=${PRETRAIN:-}

for trial in 0 1 2 3 4; do
  python -m moma_tpu.cli.train_teacher \
    --dataset prostate_hv --data_dir "$DATA_DIR" \
    --model effiB0 --batch_size 64 --image_size 512 \
    --epochs 50 --learning_rate 0.05 --cosine --weight_decay 1e-4 \
    ${PRETRAIN:+--pretrain "$PRETRAIN"} \
    --trial "$trial"
done
