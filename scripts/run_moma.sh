#!/usr/bin/env bash
# 5-trial MoMA student sweep — parity with reference scripts/run_moma.sh
# (the reference script calls a nonexistent file; these are the flags its
# real driver train_student_moma.py uses: --distill moma -c1 -d1 -b1
# --feat_dim 512 --head mlp --attn self, K=16384, T forced to 0.15).
set -e
DATA_DIR=${DATA_DIR:-./patch_data/prostate_HV_patch_750}
STD_PRE=${STD_PRE:-}    # e.g. a PANDA-pretrained checkpoint dir
TEC_PRE=${TEC_PRE:-}

for trial in 0 1 2 3 4; do
  python -m moma_tpu.cli.train_student \
    --dataset prostate_hv --data_dir "$DATA_DIR" \
    --model_s effiB0 --model_t effiB0 \
    --distill moma -c 1 -d 1 -b 1 \
    --feat_dim 512 --head mlp --attn self --mem MoCo --nce_k 16384 \
    --batch_size 64 --image_size 512 \
    --epochs 50 --learning_rate 0.05 --cosine --weight_decay 1e-4 \
    ${STD_PRE:+--std_pre "$STD_PRE"} ${TEC_PRE:+--tec_pre "$TEC_PRE"} \
    --trial "$trial"
done
