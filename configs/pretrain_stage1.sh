#!/bin/bash
# Stage 1: interleaved next-frame pretraining, 16 frames, stride 4
# (reference: LVM/script/train/pretrain_stage1_nv.sh — torchrun+DeepSpeed
# replaced by one process per host; sharding via the (data, seq) mesh)
python -m video_gpt_tpu.cli train \
  --stage 1 \
  --video_dir_path "$1" \
  --results_dir results/stage1 \
  --max_steps "${2:-100000}" \
  --lr 1e-4 --mixed_precision bf16 --use_ema \
  --log_every 100 --ckpt_every 20000
