#!/bin/bash
# Stage 1: interleaved next-frame pretraining, 16 frames, stride 4
# (reference: LVM/script/train/pretrain_stage1_nv.sh — torchrun+DeepSpeed
# replaced by one process per host; sharding via the (data, seq) mesh).
# Optimization hyperparameters mirror the reference script exactly.
python -m video_gpt_tpu.cli train \
  --stage 1 \
  --video_dir_path "$1" \
  --results_dir results/stage1 \
  --max_steps "${2:-100000}" \
  --lr 1e-4 --lr_scheduler constant_with_warmup --lr_warmup_steps 320000 \
  --adam_beta1 0.9 --adam_beta2 0.95 --adam_weight_decay 0.1 \
  --adam_epsilon 1e-5 --max_grad_norm 1.0 \
  --mixed_precision bf16 --num_workers 4 \
  --log_every 10 --ckpt_every 500
