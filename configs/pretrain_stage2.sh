#!/bin/bash
# Stage 2: frame-block curriculum, 48 frames (pretrain_stage2_nv.sh),
# warm-started from the stage-1 checkpoints. Optimization hyperparameters
# mirror the reference script exactly.
python -m video_gpt_tpu.cli train \
  --stage 2 --frame_num 48 \
  --video_dir_path "$1" \
  --results_dir results/stage2 \
  --init_checkpoint_dir results/stage1/checkpoints \
  --max_steps "${2:-100000}" \
  --lr 1e-4 --lr_scheduler constant_with_warmup --lr_warmup_steps 320000 \
  --adam_beta1 0.9 --adam_beta2 0.95 --adam_weight_decay 0.1 \
  --adam_epsilon 1e-5 --max_grad_norm 1.0 \
  --mixed_precision bf16 --num_workers 4 \
  --log_every 10 --ckpt_every 1000
