#!/bin/bash
# Stage 2: frame-block curriculum, 48 frames (pretrain_stage2_nv.sh)
python -m video_gpt_tpu.cli train \
  --stage 2 --frame_num 48 \
  --video_dir_path "$1" \
  --results_dir results/stage2 \
  --init_checkpoint_dir results/stage1/checkpoints \
  --max_steps "${2:-100000}" \
  --lr 1e-4 --mixed_precision bf16 --ckpt_every 1000
