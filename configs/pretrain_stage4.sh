#!/bin/bash
# Stage 4: long context, 80 frames (pretrain_stage4_nv.sh)
python -m video_gpt_tpu.cli train \
  --stage 4 --frame_num 80 \
  --video_dir_path "$1" \
  --results_dir results/stage4 \
  --init_checkpoint_dir results/stage3/checkpoints \
  --max_steps "${2:-100000}" \
  --lr 1e-4 --mixed_precision bf16 --ckpt_every 1000
