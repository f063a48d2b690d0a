#!/bin/bash
# Stage 3: frame-block + flexible interval <=12 (pretrain_stage3_nv.sh)
python -m video_gpt_tpu.cli train \
  --stage 3 --frame_num 48 \
  --video_dir_path "$1" \
  --results_dir results/stage3 \
  --init_checkpoint_dir results/stage2/checkpoints \
  --max_steps "${2:-100000}" \
  --lr 1e-4 --mixed_precision bf16 --ckpt_every 1000
