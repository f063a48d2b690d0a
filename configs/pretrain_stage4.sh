#!/bin/bash
# Stage 4: long context, 80 frames (pretrain_stage4_nv.sh), warm-started
# from stage 3. Optimization hyperparameters mirror the reference script
# exactly.
python -m video_gpt_tpu.cli train \
  --stage 4 --frame_num 80 \
  --video_dir_path "$1" \
  --results_dir results/stage4 \
  --init_checkpoint_dir results/stage3/checkpoints \
  --max_steps "${2:-100000}" \
  --lr 1e-4 --lr_scheduler constant_with_warmup --lr_warmup_steps 320000 \
  --adam_beta1 0.9 --adam_beta2 0.95 --adam_weight_decay 0.1 \
  --adam_epsilon 1e-5 --max_grad_norm 1.0 \
  --mixed_precision bf16 --num_workers 2 \
  --log_every 10 --ckpt_every 500
