#!/bin/bash
# Serving distillation ladder (no reference counterpart — the reference
# serves at 50 Euler steps, inference_nv.sh:30). Two rounds compress the
# serving cost ~20x at a measured quality bound
# (artifacts/drift_frontier_r05.jsonl, scripts/quality_protocol.py):
#
#   1. step distillation 10 -> 5 (Salimans & Ho 2022): the student serves
#      at --num_inference_steps 5 with separate-CFG (8 NFE at k=2);
#   2. guidance distillation at w=1.5 (Meng et al. 2023): CFG baked into
#      the weights — serve with --img_guidance_scale 1 (NO unconditional
#      branch, 5 NFE; can also run both in ONE round from the 10-step
#      teacher, as below).
#
# $1 = video dir, $2 = trained teacher checkpoint dir (e.g. the stage-4
# results/stage4/checkpoints), $3 = steps per round (default 20000).
set -e
STEPS="${3:-20000}"

# round 1: 10 -> 5 steps, guidance baked in (w must equal the cfg_scale
# you would have served with; reference inference_nv.sh:34 uses 1.5)
python -m video_gpt_tpu.cli train \
  --stage 1 --frame_num 16 \
  --video_dir_path "$1" \
  --results_dir results/distill5g \
  --init_checkpoint_dir "$2" \
  --distill --distill_student_steps 5 --distill_substeps 2 \
  --distill_guidance 1.5 \
  --max_steps "$STEPS" \
  --lr_scheduler constant --distill_lr 1e-4 \
  --adam_beta1 0.9 --adam_beta2 0.95 --adam_weight_decay 0.1 \
  --adam_epsilon 1e-5 --max_grad_norm 1.0 \
  --mixed_precision bf16 --num_workers 2 \
  --log_every 10 --ckpt_every 500

# round 2 (optional, compounding): 5 -> 3 steps from the round-1 student
python -m video_gpt_tpu.cli train \
  --stage 1 --frame_num 16 \
  --video_dir_path "$1" \
  --results_dir results/distill3g \
  --init_checkpoint_dir results/distill5g/checkpoints \
  --distill --distill_student_steps 3 --distill_substeps 2 \
  --max_steps "$STEPS" \
  --lr_scheduler constant --distill_lr 1e-4 \
  --adam_beta1 0.9 --adam_beta2 0.95 --adam_weight_decay 0.1 \
  --adam_epsilon 1e-5 --max_grad_norm 1.0 \
  --mixed_precision bf16 --num_workers 2 \
  --log_every 10 --ckpt_every 500

# serve the guided 5-step student: ONE forward per step, no uncond row
#   python -m video_gpt_tpu.cli generate \
#     --checkpoint_dir results/distill5g/checkpoints \
#     --video_path my.mp4 --num_inference_steps 5 --img_guidance_scale 1
