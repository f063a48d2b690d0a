#!/bin/bash
# Autoregressive rollout (reference: LVM/script/inference/inference_nv.sh:
# 56 conditioning frames, two 24-frame clips, 80-frame window, guidance 1.5)
python -m video_gpt_tpu.cli generate \
  --video_path "$1" \
  --model_ckpt "$2" --vae_ckpt "$3" \
  --clean_image_num 56 --gen_nums 24 24 --max_frame_window 80 \
  --num_inference_steps 50 --img_guidance_scale 1.5 \
  --max_input_image_size 320 --prediction_type x1 \
  --clean_image_noise_level 0 \
  --save_dir result/test/inference
