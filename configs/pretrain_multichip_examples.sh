#!/bin/bash
# Multi-chip mesh recipes for the 3.8B model (pick ONE; all compose with
# any --stage). The mesh is data x seq x tensor x pipe
# (parallel/mesh.py); checkpoints written under one layout convert
# automatically when consumed by a different one (the run's
# tensor_parallel is recorded in train_args.json — cli._detect_ckpt_tp).
#
# The reference's parallelism surface is DeepSpeed ZeRO + Ulysses SP
# (LVM/acceleration/*); tensor and pipeline parallelism are TPU-native
# additions for scaling past one chip's HBM.
set -e
VIDEOS="$1"; STEPS="${2:-100000}"

case "${3:-dp_sp}" in
# 8 chips: ZeRO-2 over data, Ulysses sequence parallelism over seq —
# the reference-equivalent recipe (stage2 diff + parallel_states.py)
dp_sp)
  python -m video_gpt_tpu.cli train --stage 1 \
    --video_dir_path "$VIDEOS" --max_steps "$STEPS" \
    --mesh_data 2 --mesh_seq 4 --sp_attention ulysses ;;
# 8 chips: ZeRO-3 + Megatron tensor parallelism — weights sharded BOTH
# ways at rest (1/(data*tensor) of qkv/o/gate_up/down per chip)
dp_tp_zero3)
  python -m video_gpt_tpu.cli train --stage 1 \
    --video_dir_path "$VIDEOS" --max_steps "$STEPS" \
    --mesh_data 2 --mesh_tensor 4 --zero3 ;;
# 8 chips: 3D — data x sequence x tensor (heads split over seq*tensor)
dp_sp_tp)
  python -m video_gpt_tpu.cli train --stage 4 \
    --video_dir_path "$VIDEOS" --max_steps "$STEPS" \
    --mesh_data 2 --mesh_seq 2 --mesh_tensor 2 --sp_attention ulysses ;;
# 8 chips: GPipe pipeline over 4 stages (8 layers each) x data 2;
# 4 microbatches per step need batch_size_per_device >= 4
dp_pp)
  python -m video_gpt_tpu.cli train --stage 1 \
    --video_dir_path "$VIDEOS" --max_steps "$STEPS" \
    --mesh_data 2 --mesh_pipe 4 --pp_microbatches 4 \
    --batch_size_per_device 4 ;;
*)
  echo "usage: $0 <video_dir> [steps] {dp_sp|dp_tp_zero3|dp_sp_tp|dp_pp}" >&2
  exit 1 ;;
esac
