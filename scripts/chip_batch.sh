#!/bin/bash
# Sequential on-chip measurement batch for round-3 perf work. Run from
# /root/repo when the axon tunnel is up:  bash scripts/chip_batch.sh
# Results land in /tmp/chip_batch/*.log (one file per leg, tee'd).
set -u
OUT=/tmp/chip_batch
mkdir -p $OUT
export PYTHONPATH=/root/repo:/root/.axon_site

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$@" 2>&1 | tee $OUT/$name.log | tail -5
  echo "=== $name exit=$? ==="
}

# 1. flagship bench (current defaults: cfg_interval 0.15,0.7, separate-CFG)
run bench 1800 python bench.py

# 2. does Mosaic co-schedule independent MXU/VPU chains?
run overlap 1200 python scripts/overlap_probe.py

# 3. resident-kernel pipelining A/B at flagship shapes
run decode_nsub1 1800 env VGT_DECODE_NSUB=1 python scripts/profile_decode.py
run decode_nsub2 1800 env VGT_DECODE_NSUB=2 python scripts/profile_decode.py
run decode_nsub4 1800 env VGT_DECODE_NSUB=4 python scripts/profile_decode.py

# 4. streaming-split pipelining A/B at rollout shapes (pl.when select is
#    always-on now; nsub subtiles the in-tile body)
run rollout_nsub1 1800 env VGT_STREAM_NSUB=1 python scripts/profile_decode_rollout.py
run rollout_nsub2 1800 env VGT_STREAM_NSUB=2 python scripts/profile_decode_rollout.py

# 5. long-rollout per-stage breakdown (where do the non-denoise seconds go?)
run rollout_stages 2400 env CFG_INTERVAL=0.15,0.7 python scripts/profile_rollout.py

# 6. real-mosaic kernel tests (incl. the new pipelined-body test)
run tpu_tests 3600 python -m pytest tests_tpu/ -q

echo "batch complete; logs in $OUT"
