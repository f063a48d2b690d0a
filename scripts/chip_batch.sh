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

# 2. the auditable suite artifact (VERDICT r2 #6): every BASELINE config
#    incl. depth-scaling 4/8/16, fulldepth offload, and the fixed LoRA leg
run suite 7200 env BENCH_SUITE_OUT=/root/repo/BENCH_SUITE_r03.json \
  python bench_suite.py
# preserve the artifact even if no interactive session is alive when the
# batch finishes (sessions have been dying to gateway errors)
if [ -s /root/repo/BENCH_SUITE_r03.json ]; then
  (cd /root/repo && git add BENCH_SUITE_r03.json &&
   git commit -m "BENCH_SUITE_r03: on-chip suite artifact" --only \
     -- BENCH_SUITE_r03.json) || true
fi

# 3. real-mosaic kernel tests (incl. the new pipelined-body test)
run tpu_tests 3600 python -m pytest tests_tpu/ -q

# 4. does Mosaic co-schedule independent MXU/VPU chains?
run overlap 1200 python scripts/overlap_probe.py

# 5. resident-kernel pipelining A/B at flagship shapes
run decode_nsub1 1800 env VGT_DECODE_NSUB=1 python scripts/profile_decode.py
run decode_nsub2 1800 env VGT_DECODE_NSUB=2 python scripts/profile_decode.py
run decode_nsub4 1800 env VGT_DECODE_NSUB=4 python scripts/profile_decode.py

# 6. streaming-split pipelining A/B at rollout shapes (pl.when select is
#    always-on now; nsub subtiles the in-tile body)
run rollout_nsub1 1800 env VGT_STREAM_NSUB=1 python scripts/profile_decode_rollout.py
run rollout_nsub2 1800 env VGT_STREAM_NSUB=2 python scripts/profile_decode_rollout.py

# 7. long-rollout per-stage breakdown (where do the non-denoise seconds go?)
run rollout_stages 2400 env CFG_INTERVAL=0.15,0.7 python scripts/profile_rollout.py

echo "batch complete; logs in $OUT"
