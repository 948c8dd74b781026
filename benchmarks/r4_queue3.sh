#!/bin/bash
# Round-4 TPU queue, phase 3: clean-window A/B of the fused certified
# program vs the two-program split (PLAN.md degraded-window warning),
# then a bench.py health run. Compare rows by their cert_fuse field in
# artifacts/cert_breakdown.json -- only within this same window.
set -x
cd /root/repo

REDIS_HNSW_TPU_CERT_FUSE=0 timeout 1800 \
  python benchmarks/cert_breakdown.py 1000000 2048 9 \
  > /tmp/cert_ab_split.log 2>&1

REDIS_HNSW_TPU_CERT_FUSE=auto timeout 1800 \
  python benchmarks/cert_breakdown.py 1000000 2048 9 \
  > /tmp/cert_ab_fused.log 2>&1

timeout 1800 python bench.py > /tmp/bench_r4.json 2> /tmp/bench_r4.log

echo "r4 queue phase 3 done"
