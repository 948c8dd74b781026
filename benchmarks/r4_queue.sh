#!/bin/bash
# Round-4 TPU measurement queue: serialized, resumable, one job at a
# time on the single tunneled chip. Each step appends its own artifact
# and logs to /tmp; safe to re-run (steps are idempotent or staged).
set -x
cd /root/repo

# VERDICT r3 #6: clean merge-scaling artifact (in-program device-time
# methodology, medians)
timeout 2400 python benchmarks/merge_scaling.py 2048 10 \
  > /tmp/merge_scaling_r4.log 2>&1

# VERDICT r3 #2: the 32M int8-resident TPU record (truth stage already
# complete at /tmp/flat_capacity_truth_32000000.npz)
timeout 3600 python benchmarks/flat_capacity.py run 32000000 \
  > /tmp/flat32m_run.log 2>&1

echo "r4 queue done"
