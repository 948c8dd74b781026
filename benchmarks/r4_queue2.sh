#!/bin/bash
# Round-4 TPU queue, phase 2: streaming config-4 re-run on the auto
# engine (VERDICT r3 #4 -- recall >= 0.95), then the 1M HNSW
# checkpoint rebuild and the scan-tier ladder refresh (VERDICT r3 #3
# "scan_tiers.json refreshed"). All stages resumable; artifacts
# append/overwrite their own files.
set -x
cd /root/repo

# streaming config-4: 5 stages of 200k (fresh stats file -- the r3
# graph-engine rows live in artifacts/streaming1m_graph_ef128_r3.jsonl)
for i in 1 2 3 4 5 6; do
  timeout 3000 python benchmarks/streaming1m.py 1000000 200000 \
    /tmp/stream1m.npz artifacts/streaming1m.jsonl \
    >> /tmp/stream1m.log 2>&1 || break
done

# 1M clustered HNSW checkpoint (the r3 one died with the box reboot)
for i in 1 2 3 4; do
  timeout 3000 python benchmarks/million.py build 1000000 250000 \
    /tmp/m1.ckpt.npz >> /tmp/m1build.log 2>&1 || break
done

# scan-tier ladder at 1M on the fresh checkpoint
timeout 3000 python benchmarks/scan_tiers.py /tmp/m1.ckpt.npz \
  > /tmp/scan_tiers_r4.log 2>&1

echo "r4 queue phase 2 done"
