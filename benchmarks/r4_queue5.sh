#!/bin/bash
# Round-4 TPU queue, phase 5:
# 1. fetch-window A/B at 1M x 128d (the new FetchGroup coalesced-D2H
#    serving loop vs the one-fetch-per-batch r4 baseline), on the
#    staged /tmp/m1.ckpt.npz.
# 2. flat_highd at 1M x 384d: validate the CERT_MAX_DIM~340 crossover
#    from a third D point (the 2-point model predicts a slight cert
#    loss at 384; if it wins instead, raise the gate).
set -x
cd /root/repo

timeout 3600 python benchmarks/fetch_window_ab.py /tmp/m1.ckpt.npz 8 128 \
  > /tmp/fetch_window_ab.log 2>&1

timeout 3600 python benchmarks/flat_highd.py 1000000 384 \
  > /tmp/flat_highd_384.log 2>&1

echo "r4 queue phase 5 done"
