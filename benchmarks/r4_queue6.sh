#!/bin/bash
# Round-4 TPU queue, phase 6:
# 1. flat_highd at 1M x 512 and 1M x 768: bracket the cert-vs-exact
#    crossover (measured win at 384d, loss at 960d) to place
#    CERT_MAX_DIM on data instead of a 2-point extrapolation.
# 2. fetch_window_ab second sample (compiles cached): reproducibility
#    of the w8 certified 50.7k / approx 71.4k and the exact w>=2 dip.
# 3. capacity19 refresh on the 1.9M ckpt with the engine-aware default
#    fetch window in place (the 1.9M recall-1.0 serving headline).
set -x
cd /root/repo

timeout 3600 python benchmarks/flat_highd.py 1000000 512 \
  > /tmp/flat_highd_512.log 2>&1

timeout 3600 python benchmarks/flat_highd.py 1000000 768 \
  > /tmp/flat_highd_768.log 2>&1

timeout 3600 python benchmarks/fetch_window_ab.py /tmp/m1.ckpt.npz 8 128 \
  > /tmp/fetch_window_ab2.log 2>&1

timeout 3600 python benchmarks/capacity19.py /tmp/m19.ckpt.npz \
  > /tmp/capacity19_r4b.log 2>&1

echo "r4 queue phase 6 done"
