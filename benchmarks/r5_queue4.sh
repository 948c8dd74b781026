#!/bin/bash
# Round-5 session-4 queue (VERDICT r4 next#2: measure the >2M regime).
#
# Probe-gated: waits for a healthy tunnel window (two consecutive
# upload-then-fetch probes < 10s -- see CLAUDE.md degraded-window
# gotcha) before spending chip time. Deadline-guarded: stops launching
# stages with enough reserve to run the measurement at whatever N the
# staged build reached (the ckpt is resumable either way).
#
#   DEADLINE_TS=<epoch> bash benchmarks/r5_queue4.sh >>/tmp/r5q4.log 2>&1
set -u
cd /root/repo
DEADLINE_TS=${DEADLINE_TS:?set DEADLINE_TS to a unix epoch}
TARGET=${TARGET:-2500000}
STAGE=${STAGE:-500000}
CKPT=${CKPT:-/tmp/m1.ckpt.npz}
MEASURE_RESERVE=${MEASURE_RESERVE:-900}

log() { echo "[$(date -u +%H:%M:%S)] $*"; }
left() { echo $(( DEADLINE_TS - $(date +%s) )); }

probe_once() {
  timeout 60 python - <<'EOF'
import sys, time
# importing the package enables the persistent compile cache, so the
# probe's tiny fetch program compiles once across probe processes --
# otherwise every probe re-pays a server-side compile and a healthy
# window can read as degraded.
import redis_hnsw_tpu  # noqa: F401
import numpy as np, jax, jax.numpy as jnp
x = np.random.default_rng(0).standard_normal((8_000_000,)).astype(np.float32)
t0 = time.perf_counter()
xd = jnp.asarray(x)
_ = float(xd[0])
dt = time.perf_counter() - t0
print(f"probe 32MB upload+fetch: {dt:.2f}s", flush=True)
sys.exit(0 if dt < 12 else 1)
EOF
}

# -- 1. wait for a healthy window ------------------------------------
ok=0
while [ "$(left)" -gt $(( MEASURE_RESERVE + 300 )) ]; do
  if probe_once; then ok=$(( ok + 1 )); else ok=0; fi
  log "probe ok-streak: $ok (left $(left)s)"
  [ "$ok" -ge 2 ] && break
  sleep 15
done
if [ "$ok" -lt 2 ]; then
  log "no healthy window before deadline; exiting without measuring"
  exit 1
fi
log "tunnel healthy; staged build toward $TARGET rows"

# -- 2. staged build (resumable; stop with measurement reserve) ------
while [ "$(left)" -gt $(( MEASURE_RESERVE + 420 )) ]; do
  out=$(timeout 800 python benchmarks/million.py build "$TARGET" "$STAGE" "$CKPT" 2>&1)
  rc=$?
  echo "$out" | tail -4
  if [ $rc -ne 0 ]; then
    log "build stage rc=$rc; re-probing before retry"
    probe_once || { log "tunnel degraded mid-build; stopping stages"; break; }
    continue
  fi
  echo "$out" | grep -q "build complete" && { log "build complete"; break; }
done

[ -f "$CKPT" ] || { log "no checkpoint produced; nothing to measure"; exit 1; }

# -- 3. lean tier ladder + graph rows at the reached N ---------------
SCAN_TIERS_ONLY="${SCAN_TIERS_ONLY:-exact,certified,approx,graph_ef256,graph_ef512}" \
  timeout $(( MEASURE_RESERVE + 300 )) python benchmarks/scan_tiers.py "$CKPT"
log "queue done"
