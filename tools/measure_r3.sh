#!/bin/bash
# Round-3 measurement campaign, run when the TPU relay recovers.
#
# Order matters: health gate first, then XLA-only baselines (banked before
# any Pallas probe can wedge the relay), then isolated Pallas chain kernels,
# then full-module probes, then the e2e bench.  Every python invocation is
# its own process with an outer timeout; per-probe SIGALRM timeouts inside
# record hangs as errors instead of losing the whole run.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/measure_r3.log
echo "=== measure_r3 $(date -u +%FT%TZ) ===" | tee -a "$LOG"

health() {
  timeout 120 python tools/exp_chain_iso.py relay_health 2>&1 \
    | grep -v "xla_bridge\|WARNING"
}

if ! health | grep -q relay_health; then
  echo "relay DOWN — aborting campaign" | tee -a "$LOG"
  exit 1
fi
echo "relay OK" | tee -a "$LOG"

# 1. re-validate the qconv dispatcher flip (the late-r3 qc_* records were
#    taken on a dying relay)
timeout 2400 python tools/exp_pallas_r3.py \
  qc_bf16_gb qc_xla_gb qc_pallas_gb \
  qc_bf16_gb128 qc_xla_gb128 qc_pallas_gb128 \
  qc_bf16_256 qc_pallas_256 2>&1 | tee -a "$LOG"

# 2. isolated chain kernels (full body, then k-split)
timeout 3600 python tools/exp_chain_iso.py \
  spade_chain_iso adaptive_chain_iso \
  spade_chain_iso_ks adaptive_chain_iso_ks 2>&1 | tee -a "$LOG"

# 3. full-module probes (XLA baselines first inside the harness)
timeout 5400 python tools/exp_chain.py 2>&1 | tee -a "$LOG"

echo "=== campaign done; decide dispatch defaults from the records ===" \
  | tee -a "$LOG"
