#!/bin/bash
# Hardware validation pass: run after any kernel change, on the real TPU.
# Each probe runs in its OWN process (the axon tunnel wedges long-lived
# multi-compile processes). Logs to stdout; stop at any FAIL.
#
#   bash tools/hw_validate.sh [quick|full]
set -u
PY=/opt/venv/bin/python
cd "$(dirname "$0")/.."
MODE="${1:-quick}"

step() { echo "=== $* ==="; }

step "device check"
timeout 120 $PY -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d; print(d)" || { echo "TUNNEL DOWN"; exit 1; }

step "adaptive-scan A/B (flat kernel, one process per config)"
# NOTE: ALIGNTOOLS_ADAPTIVE_SCAN=1 defers to the calibrate table; only
# values >= 2 force that many pre passes. Pin 4 (the calibrated winner)
# vs 0 so the A/B actually compares strategies.
for cfg in "local 256 2048" "local 32 8192" "global 256 2048" "edit 256 2048" "overlap 256 2048"; do
  for ad in 4 0; do
    ALIGNTOOLS_ADAPTIVE_SCAN=$ad timeout 600 $PY benchmarks/probe_flat.py $cfg pallas || echo "probe FAIL: $cfg ad=$ad"
  done
done
ALIGNTOOLS_ADAPTIVE_SCAN=0 timeout 600 $PY benchmarks/probe_flat.py local 256 2048 xla || true
for ad in 4 0; do
  ALIGNTOOLS_ADAPTIVE_SCAN=$ad timeout 900 $PY benchmarks/probe_flat.py fitjump 64 512 32768 pallas || echo "probe FAIL: fitjump ad=$ad"
done

step "two-level tail A/B (compile risk: strided extract; failure is informative, not fatal)"
for tl in 1 0; do
  ALIGNTOOLS_TWOLEVEL_SCAN=$tl timeout 900 $PY benchmarks/probe_flat.py fitjump 64 512 32768 pallas || echo "twolevel=$tl FAIL"
  ALIGNTOOLS_TWOLEVEL_SCAN=$tl timeout 600 $PY benchmarks/probe_flat.py local 32 8192 pallas || echo "twolevel=$tl FAIL"
done

step "tpu_check (bit-equality on hardware)"
timeout 3600 $PY tools/tpu_check.py || { echo "tpu_check FAIL"; exit 1; }

if [ "$MODE" = "full" ]; then
  step "flat-kernel roofline decomposition (scan-pass share at the XLA sweet spot)"
  timeout 3600 $PY benchmarks/decompose_flat.py local 256 2048 || echo "decompose FAIL"

  step "calibrate --force (per-device crossover table)"
  timeout 3600 $PY -m aligntools_tpu.cli calibrate --force || echo "calibrate FAIL"

  step "benchmark suite (regenerates benchmarks/RESULTS.md)"
  timeout 3600 $PY benchmarks/suite.py || echo "suite FAIL"

  step "bench.py (headline JSON line)"
  timeout 1800 $PY bench.py || echo "bench FAIL"
fi
echo "=== hw_validate done ==="
