#!/bin/bash
# Unattended on-chip measurement suite, ordered SAFE-FIRST for a fragile
# relayed TPU: all plain-XLA numbers are collected and saved before the
# first Mosaic (Pallas) dispatch, because one hung Mosaic call has been
# observed to take the whole relay down — if that happens again, the safe
# measurements already exist on disk.
#
#   stage 1  tiny-matmul liveness check
#   stage 2  XLA-only ablation variants (ultra / edge default / no-noise /
#            noise-pool at the fast baseline)
#   stage 3  staged Mosaic probe, EDGE kernels only (tools/probe_pallas.py,
#            stops at first fail)
#   stage 4  (only if stage 3 passes) Pallas + fused EDGE variants
#   stage 5  full bench.py (its own subprocess preflight re-checks Mosaic)
#   stage 6  DEAD LAST, the known relay-wedger: spectral+iTTC probe, then
#            the ultrafused variant only if it passes
#
# Every stage runs under timeout in its own process; output accumulates in
# $OUT (default /tmp/onchip). Safe to re-run; later runs append.
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/onchip}
mkdir -p "$OUT"
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/suite.log"; }

log "stage 1: liveness"
if ! timeout 180 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))), flush=True)" >>"$OUT/suite.log" 2>&1; then
  log "stage 1 FAIL: relay not answering; aborting"; exit 1
fi

log "stage 2: XLA-only ablations"
timeout 3600 python tools/ablate_default.py \
  "ultra(spectral+grad)" "default(edge+grad)" "edge/nonoise" "ultra/pool" \
  >>"$OUT/ablate_xla.log" 2>&1
log "stage 2 done (rc=$?) -> $OUT/ablate_xla.log"

log "stage 3: staged Mosaic probe (edge stages only; spec-ttc deferred to stage 6)"
timeout 2400 python tools/probe_pallas.py \
  xla pallas-tiny pallas-edge pallas-edge-ttc env-step-default \
  >>"$OUT/probe.log" 2>&1
rc=$?
log "stage 3 rc=$rc -> $OUT/probe.log"
if [ $rc -ne 0 ] || ! grep -q "EDGE STAGES PASS" "$OUT/probe.log"; then
  log "Mosaic edge probe failed — skipping Pallas stages; XLA numbers are in $OUT"
  exit 0
fi

log "stage 4: Pallas / fused EDGE variants (+ capability record)"
timeout 5400 python tools/ablate_default.py --record \
  "edge/xla-fallback" "edge/pallas" "edge/fused-ttc" "edge/fused-ttc+pool" \
  >>"$OUT/ablate_pallas.log" 2>&1
log "stage 4 done (rc=$?) -> $OUT/ablate_pallas.log"

log "stage 5: full bench (no ultrafused: see stage 6)"
BENCH_MODES=ultra,default,fused timeout 5400 python bench.py \
  >>"$OUT/bench.log" 2>&1
log "stage 5 done (rc=$?) -> $OUT/bench.log"

# The spectral+iTTC kernel is probed and measured DEAD LAST: its dispatch
# is the one that has wedged the relay (round 4, 2026-08-19) — everything
# above is already on disk if it takes the chip down.
log "stage 6: spectral-fused probe + ultrafused (relay-wedging risk)"
timeout 900 python tools/probe_pallas.py xla pallas-spec-ttc >>"$OUT/probe.log" 2>&1
if grep -q "PASS pallas-spec-ttc" "$OUT/probe.log"; then
  timeout 3600 python tools/ablate_default.py "ultra/fused-ttc" \
    >>"$OUT/ablate_pallas.log" 2>&1
  log "stage 6 done (rc=$?) -> $OUT/ablate_pallas.log"
else
  log "spec-ttc probe failed/hung — ultrafused left unmeasured"
fi
log "SUITE COMPLETE"
