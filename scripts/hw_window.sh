#!/usr/bin/env bash
# Hardware-window runbook: the measurement queue for the next time the
# axon tunnel grants a claim (single-claim tunnel — run ONE at a time).
# Each step is independently useful; order is by information value.
#
#   bash scripts/hw_window.sh [outdir]
#
# Context: the tunnel's claim wedged mid-round-2 (see STATUS.md infra
# note); these runs re-validate the canonical-prefix attention work that
# landed CPU-verified in the meantime.
set -u
OUT="${1:-/tmp/hw_window}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== $name ==="
  timeout 1200 "$@" 2>&1 | tee "$OUT/$name.log"
  echo "=== $name exit=$? ==="
}

# 1. Mosaic lowering + exactness + HONEST per-step timing of the
#    double-buffered canon kernel and the ids straggler recompute
#    (the pre-fix 1.63x figure had the ids kernel DCE'd out).
run canon_validate python benchmarks/canon_validate.py

# 2. End-to-end char A/B at the serving config (canon off/on).
run canon_char_ab python -m benchmarks.canon_char_ab

# 3. Per-component ledger of the char step: full vs canon(+/-ids) at
#    tip and mid-run, engine-without-decoder, boundary costs.
run char_ledger python -m benchmarks.char_ledger

# 4. Full driver bench (all BENCH metrics incl. word 29k headline,
#    e2e render path at the new ~250 renders/s).
run bench python bench.py
