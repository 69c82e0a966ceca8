#!/usr/bin/env bash
# Measurement queue for the next TPU chip window.
#
# The tunnel has been flaky (whole sessions without a chip): when it comes
# back, run this to capture every queued measurement unattended, in
# priority order, each under its own timeout so one hang doesn't lose the
# window. Logs land in $OUT (default /tmp/chip_logs).
#
# Priorities (ROADMAP "Round 3, later sessions"):
#   1. bench.py           — headline + reference-load + capped-mode FPS
#                           (also re-measures the reworked expansion and
#                           live-prefix changes in one number)
#   2. profile_vpu_bf16   — does Mosaic pack bf16 VPU lanes 2x? decides
#                           whether settings.bf16_cells becomes default
#   3. bench A/B bf16_cells (LSV2_BF16_CELLS=1)
#   4. profile_frame_stages — per-stage scan-prefix attribution
#   5. profile_train / profile_train_stages — feature-phase it/s after the
#                           live-prefix clamp + weights rewrite
#   6. profile_rgb_train  — RGB-phase it/s
#   7. profile_expand_variants / profile_gather_variants — kernel A/Bs
set -u
OUT=${OUT:-/tmp/chip_logs}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# The axon TPU plugin must stay importable or jax.devices() fails with
# "Backend axon is not in the list of known backends" (ROADMAP platform
# facts) — pin PYTHONPATH so the queue survives fresh shells/cron.
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -n 25 "$OUT/$name.log"
  echo "=== $name exit $rc ==="
}

run bench            2400 python bench.py
run vpu_bf16          900 python scripts/profile_vpu_bf16.py
run bench_bf16cells 2400 env LSV2_BF16_CELLS=1 python bench.py
run frame_stages     1800 python scripts/profile_frame_stages.py
run train             1800 python scripts/profile_train.py
run train_capped     1800 env LSV2_TILE_BUDGET=1e-6 python scripts/profile_train.py
run train_cambatch   1800 env LSV2_CAM_BATCH=4 python scripts/profile_train.py
run train_capbatch   1800 env LSV2_TILE_BUDGET=1e-6 LSV2_CAM_BATCH=4 python scripts/profile_train.py
run train_stages     1800 python scripts/profile_train_stages.py
run rgb_train        1800 python scripts/profile_rgb_train.py
run expand_variants  1800 python scripts/profile_expand_variants.py
run gather_variants  1200 python scripts/profile_gather_variants.py
echo "queue done; logs in $OUT"
