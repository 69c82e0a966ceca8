#!/usr/bin/env bash
# Poll for a TPU chip window; the moment jax.devices() answers, run the
# queued measurement script (run_chip_queue.sh) once and exit.
# Safe to leave running for hours — each probe is its own short-lived
# process under timeout, so a hung tunnel never wedges the watcher.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
STAMP=/tmp/chip_queue_ran
while true; do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "chip up at $(date +%H:%M:%S)"
    if [ ! -e "$STAMP" ]; then
      touch "$STAMP"
      bash scripts/run_chip_queue.sh
      echo "queue complete at $(date +%H:%M:%S)"
    fi
    exit 0
  fi
  echo "chip down at $(date +%H:%M:%S)"
  sleep 240
done
