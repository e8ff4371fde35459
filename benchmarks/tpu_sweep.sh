#!/bin/bash
# One-shot TPU measurement sweep: run after a tunnel outage to refresh every
# RESULTS.md number in one go. Probes FIRST and waits (up to 2 h) for the
# device to answer before burning step timeouts; a mid-sweep re-wedge then
# costs one step's timeout, not every step's.
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/tpu_sweep.log
echo "=== sweep $(date -u +%FT%TZ) ===" >> "$LOG"
probe() { timeout 120 python -c "import jax, jax.numpy as jnp, numpy as np; print('probe', np.asarray(jnp.ones(2)+1)[0])" >> "$LOG" 2>&1; }
for i in $(seq 1 60); do
  if probe; then echo "device up after $i probe(s)" >> "$LOG"; break; fi
  [ "$i" = 60 ] && { echo "device never answered; aborting sweep" >> "$LOG"; exit 1; }
  sleep 60
done
run() { echo "--- $* ---" >> "$LOG"; timeout "$1" "${@:2}" >> "$LOG" 2>&1; }
run 1800 python bench.py 60
run 1800 python benchmarks/run_configs.py 1
# config 2 x3: the loop-closure guard must hold on CONSECUTIVE runs
run 5400 python benchmarks/run_configs.py 2 2 2
run 1800 python benchmarks/run_configs.py 3
run 1800 python benchmarks/run_configs.py 4
run 1800 python benchmarks/run_configs.py 5
run 1800 python benchmarks/run_configs.py 6
# config 7: constant-time (DWO) demonstration — 1000 frames, 100+ keyframes
run 3600 python benchmarks/run_configs.py 7
run 900  python benchmarks/profile_stages.py
run 900  python benchmarks/profile_loop.py 100
run 1500 python benchmarks/profile_multistream.py
run 1200 python benchmarks/profile_stereo_methods.py
run 2400 python benchmarks/tpu_cpu_parity.py --frames 80
# keyframe-rich parity: 10+ keyframes, DWO solves + loop closure on both
# backends (VERDICT r4: the dolly run alone is backend-light)
run 2400 python benchmarks/tpu_cpu_parity.py --frames 90 --scene spin
tail -60 "$LOG"
