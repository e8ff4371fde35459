#!/bin/bash
# One-shot TPU measurement sweep: run after a tunnel outage to refresh every
# RESULTS.md number in one go. Each step has its own timeout so a re-wedge
# costs one step, not the sweep. Appends JSON lines to benchmarks/tpu_sweep.log.
cd "$(dirname "$0")/.." || exit 1
LOG=benchmarks/tpu_sweep.log
echo "=== sweep $(date -u +%FT%TZ) ===" >> "$LOG"
run() { echo "--- $* ---" >> "$LOG"; timeout "$1" "${@:2}" >> "$LOG" 2>&1; }
run 600  python -c "import jax, jax.numpy as jnp, numpy as np; print('probe', np.asarray(jnp.ones(2)+1))"
run 1200 python bench.py 60
run 1200 python benchmarks/run_configs.py 1
run 1200 python benchmarks/run_configs.py 2
run 1200 python benchmarks/run_configs.py 3
run 1200 python benchmarks/run_configs.py 4
run 1500 python benchmarks/run_configs.py 5
run 1500 python benchmarks/run_configs.py 6
run 900  python benchmarks/profile_stages.py
run 900  python benchmarks/profile_loop.py 100
tail -40 "$LOG"
