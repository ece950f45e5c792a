#!/bin/bash
# DFG-2D (Schaefer-Turek 2D-2, Re=100) benchmark suite -> committed JSON
# artifact. Run on TPU hardware; ~1h total. Literature: Cd in [3.22, 3.24],
# Cl amp ~1.0, St in [0.2950, 0.3050].
set -x
cd "$(dirname "$0")"
OUT=docs/benchmarks/dfg2d_results.json
rm -f $OUT
for OBS in bounce_back bounce_back_halfway; do
  python -m lbm2d_tpu.analysis.dfg_validation --mode dfg --ny 165 --u 0.1 --steps 200000 --obstacle $OBS --out $OUT
done
for OBS in bounce_back bounce_back_halfway; do
  python -m lbm2d_tpu.analysis.dfg_validation --mode dfg --ny 329 --u 0.05 --steps 600000 --obstacle $OBS --out $OUT
done
echo ALLDONE
