#!/bin/bash
# DFG-2D (Schaefer-Turek 2D-2, Re=100) benchmark suite -> committed JSON
# artifact (docs/benchmarks/dfg2d_results.json). Run on TPU hardware; ~2.5h
# total. Literature: Cd in [3.22, 3.24], Cl amp ~1.0, St in [0.2950, 0.3050].
#
# Matrix: obstacle scheme x inlet scheme x resolution.
#   obstacle: full-way / half-way (staircase) and Bouzidi interpolated
#             (sub-grid curved wall; jnp path, slower)
#   inlet:    equilibrium (type 3, under-delivers U by ~4% -> biases
#             nominal-U Cd ~8% low) / nebb (type 4, delivers U exactly)
# The *_measured_u fields in the JSON separate inlet-delivery error from
# wall-scheme error for the equilibrium-inlet rows.
set -x
cd "$(dirname "$0")"
OUT=docs/benchmarks/dfg2d_results.json
rm -f $OUT
for OBS in bounce_back bounce_back_halfway bounce_back_bouzidi; do
  python -m lbm2d_tpu.analysis.dfg_validation --mode dfg --ny 165 --u 0.1 --steps 200000 --obstacle $OBS --out $OUT
  python -m lbm2d_tpu.analysis.dfg_validation --mode dfg --ny 165 --u 0.1 --steps 200000 --obstacle $OBS --inlet nebb --out $OUT
done
for OBS in bounce_back bounce_back_halfway bounce_back_bouzidi; do
  python -m lbm2d_tpu.analysis.dfg_validation --mode dfg --ny 329 --u 0.05 --steps 600000 --obstacle $OBS --out $OUT
  python -m lbm2d_tpu.analysis.dfg_validation --mode dfg --ny 329 --u 0.05 --steps 600000 --obstacle $OBS --inlet nebb --out $OUT
done
echo ALLDONE
