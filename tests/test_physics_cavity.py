"""Lid-driven cavity at Re = 100: analytic-benchmark validation of the BC
layer (Ghia, Ghia & Shin 1982, JCP 48:387, Tables I/II).

The TGV test pins the periodic collision core; this pins the *wall*
machinery the production channel never exercises in isolation: NEBB
prescribed-velocity boundaries on all four edges (the moving lid is simply
a type-0 wall with a tangential value, reference LBM2D_MRT_LES.py:487-492
semantics) driving a confined recirculating flow with no inlet/outlet, no
sponge, no LES. The steady-state centerline velocity extrema are standard
benchmark quantities; full-way/NEBB wall placement at 96^2 reproduces them
to ~1% of the lid speed.

Ghia et al. Re = 100 references (normalized by lid speed):
  u_x along the vertical centerline:  u(y=0.5) = -0.20581,
      min u = -0.21090 near y = 0.4531
  u_y along the horizontal centerline: min v = -0.24533 near x = 0.8047,
      max v = 0.17527 near x = 0.2344
"""

import numpy as np
import jax.numpy as jnp

from lbm2d_tpu.core.solver import init_state, make_params, run_chunk


def _cavity_config(n, u_lid, nu):
    return {
        "simulation": {
            "nx": n, "ny": n, "name": "cavity", "nu": nu,
            "ghost_moments_s": 1.2, "characteristic_length": n,
            "rho_in": 1.0, "rho_out": 1.0,
            "smagorinsky_constant": 0.0,  # laminar: no eddy viscosity
            "warmup_steps": 2000,  # cosine lid ramp-up window
        },
        # left wall: type 4 (NEBB profiled inlet) with u_max = 0 == no-slip
        # wall (type 0 on the left edge means Zou-He *pressure* inlet, the
        # reference's channel semantics); top is the moving lid; right and
        # bottom are type-0 prescribed-velocity NEBB walls at rest.
        "boundary_condition": {
            "type": [4, 0, 0, 0],
            "value": [[0.0, 0.0], [u_lid, 0.0], [0.0, 0.0], [0.0, 0.0]],
        },
        "domain_zones": {
            "sponge_in": 1, "sponge_out": 1, "sponge_top": 1,
            "sponge_bot": 1, "sponge_strength": 0.0,
        },
    }


def test_cavity_re100_matches_ghia():
    n, re, u_lid = 96, 100.0, 0.1
    nu = u_lid * n / re
    params = make_params(_cavity_config(n, u_lid, nu), np.zeros((n, n), np.float32))
    state = init_state(n, n)
    for _ in range(8):  # 16k steps: residual |du|/U ~ 2e-4, features ~1e-3
        state, _ = run_chunk(state, params, n_steps=2000)

    u = np.asarray(state.u) / u_lid
    c = n // 2
    u_centerline = u[0, :, c]  # u_x(y) through the cavity center
    v_centerline = u[1, c, :]  # u_y(x) through the cavity center

    u_mid = 0.5 * (u_centerline[c - 1] + u_centerline[c])
    assert abs(u_mid - (-0.20581)) < 0.015
    assert abs(u_centerline.min() - (-0.21090)) < 0.015
    assert abs(v_centerline.min() - (-0.24533)) < 0.015
    assert abs(v_centerline.max() - 0.17527) < 0.015

    # extremum locations (normalized coords) land where Ghia's table puts
    # them -- catches mirrored/transposed BC wiring that the magnitudes
    # alone might pass
    assert abs(u_centerline.argmin() / (n - 1) - 0.4531) < 0.06
    assert abs(v_centerline.argmin() / (n - 1) - 0.8047) < 0.06
    assert abs(v_centerline.argmax() / (n - 1) - 0.2344) < 0.06

    # the lid drags fluid rightward along the top, the return flow crosses
    # the bottom half leftward: sign structure of the primary vortex
    assert u_centerline[-2] > 0.5  # just under the lid
    assert u_centerline[n // 4] < 0.0  # lower half backflow
