"""Physics analysis helper tests: Cd/Cl, sine fit, Strouhal, L_char, CTU."""

import numpy as np

from lbm2d_tpu.utils.physics import (
    characteristic_length_projection,
    compute_coefficients,
    fit_sine_wave,
    reynolds_number,
    simulation_time_scale,
    strouhal_number,
)


def test_reynolds_and_time_scale():
    assert reynolds_number(0.1, 100, 0.05) == 200
    assert reynolds_number(0.1, 100, 0) == float("inf")
    cfg = {
        "simulation": {"characteristic_length": 50, "max_steps": 1000},
        "boundary_condition": {"value": [[0.05, 0.0]]},
    }
    assert simulation_time_scale(cfg) == 50 / 0.05


def test_characteristic_length_projection():
    mask = np.zeros((32, 64), bool)
    assert characteristic_length_projection(mask) == 1  # empty -> floor 1
    mask[5:15, 10:20] = True  # occupies 10 rows
    assert characteristic_length_projection(mask) == 10
    mask[20:24, 40:50] = True  # 4 more rows
    assert characteristic_length_projection(mask) == 14


def test_dfg_coefficients():
    fx = np.array([0.5, 0.6])
    fy = np.array([0.1, -0.1])
    cd, cl, u_mean = compute_coefficients(fx, fy, u_max=0.3, d=10, rho=1.0)
    assert abs(u_mean - 0.2) < 1e-12  # 2/3 of u_max
    denom = 0.5 * 0.2**2 * 10
    np.testing.assert_allclose(cd, fx / denom)
    np.testing.assert_allclose(cl, fy / denom)


def test_sine_fit_recovers_karman_signal():
    rng = np.random.default_rng(0)
    t = np.arange(0, 400, 1.0)
    a_true, w_true, off = 0.05, 0.21, 0.002
    sig = a_true * np.sin(w_true * t + 0.4) + off + 0.002 * rng.standard_normal(len(t))
    fitted, popt = fit_sine_wave(t, sig)
    assert fitted is not None
    a, w = abs(popt[0]), abs(popt[1])
    assert abs(a - a_true) / a_true < 0.15
    assert abs(w - w_true) / w_true < 0.05
    # Strouhal: f D / U with f = w / 2pi
    st = strouhal_number(w, d=10, u=0.1)
    assert abs(st - (w_true / (2 * np.pi) * 10 / 0.1)) < 0.02


def test_sine_fit_handles_garbage():
    t = np.arange(64.0)
    fitted, popt = fit_sine_wave(t, np.zeros(64))
    # degenerate input: either a flat fit or a graceful None
    assert fitted is None or np.allclose(fitted, 0, atol=1e-6)
