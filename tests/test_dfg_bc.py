"""DFG-grade boundary conditions: bounce-back obstacles + parabolic inlet.

These are framework extensions the reference only sketches (the parabolic
helper LBM2D_MRT_LES.py:580-586 is never wired up; the bounce-back variant
lives in its spec history, archive/lbm_mrt/solver.py:181-195).  The oracle
carries the same extensions, so the golden comparison pins the jnp path to
the scalar spec exactly like test_core_vs_oracle does for the main solver.
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from lbm2d_tpu.core.solver import (
    init_state,
    make_params,
    parabolic_profile,
    run_chunk,
    step,
)
from tests.oracle import OracleLBM


def dfg_config(nx=30, ny=18, nu=0.04, warmup=25):
    return {
        "simulation": {
            "nx": nx,
            "ny": ny,
            "nu": nu,
            "ghost_moments_s": 1.2,
            "rho_in": 1.0,
            "rho_out": 1.0,
            "smagorinsky_constant": 0.0,  # laminar benchmark mode
            "warmup_steps": warmup,
        },
        "boundary_condition": {
            "type": [3, 2, 1, 2],
            "value": [[0.08, 0.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]],
            "obstacle": "bounce_back",
        },
        "domain_zones": {
            "sponge_in": 1,
            "sponge_out": 1,
            "sponge_top": 1,
            "sponge_bot": 1,
            "sponge_strength": 0.0,
        },
    }


def channel_mask_xy(nx, ny):
    """No-slip walls as solid rows + a small off-center block (x, y layout)."""
    mask = np.zeros((nx, ny), np.float64)
    mask[:, 0] = 1.0
    mask[:, ny - 1] = 1.0
    mask[8:12, 7:11] = 1.0
    return mask


def test_parabolic_profile_matches_reference_formula():
    """u(y) = 4 u_max y (h - y) / h^2 (LBM2D_MRT_LES.py:580-586)."""
    ny, u_max = 41, 0.1
    prof = parabolic_profile(ny, u_max)
    h = float(ny - 1)
    for j in (0, 1, 10, 20, 33, 40):
        assert abs(prof[j] - 4.0 * u_max * j * (h - j) / (h * h)) < 1e-14
    assert prof[0] == 0.0 and prof[ny - 1] == 0.0
    assert abs(prof[ny // 2] - u_max) < 1e-12  # odd ny: exact apex


def test_bounce_and_velocity_inlet_match_oracle():
    cfg = dfg_config()
    nx, ny = cfg["simulation"]["nx"], cfg["simulation"]["ny"]
    mask_xy = channel_mask_xy(nx, ny)

    oracle = OracleLBM(cfg, mask_xy)
    oracle.run_step(40)

    p = make_params(cfg, mask_xy.T, dtype=jnp.float64)
    assert p.bounce_obstacle and p.inlet_profile is not None
    st = init_state(ny, nx, jnp.float64)
    for _ in range(40):
        st = step(st, p)

    np.testing.assert_allclose(
        np.asarray(st.f), np.moveaxis(oracle.f_old, -1, 0).transpose(0, 2, 1),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(st.u[0]), oracle.vel[:, :, 0].T, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(st.rho), oracle.rho.T, atol=1e-12)


def test_bounce_back_conserves_sealed_cavity_mass():
    """A cavity sealed by bounce-back walls exchanges no mass with outside."""
    cfg = dfg_config(nx=26, ny=26, warmup=10)
    # quiescent exterior: free-slip everywhere, no inlet (a driven exterior
    # would legitimately change the ring cells' outside-origin content)
    cfg["boundary_condition"]["type"] = [2, 2, 2, 2]
    nx = ny = 26
    mask = np.zeros((ny, nx), np.float64)  # [y, x]
    # sealed square ring: solid frame rows/cols 6..19
    mask[6:20, 6] = 1.0
    mask[6:20, 19] = 1.0
    mask[6, 6:20] = 1.0
    mask[19, 6:20] = 1.0
    p = make_params(cfg, mask, dtype=jnp.float64)
    st = init_state(ny, nx, jnp.float64)
    # stir the cavity interior: equilibrium at a nonzero velocity
    from lbm2d_tpu.core.lattice import f_eq

    rho0 = jnp.ones((ny, nx), jnp.float64)
    ux0 = jnp.zeros((ny, nx), jnp.float64).at[9:17, 9:17].set(0.05)
    uy0 = jnp.zeros((ny, nx), jnp.float64).at[9:17, 9:17].set(-0.03)
    f0 = f_eq(rho0, ux0, uy0)
    st = st.replace(f=f0, f_post=f0, u=jnp.stack([ux0, uy0]))

    def cavity_mass(f):
        # interior + ring cells: populations entering a wall cell return
        # whence they came one step later (full-way bounce-back), so the
        # interior-plus-in-flight-wall-content sum is exact; the quiescent
        # exterior contributes a constant w_k per outward face
        return float(jnp.sum(f[:, 6:20, 6:20]))

    m0 = cavity_mass(st.f)
    for _ in range(30):
        st = step(st, p)
    m1 = cavity_mass(st.f)
    assert abs(m1 - m0) < 1e-9, f"cavity leaked: {m0} -> {m1}"


def test_bounce_channel_runs_and_drags():
    """f32 end-to-end: positive drag on a cylinder, finite fields."""
    cfg = dfg_config(nx=120, ny=40, warmup=200)
    ny, nx = 40, 120
    mask = np.zeros((ny, nx), np.float32)
    mask[0, :] = 1.0
    mask[-1, :] = 1.0
    yy, xx = np.mgrid[0:ny, 0:nx]
    mask[(yy - ny // 2) ** 2 + (xx - 25) ** 2 < 25] = 1.0
    p = make_params(cfg, mask)
    st = init_state(ny, nx)
    for _ in range(6):
        st, mon = run_chunk(st, p, n_steps=100)
    force = np.asarray(mon["force"])
    assert np.isfinite(force).all() and force[0] > 0
    assert float(mon["max_v"]) < 0.25
    # inlet column holds the ramped parabolic profile exactly
    prof = parabolic_profile(ny, 0.08, np.float32)
    np.testing.assert_allclose(
        np.asarray(st.u[0, 1:-1, 0]), prof[1:-1], rtol=0, atol=5e-7
    )


def test_halfway_bounce_matches_oracle():
    """Half-way bounce-back (obstacle = bounce_back_halfway) vs the scalar
    oracle: pulls from solid sources return the cell's own opposite previous
    population. NEW vs the reference (its archive solver is full-way only)."""
    cfg = dfg_config()
    cfg["boundary_condition"]["obstacle"] = "bounce_back_halfway"
    nx, ny = cfg["simulation"]["nx"], cfg["simulation"]["ny"]
    mask_xy = channel_mask_xy(nx, ny)

    oracle = OracleLBM(cfg, mask_xy)
    oracle.run_step(40)

    p = make_params(cfg, mask_xy.T, dtype=jnp.float64)
    assert p.halfway_obstacle and not p.bounce_obstacle
    st = init_state(ny, nx, jnp.float64)
    for _ in range(40):
        st = step(st, p)

    np.testing.assert_allclose(
        np.asarray(st.f), np.moveaxis(oracle.f_old, -1, 0).transpose(0, 2, 1),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(st.u[0]), oracle.vel[:, :, 0].T, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(st.rho), oracle.rho.T, atol=1e-12)


def test_halfway_kernel_matches_jnp():
    """The fused Pallas kernel's half-way path (precomputed neighbor-solid
    bit plane) vs the jnp chunk, both split-BC and in-kernel-BC modes."""
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas

    cfg = dfg_config(nx=128, ny=48, warmup=50)
    cfg["boundary_condition"]["obstacle"] = "bounce_back_halfway"
    ny, nx = 48, 128
    mask = np.zeros((ny, nx), np.float32)
    mask[0, :] = 1.0
    mask[-1, :] = 1.0
    yy, xx = np.mgrid[0:ny, 0:nx]
    mask[(yy - ny // 2) ** 2 + (xx - 30) ** 2 < 30] = 1.0
    p = make_params(cfg, mask)
    ref, ref_mon = run_chunk(init_state(ny, nx), p, 16)
    for split in (True, False):
        got, mon = run_chunk_pallas(
            init_state(ny, nx), p, n_steps=16, interpret=True, split_bc=split
        )
        np.testing.assert_allclose(
            np.asarray(got.f), np.asarray(ref.f), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(got.u), np.asarray(ref.u), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
        )


def test_halfway_force_formula():
    """force_on_obstacle_halfway on a hand-built field: one fluid cell with
    a solid +x neighbor contributes 2 f[1] to Fx (and the diagonals 2 f[k]
    e_k), summed from the fluid side only."""
    from lbm2d_tpu.core.solver import force_on_obstacle_halfway
    from lbm2d_tpu.core.lattice import E as E_LAT

    ny = nx = 8
    mask = np.zeros((ny, nx), np.float32)
    mask[3:5, 4:6] = 1.0  # 2x2 block
    f_post = np.zeros((9, ny, nx), np.float32)
    # fluid cell (3, 3) is west of solid (3, 4): its k with e=( +1, 0)
    # points into the wall
    k_east = next(
        k for k in range(9) if (int(E_LAT[k, 0]), int(E_LAT[k, 1])) == (1, 0)
    )
    f_post[k_east, 3, 3] = 0.7
    # a population deep in the fluid must not contribute
    f_post[k_east, 0, 0] = 9.9
    got = np.asarray(
        force_on_obstacle_halfway(jnp.asarray(f_post), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, [2 * 0.7, 0.0], atol=1e-7)


import os
import pytest


@pytest.mark.skipif(
    not os.environ.get("RUN_DFG"),
    reason="full DFG-2D benchmark: ~10 min of solver time; set RUN_DFG=1",
)
def test_dfg2d_benchmark_coefficients():
    """Schaefer-Turek 2D-2 at Re=100: Cd ~ 3.22, Cl ~ 1.0, St ~ 0.30.

    Hardware-measured (one v5e chip, D=40, 200k steps): Cd 3.05,
    Cl amplitude 0.90, St 0.288 -- tolerances cover the known D=40
    full-way-bounce-back resolution bias (BASELINE.md).
    """
    from lbm2d_tpu.analysis.dfg_validation import run_validation

    res = run_validation(
        re=100.0, steps=160000, chunk=500, ny=165, u_target=0.1,
        mode="dfg", progress=False,
    )
    assert res["shedding_detected"]
    assert 0.26 <= res["strouhal"] <= 0.32, res
    assert 2.7 <= res["cd_mean"] <= 3.5, res
    assert 0.5 <= res["cl_amplitude"] <= 1.4, res
    assert 90 <= res["re_measured"] <= 110, res


def test_nebb_velocity_inlet_matches_oracle():
    """bc type 4 (profiled-velocity NEBB inlet): jnp path == scalar oracle."""
    cfg = dfg_config()
    cfg["boundary_condition"]["type"] = [4, 2, 1, 2]
    nx, ny = cfg["simulation"]["nx"], cfg["simulation"]["ny"]
    mask_xy = channel_mask_xy(nx, ny)

    oracle = OracleLBM(cfg, mask_xy)
    oracle.run_step(40)

    p = make_params(cfg, mask_xy.T, dtype=jnp.float64)
    assert p.inlet_profile is not None
    st = init_state(ny, nx, jnp.float64)
    for _ in range(40):
        st = step(st, p)

    np.testing.assert_allclose(
        np.asarray(st.f), np.moveaxis(oracle.f_old, -1, 0).transpose(0, 2, 1),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(st.u[0]), oracle.vel[:, :, 0].T, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(st.rho), oracle.rho.T, atol=1e-12)


def test_nebb_inlet_delivers_prescribed_velocity_better():
    """The NEBB inlet (type 4) must realize the prescribed profile at the
    first interior column much more closely than the pure-equilibrium
    type-3 inlet, whose O(grad u) non-equilibrium deficit under-delivers
    velocity (measured ~4% low in the DFG hardware runs)."""
    from lbm2d_tpu.core.solver import parabolic_profile

    errs = {}
    for t in (3, 4):
        cfg = dfg_config(nx=60, ny=21, nu=0.02, warmup=50)
        cfg["boundary_condition"]["type"] = [t, 0, 1, 0]
        cfg["boundary_condition"]["value"] = [[0.08, 0.0]] + [[0.0, 0.0]] * 3
        nx, ny = 60, 21
        p = make_params(cfg, np.zeros((ny, nx)), dtype=jnp.float64)
        st = init_state(ny, nx, jnp.float64)
        # one compiled scan instead of 600 host-loop dispatches (identical
        # trajectory; run_chunk scans the same step) -- suite-time trim
        from lbm2d_tpu.core.solver import run_chunk

        st, _ = run_chunk(st, p, n_steps=600)
        prof = parabolic_profile(ny, 0.08)
        got = np.asarray(st.u[0, 1:-1, 1])
        errs[t] = float(np.abs(got - prof[1:-1]).max() / prof.max())
    assert errs[4] < 0.01, errs  # NEBB: prescribed profile actually delivered
    assert errs[4] < 0.5 * errs[3], errs
