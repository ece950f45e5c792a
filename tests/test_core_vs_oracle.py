"""Golden tests: JAX solver vs the scalar NumPy oracle (SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_enable_x64", True)

from lbm2d_tpu.core import lattice
from lbm2d_tpu.core.solver import (
    CaseParams,
    init_state,
    make_params,
    run_chunk,
    step,
    moments_output,
    force_on_obstacle,
    max_velocity,
)
from tests.oracle import OracleLBM


def tiny_config(nx=24, ny=16, nu=0.05, cs=0.1, warmup=30):
    return {
        "simulation": {
            "nx": nx,
            "ny": ny,
            "nu": nu,
            "ghost_moments_s": 1.2,
            "rho_in": 1.02,
            "rho_out": 1.0,
            "smagorinsky_constant": cs,
            "warmup_steps": warmup,
        },
        "boundary_condition": {
            "type": [0, 2, 1, 2],
            "value": [[0.05, 0.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]],
        },
        "domain_zones": {
            "sponge_in": 3,
            "sponge_out": 4,
            "sponge_top": 2,
            "sponge_bot": 2,
            "sponge_strength": 3.0,
        },
    }


def block_mask_xy(nx, ny):
    mask = np.zeros((nx, ny), np.float64)
    mask[9:13, 6:10] = 1.0
    return mask


def test_moment_matrix_roundtrip():
    assert np.allclose(lattice.M @ lattice.M_INV, np.eye(9), atol=1e-12)


def test_feq_meq_consistency():
    rho = jnp.asarray(np.random.default_rng(0).uniform(0.9, 1.1, (5, 7)))
    ux = jnp.asarray(np.random.default_rng(1).uniform(-0.1, 0.1, (5, 7)))
    uy = jnp.asarray(np.random.default_rng(2).uniform(-0.1, 0.1, (5, 7)))
    feq = lattice.f_eq(rho, ux, uy)
    meq = lattice.m_eq(rho, ux, uy)
    m_of_feq = lattice.moments_from_f(feq)
    # M f_eq == m_eq up to O(u^3) closure terms in rows 1/2/4/6; conserved and
    # stress rows agree exactly for the standard incompressible m_eq.
    for row in (0, 3, 5):
        np.testing.assert_allclose(m_of_feq[row], meq[row], atol=1e-12)
    # density must be exactly reproduced by the weights
    np.testing.assert_allclose(jnp.sum(feq, axis=0), rho, atol=1e-12)


def test_collision_conserves_invariants():
    cfg = tiny_config()
    p = make_params(cfg, dtype=jnp.float64)
    st = init_state(cfg["simulation"]["ny"], cfg["simulation"]["nx"], jnp.float64)
    # random perturbation of f in the deep interior (avoid ring effects)
    rng = np.random.default_rng(3)
    f = np.array(st.f)
    f[:, 4:-4, 4:-4] *= 1.0 + 0.01 * rng.standard_normal(f[:, 4:-4, 4:-4].shape)
    from lbm2d_tpu.core.solver import collide_stream_full

    f = jnp.asarray(f)
    f_post, rho, ux, uy = collide_stream_full(f, p)
    # post-collision moments 0/3/5 equal pre-collision (post-stream) values
    fs = jnp.stack(
        [
            jnp.roll(f[k], (int(lattice.E[k, 1]), int(lattice.E[k, 0])), (0, 1))
            for k in range(9)
        ]
    )
    m_pre = lattice.moments_from_f(fs)
    m_post = lattice.moments_from_f(f_post)
    for row in (0, 3, 5):
        np.testing.assert_allclose(
            m_post[row][2:-2, 2:-2], m_pre[row][2:-2, 2:-2], rtol=0, atol=1e-12
        )


@pytest.mark.parametrize("with_mask", [False, True])
def test_full_step_parity_f64(with_mask):
    """40 steps, f64 on both sides: fields must agree to ~1e-12."""
    cfg = tiny_config()
    nx, ny = cfg["simulation"]["nx"], cfg["simulation"]["ny"]
    mask_xy = block_mask_xy(nx, ny) if with_mask else None

    oracle = OracleLBM(cfg, mask_xy)
    mask_yx = None if mask_xy is None else mask_xy.T
    p = make_params(cfg, mask_yx, dtype=jnp.float64)
    st = init_state(ny, nx, jnp.float64)

    for it in range(8):
        oracle.run_step(5)
        st, mon = run_chunk(st, p, 5)

        np.testing.assert_allclose(
            np.asarray(st.f), oracle.f_old.transpose(2, 1, 0), atol=1e-12,
            err_msg=f"f mismatch at chunk {it}",
        )
        np.testing.assert_allclose(
            np.asarray(st.f_post), oracle.f_new.transpose(2, 1, 0), atol=1e-12
        )
        np.testing.assert_allclose(np.asarray(st.rho), oracle.rho.T, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(st.u), oracle.vel.transpose(2, 1, 0), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(mon["force"]), oracle.force(), atol=1e-12
        )
        ovel = np.linalg.norm(oracle.vel, axis=2).max()
        np.testing.assert_allclose(float(mon["max_v"]), ovel, atol=1e-12)

    moments = np.asarray(moments_output(st))
    np.testing.assert_allclose(moments, oracle.moments().transpose(2, 1, 0), atol=1e-11)


def test_full_step_parity_f32():
    """f32 JAX vs f64 oracle: BASELINE tolerance 1e-5 relative on moments."""
    cfg = tiny_config()
    nx, ny = cfg["simulation"]["nx"], cfg["simulation"]["ny"]
    mask_xy = block_mask_xy(nx, ny)
    oracle = OracleLBM(cfg, mask_xy)
    p = make_params(cfg, mask_xy.T, dtype=jnp.float32)
    st = init_state(ny, nx, jnp.float32)

    oracle.run_step(40)
    st, mon = run_chunk(st, p, 40)
    ref = oracle.moments().transpose(2, 1, 0)
    got = np.asarray(moments_output(st))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-5


def test_warmup_ramp_monotone_inlet():
    """Inlet velocity grows with the cosine ramp and flow moves +x."""
    cfg = tiny_config(warmup=100)
    nx, ny = cfg["simulation"]["nx"], cfg["simulation"]["ny"]
    p = make_params(cfg, dtype=jnp.float32)
    st = init_state(ny, nx, jnp.float32)
    u_means = []
    for _ in range(4):
        st, _ = run_chunk(st, p, 25)
        u_means.append(float(np.mean(np.asarray(st.u[0, 1:-1, 1]))))
    assert u_means[0] > 0
    assert u_means[-1] > u_means[0]
    assert np.isfinite(np.asarray(st.f)).all()


def test_sponge_field_matches_oracle():
    cfg = tiny_config()
    nx, ny = cfg["simulation"]["nx"], cfg["simulation"]["ny"]
    oracle = OracleLBM(cfg)
    from lbm2d_tpu.core.sponge import sponge_damping_field

    z = cfg["domain_zones"]
    damp = sponge_damping_field(
        nx, ny, z["sponge_in"], z["sponge_out"], z["sponge_top"], z["sponge_bot"],
        z["sponge_strength"], dtype=np.float64,
    )
    ref = np.array([[oracle._sponge(i, j) for i in range(nx)] for j in range(ny)])
    np.testing.assert_allclose(damp, ref, atol=1e-14)
