"""Taylor-Green vortex: analytic validation of the MRT collision core.

The oracle tests pin *implementation* parity with the reference
(LBM2D_MRT_LES.py:243-420); this test pins *physics*: on a fully periodic
domain (pull streaming via jnp.roll is already periodic, no BCs, no sponge,
no obstacle, LES off) the D2Q9 MRT model must reproduce the analytic viscous
decay of the Taylor-Green vortex,

    u(x, y, t) = -U0 cos(kx) sin(ky) exp(-2 nu k^2 t)
    v(x, y, t) =  U0 sin(ky') cos(ky) ...  (x<->y mirrored)

so kinetic energy decays as E(t) = E(0) exp(-4 nu k^2 t) with
nu = (tau - 1/2) / 3. A fitted effective viscosity within ~1% of nominal
confirms the moment transforms, the equilibrium, and the stress relaxation
rate are mutually consistent -- an error in any of them shifts nu_eff.
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from lbm2d_tpu.core.lattice import f_eq
from lbm2d_tpu.core.solver import mrt_collide_arrays, pull_stream


def tgv_fields(n, U0, dtype=jnp.float64):
    k = 2.0 * np.pi / n
    y, x = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    ux = -U0 * np.cos(k * x) * np.sin(k * y)
    uy = U0 * np.sin(k * x) * np.cos(k * y)
    # compressible pressure field of the steady TGV: p = -rho0 U0^2/4 *
    # (cos 2kx + cos 2ky); rho = 1 + 3 p (c_s^2 = 1/3 lattice units)
    rho = 1.0 - 3.0 * U0 * U0 / 4.0 * (np.cos(2 * k * x) + np.cos(2 * k * y))
    return (
        jnp.asarray(rho, dtype),
        jnp.asarray(ux, dtype),
        jnp.asarray(uy, dtype),
        k,
    )


def test_tgv_viscous_decay_matches_analytic():
    n, U0, tau = 128, 0.02, 0.8
    nu = (tau - 0.5) / 3.0
    rho, ux, uy, k = tgv_fields(n, U0)
    f = f_eq(rho, ux, uy)
    zero = jnp.zeros((n, n), f.dtype)

    def step(f, _):
        fs = pull_stream(f)
        f_post, _, ux, uy = mrt_collide_arrays(
            fs, zero, jnp.asarray(tau, f.dtype), jnp.asarray(0.0, f.dtype),
            jnp.asarray(1.0, f.dtype), use_les=False,
        )
        return f_post, jnp.sum(ux * ux + uy * uy)

    n_steps = 400
    f, energy = jax.lax.scan(step, f, None, length=n_steps)
    e = np.asarray(energy)
    assert np.isfinite(e).all() and (e > 0).all()

    # fit log E on the late window (transients from the compressible init
    # decay within the first acoustic periods)
    t = np.arange(1, n_steps + 1)
    w = t >= 100
    slope = np.polyfit(t[w], np.log(e[w]), 1)[0]
    nu_eff = -slope / (4.0 * k * k)
    assert abs(nu_eff - nu) / nu < 0.01, (nu_eff, nu)


def test_tgv_velocity_field_shape_preserved():
    """The decaying field must stay a TGV (same spatial mode, no drift):
    correlation with the analytic mode stays ~1 and the amplitude matches
    exp(-2 nu k^2 t)."""
    n, U0, tau = 96, 0.01, 0.65
    nu = (tau - 0.5) / 3.0
    rho, ux0, uy0, k = tgv_fields(n, U0)
    f = f_eq(rho, ux0, uy0)
    zero = jnp.zeros((n, n), f.dtype)

    def step(f, _):
        fs = pull_stream(f)
        f_post, _, _, _ = mrt_collide_arrays(
            fs, zero, jnp.asarray(tau, f.dtype), jnp.asarray(0.0, f.dtype),
            jnp.asarray(1.0, f.dtype), use_les=False,
        )
        return f_post, None

    n_steps = 300
    f, _ = jax.lax.scan(step, f, None, length=n_steps)
    fs = pull_stream(f)
    _, _, ux, uy = mrt_collide_arrays(
        fs, zero, jnp.asarray(tau, f.dtype), jnp.asarray(0.0, f.dtype),
        jnp.asarray(1.0, f.dtype), use_les=False,
    )
    ux, uy = np.asarray(ux), np.asarray(uy)
    u0x, u0y = np.asarray(ux0), np.asarray(uy0)

    num = (ux * u0x + uy * u0y).sum()
    den = np.sqrt((ux**2 + uy**2).sum() * (u0x**2 + u0y**2).sum())
    assert num / den > 0.999, "spatial mode drifted"

    amp = num / (u0x**2 + u0y**2).sum()  # projection amplitude
    expect = np.exp(-2.0 * nu * k * k * (n_steps + 1))
    assert abs(amp - expect) / expect < 0.02, (amp, expect)
