"""Bouzidi interpolated (curved-wall) bounce-back: q planes, streaming, force.

NEW capability vs the reference (no curved-boundary scheme exists there; its
archive solver is full-way bounce-back only, archive/lbm_mrt/solver.py:181-195).
Scheme: Bouzidi, Firdaouss & Lallemand (2001), linear interpolation variant --
the returned population is interpolated so the no-slip surface sits at the
true sub-grid wall distance q along each boundary link instead of the lattice
midpoint, removing the staircase wall-location error on curved obstacles.
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from lbm2d_tpu.core.lattice import E, OPP
from lbm2d_tpu.core.solver import (
    bouzidi_q_planes,
    collide_stream_full,
    force_on_obstacle_bouzidi,
    init_state,
    make_params,
    mrt_collide,
    step,
)

# an off-grid circle so the boundary links get genuinely varied q values
GEOM = {"shape": "cylinder", "cx": 15.3, "cy": 11.6, "r": 4.7}


def circle_mask(ny, nx, geom=GEOM):
    yy, xx = np.mgrid[0:ny, 0:nx]
    return (
        (xx - geom["cx"]) ** 2 + (yy - geom["cy"]) ** 2 <= geom["r"] ** 2
    ).astype(np.float32)


def cyl_config(nx=40, ny=24, obstacle="bounce_back_bouzidi"):
    cfg = {
        "simulation": {
            "nx": nx,
            "ny": ny,
            "nu": 0.04,
            "ghost_moments_s": 1.2,
            "rho_in": 1.0,
            "rho_out": 1.0,
            "smagorinsky_constant": 0.0,
            "warmup_steps": 25,
        },
        "boundary_condition": {
            "type": [3, 2, 1, 2],
            "value": [[0.08, 0.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]],
            "obstacle": obstacle,
        },
        "domain_zones": {
            "sponge_in": 1,
            "sponge_out": 1,
            "sponge_top": 1,
            "sponge_bot": 1,
            "sponge_strength": 0.0,
        },
    }
    if obstacle == "bounce_back_bouzidi":
        cfg["boundary_condition"]["obstacle_geometry"] = dict(GEOM)
    return cfg


def test_q_planes_lie_on_the_circle():
    """Every non-fallback q puts the point c + q e_j exactly on the wall."""
    ny, nx = 24, 40
    mask = circle_mask(ny, nx)
    solid = mask > 0.5
    q = bouzidi_q_planes(mask, GEOM, np.float64)
    checked = 0
    for j in range(1, 9):
        ex, ey = int(E[j, 0]), int(E[j, 1])
        for y in range(ny):
            for x in range(nx):
                yn, xn = y + ey, x + ex
                if not (0 <= yn < ny and 0 <= xn < nx):
                    continue
                if solid[y, x] or not solid[yn, xn]:
                    # non-boundary-link cells carry the 0.5 default
                    assert q[j - 1, y, x] == 0.5
                    continue
                qq = q[j - 1, y, x]
                assert 0.0 < qq <= 1.0
                if qq != 0.5:  # 0.5 may be a fallback; skip the on-wall check
                    px, py = x + qq * ex, y + qq * ey
                    r = np.hypot(px - GEOM["cx"], py - GEOM["cy"])
                    np.testing.assert_allclose(r, GEOM["r"], rtol=1e-12)
                    checked += 1
    assert checked > 40  # the circle has many genuinely fractional links


def test_q_half_reduces_to_halfway_bitwise():
    """With all q forced to 1/2 the Bouzidi step must equal half-way exactly."""
    ny, nx = 24, 40
    mask = circle_mask(ny, nx)
    p_h = make_params(cyl_config(obstacle="bounce_back_halfway"), mask)
    p_b = make_params(cyl_config(obstacle="bounce_back_bouzidi"), mask)
    p_b = p_b.replace(bouzidi_q=jnp.full_like(p_b.bouzidi_q, 0.5))
    s_h = init_state(ny, nx)
    s_b = init_state(ny, nx)
    for _ in range(12):
        s_h = step(s_h, p_h)
        s_b = step(s_b, p_b)
    np.testing.assert_array_equal(np.asarray(s_h.f), np.asarray(s_b.f))
    np.testing.assert_array_equal(np.asarray(s_h.u), np.asarray(s_b.u))


def _scalar_bouzidi_pull(f, solid, q):
    """Scalar-loop replica of the Bouzidi pull stream (test-only spec).

    Base pull uses np.roll like solver.pull_stream; boundary-link overrides
    use zero-fill bounds semantics like solver.shift2d.
    """
    K, H, W_ = f.shape
    fs = np.stack(
        [np.roll(f[k], (int(E[k, 1]), int(E[k, 0])), axis=(0, 1)) for k in range(9)]
    )
    for k in range(1, 9):
        ex, ey = int(E[k, 0]), int(E[k, 1])
        j = int(OPP[k])
        for y in range(H):
            for x in range(W_):
                ys, xs = y - ey, x - ex  # pull source
                src_solid = (0 <= ys < H and 0 <= xs < W_) and solid[ys, xs]
                if not src_solid:
                    continue
                qq = q[j - 1, y, x]
                f_j = f[j, y, x]
                yu, xu = y + ey, x + ex  # upstream interp cell c - e_j
                f_j_up = (
                    f[j, yu, xu] if (0 <= yu < H and 0 <= xu < W_) else 0.0
                )
                if qq < 0.5:
                    fs[k, y, x] = 2.0 * qq * f_j + (1.0 - 2.0 * qq) * f_j_up
                else:
                    fs[k, y, x] = f_j / (2.0 * qq) + (
                        2.0 * qq - 1.0
                    ) / (2.0 * qq) * f[k, y, x]
    return fs


def test_bouzidi_stream_matches_scalar_replica():
    ny, nx = 24, 40
    mask = circle_mask(ny, nx)
    p = make_params(cyl_config(), mask, dtype=jnp.float64)
    rng = np.random.default_rng(7)
    f = rng.uniform(0.01, 0.2, size=(9, ny, nx))

    got, rho_g, ux_g, uy_g = collide_stream_full(jnp.asarray(f), p)

    fs_exp = _scalar_bouzidi_pull(f, mask > 0.5, np.asarray(p.bouzidi_q))
    want, rho_w, ux_w, uy_w = mrt_collide(jnp.asarray(fs_exp), p)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(rho_g), np.asarray(rho_w))


def test_bouzidi_force_matches_scalar_replica():
    ny, nx = 24, 40
    mask = circle_mask(ny, nx)
    solid = mask > 0.5
    q = bouzidi_q_planes(mask, GEOM, np.float64)
    rng = np.random.default_rng(3)
    f_post = rng.uniform(0.01, 0.2, size=(9, ny, nx))

    got = np.asarray(
        force_on_obstacle_bouzidi(
            jnp.asarray(f_post), jnp.asarray(mask, jnp.float64), jnp.asarray(q)
        )
    )

    fx = fy = 0.0
    for j in range(1, 9):
        ex, ey = int(E[j, 0]), int(E[j, 1])
        k = int(OPP[j])
        for y in range(ny):
            for x in range(nx):
                yn, xn = y + ey, x + ex
                if solid[y, x]:
                    continue
                if not (0 <= yn < ny and 0 <= xn < nx) or not solid[yn, xn]:
                    continue
                qq = q[j - 1, y, x]
                f_j = f_post[j, y, x]
                yu, xu = y - ey, x - ex
                f_j_up = (
                    f_post[j, yu, xu] if (0 <= yu < ny and 0 <= xu < nx) else 0.0
                )
                if qq < 0.5:
                    f_ret = 2.0 * qq * f_j + (1.0 - 2.0 * qq) * f_j_up
                else:
                    f_ret = f_j / (2.0 * qq) + (2.0 * qq - 1.0) / (
                        2.0 * qq
                    ) * f_post[k, y, x]
                fx += (f_j + f_ret) * ex
                fy += (f_j + f_ret) * ey
    np.testing.assert_allclose(got, [fx, fy], rtol=1e-12)


def test_bouzidi_in_kernel_matches_jnp():
    """Bouzidi in the fused Pallas kernel (in-kernel-BC path): bitwise-level
    parity vs the jnp path. nx = 40 is not a lane multiple, so split-BC is
    ineligible and every step runs the in-kernel-BC kernel with the q-plane
    interpolation inline."""
    from lbm2d_tpu.core.solver import run_chunk
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas, supports

    ny, nx = 24, 40
    mask = circle_mask(ny, nx)
    p = make_params(cyl_config(), mask)
    assert supports(p) and p.bouzidi_obstacle

    ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)
    out, mon = run_chunk_pallas(init_state(ny, nx), p, n_steps=12, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
    )


def test_bouzidi_split_bc_kernel_matches_jnp():
    """Bouzidi through the split-BC fast path (128-lane grid -> auto split):
    the q planes ride the band BlockSpecs of the no-BC kernel and the edge
    kernel rewrites the ring afterwards."""
    from lbm2d_tpu.core.solver import run_chunk
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas, supports

    ny, nx = 48, 128
    geom = {"shape": "cylinder", "cx": 33.3, "cy": 23.6, "r": 7.7}
    mask = circle_mask(ny, nx, geom)
    cfg = cyl_config(nx=nx, ny=ny)
    cfg["boundary_condition"]["obstacle_geometry"] = dict(geom)
    p = make_params(cfg, mask)
    assert supports(p)

    ref, ref_mon = run_chunk(init_state(ny, nx), p, 9)
    out, mon = run_chunk_pallas(
        init_state(ny, nx), p, n_steps=9, interpret=True, split_bc=True
    )
    np.testing.assert_allclose(
        np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
    )


def test_bouzidi_engine_smoke():
    """End-to-end through LBMEngine (jnp runner on CPU), stable, finite drag."""
    from lbm2d_tpu.analysis.dfg_validation import dfg_case
    from lbm2d_tpu.core.engine import LBMEngine
    from lbm2d_tpu.ops.pallas_step import supports

    cfg, mask, d = dfg_case(ny=45, u_max=0.1, re=50.0,
                            obstacle="bounce_back_bouzidi")
    cfg["simulation"]["warmup_steps"] = 100
    eng = LBMEngine(cfg, mask)
    assert supports(eng.params)  # bouzidi runs in the fused kernel on TPU
    eng.run_step(200)
    force = np.asarray(eng.get_force())
    assert np.isfinite(force).all()
    assert force[0] > 0.0  # drag pushes downstream
    assert float(eng.get_max_velocity()) < 0.5
