"""Spatially-sharded multi-chip step: shard_map + 1-cell halo exchange.

Large grids (BASELINE config #5: 4096^2) are decomposed over a 2D device
mesh. Each lattice step a shard exchanges its 1-cell edge ring with the four
axis neighbors via ``jax.lax.ppermute`` (two phases: x edges first, then y
edges including the already-attached x halos, so corner cells -- needed by
the diagonal D2Q9 velocities -- arrive in two hops). All collectives ride
ICI; the host sees one compiled program per chunk.

Boundary conditions are applied on local edge strips gated by global
coordinates, in the reference's sequential order (left/right, then
top/bottom including corners, then obstacles) so the sharded step is
bitwise-equivalent to the single-device step (verified by
tests/test_sharded.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..core.lattice import W, PI_REF, f_eq
from ..core.solver import (
    BC_FREE_SLIP,
    BC_INLET,
    BC_OUTLET,
    CaseParams,
    LBMState,
    bc_horizontal_values,
    bc_left_values,
    bc_right_values,
    force_on_obstacle,
    max_velocity,
    mrt_collide,
    pull_stream_halo,
)
from .topology import AXIS_X, AXIS_Y, params_specs, state_specs


def _edge_exchange(x: jnp.ndarray, axis: int, axis_name: str, n: int) -> jnp.ndarray:
    """Attach 1-cell halos along ``axis`` using cyclic ppermute.

    Wrap-around halos land only on global-boundary shards, whose outermost
    cells are the (never-collided) boundary ring -- the garbage is discarded
    exactly like jnp.roll wrap-around in the single-device path.
    """
    if n == 1:
        # single shard along this axis: halo is the local opposite edge
        lo = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
        hi = lax.slice_in_dim(x, 0, 1, axis=axis)
        return jnp.concatenate([lo, x, hi], axis=axis)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    last = lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    from_left = lax.ppermute(last, axis_name, fwd)  # my low-side halo
    from_right = lax.ppermute(first, axis_name, bwd)  # my high-side halo
    return jnp.concatenate([from_left, x, from_right], axis=axis)


def exchange_halo_f(f: jnp.ndarray, mesh) -> jnp.ndarray:
    """[9, h, w] -> [9, h+2, w+2] with neighbor halos (corners included)."""
    nx_shards = mesh.shape[AXIS_X]
    ny_shards = mesh.shape[AXIS_Y]
    f = _edge_exchange(f, 2, AXIS_X, nx_shards)
    f = _edge_exchange(f, 1, AXIS_Y, ny_shards)
    return f


# ---------------------------------------------------------------------------
# Local-strip boundary conditions gated by global coordinates
# ---------------------------------------------------------------------------


def _sharded_apply_bc(f, rho, u, step, p: CaseParams, ny: int, nx: int):
    """apply_bc on local blocks; global-edge shards detected via axis_index."""
    dtype = f.dtype
    h, w = f.shape[-2], f.shape[-1]
    iy = lax.axis_index(AXIS_Y)
    ix = lax.axis_index(AXIS_X)
    y0 = iy * h
    x0 = ix * w
    gy = y0 + jnp.arange(h)
    gx = x0 + jnp.arange(w)

    progress = jnp.minimum(1.0, step.astype(dtype) / p.warmup_steps.astype(dtype))
    ramp = 1.0 - jnp.cos(jnp.asarray(0.5 * PI_REF, dtype) * progress)

    inner_rows = (gy >= 1) & (gy <= ny - 2)  # [h]

    def set_col(f, rho, u, col, fb, rho_b, ux_b, uy_b, sel):
        f = f.at[:, :, col].set(jnp.where(sel[None, :], fb, f[:, :, col]))
        rho = rho.at[:, col].set(jnp.where(sel, rho_b, rho[:, col]))
        u = u.at[0, :, col].set(jnp.where(sel, ux_b, u[0, :, col]))
        u = u.at[1, :, col].set(jnp.where(sel, uy_b, u[1, :, col]))
        return f, rho, u

    def set_row(f, rho, u, row, fb, rho_b, ux_b, uy_b, sel):
        f = f.at[:, row, :].set(jnp.where(sel[None, :], fb, f[:, row, :]))
        rho = rho.at[row, :].set(jnp.where(sel, rho_b, rho[row, :]))
        u = u.at[0, row, :].set(jnp.where(sel, ux_b, u[0, row, :]))
        u = u.at[1, row, :].set(jnp.where(sel, uy_b, u[1, row, :]))
        return f, rho, u

    # -- left edge (global x == 0), neighbor x == 1 ---------------------------
    vals = bc_left_values(
        f[:, :, 1], rho[:, 1], u[0, :, 1], u[1, :, 1], ramp,
        p.bc_type[0], p.rho_in,
    )
    if vals is not None:
        fb, rho_b, ux_b, uy_b = vals
        sel = inner_rows & (x0 == 0)
        f, rho, u = set_col(f, rho, u, 0, fb, rho_b, ux_b, uy_b, sel)

    # -- right edge (global x == nx-1), neighbor x == nx-2 --------------------
    vals = bc_right_values(
        f[:, :, -2], rho[:, -2], u[0, :, -2], u[1, :, -2], ramp,
        p.bc_type[2], p.rho_out, p.bc_value[2],
    )
    if vals is not None:
        fb, rho_b, ux_b, uy_b = vals
        sel = inner_rows & (x0 + w == nx)
        f, rho, u = set_col(f, rho, u, w - 1, fb, rho_b, ux_b, uy_b, sel)

    # -- top row (global y == ny-1) and bottom row (global y == 0) -----------
    for side, row, nbr, on_edge in (
        (1, h - 1, h - 2, y0 + h == ny),
        (3, 0, 1, y0 == 0),
    ):
        vals = bc_horizontal_values(
            f[:, nbr, :], rho[nbr, :], u[0, nbr, :], u[1, nbr, :], ramp,
            p.bc_type[side], p.bc_value[side],
        )
        if vals is None:
            continue
        fb, rho_b, ux_b, uy_b = vals
        sel = jnp.broadcast_to(jnp.asarray(on_edge), (w,))
        f, rho, u = set_row(f, rho, u, row, fb, rho_b, ux_b, uy_b, sel)

    # -- obstacles ------------------------------------------------------------
    solid = p.mask > 0.5
    w9 = jnp.asarray(W, dtype).reshape(9, 1, 1)
    f = jnp.where(solid[None], w9 * rho[None], f)
    u = jnp.where(solid[None], jnp.zeros_like(u), u)
    return f, rho, u


def make_local_step(mesh, ny: int, nx: int):
    """Build the per-shard step(state, params) closure for shard_map."""

    def local_step(state: LBMState, p: CaseParams) -> LBMState:
        h, w = state.rho.shape
        iy = lax.axis_index(AXIS_Y)
        ix = lax.axis_index(AXIS_X)
        gy = iy * h + jnp.arange(h)
        gx = ix * w + jnp.arange(w)
        interior = ((gy >= 1) & (gy <= ny - 2))[:, None] & (
            (gx >= 1) & (gx <= nx - 2)
        )[None, :]

        f_halo = exchange_halo_f(state.f, mesh)
        fs = pull_stream_halo(f_halo)
        f_c, rho_c, ux_c, uy_c = mrt_collide(fs, p, damping=p.damping)

        f_post = jnp.where(interior[None], f_c, state.f_post)
        f = jnp.where(interior[None], f_c, state.f)
        rho = jnp.where(interior, rho_c, state.rho)
        u = state.u
        u = u.at[0].set(jnp.where(interior, ux_c, u[0]))
        u = u.at[1].set(jnp.where(interior, uy_c, u[1]))

        new_step = state.step + 1
        f, rho, u = _sharded_apply_bc(f, rho, u, new_step, p, ny, nx)
        return LBMState(f=f, f_post=f_post, rho=rho, u=u, step=new_step)

    return local_step


@functools.partial(jax.jit, static_argnames=("n_steps", "mesh", "ny", "nx"))
def run_chunk_sharded(state: LBMState, p: CaseParams, n_steps: int, mesh, ny: int, nx: int):
    """Advance n_steps on the mesh; monitors computed globally under GSPMD."""
    local_step = make_local_step(mesh, ny, nx)

    def chunk(state_l, p_l):
        def body(s, _):
            return local_step(s, p_l), None

        s, _ = lax.scan(body, state_l, None, length=n_steps)
        return s

    s_specs, p_specs = state_specs(), params_specs(p)
    state = shard_map(
        chunk, mesh=mesh, in_specs=(s_specs, p_specs), out_specs=s_specs,
    )(state, p)
    monitors = {
        "force": force_on_obstacle(state.f_post, p.mask),
        "max_v": max_velocity(state.u),
    }
    return state, monitors
