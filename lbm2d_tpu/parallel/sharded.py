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

from ..core.lattice import E, OPP, W, PI_REF, f_eq
from ..core.solver import (
    BC_FREE_SLIP,
    BC_INLET,
    BC_OUTLET,
    CaseParams,
    LBMState,
    bc_horizontal_values,
    bc_left_values,
    bc_right_values,
    max_velocity,
    mrt_collide,
    neighbor_solid_bits,
    obstacle_force,
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
        p.bc_type[0], p.rho_in, u_prof=p.inlet_profile,
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

    # -- obstacles (bounce mode handled in the collide, like solver) ----------
    solid = p.mask > 0.5
    if not p.bounce_obstacle:
        w9 = jnp.asarray(W, dtype).reshape(9, 1, 1)
        f = jnp.where(solid[None], w9 * rho[None], f)
    u = jnp.where(solid[None], jnp.zeros_like(u), u)
    return f, rho, u


def make_local_step(mesh, ny: int, nx: int):
    """Build the per-shard step(state, params) closure for shard_map.

    ``nbb_l`` (half-way / Bouzidi bounce-back) is this shard's block of the
    GLOBAL neighbor-solid bit plane (solver.neighbor_solid_bits), computed
    before shard_map so shard-boundary-crossing solid neighbors are seen."""

    def local_step(state: LBMState, p: CaseParams, nbb_l=None) -> LBMState:
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
        if p.halfway_obstacle:
            # half-way bounce-back: pulls from solid sources return the
            # cell's own opposite previous population (see solver)
            planes = [fs[0]]
            for k in range(1, 9):
                nb_solid = ((nbb_l >> k) & 1) != 0
                planes.append(jnp.where(nb_solid, state.f[int(OPP[k])], fs[k]))
            fs = jnp.stack(planes)
        if p.bouzidi_obstacle:
            # Bouzidi interpolated bounce-back (solver.collide_stream_full):
            # the q < 1/2 branch reads f_j at c + e_k, which can cross a
            # shard seam -- served from the same 1-cell halo the pull stream
            # uses (f_halo holds the previous post-BC f with corners).
            # Global-ring reads differ from the single-device zero fill only
            # on ring cells, whose update the interior mask discards.
            planes = [fs[0]]
            for k in range(1, 9):
                ex, ey = int(E[k, 0]), int(E[k, 1])
                j = int(OPP[k])
                nb_solid = ((nbb_l >> k) & 1) != 0
                q = p.bouzidi_q[j - 1]
                f_j = state.f[j]
                f_j_up = f_halo[j, 1 + ey : 1 + ey + h, 1 + ex : 1 + ex + w]
                lo = 2.0 * q * f_j + (1.0 - 2.0 * q) * f_j_up
                hi = f_j / (2.0 * q) + (2.0 * q - 1.0) / (2.0 * q) * state.f[k]
                planes.append(
                    jnp.where(nb_solid, jnp.where(q < 0.5, lo, hi), fs[k])
                )
            fs = jnp.stack(planes)
        f_c, rho_c, ux_c, uy_c = mrt_collide(fs, p, damping=p.damping)
        if p.bounce_obstacle:
            solid_c = p.mask > 0.5
            f_bb = jnp.stack([fs[int(OPP[k])] for k in range(9)])
            f_c = jnp.where(solid_c[None], f_bb, f_c)

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


# ---------------------------------------------------------------------------
# Fused-Pallas sharded chunk: per-shard stencil kernel + ppermute halos
# ---------------------------------------------------------------------------


def _halo_update_padded(fp: jnp.ndarray, hl: int, wl: int, px: int, mesh):
    """Refresh the 1-cell halo ring of a kernel-padded local block.

    ``fp`` is the Pallas row/lane-padded layout [9, Hp + 2*PY, wl + 2*px]
    with real cells at (PY, px). Two phases like exchange_halo_f: x edges
    first, then y edges carrying the just-attached x halos so corner cells
    (diagonal D2Q9 velocities) arrive in two hops. Wrap-around halos land
    only on global-boundary shards whose ring the in-kernel BCs rewrite.
    """
    from ..ops.pallas_step import PY

    nxs = mesh.shape[AXIS_X]
    nys = mesh.shape[AXIS_Y]
    rows = slice(PY, PY + hl)

    if px:
        left_edge = fp[:, rows, px : px + 1]
        right_edge = fp[:, rows, px + wl - 1 : px + wl]
        if nxs == 1:
            from_left, from_right = right_edge, left_edge
        else:
            fwd = [(i, (i + 1) % nxs) for i in range(nxs)]
            bwd = [(i, (i - 1) % nxs) for i in range(nxs)]
            from_left = lax.ppermute(right_edge, AXIS_X, fwd)
            from_right = lax.ppermute(left_edge, AXIS_X, bwd)
        fp = fp.at[:, rows, px - 1 : px].set(from_left)
        fp = fp.at[:, rows, px + wl : px + wl + 1].set(from_right)
        cols = slice(px - 1, px + wl + 1)  # include x halos -> corners
    else:
        # px == 0: single shard column (dx == 1); x wrap is handled by the
        # kernel's lane rolls + ring-rewriting BCs, exactly like single-chip.
        # Exchange full-width rows (pad columns included -- harmless).
        cols = slice(None)

    bot_edge = fp[:, PY : PY + 1, cols]
    top_edge = fp[:, PY + hl - 1 : PY + hl, cols]
    if nys == 1:
        from_below, from_above = top_edge, bot_edge
    else:
        fwd = [(i, (i + 1) % nys) for i in range(nys)]
        bwd = [(i, (i - 1) % nys) for i in range(nys)]
        from_below = lax.ppermute(top_edge, AXIS_Y, fwd)
        from_above = lax.ppermute(bot_edge, AXIS_Y, bwd)
    fp = fp.at[:, PY - 1 : PY, cols].set(from_below)
    fp = fp.at[:, PY + hl : PY + hl + 1, cols].set(from_above)
    return fp


def _pick_shard_tiles(hl: int, wp: int, px: int, extra: int = 0):
    """Band height for the per-shard fused kernel (BW = wp; px = 0 for a
    row-only decomposition, 128 when x is sharded too).

    The sharded kernel's shard-ownership masks are traced (global origin
    from SMEM), which Mosaic cannot constant-fold -- measured ~60 live f32
    planes per band row at 1024 lanes vs ~41 for the single-chip kernel --
    so bands are shorter than single-chip (48 vs 80 at wp = 1024)."""
    from ..ops.device_specs import budgets

    # v5e calibration: 14MB of the 16MB scoped default; scaled per device
    budget = budgets().split_budget_floats + 1024 * 1024 // 4
    bh = 256
    while bh > 16 and ((60 + extra) * bh + 9 * 2 * 8 + 2 * 9 * 8) * (wp + 2 * px) > budget:
        bh -= 16
    while bh > 16 and (hl % bh == 1 or hl % (bh // 2) == 1):
        bh -= 16
    return max(16, bh), max(8, bh // 2), wp, px


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_steps", "mesh", "ny", "nx", "interpret", "tiles", "store_dev"
    ),
)
def run_chunk_sharded_pallas(
    state: LBMState, p: CaseParams, n_steps: int, mesh, ny: int, nx: int,
    interpret: bool = False, tiles=None, store_dev=None,
):
    """run_chunk_sharded with the fused Pallas stencil as the per-shard step.

    Each shard holds its block in the kernel's padded layout and alternates
    halo refresh (ppermute over ICI) with one fused-kernel lattice update;
    boundary conditions run inside the kernel, gated by the shard's global
    origin (ops/pallas_step._apply_bc_band offs). Bitwise-matches
    run_chunk_sharded / run_chunk (tests/test_parallel.py).

    Real-TPU alignment requires the local width to be a lane multiple
    (wl % 128 == 0); interpret-mode tests may use smaller shards.

    ``store_dev`` (16-bit deviation storage, ops/pallas_step): each shard's
    fast-step f buffer lives as bfloat16 deviations -- the per-step ppermute
    halo rows ride ICI at half the bytes too. Lossy, opt-in; requires the
    split-BC path and a plain obstacle scheme. None = module default.
    """
    from ..ops.pallas_step import (
        PY,
        _edge_bc_step,
        _pallas_step,
        _pick_split_tiles,
        _round_up,
        _scalars,
        pack_aux,
        supports,
    )

    if not supports(p):
        raise ValueError(f"bc_type {p.bc_type} unsupported by the fused kernel")
    rys, rxs = mesh.shape[AXIS_Y], mesh.shape[AXIS_X]
    if ny % rys or nx % rxs:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {rys}x{rxs}")
    hl, wl = ny // rys, nx // rxs
    # Bouzidi: the q planes ride the band BlockSpecs exactly like the
    # single-chip split path (q is read at the cell only -- no q halo); the
    # f_opp(c + e_k) neighbor read is served by the same 1-cell halo the
    # pull stream uses, so shard-seam-crossing curved walls are exact.
    q_extra = 16 if p.bouzidi_obstacle else 0
    # row-only decomposition (dx == 1) uses the single-chip PX = 0 geometry:
    # no column halos, so the per-step exchange is just two row updates
    wp = _round_up(wl, 128) if rxs == 1 else wl
    bh_fast, bh_full, BW, PXs = tiles or _pick_shard_tiles(
        hl, wp, 0 if rxs == 1 else 128, extra=q_extra
    )
    if not interpret and rxs > 1 and wl % 128:
        raise ValueError(f"local width {wl} must be a multiple of 128 lanes")
    # split-BC fast steps: the band kernel drops the in-kernel BCs AND the
    # traced shard-ownership masks (their scoped VMEM forced 48-row bands) --
    # ownership moves to the tiny edge kernel. Rows-only meshes (rxs == 1)
    # keep the lane-roll x-streaming; 2D meshes read a real 128-lane x-halo
    # (the shard's x neighbors are other devices) refreshed by ppermute.
    split = (
        tiles is None and wl % 128 == 0
        and hl % 8 == 0 and hl >= 16
    )
    from ..ops import pallas_step as _ps

    if store_dev is None:
        store_dev = _ps._STORE_DEV
    store_dev = bool(
        store_dev and split and n_steps > 1
        and not (p.halfway_obstacle or p.bouzidi_obstacle)
    )
    if split:
        bh_fast, BW, PXs = _pick_split_tiles(
            hl, wl, 0 if rxs == 1 else 128, extra=q_extra
        )
        hp_s = _round_up(hl, bh_fast)
        # the chunk-closing full step keeps the traced-mask in-kernel BCs
        # plus rho/u/f_post output blocks: ~92 live planes per band row
        from ..ops.device_specs import budgets

        full_budget = budgets().split_budget_floats + 1024 * 1024 // 4
        bh_full = next(
            b for b in (48, 32, 16, 8)
            if hp_s % b == 0
            and ((92 + q_extra) * b + 160)
            * (_round_up(wl, 128) + 2 * PXs) <= full_budget
        )
    Hp = _round_up(hl, bh_fast)
    Wp = _round_up(wl, BW)
    dims_fast = (ny, nx, hl, wl, Hp, Wp, bh_fast, BW, PXs)
    dims_full = (ny, nx, hl, wl, Hp, Wp, bh_full, BW, PXs)
    edims = (hl, wl, Hp, Wp, PXs, ny, nx)
    dtype = state.f.dtype

    nbb_g = (
        neighbor_solid_bits(p.mask)
        if (p.halfway_obstacle or p.bouzidi_obstacle)
        else None
    )

    def local_chunk(state_l: LBMState, p_l: CaseParams, *nbb_rest) -> LBMState:
        nbb_l = nbb_rest[0] if nbb_rest else None
        iy = lax.axis_index(AXIS_Y)
        ix = lax.axis_index(AXIS_X)
        offs = jnp.stack([iy * hl, ix * wl]).astype(jnp.int32).reshape(1, 2)

        w_col = jnp.asarray(W, jnp.float32).reshape(9, 1, 1)
        fp = jnp.pad(
            state_l.f, ((0, 0), (PY, PY + Hp - hl), (PXs, PXs + Wp - wl))
        )
        if store_dev:
            # quantize once per chunk (16-bit deviations f - w); the halo
            # rows extracted below stay 16-bit too -- half the ICI bytes
            fp = (fp - w_col).astype(_ps._DEV_DTYPE)
        aux_b = jnp.pad(
            pack_aux(p_l.damping, p_l.mask), ((0, Hp - hl), (0, Wp - wl))
        )
        nbb_b = (
            None if nbb_l is None
            else jnp.pad(nbb_l, ((0, Hp - hl), (0, Wp - wl)))
        )
        # p_l.bouzidi_q is this shard's [8, hl, wl] block (params_specs
        # shards it (None, dy, dx)); pad like aux -- no PY row offset
        qp_b = (
            None if not p.bouzidi_obstacle
            else jnp.pad(p_l.bouzidi_q, ((0, 0), (0, Hp - hl), (0, Wp - wl)))
        )

        def halo_rows(fp):
            """1-row neighbor halos as [9, 8, Wp] kernel inputs (row 0).
            Avoids DUS into the big padded buffer, which forces a
            full-buffer copy every step (~80us at 1024^2)."""
            top = fp[:, PY + hl - 1 : PY + hl, :]
            bot = fp[:, PY : PY + 1, :]
            if rys == 1:
                from_below, from_above = top, bot
            else:
                fwd = [(k, (k + 1) % rys) for k in range(rys)]
                bwd = [(k, (k - 1) % rys) for k in range(rys)]
                from_below = lax.ppermute(top, AXIS_Y, fwd)
                from_above = lax.ppermute(bot, AXIS_Y, bwd)
            pad8 = ((0, 0), (0, 7), (0, 0))
            return jnp.pad(from_below, pad8), jnp.pad(from_above, pad8)

        def advance(fp, h_lo, h_hi, step, dims, full, ec=None, er=None):
            scal = _scalars(p_l, step, dtype)
            if split and not full:
                # band kernel without BCs (needs no shard origin) + edge
                # kernel gated by the shard origin; ec/er are donated HBM
                # carry buffers (see ops/pallas_step aliases note)
                fp_new, ec, er = _pallas_step(
                    fp, aux_b, scal, None, h_lo, h_hi, dims,
                    p_l.use_les, p_l.bc_type, False, interpret, False,
                    ec_buf=ec, er_buf=er, bounce=p_l.bounce_obstacle,
                    nbb_p=nbb_b, q_p=qp_b, store_dev=store_dev,
                )
                fp_new = _edge_bc_step(
                    fp_new, aux_b, ec, er, scal, edims, p_l.bc_type,
                    interpret, offs=offs, bounce=p_l.bounce_obstacle,
                    store_dev=store_dev,
                )
                return fp_new, ec, er
            return _pallas_step(
                fp, aux_b, scal, offs, h_lo, h_hi, dims,
                p_l.use_les, p_l.bc_type, full, interpret,
                bounce=p_l.bounce_obstacle, nbb_p=nbb_b, q_p=qp_b,
            )

        if split:
            ec_w = 128 if (wl - 1) // BW == 0 else 256
            ec0 = jnp.zeros((3, Hp, ec_w), dtype)
            er0 = jnp.zeros((3, 16, Wp), dtype)

        if PXs == 0:
            # halos ride the scan carry, extracted from each step's OUTPUT:
            # this leaves fp with a single consumer (the kernel), so XLA's
            # while-carry copy overlaps the kernel instead of serializing
            # before it (measured: 4.1k -> 5.8k MLUPS at 1024^2)
            def fast_body(carry, _):
                fp, h_lo, h_hi, ec, er, step = carry
                step = step + 1
                fp_new, ec, er = advance(
                    fp, h_lo, h_hi, step, dims_fast, False, ec, er
                )
                h_lo2, h_hi2 = halo_rows(fp_new)
                return (fp_new, h_lo2, h_hi2, ec, er, step), None

            def fast_body_fused(carry, _):
                fp, h_lo, h_hi, step = carry
                step = step + 1
                (fp_new,) = advance(fp, h_lo, h_hi, step, dims_fast, False)
                h_lo2, h_hi2 = halo_rows(fp_new)
                return (fp_new, h_lo2, h_hi2, step), None

            if split:
                carry = (fp, *halo_rows(fp), ec0, er0, state_l.step)
                if n_steps > 1:
                    carry, _ = lax.scan(
                        fast_body, carry, None, length=n_steps - 1
                    )
                fp, h_lo, h_hi, _, _, step = carry
            else:
                carry = (fp, *halo_rows(fp), state_l.step)
                if n_steps > 1:
                    carry, _ = lax.scan(
                        fast_body_fused, carry, None, length=n_steps - 1
                    )
                fp, h_lo, h_hi, step = carry
            step = step + 1
            if store_dev:
                # dequantize for the chunk-closing full step (f32 in-kernel
                # BCs); the carried halo rows must match the f32 scratch
                fp = fp.astype(dtype) + w_col
                h_lo = h_lo.astype(dtype) + w_col
                h_hi = h_hi.astype(dtype) + w_col
            fp, rho_p, u_p, fpost_p = advance(
                fp, h_lo, h_hi, step, dims_full, True
            )
        else:

            def fast_body(carry, _):
                fp, ec, er, step = carry
                fp = _halo_update_padded(fp, hl, wl, PXs, mesh)
                step = step + 1
                if split:
                    fp_new, ec, er = advance(
                        fp, None, None, step, dims_fast, False, ec, er
                    )
                else:
                    (fp_new,) = advance(fp, None, None, step, dims_fast, False)
                return (fp_new, ec, er, step), None

            if split:
                carry = (fp, ec0, er0, state_l.step)
            else:
                carry = (fp, jnp.zeros((1,), dtype), jnp.zeros((1,), dtype),
                         state_l.step)
            if n_steps > 1:
                carry, _ = lax.scan(fast_body, carry, None, length=n_steps - 1)
            fp, _, _, step = carry
            fp = _halo_update_padded(fp, hl, wl, PXs, mesh)
            step = step + 1
            if store_dev:
                fp = fp.astype(dtype) + w_col
            fp, rho_p, u_p, fpost_p = advance(fp, None, None, step, dims_full, True)

        f = fp[:, PY : PY + hl, PXs : PXs + wl]
        rho = rho_p[:hl, :wl]
        u = u_p[:, :hl, :wl]
        # f_post keeps the initial-equilibrium GLOBAL ring (the reference
        # never writes f_new there); interior from the final collision
        gy = iy * hl + jnp.arange(hl)
        gx = ix * wl + jnp.arange(wl)
        interior = ((gy >= 1) & (gy <= ny - 2))[:, None] & (
            (gx >= 1) & (gx <= nx - 2)
        )[None, :]
        f_post = jnp.where(interior[None], fpost_p[:, :hl, :wl], state_l.f_post)
        return LBMState(f=f, f_post=f_post, rho=rho, u=u, step=step)

    s_specs, p_specs = state_specs(), params_specs(p)
    extra = () if nbb_g is None else (nbb_g,)
    extra_specs = () if nbb_g is None else (P(AXIS_Y, AXIS_X),)
    state = shard_map(
        local_chunk, mesh=mesh, in_specs=(s_specs, p_specs) + extra_specs,
        out_specs=s_specs,
        check_vma=False,  # pallas_call out_shapes carry no vma annotation
    )(state, p, *extra)
    monitors = {
        "force": obstacle_force(state.f_post, p),
        "max_v": max_velocity(state.u),
    }
    return state, monitors


@functools.partial(jax.jit, static_argnames=("n_steps", "mesh", "ny", "nx"))
def run_chunk_sharded(state: LBMState, p: CaseParams, n_steps: int, mesh, ny: int, nx: int):
    """Advance n_steps on the mesh; monitors computed globally under GSPMD."""
    local_step = make_local_step(mesh, ny, nx)
    nbb_g = (
        neighbor_solid_bits(p.mask)
        if (p.halfway_obstacle or p.bouzidi_obstacle)
        else None
    )

    def chunk(state_l, p_l, *nbb_rest):
        nbb_l = nbb_rest[0] if nbb_rest else None

        def body(s, _):
            return local_step(s, p_l, nbb_l), None

        s, _ = lax.scan(body, state_l, None, length=n_steps)
        return s

    s_specs, p_specs = state_specs(), params_specs(p)
    extra = () if nbb_g is None else (nbb_g,)
    extra_specs = () if nbb_g is None else (P(AXIS_Y, AXIS_X),)
    state = shard_map(
        chunk, mesh=mesh, in_specs=(s_specs, p_specs) + extra_specs,
        out_specs=s_specs,
    )(state, p, *extra)
    monitors = {
        "force": obstacle_force(state.f_post, p),
        "max_v": max_velocity(state.u),
    }
    return state, monitors
