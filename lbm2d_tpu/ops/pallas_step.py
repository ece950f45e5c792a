"""Fused Pallas TPU stencil: one kernel per D2Q9 MRT-LES lattice update.

Each grid program owns a full-width row band held in VMEM and performs the
complete update the reference spreads over three Taichi kernels per step
(LBM2D_MRT_LES.py:243-550): pull streaming, the exact integer moment
transform, macro variables, equilibrium moments, Smagorinsky tau_eff, sponge
damping, diagonal-S relaxation, inverse transform, Zou-He/free-slip boundary
conditions, and the obstacle equilibrium overwrite. A fast step's HBM traffic
is one read of f (with a small row-halo re-read) and one write of f -- about
80 B/cell vs the ~15 materialized full arrays per step of the jnp/XLA path.

Design notes (all forced by Mosaic's (8, 128) f32 tiling rules):
  * f lives in a row-padded buffer ``[9, Hp + 2*PY, Wp]`` with global cell
    (y, x) at (y + PY, x); Hp/Wp round H (resp. W) up to the row-band / lane
    granularity. Row halos are re-read via an aligned window
    ``[i*BH, i*BH + BH + 2*PY)``; x-direction streaming uses lane rolls
    inside the band (wrap-around lands on the don't-care global ring), so no
    column padding or halo is needed.
  * DMA offsets must be tile-aligned, so the band store lands at row
    ``PY + i*BH`` (PY = 8) and the load window at ``i*BH``.
  * Columns [W, Wp) and rows [H, Hp) are garbage lanes: they start at zero,
    only ever mix into the global ring (which the in-kernel BCs rewrite), and
    are sliced away at chunk exit.
  * The fast variant (scan body) outputs ONLY the padded f; rho/u/f_post are
    produced by the full variant that closes each chunk, because nothing
    inside a chunk consumes them (BCs use band-local values).

Correctness contract: bitwise equality with the jnp path run_chunk
(tests/test_pallas.py in interpret mode; also verified on hardware).
Requires all four BC sides active (the standard [0,2,1,2] layout and every
config the batch generator emits); the engine falls back to the jnp path
otherwise.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.lattice import E, OPP, W, PI_REF
from .device_specs import budgets
from ..core.solver import (
    BC_FREE_SLIP,
    BC_INLET,
    BC_OUTLET,
    BC_VEL_INLET,
    BC_VEL_INLET_NEBB,
    CaseParams,
    LBMState,
    bc_horizontal_values,
    bc_left_values,
    bc_right_values,
    max_velocity,
    mrt_collide_arrays,
    neighbor_solid_bits,
    obstacle_force,
)

PY = 8  # row padding = f32 sublane tile; also the halo alignment unit
LANE = 128

# XLA's default scoped-VMEM allowance is 16MB -- a soft reservation, far
# below the physical VMEM of a v5e core. Raising the per-kernel limit lets
# wide grids (4096 lanes) run taller bands (64-row bands at 4096 lanes
# measured 3161 vs 2839 MLUPS for the 16-row bands that fit 16MB), but a
# limit past ~48MB strangles XLA's own VMEM workspace around the kernel
# (1024^2 collapses 10.1k -> 5.1k at 64MB), so the limit is computed
# per-geometry: the minimum that fits the band scratch plus the ec/er
# export strips (which XLA allocates on the scoped stack, layout S(1),
# despite their HBM spec). All absolute budgets come from
# device_specs.budgets() -- v5e-calibrated fractions of physical VMEM,
# scaled per device generation.
_MB = 1024 * 1024

# fast-step bands pipeline across grid programs once the padded f buffer
# exceeds budgets().pipeline_min_bytes: smaller problems run "VMEM-resident"
# (XLA keeps the buffers on-chip; 1024^2 = 37MB measures ~88us/Mcell vs
# ~360 beyond) and gain nothing from manual overlap. Tests shrink this
# module override (None = use the device budget) to exercise the path in
# interpret mode.
_PIPELINE_MIN_BYTES = None

# temporal-blocking overrides (None = auto): _FUSE_STEPS forces the fused
# sub-step count (1 disables fusion; auto fuses beyond-VMEM grids only),
# _FUSE_BH forces the fused band height (tests use tiny bands)
_FUSE_STEPS = None
_FUSE_BH = None

# 16-bit deviation-storage default (None/False = off; True = on where
# eligible): the split-BC fast steps keep the HBM f buffer as 16-bit
# deviations (f_k - w_k) -- half the f traffic for the bandwidth-bound
# beyond-VMEM tier -- while every arithmetic op stays f32. Lossy
# (quantization noise per step, see _step_kernel), so it is OPT-IN: callers
# pass run_chunk_pallas(store_dev=True) or tests/benches set this override;
# production datagen keeps exact-f32 state unless explicitly enabled.
_STORE_DEV = None

# bfloat16, not float16: Mosaic rejects IEEE f16 outright ("Unsupported type
# in mosaic dialect: 'f16'" on this libtpu) -- bf16 is the TPU-native 16-bit
# float. Its 8-bit mantissa costs ~3 decimal digits relative; storing the
# DEVIATION keeps the absolute noise ~|dev|/512 ~ 1e-4 per step instead of
# the ~1e-3 raw-f would give. Tests pin the accumulated error budget.
_DEV_DTYPE = jnp.bfloat16


def _pipeline_min_bytes():
    if _PIPELINE_MIN_BYTES is not None:
        return _PIPELINE_MIN_BYTES
    return budgets().pipeline_min_bytes


def _vmem_limit(Hp, Wp, BW, PX, export, ec_w, pipelined=False, BH=0, isz=4):
    """``isz``: f storage itemsize (2 under 16-bit deviation storage -- the
    two-slot band scratch halves; the f32 compute temps do not)."""
    b = budgets()
    limit = b.base_limit_bytes
    if export:
        limit += 4 * (3 * Hp * ec_w + 48 * Wp)  # scoped ec + er outputs
    if BW + 2 * PX >= 4096:
        limit = max(limit, b.wide_limit_bytes)  # taller bands at 4096 lanes
    if pipelined:
        # two-slot band scratch + ~16 temp planes + export strips + slack,
        # sized as if the scratch were f32 EVEN under 16-bit deviation
        # storage: shrinking the limit to the true bf16 need (85MB at
        # 4096^2/BH=128) measured 7.4k MLUPS where the generous f32-sized
        # limit (123MB) measured 10.1k -- the allowance evidently also buys
        # Mosaic/XLA scheduling headroom, not just the declared scratch.
        # ``isz`` still guards feasibility: if even the generous figure
        # exceeds physical VMEM, scale it by the true scratch ratio.
        need = (
            4 * (18 * (BH + 2 * PY) + 18 * BH + 16 * BH) * (BW + 2 * PX)
            + 4 * (3 * Hp * ec_w + 48 * Wp)
            + 8 * _MB
        )
        if need > b.physical_vmem_bytes and isz < 4:
            need = (
                (2 * isz * 9 * (BH + 2 * PY) + 2 * isz * 9 * BH + 64 * BH)
                * (BW + 2 * PX)
                + 4 * (3 * Hp * ec_w + 48 * Wp)
                + 8 * _MB
            )
        limit = max(limit, need)
    return limit

# scalar packing order for the SMEM input
_S_TAU0, _S_CSF, _S_SG, _S_RAMP, _S_RHOIN, _S_RHOOUT = range(6)
_S_BCV = 6  # bc_value flattened [4*2] starts here; 14 scalars total


def pack_aux(damping, mask):
    """Pack the sponge-damping plane and the solid mask into ONE f32 plane.

    Sponge damping is always >= 0, so the solid flag rides the sign bit:
    solid cells store copysign(damp, -1) (note -0.0 for damp == 0), fluid
    cells store damp. The kernel recovers both exactly -- solid =
    signbit(aux), damp = |aux| -- halving the per-step HBM traffic of the
    two auxiliary planes (measured ~4.3 MB/step at 1024^2).
    """
    return jnp.where(mask > 0.5, jnp.copysign(damping, -1.0), damping)


def _unpack_aux(aux):
    """(solid_bool, damp) from a packed aux tile, bit-exactly."""
    solid = jax.lax.bitcast_convert_type(aux, jnp.int32) < 0
    return solid, jnp.abs(aux)


def supports(p: CaseParams) -> bool:
    """True if the fused kernel implements this BC layout (all sides active:
    the in-kernel BCs rewrite the whole global ring each step).  The DFG
    modes are covered too: bounce-back obstacles (full-way, half-way, and
    Bouzidi interpolated via per-link q planes) and the left-edge profiled
    velocity inlet (type 3, parabolic profile recomputed in-kernel with the
    same f32 op order make_params uses, so the paths stay bitwise-equal)."""
    lt, tt, rt, bt = p.bc_type
    left_ok = lt in (BC_INLET, BC_FREE_SLIP) or (
        lt in (BC_VEL_INLET, BC_VEL_INLET_NEBB)
        and p.inlet_profile is not None
    )
    if p.bouzidi_obstacle and p.bouzidi_q is None:
        return False  # Bouzidi needs the precomputed q planes
    return (
        left_ok
        and rt in (BC_INLET, BC_OUTLET, BC_FREE_SLIP)
        and tt in (BC_INLET, BC_FREE_SLIP)
        and bt in (BC_INLET, BC_FREE_SLIP)
    )


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pick_tiles(h: int, w: int, extra: int = 0):
    """(BH_fast, BH_full, BW, PX): tile geometry under the 16MB VMEM budget.

    Narrow grids use one full-width column tile (BW = Wp, PX = 0; x-halo via
    lane rolls whose wrap-around only touches the global ring). Wide grids
    would be forced into very short bands -- the 2*PY row-halo re-read then
    dominates -- so they split into BW=1024 column tiles with a real PX=128
    x-halo (the lane-dim analogue of the row alignment rule).

    Per tile row the fast step holds ~32 f32 planes (halo input, output,
    2x2 blocked damp/mask, ~12 Mosaic stack temporaries -- measured on v5e);
    the full step adds ~12 (rho/u/f_post blocks) and uses half the band so
    one padded buffer (Hp = ceil(H/BH)*BH) serves both grids. Bands must keep
    rows H-1 and H-2 together (top-BC locality); column tiles must keep
    cols W-1 and W-2 together (right-BC locality).
    """
    budget = budgets().tile_budget_floats  # ~4MB headroom under the scoped limit
    wp128 = _round_up(w, LANE)
    # Full-width row bands measured FASTER than column tiles even at 4096^2
    # (2425 vs 2121 MLUPS): per-program overhead beats the halo re-read cost
    # on this hardware. Column tiles (bw < wp, px = 128) remain available via
    # the run_chunk_pallas(tiles=...) override and are parity-tested.
    bw, px = wp128, 0
    bh = 256
    # floats per tile: 9*(bh+2PY)*(bw+2PX) halo input + ~23*bh*bw rest;
    # ``extra`` adds per-row planes (e.g. the 8 Bouzidi q inputs + temps)
    while bh > 16 and (
        9 * (bh + 2 * PY) * (bw + 2 * px) + (23 + extra) * bh * bw > budget
    ):
        bh -= 16
    while bh > 16 and (h % bh == 1 or h % (bh // 2) == 1):
        bh -= 16
    return max(16, bh), max(8, bh // 2), bw, px


def _pick_split_tiles(h: int, w: int, px: int = 0, extra: int = 0,
                      dev: bool = False):
    """(BH, BW, PX) for split-BC fast steps: without the in-kernel BC
    branches the kernel holds ~19 live f32 planes per band row (measured on
    v5e; BH=128 fastest at 1024^2, BH=256 OOMs at ~19M), so bands can be
    much taller than _pick_tiles' 80.

    ``px = 128`` is the 2D-mesh (x-sharded) geometry: the shard's x
    neighbors are other devices, so streaming must read a REAL column halo
    (halo-slice, ~32 live planes/row) instead of lane rolls.

    Wide grids stay on short full-width bands: the column-tiled alternative
    (BW=1024, PX=128, BH=64) measured a TIE at 4096^2 (2835 vs 2845 MLUPS)
    because halo-SLICE streaming relayouts the shifted column reads (~33
    live planes/row vs 19 for lane rolls) and the program count is the
    same; both are per-program-overhead-bound at that size (~330 GB/s
    effective vs the 945 GB/s ceiling). Column tiles remain available via
    the tiles override and are parity-tested."""
    b = budgets()
    budget = b.split_budget_floats  # floats (13MB of the 16MB core on v5e)
    wp128 = _round_up(w, 128)
    bw = wp128
    # lane-roll streaming (px == 0) holds ~18 planes/row (19 before the
    # packed aux plane); halo-slice streaming (px > 0) relayouts the shifted
    # column reads, ~32 (measured)
    planes = (18 if px == 0 else 32) + extra
    if bw >= 4096 and px == 0:
        # wide grids: the scoped-VMEM limit is raised per-geometry
        # (_vmem_limit) so 64-row bands fit on a 128MB-VMEM core; 128-row
        # bands need a ~72MB limit, deep in the range that strangles XLA's
        # workspace, for +1%
        rows = b.wide_band_rows
        if dev and bw == 4096 and h >= 4096 and h % 128 == 0:
            # measured on v5e (16-bit deviation storage): the 4096^2 grid
            # at 64-row bands runs ~45% below the per-cell rate of every
            # neighbouring shape (2048x4096, 4096x2048, 4736x2560 all hit
            # ~90-100 us/Mcell; 4096^2 sat at 133); 128-row bands -- which
            # only the halved 16-bit scratch makes affordable at 4096 lanes
            # -- restore it (7556 -> 10134 MLUPS). Every neighbouring shape
            # LOSES a few % at BH=128 (and 4736 lanes OOMs), so the bump is
            # gated to exactly this pathological geometry.
            rows = 128
        return min(rows, _round_up(h, 16)), bw, px
    # cap 128: with the single packed-aux blocked input (saves 2 pipeline
    # buffers, ~1MB at BH=128) 128-row bands fit scoped VMEM even in
    # programs that inline several chunk calls (the fused batch runner);
    # when H is a multiple of 128 this also removes the garbage pad rows
    # that BH=96 forces (Hp 1056 -> 1024)
    bh = min(128, _round_up(h, 16))
    while bh > 16 and (planes * bh + 4 * PY * 9) * (bw + 2 * px) > budget:
        bh -= 16
    return max(16, bh), bw, px


def _stream_band(scratch_in, BH: int, BW: int, PX: int, dequant: bool = False):
    """Pull streaming for one tile: y via halo-row slices; x via halo-column
    slices when a real x-halo exists (PX > 0), else via lane rolls whose
    wrap-around only corrupts the global ring columns 0 / W-1.

    scratch_in: [9, BH + 2*PY, BW + 2*PX], tile cells at (PY, PX).

    ``dequant`` (16-bit deviation storage): scratch holds (f_k - w_k) as
    _DEV_DTYPE; convert each plane to f32 and add the weight back BEFORE the
    lane roll -- Mosaic's dynamic_rotate only exists for 32-bit data, and a
    scalar add commutes with the rotation anyway.
    """
    fs = []
    for k in range(9):
        ey, ex = int(E[k, 1]), int(E[k, 0])
        if PX:
            plane = scratch_in[
                k, PY - ey : PY - ey + BH, PX - ex : PX - ex + BW
            ]
            if dequant:
                plane = plane.astype(jnp.float32) + float(W[k])
        else:
            plane = scratch_in[k, PY - ey : PY - ey + BH, :]
            if dequant:
                plane = plane.astype(jnp.float32) + float(W[k])
            if ex:
                # pltpu.roll needs non-negative shifts; -1 == BW - 1 (circular)
                plane = pltpu.roll(plane, shift=ex % BW, axis=1)
        fs.append(plane)
    return jnp.stack(fs)


def _apply_bc_band(
    f_new, rho, ux, uy, scal_ref, i, j, *, Hg, Wg, HL, WL, BH, BW, bc_type,
    offs=None, stride=None, srow=0, owner_rows=None,
):
    """In-tile boundary conditions in apply_bc's sequential order
    (left/right columns, then top/bottom rows including corners).

    The left/right edges live in the first/last column tiles and the
    top/bottom rows in the first/last row bands; every BC is gated to its
    owning tiles with lax.cond so interior tiles skip the math.

    Single-chip: HL == Hg, WL == Wg, offs None. Sharded (shard_map): the
    kernel sees one device's (HL, WL) block of the (Hg, Wg) global lattice
    and ``offs = (y_off, x_off)`` carries the block's global origin. Shard
    ownership of a global edge is expressed ONLY inside the jnp.where masks
    (global-coordinate comparisons); the lax.cond predicates stay pure
    program-id tests, which Mosaic resolves per grid position -- a traced
    (SMEM-dependent) predicate makes it evaluate both branches everywhere,
    measured +72us/step at 1024^2. Non-owner shards thus pay the BC math on
    their edge bands but the masks select nothing.
    """
    ramp = scal_ref[srow, _S_RAMP]
    rho_in = scal_ref[srow, _S_RHOIN]
    rho_out = scal_ref[srow, _S_RHOOUT]
    y_off, x_off = offs if offs is not None else (0, 0)
    # ``stride`` decouples the band stride from the block height: the fused
    # multi-step kernel applies BCs on the FULL (BH + 2*PY)-row window while
    # bands advance by BH rows (stride < window height), so global-row math
    # uses the stride and iota shapes use the window height.
    st = BH if stride is None else stride

    # Mosaic cannot lower functional .at[].set (scatter) nor strip<->plane
    # reshapes, so each edge's BC is computed tile-wide -- the neighbor field
    # is the whole plane rolled by one lane/sublane -- and merged with a
    # (row, col)-masked jnp.where built from 2-D iotas. Wrap-around from the
    # rolls only reaches masked-off cells.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    rows_g = y_off + i * st + row_ids
    inner = (rows_g >= 1) & (rows_g <= Hg - 2)  # [BH, BW]
    # Edge-column / edge-row masks. Single-chip: constant iota comparisons
    # (Mosaic folds them to constant vectors). Sharded: compare the constant
    # iota against a traced SCALAR local index (global edge minus this
    # tile's global origin) -- one cheap vector cmp, no global-coordinate
    # planes (those cost ~5MB extra scoped VMEM). On non-owner shards the
    # scalar falls outside [0, BH)/[0, BW) and the mask is all-false; a
    # traced scalar can land on a garbage row/col of a non-owner shard only
    # when the local block is smaller than the band, which writes BC values
    # into never-read garbage rows (harmless).
    # (lazy thunks: each mask materializes INSIDE its owning cond branch so
    # the planes' live ranges don't stack up in scoped VMEM)
    if offs is None:
        m_left = lambda: col_ids == 0
        m_right = lambda: col_ids == divmod(WL - 1, BW)[1]
        m_top = lambda: row_ids == (HL - 1) % BH
        m_bot = lambda: row_ids == 0
    else:
        m_left = lambda: col_ids == -(x_off + j * BW)
        m_right = lambda: col_ids == Wg - 1 - x_off - j * BW
        m_top = lambda: row_ids == Hg - 1 - y_off - i * st
        m_bot = lambda: row_ids == -(y_off + i * st)

    def roll_x(shift):
        # value at (y, x + shift_src): pltpu.roll needs non-negative shifts
        def r(a):
            return pltpu.roll(a, shift % BW, axis=a.ndim - 1)

        return r

    def roll_y(shift):
        def r(a):
            return pltpu.roll(a, shift % BH, axis=a.ndim - 2)

        return r

    # jnp.where merges, NOT arithmetic blends: unselected lanes may hold NaN
    # from uninitialized pad halos, and 0 * NaN = NaN.
    # left edge (global x = 0): lives in column tile j == 0, local col 0
    if bc_type[0] in (BC_INLET, BC_FREE_SLIP, BC_VEL_INLET, BC_VEL_INLET_NEBB):

        def _left(f_new=f_new, rho=rho, ux=ux, uy=uy):
            nb = roll_x(-1)
            prof = None
            if bc_type[0] in (BC_VEL_INLET, BC_VEL_INLET_NEBB):
                # parabolic profile from global rows; SAME f32 op order as
                # make_params/parabolic_profile -> bitwise equality
                dtype = f_new.dtype
                umax = scal_ref[srow, _S_BCV + 0]
                hm = jnp.asarray(float(Hg - 1), dtype)
                yy = rows_g.astype(dtype)
                prof = (4.0 * umax) * yy * (hm - yy) / (hm * hm)
            fb, rho_b, ux_b, uy_b = bc_left_values(
                nb(f_new), nb(rho), nb(ux), nb(uy), ramp, bc_type[0], rho_in,
                u_prof=prof,
            )
            m = m_left() & inner
            return (
                jnp.where(m[None], fb, f_new),
                jnp.where(m, rho_b, rho),
                jnp.where(m, ux_b, ux),
                jnp.where(m, uy_b, uy),
            )

        def _no(f_new=f_new, rho=rho, ux=ux, uy=uy):
            return f_new, rho, ux, uy

        f_new, rho, ux, uy = jax.lax.cond(j == 0, _left, _no)

    # right edge (global x = W-1): column tile j_r, local col c_r (its inward
    # neighbor c_r - 1 is in the same tile by _pick_tiles)
    j_r, c_r = divmod(WL - 1, BW)
    if bc_type[2] in (BC_OUTLET, BC_INLET, BC_FREE_SLIP):
        bcv2 = jnp.stack([scal_ref[srow, _S_BCV + 4], scal_ref[srow, _S_BCV + 5]])

        def _right(f_new=f_new, rho=rho, ux=ux, uy=uy):
            nb = roll_x(1)
            fb, rho_b, ux_b, uy_b = bc_right_values(
                nb(f_new), nb(rho), nb(ux), nb(uy), ramp, bc_type[2], rho_out, bcv2
            )
            m = m_right() & inner
            return (
                jnp.where(m[None], fb, f_new),
                jnp.where(m, rho_b, rho),
                jnp.where(m, ux_b, ux),
                jnp.where(m, uy_b, uy),
            )

        def _no2(f_new=f_new, rho=rho, ux=ux, uy=uy):
            return f_new, rho, ux, uy

        f_new, rho, ux, uy = jax.lax.cond(j == j_r, _right, _no2)

    # top row (global y = H-1) and bottom row (y = 0): band-local static rows
    # gated on the owning band's program id via lax.cond, so interior bands
    # skip the (full-width f_eq-heavy) BC math entirely. _pick_bands
    # guarantees the neighbor row lives in the same band.
    # windowed mode (owner_rows set): a global edge row can fall inside the
    # overlap region of TWO consecutive bands' windows; every band whose
    # window holds a validly-computed copy must apply the BC so later
    # sub-steps stream consistent values from either copy.
    i_top, r_top = divmod(HL - 1, BH)
    owners = owner_rows or {1: (i_top,), 3: (0,)}
    for side, bands, m_row, shift in (
        (1, owners[1], m_top, 1),
        (3, owners[3], m_bot, -1),
    ):  # m_row is a thunk; see above
        bcv_off = _S_BCV + 2 if side == 1 else _S_BCV + 6
        if bc_type[side] not in (BC_INLET, BC_FREE_SLIP):
            continue
        bcv = jnp.stack([scal_ref[srow, bcv_off], scal_ref[srow, bcv_off + 1]])

        def _with_bc(f_new=f_new, rho=rho, ux=ux, uy=uy, side=side, m_row=m_row, shift=shift, bcv=bcv):
            nb = roll_y(shift)
            fb, rho_b, ux_b, uy_b = bc_horizontal_values(
                nb(f_new), nb(rho), nb(ux), nb(uy), ramp, bc_type[side], bcv
            )
            m = m_row()
            return (
                jnp.where(m[None], fb, f_new),
                jnp.where(m, rho_b, rho),
                jnp.where(m, ux_b, ux),
                jnp.where(m, uy_b, uy),
            )

        def _without(f_new=f_new, rho=rho, ux=ux, uy=uy):
            return f_new, rho, ux, uy

        pred = (i == bands[0])
        for b in bands[1:]:
            pred = pred | (i == b)
        f_new, rho, ux, uy = jax.lax.cond(pred, _with_bc, _without)

    return f_new, rho, ux, uy


def _fused_apply_bc(
    f_new, rho, ux, uy, scal_ref, i, s, lo, *, Hg, Wg, BW, BH, bc_type,
    owner_top,
):
    """In-window BCs for one fused sub-step, in apply_bc's sequential order.

    Left/right edge math runs on 128-lane strips (the full-plane variant
    costs ~2x the collide itself at 4096 lanes -- it dominated fused v1's
    runtime) merged back by static concatenation; top/bottom rows run
    plane-wide but only on the static owner bands. Requires Wg == BW
    (fused eligibility: W is already a lane multiple).
    """
    slab_h = f_new.shape[1]
    ramp = scal_ref[s, _S_RAMP]
    rho_in = scal_ref[s, _S_RHOIN]
    rho_out = scal_ref[s, _S_RHOOUT]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (slab_h, 128), 0)
    rows_g = i * BH - PY + lo + row_ids
    col_full = jax.lax.broadcasted_iota(jnp.int32, (slab_h, BW), 1)
    rows_g_full = i * BH - PY + lo + jax.lax.broadcasted_iota(
        jnp.int32, (slab_h, BW), 0
    )
    inner_full = (rows_g_full >= 1) & (rows_g_full <= Hg - 2)

    def roll_x(shift):
        def r(a):
            return pltpu.roll(a, shift % 128, axis=a.ndim - 1)

        return r

    def apply_edge(f_new, rho, ux, uy, vals, edge_col, strip_col):
        # only the edge column of the strip result matters: broadcast that
        # single lane across the plane under a (row, col) mask -- Mosaic
        # cannot concatenate slabs with mismatched sublane offsets
        fb, rho_b, ux_b, uy_b = vals
        m = (col_full == edge_col) & inner_full
        sl = slice(strip_col, strip_col + 1)
        return (
            jnp.where(m[None], fb[:, :, sl], f_new),
            jnp.where(m, rho_b[:, sl], rho),
            jnp.where(m, ux_b[:, sl], ux),
            jnp.where(m, uy_b[:, sl], uy),
        )

    if bc_type[0] in (BC_INLET, BC_FREE_SLIP, BC_VEL_INLET, BC_VEL_INLET_NEBB):
        fst = f_new[:, :, :128]
        rst, uxs, uys = rho[:, :128], ux[:, :128], uy[:, :128]
        nb = roll_x(-1)
        prof = None
        if bc_type[0] in (BC_VEL_INLET, BC_VEL_INLET_NEBB):
            # same f32 op order as make_params/parabolic_profile
            dtype = f_new.dtype
            umax = scal_ref[s, _S_BCV + 0]
            hm = jnp.asarray(float(Hg - 1), dtype)
            yy = rows_g.astype(dtype)
            prof = (4.0 * umax) * yy * (hm - yy) / (hm * hm)
        vals = bc_left_values(
            nb(fst), nb(rst), nb(uxs), nb(uys), ramp, bc_type[0], rho_in,
            u_prof=prof,
        )
        f_new, rho, ux, uy = apply_edge(f_new, rho, ux, uy, vals, 0, 0)

    if bc_type[2] in (BC_OUTLET, BC_INLET, BC_FREE_SLIP):
        bcv2 = jnp.stack([scal_ref[s, _S_BCV + 4], scal_ref[s, _S_BCV + 5]])
        fst = f_new[:, :, BW - 128 :]
        rst = rho[:, BW - 128 :]
        uxs = ux[:, BW - 128 :]
        uys = uy[:, BW - 128 :]
        nb = roll_x(1)
        vals = bc_right_values(
            nb(fst), nb(rst), nb(uxs), nb(uys), ramp, bc_type[2], rho_out,
            bcv2,
        )
        f_new, rho, ux, uy = apply_edge(
            f_new, rho, ux, uy, vals, BW - 1, 127
        )

    # top/bottom rows, full width including corners (reads the just-merged
    # edge columns, preserving apply_bc's corner order); owner bands only
    row_ids_w = jax.lax.broadcasted_iota(jnp.int32, (slab_h, BW), 0)
    for side, bands, g_row, shift in (
        (1, owner_top, Hg - 1, 1),
        (3, (0,), 0, -1),
    ):
        if bc_type[side] not in (BC_INLET, BC_FREE_SLIP):
            continue
        bcv_off = _S_BCV + 2 if side == 1 else _S_BCV + 6
        bcv = jnp.stack([scal_ref[s, bcv_off], scal_ref[s, bcv_off + 1]])

        def _with_bc(f_new=f_new, rho=rho, ux=ux, uy=uy, g_row=g_row,
                     shift=shift, bcv=bcv, side=side):
            def nb(a):
                return pltpu.roll(a, shift % slab_h, axis=a.ndim - 2)

            fb, rho_b, ux_b, uy_b = bc_horizontal_values(
                nb(f_new), nb(rho), nb(ux), nb(uy), ramp, bc_type[side], bcv
            )
            m = row_ids_w == g_row + PY - lo - i * BH
            return (
                jnp.where(m[None], fb, f_new),
                jnp.where(m, rho_b, rho),
                jnp.where(m, ux_b, ux),
                jnp.where(m, uy_b, uy),
            )

        def _without(f_new=f_new, rho=rho, ux=ux, uy=uy):
            return f_new, rho, ux, uy

        pred = i == bands[0]
        for b in bands[1:]:
            pred = pred | (i == b)
        f_new, rho, ux, uy = jax.lax.cond(pred, _with_bc, _without)
    return f_new, rho, ux, uy


def _fused_kernel(
    scal_ref,  # SMEM (S, 14) -- one scalar row per fused sub-step
    fp_hbm,  # HBM [9, Hp + 2*PY, Wp]
    aux_hbm,  # HBM [Hp + 2*PY, Wp] packed damp+mask, window-padded like fp
    nbb_hbm,  # HBM [Hp + 2*PY, Wp] int32 neighbor-solid bits, or None
    fp_new_hbm,  # HBM [9, Hp + 2*PY, Wp]
    buf_a,  # VMEM (9, WH, Wp) ping
    buf_b,  # VMEM (9, WH, Wp) pong
    s_aux,  # VMEM (WH, Wp)
    s_nbb,  # VMEM (WH, Wp) int32, or None
    sem_in,
    sem_aux,
    sem_out,
    *,
    Hg: int,
    Wg: int,
    BH: int,
    BW: int,
    S: int,
    use_les: bool,
    bc_type,
    bounce: bool,
    owner_top,
):
    """Temporal blocking: S fused lattice steps per HBM pass.

    Beyond-VMEM grids are DMA-throughput-bound (BASELINE round 2: 4096^2
    plateaus ~3.7k MLUPS for every band height 48..128 -- the per-step
    read+write of the full f field caps the step rate, not per-program
    overhead). Each program loads one (BH + 2*PY)-row window, advances it S
    steps ENTIRELY in VMEM, and stores the BH center rows -- f traffic drops
    by ~S.

    Correctness is the trapezoid argument: after sub-step s only window rows
    [s, WH - s) are valid (each step consumes one halo row per side), and
    the stored center [PY, PY + BH) stays valid for S <= PY. Boundary
    conditions apply IN-WINDOW after every sub-step (the standard
    in-kernel-BC data flow, so sub-steps are bitwise-equal to full-grid
    steps); a BC row falling in two overlapping windows is applied in both
    (``owner_top``), keeping every valid copy identical. Roll wrap-around
    and pad-row garbage land only on the ring (BC-rewritten) or the
    invalid fringe.
    """
    WH = BH + 2 * PY
    i = pl.program_id(0)
    y0 = i * BH
    w9 = [float(W[k]) for k in range(9)]

    copies = [
        pltpu.make_async_copy(
            fp_hbm.at[:, pl.ds(y0, WH), :], buf_a, sem_in
        ),
        pltpu.make_async_copy(
            aux_hbm.at[pl.ds(y0, WH), :], s_aux, sem_aux
        ),
    ]
    if nbb_hbm is not None:
        copies.append(
            pltpu.make_async_copy(
                nbb_hbm.at[pl.ds(y0, WH), :], s_nbb, sem_aux
            )
        )
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    cur, nxt = buf_a, buf_b
    for s in range(S):
        # sub-step s consumes window rows [s, WH - s) (valid after s prior
        # sub-steps) and produces the shrunk slab [s + 1, WH - s - 1):
        # y-streaming is pure static ref slicing (no sublane rolls),
        # x-streaming lane rolls whose wrap lands on the BC-rewritten ring
        lo = s + 1
        slab_h = WH - 2 * s - 2
        fs = []
        for k in range(9):
            ey, ex = int(E[k, 1]), int(E[k, 0])
            plane = cur[k, lo - ey : lo - ey + slab_h, :]
            if ex:
                plane = pltpu.roll(plane, ex % BW, axis=1)
            fs.append(plane)
        if nbb_hbm is not None:
            bits = s_nbb[lo : lo + slab_h, :]
            for k in range(1, 9):
                nb_solid = ((bits >> k) & 1) != 0
                fs[k] = jnp.where(
                    nb_solid, cur[int(OPP[k]), lo : lo + slab_h, :], fs[k]
                )
        fs = jnp.stack(fs)
        solid, damp = _unpack_aux(s_aux[lo : lo + slab_h, :])
        f_post, rho, ux, uy = mrt_collide_arrays(
            fs, damp, scal_ref[s, _S_TAU0], scal_ref[s, _S_CSF],
            scal_ref[s, _S_SG], use_les,
        )
        if bounce:
            f_bb = jnp.stack([fs[int(OPP[k])] for k in range(9)])
            f_post = jnp.where(solid[None], f_bb, f_post)
        f_new, rho, ux, uy = _fused_apply_bc(
            f_post, rho, ux, uy, scal_ref, i, s, lo,
            Hg=Hg, Wg=Wg, BW=BW, BH=BH, bc_type=bc_type,
            owner_top=owner_top,
        )
        if bounce:
            out = f_new
        else:
            f_eq_rest = jnp.stack([rho * wk for wk in w9])
            out = jnp.where(solid[None], f_eq_rest, f_new)
        nxt[:, lo : lo + slab_h, :] = out
        cur, nxt = nxt, cur

    store = pltpu.make_async_copy(
        cur.at[:, pl.ds(PY, BH), :],
        fp_new_hbm.at[:, pl.ds(y0 + PY, BH), :],
        sem_out,
    )
    store.start()
    store.wait()


# measured on v5e at 4096 lanes: the fused kernel's scoped-VMEM stack is 61
# f32 planes of window rows (two ping-pong window buffers + stream/collide/
# BC values + Mosaic temporaries; the compiler reported 63.91MB at WH = 64)
_FUSED_PLANES = 61


def _pick_fused_tiles(h: int, w: int):
    """(BH, S) for the temporal-blocking kernel: window height from the
    wide-grid scoped budget at the measured _FUSED_PLANES live set; S = 4
    uses half of the PY = 8 trapezoid margin (each sub-step consumes one
    row of validity per side)."""
    b = budgets()
    wp = _round_up(w, LANE)
    wh = (b.wide_limit_bytes + 8 * _MB) // (_FUSED_PLANES * 4 * wp)
    wh = max(32, (wh // 16) * 16)
    return wh - 2 * PY, 4


def _fused_owner_top(Hg: int, BH: int, nprog: int):
    """Static band indices whose window contains the global top row."""
    WH = BH + 2 * PY
    return tuple(
        ib for ib in range(nprog) if 0 <= Hg - 1 + PY - ib * BH < WH
    )


@functools.partial(
    jax.jit,
    static_argnames=("dims", "S", "use_les", "bc_type", "interpret", "bounce"),
)
def _pallas_fused_steps(
    fp, aux_p2, scalars, dims, S, use_les, bc_type, interpret,
    bounce=False, nbb_p2=None,
):
    """S fused lattice updates on the padded buffer. dims = (Hg, Wg, Hp, BH,
    Wp); aux_p2/nbb_p2 are window-padded [Hp + 2*PY, Wp] (global row g at
    padded row g + PY, like fp)."""
    Hg, Wg, Hp, BH, Wp = dims
    WH = BH + 2 * PY
    nprog = Hp // BH
    dtype = fp.dtype
    halfway = nbb_p2 is not None
    owner_top = _fused_owner_top(Hg, BH, nprog)

    def kernel(*refs):
        it = iter(refs)
        scal = next(it)
        fh, auxh = next(it), next(it)
        nbbh = next(it) if halfway else None
        fn = next(it)
        ba, bb, sa = next(it), next(it), next(it)
        snb = next(it) if halfway else None
        semi, sema, semo = next(it), next(it), next(it)
        _fused_kernel(
            scal, fh, auxh, nbbh, fn, ba, bb, sa, snb, semi, sema, semo,
            Hg=Hg, Wg=Wg, BH=BH, BW=Wp, S=S, use_les=use_les,
            bc_type=bc_type, bounce=bounce, owner_top=owner_top,
        )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    args = [scalars, fp, aux_p2]
    if halfway:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        args.append(nbb_p2)

    # measured live set (_FUSED_PLANES window rows) + headroom
    need = 4 * _FUSED_PLANES * WH * Wp + 12 * _MB
    (out,) = pl.pallas_call(
        kernel,
        grid=(nprog,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=[jax.ShapeDtypeStruct(fp.shape, dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=need),
        scratch_shapes=[
            pltpu.VMEM((9, WH, Wp), dtype),
            pltpu.VMEM((9, WH, Wp), dtype),
            pltpu.VMEM((WH, Wp), dtype),
        ]
        + ([pltpu.VMEM((WH, Wp), jnp.int32)] if halfway else [])
        + [
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args)
    return out


def _step_kernel(
    scal_ref,  # SMEM (1, 14)
    offs_ref,  # SMEM (1, 2) int32 global (y_off, x_off), or None (single-chip)
    h_lo_ref,  # VMEM (9, 8, Wp) row 0 = low-side halo row, or None
    h_hi_ref,  # VMEM (9, 8, Wp) row 0 = high-side halo row, or None
    fp_hbm,  # HBM [9, Hp + 2*PY, Wp]
    aux_ref,  # VMEM (BH, Wp) -- packed damp+mask (pack_aux), auto-pipelined
    nbb_ref,  # VMEM (BH, Wp) int32 neighbor-solid bits (half-way/Bouzidi), or None
    q_ref,  # VMEM (8, BH, Wp) Bouzidi per-link wall fractions, or None
    fp_new_hbm,  # HBM [9, Hp + 2*PY, Wp] (manual aligned DMA)
    rho_ref,  # VMEM (BH, Wp) or None (fast)
    u_ref,  # VMEM (2, BH, Wp) or None (fast)
    f_post_ref,  # VMEM (9, BH, Wp) or None (fast)
    ec_hbm,  # HBM (3, Hp, 256) edge-col macros out (split-BC), or None
    er_hbm,  # HBM (3, 16, Wp) edge-row macros out (split-BC), or None
    scratch_in,  # VMEM (9, BH + 2*PY, BW + 2*PX)
    scratch_out,  # VMEM (9, BH, BW)
    s_ec,  # VMEM (3, BH, 128) staging for ec windows, or None
    s_er,  # VMEM (3, 8, BW) staging for er windows, or None
    sem_in,
    sem_out,
    sem_ec,
    *,
    Hg: int,
    Wg: int,
    HL: int,
    WL: int,
    BH: int,
    BW: int,
    PX: int,
    use_les: bool,
    bc_type,
    apply_bc: bool = True,
    pipelined: bool = False,
    NPROG: int = 0,
    bounce: bool = False,
    store_dev: bool = False,
):
    """Each program owns one (BH, BW) tile: DMA the halo window in, compute
    the full update, DMA the tile out.

    ``store_dev`` (16-bit deviation storage): the HBM f buffer holds
    ``(f_k - w_k)`` as bfloat16 (_DEV_DTYPE) -- half the HBM traffic for
    the bandwidth-bound beyond-VMEM tier -- while all arithmetic stays f32.
    Subtracting the lattice weight first keeps the stored value O(Ma)
    instead of O(1): the quantization error is relative to the small
    deviation (~|dev|/512 per step), not to the O(1) population.

    ``pipelined`` (wide beyond-VMEM grids, single column tile): two-slot
    scratch with cross-program software pipelining -- program i prefetches
    window i+1 while computing window i, and store completion is only
    awaited two programs later. Small (VMEM-resident) grids measured no
    gain from this (their "DMA" is effectively free), but at 4096 lanes the
    serialized load->compute->store chain is the bottleneck.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = i * BH
    x0 = j * BW
    if pipelined:
        slot = jax.lax.rem(i, jnp.int32(2))

        def load_full(idx, sl):
            return pltpu.make_async_copy(
                fp_hbm.at[
                    :, pl.ds(idx * BH, BH + 2 * PY), pl.ds(x0, BW + 2 * PX)
                ],
                scratch_in.at[sl],
                sem_in.at[sl],
            )

        def load_tail(idx, sl):
            # halo carry: window idx's first 2*PY rows are the last 2*PY
            # rows of window idx-1, already resident in the other slot's
            # scratch -- only the BH NEW rows hit HBM. Kills the row-halo
            # re-read (25% of f read bytes at BH=64).
            return pltpu.make_async_copy(
                fp_hbm.at[
                    :,
                    pl.ds(idx * BH + 2 * PY, BH),
                    pl.ds(x0, BW + 2 * PX),
                ],
                scratch_in.at[sl, :, pl.ds(2 * PY, BH), :],
                sem_in.at[sl],
            )

        @pl.when(i == 0)
        def _():
            load_full(0, 0).start()
            load_full(0, 0).wait()

        @pl.when(i > 0)
        def _():
            load_tail(i, slot).wait()

        # seed window i+1: VMEM-copy the overlap rows from this window's
        # just-completed scratch, then DMA only the BH new rows behind the
        # current program's compute
        @pl.when(i + 1 < NPROG)
        def _():
            @pl.when(slot == 0)
            def _():
                scratch_in[1, :, 0 : 2 * PY, :] = scratch_in[0, :, BH:, :]

            @pl.when(slot == 1)
            def _():
                scratch_in[0, :, 0 : 2 * PY, :] = scratch_in[1, :, BH:, :]

            load_tail(i + 1, 1 - slot).start()

        so_parent = scratch_out
        scratch_in = scratch_in.at[slot]
        scratch_out = scratch_out.at[slot]
    else:
        load = pltpu.make_async_copy(
            fp_hbm.at[:, pl.ds(y0, BH + 2 * PY), pl.ds(x0, BW + 2 * PX)],
            scratch_in,
            sem_in,
        )
        load.start()
        load.wait()

    if h_lo_ref is not None:
        # Sharded row-decomposed mode: the 1-row neighbor halos arrive as
        # separate small inputs instead of being DUS-merged into the big HBM
        # buffer on the host side (a DUS there forces a full-buffer copy per
        # step, measured ~80us at 1024^2). The halo rows sit at padded rows
        # PY-1 (low) and PY+HL (high); patch them into this band's loaded
        # window wherever they fall -- windows overlap by 2*PY rows, so a
        # halo row can appear in up to two bands' windows. All row indices
        # are static; pl.when gates each store to the owning band.
        n_bands = (fp_hbm.shape[1] - 2 * PY) // BH
        for tgt, ref_ in ((PY - 1, h_lo_ref), (PY + HL, h_hi_ref)):
            lo_i = max(0, -(-(tgt - BH - 2 * PY + 1) // BH))
            hi_i = min(tgt // BH, n_bands - 1)
            for ib in range(lo_i, hi_i + 1):
                r = tgt - ib * BH

                @pl.when(i == ib)
                def _(r=r, ref_=ref_):
                    scratch_in[:, r, :] = ref_[:, 0, :]

    fs = _stream_band(scratch_in, BH, BW, PX, dequant=store_dev)
    if nbb_ref is not None and q_ref is None:
        # half-way bounce-back: pulls whose source cell is solid return this
        # cell's own opposite previous population (already in the window's
        # center rows); the precomputed bit plane is the same predicate the
        # jnp path derives from mask shifts, so the paths stay bitwise-equal
        bits = nbb_ref[:]
        planes = [fs[0]]
        for k in range(1, 9):
            nb_solid = ((bits >> k) & 1) != 0
            planes.append(
                jnp.where(
                    nb_solid,
                    scratch_in[int(OPP[k]), PY : PY + BH, PX : PX + BW],
                    fs[k],
                )
            )
        fs = jnp.stack(planes)
    if q_ref is not None:
        # Bouzidi interpolated bounce-back (solver.collide_stream_full jnp
        # reference): the wall sits at fraction q along the link toward the
        # solid pull source. Same op order as the jnp path -> bitwise-equal
        # on interior cells; the f_opp(c + e_k) lane-roll wrap (PX == 0) only
        # corrupts global ring columns, which the BCs rewrite. NOTE: loop
        # variables deliberately avoid ``j`` -- that name is this kernel's
        # column program id, read again by _apply_bc_band below.
        bits = nbb_ref[:]
        planes = [fs[0]]
        for k in range(1, 9):
            ekx, eky = int(E[k, 0]), int(E[k, 1])
            ko = int(OPP[k])
            nb_solid = ((bits >> k) & 1) != 0
            q = q_ref[ko - 1]
            f_o = scratch_in[ko, PY : PY + BH, PX : PX + BW]
            f_c = scratch_in[k, PY : PY + BH, PX : PX + BW]
            if PX:
                f_o_up = scratch_in[
                    ko, PY + eky : PY + eky + BH, PX + ekx : PX + ekx + BW
                ]
            else:
                f_o_up = scratch_in[ko, PY + eky : PY + eky + BH, :]
                if ekx:
                    f_o_up = pltpu.roll(f_o_up, shift=(-ekx) % BW, axis=1)
            lo = 2.0 * q * f_o + (1.0 - 2.0 * q) * f_o_up
            hi = f_o / (2.0 * q) + (2.0 * q - 1.0) / (2.0 * q) * f_c
            planes.append(
                jnp.where(nb_solid, jnp.where(q < 0.5, lo, hi), fs[k])
            )
        fs = jnp.stack(planes)
    solid, damp = _unpack_aux(aux_ref[:])
    f_post, rho, ux, uy = mrt_collide_arrays(
        fs, damp, scal_ref[0, _S_TAU0], scal_ref[0, _S_CSF],
        scal_ref[0, _S_SG], use_les,
    )
    if bounce:
        # full-way bounce-back replaces collision on solid cells
        # (archive/lbm_mrt/solver.py:181-195; jnp collide_stream_full)
        f_bb = jnp.stack([fs[int(OPP[k])] for k in range(9)])
        f_post = jnp.where(solid[None], f_bb, f_post)
    if f_post_ref is not None:
        f_post_ref[:] = f_post

    if apply_bc:
        offs = None if offs_ref is None else (offs_ref[0, 0], offs_ref[0, 1])
        f_new, rho, ux, uy = _apply_bc_band(
            f_post, rho, ux, uy, scal_ref, i, j,
            Hg=Hg, Wg=Wg, HL=HL, WL=WL, BH=BH, BW=BW, bc_type=bc_type,
            offs=offs,
        )
    else:
        # split-BC mode: the ring is rewritten by the edge kernel afterwards;
        # export THIS kernel's collide macros on the edge strips so the edge
        # kernel threads the exact same rho/ux/uy the in-kernel BCs would
        # (recomputing them from f_post differs in last ulps and flips
        # data-dependent BC branches like the outlet backflow guard)
        f_new = f_post
        if ec_hbm is not None:
            mac = jnp.stack([rho, ux, uy])
            y0g = i * BH
            # left/right strips live in the first / last REAL column tile
            # (full-width bands: both are tile j == 0); LOCAL dims -- under
            # shard_map the strips are per-shard
            j_rt = (WL - 1) // BW
            c0 = (WL - 128) - j_rt * BW  # right strip's tile-local col

            if j_rt == 0:
                # single column tile (every hardware split geometry): pack
                # both sides into ONE 128-lane plane -- lanes 0..63 = left
                # cols 0..63, lanes 64..127 = right cols W-64..W-1 (the BC
                # only reads cols 0/1 and W-2/W-1) -- halving the export
                # traffic (~3.2 MB/step saved at 1024^2)
                @pl.when(j == 0)
                def _():
                    lane = jax.lax.broadcasted_iota(jnp.int32, (BH, 128), 1)
                    s_ec[:] = jnp.where(
                        lane[None] < 64, mac[:, :, 0:128], mac[:, :, c0 : c0 + 128]
                    )
                    c = pltpu.make_async_copy(
                        s_ec, ec_hbm.at[:, pl.ds(y0g, BH), pl.ds(0, 128)], sem_ec
                    )
                    c.start()
                    c.wait()

            else:

                @pl.when(j == 0)
                def _():
                    s_ec[:] = mac[:, :, 0:128]
                    c = pltpu.make_async_copy(
                        s_ec, ec_hbm.at[:, pl.ds(y0g, BH), pl.ds(0, 128)], sem_ec
                    )
                    c.start()
                    c.wait()

                @pl.when(j == j_rt)
                def _():
                    s_ec[:] = mac[:, :, c0 : c0 + 128]
                    c = pltpu.make_async_copy(
                        s_ec, ec_hbm.at[:, pl.ds(y0g, BH), pl.ds(128, 128)], sem_ec
                    )
                    c.start()
                    c.wait()

            # edge rows span every column tile: each writes its x-part
            @pl.when(i == 0)
            def _():
                s_er[:] = mac[:, 0:8, :]
                c = pltpu.make_async_copy(
                    s_er, er_hbm.at[:, pl.ds(0, 8), pl.ds(x0, BW)], sem_ec
                )
                c.start()
                c.wait()

            i_t, r_t = divmod(HL - 8, BH)

            @pl.when(i == i_t)
            def _():
                s_er[:] = mac[:, r_t : r_t + 8, :]
                c = pltpu.make_async_copy(
                    s_er, er_hbm.at[:, pl.ds(8, 8), pl.ds(x0, BW)], sem_ec
                )
                c.start()
                c.wait()

    # obstacle equilibrium overwrite, after the BCs exactly like the
    # reference (apply_bc tail, LBM2D_MRT_LES.py:452-455)
    f_eq_rest = jnp.stack([rho * float(W[k]) for k in range(9)])

    def _to_store(arr):
        # deviation storage: quantize on the way out (f32 -> 16-bit dev)
        if store_dev:
            return jnp.stack(
                [(arr[k] - float(W[k])).astype(_DEV_DTYPE) for k in range(9)]
            )
        return arr

    if pipelined:
        slot = jax.lax.rem(i, jnp.int32(2))

        def store_for(idx, sl):
            return pltpu.make_async_copy(
                so_parent.at[sl],
                fp_new_hbm.at[:, pl.ds(idx * BH + PY, BH), pl.ds(x0 + PX, BW)],
                sem_out.at[sl],
            )

        # slot reuse: program i - 2 stored from this slot; its DMA must have
        # drained before we overwrite the scratch
        @pl.when(i >= 2)
        def _():
            store_for(i - 2, slot).wait()

        scratch_out[:] = _to_store(
            f_new if bounce else jnp.where(solid[None], f_eq_rest, f_new)
        )
        if rho_ref is not None:
            rho_ref[:] = rho
            u_ref[0] = jnp.where(solid, 0.0, ux)
            u_ref[1] = jnp.where(solid, 0.0, uy)
        store_for(i, slot).start()

        # the last program drains every outstanding store before kernel exit
        @pl.when(i == NPROG - 1)
        def _():
            store_for(i, slot).wait()

        @pl.when((i == NPROG - 1) & (i >= 1))
        def _():
            store_for(i - 1, 1 - slot).wait()
    else:
        scratch_out[:] = _to_store(
            f_new if bounce else jnp.where(solid[None], f_eq_rest, f_new)
        )
        if rho_ref is not None:
            rho_ref[:] = rho
            u_ref[0] = jnp.where(solid, 0.0, ux)
            u_ref[1] = jnp.where(solid, 0.0, uy)

        store = pltpu.make_async_copy(
            scratch_out,
            fp_new_hbm.at[:, pl.ds(y0 + PY, BH), pl.ds(x0 + PX, BW)],
            sem_out,
        )
        store.start()
        store.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "use_les", "bc_type", "full", "interpret", "apply_bc",
        "bounce", "store_dev",
    ),
)
def _pallas_step(
    fp, aux_p, scalars, offs, h_lo, h_hi, dims, use_les, bc_type,
    full, interpret, apply_bc=True, ec_buf=None, er_buf=None, bounce=False,
    nbb_p=None, q_p=None, store_dev=False,
):
    """One fused lattice update. dims = (Hg, Wg, HL, WL, Hp, Wp, BH, BW, PX);
    single-chip passes HL == Hg, WL == Wg and offs None; the sharded path
    passes this device's block dims + its global (y_off, x_off) as offs.
    ``aux_p`` is the packed damp+mask plane (pack_aux). h_lo/h_hi optionally
    carry 1-row neighbor halos ([9, 8, Wp], row 0) that the kernel patches
    into its load window (rows-only decomposition)."""
    Hg, Wg, HL, WL, Hp, Wp, BH, BW, PX = dims
    dtype = fp.dtype
    grid = (Hp // BH, Wp // BW)
    sharded = offs is not None
    halo = h_lo is not None
    halfway = nbb_p is not None  # half-way/Bouzidi neighbor-solid bit plane
    bouzidi = q_p is not None  # Bouzidi wall-fraction planes present
    export = not apply_bc  # split-BC edge-macro export
    if store_dev:
        # sharded halo rows (h_lo/h_hi) are allowed: they are extracted from
        # the stored (16-bit) buffer and patched into the like-typed scratch
        # before the dequantizing stream -- ICI halo bytes halve for free
        assert export and not (full or halfway or bouzidi)
    # exported macros / full-step outputs stay f32 under 16-bit deviation
    # storage (quantizing rho would flip data-dependent BC branches)
    edtype = jnp.float32 if store_dev else dtype

    out_shape = [jax.ShapeDtypeStruct(fp.shape, dtype)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if export:
        # single-column-tile grids pack both sides' macro strips into one
        # 128-lane plane (see _step_kernel export block)
        ec_w = 128 if (WL - 1) // BW == 0 else 256
        out_shape += [
            jax.ShapeDtypeStruct((3, Hp, ec_w), edtype),
            jax.ShapeDtypeStruct((3, 16, Wp), edtype),
        ]
        out_specs += [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
    # software-pipelined two-slot mode for wide beyond-VMEM grids (single
    # column tile; the small-grid "VMEM-resident" tier gains nothing)
    nprog = Hp // BH
    fp_bytes = fp.dtype.itemsize * 9 * (Hp + 2 * PY) * (Wp + 2 * PX)
    pipelined = (
        export and PX == 0 and grid[1] == 1
        and fp_bytes >= _pipeline_min_bytes()
    )
    dims_kw = dict(
        Hg=Hg, Wg=Wg, HL=HL, WL=WL, BH=BH, BW=BW, PX=PX,
        use_les=use_les, bc_type=bc_type, apply_bc=apply_bc,
        pipelined=pipelined, NPROG=nprog, bounce=bounce,
        store_dev=store_dev,
    )
    if full:
        out_shape += [
            jax.ShapeDtypeStruct((Hp, Wp), dtype),
            jax.ShapeDtypeStruct((2, Hp, Wp), dtype),
            jax.ShapeDtypeStruct((9, Hp, Wp), dtype),
        ]
        out_specs += [
            pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (9, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
        ]

    aliased = export and ec_buf is not None

    def kernel(*refs):
        it = iter(refs)
        scal = next(it)
        offs_r = next(it) if sharded else None
        hlo = next(it) if halo else None
        hhi = next(it) if halo else None
        fh, aux = next(it), next(it)
        nbb = next(it) if halfway else None
        qr = next(it) if bouzidi else None
        if aliased:  # donated ec/er input refs; use the output refs instead
            next(it), next(it)
        fn = next(it)
        ec = next(it) if export else None
        er = next(it) if export else None
        rho = next(it) if full else None
        u = next(it) if full else None
        fpost = next(it) if full else None
        s_in, s_out = next(it), next(it)
        s_ec = next(it) if export else None
        s_er = next(it) if export else None
        sin, sout = next(it), next(it)
        semec = next(it) if export else None
        _step_kernel(
            scal, offs_r, hlo, hhi, fh, aux, nbb, qr, fn, rho, u, fpost,
            ec, er, s_in, s_out, s_ec, s_er, sin, sout, semec, **dims_kw,
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [scalars]
    if sharded:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(offs)
    if halo:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args += [h_lo, h_hi]
    fp_idx = len(args)
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    args += [fp, aux_p]
    if halfway:
        in_specs.append(
            pl.BlockSpec((BH, BW), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        )
        args.append(nbb_p)
    if bouzidi:
        in_specs.append(
            pl.BlockSpec(
                (8, BH, BW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            )
        )
        args.append(q_p)

    # XLA allocates the small unblocked ec/er OUTPUTS on the scoped-VMEM
    # stack (layout S(1)) despite the HBM out_spec -- at Hp = 4096 the ec
    # strip alone is 6.3MB and the kernel OOMs. Donated HBM *inputs* aliased
    # to those outputs keep them in HBM like fp (callers thread the buffers
    # through the scan carry; every exported cell is rewritten each step, so
    # stale contents are never read).
    aliases = {}
    if export and ec_buf is not None:
        base = len(args)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ]
        args += [ec_buf, er_buf]
        aliases = {base: 1, base + 1: 2}
    if pipelined:
        # Donate fp: the scan carry otherwise forces XLA to COPY the whole
        # padded buffer every step (profiled 1.79 ms/step at 4096^2 -- as
        # long as the kernel itself). In-place is safe ONLY under the
        # halo-carry schedule: stores trail loads and touch disjoint rows
        # (store j ends at j*BH + PY + BH - 1 < the next tail load's first
        # row (j+1)*BH + 2*PY for PY < BH), and the 2*PY overlap rows come
        # from VMEM, never re-read from HBM.
        aliases[fp_idx] = 0

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(
                Hp, Wp, BW, PX, export, ec_w if export else 0, pipelined, BH,
                isz=fp.dtype.itemsize,
            )
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((2, 9, BH + 2 * PY, BW + 2 * PX), dtype),
                pltpu.VMEM((2, 9, BH, BW), dtype),
            ]
            if pipelined
            else [
                pltpu.VMEM((9, BH + 2 * PY, BW + 2 * PX), dtype),
                pltpu.VMEM((9, BH, BW), dtype),
            ]
        )
        + (
            [pltpu.VMEM((3, BH, 128), edtype), pltpu.VMEM((3, 8, BW), edtype)]
            if export
            else []
        )
        + (
            [pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,))]
            if pipelined
            else [pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
        )
        + ([pltpu.SemaphoreType.DMA] if export else []),
        interpret=interpret,
    )(*args)
    return outs


_EDGE_CH = 256  # edge-kernel column-strip chunk height (rows per program)


def _edge_bc_kernel(
    scal_ref,  # SMEM (1, 14)
    offs_ref,  # SMEM (1, 2) int32 shard origin (y_off, x_off), or None
    fp_hbm,  # HBM [9, Hp + 2*PY, Wp] -- aliased with fp_out_hbm
    aux_hbm,  # HBM [Hp, Wp] packed damp+mask (pack_aux; only the sign bit used)
    ec_hbm,  # HBM (3, Hp, 128|256) collide rho/ux/uy on the edge col strips
    er_in_hbm,  # HBM (3, 16, Wp) collide macros on rows 0..7 / H-8..H-1
    fp_out_hbm,  # HBM, SAME buffer as fp_hbm (input_output_aliases)
    er_hbm,  # HBM, SAME buffer as er_in_hbm (corner lanes merged in place)
    s_col,  # VMEM (9, CH, 128)
    s_rows,  # VMEM (9, 8, Wp)
    s_mc,  # VMEM (3, CH, 128) macro strip
    s_mr,  # VMEM (3, 8, Wp) macro rows
    m_col,  # VMEM (CH, 128) aux strip
    m_rows,  # VMEM (8, Wp) aux rows
    s_fix,  # VMEM (2, 3, 8, 128) corner er staging (bottom, top)
    sem_a,
    sem_b,
    sem_c,
    *,
    H: int,
    Hg: int,
    H8: int,
    W_: int,
    Wg: int,
    Wp: int,
    PXs: int,
    CH: int,
    nch: int,
    bc_type,
    bounce: bool = False,
    store_dev: bool = False,
):
    """Boundary-ring rewrite as a separate tiny kernel (split-BC mode).

    The main kernel runs with apply_bc=False (its lane-roll wrap garbage and
    pad-row garbage land on the ring) and exports its collide rho/ux/uy on
    the edge strips; this kernel then rewrites the ring in the reference's
    order (apply_bc, LBM2D_MRT_LES.py:422-455): left/right columns on inner
    rows, then bottom/top rows INCLUDING corners, then the obstacle
    equilibrium overwrite re-applied on every touched strip with the
    BC-threaded rho (bitwise-identical to the in-kernel-BC variant).

    The corner dependency (a bottom/top corner reads its inward neighbor's
    macros AFTER the left/right BC changed them) is honored by having the
    first/last column chunks merge their BC edge lane into er_hbm before the
    row programs read it -- TPU grid programs run sequentially. The er
    windows are PREFETCHED with the main copies (a mid-program read-wait
    measured ~3us/step; a row-program recompute of the corner macros
    measured ~3us more than that).

    Grid: [0, nch) left column chunks, [nch, 2*nch) right column chunks,
    2*nch bottom rows, 2*nch + 1 top rows. Only ~ (2*H*128 + 16*W) cells
    are touched -- a few %% of the domain.
    """
    i = pl.program_id(0)
    ramp = scal_ref[0, _S_RAMP]
    rho_in = scal_ref[0, _S_RHOIN]
    rho_out = scal_ref[0, _S_RHOOUT]
    w9 = [float(W[k]) for k in range(9)]
    # shard_map use: (y_off, x_off) map local rows/cols to global ones;
    # strips are tiny, so the traced-scalar conjuncts in the masks cost
    # nothing here (unlike in the band kernel). On a 2D mesh only the shard
    # owning a global edge selects anything -- non-owners run the math and
    # mask it all off (their stores rewrite unchanged values).
    y_off = 0 if offs_ref is None else offs_ref[0, 0]
    x_off = 0 if offs_ref is None else offs_ref[0, 1]

    def col_program(c, left):
        x0 = PXs + (0 if left else W_ - 128)  # buffer col (incl. x-halo pad)
        # combined ec layout (single-column-tile exports): both sides live in
        # one 128-lane plane -- left cols 0..63 in lanes 0..63, right cols
        # W-64..W-1 in lanes 64..127, so col W-1 sits at lane 127 and its
        # neighbor W-2 at lane 126 exactly like the legacy 256-lane layout
        combined = ec_hbm.shape[2] == 128
        lane0 = 0 if (left or combined) else 128  # lane block inside ec
        # the last chunk is clamped so the window stays inside the real rows
        # (re-running BC on overlapped rows is idempotent)
        g0 = min(c * CH, H8 - CH)
        # er windows this chunk must corner-thread (bottom and/or top rows);
        # prefetched WITH the main copies so the read latency is hidden
        er_hits = [
            (idx, e0_, r0_)
            for idx, (hit, e0_, r0_) in enumerate(
                ((g0 == 0, 0, 0), (g0 + CH >= H, 8, H - 8 - g0))
            )
            if hit
        ]
        er_wins = {
            e0_: er_hbm.at[:, pl.ds(e0_, 8), pl.ds(x0 - PXs, 128)]
            for _, e0_, _ in er_hits
        }
        copies = [
            # read through the OUTPUT ref: with aliasing it is the same HBM
            # buffer, and later programs must see earlier programs' stores
            # (reading the input ref returns the stale snapshot in interpret
            # mode)
            pltpu.make_async_copy(
                fp_out_hbm.at[:, pl.ds(PY + g0, CH), pl.ds(x0, 128)],
                s_col, sem_a,
            ),
            pltpu.make_async_copy(
                aux_hbm.at[pl.ds(g0, CH), pl.ds(x0 - PXs, 128)], m_col, sem_b
            ),
            pltpu.make_async_copy(
                ec_hbm.at[:, pl.ds(g0, CH), pl.ds(lane0, 128)], s_mc, sem_c
            ),
        ] + [
            pltpu.make_async_copy(er_wins[e0_], s_fix.at[idx], sem_c)
            for idx, e0_, _ in er_hits
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        f = s_col[:]
        if store_dev:
            f = jnp.stack(
                [f[k].astype(jnp.float32) + w9[k] for k in range(9)]
            )
        mac = s_mc[:]
        rho, ux, uy = mac[0], mac[1], mac[2]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1)
        g = y_off + g0 + row_ids  # global row (y_off = 0 single-chip)

        def nb(a):  # neighbor: col 1 (left) / col 126-of-128 (right)
            return pltpu.roll(a, (-1 if left else 1) % 128, axis=a.ndim - 1)

        if left:
            prof = None
            if bc_type[0] in (BC_VEL_INLET, BC_VEL_INLET_NEBB):
                # parabolic profile from global rows; same f32 op order as
                # make_params/parabolic_profile -> bitwise equality
                dtype = f.dtype
                umax = scal_ref[0, _S_BCV + 0]
                hm = jnp.asarray(float(Hg - 1), dtype)
                yy = g.astype(dtype)
                prof = (4.0 * umax) * yy * (hm - yy) / (hm * hm)
            vals = bc_left_values(
                nb(f), nb(rho), nb(ux), nb(uy), ramp, bc_type[0], rho_in,
                u_prof=prof,
            )
        else:
            bcv2 = jnp.stack([scal_ref[0, _S_BCV + 4], scal_ref[0, _S_BCV + 5]])
            vals = bc_right_values(
                nb(f), nb(rho), nb(ux), nb(uy), ramp, bc_type[2], rho_out, bcv2
            )
        fb, rho_b, ux_b, uy_b = vals
        m = (col_ids == (0 if left else 127)) & (g >= 1) & (g <= Hg - 2)
        if offs_ref is not None:
            # 2D mesh: only the shard owning the global left/right edge
            x_owner = (x_off == 0) if left else (x_off + W_ == Wg)
            m = m & x_owner
        f = jnp.where(m[None], fb, f)
        rho = jnp.where(m, rho_b, rho)
        ux = jnp.where(m, ux_b, ux)
        uy = jnp.where(m, uy_b, uy)

        # obstacle overwrite, restricted to the edge lane: only there did
        # the BC change rho (elsewhere the main kernel already wrote the
        # identical f_eq, and with the combined ec layout the non-edge lanes
        # of mac belong to the OTHER side)
        if bounce:
            out = f
        else:
            solid, _ = _unpack_aux(m_col[:])
            solid = solid & (col_ids == (0 if left else 127))
            f_eq_rest = jnp.stack([rho * wk for wk in w9])
            out = jnp.where(solid[None], f_eq_rest, f)
        if store_dev:
            out = jnp.stack(
                [(out[k] - w9[k]).astype(_DEV_DTYPE) for k in range(9)]
            )
        s_col[:] = out
        store = pltpu.make_async_copy(
            s_col, fp_out_hbm.at[:, pl.ds(PY + g0, CH), pl.ds(x0, 128)], sem_a
        )
        store.start()

        # corner threading: merge this side's BC-changed edge lane into er so
        # the row programs (which run after, sequentially) see post-BC
        # macros at the corners' inward neighbors. Merge, not overwrite: with
        # the combined ec layout only the edge lane of mac carries this
        # side's macros; the other 127 lanes keep er's prefetched values.
        mac2 = jnp.stack([rho, ux, uy])
        fix_lane = 0 if left else 127
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        fix_writes = []
        for idx, e0_, r0_ in er_hits:
            s_fix[idx] = jnp.where(
                lane8[None] == fix_lane, mac2[:, r0_ : r0_ + 8, :], s_fix[idx]
            )
            wfix = pltpu.make_async_copy(s_fix.at[idx], er_wins[e0_], sem_c)
            wfix.start()
            fix_writes.append(wfix)
        store.wait()
        for wfix in fix_writes:
            wfix.wait()

    def row_program(top):
        # bottom: padded rows [PY, PY+8) = global 0..7, edge local 0, nb 1
        # top: padded rows [H, H+8) = global H-8..H-1, edge local 7, nb 6
        # padded row r0; x covers the real columns at buffer offset PXs
        r0, g0, edge_r, nb_r = (H, H - 8, 7, 6) if top else (PY, 0, 0, 1)
        e0 = 8 if top else 0  # row block inside er
        side = 1 if top else 3
        bcv_off = _S_BCV + 2 if top else _S_BCV + 6
        copies = [
            pltpu.make_async_copy(
                fp_out_hbm.at[:, pl.ds(r0, 8), pl.ds(PXs, Wp)], s_rows, sem_a
            ),
            pltpu.make_async_copy(
                aux_hbm.at[pl.ds(g0, 8), pl.ds(0, Wp)], m_rows, sem_b
            ),
            pltpu.make_async_copy(
                er_hbm.at[:, pl.ds(e0, 8), pl.ds(0, Wp)], s_mr, sem_c
            ),
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        f = s_rows[:]
        if store_dev:
            f = jnp.stack(
                [f[k].astype(jnp.float32) + w9[k] for k in range(9)]
            )
        mac = s_mr[:]
        f_nb = f[:, nb_r, :]  # [9, Wp]
        bcv = jnp.stack([scal_ref[0, bcv_off], scal_ref[0, bcv_off + 1]])
        fb, rho_b, ux_b, uy_b = bc_horizontal_values(
            f_nb, mac[0, nb_r, :], mac[1, nb_r, :], mac[2, nb_r, :],
            ramp, bc_type[side], bcv,
        )
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, Wp), 0)
        m = row_ids == edge_r  # full row incl. corners (reference :446-451)
        if offs_ref is not None:
            # only the shard owning the global edge row applies this BC
            owner = (y_off + H == Hg) if top else (y_off == 0)
            m = m & owner
        f = jnp.where(m[None], fb[:, None, :], f)
        rho = jnp.where(m, rho_b[None, :], mac[0])

        if bounce:
            out = f
        else:
            solid, _ = _unpack_aux(m_rows[:])
            f_eq_rest = jnp.stack([rho * wk for wk in w9])
            out = jnp.where(solid[None], f_eq_rest, f)
        if store_dev:
            out = jnp.stack(
                [(out[k] - w9[k]).astype(_DEV_DTYPE) for k in range(9)]
            )
        s_rows[:] = out
        store = pltpu.make_async_copy(
            s_rows, fp_out_hbm.at[:, pl.ds(r0, 8), pl.ds(PXs, Wp)], sem_a
        )
        store.start()
        store.wait()

    if bc_type[0] in (BC_INLET, BC_FREE_SLIP, BC_VEL_INLET, BC_VEL_INLET_NEBB):
        for c in range(nch):

            @pl.when(i == c)
            def _(c=c):
                col_program(c, left=True)

    if bc_type[2] in (BC_OUTLET, BC_INLET, BC_FREE_SLIP):
        for c in range(nch):

            @pl.when(i == nch + c)
            def _(c=c):
                col_program(c, left=False)

    if bc_type[3] in (BC_INLET, BC_FREE_SLIP):

        @pl.when(i == 2 * nch)
        def _():
            row_program(top=False)

    if bc_type[1] in (BC_INLET, BC_FREE_SLIP):

        @pl.when(i == 2 * nch + 1)
        def _():
            row_program(top=True)


@functools.partial(
    jax.jit,
    static_argnames=("edims", "bc_type", "interpret", "bounce", "store_dev"),
)
def _edge_bc_step(
    fp, aux_p, ec, er, scalars, edims, bc_type, interpret, offs=None,
    bounce=False, store_dev=False,
):
    """Apply the boundary ring in place on the padded buffer (aliased I/O).
    edims = (H, W, Hp, Wp, PXs, Hg, Wg) with H/W the LOCAL block dims and
    Hg/Wg the global lattice dims (equal single-chip); ec/er are the main
    kernel's exported collide macros on the edge strips. ``offs`` carries
    the shard origin under shard_map (rows-only or 2D decomposition)."""
    H, W_, Hp, Wp, PXs, Hg, Wg = edims
    dtype = fp.dtype  # storage dtype (16-bit under deviation storage)
    edtype = er.dtype  # macro-export dtype (always f32)
    adtype = aux_p.dtype  # packed damp+mask dtype (always f32)
    H8 = _round_up(H, 8)
    CH = min(_EDGE_CH, H8)
    nch = -(-H // CH)
    sharded = offs is not None

    def kernel(*refs):
        it = iter(refs)
        scal = next(it)
        offs_r = next(it) if sharded else None
        rest = list(it)
        _edge_bc_kernel(
            scal, offs_r, *rest,
            H=H, Hg=Hg, H8=H8, W_=W_, Wg=Wg, Wp=Wp, PXs=PXs, CH=CH, nch=nch,
            bc_type=bc_type, bounce=bounce, store_dev=store_dev,
        )

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    args = [scalars]
    if sharded:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(offs)
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    out, _ = pl.pallas_call(
        kernel,
        grid=(2 * nch + 2,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(fp.shape, dtype),
            jax.ShapeDtypeStruct(er.shape, edtype),
        ],
        input_output_aliases={2 if sharded else 1: 0, 5 if sharded else 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=budgets().base_limit_bytes
            + 4 * (3 * Hp * ec.shape[2] + 48 * Wp)
        ),
        scratch_shapes=[
            pltpu.VMEM((9, CH, 128), dtype),
            pltpu.VMEM((9, 8, Wp), dtype),
            pltpu.VMEM((3, CH, 128), edtype),
            pltpu.VMEM((3, 8, Wp), edtype),
            pltpu.VMEM((CH, 128), adtype),
            pltpu.VMEM((8, Wp), adtype),
            pltpu.VMEM((2, 3, 8, 128), edtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*args, fp, aux_p, ec, er)
    return out


def _scalars(p: CaseParams, step, dtype):
    """Pack per-step scalars (incl. the warmup ramp) into the SMEM row."""
    progress = jnp.minimum(1.0, step.astype(dtype) / p.warmup_steps.astype(dtype))
    ramp = 1.0 - jnp.cos(jnp.asarray(0.5 * PI_REF, dtype) * progress)
    return jnp.concatenate(
        [
            jnp.stack(
                [
                    p.tau0.astype(dtype),
                    p.cs_factor.astype(dtype),
                    p.s_ghost.astype(dtype),
                    ramp,
                    p.rho_in.astype(dtype),
                    p.rho_out.astype(dtype),
                ]
            ),
            p.bc_value.astype(dtype).reshape(-1),
        ]
    ).reshape(1, 14)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "interpret", "tiles", "split_bc", "store_dev"),
)
def run_chunk_pallas(
    state: LBMState, p: CaseParams, n_steps: int, interpret: bool = False,
    tiles=None, split_bc=None, store_dev=None,
):
    """Advance n_steps with the fused kernel; same contract as run_chunk.

    ``tiles`` optionally overrides the (BH_fast, BH_full, BW, PX) geometry
    (used by tests to exercise the column-tiled path on small grids).

    ``split_bc``: fast steps run the main kernel WITHOUT boundary branches
    (taller bands, fewer live temps) and a second tiny kernel rewrites the
    boundary ring in place (_edge_bc_kernel). None = auto (on when the
    geometry is eligible: W a lane multiple, H a sublane multiple). Wide
    grids (> 2048 lanes) run the fast steps on 1024-lane column tiles with a
    real 128-lane x-halo. The closing full step always uses the in-kernel-BC
    full-width variant.

    ``store_dev``: 16-bit deviation storage for the fast steps (see
    _STORE_DEV). Lossy, opt-in; requires the split-BC path and a plain
    (equilibrium overwrite or full-way bounce) obstacle scheme. None =
    module default.
    """
    if not supports(p):
        raise ValueError(f"bc_type {p.bc_type} unsupported by the fused kernel")
    _, H, W_ = state.f.shape
    dtype = state.f.dtype
    q_extra = 16 if p.bouzidi_obstacle else 0  # 8 q planes + shifted reads
    bh_fast, bh_full, BW, PX = tiles or _pick_tiles(H, W_, extra=q_extra)
    eligible = W_ % LANE == 0 and H % 8 == 0 and H >= 16
    if split_bc is None:
        split_bc = eligible and tiles is None
    elif split_bc and not eligible:
        raise ValueError(
            f"split_bc needs W % 128 == 0, H % 8 == 0, H >= 16 "
            f"(got H={H}, W={W_})"
        )
    # fast-step geometry: split mode may use column tiles on wide grids;
    # the closing full step (in-kernel BCs + rho/u/f_post outputs) always
    # uses the full-width _pick_tiles geometry
    BW_s, PX_s = BW, PX
    fuse_S = 0
    if store_dev is None:
        store_dev = _STORE_DEV
    store_dev = bool(
        store_dev and split_bc and n_steps > 1
        and not (_FUSE_STEPS and _FUSE_STEPS > 1)
        and not (p.halfway_obstacle or p.bouzidi_obstacle)
    )
    if split_bc and tiles is None:
        bh_fast, BW_s, PX_s = _pick_split_tiles(
            H, W_, extra=q_extra, dev=store_dev
        )
        # temporal blocking (beyond-VMEM tier): S fused steps per HBM pass.
        # Eligibility mirrors the pipelined tier -- full-width single column
        # tile and a padded f too large to stay VMEM-resident.
        if PX_s == 0 and BW_s == _round_up(W_, LANE):
            # NOTE: fusion is currently OPT-IN (_FUSE_STEPS override): on
            # v5e hardware the fused kernel measured 2.9k MLUPS at 4096^2 vs
            # 3.8k for the pipelined split-BC path -- the beyond-VMEM tier
            # turned out compute-bound at wide lanes, not HBM-bound, so
            # cutting f traffic 4x does not pay at this geometry yet.
            fu = None if p.bouzidi_obstacle else _FUSE_STEPS
            if fu and fu > 1:
                fuse_S = min(int(fu), PY)
                bh_f = _FUSE_BH or _pick_fused_tiles(H, W_)[0]
                # one Hp granularity serves the fused, split-remainder and
                # closing-full kernels
                bh_fast = min(bh_fast, bh_f)
    assert not (store_dev and fuse_S > 1)
    Wp = _round_up(W_, BW)
    Wp_s = _round_up(W_, BW_s)
    Hp = _round_up(H, bh_fast)
    if split_bc:
        # pick the largest full-step band that divides the split-mode Hp
        # and fits scoped VMEM (~53 live planes/row with the output blocks)
        cands = [bh_full, bh_fast // 2, bh_fast // 4, 16, 8]
        full_budget = budgets().full_budget_floats
        bh_full = next(
            b for b in cands
            if b and Hp % b == 0 and (53 * b + 144) * Wp <= full_budget
        )
    dims_fast = (H, W_, H, W_, Hp, Wp_s, bh_fast, BW_s, PX_s)
    dims_full = (H, W_, H, W_, Hp, Wp, bh_full, BW, PX)
    edims = (H, W_, Hp, Wp_s, PX_s, H, W_)

    fp = jnp.pad(
        state.f, ((0, 0), (PY, PY + (Hp - H)), (PX_s, PX_s + (Wp_s - W_)))
    )
    if store_dev:
        # quantize once per chunk: the fast steps carry 16-bit deviations
        # (f_k - w_k); the chunk-closing full step dequantizes back to f32.
        # Pad cells round-trip to ~1e-3*w instead of exact 0 -- they only
        # feed the boundary ring, which the edge kernel rewrites every step.
        w_col = jnp.asarray(np.asarray(W, np.float32)).reshape(9, 1, 1)
        fp = (fp - w_col).astype(_DEV_DTYPE)
    aux = pack_aux(p.damping, p.mask)
    aux_s = jnp.pad(aux, ((0, Hp - H), (0, Wp_s - W_)))
    nbb = (
        neighbor_solid_bits(p.mask)
        if (p.halfway_obstacle or p.bouzidi_obstacle)
        else None
    )
    nbb_s = (
        None if nbb is None else jnp.pad(nbb, ((0, Hp - H), (0, Wp_s - W_)))
    )
    qp = p.bouzidi_q if p.bouzidi_obstacle else None
    qp_s = (
        None if qp is None
        else jnp.pad(qp, ((0, 0), (0, Hp - H), (0, Wp_s - W_)))
    )

    # ec/er export buffers ride the scan carry as donated HBM inputs (see
    # _pallas_step aliases note); every exported cell is rewritten per step
    ec_w = 128 if (W_ - 1) // BW_s == 0 else 256
    ec0 = jnp.zeros((3, Hp, ec_w), dtype)
    er0 = jnp.zeros((3, 16, Wp_s), dtype)

    def fast_body(carry, _):
        fp, ec, er, step = carry
        step = step + 1
        scal = _scalars(p, step, dtype)
        if split_bc:
            fp_new, ec, er = _pallas_step(
                fp, aux_s, scal, None, None, None, dims_fast,
                p.use_les, p.bc_type, False, interpret, False,
                ec_buf=ec, er_buf=er, bounce=p.bounce_obstacle, nbb_p=nbb_s,
                q_p=qp_s, store_dev=store_dev,
            )
            fp_new = _edge_bc_step(
                fp_new, aux_s, ec, er, scal, edims, p.bc_type, interpret,
                bounce=p.bounce_obstacle, store_dev=store_dev,
            )
        else:
            (fp_new,) = _pallas_step(
                fp, aux_s, scal, None, None, None, dims_fast,
                p.use_les, p.bc_type, False, interpret, True,
                bounce=p.bounce_obstacle, nbb_p=nbb_s, q_p=qp_s,
            )
        return (fp_new, ec, er, step), None

    if fuse_S > 1 and n_steps > 1:
        # temporal blocking: k fused passes of S steps, then the remainder
        # on the split-BC single-step path
        aux_w = jnp.pad(aux, ((PY, PY + (Hp - H)), (0, Wp_s - W_)))
        nbb_w = (
            None if nbb is None
            else jnp.pad(nbb, ((PY, PY + (Hp - H)), (0, Wp_s - W_)))
        )
        fdims = (H, W_, Hp, bh_fast, Wp_s)
        k, r = divmod(n_steps - 1, fuse_S)

        def fused_body(carry, _):
            fp, step = carry
            scal_rows = jnp.concatenate(
                [_scalars(p, step + 1 + s, dtype) for s in range(fuse_S)], 0
            )
            fp = _pallas_fused_steps(
                fp, aux_w, scal_rows, fdims, fuse_S, p.use_les, p.bc_type,
                interpret, bounce=p.bounce_obstacle, nbb_p2=nbb_w,
            )
            return (fp, step + fuse_S), None

        carry = (fp, state.step)
        if k:
            carry, _ = jax.lax.scan(fused_body, carry, None, length=k)
        fp, step0 = carry
        carry = (fp, ec0, er0, step0)
        if r:
            carry, _ = jax.lax.scan(fast_body, carry, None, length=r)
        fp, _, _, step = carry
    else:
        carry = (fp, ec0, er0, state.step)
        if n_steps > 1:
            carry, _ = jax.lax.scan(fast_body, carry, None, length=n_steps - 1)
        fp, _, _, step = carry
    if store_dev:
        # dequantize for the chunk-closing full step (exact-f32 from here on)
        fp = fp.astype(jnp.float32) + w_col
    step = step + 1
    scal = _scalars(p, step, dtype)
    if (PX_s, Wp_s) != (PX, Wp):
        # column-tiled fast geometry -> re-pad once for the full-width step
        fp = jnp.pad(
            fp[:, :, PX_s : PX_s + W_], ((0, 0), (0, 0), (PX, PX + (Wp - W_)))
        )
    if (Wp_s - W_) != (Wp - W_) or PX_s != PX:
        aux_p = jnp.pad(aux, ((0, Hp - H), (0, Wp - W_)))
        nbb_p = (
            None if nbb is None
            else jnp.pad(nbb, ((0, Hp - H), (0, Wp - W_)))
        )
        qp_p = (
            None if qp is None
            else jnp.pad(qp, ((0, 0), (0, Hp - H), (0, Wp - W_)))
        )
    else:
        aux_p = aux_s
        nbb_p = nbb_s
        qp_p = qp_s
    fp, rho_p, u_p, fpost_p = _pallas_step(
        fp, aux_p, scal, None, None, None, dims_full,
        p.use_les, p.bc_type, True, interpret, bounce=p.bounce_obstacle,
        nbb_p=nbb_p, q_p=qp_p,
    )

    f = fp[:, PY : PY + H, PX : PX + W_]
    rho = rho_p[:H, :W_]
    u = u_p[:, :H, :W_]
    # f_post keeps its initial-equilibrium ring (the reference never writes
    # f_new on the ring); interior from the final step's collision output
    f_post = state.f_post.at[:, 1:-1, 1:-1].set(fpost_p[:, 1 : H - 1, 1 : W_ - 1])

    new_state = LBMState(f=f, f_post=f_post, rho=rho, u=u, step=step)
    monitors = {
        "force": obstacle_force(new_state.f_post, p),
        "max_v": max_velocity(new_state.u),
    }
    return new_state, monitors
