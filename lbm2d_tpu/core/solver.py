"""TPU-native D2Q9 MRT-LES lattice-Boltzmann solver core.

A pure-functional re-design of the reference Taichi solver
(/root/reference/src/lbm_mrt_les/core/LBM2D_MRT_LES.py). One lattice update is
``step(state, params) -> state``; the host never touches device memory inside
a chunk -- monitoring values (obstacle force, max velocity) are computed on
device and returned as scalars from :func:`run_chunk`.

Update order replicated from the reference (run_step, :552-573):
  1. collide_and_stream on the interior ring-excluded region (:243-420)
     (pull streaming -> M f -> macro -> m_eq -> LES tau_eff -> sponge ->
     diagonal-S relaxation -> M^-1 m*),
  2. macro update + f_new -> f_old copy on the interior (:422-436),
  3. apply_bc (:438-550): left/right edges first, then top/bottom rows
     (including corners), then obstacle cells get f <- f_eq(rho, u=0).

State layout: channel-major ``[9, H, W]`` (y, x), f32. ``f_post`` mirrors the
reference's ``f_new`` buffer: its 1-cell boundary ring is frozen at the
initial equilibrium (the reference never writes it), and it is the field the
moment export and momentum-exchange force read from.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .lattice import (
    E,
    OPP,
    W,
    PI_REF,
    f_eq,
    f_eq_unit,
    f_eq_unit_x,
    f_eq_unit_y,
    m_eq,
    moments_from_f,
    f_from_moments,
)
from .sponge import sponge_damping_field

# BC side indices as used by the reference apply_bc (:445-450).
SIDE_LEFT, SIDE_TOP, SIDE_RIGHT, SIDE_BOTTOM = 0, 1, 2, 3

# BC type codes (master_config.yaml:92): 0 = inlet (Zou-He pressure on the
# left edge, velocity inlet elsewhere), 1 = Zou-He pressure outlet (right
# edge only), 2 = free-slip.  Type 3 is NEW in this framework (the reference
# carries the helper but never wires it up, LBM2D_MRT_LES.py:580-586): a
# prescribed-velocity equilibrium inlet on the left edge whose per-row
# profile is CaseParams.inlet_profile (parabolic for DFG benchmarks),
# applied like the archive velocity-inlet solver (archive/lbm_mrt/
# solver.py:246-257: rho = 1, u = profile, f = f_eq(1, u)).
BC_INLET, BC_OUTLET, BC_FREE_SLIP, BC_VEL_INLET = 0, 1, 2, 3
# Type 4 (NEW, like type 3): profiled-velocity NEBB inlet on the left edge.
# Same per-row profile as type 3, but the boundary f carries the neighbor's
# non-equilibrium part (f = f_eq(rho_nb, u_prof) + f_nb - f_eq(rho_nb, u_nb),
# the extrapolation the reference uses for its non-west velocity inlets,
# LBM2D_MRT_LES.py:487-492).  The pure-equilibrium type 3 under-delivers the
# prescribed velocity by O(grad u / omega) (~4% in the DFG hardware runs,
# which biases nominal-U-normalized Cd by ~8%); type 4 delivers it exactly.
BC_VEL_INLET_NEBB = 4


@struct.dataclass
class CaseParams:
    """Per-case parameters. Array leaves are batchable under vmap."""

    mask: jnp.ndarray  # [H, W] f32, 1 = solid
    damping: jnp.ndarray  # [H, W] f32 sponge tau addition
    tau0: jnp.ndarray  # scalar f32, 3 nu + 0.5
    cs_factor: jnp.ndarray  # scalar f32, 18 * Cs^2
    s_ghost: jnp.ndarray  # scalar f32, ghost-moment relaxation rate
    rho_in: jnp.ndarray  # scalar f32
    rho_out: jnp.ndarray  # scalar f32
    warmup_steps: jnp.ndarray  # scalar f32 (ramp denominator)
    bc_value: jnp.ndarray  # [4, 2] f32 velocity-inlet values
    # [H] per-row inlet velocity profile (BC_VEL_INLET left edge); None
    # otherwise.  Built by make_params (parabolic, LBM2D_MRT_LES.py:580-586).
    inlet_profile: Optional[jnp.ndarray] = None
    # [8, H, W] wall-intersection fractions for Bouzidi interpolated
    # bounce-back (obstacle = "bounce_back_bouzidi"); plane j-1 holds
    # q_j(c) in (0, 1]: the fraction of the outgoing link c -> c + e_j at
    # which the true (sub-grid) wall surface sits, for fluid cells whose
    # +e_j neighbor is solid.  0.5 everywhere else (the scheme then reduces
    # to half-way bounce-back).  Built by make_params from the analytic
    # obstacle geometry (bouzidi_q_planes); None for the other modes.
    bouzidi_q: Optional[jnp.ndarray] = None
    # --- static (part of the jit cache key) ---
    use_les: bool = struct.field(pytree_node=False, default=True)
    bc_type: Tuple[int, int, int, int] = struct.field(
        pytree_node=False, default=(BC_INLET, BC_FREE_SLIP, BC_OUTLET, BC_FREE_SLIP)
    )
    # Solid-cell treatment: False = equilibrium overwrite f <- f_eq(rho, 0)
    # (reference apply_bc tail, LBM2D_MRT_LES.py:452-455); True = full-way
    # bounce-back f_new <- streamed f reversed (archive/lbm_mrt/
    # solver.py:181-195) -- the no-slip variant DFG validation needs.
    bounce_obstacle: bool = struct.field(pytree_node=False, default=False)
    # Half-way bounce-back (obstacle = "bounce_back_halfway"): a pull from a
    # solid neighbor returns this cell's own opposite post-collision
    # population, placing the wall midway along the link -- second-order
    # accurate and without full-way's one-step reflection lag (the known fix
    # for the full-way wall-location bias in the DFG St measurement).
    # NEW vs the reference (its archive solver is full-way only).
    halfway_obstacle: bool = struct.field(pytree_node=False, default=False)
    # Bouzidi-Firdaouss-Lallemand (2001) linear interpolated bounce-back
    # (obstacle = "bounce_back_bouzidi"): the returned population is
    # interpolated so the no-slip surface sits at the TRUE wall distance q
    # along each boundary link instead of the lattice midpoint -- removes
    # the staircase wall-location error of the (half-way) schemes on curved
    # obstacles.  Requires boundary_condition.obstacle_geometry (analytic
    # shape) in the config; q = 1/2 links reduce bitwise to half-way.
    # NEW vs the reference (no curved-boundary scheme exists there).
    bouzidi_obstacle: bool = struct.field(pytree_node=False, default=False)

    @property
    def shape(self):
        return self.mask.shape


@struct.dataclass
class LBMState:
    f: jnp.ndarray  # [9, H, W] post-BC distributions (reference f_old)
    f_post: jnp.ndarray  # [9, H, W] post-collision (reference f_new)
    rho: jnp.ndarray  # [H, W]
    u: jnp.ndarray  # [2, H, W] (ux, uy)
    step: jnp.ndarray  # i32 scalar, equals reference frame_count


def make_params(
    config: dict,
    mask: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> CaseParams:
    """Build CaseParams from a per-case config dict (reference YAML schema).

    ``mask`` is [H, W] (y, x) with 1 = solid.
    """
    sim = config["simulation"]
    ny, nx = int(sim["ny"]), int(sim["nx"])
    zones = config["domain_zones"]
    damping = sponge_damping_field(
        nx,
        ny,
        zones["sponge_in"],
        zones["sponge_out"],
        zones["sponge_top"],
        zones["sponge_bot"],
        zones["sponge_strength"],
        dtype=np.float64,
    )
    if mask is None:
        mask = np.zeros((ny, nx), np.float32)
    else:
        mask = np.asarray(mask, np.float32)
        if mask.shape != (ny, nx):
            raise ValueError(f"mask shape {mask.shape} != (ny={ny}, nx={nx})")
    bc = config["boundary_condition"]
    # Type-1 (Zou-He pressure outlet) on top/bottom is a no-op in this solver,
    # but the reference apply_bc_core still touches the two i==nx-1 corner
    # cells for horizontal type-1 sides (LBM2D_MRT_LES.py:495-527).  Reject
    # the combination so the deviation cannot be hit silently; no generated
    # config uses it (outlets are always side index 2 = right).
    bc_types = [int(t) for t in bc["type"]]
    for side in (1, 3):  # top, bottom
        if bc_types[side] == 1:
            raise ValueError(
                "boundary_condition.type=1 (pressure outlet) on top/bottom is "
                "not supported (reference applies it only at two corner cells; "
                "use 2 = free-slip or 0 = velocity inlet)"
            )
    for side in (1, 2, 3):
        if bc_types[side] in (BC_VEL_INLET, BC_VEL_INLET_NEBB):
            raise ValueError(
                "boundary_condition.type=3/4 (profiled velocity inlet) is "
                "only supported on the left edge"
            )
    inlet_profile = None
    if bc_types[SIDE_LEFT] in (BC_VEL_INLET, BC_VEL_INLET_NEBB):
        u_max = float(np.asarray(bc["value"], np.float32)[SIDE_LEFT][0])
        # computed IN the case dtype with the same op order the Pallas edge
        # kernel uses ((4 u) * y * (h - y) / (h * h)), so the two paths are
        # bitwise-identical at the inlet
        np_dtype = np.dtype(jnp.dtype(dtype).name).type
        inlet_profile = jnp.asarray(
            parabolic_profile(ny, u_max, np_dtype), dtype
        )
    obstacle = str(bc.get("obstacle", "equilibrium"))
    if obstacle not in (
        "equilibrium", "bounce_back", "bounce_back_halfway",
        "bounce_back_bouzidi",
    ):
        raise ValueError(f"unknown boundary_condition.obstacle {obstacle!r}")
    bouzidi_q = None
    if obstacle == "bounce_back_bouzidi":
        # obstacle_geometry gives the analytic surface (cylinder / rect /
        # triangle / polygon / union); without one the q planes derive from
        # the mask's own signed-distance field, so Bouzidi runs on the full
        # production mask menu of tools/map_generators.py
        geom = bc.get("obstacle_geometry")
        np_dtype = np.dtype(jnp.dtype(dtype).name).type
        bouzidi_q = jnp.asarray(
            bouzidi_q_planes(np.asarray(mask), geom, np_dtype), dtype
        )
    c_smag = float(sim["smagorinsky_constant"])
    return CaseParams(
        mask=jnp.asarray(mask, dtype),
        damping=jnp.asarray(damping, dtype),
        tau0=jnp.asarray(3.0 * float(sim["nu"]) + 0.5, dtype),
        cs_factor=jnp.asarray(18.0 * c_smag * c_smag, dtype),
        s_ghost=jnp.asarray(float(sim["ghost_moments_s"]), dtype),
        rho_in=jnp.asarray(float(sim["rho_in"]), dtype),
        rho_out=jnp.asarray(float(sim["rho_out"]), dtype),
        warmup_steps=jnp.asarray(float(sim["warmup_steps"]), dtype),
        bc_value=jnp.asarray(np.asarray(bc["value"], np.float32), dtype),
        inlet_profile=inlet_profile,
        use_les=c_smag > 0.001,
        bc_type=tuple(bc_types),
        bounce_obstacle=obstacle == "bounce_back",
        halfway_obstacle=obstacle == "bounce_back_halfway",
        bouzidi_obstacle=obstacle == "bounce_back_bouzidi",
        bouzidi_q=bouzidi_q,
    )


def parabolic_profile(ny: int, u_max: float, dtype=np.float64) -> np.ndarray:
    """Parabolic (Poiseuille) inlet profile over rows 0..ny-1 -> [ny].

    u(y) = 4 u_max y (h - y) / h^2 with h = ny - 1: the DFG benchmark inlet
    the reference defines but never wires up (get_parabolic_inlet_velocity,
    LBM2D_MRT_LES.py:580-586).
    """
    y = np.arange(ny, dtype=dtype)
    h = dtype(ny - 1)
    return (4.0 * dtype(u_max) * y * (h - y) / (h * h)).astype(dtype)


def _link_t_cylinder(geom: dict, dx, dy, ex: int, ey: int) -> np.ndarray:
    """Smallest t in (0, 1] where cell-center + t e hits the circle; inf
    where the link misses it.  dx/dy are cell-center offsets from (cx, cy)."""
    r = float(geom["r"])
    cc = dx * dx + dy * dy - r * r
    a = float(ex * ex + ey * ey)
    b = 2.0 * (dx * ex + dy * ey)
    disc = b * b - 4.0 * a * cc
    sq = np.sqrt(np.maximum(disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    in1 = (disc >= 0.0) & (t1 > 0.0) & (t1 <= 1.0)
    in2 = (disc >= 0.0) & (t2 > 0.0) & (t2 <= 1.0)
    return np.where(in1, t1, np.where(in2, t2, np.inf))


def _link_t_polygon(verts: np.ndarray, xx, yy, ex: int, ey: int) -> np.ndarray:
    """Smallest t in (0, 1] where cell-center + t e crosses any polygon
    edge; inf where the link misses the polygon.  Solves
    c + t d = p + s (pn - p) per edge via 2D cross products."""
    t_min = np.full(xx.shape, np.inf)
    verts = np.asarray(verts, np.float64)
    n = len(verts)
    for i in range(n):
        px, py = verts[i]
        qx, qy = verts[(i + 1) % n]
        egx, egy = qx - px, qy - py
        denom = ex * egy - ey * egx  # cross(d, edge)
        if abs(denom) < 1e-12:
            continue  # link parallel to this edge; neighbors cover corners
        rx = px - xx
        ry = py - yy
        t = (rx * egy - ry * egx) / denom  # cross(p-c, e) / cross(d, e)
        s = (rx * ey - ry * ex) / denom  # cross(p-c, d) / cross(d, e)
        hit = (t > 0.0) & (t <= 1.0) & (s >= 0.0) & (s <= 1.0)
        t_min = np.where(hit & (t < t_min), t, t_min)
    return t_min


def _link_t_sdf(phi: np.ndarray, xx, yy, ex: int, ey: int,
                samples: int = 32) -> np.ndarray:
    """First zero crossing of a bilinearly-interpolated signed-distance
    field along each link (mask-derived geometry: composite shapes with no
    analytic description).  phi > 0 in fluid, < 0 in solid; the zero level
    of the cell-center EDT sits midway between adjacent fluid/solid
    centers, so flat walls reduce to q = 1/2 (half-way) as they should."""
    from scipy.ndimage import map_coordinates

    h, w = phi.shape
    ts = np.linspace(0.0, 1.0, samples + 1)
    prev_phi = phi.copy()
    t_hit = np.full(phi.shape, np.inf)
    for i in range(1, samples + 1):
        t = ts[i]
        cy = np.clip(yy + t * ey, 0, h - 1)
        cx = np.clip(xx + t * ex, 0, w - 1)
        cur = map_coordinates(phi, [cy, cx], order=1, mode="nearest")
        # first crossing only: cells whose t_hit is already set keep it
        crossing = (prev_phi > 0.0) & (cur <= 0.0) & np.isinf(t_hit)
        denom = prev_phi - cur
        frac = np.where(denom > 1e-12, prev_phi / np.maximum(denom, 1e-12), 0.0)
        t_cross = ts[i - 1] + frac * (ts[i] - ts[i - 1])
        t_hit = np.where(crossing, t_cross, t_hit)
        prev_phi = cur
    return t_hit


def signed_distance(mask: np.ndarray) -> np.ndarray:
    """Pseudo signed distance whose zero level approximates the surface the
    binary mask was rasterized from: > 0 in fluid, < 0 in solid.

    Construction: 3x3 volume-fraction smoothing, phi = 1/2 - box3(mask).
    For a half-plane wall this recovers the wall line exactly (the box
    average of a linear indicator is linear through the midline); on
    rasterized circles it measured ~30-40% lower q error than an EDT zero
    level (which pins to the staircase midline, q error means 0.22 vs 0.15
    at D = 38).  Near-boundary accuracy only -- NOT a metric distance far
    from the wall, which is all the q-plane crossing search samples."""
    from scipy.ndimage import uniform_filter

    solid = np.asarray(mask) > 0.5
    if not solid.any():
        return np.full(solid.shape, np.inf)
    return 0.5 - uniform_filter(solid.astype(np.float64), 3, mode="nearest")


def _geom_link_t(geom: dict, mask: np.ndarray, xx, yy, ex: int, ey: int,
                 _phi_cache: dict = None) -> np.ndarray:
    shape = str(geom.get("shape", "cylinder"))
    if shape == "cylinder":
        return _link_t_cylinder(
            geom, xx - float(geom["cx"]), yy - float(geom["cy"]), ex, ey
        )
    if shape == "polygon":
        return _link_t_polygon(np.asarray(geom["vertices"]), xx, yy, ex, ey)
    if shape == "rect":
        from ..tools.shapes import rect_points_f

        verts = rect_points_f(
            float(geom["cx"]), float(geom["cy"]), float(geom["w"]),
            float(geom["h"]), float(geom.get("angle_deg", 0.0)),
        )
        return _link_t_polygon(verts, xx, yy, ex, ey)
    if shape == "triangle":
        from ..tools.shapes import triangle_points_f

        verts = triangle_points_f(
            float(geom["cx"]), float(geom["cy"]), float(geom["size"]),
            float(geom.get("angle_deg", 0.0)),
            geom.get("orientation", "vertex_left"),
        )
        return _link_t_polygon(verts, xx, yy, ex, ey)
    if shape == "union":
        t = np.full(xx.shape, np.inf)
        for part in geom["parts"]:
            t = np.minimum(
                t, _geom_link_t(part, mask, xx, yy, ex, ey, _phi_cache)
            )
        return t
    if shape == "sdf":
        if _phi_cache is not None and "phi" in _phi_cache:
            phi = _phi_cache["phi"]
        else:
            phi = signed_distance(mask)
            if _phi_cache is not None:
                _phi_cache["phi"] = phi
        return _link_t_sdf(phi, xx, yy, ex, ey)
    raise ValueError(f"unsupported obstacle_geometry {geom!r}")


def bouzidi_q_planes(
    mask: np.ndarray, geom: Optional[dict] = None, dtype=np.float32
) -> np.ndarray:
    """[8, H, W] sub-grid wall fractions for Bouzidi interpolated bounce-back.

    Plane j-1 (j = 1..8) holds, for every fluid cell c whose +e_j neighbor
    is solid, the smallest t in (0, 1] with c + t e_j on the wall surface.
    Cells where the fraction is undefined (no root -- staircase mask
    corners -- or a q < 1/2 link whose upstream interpolation cell c - e_j
    is itself solid, which the two-point formula needs fluid) fall back to
    q = 1/2, where the scheme reduces exactly to half-way bounce-back.

    ``geom`` (lattice cell-center coordinates) describes the ANALYTIC
    surface; the full production shape menu of tools/map_generators.py is
    covered:

    * ``{"shape": "cylinder", "cx", "cy", "r"}``
    * ``{"shape": "rect", "cx", "cy", "w", "h", "angle_deg"}`` (rotated
      rectangle, cv2.boxPoints convention -- tools/shapes.rect_points_f)
    * ``{"shape": "triangle", "cx", "cy", "size", "angle_deg",
      "orientation"}`` (equilateral, tools/shapes.triangle_points_f)
    * ``{"shape": "polygon", "vertices": [[x, y], ...]}``
    * ``{"shape": "union", "parts": [geom, ...]}`` (composite fields;
      q = min over parts)
    * ``{"shape": "sdf"}`` or ``geom=None``: no analytic description --
      the surface is the zero level of the bilinearly-interpolated signed
      distance of the mask itself (exact q = 1/2 on flat staircase walls,
      smoothed fractions on oblique/curved ones)
    """
    if geom is None:
        geom = {"shape": "sdf"}
    solid = np.asarray(mask) > 0.5
    h, w = solid.shape
    yy, xx = np.mgrid[0:h, 0:w]
    xx = xx.astype(np.float64)
    yy = yy.astype(np.float64)

    def shifted_solid(ddy, ddx):
        """solid[y + ddy, x + ddx], out-of-bounds -> True (treat the domain
        edge like a wall so no formula reaches past it)."""
        out = np.ones_like(solid)
        ys = slice(max(0, -ddy), min(h, h - ddy))
        xs = slice(max(0, -ddx), min(w, w - ddx))
        out[ys, xs] = solid[
            max(0, ddy) : max(0, ddy) + (ys.stop - ys.start),
            max(0, ddx) : max(0, ddx) + (xs.stop - xs.start),
        ]
        return out

    phi_cache: dict = {}
    q = np.full((8, h, w), 0.5, np.float64)
    for j in range(1, 9):
        ex, ey = int(E[j, 0]), int(E[j, 1])
        link = (~solid) & shifted_solid(ey, ex)  # fluid c, solid c + e_j
        t = _geom_link_t(geom, mask, xx, yy, ex, ey, phi_cache)
        t = np.where(np.isfinite(t), t, 0.5)  # no root -> half-way fallback
        # the q < 1/2 two-point formula interpolates with cell c - e_j;
        # if that cell is solid the link degrades to half-way
        behind_solid = shifted_solid(-ey, -ex)
        t = np.where((t < 0.5) & behind_solid, 0.5, t)
        # no lower clamp: only the q >= 1/2 branch divides by q, and the
        # two-point q < 1/2 formula is well-behaved down to q -> 0
        q[j - 1] = np.where(link, t, 0.5)
    return q.astype(dtype)


def init_state(ny: int, nx: int, dtype=jnp.float32) -> LBMState:
    """rho = 1, u = 0, f = f_post = equilibrium (LBM2D_MRT_LES.py:235-241)."""
    rho = jnp.ones((ny, nx), dtype)
    u = jnp.zeros((2, ny, nx), dtype)
    f = f_eq(rho, u[0], u[1])
    return LBMState(f=f, f_post=f, rho=rho, u=u, step=jnp.asarray(0, jnp.int32))


# ---------------------------------------------------------------------------
# Collision + streaming (interior physics)
# ---------------------------------------------------------------------------


def pull_stream(f: jnp.ndarray) -> jnp.ndarray:
    """Pull streaming via circular shifts: f_k(y, x) <- f_k(y - ey, x - ex).

    Wrap-around values land only on the boundary ring, which the caller
    discards (the reference collides the interior only, :245).
    """
    return jnp.stack(
        [jnp.roll(f[k], (int(E[k, 1]), int(E[k, 0])), axis=(0, 1)) for k in range(9)]
    )


def pull_stream_halo(f_halo: jnp.ndarray) -> jnp.ndarray:
    """Pull streaming from a halo-padded block [9, h+2, w+2] -> [9, h, w].

    Pure slicing (no wrap-around): used by the sharded multi-chip step where
    the halo ring was filled by neighbor exchange.
    """
    h = f_halo.shape[-2] - 2
    w = f_halo.shape[-1] - 2
    return jnp.stack(
        [
            f_halo[
                k,
                1 - int(E[k, 1]) : 1 - int(E[k, 1]) + h,
                1 - int(E[k, 0]) : 1 - int(E[k, 0]) + w,
            ]
            for k in range(9)
        ]
    )


def mrt_collide_arrays(fs, damping, tau0, cs_factor, s_ghost, use_les: bool):
    """MRT-LES collision of a post-streaming field fs [9, ...], plain arrays.

    Shared by the jnp path, the shard_map path, and the Pallas kernel body.
    Returns (f_post, rho, ux, uy).

    Algebraically identical to m* = m - S (m - m_eq); f_post = M^-1 m*, but
    computed incrementally: since M^-1 m = fs, f_post = fs - M^-1 S (m - m_eq)
    where S d has only six nonzero rows (1,2,4,6 ghost; 7,8 stress). Together
    with butterfly-factored forward moments this roughly halves the VPU work
    of the naive two-transform formulation (the hot-kernel bottleneck).
    Matches the reference update (LBM2D_MRT_LES.py:243-420) to fp reordering.
    """
    dtype = fs.dtype
    f0, f1, f2, f3, f4, f5, f6, f7, f8 = (fs[k] for k in range(9))

    # butterfly forward moments (Lallemand-Luo rows, exact integer combos)
    s13 = f1 + f3
    s24 = f2 + f4
    d13 = f1 - f3
    d24 = f2 - f4
    s56 = f5 + f6
    s78 = f7 + f8
    d56 = f5 - f6
    d78 = f7 - f8
    s1324 = s13 + s24
    s5678 = s56 + s78
    rho = f0 + s1324 + s5678  # m0
    m1 = 2.0 * s5678 - s1324 - 4.0 * f0  # energy e
    m2 = 4.0 * f0 - 2.0 * s1324 + s5678  # epsilon
    a_d = d56 - d78
    b_s = s56 - s78
    m3 = d13 + a_d  # jx
    m4 = a_d - 2.0 * d13  # qx
    m5 = d24 + b_s  # jy
    m6 = b_s - 2.0 * d24  # qy
    m7 = s13 - s24  # pxx
    m8 = d56 + d78  # pxy

    inv_rho = jnp.where(rho > 0, 1.0 / jnp.where(rho > 0, rho, 1.0), 0.0)
    ux = m3 * inv_rho
    uy = m5 * inv_rho

    # non-equilibrium moments for the six relaxed rows (m_eq of :221-233)
    uxx = ux * ux
    uyy = uy * uy
    u2 = uxx + uyy
    rux = rho * ux
    ruy = rho * uy
    d1 = m1 - rho * (-2.0 + 3.0 * u2)
    d2 = m2 - rho * (1.0 - 3.0 * u2)
    d4 = m4 + rux  # meq4 = -rho ux
    d6 = m6 + ruy  # meq6 = -rho uy
    d7 = m7 - rho * (uxx - uyy)
    d8 = m8 - rux * uy

    # Smagorinsky LES: tau_eff from the non-equilibrium stress norm
    # sqrt(2 d7^2 + 2 d8^2) (LBM2D_MRT_LES.py:334-351).
    tau0 = tau0.astype(dtype)
    if use_les:
        neq_norm = jnp.sqrt(2.0 * d7 * d7 + 2.0 * d8 * d8)
        term = tau0 * tau0 + cs_factor.astype(dtype) * neq_norm * inv_rho
        tau_eff = tau0 + 0.5 * (jnp.sqrt(term) - tau0)
    else:
        tau_eff = jnp.broadcast_to(tau0, rho.shape)
    tau_eff = tau_eff + damping
    s_eff = 1.0 / tau_eff

    sg = s_ghost.astype(dtype)
    sd1 = sg * d1
    sd2 = sg * d2
    sd4 = sg * d4
    sd6 = sg * d6
    sd7 = s_eff * d7
    sd8 = s_eff * d8

    # f_post = fs - (36 M^-1) (S d) / 36, butterfly-factored per column block
    t0 = (sd2 - sd1) * (4.0 / 36.0)
    ta = -(sd1 + 2.0 * sd2) * (1.0 / 36.0)
    td = (2.0 * sd1 + sd2) * (1.0 / 36.0)
    u4 = sd4 * (6.0 / 36.0)
    u6 = sd6 * (6.0 / 36.0)
    u7 = sd7 * (9.0 / 36.0)
    u8 = sd8 * (9.0 / 36.0)
    v4 = sd4 * (3.0 / 36.0)
    v6 = sd6 * (3.0 / 36.0)

    f_post = jnp.stack(
        [
            f0 - t0,
            f1 - (ta - u4 + u7),
            f2 - (ta - u6 - u7),
            f3 - (ta + u4 + u7),
            f4 - (ta + u6 - u7),
            f5 - (td + v4 + v6 + u8),
            f6 - (td - v4 + v6 - u8),
            f7 - (td - v4 - v6 + u8),
            f8 - (td + v4 - v6 - u8),
        ]
    )
    return f_post, rho, ux, uy


def mrt_collide(fs: jnp.ndarray, p: CaseParams, damping: jnp.ndarray = None):
    """MRT-LES collision with params taken from a CaseParams pytree."""
    return mrt_collide_arrays(
        fs,
        p.damping if damping is None else damping,
        p.tau0,
        p.cs_factor,
        p.s_ghost,
        p.use_les,
    )


def collide_stream_full(f: jnp.ndarray, p: CaseParams):
    """Fused pull-stream + MRT-LES collision over the full grid (jnp path)."""
    fs = pull_stream(f)
    if p.halfway_obstacle:
        # Half-way bounce-back: a pull whose source cell is solid instead
        # returns this cell's own opposite population from the previous
        # post-collision field -- the wall sits midway along the link.
        # Applied uniformly from the geometric neighbor-solid predicate
        # (including on solid cells, whose f is overwritten afterwards) so
        # the jnp and Pallas paths stay bitwise-identical.
        solid = p.mask > 0.5
        planes = [fs[0]]
        for k in range(1, 9):
            ex, ey = int(E[k, 0]), int(E[k, 1])
            nb_solid = shift2d(solid, -ey, -ex, False)
            planes.append(jnp.where(nb_solid, f[int(OPP[k])], fs[k]))
        fs = jnp.stack(planes)
    if p.bouzidi_obstacle:
        # Bouzidi-Firdaouss-Lallemand linear interpolated bounce-back: the
        # wall sits at fraction q along the outgoing link j = opp(k) (from
        # this cell toward the solid pull source c - e_k).  With f = the
        # previous post-collision field and q from CaseParams.bouzidi_q:
        #   q < 1/2:  f_k <- 2q f_j(c) + (1 - 2q) f_j(c + e_k)
        #   q >= 1/2: f_k <- f_j(c)/(2q) + (2q - 1)/(2q) f_k(c)
        # q = 1/2 gives f_j(c) exactly -- the half-way scheme -- so plain
        # masks (q planes all 1/2) stay bitwise-identical to half-way.
        solid = p.mask > 0.5
        planes = [fs[0]]
        for k in range(1, 9):
            ex, ey = int(E[k, 0]), int(E[k, 1])
            j = int(OPP[k])
            nb_solid = shift2d(solid, -ey, -ex, False)
            q = p.bouzidi_q[j - 1]
            f_j = f[j]
            f_j_up = shift2d(f[j], ey, ex, 0.0)  # f_j at c + e_k = c - e_j
            lo = 2.0 * q * f_j + (1.0 - 2.0 * q) * f_j_up
            hi = f_j / (2.0 * q) + (2.0 * q - 1.0) / (2.0 * q) * f[k]
            planes.append(
                jnp.where(nb_solid, jnp.where(q < 0.5, lo, hi), fs[k])
            )
        fs = jnp.stack(planes)
    f_post, rho, ux, uy = mrt_collide(fs, p)
    if p.bounce_obstacle:
        # Full-way bounce-back replaces collision on solid cells: the
        # streamed-in populations leave reversed next step (archive/lbm_mrt/
        # solver.py:181-195).  Macro fields on solid cells are zeroed by
        # _apply_obstacle afterwards.
        solid = p.mask > 0.5
        f_bb = jnp.stack([fs[int(OPP[k])] for k in range(9)])
        f_post = jnp.where(solid[None], f_bb, f_post)
    return f_post, rho, ux, uy


# ---------------------------------------------------------------------------
# Boundary conditions (apply_bc, LBM2D_MRT_LES.py:438-550)
# ---------------------------------------------------------------------------


def _feq_cols(rho, ux, uy):
    """f_eq for a 1-D strip of boundary cells -> [9, N]."""
    return f_eq(rho, ux, uy)


def bc_left_values(fn, rho_nb, uxn, uyn, ramp, t, rho_in, u_prof=None):
    """West-edge BC values from the neighbor strip; None if no-op.

    ``t`` is the static bc type, ``rho_in`` the (traced) target density,
    ``u_prof`` the per-row velocity profile (BC_VEL_INLET only).
    Returns (fb, rho_b, ux_b, uy_b), each [9, N] / [N].
    """
    dtype = fn.dtype
    if t == BC_VEL_INLET:
        # Prescribed-velocity equilibrium inlet (archive/lbm_mrt/
        # solver.py:246-257): rho = 1, u = ramped profile, f = f_eq(1, u).
        ux = u_prof.astype(dtype) * ramp
        uy = jnp.zeros_like(ux)
        rho_b = jnp.ones_like(rho_nb)
        fb = f_eq_unit_x(ux)  # == f_eq(rho=1, ux, 0)
        return fb, rho_b, ux, uy
    if t == BC_VEL_INLET_NEBB:
        # Profiled-velocity NEBB inlet: u = ramped profile, rho from the
        # neighbor, f = f_eq(rho_nb, u) + (f_nb - f_eq(rho_nb, u_nb)).
        ux = u_prof.astype(dtype) * ramp
        uy = jnp.zeros_like(ux)
        fb = rho_nb * (f_eq_unit_x(ux) - f_eq_unit(uxn, uyn)) + fn
        return fb, rho_nb, ux, uy
    if t == BC_INLET:
        # Zou-He pressure inlet using the *neighbor's* post-stream f
        # (LBM2D_MRT_LES.py:460-486), with warmup-ramped target density.
        rho_c = 1.0 + (rho_in.astype(dtype) - 1.0) * ramp
        rho_b = rho_c * jnp.ones_like(rho_nb)
        ux = 1.0 - (fn[0] + fn[2] + fn[4] + 2.0 * (fn[3] + fn[6] + fn[7])) / rho_c
        uy = jnp.zeros_like(ux)
        feq = rho_c * f_eq_unit_x(ux)  # f_eq linear in rho, uy = 0
        f1 = fn[3] + (2.0 / 3.0) * rho_c * ux
        f5 = fn[7] - 0.5 * (fn[2] - fn[4]) + (1.0 / 6.0) * rho_c * ux
        f8 = fn[6] + 0.5 * (fn[2] - fn[4]) + (1.0 / 6.0) * rho_c * ux
        # stacked (not .at[].set) so the same code lowers inside Pallas
        fb = jnp.stack(
            [feq[0], f1, feq[2], feq[3], feq[4], f5, feq[6], feq[7], f8]
        )
        return fb, rho_b, ux, uy
    if t == BC_FREE_SLIP:
        # Vertical wall: normal (x) velocity zeroed, tangential (y) kept.
        ux = jnp.zeros_like(uxn)
        uy = uyn
        fb = rho_nb * (f_eq_unit_y(uyn) - f_eq_unit(uxn, uyn)) + fn
        return fb, rho_nb, ux, uy
    # Type 1 on the left edge is a no-op in the reference (:494 guard).
    return None


def bc_right_values(fn, rho_nb, uxn, uyn, ramp, t, rho_out, bc_val):
    """East-edge BC values from the neighbor strip; None if no-op.

    ``bc_val`` is the side's [2] velocity value (used by the type-0 branch).
    """
    dtype = fn.dtype
    if t == BC_OUTLET:
        # Zou-He pressure outlet with zero-gradient backflow guard
        # (LBM2D_MRT_LES.py:494-527).
        rho_o = rho_out.astype(dtype)
        ux = -1.0 + (fn[0] + fn[2] + fn[4] + 2.0 * (fn[1] + fn[5] + fn[8])) / rho_o
        backflow = ux < 0.0
        rho_b = rho_o * jnp.ones_like(rho_nb)
        feq = rho_o * f_eq_unit_x(ux)  # uy = 0 specialization
        f3 = fn[1] - (2.0 / 3.0) * rho_o * ux
        f6 = fn[8] - 0.5 * (fn[2] - fn[4]) - (1.0 / 6.0) * rho_o * ux
        f7 = fn[5] + 0.5 * (fn[2] - fn[4]) - (1.0 / 6.0) * rho_o * ux
        fz = jnp.stack(
            [feq[0], feq[1], feq[2], f3, feq[4], feq[5], f6, f7, feq[8]]
        )
        # f_eq is linear in rho: f_eq(a,u) - f_eq(b,u) = (a-b) g(u)
        fbf = (rho_o - rho_nb) * f_eq_unit(uxn, uyn) + fn
        fb = jnp.where(backflow[None], fbf, fz)
        ux_b = jnp.where(backflow, uxn, ux)
        uy_b = jnp.where(backflow, uyn, jnp.zeros_like(uyn))
        return fb, rho_b, ux_b, uy_b
    if t == BC_INLET:
        # Non-west inlet: prescribed-velocity NEBB (LBM2D_MRT_LES.py:487-492).
        v = bc_val.astype(dtype) * ramp
        ux_b = v[0] * jnp.ones_like(uxn)
        uy_b = v[1] * jnp.ones_like(uyn)
        fb = rho_nb * (f_eq_unit(ux_b, uy_b) - f_eq_unit(uxn, uyn)) + fn
        return fb, rho_nb, ux_b, uy_b
    if t == BC_FREE_SLIP:
        ux_b = jnp.zeros_like(uxn)
        uy_b = uyn
        fb = rho_nb * (f_eq_unit_y(uyn) - f_eq_unit(uxn, uyn)) + fn
        return fb, rho_nb, ux_b, uy_b
    return None


def bc_horizontal_values(fn, rho_nb, uxn, uyn, ramp, t, bc_val):
    """Top/bottom-row BC values; None if no-op.

    Only free-slip (type 2) and velocity-inlet (type 0) are meaningful here;
    type 1 is a no-op away from x = nx-1 and is treated as a full no-op.
    """
    dtype = fn.dtype
    if t == BC_FREE_SLIP:
        # Horizontal wall: tangential (x) kept, normal (y) zeroed.
        ux_b = uxn
        uy_b = jnp.zeros_like(uyn)
        g_b = f_eq_unit_x(uxn)  # uy = 0 specialization
    elif t == BC_INLET:
        v = bc_val.astype(dtype) * ramp
        ux_b = v[0] * jnp.ones_like(uxn)
        uy_b = v[1] * jnp.ones_like(uyn)
        g_b = f_eq_unit(ux_b, uy_b)
    else:
        return None
    fb = rho_nb * (g_b - f_eq_unit(uxn, uyn)) + fn
    return fb, rho_nb, ux_b, uy_b


def _apply_left(f, rho, u, ramp, p: CaseParams):
    """West edge x=0, rows y=1..ny-2, neighbor x=1."""
    prof = None if p.inlet_profile is None else p.inlet_profile[1:-1]
    vals = bc_left_values(
        f[:, 1:-1, 1], rho[1:-1, 1], u[0, 1:-1, 1], u[1, 1:-1, 1], ramp,
        p.bc_type[SIDE_LEFT], p.rho_in, u_prof=prof,
    )
    if vals is None:
        return f, rho, u
    fb, rho_b, ux_b, uy_b = vals
    f = f.at[:, 1:-1, 0].set(fb)
    rho = rho.at[1:-1, 0].set(rho_b)
    u = u.at[0, 1:-1, 0].set(ux_b)
    u = u.at[1, 1:-1, 0].set(uy_b)
    return f, rho, u


def _apply_right(f, rho, u, ramp, p: CaseParams):
    """East edge x=nx-1, rows y=1..ny-2, neighbor x=nx-2."""
    vals = bc_right_values(
        f[:, 1:-1, -2], rho[1:-1, -2], u[0, 1:-1, -2], u[1, 1:-1, -2], ramp,
        p.bc_type[SIDE_RIGHT], p.rho_out, p.bc_value[SIDE_RIGHT],
    )
    if vals is None:
        return f, rho, u
    fb, rho_b, ux_b, uy_b = vals
    f = f.at[:, 1:-1, -1].set(fb)
    rho = rho.at[1:-1, -1].set(rho_b)
    u = u.at[0, 1:-1, -1].set(ux_b)
    u = u.at[1, 1:-1, -1].set(uy_b)
    return f, rho, u


def _apply_horizontal(f, rho, u, ramp, p: CaseParams, side: int):
    """Top (y=ny-1) / bottom (y=0) rows over ALL x, neighbor one row in."""
    row, nbr = (-1, -2) if side == SIDE_TOP else (0, 1)
    vals = bc_horizontal_values(
        f[:, nbr, :], rho[nbr, :], u[0, nbr, :], u[1, nbr, :], ramp,
        p.bc_type[side], p.bc_value[side],
    )
    if vals is None:
        return f, rho, u
    fb, rho_b, ux_b, uy_b = vals
    f = f.at[:, row, :].set(fb)
    rho = rho.at[row, :].set(rho_b)
    u = u.at[0, row, :].set(ux_b)
    u = u.at[1, row, :].set(uy_b)
    return f, rho, u


def _apply_obstacle(f, rho, u, p: CaseParams):
    """mask==1 cells: u <- 0, f <- f_eq(rho, 0) = w_k rho (:452-455).

    In bounce_obstacle mode f was already replaced by the reversed streamed
    populations inside the collide (collide_stream_full); only the macro
    no-slip zeroing remains here.
    """
    solid = p.mask > 0.5
    if not p.bounce_obstacle:
        w9 = jnp.asarray(W, f.dtype).reshape(9, 1, 1)
        f = jnp.where(solid[None], w9 * rho[None], f)
    u = jnp.where(solid[None], jnp.zeros_like(u), u)
    return f, rho, u


def apply_bc(f, rho, u, step, p: CaseParams):
    """Full BC pass in the reference's sequential order."""
    dtype = f.dtype
    progress = jnp.minimum(1.0, step.astype(dtype) / p.warmup_steps.astype(dtype))
    ramp = 1.0 - jnp.cos(jnp.asarray(0.5 * PI_REF, dtype) * progress)
    f, rho, u = _apply_left(f, rho, u, ramp, p)
    f, rho, u = _apply_right(f, rho, u, ramp, p)
    f, rho, u = _apply_horizontal(f, rho, u, ramp, p, SIDE_TOP)
    f, rho, u = _apply_horizontal(f, rho, u, ramp, p, SIDE_BOTTOM)
    f, rho, u = _apply_obstacle(f, rho, u, p)
    return f, rho, u


# ---------------------------------------------------------------------------
# Full step + chunked advance
# ---------------------------------------------------------------------------

CollideFn = Callable[[jnp.ndarray, CaseParams], Tuple[jnp.ndarray, Any, Any, Any]]


def step(state: LBMState, p: CaseParams, collide_fn: CollideFn = None) -> LBMState:
    """One lattice update (collide+stream, macro, BC)."""
    collide = collide_fn or collide_stream_full
    f_c, rho_c, ux_c, uy_c = collide(state.f, p)

    # Interior-only writes; the boundary ring keeps previous values.
    f_post = state.f_post.at[:, 1:-1, 1:-1].set(f_c[:, 1:-1, 1:-1])
    f = state.f.at[:, 1:-1, 1:-1].set(f_c[:, 1:-1, 1:-1])
    rho = state.rho.at[1:-1, 1:-1].set(rho_c[1:-1, 1:-1])
    u = state.u.at[0, 1:-1, 1:-1].set(ux_c[1:-1, 1:-1])
    u = u.at[1, 1:-1, 1:-1].set(uy_c[1:-1, 1:-1])

    new_step = state.step + 1
    f, rho, u = apply_bc(f, rho, u, new_step, p)
    return LBMState(f=f, f_post=f_post, rho=rho, u=u, step=new_step)


def shift2d(a: jnp.ndarray, dy: int, dx: int, fill=0.0) -> jnp.ndarray:
    """result[y, x] = a[y+dy, x+dx], out-of-bounds -> fill. dy,dx in {-1,0,1}."""
    h, w = a.shape[-2], a.shape[-1]
    pad = [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)]
    a2 = jnp.pad(a, pad, constant_values=fill)
    return a2[..., 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def neighbor_solid_bits(mask: jnp.ndarray) -> jnp.ndarray:
    """int32 [H, W]: bit k set iff the pull source (y - ey_k, x - ex_k) is
    solid -- the per-cell predicate the half-way Pallas kernels select on
    (precomputed once per case; the mask is static over a run)."""
    solid = mask > 0.5
    bits = jnp.zeros(mask.shape, jnp.int32)
    for k in range(1, 9):
        ex, ey = int(E[k, 0]), int(E[k, 1])
        bits = bits | (shift2d(solid, -ey, -ex, False).astype(jnp.int32) << k)
    return bits


def force_on_obstacle(f_post: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Momentum-exchange force on all solid cells -> [2] (fx, fy).

    For each solid cell and direction k with an in-bounds fluid neighbor at
    +e_k: force += 2 * f_post[OPP[k]](neighbor) * (-e_k)
    (compute_force_on_obstacle, LBM2D_MRT_LES.py:588-641).
    """
    solid = mask > 0.5
    fluid = jnp.where(solid, 0.0, 1.0).astype(f_post.dtype)
    fx = jnp.zeros((), f_post.dtype)
    fy = jnp.zeros((), f_post.dtype)
    for k in range(1, 9):
        ex, ey = int(E[k, 0]), int(E[k, 1])
        nb_fluid = shift2d(fluid, ey, ex, 0.0)
        nb_f = shift2d(f_post[int(OPP[k])], ey, ex, 0.0)
        contrib = jnp.where(solid, 2.0 * nb_f * nb_fluid, 0.0)
        s = jnp.sum(contrib)
        fx = fx + s * (-ex)
        fy = fy + s * (-ey)
    return jnp.stack([fx, fy])


def force_on_obstacle_halfway(f_post: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Momentum-exchange force for half-way bounce-back -> [2] (fx, fy).

    Each fluid cell whose +e_k neighbor is solid sends f_post[k] into the
    wall and receives it back reversed within the same step, transferring
    2 f_post[k] e_k to the obstacle (same convention as force_on_obstacle,
    summed from the fluid side because the wall cells never hold valid
    populations in the half-way scheme).
    """
    solid = mask > 0.5
    fx = jnp.zeros((), f_post.dtype)
    fy = jnp.zeros((), f_post.dtype)
    for k in range(1, 9):
        ex, ey = int(E[k, 0]), int(E[k, 1])
        nb_solid = shift2d(solid, ey, ex, False)
        s = jnp.sum(
            jnp.where((~solid) & nb_solid, 2.0 * f_post[k], 0.0)
        )
        fx = fx + s * ex
        fy = fy + s * ey
    return jnp.stack([fx, fy])


def force_on_obstacle_bouzidi(
    f_post: jnp.ndarray, mask: jnp.ndarray, q_planes: jnp.ndarray
) -> jnp.ndarray:
    """Momentum-exchange force for Bouzidi interpolated bounce-back -> [2].

    Per boundary link (fluid c, solid c + e_j): the wall absorbs the
    outgoing post-collision population f_j(c) and emits the interpolated
    return f_ret (the same formulas the streaming step applies), so the
    exchanged momentum is (f_j + f_ret) e_j.  At q = 1/2 f_ret = f_j and
    this reduces to force_on_obstacle_halfway's 2 f_j e_j.
    """
    solid = mask > 0.5
    fx = jnp.zeros((), f_post.dtype)
    fy = jnp.zeros((), f_post.dtype)
    for j in range(1, 9):
        ex, ey = int(E[j, 0]), int(E[j, 1])
        k = int(OPP[j])
        nb_solid = shift2d(solid, ey, ex, False)
        q = q_planes[j - 1]
        f_j = f_post[j]
        f_j_up = shift2d(f_post[j], -ey, -ex, 0.0)  # f_j at c - e_j
        lo = 2.0 * q * f_j + (1.0 - 2.0 * q) * f_j_up
        hi = f_j / (2.0 * q) + (2.0 * q - 1.0) / (2.0 * q) * f_post[k]
        f_ret = jnp.where(q < 0.5, lo, hi)
        s = jnp.sum(
            jnp.where((~solid) & nb_solid, f_j + f_ret, 0.0)
        )
        fx = fx + s * ex
        fy = fy + s * ey
    return jnp.stack([fx, fy])


def obstacle_force(
    f_post: jnp.ndarray, p: CaseParams, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Momentum-exchange force with the scheme matching the obstacle mode.

    ``mask`` overrides ``p.mask`` (e.g. to measure the cylinder alone while
    no-slip wall cells are also solid, DFG validation)."""
    m = p.mask if mask is None else mask
    if p.bouzidi_obstacle:
        return force_on_obstacle_bouzidi(f_post, m, p.bouzidi_q)
    if p.halfway_obstacle:
        return force_on_obstacle_halfway(f_post, m)
    return force_on_obstacle(f_post, m)


def max_velocity(u: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.sqrt(u[0] * u[0] + u[1] * u[1]))


@functools.partial(jax.jit, static_argnames=("n_steps", "collide_fn"))
def run_chunk(state: LBMState, p: CaseParams, n_steps: int, collide_fn=None):
    """Advance n_steps on device; return (state, monitors).

    monitors = {"force": [2], "max_v": scalar} computed from the final step's
    f_post / u, matching the reference loop's per-chunk host reads
    (simulation_ops.py:101-103).
    """

    def body(s, _):
        return step(s, p, collide_fn), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    monitors = {
        "force": obstacle_force(state.f_post, p),
        "max_v": max_velocity(state.u),
    }
    return state, monitors


def moments_output(state: LBMState) -> jnp.ndarray:
    """[9, H, W] MRT moments of f_post, for dataset export."""
    return moments_from_f(state.f_post)
