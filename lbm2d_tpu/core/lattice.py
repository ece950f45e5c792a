"""D2Q9 lattice constants and equilibrium functions (TPU-native JAX).

Physics semantics match the reference MRT-LES solver
(/root/reference/src/lbm_mrt_les/core/LBM2D_MRT_LES.py:131-233): the
Lallemand-Luo 9x9 moment matrix, its inverse, the D2Q9 velocity set and
weights, the velocity-space equilibrium f_eq and the moment-space
equilibrium m_eq.

Array layout convention for this framework (differs from the reference on
purpose): fields are channel-major ``[9, H, W]`` indexed ``[k, y, x]`` so the
x axis sits in the TPU lane dimension. The reference uses Taichi
``Vector.field(9)[nx, ny]`` indexed ``[x, y]``; the two agree under a single
transpose performed at the mask/IO boundary.

Moment ordering (Lallemand & Luo 2000):
    0 rho, 1 e, 2 eps, 3 jx, 4 qx, 5 jy, 6 qy, 7 pxx, 8 pxy
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Discrete velocity set e_k = (ex, ey). Index k: 0 rest, 1 E, 2 N, 3 W, 4 S,
# 5 NE, 6 NW, 7 SW, 8 SE.
E = np.array(
    [
        [0, 0],
        [1, 0],
        [0, 1],
        [-1, 0],
        [0, -1],
        [1, 1],
        [-1, 1],
        [-1, -1],
        [1, -1],
    ],
    dtype=np.int32,
)

# Opposite-direction index: OPP[k] is the k' with e_{k'} = -e_k.
OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6], dtype=np.int32)

# Quadrature weights (stored f64; cast to the compute dtype at use sites).
W = np.array(
    [4.0 / 9.0] + [1.0 / 9.0] * 4 + [1.0 / 36.0] * 4,
    dtype=np.float64,
)

# Lallemand-Luo moment transform, rows are (rho, e, eps, jx, qx, jy, qy,
# pxx, pxy) in terms of f_0..f_8.
M = np.array(
    [
        [1, 1, 1, 1, 1, 1, 1, 1, 1],
        [-4, -1, -1, -1, -1, 2, 2, 2, 2],
        [4, -2, -2, -2, -2, 1, 1, 1, 1],
        [0, 1, 0, -1, 0, 1, -1, -1, 1],
        [0, -2, 0, 2, 0, 1, -1, -1, 1],
        [0, 0, 1, 0, -1, 1, 1, -1, -1],
        [0, 0, -2, 0, 2, 1, 1, -1, -1],
        [0, 1, -1, 1, -1, 0, 0, 0, 0],
        [0, 0, 0, 0, 0, 1, -1, 1, -1],
    ],
    dtype=np.float64,
)

M_INV = np.linalg.inv(M)

M_F32 = M.astype(np.float32)
M_INV_F32 = M_INV.astype(np.float32)

# The reference ramps the inlet with this truncated literal for pi
# (LBM2D_MRT_LES.py:443); we keep the identical constant so warmup ramps
# agree bit-for-bit in f32.
PI_REF = 3.14159265


def f_eq(rho, ux, uy):
    """Velocity-space equilibrium over any grid shape.

    rho, ux, uy: arrays of identical shape S. Returns [9, *S].
    f_eq_k = w_k * rho * (1 + 3 e.u + 4.5 (e.u)^2 - 1.5 u.u)

    Built per-channel from Python-float coefficients (no captured [9]
    constant arrays) so it is directly usable inside Pallas kernel bodies;
    bitwise-identical to the broadcast formulation.
    """
    usq = ux * ux + uy * uy
    comps = []
    for k in range(9):
        ex, ey, w = float(E[k, 0]), float(E[k, 1]), float(W[k])
        # keep the reference's evaluation order ((1 + 3eu) + 4.5eu^2) - 1.5u^2
        if ex == 0 and ey == 0:
            inner = 1.0 - 1.5 * usq
        else:
            if ey == 0:
                eu = ex * ux
            elif ex == 0:
                eu = ey * uy
            else:
                eu = ex * ux + ey * uy
            inner = 1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * usq
        comps.append(w * rho * inner)
    return jnp.stack(comps)


def f_eq_unit(ux, uy):
    """f_eq / rho: the equilibrium's velocity factor g_k(u), [9, *S].

    f_eq is linear in rho, so boundary formulas of the form
    f_eq(a, u) - f_eq(b, u) collapse to (a - b) * g(u) -- one evaluation
    instead of two (hot-kernel BC cost).
    """
    usq = ux * ux + uy * uy
    comps = []
    for k in range(9):
        ex, ey, w = float(E[k, 0]), float(E[k, 1]), float(W[k])
        if ex == 0 and ey == 0:
            inner = 1.0 - 1.5 * usq
        else:
            if ey == 0:
                eu = ex * ux
            elif ex == 0:
                eu = ey * uy
            else:
                eu = ex * ux + ey * uy
            inner = 1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * usq
        comps.append(w * inner)
    return jnp.stack(comps)


def f_eq_unit_x(ux):
    """g_k(ux, 0): only three distinct inner values (e_x in {-1, 0, +1}),
    bitwise-equal to f_eq_unit(ux, 0) at a third of the arithmetic."""
    usq = ux * ux
    inner0 = 1.0 - 1.5 * usq
    innp = 1.0 + 3.0 * ux + 4.5 * ux * ux - 1.5 * usq
    neg = -ux
    innm = 1.0 + 3.0 * neg + 4.5 * neg * neg - 1.5 * usq
    by_ex = {0: inner0, 1: innp, -1: innm}
    return jnp.stack([float(W[k]) * by_ex[int(E[k, 0])] for k in range(9)])


def f_eq_unit_y(uy):
    """g_k(0, uy): three distinct inner values along e_y."""
    usq = uy * uy
    inner0 = 1.0 - 1.5 * usq
    innp = 1.0 + 3.0 * uy + 4.5 * uy * uy - 1.5 * usq
    neg = -uy
    innm = 1.0 + 3.0 * neg + 4.5 * neg * neg - 1.5 * usq
    by_ey = {0: inner0, 1: innp, -1: innm}
    return jnp.stack([float(W[k]) * by_ey[int(E[k, 1])] for k in range(9)])


def m_eq(rho, ux, uy):
    """Moment-space equilibrium, shape [9, *S] (LBM2D_MRT_LES.py:221-233)."""
    u2 = ux * ux + uy * uy
    return jnp.stack(
        [
            rho,
            rho * (-2.0 + 3.0 * u2),
            rho * (1.0 - 3.0 * u2),
            rho * ux,
            -rho * ux,
            rho * uy,
            -rho * uy,
            rho * (ux * ux - uy * uy),
            rho * ux * uy,
        ]
    )


# 36 * M_INV has exact small-integer entries; verify once at import.
M_INV_X36 = np.round(M_INV * 36.0).astype(np.int64)
assert np.abs(M_INV_X36 / 36.0 - M_INV).max() < 1e-12


def _int_combo(coeffs_int: np.ndarray, rows, scale: float = 1.0):
    """Apply an integer-coefficient 9x9 matrix to 9 stacked planes.

    Deliberately NOT a matmul: a 9x9 contraction per cell would hit the MXU,
    whose default f32 input precision on TPU is bfloat16 -- a ~1e-3 error on
    rho that breaks the Zou-He pressure physics (observed on hardware).
    Integer adds/subtracts on the VPU are exact in f32 and faster for this
    shape. ``rows`` is a list/stack of the 9 input planes.
    """
    outs = []
    for r in range(9):
        acc = None
        for c in range(9):
            k = int(coeffs_int[r, c])
            if k == 0:
                continue
            term = rows[c] if k == 1 else (-rows[c] if k == -1 else k * rows[c])
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(rows[0])
        if scale != 1.0:  # scale is a static Python float
            acc = acc * jnp.asarray(scale, acc.dtype)
        outs.append(acc)
    return jnp.stack(outs)


def moments_from_f(f):
    """Project f [9, ...] to MRT moment space [9, ...] (m = M f), exactly.

    Matches compute_moments_for_output (LBM2D_MRT_LES.py:667-737).
    """
    return _int_combo(M.astype(np.int64), [f[k] for k in range(9)])


def f_from_moments(m_star):
    """Inverse transform f = (1/36) * (36 M^-1) m -- exact in any dtype."""
    return _int_combo(M_INV_X36, [m_star[k] for k in range(9)], scale=1.0 / 36.0)
