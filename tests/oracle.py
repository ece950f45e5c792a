"""Scalar-loop NumPy oracle for the D2Q9 MRT-LES update.

An independent, deliberately-naive re-derivation of the reference physics
spec (SURVEY.md section 3.2) used as the golden model for unit tests. It uses
the reference's [x, y] index convention (i = x, j = y) so tests also exercise
the layout transpose of the JAX build. Tiny grids only -- O(nx*ny*81) Python
loops per step.
"""

import math

import numpy as np

E = np.array(
    [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1], [1, 1], [-1, 1], [-1, -1], [1, -1]],
    dtype=np.int64,
)
W9 = np.array([4 / 9] + [1 / 9] * 4 + [1 / 36] * 4)
OPP9 = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6], dtype=np.int64)
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
PI_REF = 3.14159265


class OracleLBM:
    """Reference-exact D2Q9 MRT-LES, arrays indexed [x, y] like the Taichi code."""

    def __init__(self, cfg, mask_xy=None, dtype=np.float64):
        sim = cfg["simulation"]
        self.nx, self.ny = sim["nx"], sim["ny"]
        self.dtype = dtype
        self.tau0 = 3.0 * sim["nu"] + 0.5
        self.cs = sim["smagorinsky_constant"]
        self.cs_factor = 18.0 * self.cs**2
        self.s_ghost = sim["ghost_moments_s"]
        self.rho_in = sim["rho_in"]
        self.rho_out = sim["rho_out"]
        self.warmup = sim["warmup_steps"]
        self.bc_type = list(cfg["boundary_condition"]["type"])
        self.bc_value = np.array(cfg["boundary_condition"]["value"], dtype=np.float64)
        # DFG validation modes (framework extensions; archive/lbm_mrt spec)
        obstacle = cfg["boundary_condition"].get("obstacle", "equilibrium")
        self.bounce = obstacle == "bounce_back"
        self.halfway = obstacle == "bounce_back_halfway"
        if self.bc_type[0] in (3, 4):
            u_max = float(self.bc_value[0][0])
            h = float(self.ny - 1)
            self.prof = np.array(
                [4.0 * u_max * j * (h - j) / (h * h) for j in range(self.ny)]
            )
        z = cfg["domain_zones"]
        self.w_in = max(1, z["sponge_in"])
        self.w_out = max(1, z["sponge_out"])
        self.w_top = max(1, z["sponge_top"])
        self.w_bot = max(1, z["sponge_bot"])
        self.strength = z["sponge_strength"]

        self.mask = (
            np.zeros((self.nx, self.ny)) if mask_xy is None else np.asarray(mask_xy)
        ).astype(dtype)
        self.rho = np.ones((self.nx, self.ny), dtype)
        self.vel = np.zeros((self.nx, self.ny, 2), dtype)
        self.f_old = np.zeros((self.nx, self.ny, 9), dtype)
        self.f_new = np.zeros((self.nx, self.ny, 9), dtype)
        self.frame = 0
        for i in range(self.nx):
            for j in range(self.ny):
                self.f_old[i, j] = self.f_new[i, j] = self._feq(i, j)

    def _feq(self, i, j):
        u = self.vel[i, j]
        eu = E @ u
        uv = u @ u
        return W9 * self.rho[i, j] * (1 + 3 * eu + 4.5 * eu * eu - 1.5 * uv)

    @staticmethod
    def _meq(rho, u, v):
        u2 = u * u + v * v
        return np.array(
            [
                rho,
                rho * (-2.0 + 3.0 * u2),
                rho * (1.0 - 3.0 * u2),
                rho * u,
                -rho * u,
                rho * v,
                -rho * v,
                rho * (u * u - v * v),
                rho * u * v,
            ]
        )

    def _sponge(self, i, j):
        dx = 0.0
        if i > self.nx - self.w_out:
            c = (i - (self.nx - self.w_out)) / self.w_out
            dx = self.strength * c * c
        elif i < self.w_in:
            c = (self.w_in - i) / self.w_in
            dx = self.strength * c * c
        dy = 0.0
        if j < self.w_bot:
            c = (self.w_bot - j) / self.w_bot
            dy = self.strength * c * c
        elif j > self.ny - self.w_top:
            c = (j - (self.ny - self.w_top)) / self.w_top
            dy = self.strength * c * c
        return max(dx, dy)

    def collide_and_stream(self):
        for i in range(1, self.nx - 1):
            for j in range(1, self.ny - 1):
                ft = np.empty(9)
                for k in range(9):
                    ft[k] = self.f_old[i - E[k, 0], j - E[k, 1], k]
                if self.halfway:
                    # half-way bounce-back: a pull whose source cell is solid
                    # returns this cell's own opposite previous population
                    # (applied uniformly, matching the array paths)
                    for k in range(1, 9):
                        if self.mask[i - E[k, 0], j - E[k, 1]] == 1.0:
                            ft[k] = self.f_old[i, j, OPP9[k]]
                if self.bounce and self.mask[i, j] == 1.0:
                    # full-way bounce-back: streamed-in populations leave
                    # reversed (archive/lbm_mrt/solver.py:181-195)
                    self.f_new[i, j] = ft[[0, 3, 4, 1, 2, 7, 8, 5, 6]]
                    continue
                m = M @ ft
                rho = m[0]
                u = v = 0.0
                if rho > 0:
                    u, v = m[3] / rho, m[5] / rho
                meq = self._meq(rho, u, v)
                n7, n8 = m[7] - meq[7], m[8] - meq[8]
                norm = math.sqrt(2 * n7 * n7 + 2 * n8 * n8)
                tau = self.tau0
                if self.cs > 0.001:
                    term = self.tau0**2 + self.cs_factor * norm / rho
                    tau = self.tau0 + 0.5 * (math.sqrt(term) - self.tau0)
                tau += self._sponge(i, j)
                s = np.array(
                    [0, self.s_ghost, self.s_ghost, 0, self.s_ghost, 0, self.s_ghost, 1 / tau, 1 / tau]
                )
                m_star = m - s * (m - meq)
                self.f_new[i, j] = M_INV @ m_star

    def update_macro(self):
        for i in range(1, self.nx - 1):
            for j in range(1, self.ny - 1):
                self.f_old[i, j] = self.f_new[i, j]
                rho = self.f_new[i, j].sum()
                mom = self.f_new[i, j] @ E.astype(np.float64)
                self.rho[i, j] = rho
                self.vel[i, j] = mom / rho if rho > 0 else 0.0

    def _bc_core(self, dr, ibc, jbc, inb, jnb, ramp):
        t = self.bc_type[dr]
        if t == 3 and ibc == 0:
            # profiled-velocity equilibrium inlet (archive/lbm_mrt/
            # solver.py:246-257): rho = 1, u = ramped profile, f = f_eq
            self.rho[ibc, jbc] = 1.0
            self.vel[ibc, jbc] = (self.prof[jbc] * ramp, 0.0)
            self.f_old[ibc, jbc] = self._feq(ibc, jbc)
        elif t == 4 and ibc == 0:
            # profiled-velocity NEBB inlet: u = ramped profile, rho from the
            # neighbor, f = f_eq(rho_nb, u_target) + (f_nb - f_eq(rho_nb,
            # u_nb)) -- the non-equilibrium extrapolation the reference uses
            # for its non-west velocity inlets (LBM2D_MRT_LES.py:487-492),
            # with a per-row profile. Carries the neighbor's non-equilibrium
            # part, so the prescribed velocity is actually delivered (the
            # pure-equilibrium type 3 under-imposes it by O(grad u / omega)).
            self.vel[ibc, jbc] = (self.prof[jbc] * ramp, 0.0)
            self.rho[ibc, jbc] = self.rho[inb, jnb]
            self.f_old[ibc, jbc] = (
                self._feq(ibc, jbc) - self._feq(inb, jnb) + self.f_old[inb, jnb]
            )
        elif t == 0:
            if ibc == 0:
                rho_c = 1.0 + (self.rho_in - 1.0) * ramp
                fo = self.f_old[inb, jnb]
                ux = 1.0 - (fo[0] + fo[2] + fo[4] + 2 * (fo[3] + fo[6] + fo[7])) / rho_c
                self.rho[ibc, jbc] = rho_c
                self.vel[ibc, jbc] = (ux, 0.0)
                fb = self._feq(ibc, jbc)
                fb[1] = fo[3] + (2 / 3) * rho_c * ux
                fb[5] = fo[7] - 0.5 * (fo[2] - fo[4]) + (1 / 6) * rho_c * ux
                fb[8] = fo[6] + 0.5 * (fo[2] - fo[4]) + (1 / 6) * rho_c * ux
                self.f_old[ibc, jbc] = fb
            else:
                self.vel[ibc, jbc] = self.bc_value[dr] * ramp
                self.rho[ibc, jbc] = self.rho[inb, jnb]
                self.f_old[ibc, jbc] = (
                    self._feq(ibc, jbc) - self._feq(inb, jnb) + self.f_old[inb, jnb]
                )
        elif t == 1:
            if ibc == self.nx - 1:
                rho_o = self.rho_out
                fo = self.f_old[inb, jnb]
                ux = -1.0 + (fo[0] + fo[2] + fo[4] + 2 * (fo[1] + fo[5] + fo[8])) / rho_o
                if ux < 0.0:
                    self.vel[ibc, jbc] = self.vel[inb, jnb]
                    self.rho[ibc, jbc] = rho_o
                    self.f_old[ibc, jbc] = (
                        self._feq(ibc, jbc) - self._feq(inb, jnb) + self.f_old[inb, jnb]
                    )
                else:
                    self.rho[ibc, jbc] = rho_o
                    self.vel[ibc, jbc] = (ux, 0.0)
                    fb = self._feq(ibc, jbc)
                    fb[3] = fo[1] - (2 / 3) * rho_o * ux
                    fb[6] = fo[8] - 0.5 * (fo[2] - fo[4]) - (1 / 6) * rho_o * ux
                    fb[7] = fo[5] + 0.5 * (fo[2] - fo[4]) - (1 / 6) * rho_o * ux
                    self.f_old[ibc, jbc] = fb
        elif t == 2:
            if ibc == inb:  # horizontal wall (top/bottom)
                self.vel[ibc, jbc, 0] = self.vel[inb, jnb, 0]
                self.vel[ibc, jbc, 1] = 0.0
            else:  # vertical wall (left/right)
                self.vel[ibc, jbc, 0] = 0.0
                self.vel[ibc, jbc, 1] = self.vel[inb, jnb, 1]
            self.rho[ibc, jbc] = self.rho[inb, jnb]
            self.f_old[ibc, jbc] = (
                self._feq(ibc, jbc) - self._feq(inb, jnb) + self.f_old[inb, jnb]
            )

    def apply_bc(self):
        self.frame += 1
        progress = min(1.0, self.frame / self.warmup)
        ramp = 1.0 - math.cos(0.5 * PI_REF * progress)
        for j in range(1, self.ny - 1):
            self._bc_core(0, 0, j, 1, j, ramp)
            self._bc_core(2, self.nx - 1, j, self.nx - 2, j, ramp)
        for i in range(self.nx):
            self._bc_core(1, i, self.ny - 1, i, self.ny - 2, ramp)
            self._bc_core(3, i, 0, i, 1, ramp)
        for i in range(self.nx):
            for j in range(self.ny):
                if self.mask[i, j] == 1.0:
                    self.vel[i, j] = 0.0
                    if not self.bounce:  # bounce mode keeps the reversed f
                        self.f_old[i, j] = self._feq(i, j)

    def run_step(self, n=1):
        for _ in range(n):
            self.collide_and_stream()
            self.update_macro()
            self.apply_bc()

    def force(self):
        fx = fy = 0.0
        for i in range(self.nx):
            for j in range(self.ny):
                if self.mask[i, j] == 1:
                    for k in range(1, 9):
                        ni, nj = i + E[k, 0], j + E[k, 1]
                        if 0 <= ni < self.nx and 0 <= nj < self.ny and self.mask[ni, nj] == 0:
                            opp = [0, 3, 4, 1, 2, 7, 8, 5, 6][k]
                            fval = self.f_new[ni, nj, opp]
                            fx += 2.0 * fval * (-E[k, 0])
                            fy += 2.0 * fval * (-E[k, 1])
        return np.array([fx, fy])

    def moments(self):
        out = np.zeros((self.nx, self.ny, 9))
        for i in range(self.nx):
            for j in range(self.ny):
                out[i, j] = M @ self.f_new[i, j]
        return out
