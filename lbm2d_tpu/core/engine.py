"""High-level solver facade over the functional core.

Mirrors the reference solver's public API surface
(core/LBM2D_MRT_LES.py: run_step, get_force, get_max_velocity,
get_physical_fields, get_moments_numpy) so pipeline code and reference users
migrate without changes -- but everything inside is jit-compiled JAX: a chunk
of ``n`` lattice steps is one device program (lax.scan), and the monitoring
scalars ride back with the chunk instead of separate kernel launches.

Adds what the reference lacks: in-case checkpoint/restore of the full solver
state (SURVEY.md section 5 checkpoint gap).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .solver import (
    CaseParams,
    LBMState,
    init_state,
    make_params,
    moments_output,
    run_chunk,
)


class LBMEngine:
    """One simulation case on one device."""

    def __init__(
        self,
        config: Dict[str, Any],
        mask_yx: Optional[np.ndarray] = None,
        dtype=jnp.float32,
        collide_impl: str = "auto",
        store_dev: Optional[bool] = None,
    ):
        self.config = config
        sim = config["simulation"]
        # 16-bit deviation state storage (ops/pallas_step store_dev): halves
        # HBM f traffic on the fused TPU path at a bounded quantization cost
        # (lossy -- opt-in via the ``simulation.f16_state`` config key or the
        # constructor arg). The jnp fallback path ignores it.
        if store_dev is None:
            store_dev = bool(sim.get("f16_state", False))
        self.store_dev = bool(store_dev)
        self.nx, self.ny = int(sim["nx"]), int(sim["ny"])
        self.name = sim.get("name", "case")
        self.nu = float(sim["nu"])
        self.tau0 = 3.0 * self.nu + 0.5
        self.characteristic_length = sim["characteristic_length"]
        self.rho_in_target = float(sim["rho_in"])
        self.rho_out_target = float(sim["rho_out"])
        self.warmup_steps = int(sim["warmup_steps"])

        # Bernoulli estimate of the pressure-driven inlet speed, as the
        # reference logs at init (LBM2D_MRT_LES.py:56-64).
        delta_rho = self.rho_in_target - self.rho_out_target
        u_char = math.sqrt(2.0 / 3.0 * delta_rho) if delta_rho > 1e-9 else 0.01
        self.Re = (
            (u_char * self.characteristic_length) / self.nu
            if self.nu > 0
            else float("inf")
        )
        self.u_inlet_estimate = u_char

        self.params: CaseParams = make_params(config, mask_yx, dtype=dtype)
        self.dtype = dtype
        self._runner = self._resolve_runner(collide_impl)
        self.state: LBMState = init_state(self.ny, self.nx, dtype)
        self._last_monitors = None
        self._monitors_np = None

    def _resolve_runner(self, impl: str):
        """Pick the chunk runner: fused Pallas kernel on TPU, jnp elsewhere.

        The fused kernel requires all four BC sides active (ops/pallas_step
        supports()); exotic layouts fall back to the jnp path.
        """
        if impl in ("auto", "pallas"):
            backend = jax.default_backend()
            on_tpu = backend in ("tpu", "axon")
            if impl == "pallas" or on_tpu:
                try:
                    from ..ops.pallas_step import run_chunk_pallas, supports

                    if supports(self.params):
                        sd = self.store_dev
                        return lambda state, p, n: run_chunk_pallas(
                            state, p, n_steps=n, store_dev=sd
                        )
                    if impl == "pallas":
                        raise ValueError(
                            f"bc_type {self.params.bc_type} unsupported by the "
                            "fused kernel"
                        )
                except ImportError:
                    if impl == "pallas":
                        raise
        return lambda state, p, n: run_chunk(state, p, n_steps=n)

    # -- reference-compatible API --------------------------------------------

    def init(self) -> None:
        self.state = init_state(self.ny, self.nx, self.dtype)
        self._last_monitors = None
        self._monitors_np = None

    def run_step(self, steps: int = 1) -> None:
        self.state, self._last_monitors = self._runner(self.state, self.params, steps)
        self._monitors_np = None

    def _fetch_monitors(self) -> np.ndarray:
        """[Fx, Fy, max_v] in ONE device->host transfer. On the remoted TPU
        runtime every np.asarray is a ~15ms round trip; the per-chunk loop
        reads force AND max_v, so fetching them separately doubles the
        monitor overhead."""
        if self._monitors_np is None:
            import jax.numpy as jnp

            if self._last_monitors is None:
                from .solver import max_velocity, obstacle_force

                force = obstacle_force(self.state.f_post, self.params)
                max_v = max_velocity(self.state.u)
            else:
                force = self._last_monitors["force"]
                max_v = self._last_monitors["max_v"]
            self._monitors_np = np.asarray(
                jnp.concatenate([force.reshape(-1), max_v.reshape(1)])
            )
        return self._monitors_np

    def get_force(self) -> np.ndarray:
        return self._fetch_monitors()[:2]

    def get_max_velocity(self) -> float:
        return float(self._fetch_monitors()[2])

    def get_physical_fields(self) -> Tuple[np.ndarray, np.ndarray]:
        """(u [2,H,W], mask [H,W]) as numpy."""
        return np.asarray(self.state.u), np.asarray(self.params.mask)

    def get_moments(self) -> np.ndarray:
        """[9, H, W] MRT moments of the post-collision field."""
        return np.asarray(moments_output(self.state))

    def get_moments_device(self) -> jnp.ndarray:
        return moments_output(self.state)

    @property
    def step_count(self) -> int:
        return int(self.state.step)

    # -- checkpoint / restore -------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        # Write-temp-then-rename: a crash mid-write must not corrupt the only
        # checkpoint (that would defeat crash-resume).
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez_compressed(
                fh,
                f=np.asarray(self.state.f),
                f_post=np.asarray(self.state.f_post),
                rho=np.asarray(self.state.rho),
                u=np.asarray(self.state.u),
                step=np.asarray(self.state.step),
            )
        os.replace(tmp, path)

    def load_checkpoint(self, path: str) -> None:
        data = np.load(path)
        self.state = LBMState(
            f=jnp.asarray(data["f"], self.dtype),
            f_post=jnp.asarray(data["f_post"], self.dtype),
            rho=jnp.asarray(data["rho"], self.dtype),
            u=jnp.asarray(data["u"], self.dtype),
            step=jnp.asarray(data["step"], jnp.int32),
        )
        self._last_monitors = None
        self._monitors_np = None
