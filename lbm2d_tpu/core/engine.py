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


def parse_spatial_mesh(spec) -> Optional[Tuple[int, int]]:
    """Mesh-shape spec -> (rows, cols) | None.

    Accepts "2x4" / [2, 4] / (2, 4); "auto" or an int N means the
    most-square factorization of all (or N) local devices. None/""/0 -> no
    spatial sharding.
    """
    if spec in (None, "", 0, False):
        return None
    from ..parallel.topology import best_grid

    if isinstance(spec, str):
        if spec.strip().lower() == "auto":
            import jax as _jax

            return best_grid(len(_jax.devices()))
        parts = spec.lower().replace("x", " ").split()
        if len(parts) != 2:
            raise ValueError(f"spatial_mesh {spec!r}: expected 'RxC'")
        return int(parts[0]), int(parts[1])
    if isinstance(spec, int):
        return best_grid(spec)
    ry, rx = spec
    return int(ry), int(rx)


class LBMEngine:
    """One simulation case: single device, or spatially sharded over a
    device mesh (``simulation.spatial_mesh`` / ``spatial_mesh=`` -- the
    production entry for BASELINE config #5 grids, SURVEY.md section 2.2).
    """

    def __init__(
        self,
        config: Dict[str, Any],
        mask_yx: Optional[np.ndarray] = None,
        dtype=jnp.float32,
        collide_impl: str = "auto",
        store_dev: Optional[bool] = None,
        spatial_mesh=None,
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
        self.mesh = None
        self._multihost = False
        mesh_shape = parse_spatial_mesh(
            spatial_mesh if spatial_mesh is not None
            else sim.get("spatial_mesh")
        )
        if mesh_shape is not None:
            self._runner = self._resolve_sharded_runner(collide_impl, mesh_shape)
        else:
            self._runner = self._resolve_runner(collide_impl)
        self.state: LBMState = init_state(self.ny, self.nx, dtype)
        self._place_on_mesh()
        self._last_monitors = None
        self._monitors_np = None

    def _resolve_sharded_runner(self, impl: str, mesh_shape: Tuple[int, int]):
        """Spatially-sharded chunk runner over a ('dy','dx') device mesh.

        The grid is block-decomposed [ny/ry, nx/rx] per device; each chunk is
        one compiled program with per-step 1-cell ppermute halo exchange over
        ICI (parallel/sharded.py). On TPU the per-shard step is the fused
        Pallas kernel when the geometry is eligible (split-BC constraints:
        fused-kernel BC support + local width a 128-lane multiple for 2D
        meshes); elsewhere the jnp shard_map step -- bitwise-equal to the
        single-device run_chunk (tests/test_parallel.py) -- keeps full
        production fidelity. Monitors/moments/checkpoints work unchanged:
        reductions and exports are global jit ops that GSPMD resolves on the
        sharded state.
        """
        from ..parallel import sharded as sh
        from ..parallel.topology import make_mesh

        ry, rx = mesh_shape
        n_dev = len(jax.devices())
        if ry * rx > n_dev:
            raise ValueError(
                f"spatial_mesh {ry}x{rx} needs {ry * rx} devices, "
                f"found {n_dev}"
            )
        self.mesh = make_mesh((ry, rx), devices=jax.devices()[: ry * rx])
        # multi-controller: the global device list spans processes -- host
        # IO must gather collectively and artifacts write on process 0
        self._multihost = jax.process_count() > 1
        if self.ny % ry or self.nx % rx:
            raise ValueError(
                f"grid {self.ny}x{self.nx} (HxW) not divisible by "
                f"spatial_mesh {ry}x{rx}"
            )
        wl = self.nx // rx
        use_pallas = False
        if impl in ("auto", "pallas"):
            backend = jax.default_backend()
            if impl == "pallas" or backend in ("tpu", "axon"):
                try:
                    from ..ops.pallas_step import supports

                    use_pallas = supports(self.params) and (
                        rx == 1 or wl % 128 == 0
                    )
                except ImportError:
                    use_pallas = False
                if impl == "pallas" and not use_pallas:
                    raise ValueError(
                        f"case (bc_type {self.params.bc_type}, local width "
                        f"{wl}) unsupported by the sharded fused kernel"
                    )
        mesh, ny, nx = self.mesh, self.ny, self.nx
        if use_pallas:
            sd = self.store_dev
            return lambda state, p, n: sh.run_chunk_sharded_pallas(
                state, p, n_steps=n, mesh=mesh, ny=ny, nx=nx, store_dev=sd
            )
        return lambda state, p, n: sh.run_chunk_sharded(
            state, p, n_steps=n, mesh=mesh, ny=ny, nx=nx
        )

    def _place_on_mesh(self) -> None:
        """Shard state+params onto the spatial mesh (no-op when unsharded)."""
        if self.mesh is None:
            return
        if self._multihost:
            # device_put onto a cross-process sharding is not allowed from
            # one controller; every process materializes its own shards
            # from the (identical) host data instead
            from ..parallel.multihost import shard_state_global

            self.state, self.params = shard_state_global(
                self.state, self.params, self.mesh
            )
        else:
            from ..parallel.topology import shard_state

            self.state, self.params = shard_state(
                self.state, self.params, self.mesh
            )

    def _fetch(self, x) -> np.ndarray:
        """Device array -> numpy for host IO. Single-process: a plain copy.
        Multi-host: a process_allgather COLLECTIVE -- every process must
        call it at the same point (the loop is deterministic and monitor
        values are replicated, so all processes branch identically)."""
        if self._multihost:
            from ..parallel.multihost import gather_for_io

            return gather_for_io(x)
        return np.asarray(x)

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
        self._place_on_mesh()
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
        return self._fetch(self.state.u), self._fetch(self.params.mask)

    def get_moments(self) -> np.ndarray:
        """[9, H, W] MRT moments of the post-collision field."""
        return self._fetch(moments_output(self.state))

    def get_moments_device(self) -> jnp.ndarray:
        return moments_output(self.state)

    @property
    def step_count(self) -> int:
        return int(self.state.step)

    # -- checkpoint / restore -------------------------------------------------

    def save_checkpoint(self, path: str) -> None:
        # Write-temp-then-rename: a crash mid-write must not corrupt the only
        # checkpoint (that would defeat crash-resume). Multi-host: the
        # device-side all-gathers are collectives every process joins, but
        # the device->host conversion (the expensive part at production
        # sizes) happens on rank 0 only; other ranks drop their replicated
        # device copies without fetching. Only rank 0 writes (shared
        # filesystems would tear the file otherwise).
        if self._multihost:
            import jax as _jax

            from ..parallel.multihost import gather_replicated

            rep = {
                name: gather_replicated(arr)
                for name, arr in (
                    ("f", self.state.f), ("f_post", self.state.f_post),
                    ("rho", self.state.rho), ("u", self.state.u),
                )
            }
            if _jax.process_index() != 0:
                return
            data = {name: np.asarray(arr) for name, arr in rep.items()}
            data["step"] = np.asarray(self.state.step)
        else:
            data = dict(
                f=self._fetch(self.state.f),
                f_post=self._fetch(self.state.f_post),
                rho=self._fetch(self.state.rho),
                u=self._fetch(self.state.u),
                step=np.asarray(self.state.step),
            )
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez_compressed(fh, **data)
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
        self._place_on_mesh()  # checkpoints are stored gathered (mesh-shape
        # agnostic: a 2x4 run resumes fine on 1x8 or unsharded)
        self._last_monitors = None
        self._monitors_np = None
