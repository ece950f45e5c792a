"""Case-batch data parallelism: vmap many masks through one compiled step.

Replaces the reference's serial batch loop (pipeline/batch_run.py:219-351)
as the throughput path: one chip advances B cases per step. Per-case scalars
(nu/tau, rho_in, warmup...) are batched leaves of CaseParams; divergence is
handled functionally with a per-case ``alive`` flag -- a diverged case
freezes in place instead of killing the batch (the circuit breaker of
core/simulation_ops.py:9-57, made jit-safe).

All cases in a batch must share (ny, nx), bc_type, and the LES on/off flag.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.solver import (
    CaseParams,
    LBMState,
    force_on_obstacle,
    force_on_obstacle_bouzidi,
    force_on_obstacle_halfway,
    init_state,
    make_params,
    max_velocity,
    moments_output,
    obstacle_force,
    step,
)
from ..core.stability import is_stable_device


def stack_params(params: Sequence[CaseParams]) -> CaseParams:
    """Stack per-case CaseParams into one batched pytree (leading axis B)."""
    first = params[0]
    for p in params[1:]:
        if p.bc_type != first.bc_type or p.use_les != first.use_les:
            raise ValueError("batched cases must share bc_type and use_les")
        if p.mask.shape != first.mask.shape:
            raise ValueError("batched cases must share the grid shape")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params)


def init_batch_state(batch: int, ny: int, nx: int, dtype=jnp.float32) -> LBMState:
    one = init_state(ny, nx, dtype)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), one)


_STATE_AXES = LBMState(f=0, f_post=0, rho=0, u=0, step=0)
_PARAM_AXES = CaseParams(
    mask=0, damping=0, tau0=0, cs_factor=0, s_ghost=0,
    rho_in=0, rho_out=0, warmup_steps=0, bc_value=0,
)


def _param_axes(p: CaseParams) -> CaseParams:
    """vmap in_axes matching ``p``'s treedef (optional leaves included)."""
    axes = _PARAM_AXES
    if p.inlet_profile is not None:
        axes = axes.replace(inlet_profile=0)
    if p.bouzidi_q is not None:
        axes = axes.replace(bouzidi_q=0)
    return axes


_vforce = jax.vmap(force_on_obstacle, in_axes=(0, 0))
_vforce_halfway = jax.vmap(force_on_obstacle_halfway, in_axes=(0, 0))
_vmax = jax.vmap(max_velocity, in_axes=0)
_vstable = jax.vmap(is_stable_device, in_axes=(0, 0, 0, 0))


def _chunk_lockstep(state: LBMState, p: CaseParams, alive, n_steps: int):
    """vmap-lockstep chunk body (traceable; shared by jit and shard_map)."""
    vstep = jax.vmap(step, in_axes=(_STATE_AXES, _param_axes(p)))

    def body(s, _):
        s_new = vstep(s, p)
        s_frozen = jax.tree.map(
            lambda new, old: jnp.where(
                alive.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            ),
            s_new,
            s,
        )
        return s_frozen, None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    if p.bouzidi_obstacle:
        force = jax.vmap(force_on_obstacle_bouzidi, in_axes=(0, 0, 0))(
            state.f_post, p.mask, p.bouzidi_q
        )
    else:
        vf = _vforce_halfway if p.halfway_obstacle else _vforce
        force = vf(state.f_post, p.mask)
    max_v = _vmax(state.u)
    stable = _vstable(force, max_v, state.step, p.warmup_steps)
    alive = alive & stable
    return state, alive, {"force": force, "max_v": max_v, "stable": stable}


@functools.partial(jax.jit, static_argnames=("n_steps",))
def run_chunk_batched(
    state: LBMState, p: CaseParams, alive: jnp.ndarray, n_steps: int
):
    """Advance all alive cases n_steps; freeze cases that go unstable.

    Returns (state, alive, monitors) with per-case monitors
    {"force": [B,2], "max_v": [B]}.
    """
    return _chunk_lockstep(state, p, alive, n_steps)


def _chunk_sequential(state_b, p_b, alive, n_steps, batch, interpret,
                      store_dev=False):
    """Sequential-Pallas chunk body (traceable; shared by jit and shard_map).

    Advances B cases one after another through the fused Pallas kernel
    inside ONE traced program (per-case host dispatches through the
    tunneled runtime cost ~25% aggregate throughput: 6709 -> 8320 MLUPS at
    1024^2, B=4). Dead cases SKIP their chunk via lax.cond -- same observable
    freeze semantics as the vmap lockstep, without burning kernel time on a
    diverged case."""
    from ..ops.pallas_step import run_chunk_pallas

    news, forces, maxvs, stables = [], [], [], []
    for i in range(batch):
        st_i = jax.tree.map(lambda x: x[i], state_b)
        p_i = jax.tree.map(lambda x: x[i], p_b)
        # Small batches use lax.cond: a dead case SKIPS its chunk at runtime
        # instead of computing and discarding it, and the where-select
        # fusion pattern crashed the TPU compiler at exactly B = 4
        # (bisected; B in {2, 8, 16, 64} compiled fine). Large batches keep
        # the where-freeze -- cond's branch buffering raised peak HBM enough
        # to OOM B = 64 at 1024^2 (5.4GB of state).
        if batch <= 8:
            new_i = jax.lax.cond(
                alive[i],
                lambda s, pp=p_i: run_chunk_pallas(
                    s, pp, n_steps=n_steps, interpret=interpret,
                    store_dev=store_dev,
                )[0],
                lambda s: s,
                st_i,
            )
        else:
            new_i, _ = run_chunk_pallas(
                st_i, p_i, n_steps=n_steps, interpret=interpret,
                store_dev=store_dev,
            )
            new_i = jax.tree.map(
                lambda n, o: jnp.where(alive[i], n, o), new_i, st_i
            )
        force = obstacle_force(new_i.f_post, p_i)
        max_v = max_velocity(new_i.u)
        stables.append(
            is_stable_device(force, max_v, new_i.step, p_i.warmup_steps)
        )
        news.append(new_i)
        forces.append(force)
        maxvs.append(max_v)
    state_b = jax.tree.map(lambda *xs: jnp.stack(xs), *news)
    stable_b = jnp.stack(stables)
    return state_b, alive & stable_b, {
        "force": jnp.stack(forces),
        "max_v": jnp.stack(maxvs),
        "stable": stable_b,
    }


_run_chunk_sequential = functools.partial(jax.jit, static_argnames=(
    "n_steps", "batch", "interpret", "store_dev"
))(_chunk_sequential)

# TPU variant donating the input state: the chunk's stacked output then
# reuses the input's HBM instead of coexisting with it. At B = 64 x 1024^2
# the state is ~5.4GB, and the compaction path (below) additionally holds
# the full-batch state while a compacted chunk runs -- without donation
# that sum OOMed a 16GB v5e. Kept separate from the portable jit because
# CPU (the test platform) does not implement donation and warns on it.
_run_chunk_sequential_donated = functools.partial(jax.jit, static_argnames=(
    "n_steps", "batch", "interpret", "store_dev"
), donate_argnums=(0,))(_chunk_sequential)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_compact(full_state, full_alive, compact_state, compact_alive,
                     live_pad):
    """Scatter a compacted chunk's results back into the full batch IN PLACE
    (donated): rows whose ``live_pad`` entry is out of range (the ladder's
    padding duplicates) are dropped rather than clamped, so a dead case's
    frozen state is never clobbered by its padding twin."""
    put = lambda f, c: f.at[live_pad].set(c, mode="drop")
    return (
        jax.tree.map(put, full_state, compact_state),
        put(full_alive, compact_alive),
    )


# ---------------------------------------------------------------------------
# Cross-chip independent-case parallelism (SURVEY section 2.2: "pmap/
# shard_map over chips for independent cases")
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_steps", "mesh", "local_b", "interpret", "sequential", "store_dev"
    ),
)
def _run_chunk_case_sharded(
    state_b, p_b, alive, n_steps, mesh, local_b, interpret, sequential,
    store_dev=False,
):
    """Advance B cases over a 1-D device mesh: each device owns B/D cases.

    Cases are INDEPENDENT -- there is no per-step communication at all; the
    batch axis is simply sharded over the ``cases`` mesh axis with
    shard_map, and each device runs the same chunk body the single-device
    engine uses (sequential fused-Pallas kernels where supported, the vmap
    lockstep otherwise). Monitors come back batch-sharded and gather only
    on the host read. This is the TPU-pod analogue of running the
    reference's serial batch loop (pipeline/batch_run.py:219-351) once per
    GPU -- minus the processes, plus bitwise-identical lockstep semantics.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def shard_body(st, p, al):
        if sequential:
            return _chunk_sequential(
                st, p, al, n_steps, local_b, interpret, store_dev
            )
        return _chunk_lockstep(st, p, al, n_steps)

    b_spec = P("cases")
    s_specs = jax.tree.map(lambda _: b_spec, state_b)
    p_specs = jax.tree.map(lambda _: b_spec, p_b)
    mon_specs = {"force": b_spec, "max_v": b_spec, "stable": b_spec}
    return shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(s_specs, p_specs, b_spec),
        out_specs=(s_specs, b_spec, mon_specs),
    )(state_b, p_b, alive)


def case_mesh(n_devices: Optional[int] = None):
    """1-D ('cases',) mesh over the first n (default: all) local devices."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("cases",))


_vmoments = jax.vmap(moments_output, in_axes=0)


def moments_batched(state: LBMState) -> jnp.ndarray:
    """[B, 9, H, W] moment export for the whole batch."""
    return _vmoments(state)


class BatchEngine:
    """Run B same-shape cases in lockstep on one device.

    Two execution strategies behind the same API:

    * ``vmap`` -- one compiled step advances all B cases (the original
      lockstep). The jnp step is HBM-bound (~15 materialized arrays/step),
      so ADDING cases does not add throughput: aggregate MLUPS stays at the
      single-case jnp level regardless of B.
    * ``pallas`` -- cases advance SEQUENTIALLY through the fused Pallas
      kernel, one n-step chunk each per run_step call. The kernel runs
      ~15x faster than the jnp step at production sizes, so sequential
      beats lockstep decisively; per-dispatch latency amortizes over the
      chunk. Dead cases freeze exactly like the vmap path (skipped, state
      kept). Selected automatically on TPU for supported BCs and grids
      >= 2^16 cells (``runner="auto"``).
    * ``sharded`` -- the batch axis is sharded over a 1-D device mesh
      (``n_devices``); each chip independently runs the per-shard chunk
      body (sequential Pallas on TPU, vmap lockstep elsewhere). No
      per-step communication: aggregate throughput scales linearly with
      devices. Monitors/alive stay per-case.
    """

    def __init__(
        self,
        configs: Sequence[Dict[str, Any]],
        masks_yx: Sequence[np.ndarray],
        dtype=jnp.float32,
        runner: str = "auto",
        n_devices: Optional[int] = None,
        store_dev: Optional[bool] = None,
    ):
        if len(configs) != len(masks_yx):
            raise ValueError("configs and masks must align")
        self.configs = list(configs)
        # 16-bit deviation state storage on the fused TPU path (lossy,
        # opt-in; see ops/pallas_step store_dev). Config key or ctor arg.
        if store_dev is None:
            store_dev = bool(
                configs[0]["simulation"].get("f16_state", False)
            )
        self._store_dev = bool(store_dev)
        sim0 = configs[0]["simulation"]
        self.ny, self.nx = int(sim0["ny"]), int(sim0["nx"])
        self.batch = len(configs)
        self.case_params = [
            make_params(c, m, dtype) for c, m in zip(configs, masks_yx)
        ]
        self.params = stack_params(self.case_params)
        # resident compacted pack (dead-case compaction): while some cases
        # are dead, the sequential path runs on a gathered alive-only state
        # kept PACKED across chunks -- cases never resurrect, so the pack
        # stays valid until the ladder rung shrinks or an external consumer
        # reads .state (the property below scatters back on demand)
        self._pack: Optional[Dict[str, Any]] = None
        self.state = init_batch_state(self.batch, self.ny, self.nx, dtype)
        self.alive = jnp.ones((self.batch,), bool)
        self.last_monitors: Optional[Dict[str, jnp.ndarray]] = None
        # host mirror of ``alive`` (updated from each chunk's monitors; no
        # extra device sync) -- drives dead-case compaction decisions
        self._alive_np = np.ones((self.batch,), bool)
        # cached full-size device monitors for compacted chunks: dropped
        # cases report their frozen last values
        self._mon_full: Optional[Dict[str, jnp.ndarray]] = None

        from ..ops.pallas_step import supports

        if runner not in ("auto", "vmap", "pallas", "sharded"):
            raise ValueError(f"unknown runner {runner!r}")
        platform = jax.devices()[0].platform
        self._interpret = platform not in ("tpu", "axon")  # tests on CPU
        pallas_ok = (
            supports(self.case_params[0]) and self.ny * self.nx >= 1 << 16
        )
        self._sequential = runner == "pallas" or (
            runner == "auto" and platform in ("tpu", "axon") and pallas_ok
        )
        self.mesh = None
        self._shard_pad = 0
        if runner == "sharded":
            # Indivisible batches are PADDED to a device multiple with
            # duplicates of the last case that start dead (alive=False ->
            # frozen, outputs discarded), so every requested chip stays
            # busy. Coordinated multi-worker runs routinely produce odd
            # group sizes (other workers claim members away); the earlier
            # largest-divisor fit collapsed 5 cases on 4 chips to ONE chip
            # (divisors of a prime), a silent ~4x wall regression.
            want = n_devices if n_devices is not None else len(jax.devices())
            want = max(1, min(want, len(jax.devices()), self.batch))
            self._shard_pad = (-self.batch) % want
            if self._shard_pad:
                print(f"[BatchEngine] batch {self.batch} padded with "
                      f"{self._shard_pad} inert duplicate(s) to fill "
                      f"{want} devices")
            self.mesh = case_mesh(want)
            self._local_b = (self.batch + self._shard_pad) // want
            # per-shard strategy mirrors the auto rule (interpret-mode
            # Pallas inside shard_map works but is slow; CPU tests use vmap)
            self._sequential = platform in ("tpu", "axon") and pallas_ok
            # place the batch axis over the mesh so shard_map consumes the
            # shards in place (no resharding transfer on entry). With a
            # pad, the padded params are placed once here; the (mutable)
            # state/alive stay unpadded and are padded+sliced per chunk in
            # run_step (two HBM copies per chunk, ~ms vs seconds of chunk).
            from jax.sharding import NamedSharding, PartitionSpec as P

            put = lambda x: jax.device_put(
                x, NamedSharding(self.mesh, P("cases"))
            )
            if self._shard_pad:
                self._params_padded = jax.tree.map(
                    lambda a: put(self._pad_rows(a)), self.params
                )
            else:
                self.state = jax.tree.map(put, self.state)
                self.params = jax.tree.map(put, self.params)
                self.alive = put(self.alive)

    def _pad_rows(self, a):
        """Append _shard_pad duplicates of the last batch row."""
        return jnp.concatenate(
            [a, jnp.repeat(a[-1:], self._shard_pad, axis=0)]
        )

    def run_step(self, n: int = 1, sync: bool = True):
        """Advance n steps. ``sync=True`` returns host-side monitor arrays;
        ``sync=False`` returns a packed DEVICE array (dispatch only) so the
        caller can overlap other device->host transfers with the chunk's
        compute and call :meth:`sync_monitors` afterwards."""
        if self.mesh is not None:
            if self._shard_pad:
                # pad rows ride as permanently-dead duplicates: frozen by
                # their alive flag, outputs sliced away below
                st = jax.tree.map(self._pad_rows, self.state)
                al = jnp.concatenate(
                    [self.alive, jnp.zeros((self._shard_pad,), bool)]
                )
                st, al, mon = _run_chunk_case_sharded(
                    st, self._params_padded, al, n_steps=n,
                    mesh=self.mesh, local_b=self._local_b,
                    interpret=self._interpret, sequential=self._sequential,
                    store_dev=self._store_dev,
                )
                b = self.batch
                self.state = jax.tree.map(lambda a: a[:b], st)
                self.alive = al[:b]
                mon = {k: v[:b] for k, v in mon.items()}
            else:
                self.state, self.alive, mon = _run_chunk_case_sharded(
                    self.state, self.params, self.alive, n_steps=n,
                    mesh=self.mesh, local_b=self._local_b,
                    interpret=self._interpret, sequential=self._sequential,
                    store_dev=self._store_dev,
                )
        elif self._sequential:
            mon = self._run_step_sequential(n)
        else:
            self.state, self.alive, mon = run_chunk_batched(
                self.state, self.params, self.alive, n_steps=n
            )
        # ONE device->host transfer for all monitors: each np.asarray is a
        # tunnel round trip (~15ms on the remoted runtime), and three of
        # them per chunk measured ~20% of aggregate throughput
        packed_dev = jnp.concatenate(
            [
                mon["force"].reshape(-1).astype(jnp.float32),
                mon["max_v"].astype(jnp.float32),
                mon["stable"].astype(jnp.float32),
            ]
        )
        if not sync:
            return packed_dev
        return self.sync_monitors(packed_dev)

    def sync_monitors(self, packed_dev) -> Dict[str, np.ndarray]:
        """Fetch and unpack a run_step(sync=False) monitor array."""
        b = self.batch
        packed = np.asarray(packed_dev)
        out = {
            "force": packed[: 2 * b].reshape(b, 2),
            "max_v": packed[2 * b : 3 * b],
            "stable": packed[3 * b :] > 0.5,
        }
        self.last_monitors = out
        self._alive_np &= out["stable"]
        return out

    # ``state`` scatters a resident compacted pack back into the full batch
    # before handing it out, so every external consumer (dataset fetches,
    # video renderer, checkpointing, get_moments) always sees the full-batch
    # layout; ``alive`` is maintained full-size at all times (cheap).
    @property
    def state(self) -> LBMState:
        self._unpack()
        return self._state

    @state.setter
    def state(self, value: LBMState) -> None:
        self._pack = None
        self._state = value

    @property
    def alive(self):
        return self._alive

    @alive.setter
    def alive(self, value) -> None:
        self._alive = value

    def _unpack(self) -> None:
        """Scatter the resident compacted pack back into the full state."""
        if self._pack is None:
            return
        pack, self._pack = self._pack, None
        if self._interpret:  # CPU has no donation support (warns)
            put = lambda f, c: f.at[pack["live_pad"]].set(c, mode="drop")
            self._state = jax.tree.map(put, self._state, pack["state"])
            self._alive = put(self._alive, pack["alive"])
        else:
            self._state, self._alive = _scatter_compact(
                self._state, self._alive, pack["state"], pack["alive"],
                pack["live_pad"],
            )

    def set_state(self, state: LBMState, alive) -> None:
        """Restore engine state + alive flags (checkpoint resume)."""
        self.state = state
        self.alive = jnp.asarray(alive)
        self._alive_np = np.asarray(alive).astype(bool).copy()
        self._mon_full = None

    @staticmethod
    def _ladder(n: int, cap: int) -> int:
        """Smallest rung >= n from {2^k, 3*2^k} (capped): bounds compaction
        recompiles to ~2*log2(B) distinct batch shapes while capping wasted
        kernel calls at 4/3 of the alive count. The 3*2^k rungs matter at
        realistic divergence rates: a pure power-of-two ladder rounds 48
        alive of B=64 straight back to 64 and never compacts at all."""
        b = 1
        while b < n:
            if 3 * b // 2 >= n and b % 2 == 0:
                b = 3 * b // 2
                break
            b *= 2
        return min(b, cap)

    def _run_step_sequential(self, n: int) -> Dict[str, jnp.ndarray]:
        """Sequential-Pallas chunk with dead-case compaction.

        The traced chunk unrolls one kernel call per stacked case, so a
        where-frozen dead case still burns its full kernel time (the
        lax.cond skip only works at B <= 8; its branch buffering OOMs
        larger batches). Instead the HOST re-packs at chunk boundaries:
        gather the alive cases to a ladder-size batch and run the compact
        chunk. The pack stays RESIDENT across chunks (cases never
        resurrect), so gather/scatter traffic is paid only when the rung
        shrinks or an external consumer reads .state -- per-chunk
        repacking measured 86% of the all-alive aggregate at B=64/25%
        dead; resident packing removes that overhead. Dropped cases keep
        their frozen state and report their last monitors; distinct
        compact sizes are log2-bounded so recompiles are too.
        """
        idx = np.nonzero(self._alive_np)[0]
        bc = self._ladder(max(len(idx), 1), self.batch)
        # CPU (tests) has no donation support; TPU donates so the chunk
        # output reuses the input state's HBM (see _run_chunk_sequential_
        # donated) -- nothing else may hold those buffers past dispatch,
        # which holds: checkpoint/video consumers read state leaves either
        # synchronously or as already-dispatched ops the runtime sequences.
        run = (
            _run_chunk_sequential if self._interpret
            else _run_chunk_sequential_donated
        )
        if bc == self.batch:
            self._unpack()
            self.state, self.alive, mon = run(
                self._state, self.params, self._alive, n, self.batch,
                self._interpret, self._store_dev,
            )
            self._mon_full = mon
            return mon
        if self._mon_full is None:
            # first compacted chunk: seed the frozen-monitor cache
            self._mon_full = {
                "force": jnp.zeros((self.batch, 2), jnp.float32),
                "max_v": jnp.zeros((self.batch,), jnp.float32),
                "stable": jnp.asarray(self._alive_np),
            }
        if len(idx) == 0:
            self._unpack()
            return self._mon_full  # whole batch dead: nothing to advance
        if self._pack is None or self._pack["bc"] != bc:
            # (re-)pack: gather the alive cases to the ladder size, padding
            # with duplicates of idx[0] masked dead so they freeze and are
            # dropped on scatter. Cases never resurrect, so an existing
            # pack stays valid until the rung shrinks -- gather/scatter
            # traffic is paid per RUNG CHANGE, not per chunk (the per-chunk
            # copies cost ~12% aggregate at B=64/100-step chunks).
            self._unpack()
            pad = np.concatenate(
                [idx, np.full(bc - len(idx), idx[0], idx.dtype)]
            )
            pad_dev = jnp.asarray(pad)
            take = lambda x: jnp.take(x, pad_dev, axis=0)
            self._pack = {
                "bc": bc,
                "state": jax.tree.map(take, self._state),
                "params": jax.tree.map(take, self.params),
                "alive": jnp.asarray(np.arange(bc) < len(idx)),
                # scatter targets: real rows go home, padding duplicates
                # aim one past the batch and are dropped by mode="drop"
                "live_pad": jnp.asarray(np.concatenate(
                    [idx, np.full(bc - len(idx), self.batch, idx.dtype)]
                )),
            }
        pack = self._pack
        pack["state"], pack["alive"], mon_c = run(
            pack["state"], pack["params"], pack["alive"], n, bc,
            self._interpret, self._store_dev,
        )
        # full-size mirrors stay current each chunk (tiny scatters): alive
        # for external flag readers, monitors with frozen values for the
        # dropped cases
        put = lambda full, c: full.at[pack["live_pad"]].set(c, mode="drop")
        self._alive = put(self._alive, pack["alive"])
        self._mon_full = jax.tree.map(put, self._mon_full, dict(mon_c))
        return self._mon_full

    def get_moments(self) -> np.ndarray:
        return np.asarray(moments_batched(self.state))

    def get_moments_device(self):
        """[B, 9, H, W] moments as a device array (for fused post-processing
        like the on-device dataset resize)."""
        return moments_batched(self.state)

    @property
    def alive_mask(self) -> np.ndarray:
        return np.asarray(self.alive)
