"""Device-mesh construction helpers for spatial domain decomposition.

The reference is single-GPU (SURVEY.md section 2.2: no distributed backend);
this layer is new. A 2D ``Mesh(('dy', 'dx'))`` carves the lattice into
blocks; the D2Q9 pull stencil needs a 1-cell halo per step, exchanged over
ICI by ``jax.lax.ppermute`` (see parallel/sharded.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_Y, AXIS_X = "dy", "dx"


def best_grid(n_devices: int) -> Tuple[int, int]:
    """Most-square (rows, cols) factorization of n_devices."""
    best = (1, n_devices)
    for r in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % r == 0:
            best = (r, n_devices // r)
    return best


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2D mesh over the available devices; shape defaults to most-square."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = best_grid(len(devices))
    ry, rx = shape
    if ry * rx != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    dev_grid = np.array(devices).reshape(ry, rx)
    return Mesh(dev_grid, (AXIS_Y, AXIS_X))


def state_specs():
    """PartitionSpecs for an LBMState pytree on a ('dy','dx') mesh."""
    from ..core.solver import LBMState

    return LBMState(
        f=P(None, AXIS_Y, AXIS_X),
        f_post=P(None, AXIS_Y, AXIS_X),
        rho=P(AXIS_Y, AXIS_X),
        u=P(None, AXIS_Y, AXIS_X),
        step=P(),
    )


def params_specs(p=None):
    """PartitionSpecs for a CaseParams pytree (fields sharded, scalars
    replicated). Pass the actual params so the static fields (use_les,
    bc_type) -- which are part of the treedef -- match."""
    from ..core.solver import CaseParams

    specs = dict(
        mask=P(AXIS_Y, AXIS_X),
        damping=P(AXIS_Y, AXIS_X),
        tau0=P(),
        cs_factor=P(),
        s_ghost=P(),
        rho_in=P(),
        rho_out=P(),
        warmup_steps=P(),
        bc_value=P(),
    )
    if p is not None:
        if p.inlet_profile is not None:
            specs["inlet_profile"] = P(AXIS_Y)  # [H] row profile
        if p.bouzidi_q is not None:
            specs["bouzidi_q"] = P(None, AXIS_Y, AXIS_X)
        return p.replace(**specs)
    return CaseParams(**specs)


def shard_state(state, p, mesh: Mesh):
    """Place an (unsharded) state + params onto the mesh."""
    s_specs, p_specs = state_specs(), params_specs(p)
    put = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
    state = jax.tree.map(put, state, s_specs)
    p = jax.tree.map(put, p, p_specs)
    return state, p
