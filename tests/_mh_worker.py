"""Subprocess worker for tests/test_multihost.py.

Runs one controller of a 2-process JAX multi-controller job on the CPU
backend (2 local devices each -> 4 global), advances the SAME sharded
chunk `parallel/sharded.run_chunk_sharded` the single-process engine uses
over a global 2x2 mesh, and checks it against the unsharded single-device
step computed locally. Usage:

  python -m tests._mh_worker <coordinator> <num_procs> <pid>
"""

import os
import sys


def main() -> None:
    import faulthandler

    # hang tripwire: a lost peer leaves distributed init / collectives
    # waiting forever -- dump stacks and die instead of wedging the suite
    faulthandler.dump_traceback_later(240, exit=True, file=sys.stderr)
    coord, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:  # cross-process CPU collectives (newer jax versions need gloo set)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from lbm2d_tpu.parallel.multihost import (
        gather_for_io,
        init_multihost,
        make_global_mesh,
        shard_state_global,
        sync,
    )

    init_multihost(coord, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == 2 * n_procs, jax.devices()

    import numpy as np

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params, run_chunk
    from lbm2d_tpu.parallel.sharded import run_chunk_sharded

    ny = nx = 32
    cfg = _demo_config(nx, ny, warmup=32)
    mask = _cylinder_mask(ny, nx)
    p_host = make_params(cfg, mask)
    state_host = init_state(ny, nx)

    # golden: the same chunk unsharded, computed on this process's device 0
    ref, ref_mon = run_chunk(init_state(ny, nx), p_host, n_steps=4)
    ref_f = np.asarray(ref.f)

    mesh = make_global_mesh((2, 2))  # row 0 = process 0, row 1 = process 1
    state, p = shard_state_global(state_host, p_host, mesh)
    state, mon = run_chunk_sharded(state, p, n_steps=4, mesh=mesh, ny=ny, nx=nx)

    # monitors are global reductions -> replicated; every process reads them
    max_v = float(np.asarray(mon["max_v"]))
    ref_max_v = float(np.asarray(ref_mon["max_v"]))
    assert abs(max_v - ref_max_v) < 1e-6, (max_v, ref_max_v)

    # the sharded f spans both processes; gather for IO and compare
    f_full = gather_for_io(state.f)
    assert f_full.shape == ref_f.shape, (f_full.shape, ref_f.shape)
    maxdiff = float(np.max(np.abs(f_full - ref_f)))
    assert maxdiff < 1e-6, maxdiff
    sync()
    print(f"MH_OK pid={pid} maxdiff={maxdiff:.3e} max_v={max_v:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
