"""Subprocess worker for tests/test_multihost.py pipeline e2e.

One controller of a 2-process multi-controller job running the PRODUCTION
single-case entry (pipeline/run_one_case.main) with a spatial mesh spanning
both processes. Rank 0 owns the artifacts; rank 1 runs the same loop and
joins the collective gathers. Usage:

  python -m tests._mh_pipeline_worker <coord> <nprocs> <pid> <root> <cfg>
"""

import json
import os
import sys


def main() -> None:
    import faulthandler

    faulthandler.dump_traceback_later(240, exit=True, file=sys.stderr)
    coord, n_procs, pid, root, cfg_name = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5],
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    from lbm2d_tpu.parallel.multihost import init_multihost, sync

    init_multihost(coord, n_procs, pid)
    assert len(jax.devices()) == 2 * n_procs

    from lbm2d_tpu.pipeline import run_one_case

    base = os.path.join(root, "SimCases", "MH")
    out = os.path.join(root, "outputs", "MH")
    os.makedirs(os.path.join(out, "raw"), exist_ok=True)
    os.makedirs(os.path.join(out, "vis"), exist_ok=True)
    md = run_one_case.main(
        os.path.join(base, "configs", cfg_name),
        os.path.join(base, "masks", "mask_00.png"),
        os.path.join(out, "raw", "case_mh.h5"),
        os.path.join(out, "vis", "case_mh.mp4"),
        progress=False,
        spatial_mesh=(2, 2),
    )
    sync()  # rank 0's writer close ordering vs rank 1 exit
    print("MH_PIPE " + json.dumps(
        {"pid": pid, "status": md.get("status"),
         "steps": md.get("final_steps"),
         "re": md.get("reynolds_number_lattice_actual")}
    ), flush=True)


if __name__ == "__main__":
    main()
