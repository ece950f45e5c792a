"""Capture a jax profiler trace of the 4096^2 split-BC chunk and summarize.

Parses the xplane proto and prints total duration by op/event name so we can
see DMA wait vs compute vs edge-kernel shares.
"""

import glob
import gzip
import sys
import time
from collections import defaultdict

import numpy as np


def main() -> None:
    ny = nx = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import jax

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas as run_chunk

    cfg = _demo_config(nx, ny, nu=0.01, warmup=2000)
    p = make_params(cfg, _cylinder_mask(ny, nx))
    state = init_state(ny, nx)

    def sync(x):
        return float(np.asarray(x["max_v"]))

    print("warmup...", flush=True)
    for _ in range(3):
        state, mon = run_chunk(state, p, n_steps=20)
    sync(mon)

    logdir = "/tmp/jaxtrace"
    print("tracing...", flush=True)
    with jax.profiler.trace(logdir):
        for _ in range(2):
            state, mon = run_chunk(state, p, n_steps=20)
        sync(mon)
    print("trace done", flush=True)

    paths = sorted(glob.glob(logdir + "/**/*.xplane.pb", recursive=True))
    print("planes:", paths, flush=True)
    if not paths:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        totals = defaultdict(float)
        counts = defaultdict(int)
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                totals[name] += ev.duration_ps / 1e9  # ms
                counts[name] += 1
        print(f"== plane {plane.name}")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {ms:9.2f} ms  x{counts[name]:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
