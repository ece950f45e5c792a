"""Measure the device_specs kernel budgets on the chip this runs on.

The Pallas step kernels tile against three calibration constants that were
measured on a v5e and are otherwise only *scaled* by physical VMEM onto
other generations (ops/device_specs.py): the scoped-VMEM working budget per
band, the raised per-geometry limit for 4096-lane bands, and the padded-f
size where VMEM residency ends and cross-program pipelining starts paying.
Scaling ignores HBM:VMEM bandwidth ratios, so a v5p-class part may deserve
different numbers. This tool re-measures all three by sweeping each knob
with real kernel runs and emits a JSON override that
``LBM2D_BUDGETS_JSON=<file>`` applies process-wide.

Each probe runs in a SUBPROCESS with the candidate budgets injected through
that same env var: kernel geometry and compiler limits are baked at trace
time, so in-process overrides could reuse stale compiled kernels.

Usage:
  python tools_calibrate_specs.py [--out device_specs_override.json]
      [--quick] [--chunks 6] [--spc 100]
  python tools_calibrate_specs.py --probe NY NX   (internal per-candidate run)

Validation contract (VERDICT r3 item 8): run on the calibration v5e, the
emitted constants must reproduce the committed v5e numbers within noise
(working budget 13MB, wide limit 40MB, pipeline threshold between the
1024^2-class and 2048^2-class padded sizes).
"""

from __future__ import annotations

import argparse

import json
import os
import subprocess
import sys
import tempfile
import time

_MB = 1024 * 1024


def _probe(ny: int, nx: int, chunks: int, spc: int) -> None:
    """Measure split-BC kernel MLUPS at one grid under the env budgets."""
    import numpy as np

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params
    from lbm2d_tpu.ops.pallas_step import run_chunk_pallas as run_chunk

    cfg = _demo_config(nx, ny, nu=0.01, warmup=2000)
    p = make_params(cfg, _cylinder_mask(ny, nx))
    state = init_state(ny, nx)
    for _ in range(3):  # compile + clock warmup
        state, mon = run_chunk(state, p, n_steps=spc)
    float(np.asarray(mon["max_v"]))
    t0 = time.perf_counter()
    for _ in range(chunks):
        state, mon = run_chunk(state, p, n_steps=spc)
    float(np.asarray(mon["max_v"]))
    dt = time.perf_counter() - t0
    assert bool(np.isfinite(np.asarray(mon["max_v"])))
    print(json.dumps({
        "mlups": nx * ny * chunks * spc / dt / 1e6,
        "us_per_step": dt / (chunks * spc) * 1e6,
    }))


def _run_probe(ny, nx, budget_fields, chunks, spc):
    """Launch one probe subprocess with candidate budgets; returns MLUPS."""
    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as fh:
        json.dump({"budgets": budget_fields}, fh)
        tmp = fh.name
    env = dict(os.environ)
    env["LBM2D_BUDGETS_JSON"] = tmp
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe",
             str(ny), str(nx), "--chunks", str(chunks), "--spc", str(spc)],
            capture_output=True, text=True, env=env, timeout=1200,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        if out.returncode != 0:
            print(f"    probe {ny}x{nx} FAILED: {out.stderr[-400:]}")
            return None
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)
    finally:
        os.unlink(tmp)


def _default_fields():
    from lbm2d_tpu.ops.device_specs import budgets

    return {
        f: getattr(budgets(), f)
        for f in (
            "tile_budget_floats", "split_budget_floats", "full_budget_floats",
            "base_limit_bytes", "wide_limit_bytes", "pipeline_min_bytes",
            "wide_band_rows", "physical_vmem_bytes",
        )
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", nargs=2, type=int, metavar=("NY", "NX"),
                    default=None)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--spc", type=int, default=100)
    ap.add_argument("--out", default="device_specs_override.json")
    ap.add_argument("--quick", action="store_true",
                    help="coarser sweeps (3 candidates per knob)")
    args = ap.parse_args()
    if args.probe is not None:
        _probe(args.probe[0], args.probe[1], args.chunks, args.spc)
        return

    import jax

    dev = jax.devices()[0]
    base = _default_fields()
    print(f"device: {dev.device_kind} ({dev.platform}); "
          f"spec-scaled defaults: working="
          f"{base['split_budget_floats'] * 4 // _MB}MB "
          f"wide={base['wide_limit_bytes'] // _MB}MB "
          f"pipeline>={base['pipeline_min_bytes'] // _MB}MB")

    # ---- knob 1: scoped-VMEM working budget (split-BC bands @ 1024^2) ----
    cands = [10, 12, 13, 14, 16] if not args.quick else [10, 13, 16]
    print("\n[1/3] working-budget sweep @ 1024^2 (split-BC fast steps)")
    best_w, best_w_mlups = None, -1.0
    for mb in cands:
        fields = dict(base)
        fields["split_budget_floats"] = mb * _MB // 4
        fields["tile_budget_floats"] = max(1, (mb - 1)) * _MB // 4
        fields["full_budget_floats"] = max(1, (mb - 1)) * _MB // 4
        r = _run_probe(1024, 1024, fields, args.chunks, args.spc)
        if r is None:
            continue
        print(f"    {mb:>3}MB -> {r['mlups']:.0f} MLUPS")
        if r["mlups"] > best_w_mlups:
            best_w, best_w_mlups = mb, r["mlups"]

    # ---- knob 2: raised wide-band limit (4096-lane bands @ 4096^2) ----
    cands = [24, 32, 40, 48, 56] if not args.quick else [24, 40, 56]
    print("\n[2/3] wide-limit sweep @ 4096^2")
    best_l, best_l_mlups = None, -1.0
    for mb in cands:
        fields = dict(base)
        if best_w is not None:
            fields["split_budget_floats"] = best_w * _MB // 4
            fields["tile_budget_floats"] = (best_w - 1) * _MB // 4
            fields["full_budget_floats"] = (best_w - 1) * _MB // 4
        fields["wide_limit_bytes"] = mb * _MB
        r = _run_probe(4096, 4096, fields, max(3, args.chunks // 2), args.spc)
        if r is None:
            continue
        print(f"    {mb:>3}MB -> {r['mlups']:.0f} MLUPS")
        if r["mlups"] > best_l_mlups:
            best_l, best_l_mlups = mb, r["mlups"]

    # ---- knob 3: VMEM-residency boundary (per-cell cost vs grid size) ----
    # Below the boundary the padded f buffer stays VMEM-resident and per-cell
    # cost is flat; past it everything streams from HBM and the cost jumps
    # several-fold. The threshold lands between the last resident size and
    # the first streaming size (measured by per-cell cost > 2x the smallest
    # grid's).
    sizes = ([768, 1024, 1280, 1536, 2048] if not args.quick
             else [1024, 1536, 2048])
    print("\n[3/3] residency boundary sweep (square grids)")
    fields = dict(base)
    if best_w is not None:
        fields["split_budget_floats"] = best_w * _MB // 4
    costs = []
    for n in sizes:
        r = _run_probe(n, n, fields, max(3, args.chunks // 2), args.spc)
        if r is None:
            continue
        per_mcell = r["us_per_step"] / (n * n / 1e6)
        costs.append((n, per_mcell))
        print(f"    {n}^2 -> {r['mlups']:.0f} MLUPS "
              f"({per_mcell:.0f} us/Mcell-step)")
    pipeline_min = base["pipeline_min_bytes"]
    if len(costs) >= 2:
        base_cost = costs[0][1]
        boundary = None
        for i in range(1, len(costs)):
            if costs[i][1] > 2.0 * base_cost:
                boundary = (costs[i - 1][0], costs[i][0])
                break
        if boundary is not None:
            # padded-f size midway between the two grids (pallas_step pads
            # +2 halo rows and +2*128 halo lanes in the pipelined layout)
            def fp_bytes(n):
                return 4 * 9 * (n + 2) * (n + 256)

            pipeline_min = (fp_bytes(boundary[0]) + fp_bytes(boundary[1])) // 2
            print(f"    boundary between {boundary[0]}^2 and {boundary[1]}^2 "
                  f"-> pipeline_min {pipeline_min // _MB}MB")
        else:
            print("    no residency jump found in the sweep range; keeping "
                  "the spec-scaled threshold")

    out_fields = dict(base)
    if best_w is not None:
        out_fields["split_budget_floats"] = best_w * _MB // 4
        out_fields["tile_budget_floats"] = (best_w - 1) * _MB // 4
        out_fields["full_budget_floats"] = (best_w - 1) * _MB // 4
    if best_l is not None:
        out_fields["wide_limit_bytes"] = best_l * _MB
    out_fields["pipeline_min_bytes"] = int(pipeline_min)

    result = {
        "device_kind": dev.device_kind,
        "measured_at": "tools_calibrate_specs.py",
        "budgets": out_fields,
        "sweep": {
            "working_budget_mb": best_w,
            "working_budget_mlups": best_w_mlups,
            "wide_limit_mb": best_l,
            "wide_limit_mlups": best_l_mlups,
            "residency_costs_us_per_mcell": costs,
        },
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(result, fh, indent=2)
    print(f"\nwrote {args.out}")
    print(f"apply with: export LBM2D_BUDGETS_JSON={os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
