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

Selection rule (VERDICT r4 item 7): measured curves are flat near the top
(the r4 v5e check read 48MB best vs the committed 40MB at <0.5% apart; this
round's working-budget sweep read 12MB vs 13MB at 0.4%), so a raw argmax
flips between flat-band candidates run to run. The tool therefore applies
INCUMBENT HYSTERESIS per knob: if the currently-committed constant's MLUPS
is within ``--tol`` (default 1%) of the sweep's best, the incumbent is
KEPT; only a candidate that genuinely beats the band moves the constant
(then: the smallest candidate inside the band, since a smaller scoped
limit leaves more VMEM to XLA's own workspace — BASELINE.md round 2:
over-raised limits strangle unrelated programs). Repeated calibrations on
the same part are therefore stable by construction: tool output ==
committed constants whenever the committed value is still in the flat
band. All candidates are recorded in the output JSON so a reviewer can
audit the flatness.
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


def _pick_stable(results, tol, incumbent=None):
    """(knob, mlups) list -> stable choice under incumbent hysteresis.

    Keep ``incumbent`` when its measurement sits within ``tol`` of the
    sweep best (repeated calibrations then reproduce the committed
    constant by construction); otherwise the smallest candidate in the
    band (see module docstring selection rule)."""
    if not results:
        return None, -1.0
    by_knob = dict(results)
    best = max(m for _, m in results)
    floor = best * (1.0 - tol)
    if incumbent is not None and by_knob.get(incumbent, -1.0) >= floor:
        return incumbent, by_knob[incumbent]
    knob = min(k for k, m in results if m >= floor)
    return knob, by_knob[knob]


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
    ap.add_argument("--spc", type=int, default=500,
                    help="steps per chunk; 500 keeps the per-chunk host "
                    "sync (~15 ms through a remoted tunnel) out of the "
                    "per-step numbers")
    ap.add_argument("--out", default="device_specs_override.json")
    ap.add_argument("--quick", action="store_true",
                    help="coarser sweeps (3 candidates per knob)")
    ap.add_argument("--tol", type=float, default=0.01,
                    help="flat-range tolerance: per knob, pick the SMALLEST "
                    "candidate within this fraction of the best MLUPS "
                    "(stable under noise; argmax is not)")
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
    sweep_w = []
    for mb in cands:
        fields = dict(base)
        fields["split_budget_floats"] = mb * _MB // 4
        fields["tile_budget_floats"] = max(1, (mb - 1)) * _MB // 4
        fields["full_budget_floats"] = max(1, (mb - 1)) * _MB // 4
        r = _run_probe(1024, 1024, fields, args.chunks, args.spc)
        if r is None:
            continue
        print(f"    {mb:>3}MB -> {r['mlups']:.0f} MLUPS")
        sweep_w.append((mb, r["mlups"]))
    best_w, best_w_mlups = _pick_stable(
        sweep_w, args.tol, incumbent=base["split_budget_floats"] * 4 // _MB
    )
    if best_w is not None:
        print(f"    -> working budget {best_w}MB (incumbent-hysteresis "
              f"pick, tol {args.tol:.0%})")

    # ---- knob 2: raised wide-band limit (4096-lane bands @ 4096^2) ----
    cands = [24, 32, 40, 48, 56] if not args.quick else [24, 40, 56]
    print("\n[2/3] wide-limit sweep @ 4096^2")
    sweep_l = []
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
        sweep_l.append((mb, r["mlups"]))
    best_l, best_l_mlups = _pick_stable(
        sweep_l, args.tol, incumbent=base["wide_limit_bytes"] // _MB
    )
    if best_l is not None:
        print(f"    -> wide limit {best_l}MB (incumbent-hysteresis pick, "
              f"tol {args.tol:.0%})")

    # ---- knob 3: pipeline threshold (cross-program prefetch on vs off) ---
    # pipeline_min_bytes gates the two-slot pipelined schedule: below it the
    # padded f buffer is VMEM-resident and prefetch buys nothing; above it
    # the loads stream from HBM and the prefetch hides them. Calibrate by
    # measuring each size BOTH ways (pipeline_min forced to 1 byte = always
    # on, forced huge = always off) and placing the threshold just under the
    # smallest size where always-on wins by > 3%.
    sizes = ([1024, 1280, 1536, 2048] if not args.quick else [1024, 2048])
    print("\n[3/3] pipeline-threshold sweep (pipelined on vs off per size)")
    pairs = []
    for n in sizes:
        fields_on = dict(base)
        fields_off = dict(base)
        if best_w is not None:
            for f in (fields_on, fields_off):
                f["split_budget_floats"] = best_w * _MB // 4
        fields_on["pipeline_min_bytes"] = 1
        fields_off["pipeline_min_bytes"] = 1 << 60
        r_on = _run_probe(n, n, fields_on, max(3, args.chunks // 2), args.spc)
        r_off = _run_probe(n, n, fields_off, max(3, args.chunks // 2), args.spc)
        if r_on is None or r_off is None:
            continue
        gain = r_on["mlups"] / r_off["mlups"] - 1.0
        pairs.append((n, r_on["mlups"], r_off["mlups"], gain))
        print(f"    {n}^2: pipelined {r_on['mlups']:.0f} vs plain "
              f"{r_off['mlups']:.0f} MLUPS ({gain:+.1%})")
    pipeline_min = base["pipeline_min_bytes"]
    costs = [(n, on, off) for n, on, off, _ in pairs]
    winners = [n for n, _on, _off, gain in pairs if gain > 0.03]
    if winners:
        n_first = min(winners)
        # padded-f bytes for that grid (PY = 1-row halo pair, full width)
        fp = 4 * 9 * (n_first + 2) * n_first
        pipeline_min = min(pipeline_min, max(1, fp - _MB))
        print(f"    pipelining first wins at {n_first}^2 -> "
              f"pipeline_min {pipeline_min // _MB}MB")
    else:
        print("    pipelining never won in the sweep range; keeping the "
              "spec-scaled threshold (it only matters beyond these sizes)")

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
        "selection_rule": (
            f"incumbent hysteresis at tol {args.tol:.0%}: keep the "
            "committed constant while it measures within tol of best; "
            "else smallest candidate in the band (see module docstring)"
        ),
        "sweep": {
            "working_budget_mb": best_w,
            "working_budget_mlups": best_w_mlups,
            "working_budget_candidates": sweep_w,
            "wide_limit_mb": best_l,
            "wide_limit_mlups": best_l_mlups,
            "wide_limit_candidates": sweep_l,
            "pipeline_on_off_mlups": costs,
        },
    }
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(result, fh, indent=2)
    print(f"\nwrote {args.out}")
    print(f"apply with: export LBM2D_BUDGETS_JSON={os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
