"""Per-generation TPU kernel-geometry budgets.

The Pallas step kernels size their row bands, scoped-VMEM limits, and the
VMEM-residency pipeline threshold from constants that were *measured* on a
v5e core (128MB physical VMEM): a ~12-13MB scoped-VMEM working budget per
band, a 40MB raised limit for 4096-lane bands, and a 48MB padded-buffer
boundary between the VMEM-resident and HBM-streaming tiers (BASELINE.md,
round 2). Those fractions of physical VMEM carry across generations; the
absolute numbers do not (a v3 core has 16MB VMEM total). This module maps
``jax.devices()[0].device_kind`` to a generation spec and derives the kernel
budgets by scaling the v5e-calibrated fractions, so the same heuristics
tile correctly on v5p/v4/v6e-class parts (BASELINE.json's north-star
hardware is v5p-class) without hard-coding v5e numbers in the kernels.

Unknown kinds (including the CPU interpret-mode test platform) fall back to
the v5e calibration -- the only values actually measured in this repo.
"""

from __future__ import annotations

import dataclasses
import functools

_MB = 1024 * 1024
_CAL_VMEM = 128 * _MB  # the v5e core the budgets were calibrated on


@dataclasses.dataclass(frozen=True)
class TpuSpec:
    """Physical per-core numbers for one TPU generation."""

    name: str
    vmem_bytes: int  # physical VMEM per core
    hbm_gbps: int  # nominal HBM bandwidth per chip (documentation only)


# Matched by substring against device_kind (first hit wins; order matters:
# "v5p" before the bare "v5"). Public per-generation numbers.
_SPEC_TABLE = (
    ("v5 lite", TpuSpec("v5e", 128 * _MB, 819)),
    ("v5e", TpuSpec("v5e", 128 * _MB, 819)),
    ("v5p", TpuSpec("v5p", 128 * _MB, 2765)),
    ("v5", TpuSpec("v5p", 128 * _MB, 2765)),
    ("v6 lite", TpuSpec("v6e", 128 * _MB, 1640)),
    ("v6e", TpuSpec("v6e", 128 * _MB, 1640)),
    ("v6", TpuSpec("v6e", 128 * _MB, 1640)),
    ("v4", TpuSpec("v4", 128 * _MB, 1228)),
    ("v3", TpuSpec("v3", 16 * _MB, 900)),
    ("v2", TpuSpec("v2", 16 * _MB, 700)),
)

_DEFAULT = TpuSpec("v5e-calibrated-default", _CAL_VMEM, 819)

# test/benchmark override; None = detect from jax.devices()
_override: TpuSpec | None = None


def set_spec_override(spec: TpuSpec | None) -> None:
    """Force a spec (tests / offline tuning); None restores detection."""
    global _override
    _override = spec
    budgets.cache_clear()


def spec_for_kind(device_kind: str) -> TpuSpec:
    kind = device_kind.lower()
    for key, spec in _SPEC_TABLE:
        if key in kind:
            return spec
    return _DEFAULT


def current_spec() -> TpuSpec:
    if _override is not None:
        return _override
    try:
        import jax

        dev = jax.devices()[0]
        if dev.platform != "tpu":
            return _DEFAULT
        return spec_for_kind(dev.device_kind)
    except Exception:  # pragma: no cover - backend init failure
        return _DEFAULT


@dataclasses.dataclass(frozen=True)
class KernelBudgets:
    """Derived scoped-VMEM budgets the step kernels tile against.

    All fields scale linearly with physical VMEM from the v5e calibration:
      * tile_budget_floats  -- in-kernel-BC band working set (_pick_tiles);
        12MB of the 16MB default scoped allowance on v5e.
      * split_budget_floats -- split-BC band working set (_pick_split_tiles);
        13MB on v5e (fewer live planes without the BC branches).
      * full_budget_floats  -- closing full-step band working set (adds the
        rho/u/f_post output blocks); 12MB on v5e.
      * base_limit_bytes    -- baseline vmem_limit_bytes (XLA's soft scoped
        default, 16MB on v5e-class parts).
      * wide_limit_bytes    -- raised per-geometry limit for >=4096-lane
        bands (40MB on v5e; past ~48MB XLA's own workspace starves).
      * pipeline_min_bytes  -- padded-f size beyond which buffers no longer
        stay VMEM-resident and cross-program pipelining pays (48MB = 3/8 of
        the 128MB core on v5e).
      * wide_band_rows      -- fast-step band height for >=4096-lane grids
        under wide_limit_bytes (64 rows on v5e).
      * physical_vmem_bytes -- the core's physical VMEM (feasibility ceiling
        for per-geometry limits; generous limits are clipped against it).
    """

    tile_budget_floats: int
    split_budget_floats: int
    full_budget_floats: int
    base_limit_bytes: int
    wide_limit_bytes: int
    pipeline_min_bytes: int
    wide_band_rows: int
    physical_vmem_bytes: int


# measured-budget override (tools_calibrate_specs.py); None = derive from
# the generation spec. Precedence: set_budgets_override > LBM2D_BUDGETS_JSON
# > spec scaling.
_budgets_override: "KernelBudgets | None" = None


def set_budgets_override(b: "KernelBudgets | None") -> None:
    """Force measured kernel budgets (calibration sweeps / tests)."""
    global _budgets_override
    _budgets_override = b
    budgets.cache_clear()


def _budgets_from_json(path: str) -> "KernelBudgets | None":
    import json

    try:
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        fields = {
            f.name: int(data["budgets"][f.name])
            for f in dataclasses.fields(KernelBudgets)
        }
        return KernelBudgets(**fields)
    except (OSError, KeyError, TypeError, ValueError) as exc:
        import sys

        print(f"[device_specs] ignoring invalid budgets override {path}: "
              f"{exc}", file=sys.stderr)
        return None


@functools.lru_cache(maxsize=None)
def budgets() -> KernelBudgets:
    if _budgets_override is not None:
        return _budgets_override
    import os

    path = os.environ.get("LBM2D_BUDGETS_JSON")
    if path:
        loaded = _budgets_from_json(path)
        if loaded is not None:
            return loaded
    return budgets_for(current_spec())


def budgets_for(spec: TpuSpec) -> KernelBudgets:
    scale = spec.vmem_bytes / _CAL_VMEM
    # 16-row floor: bands below the f32 sublane pair stop being meaningful
    wide_rows = 64
    r = scale
    while wide_rows > 16 and r < 1.0:
        wide_rows //= 2
        r *= 2
    return KernelBudgets(
        tile_budget_floats=int(12 * _MB * scale) // 4,
        split_budget_floats=int(13 * _MB * scale) // 4,
        full_budget_floats=int(12 * _MB * scale) // 4,
        base_limit_bytes=int(16 * _MB * scale),
        wide_limit_bytes=int(40 * _MB * scale),
        pipeline_min_bytes=int(48 * _MB * scale),
        wide_band_rows=wide_rows,
        physical_vmem_bytes=spec.vmem_bytes,
    )
