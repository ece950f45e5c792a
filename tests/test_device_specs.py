"""Device-parameterized kernel budgets (ops/device_specs.py).

VERDICT round-2 weak #6: the tile/VMEM heuristics were v5e-measured
constants with nothing querying the device. These tests pin (a) the v5e
calibration is unchanged (the measured-fast values on the one real chip),
(b) kind-string detection, and (c) that on synthetic smaller-VMEM devices
the picked band geometry still fits the scaled scoped-VMEM budget.
"""

import pytest

from lbm2d_tpu.ops import device_specs as ds
from lbm2d_tpu.ops import pallas_step as ps

_MB = 1024 * 1024


@pytest.fixture(autouse=True)
def _restore_override():
    yield
    ds.set_spec_override(None)


def test_v5e_calibration_unchanged():
    b = ds.budgets_for(ds.TpuSpec("v5e", 128 * _MB, 819))
    assert b.tile_budget_floats == 12 * _MB // 4
    assert b.split_budget_floats == 13 * _MB // 4
    assert b.base_limit_bytes == 16 * _MB
    assert b.wide_limit_bytes == 40 * _MB
    assert b.pipeline_min_bytes == 48 * _MB
    assert b.wide_band_rows == 64


def test_kind_detection():
    assert ds.spec_for_kind("TPU v5 lite").name == "v5e"
    assert ds.spec_for_kind("TPU v5p").name == "v5p"
    assert ds.spec_for_kind("TPU v5").name == "v5p"
    assert ds.spec_for_kind("TPU v4").name == "v4"
    assert ds.spec_for_kind("TPU v6 lite").name == "v6e"
    assert ds.spec_for_kind("TPU v3").name == "v3"
    assert ds.spec_for_kind("weird accelerator").name.endswith("default")
    # v5p / v6e / v4 share the 128MB VMEM core: same budgets as v5e
    assert ds.budgets_for(ds.spec_for_kind("TPU v5p")) == ds.budgets_for(
        ds.spec_for_kind("TPU v5 lite")
    )


@pytest.mark.parametrize("vmem_mb", [16, 32, 64, 128])
@pytest.mark.parametrize(
    "shape", [(256, 256), (1024, 1024), (2048, 2048), (4096, 4096), (4096, 1024)]
)
def test_picked_geometry_fits_scaled_budget(vmem_mb, shape):
    ds.set_spec_override(ds.TpuSpec(f"synthetic-{vmem_mb}", vmem_mb * _MB, 819))
    ds.budgets.cache_clear()
    h, w = shape
    b = ds.budgets()
    assert b.pipeline_min_bytes == 48 * _MB * vmem_mb // 128

    # split-BC fast bands: live planes/row (18 lane-roll / 32 halo-slice)
    for px in (0, 128):
        bh, bw, pxo = ps._pick_split_tiles(h, w, px)
        assert bh >= 16 and bh % 16 == 0
        planes = 18 if pxo == 0 else 32
        limit = ps._vmem_limit(
            ps._round_up(h, bh), ps._round_up(w, bw), bw, pxo, True, 128
        )
        if bw >= 4096 and pxo == 0:
            # wide-band rows halve with VMEM until the 16-row floor
            assert bh <= b.wide_band_rows
            assert limit >= b.wide_limit_bytes
        elif bh > 16:
            # above the 16-row hardware floor the geometry must respect the
            # scaled budget; at the floor the picker returns the minimum
            # possible band even if a tiny synthetic budget is exceeded
            working = 4 * (planes * bh + 4 * ps.PY * 9) * (bw + 2 * pxo)
            assert working <= 4 * b.split_budget_floats
            assert working <= limit + 4 * (3 * ps._round_up(h, bh) * 128)

    # in-kernel-BC bands: ~32 planes/row fast, full adds ~12
    bh_fast, bh_full, bw, pxo = ps._pick_tiles(h, w)
    assert bh_fast >= 16
    if bh_fast > 16:
        working = 4 * (
            9 * (bh_fast + 2 * ps.PY) * (bw + 2 * pxo) + 23 * bh_fast * bw
        )
        assert working <= 4 * b.tile_budget_floats


def test_pipeline_threshold_uses_device_budget(monkeypatch):
    ds.set_spec_override(ds.TpuSpec("synthetic-32", 32 * _MB, 819))
    ds.budgets.cache_clear()
    assert ps._pipeline_min_bytes() == 12 * _MB
    monkeypatch.setattr(ps, "_PIPELINE_MIN_BYTES", 1)
    assert ps._pipeline_min_bytes() == 1


def test_budgets_json_override(tmp_path, monkeypatch):
    """LBM2D_BUDGETS_JSON (tools_calibrate_specs.py output) wins over the
    spec scaling; invalid files fall back; set_budgets_override wins over
    both."""
    import dataclasses
    import json

    from lbm2d_tpu.ops import device_specs as ds

    base = ds.budgets_for(ds.current_spec())
    fields = {f.name: getattr(base, f.name)
              for f in dataclasses.fields(ds.KernelBudgets)}
    fields["split_budget_floats"] = 99 * 1024 * 1024 // 4
    path = tmp_path / "override.json"
    path.write_text(json.dumps({"budgets": fields}))

    monkeypatch.setenv("LBM2D_BUDGETS_JSON", str(path))
    ds.budgets.cache_clear()
    try:
        got = ds.budgets()
        assert got.split_budget_floats == 99 * 1024 * 1024 // 4
        # every other field preserved
        assert got.wide_limit_bytes == base.wide_limit_bytes

        # corrupt file -> ignored, spec scaling restored
        path.write_text("{not json")
        ds.budgets.cache_clear()
        assert ds.budgets() == base

        # explicit override beats the env var
        path.write_text(json.dumps({"budgets": fields}))
        forced = dataclasses.replace(base, wide_band_rows=32)
        ds.set_budgets_override(forced)
        assert ds.budgets() == forced
    finally:
        ds.set_budgets_override(None)
        monkeypatch.delenv("LBM2D_BUDGETS_JSON")
        ds.budgets.cache_clear()
