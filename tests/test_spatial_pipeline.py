"""Spatial sharding as a production pipeline entry (VERDICT r4 item 1).

The sharded step has been parity-tested at the parallel/ layer since round 2
(tests/test_parallel.py); these tests pin the NEW wiring: `LBMEngine`
resolves a sharded chunk runner from ``spatial_mesh``, and
`batch_run --spatial_mesh` produces the FULL artifact set (HDF5 + summary +
NPZ + resume state) dataset-byte-identical to the serial path on the
8-device CPU mesh.
"""

import json
import os

import h5py
import numpy as np
import pytest

from lbm2d_tpu.core.engine import LBMEngine, parse_spatial_mesh
from tests.test_pipeline_e2e import make_project


def _load_cfg(root, name, cfg_name):
    import yaml

    with open(os.path.join(root, "SimCases", name, "configs", cfg_name)) as fh:
        return yaml.safe_load(fh)


def _mask_for(cfg, root, name):
    from lbm2d_tpu.utils.masks import create_mask

    mask_path = os.path.join(
        root, "SimCases", name, "masks",
        os.path.basename(cfg["mask"]["path"]),
    )
    return create_mask(cfg, mask_path).astype(np.float32)


# ------------------------------------------------------------- parse helper

def test_parse_spatial_mesh():
    assert parse_spatial_mesh(None) is None
    assert parse_spatial_mesh("") is None
    assert parse_spatial_mesh("2x4") == (2, 4)
    assert parse_spatial_mesh("1X8") == (1, 8)
    assert parse_spatial_mesh([4, 2]) == (4, 2)
    assert parse_spatial_mesh(8) == (2, 4)  # most-square factorization
    assert parse_spatial_mesh("auto") == (2, 4)  # 8 CPU devices (conftest)
    with pytest.raises(ValueError):
        parse_spatial_mesh("2x4x1")


# ------------------------------------------------------- engine-level parity

def test_engine_spatial_matches_serial(tmp_path):
    """Sharded engine == serial engine bitwise on f/rho/u + monitors."""
    root = str(tmp_path)
    cfg_name = make_project(root)
    cfg = _load_cfg(root, "TestProj", cfg_name)
    mask = _mask_for(cfg, root, "TestProj")

    serial = LBMEngine(cfg, mask_yx=mask)
    sharded = LBMEngine(cfg, mask_yx=mask, spatial_mesh="2x4")
    assert sharded.mesh is not None and sharded.mesh.devices.shape == (2, 4)
    serial.init()
    sharded.init()
    for _ in range(3):
        serial.run_step(10)
        sharded.run_step(10)
    assert serial.step_count == sharded.step_count == 30
    np.testing.assert_array_equal(
        np.asarray(serial.state.f), np.asarray(sharded.state.f)
    )
    np.testing.assert_array_equal(
        np.asarray(serial.state.u), np.asarray(sharded.state.u)
    )
    # the force reduction sums per-shard then psums -- reassociated f32
    # addition, so last-ulp differences are expected (state stays bitwise)
    np.testing.assert_allclose(
        serial.get_force(), sharded.get_force(), atol=1e-5, rtol=1e-5
    )
    assert serial.get_max_velocity() == sharded.get_max_velocity()
    np.testing.assert_array_equal(serial.get_moments(), sharded.get_moments())


def test_engine_spatial_checkpoint_roundtrip(tmp_path):
    """Checkpoints are gathered: a 2x4 run resumes on 1x8 and stays exact."""
    root = str(tmp_path)
    cfg_name = make_project(root)
    cfg = _load_cfg(root, "TestProj", cfg_name)
    mask = _mask_for(cfg, root, "TestProj")

    a = LBMEngine(cfg, mask_yx=mask, spatial_mesh="2x4")
    a.init()
    a.run_step(20)
    ckpt = str(tmp_path / "case.ckpt.npz")
    a.save_checkpoint(ckpt)
    a.run_step(10)

    b = LBMEngine(cfg, mask_yx=mask, spatial_mesh=(1, 8))
    b.load_checkpoint(ckpt)
    assert b.step_count == 20
    b.run_step(10)
    np.testing.assert_array_equal(np.asarray(a.state.f), np.asarray(b.state.f))


def test_engine_spatial_mesh_errors(tmp_path):
    root = str(tmp_path)
    cfg_name = make_project(root)
    cfg = _load_cfg(root, "TestProj", cfg_name)
    mask = _mask_for(cfg, root, "TestProj")
    with pytest.raises(ValueError, match="not divisible"):
        LBMEngine(cfg, mask_yx=mask, spatial_mesh="1x5")  # nx=96 % 5 != 0
    with pytest.raises(ValueError, match="devices"):
        LBMEngine(cfg, mask_yx=mask, spatial_mesh="4x4")  # 16 > 8 devices


def test_batch_run_rejects_lockstep_plus_spatial(tmp_path):
    from lbm2d_tpu.pipeline.batch_run import run_batch

    with pytest.raises(ValueError, match="spatial_mesh"):
        run_batch("X", root=str(tmp_path), lockstep=True, spatial_mesh="2x4")


# ------------------------------------------------- pipeline artifact parity

def _h5_tree(path):
    """{dataset name: bytes, '@'+attr: value} snapshot of an HDF5 file."""
    out = {}
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                out[name] = np.asarray(obj[...]).tobytes()
                for k, v in obj.attrs.items():
                    out[f"{name}@{k}"] = (
                        v.tobytes() if isinstance(v, np.ndarray) else v
                    )
        f.visititems(visit)
        for k, v in f.attrs.items():
            out[f"@{k}"] = v.tobytes() if isinstance(v, np.ndarray) else v
    return out


def test_batch_run_spatial_artifact_parity(tmp_path):
    """batch_run --spatial_mesh 2x4 produces the identical artifact set.

    This is the VERDICT r4 done-criterion: a case runs end-to-end through
    the SHARDED engine from the production CLI entry and its HDF5 (datasets
    AND attrs, byte-compared), sim_results, summary, and NPZ match the
    serial run exactly.
    """
    from lbm2d_tpu.pipeline.batch_run import run_batch

    roots = {}
    for tag, mesh in (("serial", None), ("sharded", "2x4")):
        root = str(tmp_path / tag)
        os.makedirs(root)
        make_project(root)
        stats = run_batch(
            "TestProj", root=root, progress=False, spatial_mesh=mesh
        )
        assert stats == {"success": 1, "skipped": 0, "failed": 0}
        roots[tag] = root

    out = {t: os.path.join(r, "outputs", "TestProj") for t, r in roots.items()}

    # HDF5: every dataset and attr byte-identical
    h5s = {
        t: _h5_tree(os.path.join(p, "raw", "mask_00_Nu0-0500.h5"))
        for t, p in out.items()
    }
    assert set(h5s["serial"]) == set(h5s["sharded"])
    for k in h5s["serial"]:
        a, b = h5s["serial"][k], h5s["sharded"][k]
        if k == "@config_json":
            # identical up to the absolute mask path (the two runs live in
            # different tmp roots); compare structurally without it
            a, b = json.loads(a), json.loads(b)
            a["mask"].pop("path"), b["mask"].pop("path")
        assert a == b, f"h5 mismatch at {k}"

    # sim_results entry identical up to wall time
    entries = {}
    for t, p in out.items():
        with open(os.path.join(p, "plots", "sim_results.json")) as fh:
            (e,) = json.load(fh)
        e.pop("wall_time_s", None)
        entries[t] = e
    assert entries["serial"] == entries["sharded"]

    # NPZ feature matrix identical
    vecs = {
        t: np.load(os.path.join(p, "plots", "all_cases_vectors.npz"),
                   allow_pickle=True)
        for t, p in out.items()
    }
    np.testing.assert_array_equal(vecs["serial"]["vectors"],
                                  vecs["sharded"]["vectors"])

    # video present in both (encoder output not byte-compared: container
    # metadata isn't part of the artifact contract)
    for p in out.values():
        mp4 = os.path.join(p, "vis", "mask_00_Nu0-0500.mp4")
        assert os.path.exists(mp4) and os.path.getsize(mp4) > 0
