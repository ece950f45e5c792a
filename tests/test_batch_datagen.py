"""Lockstep (vmap) batch datagen: same artifacts as the serial pipeline."""

import json
import os

import h5py
import numpy as np

from lbm2d_tpu.pipeline.batch_datagen import group_configs, run_batched
from tests.test_pipeline_e2e import make_project


def make_two_case_project(root, name="LockProj"):
    """Two same-shape cases (different nu) sharing one mask."""
    import yaml

    cfg_name = make_project(root, name=name)
    cfg_dir = os.path.join(root, "SimCases", name, "configs")
    with open(os.path.join(cfg_dir, cfg_name)) as fh:
        cfg = yaml.safe_load(fh)
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["simulation"]["nu"] = 0.03
    cfg2["simulation"]["name"] = "mask_00_Nu0-0300"
    cfg2["outputs"]["video"]["enable"] = False
    cfg["outputs"]["video"]["enable"] = False
    with open(os.path.join(cfg_dir, cfg_name), "w") as fh:
        yaml.safe_dump(cfg, fh, sort_keys=False)
    cfg2_name = "mask_00_cfg_Nu0-0300.yaml"
    with open(os.path.join(cfg_dir, cfg2_name), "w") as fh:
        yaml.safe_dump(cfg2, fh, sort_keys=False)
    return sorted([cfg_name, cfg2_name])


def test_group_configs_splits_by_shape_and_batch(tmp_path):
    root = str(tmp_path)
    names = make_two_case_project(root)
    cfg_dir = os.path.join(root, "SimCases", "LockProj", "configs")
    batches = group_configs(names, cfg_dir, max_batch=16)
    assert len(batches) == 1 and len(batches[0]) == 2
    batches = group_configs(names, cfg_dir, max_batch=1)
    assert len(batches) == 2


def test_lockstep_datagen_end_to_end(tmp_path):
    root = str(tmp_path)
    names = make_two_case_project(root)
    stats = run_batched("LockProj", max_batch=8, root=root, progress=False)
    assert stats["success"] == 2, stats

    plots = os.path.join(root, "outputs", "LockProj", "plots")
    with open(os.path.join(plots, "sim_results.json")) as fh:
        entries = {e["config_filename"]: e for e in json.load(fh)}
    for name in names:
        assert entries[name]["status"] == "Success"

    raw = os.path.join(root, "outputs", "LockProj", "raw")
    for case in ("mask_00_Nu0-0500", "mask_00_Nu0-0300"):
        with h5py.File(os.path.join(raw, f"{case}.h5")) as f:
            t = f["turbulence"][:]
            assert t.shape[0] == 5 and t.shape[1] == 9
            assert np.isfinite(t).all()

    # the two nu values must give different flows (real per-case params)
    with h5py.File(os.path.join(raw, "mask_00_Nu0-0500.h5")) as fa, h5py.File(
        os.path.join(raw, "mask_00_Nu0-0300.h5")
    ) as fb:
        assert not np.allclose(fa["turbulence"][-1], fb["turbulence"][-1])

    # resume: everything skipped on rerun
    stats2 = run_batched("LockProj", max_batch=8, root=root, progress=False)
    assert stats2["success"] == 0 and stats2["skipped"] == 2


def test_lockstep_matches_serial(tmp_path):
    """Lockstep artifacts == serial pipeline artifacts for the same case."""
    from lbm2d_tpu.pipeline.batch_run import run_batch

    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    os.makedirs(root_a)
    os.makedirs(root_b)
    import yaml

    cfg_name_a = make_project(root_a, name="P")
    cfg_name_b = make_project(root_b, name="P")
    # disable video for an apples-to-apples artifact comparison
    for root, cfg_name in ((root_a, cfg_name_a), (root_b, cfg_name_b)):
        path = os.path.join(root, "SimCases", "P", "configs", cfg_name)
        with open(path) as fh:
            cfg = yaml.safe_load(fh)
        cfg["outputs"]["video"]["enable"] = False
        with open(path, "w") as fh:
            yaml.safe_dump(cfg, fh, sort_keys=False)

    run_batch("P", root=root_a, progress=False)
    run_batched("P", max_batch=4, root=root_b, progress=False)

    with h5py.File(os.path.join(root_a, "outputs/P/raw/mask_00_Nu0-0500.h5")) as fa:
        turb_a = fa["turbulence"][:]
    with h5py.File(os.path.join(root_b, "outputs/P/raw/mask_00_Nu0-0500.h5")) as fb:
        turb_b = fb["turbulence"][:]
    np.testing.assert_allclose(turb_a, turb_b, atol=1e-6)


def test_device_resize_matches_host_path(tmp_path):
    """--device_resize output matches the host cv2 path within fp tolerance."""
    root_a = str(tmp_path / "host")
    root_b = str(tmp_path / "dev")
    os.makedirs(root_a)
    os.makedirs(root_b)
    for root in (root_a, root_b):
        make_two_case_project(root, name="RZ")
    run_batched("RZ", max_batch=8, root=root_a, progress=False)
    run_batched("RZ", max_batch=8, root=root_b, progress=False, device_resize=True)
    for case in ("mask_00_Nu0-0500", "mask_00_Nu0-0300"):
        with h5py.File(os.path.join(root_a, "outputs/RZ/raw", f"{case}.h5")) as fa:
            ta = fa["turbulence"][:]
        with h5py.File(os.path.join(root_b, "outputs/RZ/raw", f"{case}.h5")) as fb:
            tb = fb["turbulence"][:]
        assert ta.shape == tb.shape
        np.testing.assert_allclose(ta, tb, atol=5e-5)


def test_sharded_datagen_matches_lockstep(tmp_path):
    """--runner sharded (cases spread over the 8-device mesh) must produce
    byte-identical HDF5 tensors to the single-device lockstep run."""
    import jax

    assert len(jax.devices()) >= 2
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    os.makedirs(root_a)
    os.makedirs(root_b)
    make_two_case_project(root_a, name="SP")
    make_two_case_project(root_b, name="SP")

    stats_a = run_batched("SP", max_batch=8, root=root_a, progress=False)
    stats_b = run_batched(
        "SP", max_batch=8, root=root_b, progress=False,
        runner="sharded", n_devices=2,
    )
    assert stats_a["success"] == 2 and stats_b["success"] == 2

    for case in ("mask_00_Nu0-0500", "mask_00_Nu0-0300"):
        with h5py.File(
            os.path.join(root_a, "outputs/SP/raw", f"{case}.h5")
        ) as fa, h5py.File(
            os.path.join(root_b, "outputs/SP/raw", f"{case}.h5")
        ) as fb:
            np.testing.assert_array_equal(
                fa["turbulence"][:], fb["turbulence"][:],
                err_msg=f"{case}: sharded datagen != lockstep",
            )
