"""End-to-end slice: batch_run over a tiny project -> HDF5 + mp4 + JSON + NPZ.

Exercises the full L5->L1 stack (SURVEY.md section 3.1 call stack) on a
96x64 grid, then validates the resume/skip state machine.
"""

import json
import os

import numpy as np
import pytest
import yaml

import h5py

from lbm2d_tpu.pipeline.batch_run import run_batch
from lbm2d_tpu.io.results_store import get_status_map


def make_project(root, name="TestProj", nx=96, ny=64):
    base = os.path.join(root, "SimCases", name)
    cfg_dir = os.path.join(base, "configs")
    mask_dir = os.path.join(base, "masks")
    os.makedirs(cfg_dir)
    os.makedirs(mask_dir)

    # tiny mask PNG: white background (fluid), dark square (solid)
    img = np.full((ny, nx), 255, np.uint8)
    img[24:36, 30:42] = 0
    mask_file = os.path.join(mask_dir, "mask_00.png")
    import cv2

    cv2.imwrite(mask_file, img)

    config = {
        "simulation": {
            "nx": nx,
            "ny": ny,
            "name": "mask_00_Nu0-0500",
            "nu": 0.05,
            "ghost_moments_s": 1.2,
            "characteristic_length": 12,
            "rho_in": 1.02,
            "rho_out": 1.0,
            "smagorinsky_constant": 0.1,
            "compute_step_size": 10,
            "warmup_steps": 20,
            "max_steps": 60,
        },
        "outputs": {
            "enable_profiling": False,
            "gui": {
                "enable": False,
                "max_size": 256,
                "show_zone_overlay": True,
                "gaussian_sigma": 1.0,
                "interval_steps": 20,
            },
            "video": {
                "enable": True,
                "fps": 30,
                "filename": "mask_00_Nu0-0500.mp4",
                "interval_steps": 20,
            },
            "dataset": {
                "enable": True,
                "compression": "lzf",
                "save_resolution_height": 16,
                "interval_steps": 10,
            },
            "project_name": name,
            "data_save_root": "outputs",
            "target_rho_in": 1.02,
            "start_record_step": 20,
        },
        "boundary_condition": {
            "type": [0, 2, 1, 2],
            "value": [[0.05, 0.0], [0.0, 0.0], [0.0, 0.0], [0.0, 0.0]],
        },
        "mask": {"enable": True, "type": "png", "invert": False, "path": mask_file},
        "domain_zones": {
            "sponge_in": 8,
            "sponge_out": 8,
            "sponge_top": 4,
            "sponge_bot": 4,
            "buffer": 8,
            "sponge_strength": 3.0,
        },
        "physical_constants": {
            "kinematic_viscosity_air_m2_s": 1.5e-5,
            "inlet_velocity_ms": [1.0],
        },
    }
    cfg_name = "mask_00_cfg_Nu0-0500.yaml"
    with open(os.path.join(cfg_dir, cfg_name), "w") as fh:
        yaml.safe_dump(config, fh, sort_keys=False)

    config_meta = [
        {
            "case_name": "mask_00",
            "config_filename": cfg_name,
            "status": "Pending",
            "wall_time_s": None,
            "parameters": {
                "lattice_inputs": {
                    "rho_in": 1.02,
                    "rho_out": 1.0,
                    "characteristic_length_px": 12,
                    "kinematic_viscosity_lu": 0.05,
                    "resolution_px": [nx, ny],
                },
                "simulation_outputs": {"_note": "filled after simulation"},
            },
            "source_files": {"config_file": cfg_name, "mask_file": "mask_00.png"},
        }
    ]
    with open(os.path.join(base, "config_meta.json"), "w") as fh:
        json.dump(config_meta, fh)
    return cfg_name


def test_batch_run_end_to_end(tmp_path):
    root = str(tmp_path)
    cfg_name = make_project(root)

    result = run_batch("TestProj", root=root, progress=False)
    assert result["success"] == 1, result

    plots = os.path.join(root, "outputs", "TestProj", "plots")
    raw = os.path.join(root, "outputs", "TestProj", "raw")
    vis = os.path.join(root, "outputs", "TestProj", "vis")

    # sim_results state machine
    status = get_status_map(os.path.join(plots, "sim_results.json"))
    assert status[cfg_name] == "Success"
    with open(os.path.join(plots, "sim_results.json")) as fh:
        entry = json.load(fh)[0]
    assert entry["parameters"]["simulation_outputs"]["total_steps_executed"] == 60
    assert entry["run_summary"]["h5_file"].endswith(".h5")
    assert entry["wall_time_s"] > 0

    # HDF5 schema
    h5_path = os.path.join(raw, "mask_00_Nu0-0500.h5")
    with h5py.File(h5_path, "r") as f:
        turb = f["turbulence"]
        # data steps at 20,30,40,50,60 (>= start_record 20) -> 5 frames
        assert turb.shape[0] == 5
        assert turb.shape[1] == 9
        assert turb.shape[2] == 16  # save_resolution_height
        sm = f["static_mask"]
        assert sm.shape[0] == 2
        assert set(np.unique(sm[0])) <= {0.0, 1.0}
        # SDF positive in fluid, negative in solid
        assert sm[1].max() > 0
        assert f["mean_vel_field"].shape == turb.shape[1:]
        assert f["mean_vel_sq_field"].shape == turb.shape[2:]
        assert f["sum_vor"].shape == turb.shape[2:]
        cfg_attr = json.loads(f.attrs["config_json"])
        assert "_dataset_info" in cfg_attr
        assert f.attrs["stats_min"].shape == (9,)
        assert np.all(np.isfinite(turb[:]))

    # video (mp4 or frame fallback)
    assert os.path.exists(os.path.join(vis, "mask_00_Nu0-0500.mp4"))

    # legacy summary + NPZ
    with open(os.path.join(plots, "all_cases_summary.json")) as fh:
        legacy = json.load(fh)
    assert legacy[0]["status"] == "Success"
    npz = np.load(os.path.join(plots, "all_cases_vectors.npz"), allow_pickle=True)
    assert npz["vectors"].shape[1] == 21
    assert npz["statuses"][0] == "Success"
    assert np.isfinite(npz["vectors"][0][:9]).all()
    # feature names are a downstream contract: byte-identical to reference
    # io/case_vector_builder.py:27-52
    assert list(npz["feature_names"]) == [
        "lat_rho_in",
        "lat_rho_out",
        "lat_characteristic_length_px",
        "lat_inlet_velocity_lu",
        "lat_kinematic_viscosity_lu",
        "lat_nx",
        "lat_ny",
        "sim_actual_reynolds_number",
        "sim_total_steps_executed",
        "sim_tensor_T",
        "sim_tensor_C",
        "sim_tensor_H",
        "sim_tensor_W",
        "phys_reynolds_number",
        "phys_characteristic_length_m",
        "phys_inlet_velocity_ms",
        "phys_kinematic_viscosity_m2s",
        "phys_cell_size_m",
        "phys_time_step_s",
        "phys_steps_per_second",
        "phys_total_simulation_time_s",
    ]

    # resume: second run must skip everything
    result2 = run_batch("TestProj", root=root, progress=False)
    assert result2["success"] == 0
    assert result2["skipped"] == 1


def test_serial_device_resize_matches_host_path(tmp_path):
    """batch_run --device_resize: on-device crop+resize frames must match
    the host cv2.INTER_AREA path (~1e-6) with identical artifact layout."""
    import h5py
    from lbm2d_tpu.pipeline.batch_run import run_batch

    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    os.makedirs(root_a)
    os.makedirs(root_b)
    import yaml

    for root in (root_a, root_b):
        cfg_name = make_project(root, name="DR")
        path = os.path.join(root, "SimCases", "DR", "configs", cfg_name)
        with open(path) as fh:
            cfg = yaml.safe_load(fh)
        cfg["outputs"]["video"]["enable"] = False
        with open(path, "w") as fh:
            yaml.safe_dump(cfg, fh, sort_keys=False)

    run_batch("DR", root=root_a, progress=False)
    run_batch("DR", root=root_b, progress=False, device_resize=True)

    with h5py.File(
        os.path.join(root_a, "outputs/DR/raw/mask_00_Nu0-0500.h5")
    ) as fa, h5py.File(
        os.path.join(root_b, "outputs/DR/raw/mask_00_Nu0-0500.h5")
    ) as fb:
        ta, tb = fa["turbulence"][:], fb["turbulence"][:]
        assert ta.shape == tb.shape
        np.testing.assert_allclose(ta, tb, rtol=0, atol=2e-5)


def test_serial_device_resize_video_matches_host_path(tmp_path):
    """batch_run --device_resize also renders VIDEO frames on device
    (sim_loop dev_renderer -> uint8 fetch, ~1/30 the full-res u bytes the
    host composer needs): the mp4 must decode to the same frames as the
    host-composer path within colormap-quantization tolerance."""
    import cv2
    from lbm2d_tpu.pipeline.batch_run import run_batch

    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    os.makedirs(root_a)
    os.makedirs(root_b)

    make_project(root_a, name="DV")
    make_project(root_b, name="DV")

    run_batch("DV", root=root_a, progress=False)
    run_batch("DV", root=root_b, progress=False, device_resize=True)

    def decode(root):
        cap = cv2.VideoCapture(
            os.path.join(root, "outputs/DV/vis/mask_00_Nu0-0500.mp4")
        )
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(frame[:, :, ::-1])  # BGR -> RGB
        cap.release()
        return np.asarray(frames)

    fa, fb = decode(root_a), decode(root_b)
    assert fa.shape == fb.shape and len(fa) >= 1
    diff = np.abs(fa.astype(np.int32) - fb.astype(np.int32))
    assert np.mean(diff) < 2.0, f"mean byte diff {np.mean(diff)}"
    assert np.mean(diff > 8) < 0.03, f"large-diff fraction {np.mean(diff > 8)}"
