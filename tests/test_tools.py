"""Geometry + config tooling tests: generators, validators, feasibility,
CTU step math, and the masks -> configs -> config_meta pipeline."""

import json
import os

import numpy as np
import pytest
import yaml

from lbm2d_tpu.tools.sampling import get_sampled_value
from lbm2d_tpu.tools.shapes import add_circle, add_rotated_rect, add_triangle, rect_points
from lbm2d_tpu.tools.validators import check_blockage_ratio, check_sdf_validity
from lbm2d_tpu.tools.configgen import (
    check_feasibility,
    fill_blockage_adj,
    fill_physics_and_steps,
    get_all_feasible_nu,
)
from lbm2d_tpu.tools.configgen.constants import MA_LIMIT, RE_MAX, TAU_MIN


def test_sampling_modes():
    import random

    rng = random.Random(0)
    assert get_sampled_value(5, rng) == 5
    v = get_sampled_value([1, 10], rng)
    assert 1 <= v <= 10 and isinstance(v, int)
    v = get_sampled_value([0.1, 0.9], rng)
    assert 0.1 <= v <= 0.9
    assert get_sampled_value(["a", "b", "c"], rng) in {"a", "b", "c"}
    assert get_sampled_value([7], rng) == 7
    assert get_sampled_value([], rng) is None


def test_shapes_rasterize():
    g = np.zeros((64, 64), np.uint8)
    add_circle(g, 16, 16, 5)
    assert g[16, 16] == 1 and g[16, 30] == 0
    add_rotated_rect(g, 40, 40, 10, 6, 30.0)
    assert g[40, 40] == 1
    add_triangle(g, 50, 16, 6, 0.0, "vertex_left")
    assert g.sum() > 80


def test_validators():
    g = np.zeros((64, 64), np.uint8)
    add_rotated_rect(g, 32, 32, 10, 10, 0)
    near = rect_points(40, 32, 6, 6, 0)
    far = rect_points(56, 10, 6, 6, 0)
    assert not check_sdf_validity(g, near, min_dist=10)
    assert check_sdf_validity(g, far, min_dist=10)
    tall = rect_points(10, 32, 6, 60, 0)
    assert not check_blockage_ratio(g, tall, max_ratio=0.5)
    assert check_blockage_ratio(g, far, max_ratio=0.5)


def test_feasibility_gates():
    ok, _ = check_feasibility(1.002, 1.0, 0.02, 100)
    assert ok
    ok, reason = check_feasibility(1.10, 1.0, 0.02, 100)
    assert not ok and "Ma=" in reason
    ok, reason = check_feasibility(1.002, 1.0, 0.001, 100)
    assert not ok and "tau=" in reason
    ok, reason = check_feasibility(1.002, 1.0, 0.007, 5000)
    assert not ok and "RE_MAX" in reason


def test_blockage_and_steps_math():
    sim_ctx = {
        "rho_in": 1.002,
        "rho_out": 1.0,
        "warmup_passes": 8,
        "total_passes": 50,
        "start_record_passes": 20,
        "saves_per_ctu": 20,
        "U_phys": 1.0,
        "nu_air": 1.5e-5,
        "nu_lb_list": [0.05, 0.02, 0.007],
    }
    mask_ctx = {"l_char": 150, "max_blockage": 0.5}
    case = {}
    fill_blockage_adj(case, mask_ctx, sim_ctx)
    assert case["open_fraction"] == 0.5
    assert case["rho_in_case"] <= 1.002
    # u_gap = u_inlet / open_fraction <= U_GAP_MAX
    drho = case["rho_in_case"] - 1.0
    u_b = np.sqrt(2 / 3 * drho)
    assert u_b / case["open_fraction"] <= 0.15 + 1e-9

    case["nu_lb"] = 0.02
    fill_physics_and_steps(case, mask_ctx, sim_ctx)
    spc = case["steps_per_ctu"]
    assert spc == int(150 / (0.6 * case["u_bernoulli"]))
    assert case["warmup_steps"] == 8 * spc
    assert case["max_steps"] == 50 * spc
    assert case["start_record_step"] == 20 * spc
    assert case["interval"] == max(1, int(spc / 20))
    assert case["warmup_steps"] < case["start_record_step"] < case["max_steps"]

    pairs = get_all_feasible_nu(case["rho_in_case"], 1.0, sim_ctx["nu_lb_list"], 150, verbose=False)
    assert all(3 * nu + 0.5 >= TAU_MIN for nu, _ in pairs)
    assert all(re <= RE_MAX for _, re in pairs)


def test_mask_to_config_pipeline(tmp_path, monkeypatch):
    """gen_masks (urban) -> config_batch_gen -> valid per-case YAMLs."""
    monkeypatch.chdir(tmp_path)
    with open("/root/repo/master_config.yaml") as fh:
        master = yaml.safe_load(fh)
    # shrink everything so the test is fast
    master["settings"]["project_name"] = "ToolTest"
    master["settings"]["blockage_buffer"] = 16
    master["map_generator"]["domain"] = {"width": 384, "height": 192}
    # deliberately lane/sublane-misaligned pads: gen_masks must grow the
    # outlet-side and top sponge so nx % 128 == 0 and ny % 8 == 0 (the fused
    # split-BC kernel's fast-path eligibility)
    master["map_generator"]["padding"] = {"left": 48, "right": 70, "top": 31, "bot": 32}
    master["map_generator"]["validation"]["boundary_buffer"] = 8
    master["map_generator"]["step_urban"]["rect_size"] = {"w": [12, 40], "h": [12, 40]}
    master["map_generator"]["step_urban"]["min_distance"] = [4, 8]

    from lbm2d_tpu.tools.map_generators import generate_mask_set

    mask_dir = os.path.join("SimCases", "ToolTest", "masks")
    files = generate_mask_set(master, mask_dir, num_maps=2, mode="urban", seed=7)
    assert len(files) == 2
    with open(os.path.join(mask_dir, "metadata.json")) as fh:
        meta = json.load(fh)
    assert meta[0]["domain_W_total"] == 512  # 384 + 48 + 70 rounded up
    assert meta[0]["domain_H_total"] == 256  # 192 + 31 + 32 rounded up
    assert meta[0]["domain_W_total"] % 128 == 0
    assert meta[0]["domain_H_total"] % 8 == 0
    assert meta[0]["pad_right"] == 70 + (512 - 502)
    assert meta[0]["pad_top"] == 31 + 1

    master_path = "master_small.yaml"
    with open(master_path, "w") as fh:
        yaml.safe_dump(master, fh)

    from lbm2d_tpu.tools.config_batch_gen import generate_all

    metas = generate_all(master_path)
    assert metas, "no configs generated"
    cfg_dir = os.path.join("SimCases", "ToolTest", "configs")
    cfg_files = sorted(os.listdir(cfg_dir))
    assert len(cfg_files) == len(metas)

    with open(os.path.join(cfg_dir, cfg_files[0])) as fh:
        case_cfg = yaml.safe_load(fh)
    sim = case_cfg["simulation"]
    assert sim["nx"] == meta[0]["domain_W_total"]
    assert sim["ny"] == meta[0]["domain_H_total"]
    assert sim["nu"] > 0 and sim["max_steps"] > sim["warmup_steps"] > 0
    dz = case_cfg["domain_zones"]
    assert dz["sponge_in"] == max(1, 48 - 16)
    assert dz["sponge_out"] == max(1, 80 - 16)
    # crop window used by the HDF5 writer must be non-empty
    buf = dz["buffer"]
    assert sim["nx"] - dz["sponge_out"] - buf - dz["sponge_in"] > 0
    assert sim["ny"] - dz["sponge_top"] - buf - (dz["sponge_bot"] + buf) > 0

    # config_meta has the 3-tier physics
    with open(os.path.join("SimCases", "ToolTest", "config_meta.json")) as fh:
        cm = json.load(fh)
    params = cm[0]["parameters"]
    assert "lattice_inputs" in params
    assert "wind_tunnel_model_scale" in params
    assert cm[0]["status"] == "Pending"


def test_tier3_real_world_scale(tmp_path):
    from lbm2d_tpu.tools.config_batch_gen import build_tier3

    case = {"u_bernoulli": 0.05, "nu_lb": 0.02, "max_steps": 100000}
    mask_ctx = {"l_char": 150}
    sim_ctx = {
        "nu_air": 1.5e-5,
        "U_phys": 1.0,
        "physical_constants": {"inlet_velocity_ms": [1.0, 5.0]},
    }
    t3 = build_tier3(case, mask_ctx, sim_ctx, {"m_per_px": 2.0})
    assert t3 is not None
    assert t3["m_per_px"] == 2.0
    assert "1.0_ms" in t3["wind_speed_cases"]
    assert "5.0_ms" in t3["wind_speed_cases"]
    re1 = t3["wind_speed_cases"]["1.0_ms"]["reynolds_number"]
    re5 = t3["wind_speed_cases"]["5.0_ms"]["reynolds_number"]
    assert re5 == pytest.approx(5 * re1)
    assert build_tier3(case, mask_ctx, sim_ctx, {}) is None


def test_generator_geometry_matches_rasterized_mask(tmp_path, monkeypatch):
    """Generators record the analytic shape list (obstacle_geometry) and the
    config chain threads it into the per-case YAML; re-rasterizing the
    recorded union reproduces the shipped mask (Bouzidi production chain,
    VERDICT r3 weak #5)."""
    monkeypatch.chdir(tmp_path)
    with open("/root/repo/master_config.yaml") as fh:
        master = yaml.safe_load(fh)
    master["settings"]["project_name"] = "GeoTest"
    master["settings"]["blockage_buffer"] = 16
    master["map_generator"]["domain"] = {"width": 384, "height": 192}
    master["map_generator"]["padding"] = {"left": 48, "right": 64, "top": 32, "bot": 32}
    master["map_generator"]["validation"]["boundary_buffer"] = 8
    master["map_generator"]["step_urban"]["rect_size"] = {"w": [12, 40], "h": [12, 40]}
    master["map_generator"]["step_urban"]["min_distance"] = [4, 8]

    from lbm2d_tpu.tools.map_generators import generate_mask_set
    from lbm2d_tpu.tools.shapes import (
        add_circle, add_rotated_rect, add_triangle,
    )

    mask_dir = os.path.join("SimCases", "GeoTest", "masks")
    files = generate_mask_set(master, mask_dir, num_maps=2, mode="hybrid", seed=11)
    with open(os.path.join(mask_dir, "metadata.json")) as fh:
        meta = json.load(fh)

    import cv2

    for entry, fname in zip(meta, files):
        geom = entry["obstacle_geometry"]
        assert geom["shape"] == "union" and len(geom["parts"]) >= 1
        ny, nx = entry["domain_H_total"], entry["domain_W_total"]
        # re-rasterize the recorded shapes into the padded domain
        grid = np.zeros((ny, nx), np.uint8)
        for part in geom["parts"]:
            if part["shape"] == "cylinder":
                add_circle(grid, part["cx"], part["cy"], part["r"])
            elif part["shape"] == "rect":
                add_rotated_rect(grid, part["cx"], part["cy"], part["w"],
                                 part["h"], part["angle_deg"])
            elif part["shape"] == "triangle":
                add_triangle(grid, part["cx"], part["cy"], part["size"],
                             part["angle_deg"], part["orientation"])
        # apply the generator's boundary-buffer wipe (core coordinates)
        buf = master["map_generator"]["validation"]["boundary_buffer"]
        pl, pb = entry["pad_left"], entry["pad_bot"]
        w_core = 384
        grid[:, : pl + buf] = 0
        grid[:, pl + w_core - buf :] = 0

        png = cv2.imread(os.path.join(mask_dir, fname), cv2.IMREAD_GRAYSCALE)
        solid_png = (png < 127).astype(np.uint8)  # dark = solid
        inter = int(((grid > 0) & (solid_png > 0)).sum())
        union = int(((grid > 0) | (solid_png > 0)).sum())
        assert union > 0
        assert inter / union > 0.95, f"{fname}: IoU {inter / union:.3f}"

    # the config chain threads the geometry into the case YAML
    master_path = "master_geo.yaml"
    with open(master_path, "w") as fh:
        yaml.safe_dump(master, fh)
    from lbm2d_tpu.tools.config_batch_gen import generate_all

    generate_all(master_path)
    cfg_dir = os.path.join("SimCases", "GeoTest", "configs")
    cfg_files = sorted(os.listdir(cfg_dir))
    assert cfg_files
    with open(os.path.join(cfg_dir, cfg_files[0])) as fh:
        case_cfg = yaml.safe_load(fh)
    got = case_cfg["boundary_condition"]["obstacle_geometry"]
    assert got["shape"] == "union" and len(got["parts"]) >= 1
