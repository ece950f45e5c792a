"""Engine facade tests: reference-compatible API, checkpoint/resume."""

import numpy as np
import pytest

from lbm2d_tpu.core.engine import LBMEngine
from tests.test_core_vs_oracle import tiny_config


def make_engine(nx=48, ny=24):
    cfg = tiny_config(nx=nx, ny=ny)
    cfg["simulation"]["name"] = "eng"
    cfg["simulation"]["characteristic_length"] = 8
    mask = np.zeros((ny, nx), np.float32)
    mask[10:14, 16:20] = 1.0
    return LBMEngine(cfg, mask), cfg


def test_engine_api_surface():
    eng, cfg = make_engine()
    assert eng.Re > 0
    eng.run_step(10)
    f = eng.get_force()
    assert f.shape == (2,)
    assert np.isfinite(eng.get_max_velocity())
    u, mask = eng.get_physical_fields()
    assert u.shape == (2, 24, 48)
    assert mask.shape == (24, 48)
    m = eng.get_moments()
    assert m.shape == (9, 24, 48)
    assert eng.step_count == 10
    eng.init()
    assert eng.step_count == 0


def test_checkpoint_resume(tmp_path):
    eng, cfg = make_engine()
    eng.run_step(20)
    ckpt = str(tmp_path / "state.npz")
    eng.save_checkpoint(ckpt)
    eng.run_step(15)
    f_direct = np.array(eng.state.f)
    mon_direct = eng.get_force()

    eng2, _ = make_engine()
    eng2.load_checkpoint(ckpt)
    assert eng2.step_count == 20
    eng2.run_step(15)
    np.testing.assert_array_equal(np.array(eng2.state.f), f_direct)
    np.testing.assert_array_equal(eng2.get_force(), mon_direct)


def test_engine_rejects_bad_mask_shape():
    cfg = tiny_config(nx=48, ny=24)
    cfg["simulation"]["name"] = "eng"
    cfg["simulation"]["characteristic_length"] = 8
    with pytest.raises(ValueError):
        LBMEngine(cfg, np.zeros((48, 24), np.float32))  # transposed


def test_make_params_rejects_horizontal_pressure_outlet():
    # type-1 on top/bottom would deviate from the reference's corner-cell
    # outlet quirk (LBM2D_MRT_LES.py:495-527); make_params must refuse it.
    from lbm2d_tpu.core.solver import make_params

    cfg = tiny_config()
    cfg["boundary_condition"]["type"] = [0, 1, 1, 2]
    with pytest.raises(ValueError, match="top/bottom"):
        make_params(cfg)
