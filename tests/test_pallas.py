"""Fused Pallas step vs the jnp reference path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lbm2d_tpu.core.solver import init_state, make_params, run_chunk
from lbm2d_tpu.ops.pallas_step import run_chunk_pallas
from tests.test_core_vs_oracle import tiny_config


def cfg_grid(nx, ny):
    cfg = tiny_config(nx=nx, ny=ny)
    cfg["domain_zones"].update(
        {"sponge_in": 6, "sponge_out": 10, "sponge_top": 4, "sponge_bot": 4}
    )
    return cfg


def block_mask(ny, nx):
    m = np.zeros((ny, nx), np.float32)
    m[ny // 2 - 4 : ny // 2 + 4, nx // 3 : nx // 3 + 8] = 1.0
    m[10:14, 2 * nx // 3 : 2 * nx // 3 + 5] = 1.0
    return m


def test_pallas_step_matches_jnp_multitile():
    """3x3 tile grid exercises interior + edge + corner halo DMA paths."""
    nx, ny = 384, 96
    cfg = cfg_grid(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    st = init_state(ny, nx)

    ref, ref_mon = run_chunk(st, p, 12)
    got, got_mon = run_chunk_pallas(init_state(ny, nx), p, n_steps=12, interpret=True)

    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.rho), np.asarray(ref.rho), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u), atol=1e-6)
    # f_post: the fast steps leave it stale; after the final full step the
    # interior must match, and the ring must still be the initial equilibrium
    np.testing.assert_allclose(
        np.asarray(got.f_post), np.asarray(ref.f_post), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(got_mon["max_v"]), float(ref_mon["max_v"]), atol=1e-6
    )
    assert int(got.step) == 12


def test_pallas_single_step_no_les():
    nx, ny = 128, 32
    cfg = cfg_grid(nx, ny)
    cfg["simulation"]["smagorinsky_constant"] = 0.0
    p = make_params(cfg, block_mask(ny, nx))
    st = init_state(ny, nx)
    ref, _ = run_chunk(st, p, 1)
    got, _ = run_chunk_pallas(init_state(ny, nx), p, n_steps=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.f_post), np.asarray(ref.f_post), atol=1e-6)


def test_pallas_column_tiled_matches_jnp():
    """Force the column-tiled geometry (real x-halo, PX=128) on a small grid:
    3x3 tiles exercise interior x-halo exchange between column tiles."""
    nx, ny = 384, 96
    cfg = cfg_grid(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)
    got, got_mon = run_chunk_pallas(
        init_state(ny, nx), p, n_steps=12, interpret=True,
        tiles=(32, 16, 128, 128),
    )
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.f_post), np.asarray(ref.f_post), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


def test_pallas_split_bc_column_tiled():
    """split-BC fast steps on 3x3 column tiles (BW=128, PX=128): exports
    gated per tile, edge kernel offset by the x-halo pad, full-width repad
    before the closing full step."""
    nx, ny = 384, 96
    cfg = cfg_grid(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)
    got, got_mon = run_chunk_pallas(
        init_state(ny, nx), p, n_steps=12, interpret=True,
        tiles=(16, 8, 128, 128), split_bc=True,
    )
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.f_post), np.asarray(ref.f_post), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


def test_pallas_column_tiled_nonmultiple_width():
    """Column tiles with W not a multiple of BW (garbage-column region)."""
    nx, ny = 320, 64
    cfg = cfg_grid(nx, ny)
    p = make_params(cfg, block_mask(ny, nx))
    ref, _ = run_chunk(init_state(ny, nx), p, 8)
    got, _ = run_chunk_pallas(
        init_state(ny, nx), p, n_steps=8, interpret=True,
        tiles=(32, 16, 128, 128),  # Wp = 384 > W = 320
    )
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f), atol=1e-6)


def test_pipelined_band_path_matches_jnp(monkeypatch):
    """The cross-program two-slot pipeline (beyond-VMEM wide grids) must be
    bitwise-identical to the jnp chunk; forced on a small grid by shrinking
    the activation threshold."""
    import lbm2d_tpu.ops.pallas_step as ps

    monkeypatch.setattr(ps, "_PIPELINE_MIN_BYTES", 1)
    nx, ny = 128, 64
    cfg = tiny_config(nx=nx, ny=ny)
    mask = np.zeros((ny, nx), np.float32)
    mask[28:36, 40:48] = 1.0
    p = make_params(cfg, mask)
    ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)
    out, mon = ps.run_chunk_pallas(
        init_state(ny, nx), p, n_steps=12, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(ref.u))
    np.testing.assert_allclose(
        np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
    )


def test_pipelined_multiband_halo_carry_matches_jnp(monkeypatch):
    """The halo-carry pipeline with MANY programs per step: 16-row bands on
    a 128-row grid give NPROG = 8, so every window after the first seeds its
    2*PY overlap rows from the previous window's scratch instead of HBM.
    Bitwise vs the jnp chunk."""
    import lbm2d_tpu.ops.pallas_step as ps

    monkeypatch.setattr(ps, "_PIPELINE_MIN_BYTES", 1)
    nx, ny = 128, 128
    cfg = tiny_config(nx=nx, ny=ny)
    mask = np.zeros((ny, nx), np.float32)
    mask[60:68, 40:48] = 1.0
    p = make_params(cfg, mask)
    ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)
    out, mon = ps.run_chunk_pallas(
        init_state(ny, nx), p, n_steps=12, interpret=True,
        tiles=(16, 8, 128, 0), split_bc=True,
    )
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(ref.u))
    np.testing.assert_allclose(
        np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
    )


def test_fused_steps_match_jnp(monkeypatch):
    """Temporal blocking (S fused steps per HBM pass) must be bitwise
    identical to the jnp chunk. Geometry chosen to stress the trapezoid
    bookkeeping: H = 120 with 16-row bands puts the global top row in the
    overlap of the LAST TWO windows (both must apply the top BC), S = 3
    with n_steps = 14 leaves a 1-step remainder on the split-BC path."""
    import lbm2d_tpu.ops.pallas_step as ps

    monkeypatch.setattr(ps, "_FUSE_STEPS", 3)
    monkeypatch.setattr(ps, "_FUSE_BH", 16)
    nx, ny = 128, 120
    cfg = cfg_grid(nx, ny)
    mask = np.zeros((ny, nx), np.float32)
    mask[52:62, 40:50] = 1.0
    p = make_params(cfg, mask)
    assert len(ps._fused_owner_top(ny, 16, 120 // 16 + 1)) == 2
    ref, ref_mon = run_chunk(init_state(ny, nx), p, 14)
    out, mon = ps.run_chunk_pallas(
        init_state(ny, nx), p, n_steps=14, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out.f), np.asarray(ref.f))
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(ref.u))
    np.testing.assert_allclose(
        np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
    )


def test_fused_steps_dfg_modes_match_jnp(monkeypatch):
    """Fused passes with the DFG extensions: full-way bounce-back and
    half-way bounce-back obstacles under the parabolic velocity inlet."""
    import lbm2d_tpu.ops.pallas_step as ps
    from lbm2d_tpu.core.solver import BC_VEL_INLET

    monkeypatch.setattr(ps, "_FUSE_STEPS", 2)
    monkeypatch.setattr(ps, "_FUSE_BH", 16)
    nx, ny = 128, 48
    for obstacle in ("bounce_back", "bounce_back_halfway"):
        cfg = cfg_grid(nx, ny)
        cfg["boundary_condition"] = {
            "type": [3, 0, 1, 0],
            "value": [[0.08, 0.0]] + [[0.0, 0.0]] * 3,
            "obstacle": obstacle,
        }
        mask = np.zeros((ny, nx), np.float32)
        mask[0, :] = 1.0
        mask[-1, :] = 1.0
        mask[20:28, 30:38] = 1.0
        p = make_params(cfg, mask)
        assert p.bc_type[0] == BC_VEL_INLET
        ref, ref_mon = run_chunk(init_state(ny, nx), p, 9)
        out, mon = ps.run_chunk_pallas(
            init_state(ny, nx), p, n_steps=9, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out.f), np.asarray(ref.f), atol=1e-7,
            err_msg=obstacle,
        )
        np.testing.assert_allclose(
            np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
        )


def test_dfg_modes_in_kernel_match_jnp():
    """Bounce-back obstacles + parabolic velocity inlet (type 3) now run in
    the fused kernel: near-bitwise vs the jnp path -- the in-kernel profile
    recomputation matches make_params' f32 op order, but XLA rounds the
    mul/div chain differently on a few rows (observed 3/41472 cells at
    1 ulp), so the inlet comparison allows 1e-8."""
    from lbm2d_tpu.ops.pallas_step import supports

    nx, ny = 96, 48
    cfg = tiny_config(nx=nx, ny=ny)
    cfg["boundary_condition"] = {
        "type": [3, 0, 1, 0],
        "value": [[0.08, 0.0]] + [[0.0, 0.0]] * 3,
        "obstacle": "bounce_back",
    }
    cfg["simulation"]["smagorinsky_constant"] = 0.0
    mask = np.zeros((ny, nx), np.float32)
    yy, xx = np.mgrid[0:ny, 0:nx]
    mask[(yy - ny // 2) ** 2 + (xx - 20) ** 2 < 36] = 1.0
    p = make_params(cfg, mask)
    assert supports(p) and p.bounce_obstacle

    ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)
    out, mon = run_chunk_pallas(init_state(ny, nx), p, n_steps=12, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out.u), np.asarray(ref.u), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out.f_post), np.asarray(ref.f_post), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
    )


def test_store_dev_f16_close_to_f32(monkeypatch):
    """f16 deviation storage (store_dev): the split-BC fast steps keep the
    HBM f buffer as float16 (f_k - w_k) while computing in f32. Lossy by
    design -- the contract is a bounded quantization error vs the exact-f32
    path (~1e-5/step absolute), not bitwise equality. Covers both the plain
    split-BC path and the pipelined halo-carry path (the production 4096^2
    schedule), which also exercises the donated-f16-buffer aliasing."""
    import lbm2d_tpu.ops.pallas_step as ps

    nx, ny = 128, 64
    cfg = cfg_grid(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)

    for pipelined in (False, True):
        if pipelined:
            monkeypatch.setattr(ps, "_PIPELINE_MIN_BYTES", 1)
        out, mon = ps.run_chunk_pallas(
            init_state(ny, nx), p, n_steps=12, interpret=True,
            split_bc=True, store_dev=True,
        )
        f_err = np.max(np.abs(np.asarray(out.f) - np.asarray(ref.f)))
        # must actually have quantized (not silently fallen back to f32) ...
        assert f_err > 0, f"store_dev path inactive (pipelined={pipelined})"
        # ... and stay within the accumulated-quantization-noise budget
        np.testing.assert_allclose(
            np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=5e-4,
            err_msg=f"pipelined={pipelined}",
        )
        np.testing.assert_allclose(
            np.asarray(out.u), np.asarray(ref.u), rtol=0, atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.rho), np.asarray(ref.rho), rtol=0, atol=5e-4
        )
        np.testing.assert_allclose(
            float(mon["max_v"]), float(ref_mon["max_v"]), atol=5e-4
        )
        assert int(out.step) == 12


def test_store_dev_ineligible_falls_back_exact():
    """store_dev silently degrades to exact f32 when the obstacle scheme
    needs raw stored populations (half-way bounce-back reads neighbours'
    previous-step f): the flag must not corrupt those paths."""
    from lbm2d_tpu.core.solver import BC_VEL_INLET

    nx, ny = 128, 48
    cfg = cfg_grid(nx, ny)
    cfg["boundary_condition"] = {
        "type": [3, 0, 1, 0],
        "value": [[0.08, 0.0]] + [[0.0, 0.0]] * 3,
        "obstacle": "bounce_back_halfway",
    }
    mask = np.zeros((ny, nx), np.float32)
    mask[0, :] = 1.0
    mask[-1, :] = 1.0
    mask[20:28, 30:38] = 1.0
    p = make_params(cfg, mask)
    assert p.bc_type[0] == BC_VEL_INLET and p.halfway_obstacle
    ref, _ = run_chunk(init_state(ny, nx), p, 9)
    out, _ = run_chunk_pallas(
        init_state(ny, nx), p, n_steps=9, interpret=True, store_dev=True
    )
    np.testing.assert_allclose(
        np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-7
    )


def test_nebb_inlet_in_kernel_matches_jnp():
    """bc type 4 (NEBB profiled velocity inlet -- the DFG configuration that
    lands the literature-exact coefficients) through the fused kernel: both
    the in-kernel-BC path (96-lane grid) and the split-BC path (128-lane
    grid, forced) must match the jnp reference."""
    from lbm2d_tpu.core.solver import BC_VEL_INLET_NEBB
    from lbm2d_tpu.ops.pallas_step import supports

    for nx, ny, split in ((96, 48, None), (128, 48, True)):
        cfg = cfg_grid(nx, ny)
        cfg["boundary_condition"] = {
            "type": [4, 0, 1, 0],
            "value": [[0.08, 0.0]] + [[0.0, 0.0]] * 3,
            "obstacle": "bounce_back",
        }
        cfg["simulation"]["smagorinsky_constant"] = 0.0
        mask = np.zeros((ny, nx), np.float32)
        yy, xx = np.mgrid[0:ny, 0:nx]
        mask[(yy - ny // 2) ** 2 + (xx - 24) ** 2 < 36] = 1.0
        p = make_params(cfg, mask)
        assert p.bc_type[0] == BC_VEL_INLET_NEBB and supports(p)

        ref, ref_mon = run_chunk(init_state(ny, nx), p, 12)
        out, mon = run_chunk_pallas(
            init_state(ny, nx), p, n_steps=12, interpret=True, split_bc=split
        )
        np.testing.assert_allclose(
            np.asarray(out.f), np.asarray(ref.f), rtol=0, atol=1e-7,
            err_msg=f"split={split}",
        )
        np.testing.assert_allclose(
            np.asarray(out.u), np.asarray(ref.u), rtol=0, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(mon["force"]), np.asarray(ref_mon["force"]), atol=1e-5
        )
