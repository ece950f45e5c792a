"""Multi-device tests on the virtual 8-device CPU mesh: sharded step ==
unsharded step, and vmap batch == per-case runs with divergence freezing."""

import numpy as np
import jax
import jax.numpy as jnp

from lbm2d_tpu.core.solver import init_state, make_params, run_chunk
from lbm2d_tpu.parallel.topology import make_mesh, shard_state
from lbm2d_tpu.parallel.sharded import run_chunk_sharded, run_chunk_sharded_pallas
from lbm2d_tpu.parallel.batch import BatchEngine, init_batch_state, run_chunk_batched, stack_params
from tests.test_core_vs_oracle import tiny_config


def grid_config(nx, ny, rho_in=1.02):
    cfg = tiny_config(nx=nx, ny=ny)
    cfg["simulation"]["rho_in"] = rho_in
    return cfg


def block_mask(ny, nx):
    m = np.zeros((ny, nx), np.float32)
    m[ny // 2 - 3 : ny // 2 + 3, nx // 3 : nx // 3 + 6] = 1.0
    return m


def test_sharded_equals_unsharded():
    assert len(jax.devices()) >= 8, "needs the 8-device virtual CPU mesh"
    nx, ny = 64, 32
    cfg = grid_config(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    st0 = init_state(ny, nx)

    ref_state, ref_mon = run_chunk(st0, p, 20)

    mesh = make_mesh(shape=(2, 4))
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded(st_sh, p_sh, n_steps=20, mesh=mesh, ny=ny, nx=nx)

    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=2e-6,
        err_msg="sharded f diverged from single-device f",
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(sh_mon["max_v"]), float(ref_mon["max_v"]), atol=2e-6
    )


def test_sharded_pallas_equals_unsharded():
    """The per-shard fused Pallas kernel (interpret mode) over a 2x4 mesh
    must reproduce the single-device jnp chunk: in-kernel BCs gated by the
    shard's global origin + padded-layout halo exchange."""
    assert len(jax.devices()) >= 8, "needs the 8-device virtual CPU mesh"
    nx, ny = 128, 64
    cfg = grid_config(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)

    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 12)

    mesh = make_mesh(shape=(2, 4))  # local blocks 32 x 32
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=12, mesh=mesh, ny=ny, nx=nx,
        interpret=True, tiles=(16, 8, 32, 128),
    )

    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6,
        err_msg="sharded-pallas f diverged from single-device f",
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.rho), np.asarray(ref_state.rho), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f_post), np.asarray(ref_state.f_post), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(sh_mon["max_v"]), float(ref_mon["max_v"]), atol=1e-6
    )


def test_sharded_pallas_split_bc():
    """Eligible rows-only geometry (wl % 128 == 0, hl % 8 == 0, hl >= 16)
    auto-selects the split-BC fast path: bandless-BC kernel + edge kernel
    gated by the shard origin; must match the single-device jnp chunk."""
    assert len(jax.devices()) >= 8
    nx, ny = 128, 64
    cfg = grid_config(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 12)

    mesh = make_mesh(shape=(4, 1), devices=jax.devices()[:4])  # hl=16, wl=128
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=12, mesh=mesh, ny=ny, nx=nx, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f_post), np.asarray(ref_state.f_post), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


def test_sharded_pallas_store_dev_close_to_f32():
    """16-bit deviation storage under shard_map: the per-shard fast steps
    keep f as bf16 deviations and the ppermute halo rows ride at half the
    bytes. Lossy by contract -- bounded error vs the single-device exact
    chunk; covers the rows-only (PX=0, carried halo rows) and 2D-mesh
    (PX=128, DUS halo ring) decompositions."""
    assert len(jax.devices()) >= 8
    nx, ny = 256, 64
    cfg = grid_config(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    ref_state, _ = run_chunk(init_state(ny, nx), p, 10)

    for shape in ((4, 1), (2, 2)):  # rows-only; 2D mesh (wl=128 lanes)
        ndev = shape[0] * shape[1]
        mesh = make_mesh(shape=shape, devices=jax.devices()[:ndev])
        st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
        sh_state, _ = run_chunk_sharded_pallas(
            st_sh, p_sh, n_steps=10, mesh=mesh, ny=ny, nx=nx, interpret=True,
            store_dev=True,
        )
        f_err = np.abs(np.asarray(sh_state.f) - np.asarray(ref_state.f)).max()
        assert f_err > 0, f"store_dev inactive on mesh {shape}"
        np.testing.assert_allclose(
            np.asarray(sh_state.f), np.asarray(ref_state.f), rtol=0,
            atol=5e-4, err_msg=f"mesh {shape}",
        )
        np.testing.assert_allclose(
            np.asarray(sh_state.u), np.asarray(ref_state.u), rtol=0, atol=5e-4
        )


def test_sharded_pallas_nonmultiple_band():
    """Row-only decomposition (dx == 1, PX = 0 fast geometry): local height
    not a band multiple (garbage rows inside the padded buffer), local-wrap
    x handled by lane rolls + ring BCs like single-chip."""
    nx, ny = 96, 40
    cfg = grid_config(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    ref_state, _ = run_chunk(init_state(ny, nx), p, 8)

    mesh = make_mesh(shape=(8, 1))  # local blocks 5 x 96; Hp = 8 > hl = 5
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, _ = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=8, mesh=mesh, ny=ny, nx=nx,
        interpret=True, tiles=(8, 8, 96, 0),  # bh_full=4 would split the
        # top edge row (hl=5) from its inward neighbor across bands
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )


def test_mesh_shapes():
    mesh = make_mesh(shape=(4, 2))
    assert mesh.shape == {"dy": 4, "dx": 2}
    mesh2 = make_mesh(shape=(1, 8))
    assert mesh2.shape == {"dy": 1, "dx": 8}


def test_batch_matches_percase():
    nx, ny = 48, 24
    cfgs = [grid_config(nx, ny, rho_in=1.01), grid_config(nx, ny, rho_in=1.03)]
    masks = [block_mask(ny, nx), np.zeros((ny, nx), np.float32)]

    be = BatchEngine(cfgs, masks)
    be.run_step(15)
    batched_f = np.asarray(be.state.f)

    for i, (cfg, mask) in enumerate(zip(cfgs, masks)):
        p = make_params(cfg, mask)
        st, _ = run_chunk(init_state(ny, nx), p, 15)
        np.testing.assert_allclose(
            batched_f[i], np.asarray(st.f), atol=1e-6,
            err_msg=f"case {i} batched != solo",
        )
    assert be.alive_mask.all()


def test_batch_sequential_pallas_matches_vmap():
    """BatchEngine(runner='pallas') -- sequential fused-kernel advancement --
    must reproduce the vmap lockstep path exactly (interpret mode on CPU),
    including the divergence freeze."""
    nx, ny = 64, 32
    good = grid_config(nx, ny, rho_in=1.02)
    bad = grid_config(nx, ny, rho_in=1.02)
    bad["simulation"]["nu"] = -0.16  # tau < 0.5: unconditionally unstable
    bad["simulation"]["warmup_steps"] = 1
    masks = [block_mask(ny, nx), block_mask(ny, nx)]

    be_v = BatchEngine([good, bad], masks, runner="vmap")
    be_p = BatchEngine([good, bad], masks, runner="pallas")
    for _ in range(6):
        mv = be_v.run_step(10)
        mp = be_p.run_step(10)
    assert (be_v.alive_mask == be_p.alive_mask).all()
    assert be_p.alive_mask[0] and not be_p.alive_mask[1]
    np.testing.assert_allclose(
        np.asarray(be_p.state.f[0]), np.asarray(be_v.state.f[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mp["force"]), np.asarray(mv["force"]), atol=1e-4
    )
    np.testing.assert_allclose(be_p.get_moments()[0], be_v.get_moments()[0], atol=1e-5)


def test_batch_sequential_store_dev_close_to_f32():
    """BatchEngine(store_dev=True): the sequential path keeps the HBM f
    buffer as 16-bit deviations between chunks. Lossy by contract -- bounded
    quantization noise vs the exact run, and the flag must actually engage
    (128-lane grid so the split-BC path is eligible)."""
    nx, ny = 128, 32
    cfgs = [grid_config(nx, ny, rho_in=1.02), grid_config(nx, ny, rho_in=1.03)]
    masks = [block_mask(ny, nx), block_mask(ny, nx)]

    be_ref = BatchEngine(cfgs, masks, runner="pallas")
    be_dev = BatchEngine(cfgs, masks, runner="pallas", store_dev=True)
    assert be_dev._store_dev and not be_ref._store_dev
    for _ in range(2):
        be_ref.run_step(8)
        be_dev.run_step(8)
    f_ref = np.asarray(be_ref.state.f)
    f_dev = np.asarray(be_dev.state.f)
    assert np.abs(f_dev - f_ref).max() > 0, "store_dev path inactive"
    np.testing.assert_allclose(f_dev, f_ref, rtol=0, atol=5e-4)
    assert (be_dev.alive_mask == be_ref.alive_mask).all()


def test_batch_divergence_freezes_only_bad_case():
    nx, ny = 48, 24
    good = grid_config(nx, ny, rho_in=1.02)
    bad = grid_config(nx, ny, rho_in=1.02)
    # absurd viscosity -> tau < 0.5 -> unconditionally unstable
    bad["simulation"]["nu"] = -0.16
    bad["simulation"]["warmup_steps"] = 1
    masks = [block_mask(ny, nx)] * 2

    be = BatchEngine([good, bad], masks)
    for _ in range(6):
        be.run_step(10)
    alive = be.alive_mask
    assert alive[0], "healthy case must stay alive"
    assert not alive[1], "unstable case must trip the breaker"
    # the healthy case's fields stay finite even though its neighbor blew up
    assert np.isfinite(np.asarray(be.state.f[0])).all()


def test_batch_dead_case_compaction_matches_full(monkeypatch):
    """Host-side dead-case re-packing (VERDICT round-2 item 5): with half
    the batch dead, the sequential runner gathers the alive cases into a
    power-of-two compact batch, advances it, and scatters back -- alive
    cases bitwise match an all-alive engine, dead cases stay frozen, and
    monitors keep full-batch indexing."""
    nx, ny = 64, 32
    cfgs = [grid_config(nx, ny, rho_in=1.01 + 0.01 * i) for i in range(4)]
    masks = [block_mask(ny, nx)] * 4

    ref = BatchEngine(cfgs, masks, runner="pallas")
    eng = BatchEngine(cfgs, masks, runner="pallas")
    ref.run_step(10)
    eng.run_step(10)

    # kill cases 1 and 3 (as if their breakers tripped)
    frozen = jax.tree.map(lambda x: np.asarray(x), eng.state)
    eng.set_state(eng.state, np.array([True, False, True, False]))
    ref.run_step(10)
    mon = eng.run_step(10)  # compact batch of 2 under the hood

    for b in (0, 2):  # alive: bitwise equal to the never-killed engine
        np.testing.assert_array_equal(
            np.asarray(eng.state.f[b]), np.asarray(ref.state.f[b])
        )
        assert mon["stable"][b]
    for b in (1, 3):  # dead: frozen in place
        np.testing.assert_array_equal(np.asarray(eng.state.f[b]), frozen.f[b])
        np.testing.assert_array_equal(
            np.asarray(eng.state.step[b]), frozen.step[b]
        )
    assert mon["force"].shape == (4, 2) and mon["max_v"].shape == (4,)
    assert (eng.alive_mask == [True, False, True, False]).all()

    # all-dead: run_step becomes a no-op on state
    eng.set_state(eng.state, np.zeros(4, bool))
    before = np.asarray(eng.state.f)
    eng.run_step(10)
    np.testing.assert_array_equal(np.asarray(eng.state.f), before)


def test_sharded_corner_transport():
    """A point disturbance near a 4-shard corner must cross diagonally --
    exercises the two-hop corner halo (x exchange then y exchange)."""
    nx, ny = 64, 32
    cfg = grid_config(nx, ny, rho_in=1.0)  # no driving: pure advection test
    cfg["simulation"]["smagorinsky_constant"] = 0.0
    p = make_params(cfg, np.zeros((ny, nx), np.float32))

    st = init_state(ny, nx)
    # bump the NE-moving population at the cell just SW of the global center
    # (the center is the corner point of a 2x2 shard split)
    f = np.array(st.f)
    cy, cx = ny // 2 - 1, nx // 2 - 1
    f[5, cy, cx] += 0.01  # k=5 moves (+1, +1)
    st = st.replace(f=jnp.asarray(f))

    ref, _ = run_chunk(st, p, 3)

    mesh = make_mesh(shape=(2, 4))
    st_sh, p_sh = shard_state(st, p, mesh)
    sh, _ = run_chunk_sharded(st_sh, p_sh, n_steps=3, mesh=mesh, ny=ny, nx=nx)

    np.testing.assert_allclose(np.asarray(sh.f), np.asarray(ref.f), atol=1e-7)
    # the disturbance must have crossed the shard corner diagonally (the MRT
    # collision redistributes it, so just require strictly +y and +x motion
    # past the 2x2 corner point)
    d = np.asarray(ref.f[5]) - np.asarray(init_state(ny, nx).f[5])
    peak = np.unravel_index(np.abs(d).argmax(), d.shape)
    assert peak[0] > cy and peak[1] > cx, peak
    assert np.abs(d[cy + 1 :, cx + 1 :]).max() > 1e-4  # energy crossed the corner


def test_batch_case_sharded_matches_serial():
    """runner='sharded': 8 distinct cases over the 8-device ('cases',) mesh
    advance in parallel bit-identical to per-case serial runs, including
    per-case divergence freezing (VERDICT round-1 item 5 / SURVEY 2.2)."""
    assert len(jax.devices()) >= 8, "needs the 8-device virtual CPU mesh"
    nx, ny = 48, 24
    cfgs, masks = [], []
    for i in range(8):
        cfg = grid_config(nx, ny, rho_in=1.005 + 0.004 * i)
        if i == 5:  # one case diverges: tau < 0.5
            cfg["simulation"]["nu"] = -0.16
            cfg["simulation"]["warmup_steps"] = 1
        cfgs.append(cfg)
        m = block_mask(ny, nx) if i % 2 == 0 else np.zeros((ny, nx), np.float32)
        masks.append(m)

    be = BatchEngine(cfgs, masks, runner="sharded")
    assert be.mesh is not None and be.mesh.devices.size == 8
    for _ in range(4):
        mon = be.run_step(10)
    alive = be.alive_mask
    assert not alive[5], "unstable case must trip its own breaker"
    assert alive[[i for i in range(8) if i != 5]].all()

    sharded_f = np.asarray(be.state.f)
    for i, (cfg, mask) in enumerate(zip(cfgs, masks)):
        if i == 5:
            continue
        st = init_state(ny, nx)
        p = make_params(cfg, mask)
        for _ in range(4):
            st, ref_mon = run_chunk(st, p, 10)
        np.testing.assert_array_equal(
            sharded_f[i], np.asarray(st.f),
            err_msg=f"case {i}: sharded != serial (must be bit-identical)",
        )
        np.testing.assert_allclose(
            np.asarray(mon["force"][i]), np.asarray(ref_mon["force"]),
            rtol=0, atol=0,
        )


def test_batch_case_sharded_pads_indivisible_batch():
    """Indivisible batches pad with inert duplicates so every requested
    chip stays busy (coordinated multi-worker claim races routinely
    produce odd group sizes): 5 cases on a 4-device mesh run as 4x2 rows
    with 3 dead pads, bit-identical to the serial engine per case."""
    nx, ny = 48, 24
    cfgs = [grid_config(nx, ny, rho_in=1.01 + 0.002 * i) for i in range(5)]
    masks = [np.zeros((ny, nx), np.float32)] * 5

    be = BatchEngine(cfgs, masks, runner="sharded", n_devices=4)
    assert be.mesh is not None and be.mesh.devices.size == 4
    assert be._shard_pad == 3
    be.run_step(6)
    assert be.alive_mask.all()
    assert be.state.f.shape[0] == 5  # pads sliced away from every output

    from lbm2d_tpu.core.solver import init_state, make_params, run_chunk

    for i in (0, 4):  # first case and the duplicated-source last case
        ref, _ = run_chunk(
            init_state(ny, nx), make_params(cfgs[i], masks[i]), 6
        )
        np.testing.assert_array_equal(
            np.asarray(be.state.f[i]), np.asarray(ref.f)
        )

    # batch <= devices: mesh shrinks to the batch, no padding
    be3 = BatchEngine(cfgs[:3], masks[:3], runner="sharded")
    assert be3.mesh.devices.size == 3 and be3._shard_pad == 0
    be3.run_step(2)
    assert be3.alive_mask.all()


def _run_split_bc_mesh_case(nx, ny, mesh_shape, n_steps, vmem_mb=None):
    """Split-BC sharded-pallas vs serial run_chunk on one mesh geometry.

    ``vmem_mb`` overrides the device spec so _pick_split_tiles picks short
    bands on a small grid -- the cheap interpret-mode way to exercise shards
    with MULTIPLE interior bands (the 4096^2 production structure, where
    band/halo bookkeeping spans several grid programs per shard)."""
    from lbm2d_tpu.ops import device_specs as ds
    from lbm2d_tpu.ops.pallas_step import _pick_split_tiles

    try:
        if vmem_mb is not None:
            ds.set_spec_override(
                ds.TpuSpec(f"synthetic-{vmem_mb}", vmem_mb * 1024 * 1024, 819)
            )
        rys, rxs = mesh_shape
        hl, wl = ny // rys, nx // rxs
        bh, _, _ = _pick_split_tiles(hl, wl, 0 if rxs == 1 else 128)
        n_bands = -(-hl // bh)
        if vmem_mb is not None:
            assert n_bands >= 2, (
                f"geometry not exercising multi-band shards: hl={hl} bh={bh}"
            )

        cfg = grid_config(nx, ny)
        mask = block_mask(ny, nx)
        p = make_params(cfg, mask)
        ref_state, ref_mon = run_chunk(init_state(ny, nx), p, n_steps)

        ndev = rys * rxs
        mesh = make_mesh(shape=mesh_shape, devices=jax.devices()[:ndev])
        st_sh, p_sh = shard_state(
            init_state(ny, nx), make_params(cfg, mask), mesh
        )
        sh_state, sh_mon = run_chunk_sharded_pallas(
            st_sh, p_sh, n_steps=n_steps, mesh=mesh, ny=ny, nx=nx,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]),
            atol=1e-4,
        )
    finally:
        ds.set_spec_override(None)


def test_sharded_pallas_split_bc_2d_mesh_multiband():
    """2x2 mesh, 4 interior bands per shard (synthetic 16MB-VMEM spec forces
    16-row bands on 64-row shards): halo rows cross band boundaries inside
    each shard exactly like the 4096^2 production shards (VERDICT round-2
    weak #7)."""
    assert len(jax.devices()) >= 4
    _run_split_bc_mesh_case(nx=256, ny=128, mesh_shape=(2, 2), n_steps=10,
                            vmem_mb=16)


def test_sharded_pallas_split_bc_nonsquare_mesh():
    """Non-square 2x4 mesh (8 shards, x-sharded into 128-lane blocks) with
    2 interior bands per shard (VERDICT round-2 weak #7)."""
    assert len(jax.devices()) >= 8
    _run_split_bc_mesh_case(nx=512, ny=64, mesh_shape=(2, 4), n_steps=10,
                            vmem_mb=16)


def test_sharded_pallas_split_bc_2d_mesh():
    """Split-BC fast path on a 2D mesh (x sharded): the band kernel streams
    through a REAL 128-lane x-halo refreshed by ppermute, and the edge
    kernel gates left/right ownership by the shard's global x origin
    (4096^2-class geometry scaled to the CPU mesh; VERDICT round-1 item 4)."""
    assert len(jax.devices()) >= 4
    nx, ny = 256, 64
    cfg = grid_config(nx, ny)
    mask = block_mask(ny, nx)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 12)

    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])  # hl=32, wl=128
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=12, mesh=mesh, ny=ny, nx=nx, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f_post), np.asarray(ref_state.f_post), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


# ---------------------------------------------------------------------------
# Bouzidi interpolated bounce-back across shard seams
# ---------------------------------------------------------------------------


def _bouzidi_case(nx, ny, geom):
    """Config + mask for a Bouzidi cylinder whose boundary links cross the
    shard seams of the meshes below (off-grid center -> varied q values)."""
    from tests.test_bouzidi import circle_mask, cyl_config

    cfg = cyl_config(nx=nx, ny=ny)
    cfg["boundary_condition"]["obstacle_geometry"] = dict(geom)
    mask = circle_mask(ny, nx, geom)
    return cfg, mask


def test_sharded_bouzidi_matches_unsharded():
    """Bouzidi on the jnp sharded step (2x4 mesh): the q < 1/2 branch reads
    f_opp at c + e_k, which crosses both x and y shard seams here -- served
    by the same 1-cell f halo the pull stream uses."""
    assert len(jax.devices()) >= 8
    nx, ny = 64, 32
    geom = {"shape": "cylinder", "cx": 32.4, "cy": 16.3, "r": 6.2}
    cfg, mask = _bouzidi_case(nx, ny, geom)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 30)

    mesh = make_mesh(shape=(2, 4))
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded(
        st_sh, p_sh, n_steps=30, mesh=mesh, ny=ny, nx=nx
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=2e-6,
        err_msg="sharded Bouzidi f diverged from single-device f",
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


def test_sharded_pallas_bouzidi_fused_2d_mesh():
    """Bouzidi through the per-shard fused kernel (non-split path: small
    shards keep the in-kernel BCs), cylinder crossing the x and y seams of
    a 2x2 mesh."""
    assert len(jax.devices()) >= 4
    nx, ny = 64, 32
    geom = {"shape": "cylinder", "cx": 32.4, "cy": 16.3, "r": 6.2}
    cfg, mask = _bouzidi_case(nx, ny, geom)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 20)

    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=20, mesh=mesh, ny=ny, nx=nx, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


def test_sharded_pallas_bouzidi_split_rows_mesh():
    """Bouzidi on the split-BC fast path, rows-only 4x1 mesh (wl = 128,
    PX = 0 lane-roll streaming): q planes ride the band BlockSpecs and the
    cylinder crosses the y seams at 16/32/48."""
    assert len(jax.devices()) >= 4
    nx, ny = 128, 64
    geom = {"shape": "cylinder", "cx": 40.3, "cy": 31.6, "r": 6.2}
    cfg, mask = _bouzidi_case(nx, ny, geom)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 16)

    mesh = make_mesh(shape=(4, 1), devices=jax.devices()[:4])
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=16, mesh=mesh, ny=ny, nx=nx, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


def test_sharded_pallas_bouzidi_split_2d_mesh():
    """Bouzidi on the split-BC fast path over a 2D mesh (2x2, wl = 128,
    PX = 128 real x halo): the cylinder sits on the x seam at 128 and the
    y seam at 32, so interpolated links cross BOTH seam kinds."""
    assert len(jax.devices()) >= 4
    nx, ny = 256, 64
    geom = {"shape": "cylinder", "cx": 127.4, "cy": 32.6, "r": 6.2}
    cfg, mask = _bouzidi_case(nx, ny, geom)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 12)

    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=12, mesh=mesh, ny=ny, nx=nx, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


# ---------------------------------------------------------------------------
# NEBB profiled inlet (bc type 4) on the sharded paths: "DFG on a mesh"
# ---------------------------------------------------------------------------


def _nebb_bouzidi_case(nx, ny, geom):
    """DFG-style config -- NEBB profiled inlet (type 4) + Bouzidi cylinder --
    the production validation configuration, here crossing shard seams."""
    cfg, mask = _bouzidi_case(nx, ny, geom)
    cfg["boundary_condition"]["type"][0] = 4  # BC_VEL_INLET_NEBB
    return cfg, mask


def test_sharded_nebb_bouzidi_matches_unsharded():
    """NEBB inlet (type 4) + Bouzidi obstacle on the jnp sharded step (2x4
    mesh): the inlet's f_eq(rho_nb, u_nb) correction reads only the local
    neighbor column, so the left-edge shards reproduce the single-device
    boundary exactly."""
    assert len(jax.devices()) >= 8
    nx, ny = 64, 32
    geom = {"shape": "cylinder", "cx": 32.4, "cy": 16.3, "r": 6.2}
    cfg, mask = _nebb_bouzidi_case(nx, ny, geom)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 30)

    mesh = make_mesh(shape=(2, 4))
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded(
        st_sh, p_sh, n_steps=30, mesh=mesh, ny=ny, nx=nx
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=2e-6,
        err_msg="sharded NEBB+Bouzidi f diverged from single-device f",
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )


def test_sharded_pallas_nebb_bouzidi_fused_2d_mesh():
    """NEBB inlet (type 4) + Bouzidi through the per-shard fused kernel on a
    2x2 mesh: the left-column shards run the in-kernel NEBB edge math on
    their global ring while the cylinder crosses both seam kinds."""
    assert len(jax.devices()) >= 4
    nx, ny = 64, 32
    geom = {"shape": "cylinder", "cx": 32.4, "cy": 16.3, "r": 6.2}
    cfg, mask = _nebb_bouzidi_case(nx, ny, geom)
    p = make_params(cfg, mask)
    ref_state, ref_mon = run_chunk(init_state(ny, nx), p, 16)

    mesh = make_mesh(shape=(2, 2), devices=jax.devices()[:4])
    st_sh, p_sh = shard_state(init_state(ny, nx), make_params(cfg, mask), mesh)
    sh_state, sh_mon = run_chunk_sharded_pallas(
        st_sh, p_sh, n_steps=16, mesh=mesh, ny=ny, nx=nx, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.f), np.asarray(ref_state.f), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_state.u), np.asarray(ref_state.u), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sh_mon["force"]), np.asarray(ref_mon["force"]), atol=1e-4
    )
