"""Split the 4096^2 step cost into fast-band kernel vs edge-BC kernel.

Times _pallas_step (split-BC export mode) and _edge_bc_step separately,
plus the combined scan step, on the real TPU.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    ny = nx = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from __graft_entry__ import _cylinder_mask, _demo_config
    from lbm2d_tpu.core.solver import init_state, make_params
    import lbm2d_tpu.ops.pallas_step as ps

    cfg = _demo_config(nx, ny, nu=0.01, warmup=2000)
    p = make_params(cfg, _cylinder_mask(ny, nx))
    state = init_state(ny, nx)
    H, W_ = ny, nx
    dtype = state.f.dtype

    bh_fast, BW_s, PX_s = ps._pick_split_tiles(H, W_)
    Wp_s = ps._round_up(W_, BW_s)
    Hp = ps._round_up(H, bh_fast)
    dims_fast = (H, W_, H, W_, Hp, Wp_s, bh_fast, BW_s, PX_s)
    edims = (H, W_, Hp, Wp_s, PX_s, H, W_)
    print(f"tiles: BH={bh_fast} BW={BW_s} PX={PX_s} Hp={Hp} grid rows={Hp//bh_fast}")

    fp = jnp.pad(state.f, ((0, 0), (ps.PY, ps.PY + (Hp - H)), (0, Wp_s - W_)))
    aux_s = jnp.pad(ps.pack_aux(p.damping, p.mask), ((0, Hp - H), (0, Wp_s - W_)))
    ec_w = 128 if (W_ - 1) // BW_s == 0 else 256
    ec = jnp.zeros((3, Hp, ec_w), dtype)
    er = jnp.zeros((3, 16, Wp_s), dtype)
    scal = ps._scalars(p, jnp.int32(5000), dtype)

    def fast_only(fp, ec, er):
        return ps._pallas_step(
            fp, aux_s, scal, None, None, None, dims_fast,
            p.use_les, p.bc_type, False, False, False,
            ec_buf=ec, er_buf=er, bounce=False,
        )

    def edge_only(fp, ec, er):
        return ps._edge_bc_step(fp, aux_s, ec, er, scal, edims, p.bc_type, False)

    # warm
    fp1, ec1, er1 = fast_only(fp, ec, er)
    fp2 = edge_only(fp1, ec1, er1)
    _ = float(np.asarray(fp2[0, 20, 20]))

    def timeit(fn, args, n):
        out = args
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*out)
            out = out if isinstance(out, tuple) else (out, args[1], args[2])
        _ = float(np.asarray(out[0][0, 20, 20]))
        return (time.perf_counter() - t0) / n * 1e6

    t_fast = timeit(fast_only, (fp, ec, er), n)
    t_edge = timeit(edge_only, (fp1, ec1, er1), n)
    print(f"fast band kernel: {t_fast:.0f} us/step -> {ny*nx/t_fast:.0f} MLUPS-equiv")
    print(f"edge BC kernel:   {t_edge:.0f} us/step")
    bytes_f = 4 * 9 * (Hp // bh_fast) * (bh_fast + 0) * Wp_s * 2 + 4 * Hp * Wp_s
    print(f"fast-step min traffic ~{bytes_f/1e6:.0f} MB -> {bytes_f/t_fast/1e3:.0f} GB/s effective")


if __name__ == "__main__":
    main()
