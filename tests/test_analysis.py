"""Analysis-tail tests: io_bench sweep, zarrlite partial reads, video_stats."""

import json
import os

import numpy as np
import h5py
import pytest

from lbm2d_tpu.post.zarrlite import ZarrGroup, open_array, read_region


def test_read_region_matches_full_read(tmp_path):
    root = ZarrGroup(str(tmp_path / "a.zarr"), overwrite=True)
    rng = np.random.default_rng(2)
    data = rng.standard_normal((13, 9, 20, 31)).astype(np.float16)
    path = root.create_array("turbulence", data, chunks=(4, 9, 8, 8))
    full = open_array(path)
    for sel in (
        (slice(0, 13), slice(0, 9), slice(0, 20), slice(0, 31)),
        (slice(3, 11), slice(1, 5), slice(6, 19), slice(2, 9)),
        (slice(12, 13), slice(0, 9), slice(19, 20), slice(30, 31)),
        (slice(5, 5), slice(0, 9), slice(0, 4), slice(0, 4)),  # empty
    ):
        np.testing.assert_array_equal(read_region(path, sel), full[sel])


def test_io_bench_tiny_sweep(tmp_path):
    """run_multi_benchmark on tmp files: finite timings, sane speedup keys."""
    from lbm2d_tpu.analysis.io_bench import plot_heatmap, run_multi_benchmark

    rng = np.random.default_rng(3)
    turb = rng.normal(0, 1, (24, 9, 32, 48)).astype(np.float16)
    h5_path = str(tmp_path / "case.h5")
    with h5py.File(h5_path, "w") as f:
        f.create_dataset("turbulence", data=turb, compression="lzf")
    zdir = str(tmp_path / "case.zarr")
    root = ZarrGroup(zdir, overwrite=True)
    root.create_array("turbulence", turb, chunks=(8, 9, 32, 16))

    results = run_multi_benchmark(
        h5_path, zdir, t_list=[1, 8], hw_list=[8, 16], trials=2
    )
    assert len(results) == 4
    for r in results:
        assert set(r) == {"T", "HW", "h5_s", "zarr_s", "speedup"}
        assert r["h5_s"] > 0 and r["zarr_s"] > 0
        assert np.isfinite(r["speedup"])
    png = str(tmp_path / "heat.png")
    plot_heatmap(results, png)
    assert os.path.getsize(png) > 1000


def _write_tiny_mp4(path, n_frames=6, w=64, h=48):
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(path, fourcc, 10.0, (w, h))
    assert vw.isOpened()
    for i in range(n_frames):
        frame = np.full((h, w, 3), i * 40, np.uint8)
        vw.write(frame)
    vw.release()


def test_video_stats_walk_skip_overwrite(tmp_path):
    from lbm2d_tpu.analysis.video_stats import process_video, walk_and_process

    vis = tmp_path / "outputs" / "P" / "vis"
    vis.mkdir(parents=True)
    mp4 = str(vis / "case.mp4")
    _write_tiny_mp4(mp4)

    n = walk_and_process(str(tmp_path / "outputs"))
    assert n == 1
    last_png = str(vis / "case_last.png")
    avg_png = str(vis / "case_avg.png")
    assert os.path.exists(last_png) and os.path.exists(avg_png)

    import cv2

    last = cv2.imread(last_png)
    avg = cv2.imread(avg_png)
    # last frame is the brightest; the average sits strictly between
    assert last.mean() > avg.mean() > 0

    # skip-if-exists: nothing reprocessed
    assert walk_and_process(str(tmp_path / "outputs")) == 0
    # overwrite reprocesses
    assert walk_and_process(str(tmp_path / "outputs"), overwrite=True) == 1
    # non-video files are ignored, unreadable videos skipped gracefully
    (vis / "junk.mp4").write_bytes(b"not a video")
    assert walk_and_process(str(tmp_path / "outputs")) == 0


def test_h5_inspect_tree_and_plots(tmp_path, capsys):
    """h5_inspect prints every dataset and renders one PNG per quick-look
    field (reference notebooks viz_result.ipynb / read.ipynb as a CLI)."""
    from lbm2d_tpu.analysis.h5_inspect import print_structure, render_plots

    rng = np.random.default_rng(4)
    path = tmp_path / "case.h5"
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "turbulence",
            data=rng.normal(0, 1, (3, 9, 16, 24)).astype(np.float32),
            compression="lzf",
        )
        f.create_dataset(
            "static_mask", data=np.zeros((2, 16, 24), np.float32)
        )
        f.create_dataset("sum_vor", data=np.ones((16, 24), np.float32))
        f.create_dataset(
            "mean_vel_field", data=np.zeros((9, 16, 24), np.float32)
        )
        f.attrs["config_json"] = json.dumps(
            {"simulation": {"name": "t", "nu": 0.02, "nx": 24, "ny": 16}}
        )
        f.attrs["stats_min"] = np.zeros(9, np.float32)

    print_structure(path)
    out = capsys.readouterr().out
    for needle in ("turbulence", "(3, 9, 16, 24)", "lzf", "@config_json",
                   "nu=0.02", "@stats_min"):
        assert needle in out, needle

    pngs = render_plots(path, tmp_path / "inspect", frame=-1)
    names = {p.name for p in pngs}
    # 9 channels of the last frame + mask/sdf + sum_vor + mean jx/jy
    assert len(pngs) == 14 and all(p.exists() for p in pngs)
    assert "case_t2_rho.png" in names and "case_sdf.png" in names
    assert "case_mean_jx.png" in names
