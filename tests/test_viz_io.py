"""Visualization + video + misc-util tests."""

import os

import numpy as np

from lbm2d_tpu.io.video import VideoRecorder
from lbm2d_tpu.utils.system import pick_random_png
from lbm2d_tpu.viz.colorize import colorize_velocity, colorize_vorticity
from lbm2d_tpu.viz.frames import FrameComposer, calc_gui_size, draw_zone_overlay


def test_calc_gui_size():
    # no clamp needed: height doubles for the stacked panels
    assert calc_gui_size(400, 200, 1024) == (400, 400)
    # clamped by longest side
    w, h = calc_gui_size(2048, 1024, 1024)
    assert w == 1024 and h == 2 * 512
    # degenerate floor
    assert calc_gui_size(1, 1, 10) == (1, 2)


def test_colorize_shapes_and_obstacle_grey():
    mag = np.random.default_rng(0).uniform(0, 0.1, (20, 30)).astype(np.float32)
    mask = np.zeros((20, 30))
    mask[5:8, 5:8] = 1
    img = colorize_velocity(mag, u_norm_max=0.15, mask=mask)
    assert img.shape == (20, 30, 3)
    np.testing.assert_allclose(img[6, 6], [0.5, 0.5, 0.5])  # grey obstacle
    vor = np.random.default_rng(1).normal(0, 0.01, (20, 30))
    img2 = colorize_vorticity(vor, 0.03, mask)
    assert img2.shape == (20, 30, 3)
    assert img2.min() >= 0 and img2.max() <= 1


def test_frame_composer_and_overlay():
    ny, nx = 40, 80
    u = np.zeros((2, ny, nx), np.float32)
    u[0] = 0.05
    mask = np.zeros((ny, nx), np.float32)
    comp = FrameComposer(nx, 2 * ny, viz_sigma=1.0)
    img = comp.process_frame(u, mask)
    assert img.shape == (2 * ny, nx, 3)
    zones = {
        "nx": nx, "ny": ny, "sponge_in": 8, "sponge_out": 8,
        "sponge_top": 4, "sponge_bot": 4,
        "roi_x_start": 16, "roi_x_end": 64, "roi_y_start": 8, "roi_y_end": 32,
    }
    img2 = draw_zone_overlay(img.copy(), zones)
    # ROI verticals drawn in red on the top panel
    assert (img2[:ny, 16] == np.array([1.0, 0, 0])).all(axis=-1).any()


def test_video_recorder_roundtrip(tmp_path):
    import cv2

    path = str(tmp_path / "clip.mp4")
    rec = VideoRecorder(path, width=65, height=33, fps=10)  # odd dims clamp
    rec.start()
    for i in range(8):
        frame = np.full((33, 65, 3), i / 10, np.float32)
        rec.write_frame(frame)
    rec.stop()
    assert os.path.getsize(path) > 0
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    assert n == 8 and w == 64 and h == 32  # even-dim clamp


def test_pick_random_png(tmp_path):
    import random

    for n in ("a.png", "b.png", "c.txt"):
        open(tmp_path / n, "w").close()
    got = pick_random_png(str(tmp_path), random.Random(0))
    assert got.endswith(".png")
