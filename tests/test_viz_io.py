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


def _decode_all(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, img = cap.read()
        if not ok:
            break
        frames.append(img[..., ::-1])  # BGR -> RGB
    cap.release()
    return frames


def test_video_recorder_native_backend(tmp_path):
    """Native libavcodec worker: decoded content matches the source frames
    (within codec tolerance) and orientation matches the cv2 fallback."""
    from lbm2d_tpu.native import load_videoenc

    if load_videoenc() is None:
        import pytest

        pytest.skip("native video encoder unavailable in this image")

    rng = np.random.default_rng(3)
    # smooth content (codecs mangle white noise): a moving gradient
    yy, xx = np.mgrid[0:48, 0:64].astype(np.float32)
    frames = [
        np.stack(
            [(xx + 7 * i) % 64 / 64, yy / 48, np.full_like(xx, 0.4)], axis=-1
        )
        for i in range(6)
    ]
    path = str(tmp_path / "native.mp4")
    rec = VideoRecorder(path, width=64, height=48, fps=30)
    rec.start()
    assert rec.backend.startswith("native-"), rec.backend
    for f in frames:
        rec.write_frame(f)
    rec.stop()

    decoded = _decode_all(path)
    assert len(decoded) == len(frames)
    for src, got in zip(frames, decoded):
        want = (np.clip(src[::-1], 0, 1) * 255).astype(np.float64)
        err = np.abs(want - got.astype(np.float64)).mean()
        assert err < 8.0, f"mean abs err {err}"


def test_video_recorder_native_single_frame(tmp_path):
    """1-frame mp4s must decode (B-frame dts quirk regression guard)."""
    from lbm2d_tpu.native import load_videoenc

    if load_videoenc() is None:
        import pytest

        pytest.skip("native video encoder unavailable in this image")
    path = str(tmp_path / "one.mp4")
    rec = VideoRecorder(path, width=32, height=32, fps=30)
    rec.start()
    rec.write_frame(np.full((32, 32, 3), 0.5, np.float32))
    rec.stop()
    assert len(_decode_all(path)) == 1


def test_video_recorder_i420_matches_rgb_path(tmp_path):
    """Feeding device-layout I420 planes must produce (about) the same
    pixels as feeding the equivalent RGB frame."""
    from lbm2d_tpu.io.video import i420_to_rgb
    from lbm2d_tpu.native import load_videoenc

    if load_videoenc() is None:
        import pytest

        pytest.skip("native video encoder unavailable in this image")
    import cv2

    rng = np.random.default_rng(5)
    h, w = 48, 64
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (h, w, 3)).astype(np.float32), (0, 0), 3
    )
    rgb8 = np.clip(base, 0, 255).astype(np.uint8)
    # device forward transform layout: Y [h,w], UV [h/2,w/2,2]
    i420 = cv2.cvtColor(rgb8, cv2.COLOR_RGB2YUV_I420)  # [h*3/2, w]
    y8 = i420[:h]
    u = i420[h : h + h // 4].reshape(h // 2, w // 2)
    v = i420[h + h // 4 :].reshape(h // 2, w // 2)
    uv8 = np.stack([u, v], axis=-1)

    paths = {}
    for name in ("rgb", "i420"):
        p = str(tmp_path / f"{name}.mp4")
        rec = VideoRecorder(p, width=w, height=h, fps=30)
        rec.start()
        for _ in range(3):
            if name == "rgb":
                rec.write_frame_u8(rgb8)
            else:
                rec.write_frame_i420(y8, uv8)
        rec.stop()
        paths[name] = p
    a = _decode_all(paths["rgb"])
    b = _decode_all(paths["i420"])
    assert len(a) == len(b) == 3
    err = np.abs(a[0].astype(np.float64) - b[0].astype(np.float64)).mean()
    # two lossy trips through different 4:2:0 subsampling sites
    assert err < 6.0, f"mean abs err {err}"


def test_i420_to_rgb_height_not_multiple_of_4():
    """Stacked-panel frames are only guaranteed EVEN height; h=970 (and any
    h % 4 == 2) used to crash the chroma reshape in the cv2 packing path.
    Round-trip vs cv2's own forward transform must stay within 4:2:0 loss."""
    import cv2

    from lbm2d_tpu.io.video import i420_to_rgb

    rng = np.random.default_rng(11)
    for h, w in ((10, 8), (970, 64), (34, 46)):
        rgb8 = cv2.GaussianBlur(
            rng.uniform(0, 255, (h, w, 3)).astype(np.float32), (0, 0), 2
        ).astype(np.uint8)
        i420 = cv2.cvtColor(rgb8, cv2.COLOR_RGB2YUV_I420)
        y8 = i420[:h]
        u = i420[h:].ravel()[: h * w // 4].reshape(h // 2, w // 2)
        v = i420[h:].ravel()[h * w // 4 :].reshape(h // 2, w // 2)
        back = i420_to_rgb(y8, np.stack([u, v], axis=-1))
        assert back.shape == (h, w, 3)
        err = np.abs(back.astype(np.float64) - rgb8.astype(np.float64)).mean()
        assert err < 4.0, f"{h}x{w}: mean abs err {err}"


def test_video_recorder_fallback_when_native_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("LBM2D_NO_NATIVE", "1")
    path = str(tmp_path / "fallback.mp4")
    rec = VideoRecorder(path, width=32, height=32, fps=10)
    rec.start()
    assert rec.backend in ("cv2-mp4v", "png")
    rec.write_frame(np.full((32, 32, 3), 0.3, np.float32))
    rec.stop()


def test_pick_random_png(tmp_path):
    import random

    for n in ("a.png", "b.png", "c.txt"):
        open(tmp_path / n, "w").close()
    got = pick_random_png(str(tmp_path), random.Random(0))
    assert got.endswith(".png")
