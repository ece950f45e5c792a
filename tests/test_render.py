"""Device frame renderer (ops/render.py) vs the host composer (viz/frames.py).

The device path runs gaussian smoothing, |u|/vorticity, matplotlib-sampled
colormap LUTs, panel stacking, and cv2-convention bilinear resize on the
accelerator and ships only the u8 frame; the host path is
scipy/matplotlib/cv2. They quantize identically except at colormap bin
edges (f32 vs f64 rounding can shift an index by one), so the comparison
bounds the fraction of differing bytes rather than demanding equality.
"""

import numpy as np
import jax.numpy as jnp

from lbm2d_tpu.io.video import VideoRecorder
from lbm2d_tpu.ops.render import make_device_frame_renderer
from lbm2d_tpu.viz.frames import FrameComposer, calc_gui_size, draw_zone_overlay


def _field(ny, nx, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:ny, 0:nx]
    ux = 0.08 * np.sin(2 * np.pi * yy / ny) + 0.02 * rng.standard_normal((ny, nx))
    uy = 0.05 * np.cos(2 * np.pi * xx / nx) + 0.02 * rng.standard_normal((ny, nx))
    u = np.stack([ux, uy]).astype(np.float32)
    mask = np.zeros((ny, nx), np.float32)
    mask[ny // 3 : ny // 3 + 8, nx // 4 : nx // 4 + 8] = 1.0
    return u, mask


def _host_u8(img):
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def test_device_frame_matches_host_composer():
    ny, nx = 96, 160
    u, mask = _field(ny, nx)
    gui_w, gui_h = calc_gui_size(nx, ny, max_display_size=128)  # forces resize

    host = FrameComposer(gui_w, gui_h).process_frame(u, mask)
    assert host.shape == (gui_h, gui_w, 3)
    host8 = _host_u8(host)

    dev = make_device_frame_renderer(gui_w, gui_h)(
        jnp.asarray(u), jnp.asarray(mask)
    )
    dev8 = np.asarray(dev)
    assert dev8.shape == host8.shape and dev8.dtype == np.uint8

    diff = np.abs(dev8.astype(np.int32) - host8.astype(np.int32))
    assert np.mean(diff) < 1.5, f"mean byte diff {np.mean(diff)}"
    assert np.mean(diff > 6) < 0.02, f"large-diff fraction {np.mean(diff > 6)}"


def test_device_frame_no_resize_and_batched():
    ny, nx = 64, 128
    u0, m0 = _field(ny, nx, seed=1)
    u1, m1 = _field(ny, nx, seed=2)
    gui_w, gui_h = calc_gui_size(nx, ny, max_display_size=None)  # native size

    render = make_device_frame_renderer(gui_w, gui_h, batched=True)
    dev = np.asarray(
        render(jnp.asarray(np.stack([u0, u1])), jnp.asarray(np.stack([m0, m1])))
    )
    assert dev.shape == (2, gui_h, gui_w, 3)

    for b, (u, m) in enumerate(((u0, m0), (u1, m1))):
        host8 = _host_u8(FrameComposer(gui_w, gui_h).process_frame(u, m))
        diff = np.abs(dev[b].astype(np.int32) - host8.astype(np.int32))
        assert np.mean(diff) < 1.0
        assert np.mean(diff > 6) < 0.02
    # obstacle cells are grey 127 in the velocity panel
    assert dev[0, ny // 3 + 2, nx // 4 + 2, 0] == 127


def test_u8_recorder_roundtrip(tmp_path):
    """write_frame_u8 produces the same stored frame as write_frame given
    the equivalently-quantized float image (decode round trip)."""
    cv2 = __import__("cv2")
    ny, nx = 64, 96
    u, mask = _field(ny, nx, seed=3)
    gui_w, gui_h = nx, 2 * ny
    img8 = np.asarray(
        make_device_frame_renderer(gui_w, gui_h)(jnp.asarray(u), jnp.asarray(mask))
    )

    paths = [str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")]
    rec = VideoRecorder(paths[0], gui_w, gui_h, fps=5)
    rec.start()
    rec.write_frame_u8(img8)
    rec.stop()
    rec2 = VideoRecorder(paths[1], gui_w, gui_h, fps=5)
    rec2.start()
    rec2.write_frame(img8.astype(np.float32) / 255.0)
    rec2.stop()

    frames = []
    for p in paths:
        cap = cv2.VideoCapture(p)
        ok, frame = cap.read()
        cap.release()
        assert ok
        frames.append(frame)
    # same codec, same input bytes -> identical encoded output
    np.testing.assert_array_equal(frames[0], frames[1])


def test_overlay_on_u8_frame():
    ny, nx = 48, 96
    u, mask = _field(ny, nx, seed=4)
    img8 = np.asarray(
        make_device_frame_renderer(nx, 2 * ny)(jnp.asarray(u), jnp.asarray(mask))
    )
    zones = {
        "nx": nx, "ny": ny, "sponge_in": 4, "sponge_out": 8,
        "sponge_top": 3, "sponge_bot": 3, "roi_x_start": 20,
        "roi_x_end": 80, "roi_y_start": 10, "roi_y_end": 40,
    }
    out = draw_zone_overlay(img8.copy(), zones)
    col = int(4 * nx / nx)
    assert tuple(out[0, col]) == (0, 255, 0)  # green sponge line at u8 scale


def test_yuv420_matches_cv2_forward_and_reconstructs():
    """yuv420 mode == cv2.COLOR_RGB2YUV_I420 of the RGB frame (to 1 lsb --
    cv2 uses fixed-point arithmetic), the Y (luma) plane reconstructs
    near-exactly, and the ENCODED artifact is equivalent: the decoded
    yuv-path video differs from the decoded rgb-path video by less than
    the rgb path's own encode error (the encoder quantizes and subsamples
    chroma to 4:2:0 regardless of which path fed it)."""
    cv2 = __import__("cv2")
    import tempfile

    from lbm2d_tpu.io.video import i420_to_rgb

    ny, nx = 64, 96
    u, mask = _field(ny, nx, seed=5)
    gui_w, gui_h = nx, 2 * ny  # even dims
    rgb8 = np.asarray(
        make_device_frame_renderer(gui_w, gui_h)(jnp.asarray(u), jnp.asarray(mask))
    )
    y8, uv8 = make_device_frame_renderer(gui_w, gui_h, yuv420=True)(
        jnp.asarray(u), jnp.asarray(mask)
    )
    y8, uv8 = np.asarray(y8), np.asarray(uv8)
    assert y8.shape == (gui_h, gui_w) and uv8.shape == (gui_h // 2, gui_w // 2, 2)

    ref = cv2.cvtColor(rgb8, cv2.COLOR_RGB2YUV_I420)
    ref_y = ref[:gui_h]
    ref_u = ref[gui_h : gui_h + gui_h // 4].reshape(gui_h // 2, gui_w // 2)
    ref_v = ref[gui_h + gui_h // 4 :].reshape(gui_h // 2, gui_w // 2)
    assert np.max(np.abs(y8.astype(int) - ref_y.astype(int))) <= 1
    assert np.max(np.abs(uv8[..., 0].astype(int) - ref_u.astype(int))) <= 1
    assert np.max(np.abs(uv8[..., 1].astype(int) - ref_v.astype(int))) <= 1

    # luma carries the structure; it survives the YUV roundtrip near-exactly
    back = i420_to_rgb(y8, uv8)
    assert back.shape == rgb8.shape and back.dtype == np.uint8
    luma = lambda a: a.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    assert np.abs(luma(back) - luma(rgb8)).mean() < 1.5

    # artifact-level equivalence: encode both paths, decode, compare
    tmp = tempfile.mkdtemp()
    decoded = []
    for name, write in (
        ("rgb", lambda r: r.write_frame_u8(rgb8)),
        ("yuv", lambda r: r.write_frame_i420(y8, uv8)),
    ):
        path = f"{tmp}/{name}.mp4"
        rec = VideoRecorder(path, gui_w, gui_h, fps=5)
        rec.start()
        write(rec)
        rec.stop()
        cap = cv2.VideoCapture(path)
        ok, frame = cap.read()
        cap.release()
        assert ok
        decoded.append(frame[:, :, ::-1][::-1].astype(np.float64))  # undo BGR+flip
    encode_err = np.abs(decoded[0] - rgb8.astype(np.float64)).mean()
    cross = np.abs(decoded[0] - decoded[1]).mean()
    assert cross <= 1.25 * encode_err, (
        f"yuv-path decoded delta {cross:.2f} exceeds the rgb path's own "
        f"encode error {encode_err:.2f}"
    )


def test_yuv420_odd_dims_crop_and_batched(tmp_path, monkeypatch):
    """Odd gui dims: the device crops to the recorder's even dims, and
    write_frame_i420 stores the same bytes as write_frame_u8 of the
    reconstructed frame (same crop/flip path). Batched mode vmaps both
    planes.

    Pinned to the cv2 fallback backend: there both writes share one emit
    path, so byte-equality is the contract. The native backend feeds I420
    planes directly to the encoder (no RGB reconstruction), which is only
    tolerance-equal -- covered by
    test_viz_io.py::test_video_recorder_i420_matches_rgb_path."""
    monkeypatch.setenv("LBM2D_NO_NATIVE", "1")
    cv2 = __import__("cv2")
    from lbm2d_tpu.io.video import i420_to_rgb

    ny, nx = 48, 97  # odd width
    u, mask = _field(ny, nx, seed=6)
    gui_w, gui_h = nx, 2 * ny  # 97 x 96 -> recorder crops to 96 x 96
    render = make_device_frame_renderer(gui_w, gui_h, yuv420=True, batched=True)
    y8, uv8 = render(jnp.asarray(u[None]), jnp.asarray(mask[None]))
    y8, uv8 = np.asarray(y8), np.asarray(uv8)
    assert y8.shape == (1, gui_h, gui_w - 1)
    assert uv8.shape == (1, gui_h // 2, (gui_w - 1) // 2, 2)

    paths = [str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")]
    rec = VideoRecorder(paths[0], gui_w, gui_h, fps=5)
    rec.start()
    rec.write_frame_i420(y8[0], uv8[0])
    rec.stop()
    rec2 = VideoRecorder(paths[1], gui_w, gui_h, fps=5)
    rec2.start()
    rec2.write_frame_u8(i420_to_rgb(y8[0], uv8[0]))
    rec2.stop()
    frames = []
    for p in paths:
        cap = cv2.VideoCapture(p)
        ok, frame = cap.read()
        cap.release()
        assert ok
        frames.append(frame)
    np.testing.assert_array_equal(frames[0], frames[1])
