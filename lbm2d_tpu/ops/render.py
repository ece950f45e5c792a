"""Device-side video-frame rendering: |u|, vorticity, colormap, resize on TPU.

The host composer (viz/frames.py) fetches the FULL-resolution velocity field
per video frame (~22 MB f32 at production 2432x1152 -- ~35 s through a
transfer-bound link) and renders with scipy/matplotlib/cv2. This module runs
the same pipeline on device and ships only the composed uint8 RGB frame
(~3 MB at the 1024-wide display size): gaussian smoothing, velocity
magnitude + vorticity (reference sign convention du/dy - dv/dx), 256-entry
colormap LUTs sampled from the exact matplotlib maps the host path uses,
obstacle grey, panel stacking, and a cv2.INTER_LINEAR-convention bilinear
resize. Stage order matches the host composer (colorize at raw resolution,
THEN resize the RGB image), so frames match viz/frames.FrameComposer
(tests/test_render.py: identical LUT indices away from colormap bin edges).

Host-path parity notes:
  * scipy.ndimage.gaussian_filter: truncate=4.0 -> radius 4, 9-tap separable
    kernel, 'reflect' boundary (= jnp.pad mode='symmetric').
  * matplotlib colormap indexing: idx = clip(floor(norm * 256), 0, 255).
  * cv2.INTER_LINEAR: src = (dst + 0.5) * (src_size / dst_size) - 0.5,
    edge-clamped bilinear (cv2 uses the float path for float images).
  * VideoRecorder's float->uint8 is (clip(x,0,1) * 255) truncation; the
    device frame applies the same so write_frame_u8 stays byte-faithful.

Reference parity: io/video_recorder.py:17-52 wiring in
core/simulation_ops.py:146-168 (the artifact set); the rendering itself is
visualization/viz_utils.py + color_utils.py re-designed for TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage._gaussian_kernel1d (order 0), float64."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    return phi / phi.sum()


@functools.lru_cache(maxsize=None)
def _plasma_lut() -> np.ndarray:
    from matplotlib import colormaps

    return np.asarray(
        colormaps["plasma"](np.arange(256) / 255.0)[:, :3], np.float32
    )


@functools.lru_cache(maxsize=None)
def _vorticity_lut() -> np.ndarray:
    from ..viz.colorize import vorticity_cmap

    return np.asarray(
        vorticity_cmap()(np.arange(256) / 255.0)[:, :3], np.float32
    )


def _smooth(a: jnp.ndarray, kern: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Separable gaussian with scipy's 'reflect' boundary ([H, W])."""
    pad = ((radius, radius), (0, 0))
    ap = jnp.pad(a, pad, mode="symmetric")
    a = sum(kern[i] * ap[i : i + a.shape[0], :] for i in range(2 * radius + 1))
    pad = ((0, 0), (radius, radius))
    ap = jnp.pad(a, pad, mode="symmetric")
    return sum(
        kern[i] * ap[:, i : i + a.shape[1]] for i in range(2 * radius + 1)
    )


def _gradient(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """np.gradient: central differences, one-sided at the edges."""
    upper = jnp.roll(a, -1, axis) - jnp.roll(a, 1, axis)
    n = a.shape[axis]
    idx = jnp.arange(n)
    interior = (idx >= 1) & (idx <= n - 2)
    shape = [1, 1]
    shape[axis] = n
    interior = interior.reshape(shape)
    one_sided_lo = jnp.take(a, jnp.array([1]), axis) - jnp.take(
        a, jnp.array([0]), axis
    )
    one_sided_hi = jnp.take(a, jnp.array([n - 1]), axis) - jnp.take(
        a, jnp.array([n - 2]), axis
    )
    edges = jnp.where(
        (idx == 0).reshape(shape), one_sided_lo, one_sided_hi
    )
    return jnp.where(interior, 0.5 * upper, edges)


def _colorize(field, vmin, vmax, lut, mask) -> jnp.ndarray:
    """[H, W] scalars -> [H, W, 3] via a 256-LUT; solid cells grey 0.5."""
    norm = (field - vmin) / (vmax - vmin)
    idx = jnp.clip(jnp.floor(norm * 256.0), 0, 255).astype(jnp.int32)
    rgb = jnp.take(jnp.asarray(lut), idx, axis=0)  # [H, W, 3]
    return jnp.where((mask > 0.5)[:, :, None], jnp.float32(0.5), rgb)


def _resize_axis(img: jnp.ndarray, target: int, axis: int) -> jnp.ndarray:
    """cv2.INTER_LINEAR-convention bilinear along one axis (static sizes)."""
    n = img.shape[axis]
    if n == target:
        return img
    src = (np.arange(target) + 0.5) * (n / target) - 0.5
    lo = np.clip(np.floor(src).astype(np.int64), 0, n - 1)
    hi = np.clip(lo + 1, 0, n - 1)
    w_hi = np.clip(src - np.floor(src), 0.0, 1.0).astype(np.float32)
    w_hi = np.where(src < 0, 0.0, w_hi).astype(np.float32)  # edge clamp
    shape = [1] * img.ndim
    shape[axis] = target
    w_hi_b = jnp.asarray(w_hi).reshape(shape)
    a_lo = jnp.take(img, jnp.asarray(lo), axis=axis)
    a_hi = jnp.take(img, jnp.asarray(hi), axis=axis)
    return a_lo * (1.0 - w_hi_b) + a_hi * w_hi_b


def _rgb_to_i420(rgb8f: jnp.ndarray):
    """float [H, W, 3] with INTEGER values 0..255 -> (Y u8 [H, W],
    UV u8 [H/2, W/2, 2]), matching cv2.COLOR_RGB2YUV_I420: BT.601
    limited-range matrix, top-left chroma subsampling (both verified
    against cv2 to <=1 lsb; tests/test_render.py). H and W must be even.
    """
    r, g, b = rgb8f[..., 0], rgb8f[..., 1], rgb8f[..., 2]
    y = 16.0 + (65.481 * r + 128.553 * g + 24.966 * b) * (1.0 / 255.0)
    rs, gs, bs = r[0::2, 0::2], g[0::2, 0::2], b[0::2, 0::2]
    u = (-37.797 * rs - 74.203 * gs + 112.0 * bs) * (1.0 / 255.0) + 128.0
    v = (112.0 * rs - 93.786 * gs - 18.214 * bs) * (1.0 / 255.0) + 128.0
    quant = lambda a: jnp.clip(jnp.round(a), 0.0, 255.0).astype(jnp.uint8)
    return quant(y), jnp.stack([quant(u), quant(v)], axis=-1)


def make_device_frame_renderer(
    gui_w: int,
    gui_h: int,
    viz_sigma: float = 1.0,
    u_norm_max: float = 0.15,
    vorticity_range: float = 0.03,
    batched: bool = False,
    yuv420: bool = False,
):
    """Jitted (u, mask) -> uint8 RGB frame [gui_h, gui_w, 3] on device.

    ``u`` is [2, H, W] ([B, 2, H, W] when batched), mask [H, W] ([B, H, W]).
    gui_w/gui_h come from viz.frames.calc_gui_size (gui_h is the DOUBLED
    two-panel height). The returned frame is unflipped/uncropped;
    io.video.VideoRecorder.write_frame_u8 applies the even-dim crop,
    vertical flip, and BGR swap exactly like the float path.

    ``yuv420``: return (Y u8 [He, We], UV u8 [He/2, We/2, 2]) instead of
    RGB, where He/We are gui_h/gui_w clamped to even (the recorder's
    even-dim crop, applied on device). Half the device->host bytes of the
    RGB frame for encoder-equivalent quality: mp4 encoding subsamples
    chroma to 4:2:0 regardless, so the only information discarded is what
    the encoder would discard anyway. The conversion pixel-matches
    cv2.COLOR_RGB2YUV_I420 of the RGB frame to 1 lsb;
    io.video.VideoRecorder.write_frame_i420 reconstructs with cv2's own
    inverse before encoding.
    """
    radius = int(4.0 * viz_sigma + 0.5)
    kern = jnp.asarray(_gaussian_kernel1d(viz_sigma, radius), jnp.float32)
    plasma = _plasma_lut()
    vort_lut = _vorticity_lut()
    rec_h = gui_h - 1 if gui_h % 2 else gui_h
    rec_w = gui_w - 1 if gui_w % 2 else gui_w

    def render(u: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        ux, uy = u[0], u[1]
        if viz_sigma > 0:
            ux = _smooth(ux, kern, radius)
            uy = _smooth(uy, kern, radius)
        vel_mag = jnp.sqrt(ux * ux + uy * uy)
        # reference viz sign convention: du/dy - dv/dx (viz/frames.py)
        vor = _gradient(ux, 0) - _gradient(uy, 1)
        vel_img = _colorize(vel_mag, 0.0, u_norm_max, plasma, mask)
        vor_img = _colorize(
            vor, -vorticity_range, vorticity_range, vort_lut, mask
        )
        img = jnp.concatenate([vel_img, vor_img], axis=0)  # [2H, W, 3]
        img = _resize_axis(img, gui_h, 0)
        img = _resize_axis(img, gui_w, 1)
        # same float->byte convention as VideoRecorder.write_frame
        rgb8f = jnp.floor(jnp.clip(img, 0.0, 1.0) * 255.0)
        if yuv420:
            # even-dim crop on device (the recorder would crop anyway),
            # then the exact cv2 forward transform of the quantized bytes
            return _rgb_to_i420(rgb8f[:rec_h, :rec_w, :])
        return rgb8f.astype(jnp.uint8)

    fn = jax.vmap(render) if batched else render
    return jax.jit(fn)
