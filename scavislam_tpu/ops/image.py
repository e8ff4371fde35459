"""Image preprocessing ops: Gaussian pyramid, Sobel gradients, bilinear sampling.

TPU-native replacement for the reference's preprocessing stage
(/root/reference/scavislam/frame_grabber.cpp:285-336: cv::buildPyramid +
float/255 conversion + Sobel dx/dy per level, with a cv::gpu twin). Here the
whole stack is one fused jitted program over static-shape arrays; XLA fuses
the elementwise work into the convolutions.

All images are float32 in [0, 1], shape (H, W); pyramids are tuples of
(H/2^l, W/2^l) arrays (static shapes, NUM_PYR_LEVELS levels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NUM_PYR_LEVELS = 3  # parity: /root/reference/scavislam/global.h:106


def _sep_filter_1d(img: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """Small 1-D correlation along `axis` via ROLLED adds.

    Single-channel 2-D convolutions lower terribly on TPU (the MXU wants
    many channels; measured ~25 ms for a 5-tap blur at 512x384), and
    pad+slice shifts force unaligned-layout copies. `jnp.roll` keeps the
    (8,128)-tiled layout — pure VPU work. The cost: wraparound instead of
    replicate padding within `r` pixels of the border; every consumer in
    this pipeline already excludes a wider border (FAST: 3 px, dense
    tracking: 2 px/level, patch matching: 4 px, stereo: its own window
    logic), so the interior result is exact.
    """
    taps = list(np.asarray(taps, np.float32))
    r = len(taps) // 2
    out = None
    for i, w in enumerate(taps):
        if w == 0.0:
            continue
        term = jnp.roll(img, r - i, axis=axis) * w
        out = term if out is None else out + term
    return out


def _conv2_same(img: jnp.ndarray, kernel) -> jnp.ndarray:
    """2-D correlation with replicate-edge padding for SMALL kernels,
    expressed as shifted adds (see _sep_filter_1d)."""
    kernel = np.asarray(kernel, np.float32)
    kh, kw = kernel.shape
    rh, rw = kh // 2, kw // 2
    p = jnp.pad(img, ((rh, rh), (rw, rw)), mode="edge")
    h, w = img.shape
    out = None
    for i in range(kh):
        for j in range(kw):
            wgt = float(kernel[i, j])
            if wgt == 0.0:
                continue
            sl = jax.lax.slice(p, (i, j), (i + h, j + w))
            term = sl * wgt
            out = term if out is None else out + term
    return out


# OpenCV's pyrDown 5-tap Gaussian kernel (1 4 6 4 1)/16, separable.
# (numpy, not jnp: module-level jnp constants would become tracers if this
# module were first imported inside a jit trace.)
import numpy as _np

_PYR_K = _np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=_np.float32) / 16.0


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur (5-tap) + 2x decimation, matching cv::pyrDown behavior."""
    blurred = _sep_filter_1d(img, _PYR_K, axis=0)
    blurred = _sep_filter_1d(blurred, _PYR_K, axis=1)
    return blurred[::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int = NUM_PYR_LEVELS):
    """Return tuple of `levels` images, level 0 = input."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return tuple(pyr)


_BINOMIAL3 = _np.array([0.25, 0.5, 0.25], dtype=_np.float32)


def binomial3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 binomial pre-smoothing (separable [1 2 1]/4) via rolled adds.

    The sensor-noise prefilter: OpenCV's StereoBM applies a prefilter for
    exactly this reason, and FAST is conventionally run on mildly smoothed
    images. Measured on the robustness sweep: at 10%-of-full-scale Gaussian
    noise the raw pipeline loses BM disparity validity (89% -> 15%) and
    floods the corner cells with noise corners; the 3x3 binomial restores
    both. Border wraparound is inside every consumer's exclusion margin
    (see _sep_filter_1d)."""
    return _sep_filter_1d(_sep_filter_1d(img, _BINOMIAL3, axis=0),
                          _BINOMIAL3, axis=1)


_SOBEL_DIFF = _np.array([-1.0, 0.0, 1.0], dtype=_np.float32)
_SOBEL_SMOOTH = _np.array([1.0, 2.0, 1.0], dtype=_np.float32)


def sobel_xy(img: jnp.ndarray):
    """Sobel dx, dy with the reference's 1/8 scale.

    The reference calls cv::Sobel(..., scale=1/8) equivalents so that the
    gradient of a [0,1] image is a centered finite difference
    (frame_grabber.cpp:305-333 passes the GPU DerivFilter / CPU Sobel output
    straight into the dense tracker's Jacobians).
    """
    smooth_v = _sep_filter_1d(img, _SOBEL_SMOOTH, axis=0)
    dx = _sep_filter_1d(smooth_v, _SOBEL_DIFF, axis=1)
    smooth_h = _sep_filter_1d(img, _SOBEL_SMOOTH, axis=1)
    dy = _sep_filter_1d(smooth_h, _SOBEL_DIFF, axis=0)
    return dx * 0.125, dy * 0.125


def preprocess_frame(img_u8_or_f32: jnp.ndarray, levels: int = NUM_PYR_LEVELS):
    """uint8/float image -> dict with per-level {img, dx, dy} float32 pyramids.

    One jitted program per (H, W, levels) signature; everything fuses.
    """
    img = img_u8_or_f32
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32) / 255.0
    pyr = build_pyramid(img, levels)
    dxs, dys = [], []
    for lvl in pyr:
        dx, dy = sobel_xy(lvl)
        dxs.append(dx)
        dys.append(dy)
    return {"pyr": tuple(pyr), "dx": tuple(dxs), "dy": tuple(dys)}


preprocess_frame_jit = jax.jit(preprocess_frame, static_argnums=(1,))


# -- bilinear sampling --------------------------------------------------------

def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray, *, fill=0.0):
    """Sample image at float pixel coords uv (..., 2) = (u=x, v=y).

    Out-of-bounds samples return ``fill``. Mirrors the reference's
    interpolateMat_32f (maths_utils.cpp:47-66); the CUDA path used hardware
    texture filtering (dense_tracking.cu:150-152) — on TPU this lowers to a
    fused gather.

    Returns (values (...,), valid_mask (...,) bool).
    """
    h, w = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0i = jnp.floor(u).astype(jnp.int32)
    v0i = jnp.floor(v).astype(jnp.int32)

    valid = (u >= 0.0) & (v >= 0.0) & (u <= w - 1.0) & (v <= h - 1.0)
    u0c = jnp.clip(u0i, 0, w - 2)
    v0c = jnp.clip(v0i, 0, h - 2)
    # fractions relative to the CLIPPED base so u == w-1 samples exactly the
    # last column instead of repeating column w-2.
    fu = u - u0c.astype(u.dtype)
    fv = v - v0c.astype(v.dtype)

    i00 = img[v0c, u0c]
    i01 = img[v0c, u0c + 1]
    i10 = img[v0c + 1, u0c]
    i11 = img[v0c + 1, u0c + 1]
    top = i00 * (1.0 - fu) + i01 * fu
    bot = i10 * (1.0 - fu) + i11 * fu
    val = top * (1.0 - fv) + bot * fv
    return jnp.where(valid, val, fill), valid


def nearest_sample(img: jnp.ndarray, uv: jnp.ndarray, *, fill=0.0):
    """Nearest-neighbor lookup (the reference uses NN for disparity lookups,
    maths_utils.cpp:37-44). Returns (values, valid_mask)."""
    h, w = img.shape
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    valid = (u >= 0) & (v >= 0) & (u < w) & (v < h)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)
    val = img[vc, uc]
    return jnp.where(valid, val, fill), valid


@partial(jax.jit, static_argnums=(2,))
def half_sample_disparity(disp: jnp.ndarray, _unused=None, factor: int = 2):
    """Decimate a level-0 disparity map to a coarser level WITHOUT rescaling
    values (valid because of the x2^l baseline trick — see
    core.camera.StereoCamera.scale_level)."""
    return disp[::factor, ::factor]
