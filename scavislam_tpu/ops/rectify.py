"""Undistort + rectify maps (radial-tangential model), applied on device.

Re-implements the reference's rectifier
(/root/reference/scavislam/frame_grabber-impl.cpp:93-134, applied at
frame_grabber.cpp:245-256): OpenCV initUndistortRectifyMap semantics with a
5-coefficient (k1, k2, p1, p2, k3) distortion model and per-eye rectifying
rotations given as SO3 log vectors (cam.rot{x,y,z}_{left,right} in the
config). The map is built once (host-side numpy, exact) and the per-frame
remap is a single fused bilinear gather on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SO3
from scavislam_tpu.ops.image import bilinear_sample


def build_rectify_map(
    cam: StereoCamera,
    dist_coeffs,  # (k1, k2, p1, p2, k3)
    rot_log,  # (3,) SO3 log of the rectifying rotation
) -> np.ndarray:
    """(H, W, 2) source-pixel map: dst pixel -> src pixel.

    OpenCV initUndistortRectifyMap algorithm: for each destination pixel u,
    x = R^-1 K^-1 u (undo rectification), apply the distortion model, then
    map back through K.
    """
    w, h = cam.size
    f = float(cam.focal)
    px, py = float(cam.pp[0]), float(cam.pp[1])
    k1, k2, p1, p2, k3 = [float(c) for c in dist_coeffs]

    R = np.asarray(SO3.exp(jnp.asarray(rot_log, jnp.float32)).R, np.float64)
    Rinv = R.T

    us, vs = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    x = (us - px) / f
    y = (vs - py) / f
    ones = np.ones_like(x)
    vec = np.stack([x, y, ones], axis=-1) @ Rinv.T
    xn = vec[..., 0] / vec[..., 2]
    yn = vec[..., 1] / vec[..., 2]

    r2 = xn * xn + yn * yn
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = xn * radial + 2 * p1 * xn * yn + p2 * (r2 + 2 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2 * yn * yn) + 2 * p2 * xn * yn

    map_u = xd * f + px
    map_v = yd * f + py
    return np.stack([map_u, map_v], axis=-1).astype(np.float32)


def remap(img: jnp.ndarray, rect_map: jnp.ndarray) -> jnp.ndarray:
    """Apply a rectify map (bilinear; out-of-bounds -> 0)."""
    vals, _ = bilinear_sample(img, jnp.asarray(rect_map))
    return vals


import jax


@jax.jit
def _rectify_stack(stacked, map_l, map_r):
    """Remap the left/right planes of a stacked frame; any further planes
    (external disparity) pass through untouched — the reference rectifies
    only the images (frame_grabber.cpp:245-256).

    dtype-PRESERVING on purpose: a uint8 frame stack comes back uint8
    (bilinear in f32, then round back — exactly cv::remap on 8u, which is
    what the reference runs). Preserving the dtype keeps the downstream
    fused frontend_step a SINGLE compiled program whether or not
    rectification is enabled; an f32 output here silently forked a second
    whole-program family (one full XLA compile per variant, measured 23 s
    on the CI machine and a duplicate program over the TPU tunnel)."""
    is_u8 = stacked.dtype == jnp.uint8
    f = stacked.astype(jnp.float32) / 255.0 if is_u8 else stacked
    planes = [
        remap(f[0], map_l)[None],
        remap(f[1], map_r)[None],
    ]
    if f.shape[0] > 2:
        planes.append(f[2:])
    out = jnp.concatenate(planes, axis=0)
    if is_u8:
        out = jnp.clip(out * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)
    return out


class Rectifier:
    """Both-eye rectifier built from a Config (parity surface:
    FrameGrabber::intializeRectifier + rectifyFrame). `rectify_stacked`
    is the frame-loop entry: one extra device program ahead of
    frontend_step, maps resident on device, no host sync."""

    def __init__(self, cam: StereoCamera, cfg):
        self.enabled = bool(cfg.framepipe.rectify_frame)
        if self.enabled:
            self.map_left = jnp.asarray(build_rectify_map(
                cam, cfg.cam.dist_left, cfg.cam.rot_left
            ))
            self.map_right = jnp.asarray(build_rectify_map(
                cam, cfg.cam.dist_right, cfg.cam.rot_right
            ))

    def __call__(self, left, right):
        if not self.enabled:
            return left, right
        return remap(left, self.map_left), remap(right, self.map_right)

    def rectify_stacked(self, stacked):
        if not self.enabled:
            return stacked
        return _rectify_stack(stacked, self.map_left, self.map_right)
