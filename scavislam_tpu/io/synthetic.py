"""Synthetic stereo sequence renderer with exact ground truth.

The reference validates end-to-end on the New College dataset by eyeball
(/root/reference/README:181-197); that dataset is not available here, so this
module renders photometrically-consistent stereo sequences from an analytic
scene (textured planes) with EXACT ground-truth poses and disparity. Used by
unit/integration tests and by bench.py.

Scene model: a "room" of 3 textured planes (back wall, floor, side wall).
For each pixel we ray-cast against all planes, take the nearest positive hit,
and evaluate a smooth procedural texture at the hit point. Left/right images
are rendered from the two rectified stereo viewpoints, so stereo geometry and
photometric constancy are exact by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3


class Plane(NamedTuple):
    normal: jnp.ndarray  # (3,) unit, world frame
    offset: jnp.ndarray  # scalar: points x with n.x = offset
    tex_u: jnp.ndarray  # (3,) texture axis 1
    tex_v: jnp.ndarray  # (3,) texture axis 2
    tex_phase: jnp.ndarray  # scalar, decorrelates textures across planes


def default_room() -> list[Plane]:
    """Back wall at z=6, floor at y=1.5, right wall at x=4 (world frame;
    camera starts at origin looking down +z)."""
    f32 = jnp.float32
    return [
        Plane(
            jnp.array([0.0, 0.0, 1.0], f32),
            jnp.array(6.0, f32),
            jnp.array([1.0, 0.0, 0.0], f32),
            jnp.array([0.0, 1.0, 0.0], f32),
            jnp.array(0.0, f32),
        ),
        Plane(
            jnp.array([0.0, 1.0, 0.0], f32),
            jnp.array(1.5, f32),
            jnp.array([1.0, 0.0, 0.0], f32),
            jnp.array([0.0, 0.0, 1.0], f32),
            jnp.array(11.0, f32),
        ),
        Plane(
            jnp.array([1.0, 0.0, 0.0], f32),
            jnp.array(4.0, f32),
            jnp.array([0.0, 0.0, 1.0], f32),
            jnp.array([0.0, 1.0, 0.0], f32),
            jnp.array(23.0, f32),
        ),
    ]


_TEX_FREQS = np.array(
    # (fu, fv, amp, phase0) — incommensurate frequencies at mixed orientations
    # so the texture is locally distinctive (no quasi-periodic aliases that
    # would make patch matching ambiguous).
    [
        (1.7, 1.1, 0.30, 0.0),
        (3.9, -2.3, 0.22, 1.1),
        (-2.9, 4.7, 0.18, 2.3),
        (7.3, 3.1, 0.14, 3.7),
        (-5.1, -8.3, 0.12, 0.9),
        (11.9, -6.7, 0.10, 4.4),
        (9.1, 13.7, 0.08, 2.8),
        (-15.7, 10.3, 0.06, 5.5),
        (19.3, 7.9, 0.05, 1.7),
        (-13.1, -21.7, 0.04, 3.2),
    ],
    dtype=np.float32,
)


def _texture(u, v, phase):
    """Smooth, locally distinctive procedural texture in ~[0.05, 0.95].

    Band-limited (sum of incommensurate cosine gratings) so bilinear sampling
    during rendering and tracking is well-behaved, yet aperiodic enough that
    ZMSSD patch matching has a unique optimum.
    """
    val = 0.0
    for fu, fv, amp, ph0 in _TEX_FREQS:
        val = val + amp * jnp.cos(
            float(fu) * u + float(fv) * v + float(ph0) + (1.0 + float(amp)) * phase
        )
    return 0.5 + 0.42 * val


def _render_view(planes, T_cw: SE3, cam: StereoCamera, eye_offset: float):
    """Render one view; eye_offset is 0 (left) or baseline (right eye sits at
    +baseline along the camera x-axis)."""
    w, h = cam.size
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    # ray directions in camera frame
    dx = (u - cam.pp[0]) / cam.focal
    dy = (v - cam.pp[1]) / cam.focal
    dirs_c = jnp.stack(
        [jnp.broadcast_to(dx, (h, w)), jnp.broadcast_to(dy, (h, w)),
         jnp.ones((h, w), jnp.float32)],
        axis=-1,
    )
    T_wc = T_cw.inverse()
    origin_c = jnp.array([eye_offset, 0.0, 0.0], jnp.float32)
    origin_w = T_wc.apply(origin_c)
    dirs_w = jnp.einsum("ij,hwj->hwi", T_wc.R, dirs_c)

    best_t = jnp.full((h, w), jnp.inf, jnp.float32)
    img = jnp.zeros((h, w), jnp.float32)
    for p in planes:
        denom = jnp.einsum("hwi,i->hw", dirs_w, p.normal)
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = (p.offset - jnp.dot(origin_w, p.normal)) / denom
        hit = (t > 0.1) & (t < best_t)
        pt = origin_w + t[..., None] * dirs_w
        tu = jnp.einsum("hwi,i->hw", pt, p.tex_u)
        tv = jnp.einsum("hwi,i->hw", pt, p.tex_v)
        tex = _texture(tu * 4.0, tv * 4.0, p.tex_phase)
        img = jnp.where(hit, tex, img)
        best_t = jnp.where(hit, t, best_t)

    # depth along camera z = t * dirs_c.z = t (dirs_c z == 1) in the EYE frame
    depth = best_t
    return img, depth


def render_stereo_frame(planes, T_cw: SE3, cam: StereoCamera):
    """Render (left, right, disparity, depth) for camera pose T_cw.

    Disparity is exact: d = f*b/z with z the left-eye depth.
    """
    left, depth = _render_view(planes, T_cw, cam, 0.0)
    right, _ = _render_view(planes, T_cw, cam, float(cam.baseline))
    disp = cam.focal * cam.baseline / depth
    disp = jnp.where(jnp.isfinite(disp), disp, 0.0)
    return left, right, disp, depth


render_stereo_frame_jit = jax.jit(
    render_stereo_frame, static_argnums=()
)


def make_trajectory(
    n_frames: int, kind: str = "forward_arc", step: float = 0.02
) -> list[SE3]:
    """Ground-truth camera poses T_cw (world->camera).

    ``step`` is the per-frame progress along the path (the reference pipeline
    runs at camera rate with small inter-frame motion; dense tracking has a
    limited convergence basin, dense_tracking.cpp relies on the same).
    """
    poses = []
    for i in range(n_frames):
        s = i * step
        if kind == "forward_arc":
            # move forward with a slight lateral arc and yaw
            t_wc = np.array([0.6 * np.sin(s * 1.2), -0.1 * s, 1.8 * s])
            yaw = 0.15 * np.sin(s * 2.0)
        elif kind == "orbit":
            t_wc = np.array([1.2 * np.sin(s * 2.4), 0.0, 1.2 * (1 - np.cos(s * 2.4))])
            yaw = -0.5 * s
        elif kind == "still":
            t_wc = np.zeros(3)
            yaw = 0.0
        else:
            raise ValueError(kind)
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=np.float32)
        T_wc = SE3(jnp.asarray(R_wc), jnp.asarray(t_wc, dtype=jnp.float32))
        poses.append(T_wc.inverse())
    return poses


class SyntheticSequence:
    """Iterator over rendered stereo frames with ground truth.

    Mirrors the role of the reference's FileGrabber+FrameGrabber pair for
    tests: each item has left/right float images in [0,1], exact disparity,
    and the ground-truth pose T_cw.
    """

    def __init__(self, cam: StereoCamera, n_frames=30, kind="forward_arc",
                 planes=None, step=0.02):
        self.cam = cam
        self.planes = planes if planes is not None else default_room()
        self.poses = make_trajectory(n_frames, kind, step)
        self._render = jax.jit(
            lambda R, t: render_stereo_frame(self.planes, SE3(R, t), cam)
        )

    def __len__(self):
        return len(self.poses)

    def frame(self, i):
        T = self.poses[i]
        left, right, disp, depth = self._render(T.R, T.t)
        return {
            "frame_id": i,
            "left": left,
            "right": right,
            "disp_gt": disp,
            "depth_gt": depth,
            "T_cw_gt": T,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self.frame(i)
