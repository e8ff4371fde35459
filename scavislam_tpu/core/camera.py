"""Pinhole and stereo camera models (pure JAX, batch-friendly).

Re-implements the behavior of the reference's VisionTools ``LinearCamera`` and
``StereoCamera`` (/root/reference/scavislam/stereo_camera.{h,cpp}): the stereo
observation is the 3-vector ``uvu`` = (u_left, v, u_right), and the
reprojection matrix ``Q`` maps homogeneous (u, v, disparity, 1) to a scaled
3-D point (stereo_camera.cpp:24-34).

Note: the reference's ``depthToDisp`` (stereo_camera.cpp:54-59) computes
``f / (z * b)`` which is inconsistent with its own ``unmap_uvu`` (which
expects ``d = u_l - u_r = f * b / z``); we implement the geometrically
consistent ``depth_to_disp = f * b / z`` and use it everywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class LinearCamera(NamedTuple):
    """Pinhole camera: single focal length, principal point, image size.

    Matches VisionTools' LinearCamera constructor signature used at
    stereo_camera.h:58-67 (scalar focal length + 2-vector principal point).
    All fields are scalars / small arrays so the struct is a valid pytree leaf
    bundle and can be passed through jit boundaries.
    """

    focal: jnp.ndarray  # scalar
    pp: jnp.ndarray  # (2,) principal point (px, py)
    size: tuple  # (width, height) — static python ints

    @property
    def width(self):
        return self.size[0]

    @property
    def height(self):
        return self.size[1]

    def map(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Normalized image plane (..., 2) -> pixels (..., 2)."""
        return xy * self.focal + self.pp

    def unmap(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixels (..., 2) -> normalized image plane (..., 2)."""
        return (uv - self.pp) / self.focal

    def project(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame points (..., 3) -> pixels (..., 2)."""
        return self.map(xyz[..., :2] / xyz[..., 2:3])

    def intrinsics(self) -> jnp.ndarray:
        """3x3 K matrix."""
        f = self.focal
        px, py = self.pp[0], self.pp[1]
        z = jnp.zeros_like(f)
        o = jnp.ones_like(f)
        return jnp.stack(
            [
                jnp.stack([f, z, px]),
                jnp.stack([z, f, py]),
                jnp.stack([z, z, o]),
            ]
        )


class StereoCamera(NamedTuple):
    """Calibrated rectified stereo rig; observations are uvu triplets.

    Mirrors /root/reference/scavislam/stereo_camera.h:29-93.
    """

    focal: jnp.ndarray  # scalar
    pp: jnp.ndarray  # (2,)
    size: tuple  # (width, height) static
    baseline: jnp.ndarray  # scalar

    @property
    def width(self):
        return self.size[0]

    @property
    def height(self):
        return self.size[1]

    @property
    def mono(self) -> LinearCamera:
        return LinearCamera(self.focal, self.pp, self.size)

    @staticmethod
    def create(focal, pp, size, baseline, dtype=jnp.float32) -> "StereoCamera":
        return StereoCamera(
            jnp.asarray(focal, dtype),
            jnp.asarray(pp, dtype),
            (int(size[0]), int(size[1])),
            jnp.asarray(baseline, dtype),
        )

    def map_uvu(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame 3-D points (..., 3) -> (u_left, v, u_right).

        Parity target: stereo_camera.cpp:36-44.
        """
        z = xyz[..., 2]
        u = xyz[..., 0] / z * self.focal + self.pp[0]
        v = xyz[..., 1] / z * self.focal + self.pp[1]
        u_r = (xyz[..., 0] - self.baseline) / z * self.focal + self.pp[0]
        return jnp.stack([u, v, u_r], axis=-1)

    def unmap_uvu(self, uvu: jnp.ndarray) -> jnp.ndarray:
        """(u_left, v, u_right) -> camera-frame 3-D point.

        Parity target: stereo_camera.cpp:46-52.
        """
        disp = uvu[..., 0] - uvu[..., 2]
        z = self.focal * self.baseline / disp
        x = (uvu[..., 0] - self.pp[0]) / self.focal * z
        y = (uvu[..., 1] - self.pp[1]) / self.focal * z
        return jnp.stack([x, y, z], axis=-1)

    def uv_disp_to_xyz(self, u, v, disp) -> jnp.ndarray:
        """Back-project (u, v, disparity) -> camera-frame xyz (broadcasting)."""
        z = self.focal * self.baseline / disp
        x = (u - self.pp[0]) / self.focal * z
        y = (v - self.pp[1]) / self.focal * z
        return jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)

    def depth_to_disp(self, depth):
        """Consistent inverse of unmap: d = f*b/z (see module docstring)."""
        return self.focal * self.baseline / depth

    def Q(self) -> jnp.ndarray:
        """Reprojection matrix: Q @ (u, v, d, 1) ~ (x, y, z, 1) up to scale.

        Parity target: stereo_camera.cpp:24-34.
        """
        f = self.focal
        one = jnp.ones_like(f)
        zero = jnp.zeros_like(f)
        return jnp.stack(
            [
                jnp.stack([one, zero, zero, -self.pp[0]]),
                jnp.stack([zero, one, zero, -self.pp[1]]),
                jnp.stack([zero, zero, zero, f]),
                jnp.stack([zero, zero, one / self.baseline, zero]),
            ]
        )

    def scale_level(self, level: int) -> "StereoCamera":
        """Camera for pyramid level `level`.

        Focal and principal point halve per level; the baseline DOUBLES per
        level so that f*b (hence the disparity value for a given depth) is
        invariant across levels — the reference's "×2^l baseline trick"
        (frame_grabber-impl.cpp:50-59), which lets level-0 disparity values be
        used directly at any pyramid level.
        """
        s = float(2**level)
        return StereoCamera(
            self.focal / s,
            (self.pp + 0.5) / s - 0.5,
            (self.size[0] // (2**level), self.size[1] // (2**level)),
            self.baseline * s,
        )
