"""Projection helpers and analytic Jacobians.

Re-derives the reference's transformations toolbox
(/root/reference/scavislam/transformations.h:52-163 and
maths_utils.h:52-69) as pure JAX, batched over leading dims. Every analytic
Jacobian here is unit-tested against ``jax.jacfwd`` of the corresponding
prediction function (tests/test_core_jacobians.py) — the reference has no such
tests.

Conventions:
- inverse-depth point ``psi = (x/z, y/z, 1/z)`` in its anchor frame;
  ``invert_depth(psi)`` recovers the 3-D point (maths_utils.h:66-69);
- pose updates are left-multiplicative ``T <- exp(delta) * T`` with tangent
  layout ``[upsilon, omega]`` (see core.lie);
- stereo observation ``uvu = (u_left, v, u_right)``.
"""

from __future__ import annotations

import jax.numpy as jnp

from scavislam_tpu.core.lie import SE3, hat
from scavislam_tpu.core.camera import StereoCamera


# -- point parametrizations ------------------------------------------------

def project2d(xyz: jnp.ndarray) -> jnp.ndarray:
    return xyz[..., :2] / xyz[..., 2:3]


def unproject2d(uv: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([uv, jnp.ones_like(uv[..., :1])], axis=-1)


def invert_depth(psi: jnp.ndarray) -> jnp.ndarray:
    """(u, v, q) -> xyz = (u/q, v/q, 1/q). Involution (parity: maths_utils.h:66-69)."""
    return unproject2d(psi[..., :2]) / psi[..., 2:3]


def psi_from_xyz(xyz: jnp.ndarray) -> jnp.ndarray:
    """xyz -> (x/z, y/z, 1/z). Inverse of :func:`invert_depth`."""
    return jnp.stack(
        [
            xyz[..., 0] / xyz[..., 2],
            xyz[..., 1] / xyz[..., 2],
            1.0 / xyz[..., 2],
        ],
        axis=-1,
    )


# -- elementary Jacobians ---------------------------------------------------

def d_proj_d_y(focal, xyz: jnp.ndarray) -> jnp.ndarray:
    """d(pinhole uv)/d(camera-frame xyz): (..., 2, 3).

    Parity: transformations.h:52-60.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    z_sq = z * z
    zero = jnp.zeros_like(z)
    row0 = jnp.stack([focal / z, zero, -(focal * x) / z_sq], axis=-1)
    row1 = jnp.stack([zero, focal / z, -(focal * y) / z_sq], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def d_stereoproj_d_y(focal, baseline, xyz: jnp.ndarray) -> jnp.ndarray:
    """d(uvu)/d(camera-frame xyz): (..., 3, 3).

    Parity: transformations.h:62-71.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    z_sq = z * z
    zero = jnp.zeros_like(z)
    row0 = jnp.stack([focal / z, zero, -(focal * x) / z_sq], axis=-1)
    row1 = jnp.stack([zero, focal / z, -(focal * y) / z_sq], axis=-1)
    row2 = jnp.stack([focal / z, zero, -(focal * (x - baseline)) / z_sq], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def d_expy_d_y(y: jnp.ndarray) -> jnp.ndarray:
    """d(exp(xi) * y)/d(xi) at xi=0: (..., 3, 6) = [I | -hat(y)].

    Parity: transformations.h:73-80.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), (*y.shape[:-1], 3, 3))
    return jnp.concatenate([eye, -hat(y)], axis=-1)


def d_Tinvpsi_d_psi(T: SE3, psi: jnp.ndarray) -> jnp.ndarray:
    """d(T * invert_depth(psi))/d(psi): (..., 3, 3).

    Parity: transformations.h:82-95.
    """
    x = invert_depth(psi)
    r1 = T.R[..., :, 0]
    r2 = T.R[..., :, 1]
    Rx = jnp.einsum("...ij,...j->...i", T.R, x)
    J = jnp.stack([r1, r2, -Rx], axis=-1)
    return J / psi[..., 2:3, None]


# -- composite prediction models ---------------------------------------------
# Each model is (predict, frame_jac[, anchor_jac, point_jac]) — Jacobians of
# the PREDICTION wrt the left-multiplicative pose tangent(s) / point params.
# The reference's AbstractPrediction hierarchy (transformations.h:177-396) is
# replaced by plain functions; autodiff is the numeric fallback.


def predict_uvu_world(cam: StereoCamera, T_cw: SE3, xyz_w: jnp.ndarray) -> jnp.ndarray:
    """SE3XYZ_STEREO model (transformations.h:414-464): world point -> uvu."""
    return cam.map_uvu(T_cw.apply(xyz_w))


def frame_jac_uvu_world(cam: StereoCamera, T_cw: SE3, xyz_w: jnp.ndarray) -> jnp.ndarray:
    """d(predict_uvu_world)/d(xi) for T <- exp(xi)*T: (..., 3, 6).

    Parity: transformations.h frame_jac_xyz2uvu (116-164) modulo sign — we
    return the Jacobian of the prediction (the reference stores the Jacobian
    of the residual obs - pred, i.e. the negative).
    """
    y = T_cw.apply(xyz_w)
    return d_stereoproj_d_y(cam.focal, cam.baseline, y) @ d_expy_d_y(y)


def point_jac_uvu_world(cam: StereoCamera, T_cw: SE3, xyz_w: jnp.ndarray) -> jnp.ndarray:
    """d(predict_uvu_world)/d(xyz_w): (..., 3, 3)."""
    y = T_cw.apply(xyz_w)
    return d_stereoproj_d_y(cam.focal, cam.baseline, y) @ T_cw.R


def predict_anchored_uvu(
    cam: StereoCamera, T_cw: SE3, A_aw: SE3, psi_a: jnp.ndarray
) -> jnp.ndarray:
    """SE3AnchordUVQ_STEREO model (transformations.h:623-839): anchored
    inverse-depth point -> uvu seen from observer ``T_cw``.

    This is the measurement model of the DWO inner window's ternary factor
    (g2o_types/anchored_points.cpp:148-189 in the reference).
    """
    T_ca = T_cw @ A_aw.inverse()
    y = T_ca.apply(invert_depth(psi_a))
    return cam.map_uvu(y)


def anchored_jacs(
    cam: StereoCamera, T_cw: SE3, A_aw: SE3, psi_a: jnp.ndarray
):
    """All three Jacobians of :func:`predict_anchored_uvu`.

    Returns (J_frame (...,3,6), J_anchor (...,3,6), J_point (...,3,3)):
    - J_frame  wrt left-mult tangent of the observer pose T_cw,
    - J_anchor wrt left-mult tangent of the anchor pose A_aw,
    - J_point  wrt psi_a.

    Parity: the frameJac/anchorJac/pointJac trio of SE3AnchordUVQ_STEREO
    (transformations.h:658-690,783-788) without the residual-sign flip.
    """
    T_ca = T_cw @ A_aw.inverse()
    x = invert_depth(psi_a)
    y = T_ca.apply(x)
    J_proj = d_stereoproj_d_y(cam.focal, cam.baseline, y)
    J_frame = J_proj @ d_expy_d_y(y)
    # y = T_cw * (exp(eps) * A_aw)^-1 * x = T_cw * A_aw^-1 * exp(-eps) * x
    # => dy/deps = -T_ca.R @ d_expy_d_y(x)
    J_anchor = -(J_proj @ T_ca.R @ d_expy_d_y(x))
    J_point = J_proj @ d_Tinvpsi_d_psi(T_ca, psi_a)
    return J_frame, J_anchor, J_point


def predict_uv_world(cam, T_cw: SE3, xyz_w: jnp.ndarray) -> jnp.ndarray:
    """SE3XYZ model (transformations.h:466-519): world point -> mono uv.
    ``cam`` is any pinhole with .focal/.pp (LinearCamera or StereoCamera)."""
    y = T_cw.apply(xyz_w)
    return project2d(y) * cam.focal + cam.pp


def frame_jac_uv_world(cam, T_cw: SE3, xyz_w: jnp.ndarray) -> jnp.ndarray:
    """d(predict_uv_world)/d(xi), T <- exp(xi) T: (..., 2, 6)."""
    y = T_cw.apply(xyz_w)
    return d_proj_d_y(cam.focal, y) @ d_expy_d_y(y)


def predict_uv_psi(cam, T_ca: SE3, psi: jnp.ndarray) -> jnp.ndarray:
    """SE3UVQ model (transformations.h:521-575): inverse-depth point in the
    reference camera -> mono uv in the observing camera."""
    y = T_ca.apply(invert_depth(psi))
    return project2d(y) * cam.focal + cam.pp


def uv_psi_jacs(cam, T_ca: SE3, psi: jnp.ndarray):
    """(J_frame (...,2,6), J_point (...,2,3)) of :func:`predict_uv_psi`."""
    y = T_ca.apply(invert_depth(psi))
    Jp = d_proj_d_y(cam.focal, y)
    return Jp @ d_expy_d_y(y), Jp @ d_Tinvpsi_d_psi(T_ca, psi)


def predict_uvu_psi(cam: StereoCamera, T_ca: SE3, psi: jnp.ndarray) -> jnp.ndarray:
    """SE3UVQ_STEREO model (transformations.h:841-900): non-anchored
    inverse-depth point -> stereo uvu."""
    return cam.map_uvu(T_ca.apply(invert_depth(psi)))


def uvu_psi_jacs(cam: StereoCamera, T_ca: SE3, psi: jnp.ndarray):
    """(J_frame (...,3,6), J_point (...,3,3)) of :func:`predict_uvu_psi`."""
    y = T_ca.apply(invert_depth(psi))
    Jp = d_stereoproj_d_y(cam.focal, cam.baseline, y)
    return Jp @ d_expy_d_y(y), Jp @ d_Tinvpsi_d_psi(T_ca, psi)


def predict_uvu_from_uvu(cam: StereoCamera, T_c2_c1: SE3,
                         uvu_1: jnp.ndarray) -> jnp.ndarray:
    """SE3UVU_STEREO model (transformations.h:577-621): a point
    PARAMETRIZED by its first-view stereo observation (u, v, u_r) -> its
    uvu in a second view. unmap then remap — the reference uses this to
    optimize directly over measured stereo coordinates."""
    return cam.map_uvu(T_c2_c1.apply(cam.unmap_uvu(uvu_1)))


def predict_anchored_uv(cam, T_cw: SE3, A_aw: SE3,
                        psi_a: jnp.ndarray) -> jnp.ndarray:
    """SE3AnchordUVQ model (transformations.h:623-720, the MONO anchored
    measurement): anchored inverse-depth point -> mono uv."""
    T_ca = T_cw @ A_aw.inverse()
    y = T_ca.apply(invert_depth(psi_a))
    return project2d(y) * cam.focal + cam.pp


def anchored_uv_jacs(cam, T_cw: SE3, A_aw: SE3, psi_a: jnp.ndarray):
    """(J_frame, J_anchor, J_point) of :func:`predict_anchored_uv` —
    the mono trio of SE3AnchordUVQ (transformations.h:658-720)."""
    T_ca = T_cw @ A_aw.inverse()
    x = invert_depth(psi_a)
    y = T_ca.apply(x)
    Jp = d_proj_d_y(cam.focal, y)
    J_frame = Jp @ d_expy_d_y(y)
    J_anchor = -(Jp @ T_ca.R @ d_expy_d_y(x))
    J_point = Jp @ d_Tinvpsi_d_psi(T_ca, psi_a)
    return J_frame, J_anchor, J_point


def relative_pose_error(T_21: SE3, T_1w: SE3, T_w2_inv: SE3) -> jnp.ndarray:
    """log(T_21 * T_1w * T_w2) — the G2oEdgeSE3 error (anchored_points.cpp:207-214).

    ``T_w2_inv`` is the second vertex pose T_2w (we pass the stored pose
    directly and invert inside to match the reference's call shape).
    """
    return (T_21 @ T_1w @ T_w2_inv.inverse()).log()


def se3_right_jacobian_inv(d: jnp.ndarray) -> jnp.ndarray:
    """2nd-order BCH series J_r^{-1}(d) ~ I + 1/2 ad(d) + 1/12 ad(d)^2.

    This is the series the reference's relative-pose edge calls ``third``
    (anchored_points.cpp:216-235); exact to O(|d|^3), which matches g2o's
    linearization quality for the small constraint errors of a converged
    pose graph.
    """
    from scavislam_tpu.core.lie import ad_se3

    A = ad_se3(d)
    eye = jnp.broadcast_to(jnp.eye(6, dtype=d.dtype), A.shape)
    return eye + 0.5 * A + (1.0 / 12.0) * (A @ A)


def se3_left_jacobian_inv(d: jnp.ndarray) -> jnp.ndarray:
    """J_l^{-1}(d) = J_r^{-1}(-d) ~ I - 1/2 ad(d) + 1/12 ad(d)^2."""
    return se3_right_jacobian_inv(-d)


def relative_pose_jacobians(T_21: SE3, T_1w: SE3, T_2w: SE3):
    """Jacobians of :func:`relative_pose_error` wrt LEFT-multiplicative
    tangents of T_1w and T_2w.

    With d = log(T_21 T_1w T_2w^-1):
      err(xi1) = log(exp(Adj(T_21) xi1) exp(d))  =>  J1 =  Jl^-1(d) Adj(T_21)
      err(xi2) = log(exp(d) exp(-xi2))           =>  J2 = -Jr^-1(d)
    (2nd-order BCH; the pose-graph edge of the DWO outer window,
    cf. G2oEdgeSE3 anchored_points.cpp:207-235.)
    """
    d = relative_pose_error(T_21, T_1w, T_2w)
    J1 = se3_left_jacobian_inv(d) @ T_21.adjoint()
    J2 = -se3_right_jacobian_inv(d)
    return d, J1, J2


# -- homography ---------------------------------------------------------------

def homography_c2_from_c1(
    T_c2_from_c1: SE3, normal_c1: jnp.ndarray, point_on_plane_c1: jnp.ndarray
) -> jnp.ndarray:
    """Plane-induced homography H such that x2 ~ H @ x1 (normalized coords).

    H = R + t * n^T / d with d = n . p, the standard formula; parity surface:
    the reference's Homography::calc_c2_from_c1
    (/root/reference/scavislam/homography.{h,cpp}, used by the disabled
    projective patch-warp path, matcher.cpp:461-525).
    """
    d = jnp.sum(normal_c1 * point_on_plane_c1, axis=-1)
    return T_c2_from_c1.R + (
        T_c2_from_c1.t[..., :, None] * normal_c1[..., None, :]
        / d[..., None, None]
    )
