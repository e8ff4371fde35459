"""Motion-only bundle adjustment: LM over one SE3 pose, points fixed.

Re-implements the reference's PoseOptimizer::calcFastMotionOnly
(/root/reference/scavislam/pose_optimizer.h:134-298): robust (pseudo-Huber)
LM over the 6-DoF pose given fixed 3-D points and stereo uvu observations,
15 iterations, <=5 failed trials, mu0 from the max Hessian diagonal,
mu *= max(1/3, 1-(2*rho_ratio-1)^3) on success / mu *= nu, nu *= 2 on failure,
left-multiplicative updates.

TPU design: the whole LM loop is one `lax.while_loop` inside jit; per-obs
residuals/Jacobians are batched vector math and the 6x6 normal equations are
one einsum. Invalid observations are masked (weight 0), keeping shapes static.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3

MAX_ITERS = 15
MAX_TRIALS = 5


class MotionOnlyResult(NamedTuple):
    T: SE3
    chi2: jnp.ndarray
    num_obs: jnp.ndarray
    residuals: jnp.ndarray  # (N, 3) final obs - pred (level-0 uvu pixels)
    inlier_mask: jnp.ndarray  # valid & finite prediction


def _predict_and_jac(cam: StereoCamera, R, t, xyz_w):
    """uvu prediction + d(pred)/dxi for all points (batched, fused)."""
    y = jnp.einsum("ij,nj->ni", R, xyz_w) + t
    x, yy = y[..., 0], y[..., 1]
    z = y[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    f = cam.focal
    u = x / z_safe * f + cam.pp[0]
    v = yy / z_safe * f + cam.pp[1]
    ur = (x - cam.baseline) / z_safe * f + cam.pp[0]
    pred = jnp.stack([u, v, ur], axis=-1)

    z2 = z_safe * z_safe
    zero = jnp.zeros_like(z)
    # d(uvu)/d(xyz_cur) rows
    r0 = jnp.stack([f / z_safe, zero, -f * x / z2], axis=-1)
    r1 = jnp.stack([zero, f / z_safe, -f * yy / z2], axis=-1)
    r2 = jnp.stack([f / z_safe, zero, -f * (x - cam.baseline) / z2], axis=-1)
    Jproj = jnp.stack([r0, r1, r2], axis=-2)  # (N, 3, 3)
    # d(xyz_cur)/dxi = [I | -hat(y)]
    from scavislam_tpu.core.lie import hat

    Jexp = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), (*y.shape[:-1], 3, 3)),
            -hat(y),
        ],
        axis=-1,
    )  # (N, 3, 6)
    return pred, Jproj @ Jexp, z


def _predict_and_jac_uv(focal, ppx, ppy, R, t, xyz_w):
    """Monocular uv prediction + d(pred)/dxi (parity: the MONO prediction
    models SE3XYZ / frame_jac_xyz2uv, transformations.h:116-139,623-660)."""
    y = jnp.einsum("ij,nj->ni", R, xyz_w) + t
    x, yy = y[..., 0], y[..., 1]
    z = y[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = x / z_safe * focal + ppx
    v = yy / z_safe * focal + ppy
    pred = jnp.stack([u, v], axis=-1)

    z2 = z_safe * z_safe
    zero = jnp.zeros_like(z)
    r0 = jnp.stack([focal / z_safe, zero, -focal * x / z2], axis=-1)
    r1 = jnp.stack([zero, focal / z_safe, -focal * yy / z2], axis=-1)
    Jproj = jnp.stack([r0, r1], axis=-2)  # (N, 2, 3)
    from scavislam_tpu.core.lie import hat

    Jexp = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), (*y.shape[:-1], 3, 3)),
            -hat(y),
        ],
        axis=-1,
    )  # (N, 3, 6)
    return pred, Jproj @ Jexp, z


def pseudo_huber_weight(chi2: jnp.ndarray, delta: float):
    """IRLS weight for the pseudo-Huber kernel at squared error chi2."""
    return 1.0 / jnp.sqrt(1.0 + chi2 / (delta * delta))


def motion_only_ba(
    cam: StereoCamera,
    T_init: SE3,
    xyz_w: jnp.ndarray,  # (N, 3) fixed world points
    obs_uvu: jnp.ndarray,  # (N, 3) level-0 uvu observations
    weights: jnp.ndarray,  # (N,) per-obs base weight (e.g. 4^-level)
    valid: jnp.ndarray,  # (N,) bool
    huber_delta: float = 1.0,
) -> MotionOnlyResult:
    """Run the robust LM loop; everything on device, one jit per shape."""

    def _masked_residuals(R, t):
        """Residuals with invalid / behind-camera / non-finite entries zeroed
        so they cannot poison the reductions (0 * inf = nan otherwise)."""
        pred, J, z = _predict_and_jac(cam, R, t, xyz_w)
        r = obs_uvu - pred
        mask = valid & (z > 0.1) & jnp.all(jnp.isfinite(r), axis=-1)
        r = jnp.where(mask[:, None], r, 0.0)
        return r, J, mask

    return _lm_pose_core(_masked_residuals, T_init, weights, valid,
                         huber_delta)


def motion_only_ba_uv(
    cam_params,  # (focal, ppx, ppy) — monocular pinhole
    T_init: SE3,
    xyz_w: jnp.ndarray,  # (N, 3) fixed world points
    obs_uv: jnp.ndarray,  # (N, 2) level-0 uv observations
    weights: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool
    huber_delta: float = 1.0,
) -> MotionOnlyResult:
    """Monocular motion-only BA: the same robust LM over 2-component uv
    residuals (parity: the MONO-typedef'd BA_SE3_XYZ optimizer,
    pose_optimizer.h:489-495 — the reference instantiates its PoseOptimizer
    for uv observations behind #ifdef MONO but never ships it enabled)."""
    focal, ppx, ppy = cam_params

    def _masked_residuals(R, t):
        pred, J, z = _predict_and_jac_uv(focal, ppx, ppy, R, t, xyz_w)
        r = obs_uv - pred
        mask = valid & (z > 0.1) & jnp.all(jnp.isfinite(r), axis=-1)
        r = jnp.where(mask[:, None], r, 0.0)
        return r, J, mask

    return _lm_pose_core(_masked_residuals, T_init, weights, valid,
                         huber_delta)


def _lm_pose_core(_masked_residuals, T_init, weights, valid, huber_delta):
    """The robust LM loop over one SE3 pose, generic in observation
    dimension: `_masked_residuals(R, t) -> (r (N,D), J (N,D,6), mask (N,))`.
    Shared by the stereo (uvu, D=3) and monocular (uv, D=2) optimizers."""

    def chi2_of(R, t):
        r, _, mask = _masked_residuals(R, t)
        s = jnp.sum(r * r, axis=-1)
        w = weights * pseudo_huber_weight(s, huber_delta) * mask
        return jnp.sum(w * s), r, w

    chi2_0, _, _ = chi2_of(T_init.R, T_init.t)

    def normal_eq(R, t):
        r, J, mask = _masked_residuals(R, t)
        s = jnp.sum(r * r, axis=-1)
        w = weights * pseudo_huber_weight(s, huber_delta) * mask
        J = jnp.where(mask[:, None, None], J, 0.0)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J, preferred_element_type=jnp.float32)
        b = jnp.einsum("nij,ni->j", Jw, r, preferred_element_type=jnp.float32)
        return H, b

    def cond(state):
        R, t, chi2, mu, nu, trial, it, stop = state
        return jnp.logical_and(it < MAX_ITERS, jnp.logical_not(stop))

    def body(state):
        R, t, chi2, mu, nu, trial, it, stop = state
        H, b = normal_eq(R, t)
        Hd = H + mu * jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(6, dtype=H.dtype)
        x = jax.scipy.linalg.solve(Hd, b, assume_a="pos")
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        T_new = SE3.exp(x) @ SE3(R, t)
        new_chi2, _, _ = chi2_of(T_new.R, T_new.t)
        rho = chi2 - new_chi2
        accept = rho > 0
        stop_acc = jnp.max(jnp.abs(x)) <= 1e-10
        # normalized gain ratio for the mu schedule (pose_optimizer.h uses the
        # same Nielsen rule as the dense tracker)
        denom = jnp.maximum(jnp.sum(x * (mu * x + b)), 1e-20)
        rho_n = rho / denom
        mu_acc = mu * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho_n - 1.0) ** 3)
        trial_new = jnp.where(accept, 0, trial + 1)
        return (
            jnp.where(accept, T_new.R, R),
            jnp.where(accept, T_new.t, t),
            jnp.where(accept, new_chi2, chi2),
            jnp.where(accept, mu_acc, mu * nu),
            jnp.where(accept, 2.0, nu * 2.0),
            trial_new,
            jnp.where(accept, it + 1, it),
            jnp.where(accept, stop_acc, trial_new >= MAX_TRIALS),
        )

    # Multiplicative damping is scale-free, so mu0 is a small constant
    # (matching the reference's 0.01 in both optimizers) — NOT the additive
    # tau*max(diag H) rule, which would overdamp by orders of magnitude.
    init = (
        T_init.R, T_init.t, chi2_0,
        jnp.float32(0.01), jnp.float32(2.0),
        jnp.int32(0), jnp.int32(0), jnp.bool_(False),
    )
    R, t, chi2, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)

    residuals, _, inliers = _masked_residuals(R, t)
    return MotionOnlyResult(
        SE3(R, t), chi2, jnp.sum(valid.astype(jnp.int32)), residuals, inliers
    )


motion_only_ba_jit = jax.jit(motion_only_ba, static_argnames=("huber_delta",))


@partial(
    jax.jit,
    static_argnames=("huber_delta", "reject_thresh", "rounds"),
)
def motion_only_ba_robust(
    cam: StereoCamera,
    T_init: SE3,
    xyz_w: jnp.ndarray,
    obs_uvu: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray,
    huber_delta: float = 1.0,
    reject_thresh: float = 3.0,
    rounds: int = 2,
) -> MotionOnlyResult:
    """LM + outlier rejection: optimize, drop obs with max-component residual
    above ``reject_thresh`` pixels, re-optimize.

    This mirrors the reference's system-level behavior, where
    processMatchedPoints gates observations by reprojection error after the
    motion-only solve (stereo_frontend.cpp:834-974) and only gated matches
    feed later stages. Still a single jitted program (static `rounds`).
    """
    res = motion_only_ba(cam, T_init, xyz_w, obs_uvu, weights, valid,
                         huber_delta)
    keep = valid
    for _ in range(rounds - 1):
        keep = (
            keep
            & res.inlier_mask
            & (jnp.max(jnp.abs(res.residuals), axis=-1) < reject_thresh)
        )
        res = motion_only_ba(cam, res.T, xyz_w, obs_uvu, weights, keep,
                             huber_delta)
    return res


class PointFilterResult(NamedTuple):
    psi: jnp.ndarray  # (N, 3) updated inverse-depth points
    Lambda: jnp.ndarray  # (N, 3, 3) updated information
    res: jnp.ndarray  # (N,) final cost (reproj + prior Mahalanobis)


@partial(jax.jit, static_argnames=("iters",))
def filter_points_info(
    cam_params,  # (focal, ppx, ppy) — monocular pinhole
    R_ca: jnp.ndarray,  # (N, 3, 3) observing-cam from anchor
    t_ca: jnp.ndarray,  # (N, 3)
    psi: jnp.ndarray,  # (N, 3) inverse-depth points in anchor frame
    Lambda: jnp.ndarray,  # (N, 3, 3) prior information (0 = no depth prior)
    obs_uv: jnp.ndarray,  # (N, 2) observed pixel in the observing cam
    valid: jnp.ndarray,  # (N,)
    iters: int = 5,
) -> PointFilterResult:
    """Batched single-landmark information filter — monocular depth-free
    point initialization (parity surface: the MONO-gated
    ``filterSingleFeatureOnly``, pose_optimizer.h:300-422; Strasdat et al.,
    "Scale Drift-Aware Large Scale Monocular SLAM", RSS 2010).

    Per landmark: LM-minimize ``|obs - proj(T_ca, psi)|^2 +
    (psi0 - psi)^T Lambda (psi0 - psi)`` (the prior keeps already-filtered
    directions anchored while the unobservable depth stays free until
    parallax arrives), then ADD the measured information ``J^T J`` to
    Lambda. The reference filters one landmark in a double-precision scalar
    loop; here every candidate landmark in the keyframe filters in parallel
    as one fixed-iteration jitted program (vmap-free batched math, masked).
    """
    from scavislam_tpu.models.ba_solver import _inv3x3

    focal, ppx, ppy = cam_params
    psi0 = psi
    eye3 = jnp.eye(3, dtype=jnp.float32)

    def predict(p):
        q = p[:, 2:3]
        q_safe = jnp.where(jnp.abs(q) < 1e-9, 1e-9, q)
        xyz_a = jnp.concatenate([p[:, :2], jnp.ones_like(q)], -1) / q_safe
        y = jnp.einsum("nij,nj->ni", R_ca, xyz_a) + t_ca
        z = y[:, 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        uv = jnp.stack([y[:, 0] / z_safe * focal + ppx,
                        y[:, 1] / z_safe * focal + ppy], -1)
        return uv, y, z_safe, q_safe[:, 0]

    def jac(p, y, z_safe, q):
        # d uv / d psi = Jproj(y) @ d(T psi^-1)/d psi  (cf. ba_solver Jp)
        zero = jnp.zeros_like(z_safe)
        z2 = z_safe * z_safe
        Jproj = jnp.stack([
            jnp.stack([focal / z_safe, zero, -focal * y[:, 0] / z2], -1),
            jnp.stack([zero, focal / z_safe, -focal * y[:, 1] / z2], -1),
        ], -2)  # (N, 2, 3)
        r1 = R_ca[..., :, 0]
        r2 = R_ca[..., :, 1]
        Rx = jnp.einsum("nij,nj->ni", R_ca,
                        jnp.concatenate([p[:, :2], jnp.ones_like(p[:, :1])],
                                        -1) / jnp.where(
                            jnp.abs(p[:, 2:3]) < 1e-9, 1e-9, p[:, 2:3]))
        inner = jnp.stack([r1, r2, -Rx], -1) / q[:, None, None]
        return Jproj @ inner  # (N, 2, 3)

    def cost(p):
        uv, y, z_safe, q = predict(p)
        r = obs_uv - uv
        d = psi0 - p
        prior = jnp.einsum("ni,nij,nj->n", d, Lambda, d)
        return jnp.sum(r * r, -1) + prior, r, (y, z_safe, q)

    res, r, aux = cost(psi)
    mu = jnp.full(psi.shape[:1], 0.01, jnp.float32)
    nu = jnp.full(psi.shape[:1], 2.0, jnp.float32)
    p_cur = psi
    for _ in range(iters):
        uv, y, z_safe, q = predict(p_cur)
        J = jac(p_cur, y, z_safe, q)
        r_cur = obs_uv - uv
        V = jnp.einsum("nki,nkj->nij", J, J)
        g = jnp.einsum("nki,nk->ni", J, r_cur) + jnp.einsum(
            "nij,nj->ni", Lambda, psi0 - p_cur)
        H = Lambda + V + mu[:, None, None] * eye3
        delta = jnp.einsum("nij,nj->ni", _inv3x3(H), g)
        p_new = p_cur + delta
        res_new, _, _ = cost(p_new)
        accept = (res_new < res) & valid & jnp.all(
            jnp.isfinite(p_new), -1)
        p_cur = jnp.where(accept[:, None], p_new, p_cur)
        res = jnp.where(accept, res_new, res)
        mu = jnp.where(accept, mu / 3.0, mu * nu)
        nu = jnp.where(accept, 2.0, nu * 2.0)

    # Lambda += V at the converged point (information update)
    uv, y, z_safe, q = predict(p_cur)
    J = jac(p_cur, y, z_safe, q)
    V = jnp.einsum("nki,nkj->nij", J, J)
    ok = valid[:, None, None]
    return PointFilterResult(
        jnp.where(valid[:, None], p_cur, psi),
        jnp.where(ok, Lambda + V, Lambda),
        res,
    )
