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
