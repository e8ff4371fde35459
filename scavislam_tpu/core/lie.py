"""SO3 / SE3 Lie groups as pure, batch-friendly JAX operations.

Replaces the Sophus dependency of the reference (see SURVEY.md §2 "External
library dependencies"; reference usage e.g. /root/reference/scavislam/
g2o_types/anchored_points.cpp:53-58 uses left-multiplicative ``SE3::exp(d) * T``
updates, and transformations.h:69-95 builds Jacobians from the same
convention).

Conventions (Sophus-compatible):
- tangent vectors are 6-vectors ``[upsilon(3), omega(3)]`` — translation first;
- group element stored as rotation matrix ``R`` (..., 3, 3) plus translation
  ``t`` (..., 3);
- retraction is LEFT-multiplicative: ``T <- exp(delta) * T``.

Everything is shape-polymorphic over leading batch dims and differentiable;
singularities at ``theta -> 0`` are handled with Taylor expansions guarded by
``jnp.where`` on both branches (safe for forward AND reverse AD).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8
# Taylor/exact switch on theta^2. In float32, 1 - cos(theta) underflows to 0
# for theta < ~3e-4 and suffers catastrophic cancellation up to theta ~ 0.1,
# so the Taylor branch must cover a WIDE neighborhood of zero; with 3-term
# series the truncation error at theta = 0.2 is ~1e-8, below f32 roundoff.
_TAYLOR_T2 = 0.04


def _where_taylor(theta2, exact, taylor):
    """Select Taylor branch near 0 without NaN gradients.

    Both branches must already be finite at theta2=0 — callers achieve this by
    computing `exact` with a "safe" theta (clamped away from 0).
    """
    return jnp.where(theta2 < _TAYLOR_T2, taylor, exact)


def hat(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    o0, o1, o2 = omega[..., 0], omega[..., 1], omega[..., 2]
    z = jnp.zeros_like(o0)
    return jnp.stack(
        [
            jnp.stack([z, -o2, o1], axis=-1),
            jnp.stack([o2, z, -o0], axis=-1),
            jnp.stack([-o1, o0, z], axis=-1),
        ],
        axis=-2,
    )


def vee(Omega: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack(
        [Omega[..., 2, 1], Omega[..., 0, 2], Omega[..., 1, 0]], axis=-1
    )


def _so3_exp_coeffs(theta2):
    """Return (A, B, C) with R = I + A·Ω + B·Ω², V = I + B·Ω + C·Ω²."""
    t2s = jnp.maximum(theta2, _TAYLOR_T2)  # safe for the exact branch
    theta = jnp.sqrt(t2s)
    t4 = theta2 * theta2
    A = _where_taylor(
        theta2, jnp.sin(theta) / theta,
        1.0 - theta2 / 6.0 + t4 / 120.0,
    )
    B = _where_taylor(
        theta2, (1.0 - jnp.cos(theta)) / t2s,
        0.5 - theta2 / 24.0 + t4 / 720.0,
    )
    A_exact_for_C = jnp.sin(theta) / theta
    C = _where_taylor(
        theta2, (1.0 - A_exact_for_C) / t2s,
        1.0 / 6.0 - theta2 / 120.0 + t4 / 5040.0,
    )
    return A, B, C


class SO3(NamedTuple):
    """Rotation group element; `R` is (..., 3, 3)."""

    R: jnp.ndarray

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SO3":
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        return SO3(eye)

    @staticmethod
    def exp(omega: jnp.ndarray) -> "SO3":
        theta2 = jnp.sum(omega * omega, axis=-1)
        A, B, _ = _so3_exp_coeffs(theta2)
        Om = hat(omega)
        Om2 = Om @ Om
        eye = jnp.eye(3, dtype=omega.dtype)
        R = eye + A[..., None, None] * Om + B[..., None, None] * Om2
        return SO3(R)

    def log(self) -> jnp.ndarray:
        R = self.R
        trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
        cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
        w = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
        # AUTODIFF-SAFE angle: theta = atan2(|w|, cos) instead of
        # arccos(cos) — d(arccos) is -1/sqrt(1-c^2) = inf at identity, and
        # the NaN poisons jacfwd through EVERY downstream where-branch
        # (found linearizing pose-graph edges at consistency). sqrt(s2+eps)
        # keeps the |w| derivative finite at w = 0.
        s2 = jnp.sum(w * w, axis=-1)  # sin(theta)^2
        sin_theta = jnp.sqrt(s2 + 1e-24)
        theta = jnp.arctan2(sin_theta, cos_theta)
        # theta/sin(theta): series in s2 near 0 (theta ~ sin there)
        small = s2 < 1e-6
        scale = jnp.where(
            small,
            1.0 + s2 / 6.0,
            theta / jnp.where(small, 1.0, sin_theta),
        )
        omega = w * scale[..., None]
        # Near theta == pi, sin(theta)->0 but rotation is large: recover axis
        # from the symmetric part, R ~ I + 2*axis*axis^T - ... .
        near_pi = theta > 3.0
        diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
        axis_sq = jnp.maximum((diag - cos_theta[..., None]) / jnp.where(
            jnp.abs(1.0 - cos_theta[..., None]) < 1e-12, 1.0, 1.0 - cos_theta[..., None]
        ), 0.0)
        axis_abs = jnp.sqrt(axis_sq)
        # signs from off-diagonal symmetric entries; pick the largest component
        # as reference with positive sign.
        k = jnp.argmax(axis_abs, axis=-1)
        sym = 0.5 * (R + jnp.swapaxes(R, -1, -2))
        def _signed_axis(sym_m, axis_a, kk):
            # off-diagonal products: s_ij = theta-free sign info
            s01, s02, s12 = sym_m[0, 1], sym_m[0, 2], sym_m[1, 2]
            def from0(_):
                return jnp.stack([axis_a[0],
                                  jnp.sign(s01) * axis_a[1],
                                  jnp.sign(s02) * axis_a[2]])
            def from1(_):
                return jnp.stack([jnp.sign(s01) * axis_a[0],
                                  axis_a[1],
                                  jnp.sign(s12) * axis_a[2]])
            def from2(_):
                return jnp.stack([jnp.sign(s02) * axis_a[0],
                                  jnp.sign(s12) * axis_a[1],
                                  axis_a[2]])
            return jax.lax.switch(kk, [from0, from1, from2], None)

        batch_shape = theta.shape
        if batch_shape:
            flat_sym = sym.reshape((-1, 3, 3))
            flat_axis = axis_abs.reshape((-1, 3))
            flat_k = k.reshape((-1,))
            axis_pi = jax.vmap(_signed_axis)(flat_sym, flat_axis, flat_k)
            axis_pi = axis_pi.reshape((*batch_shape, 3))
        else:
            axis_pi = _signed_axis(sym, axis_abs, k)
        omega_pi = axis_pi * theta[..., None]
        return jnp.where(near_pi[..., None], omega_pi, omega)

    def __matmul__(self, other):
        if isinstance(other, SO3):
            return SO3(self.R @ other.R)
        return jnp.einsum("...ij,...j->...i", self.R, other)

    def inverse(self) -> "SO3":
        return SO3(jnp.swapaxes(self.R, -1, -2))


class SE3(NamedTuple):
    """Rigid transform; `R` is (..., 3, 3), `t` is (..., 3)."""

    R: jnp.ndarray
    t: jnp.ndarray

    # -- constructors -----------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "SE3":
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        z = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return SE3(eye, z)

    @staticmethod
    def from_matrix(T: jnp.ndarray) -> "SE3":
        return SE3(T[..., :3, :3], T[..., :3, 3])

    @staticmethod
    def exp(xi: jnp.ndarray) -> "SE3":
        """Tangent [upsilon, omega] -> group element."""
        ups, omega = xi[..., :3], xi[..., 3:]
        theta2 = jnp.sum(omega * omega, axis=-1)
        A, B, C = _so3_exp_coeffs(theta2)
        Om = hat(omega)
        Om2 = Om @ Om
        eye = jnp.eye(3, dtype=xi.dtype)
        R = eye + A[..., None, None] * Om + B[..., None, None] * Om2
        V = eye + B[..., None, None] * Om + C[..., None, None] * Om2
        t = jnp.einsum("...ij,...j->...i", V, ups)
        return SE3(R, t)

    # -- group ops --------------------------------------------------------
    def log(self) -> jnp.ndarray:
        omega = SO3(self.R).log()
        theta2 = jnp.sum(omega * omega, axis=-1)
        Om = hat(omega)
        Om2 = Om @ Om
        # V^{-1} = I - 1/2 Ω + (1/theta2)(1 - A/(2B)) Ω²
        A, B, _ = _so3_exp_coeffs(theta2)
        B_safe = jnp.maximum(B, 1e-6)
        coef = _where_taylor(
            theta2,
            (1.0 - A / (2.0 * B_safe)) / jnp.maximum(theta2, _TAYLOR_T2),
            1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
        )
        eye = jnp.eye(3, dtype=self.R.dtype)
        Vinv = eye - 0.5 * Om + coef[..., None, None] * Om2
        ups = jnp.einsum("...ij,...j->...i", Vinv, self.t)
        return jnp.concatenate([ups, omega], axis=-1)

    def __matmul__(self, other):
        if isinstance(other, SE3):
            return SE3(
                self.R @ other.R,
                jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
            )
        return self.apply(other)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        """Transform points x (..., 3)."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def matrix(self) -> jnp.ndarray:
        """(..., 4, 4) homogeneous matrix."""
        batch = self.t.shape[:-1]
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.R.dtype), (*batch, 1, 4)
        )
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    def adjoint(self) -> jnp.ndarray:
        """(..., 6, 6) adjoint: Ad(T) @ xi = (T * exp(xi) * T^-1).log()."""
        tR = hat(self.t) @ self.R
        zeros = jnp.zeros_like(self.R)
        top = jnp.concatenate([self.R, tR], axis=-1)
        bot = jnp.concatenate([zeros, self.R], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def retract(self, delta: jnp.ndarray) -> "SE3":
        """Left-multiplicative update exp(delta) * self (Sophus/g2o convention,
        cf. reference anchored_points.cpp:53-58)."""
        return SE3.exp(delta) @ self

    # -- conveniences -------------------------------------------------------
    @staticmethod
    def stack(transforms) -> "SE3":
        return SE3(
            jnp.stack([T.R for T in transforms]),
            jnp.stack([T.t for T in transforms]),
        )

    def slice(self, idx) -> "SE3":
        return SE3(self.R[idx], self.t[idx])


def lie_bracket_se3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """se(3) Lie bracket [a, b] for 6-vectors [ups, omega]."""
    au, aw = a[..., :3], a[..., 3:]
    bu, bw = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bu) + jnp.cross(au, bw), jnp.cross(aw, bw)], axis=-1
    )


def ad_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """(..., 6, 6) adjoint of a tangent vector: ad(xi) @ y = [xi, y]."""
    ups, omega = xi[..., :3], xi[..., 3:]
    Ou, Ow = hat(ups), hat(omega)
    zeros = jnp.zeros_like(Ow)
    top = jnp.concatenate([Ow, Ou], axis=-1)
    bot = jnp.concatenate([zeros, Ow], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


class Sim3(NamedTuple):
    """Similarity transform (scale * R, t) — mono-SLAM scaffolding parity.

    The reference gates all Sim3 machinery behind ``#ifdef MONO`` that is
    never enabled (SURVEY.md §0; anchored_points.h:180-218, Sim3 vertex/edge
    analogs); we provide the group operations so a future monocular mode has
    its substrate. Tangent layout: [upsilon(3), omega(3), sigma(1)] with
    s = exp(sigma).
    """

    R: jnp.ndarray  # (..., 3, 3)
    t: jnp.ndarray  # (..., 3)
    s: jnp.ndarray  # (...,) scale

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Sim3":
        return Sim3(
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3)),
            jnp.zeros((*batch_shape, 3), dtype),
            jnp.ones(batch_shape, dtype),
        )

    @staticmethod
    def exp(xi: jnp.ndarray) -> "Sim3":
        """7-vector [ups, omega, sigma] -> group element (closed form W)."""
        ups, omega, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
        R = SO3.exp(omega).R
        s = jnp.exp(sigma)
        theta2 = jnp.sum(omega * omega, axis=-1)
        theta = jnp.sqrt(jnp.maximum(theta2, 1e-12))
        Om = hat(omega)
        Om2 = Om @ Om
        eye = jnp.eye(3, dtype=xi.dtype)

        # W = A I + B Om + C Om^2 (Strasdat's Sim3 exp; series-safe branches)
        sig_small = jnp.abs(sigma) < 1e-4
        th_small = theta2 < 1e-6
        sig_safe = jnp.where(sig_small, 1.0, sigma)
        th_safe = jnp.where(th_small, 1.0, theta)

        A_ss = 1.0 + sigma / 2.0 + sigma * sigma / 6.0  # (e^s - 1)/s series
        A_gen = (s - 1.0) / sig_safe
        A = jnp.where(sig_small, A_ss, A_gen)

        # B, C for the rotation-coupled part
        a = s * jnp.sin(th_safe)
        b = s * jnp.cos(th_safe)
        c = theta2 + sigma * sigma
        c_safe = jnp.where(c < 1e-12, 1.0, c)
        B_gen = (a * sigma + (1.0 - b) * theta) / (th_safe * c_safe)
        C_gen = (A - ((b - 1.0) * sigma + a * theta) / c_safe) / jnp.maximum(
            theta2, 1e-12
        )
        B_small = 0.5 - sigma / 6.0  # theta->0 limit
        C_small = 1.0 / 6.0 - sigma / 24.0
        B = jnp.where(th_small, B_small, B_gen)
        C = jnp.where(th_small, C_small, C_gen)

        W = (
            A[..., None, None] * eye
            + B[..., None, None] * Om
            + C[..., None, None] * Om2
        )
        t = jnp.einsum("...ij,...j->...i", W, ups)
        return Sim3(R, t, s)

    def log(self) -> jnp.ndarray:
        omega = SO3(self.R).log()
        sigma = jnp.log(self.s)
        # invert W numerically via solve (exact; W is 3x3)
        xi_probe = jnp.concatenate(
            [jnp.zeros_like(omega), omega, sigma[..., None]], axis=-1
        )
        # rebuild W from (omega, sigma) by calling exp with zero translation
        W_t = Sim3.exp(xi_probe).t  # zero
        # reconstruct W columns by probing unit translations
        eye = jnp.eye(3, dtype=self.t.dtype)
        cols = []
        for i in range(3):
            probe = jnp.concatenate(
                [jnp.broadcast_to(eye[i], omega.shape), omega,
                 sigma[..., None]], axis=-1
            )
            cols.append(Sim3.exp(probe).t)
        W = jnp.stack(cols, axis=-1)
        ups = jnp.linalg.solve(W, self.t[..., :, None])[..., 0]
        return jnp.concatenate(
            [ups, omega, sigma[..., None]], axis=-1
        )

    def __matmul__(self, other):
        if isinstance(other, Sim3):
            return Sim3(
                self.R @ other.R,
                self.s[..., None]
                * jnp.einsum("...ij,...j->...i", self.R, other.t)
                + self.t,
                self.s * other.s,
            )
        return self.apply(other)

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return (
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, x)
            + self.t
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        s_inv = 1.0 / self.s
        return Sim3(
            Rt,
            -s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t),
            s_inv,
        )


class PoseRT(NamedTuple):
    """Host-side numpy rigid pose (R, t) with the small SE3 surface the
    pipeline's bookkeeping needs (compose, inverse, log, apply).

    Purpose: per-frame host bookkeeping (trajectories, packets, policy)
    must never touch the device — an eager jnp op costs a dispatch and a
    fetched result costs a full tunnel round-trip (~25 ms measured). SE3
    stays the device/compute type; PoseRT is its host mirror. `other` in
    compose may be an SE3 (converted via np.asarray, cheap for host-backed
    arrays)."""

    R: np.ndarray
    t: np.ndarray

    @staticmethod
    def identity() -> "PoseRT":
        return PoseRT(np.eye(3, dtype=np.float64), np.zeros(3))

    @staticmethod
    def from_any(T) -> "PoseRT":
        if isinstance(T, PoseRT):
            return T
        if isinstance(T, tuple):
            return PoseRT(np.asarray(T[0], np.float64),
                          np.asarray(T[1], np.float64))
        return PoseRT(np.asarray(T.R, np.float64), np.asarray(T.t, np.float64))

    def __matmul__(self, other) -> "PoseRT":
        o = PoseRT.from_any(other)
        return PoseRT(self.R @ o.R, self.R @ o.t + self.t)

    def inverse(self) -> "PoseRT":
        Rt = np.ascontiguousarray(self.R.T)
        return PoseRT(Rt, -(Rt @ self.t))

    def apply(self, x):
        return x @ self.R.T + self.t

    def as_se3(self) -> "SE3":
        return SE3(jnp.asarray(self.R, jnp.float32),
                   jnp.asarray(self.t, jnp.float32))

    def log(self):
        return self.as_se3().log()


def umeyama_sim3(A: "np.ndarray", B: "np.ndarray", with_scale: bool = True):
    """Closed-form least-squares similarity with B ~ s R A + t over all rows
    (Umeyama 1991). Host numpy — shared by the mono loop-closure inlier
    refit (models.mono_loop) and the Sim3-aligned ATE metric
    (pipeline.slam_system.ate_rmse_aligned). Returns (s, R, t)."""
    mu_a, mu_b = A.mean(0), B.mean(0)
    Ac, Bc = A - mu_a, B - mu_b
    C = Bc.T @ Ac / len(A)
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_a = (Ac ** 2).sum() / len(A)
    s = (float(np.trace(np.diag(D) @ S) / max(var_a, 1e-12))
         if with_scale else 1.0)
    t = mu_b - s * R @ mu_a
    return s, R.astype(np.float32), t.astype(np.float32)
