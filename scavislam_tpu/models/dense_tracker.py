"""Dense direct (DTAM-style) photometric tracking on TPU.

Re-implements the reference's DenseTracker
(/root/reference/scavislam/dense_tracking.{h,cpp} + gpu/dense_tracking.cu):
coarse-to-fine Levenberg-Marquardt minimization of the clamped photometric
residual between the previous frame's back-projected point cloud (expressed in
the active-keyframe frame) and the current image.

Reference semantics preserved (dense_tracking.cpp:62-391):
- 3 pyramid levels, coarse (2) to fine (0);
- residual r = I_prev - I_cur(pi(T x)), clamped to [-0.1, 0.1];
- J_r = -(dx * Juv_row0 + dy * Juv_row1), with sampled gradients scaled 0.5;
- multiplicative LM damping H += mu * diag(H) (the GPU path,
  dense_tracking.cpp:131; the CPU path forgot the damping);
- accept if chi2 decreases; mu *= max(1/3, 1-(2*rho-1)^3) on success,
  mu *= nu; nu *= 2 on failure; at most 2 failed trials; 15 outer iterations;
- left-multiplicative update T <- exp(x) * T;
- 2-pixel in-frame border.

TPU-native design: the reference reads back H/b and chi2 to the host and
solves there EVERY iteration (dense_tracking.cpp:129-176 — a device sync per
LM step). Here the entire coarse-to-fine optimization is a single jitted XLA
program: per-pixel work is fused vector code, the 6x6 normal equations come
from one (N,6)^T @ (N,6) matmul on the MXU, and the solve is a tiny on-device
Cholesky inside `lax.while_loop`. Zero host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.ops.image import bilinear_sample

RES_CLAMP = 0.1
MAX_ITERS = 15
MAX_TRIALS = 2
BORDER = 2


class DenseTrackingResult(NamedTuple):
    T: SE3
    chi2: jnp.ndarray
    iters: jnp.ndarray  # total accepted+rejected solves per level, (levels,)


def _residuals(cam: StereoCamera, img, R, t, xyz_ref, i_ref, valid):
    """Clamped photometric residuals + in-frame mask for all ref points."""
    xyz_cur = jnp.einsum("ij,nj->ni", R, xyz_ref) + t
    z = xyz_cur[..., 2]
    uv = (xyz_cur[..., :2] / z[..., None]) * cam.focal + cam.pp
    w, h = cam.size
    in_frame = (
        (uv[..., 0] >= BORDER)
        & (uv[..., 0] < w - BORDER)
        & (uv[..., 1] >= BORDER)
        & (uv[..., 1] < h - BORDER)
        & (z > 1e-6)
        & valid
    )
    i_cur, _ = bilinear_sample(img, uv)
    res = jnp.clip(i_ref - i_cur, -RES_CLAMP, RES_CLAMP)
    return jnp.where(in_frame, res, 0.0), in_frame, xyz_cur, uv


def _chi2(cam, img, R, t, xyz_ref, i_ref, valid):
    res, _, _, _ = _residuals(cam, img, R, t, xyz_ref, i_ref, valid)
    return jnp.sum(res * res)


def _normal_equations(cam, img, dx_img, dy_img, R, t, xyz_ref, i_ref, valid):
    """Build (H, b) = (J^T J, J^T r) for the current pose. One MXU matmul."""
    res, in_frame, xyz_cur, uv = _residuals(
        cam, img, R, t, xyz_ref, i_ref, valid
    )
    # NOTE: the reference multiplies sampled gradients by 0.5
    # (dense_tracking.cpp:297-301) to undo its Sobel kernel's x2 gain; our
    # ops.image.sobel_xy already returns the true centered-difference
    # gradient, so no extra factor here.
    dx = bilinear_sample(dx_img, uv)[0]
    dy = bilinear_sample(dy_img, uv)[0]

    # d(uv)/d(xi) rows for left-mult update (cf. core.transforms
    # frame_jac_uvu_world, specialized to the mono uv part and fused here to
    # keep it a pure vector expression).
    j0, j1 = _proj_pose_jac(cam.focal, xyz_cur)
    # residual jacobian: r = I_ref - I_cur(uv(T x))  =>  dr/dxi = -grad I . duv/dxi
    J = -(dx[..., None] * j0 + dy[..., None] * j1)
    J = jnp.where(in_frame[..., None], J, 0.0)
    H = jnp.einsum("ni,nj->ij", J, J, preferred_element_type=jnp.float32)
    b = jnp.einsum("ni,n->i", J, res, preferred_element_type=jnp.float32)
    chi2 = jnp.sum(res * res)
    return H, b, chi2


def _proj_pose_jac(focal, xyz):
    """Rows of d(uv)/d(xi) for a LEFT-multiplicative increment at the given
    3-D points: (j0, j1) each (..., 6), tangent order [upsilon, omega]."""
    x, y = xyz[..., 0], xyz[..., 1]
    z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-6, 1e-6, xyz[..., 2])
    z2 = z * z
    f = focal
    j0 = jnp.stack(
        [f / z, jnp.zeros_like(z), -f * x / z2,
         -f * x * y / z2, f * (1.0 + x * x / z2), -f * y / z],
        axis=-1,
    )
    j1 = jnp.stack(
        [jnp.zeros_like(z), f / z, -f * y / z2,
         -f * (1.0 + y * y / z2), f * x * y / z2, f * x / z],
        axis=-1,
    )
    return j0, j1


def template_jacobian(focal, xyz_ref, dx_ref, dy_ref, valid):
    """Per-point inverse-compositional Jacobian (N, 6), computed ONCE at the
    template (reference) frame.

    The reference cloud is the reference frame's own grid pixels
    back-projected (identity anchor), so the template gradients dx_ref/dy_ref
    are exact integer-pixel values — no sampling. With r(d) =
    I_ref(pi(exp(d) x)) - I_cur(pi(T x)), dr/dd at 0 = +grad(I_ref) . j(x).

    TPU rationale: the forward-compositional tracker re-samples THREE images
    (intensity + 2 gradients, 12 gathers/point) and rebuilds J every LM
    iteration; gathers dominate (measured ~45 ms of a ~93 ms frame on v5e).
    Precomputing J makes each iteration 4 gathers + two small MXU einsums.
    """
    j0, j1 = _proj_pose_jac(focal, xyz_ref)
    J = dx_ref[..., None] * j0 + dy_ref[..., None] * j1
    return jnp.where(valid[..., None], J, 0.0)


def _qpack(img):
    """Per-pixel 2x2 tap pack: Q[v*w+u] = (I[v,u], I[v,u+1], I[v+1,u],
    I[v+1,u+1]). Built once per level per frame (3 rolls); bilinear sampling
    then needs ONE 4-wide contiguous row gather instead of 4 scalar gathers
    (measured 2.9 -> 1.4 ms per 49k-point pass on v5e — TPU gathers are
    transaction-bound, so halving the transaction count halves the cost).
    The wrapped entries in the last row/column are never indexed (the clip
    in _sample_qpack keeps u <= w-2, v <= h-2)."""
    r1 = jnp.roll(img, -1, 1)
    d1 = jnp.roll(img, -1, 0)
    return jnp.stack([img, r1, d1, jnp.roll(d1, -1, 1)], -1).reshape(-1, 4)


def _sample_qpack(Q, h, w, uv):
    """Bilinear sample from a Q-packed image. Returns (values, in_bounds)."""
    u = uv[..., 0]
    v = uv[..., 1]
    valid = (u >= 0.0) & (v >= 0.0) & (u <= w - 1.0) & (v <= h - 1.0)
    u0c = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    v0c = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    fu = u - u0c.astype(u.dtype)
    fv = v - v0c.astype(v.dtype)
    q = Q[v0c * w + u0c]  # (N, 4): one contiguous-slice gather
    top = q[..., 0] * (1.0 - fu) + q[..., 1] * fu
    bot = q[..., 2] * (1.0 - fu) + q[..., 3] * fu
    return top * (1.0 - fv) + bot * fv, valid


def _sample_matmul(img, h, w, uv):
    """Bilinear sampling as an MXU row-interpolation contraction (the
    BATCHED-mode sampler; returns the same (values, in_bounds) contract as
    `_sample_qpack`).

    TPU gathers are transaction-bound and their cost SERIALIZES across
    vmapped streams: the batched step's dense-tracking stage measured
    4.2 -> 31.9 ms from B=1 to B=8 (benchmarks/profile_multistream.py) —
    a constant ~65 us per stream per LM segment, the scalar-core gather
    floor. The identical sample expressed as a weighted two-hot matrix
    (N, h) contracted with the image (h, w) — the y-lerp lives IN the
    matrix — followed by an elementwise x-lerp reduction rides the MXU,
    which batches across streams for free (~2-4 ns/point at realistic
    utilization vs the ~29 ns/point gather floor).

    Precision: bf16 operands with f32 accumulation, explicitly opting out
    of the repo-global `jax_default_matmul_precision=highest` (this is a
    hot kernel; scavislam_tpu/__init__.py documents the policy). Intensity
    quantization is 2^-8 ~ 0.4% of full scale — under the +-0.1 residual
    clamp and the 2-10% sensor-noise floor the robustness battery
    tolerates (benchmarks/robustness.py)."""
    u = uv[..., 0]
    v = uv[..., 1]
    valid = (u >= 0.0) & (v >= 0.0) & (u <= w - 1.0) & (v <= h - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    fu = u - u0.astype(u.dtype)
    fv = v - v0.astype(v.dtype)
    iy = jnp.arange(h, dtype=jnp.int32)
    fv16 = fv.astype(jnp.bfloat16)[:, None]
    Wy = ((iy == v0[:, None]).astype(jnp.bfloat16) * (1 - fv16)
          + (iy == (v0[:, None] + 1)).astype(jnp.bfloat16) * fv16)
    rows = jax.lax.dot_general(
        Wy, img.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N, w): y-interpolated image rows
    ix = jnp.arange(w, dtype=jnp.int32)
    fuc = fu[:, None]
    Wx = ((ix == u0[:, None]) * (1.0 - fuc)
          + (ix == (u0[:, None] + 1)) * fuc)
    return jnp.sum(rows * Wx, axis=-1), valid


def _ic_pass(cam, Q, h, w, R, t, xyz_ref, i_ref, J_ref, valid,
             img=None, sample_mode="qpack"):
    """One inverse-compositional evaluation at pose (R, t):
    masked (H, b, chi2) with the FIXED template Jacobian. Only I_cur is
    sampled (one Q-pack gather, or the MXU matmul sampler in batched
    mode); H/b are MXU einsums."""
    xyz_cur = jnp.einsum("ij,nj->ni", R, xyz_ref) + t
    z = xyz_cur[..., 2]
    uv = (xyz_cur[..., :2] / z[..., None]) * cam.focal + cam.pp
    if sample_mode == "matmul":
        i_cur, _ = _sample_matmul(img, h, w, uv)
    else:
        i_cur, _ = _sample_qpack(Q, h, w, uv)
    in_frame = (
        (uv[..., 0] >= BORDER)
        & (uv[..., 0] < w - BORDER)
        & (uv[..., 1] >= BORDER)
        & (uv[..., 1] < h - BORDER)
        & (z > 1e-6)
        & valid
    )
    res = jnp.clip(i_ref - i_cur, -RES_CLAMP, RES_CLAMP)
    res = jnp.where(in_frame, res, 0.0)
    Jm = jnp.where(in_frame[..., None], J_ref, 0.0)
    H = jnp.einsum("ni,nj->ij", Jm, Jm, preferred_element_type=jnp.float32)
    b = jnp.einsum("ni,n->i", Jm, res, preferred_element_type=jnp.float32)
    chi2 = jnp.sum(res * res)
    return H, b, chi2


def _lm_level_ic(cam, img, xyz_ref, i_ref, J_ref, valid, R0, t0,
                 max_iters=MAX_ITERS, sample_mode="qpack"):
    """Inverse-compositional LM for one pyramid level, all on device.

    Same deferred-acceptance control flow and LM schedule as `_lm_level`,
    but the update is RIGHT-multiplicative with the inverse increment:
    solving H d = -b warps the TEMPLATE by exp(d), so the current estimate
    absorbs exp(-d) on the template side: T <- T exp(-d)
    (Baker & Matthews inverse-compositional; equivalent to the reference's
    forward GN near convergence, dense_tracking.cpp:62-193).

    sample_mode: "qpack" (scalar gathers, exact f32 — the single-stream
    default) or "matmul" (MXU sampler, bf16 image — the batched-throughput
    mode; see _sample_matmul)."""
    h, w = img.shape
    # loop-invariant; hoisted out of the while_loop by XLA. Unused (and
    # dead-code-eliminated) in matmul mode.
    Q = _qpack(img) if sample_mode == "qpack" else None
    H0, b0, chi2_0 = _ic_pass(cam, Q, h, w, R0, t0, xyz_ref, i_ref, J_ref,
                              valid, img=img, sample_mode=sample_mode)

    def cond(state):
        (R, t, H, b, chi2, mu, nu, trial, it, stop) = state
        return jnp.logical_and(it < max_iters, jnp.logical_not(stop))

    def body(state):
        (R, t, H, b, chi2, mu, nu, trial, it, stop) = state
        Hd = H + mu * jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(6, dtype=H.dtype)
        d = jax.scipy.linalg.solve(Hd, -b, assume_a="pos")
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        T_new = SE3(R, t) @ SE3.exp(-d)
        H_new, b_new, new_chi2 = _ic_pass(
            cam, Q, h, w, T_new.R, T_new.t, xyz_ref, i_ref, J_ref, valid,
            img=img, sample_mode=sample_mode,
        )
        rho = chi2 - new_chi2
        accept = rho > 0
        stop_acc = jnp.max(jnp.abs(d)) <= 1e-5
        mu_acc = mu * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        trial_new = jnp.where(accept, 0, trial + 1)
        return (
            jnp.where(accept, T_new.R, R),
            jnp.where(accept, T_new.t, t),
            jnp.where(accept, H_new, H),
            jnp.where(accept, b_new, b),
            jnp.where(accept, new_chi2, chi2),
            jnp.where(accept, mu_acc, mu * nu),
            jnp.where(accept, 2.0, nu * 2.0),
            trial_new,
            jnp.where(accept, it + 1, it),
            jnp.where(accept, stop_acc, trial_new >= MAX_TRIALS),
        )

    init = (
        R0, t0, H0, b0, chi2_0,
        jnp.float32(0.01), jnp.float32(2.0),
        jnp.int32(0), jnp.int32(0), jnp.bool_(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    R, t, chi2, it = out[0], out[1], out[4], out[8]
    return R, t, chi2, it


def _lm_level(cam, img, dx_img, dy_img, xyz_ref, i_ref, valid, R0, t0):
    """Run the LM loop for one pyramid level entirely on device.

    Deferred-acceptance formulation: ONE residual/Jacobian pass per
    iteration. The reference evaluates residuals twice per LM step (build
    H/b, then re-evaluate chi2 at the candidate, dense_tracking.cpp:62-193);
    here each iteration linearizes at the CANDIDATE state and compares its
    chi2 with the incumbent's — rejected steps roll back to the stored
    incumbent H/b (36 floats) instead of resampling the image. Halves the
    dominant cost (bilinear sampling of ~250k points).
    """
    H0, b0, chi2_0 = _normal_equations(
        cam, img, dx_img, dy_img, R0, t0, xyz_ref, i_ref, valid
    )

    def cond(state):
        (R, t, H, b, chi2, mu, nu, trial, it, stop) = state
        return jnp.logical_and(it < MAX_ITERS, jnp.logical_not(stop))

    def body(state):
        (R, t, H, b, chi2, mu, nu, trial, it, stop) = state
        # step from the incumbent's normal equations with current damping
        Hd = H + mu * jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(6, dtype=H.dtype)
        x = jax.scipy.linalg.solve(Hd, -b, assume_a="pos")
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        T_new = SE3.exp(x) @ SE3(R, t)
        # single pass: candidate residuals give BOTH chi2 and the next H/b
        H_new, b_new, new_chi2 = _normal_equations(
            cam, img, dx_img, dy_img, T_new.R, T_new.t, xyz_ref, i_ref, valid
        )
        rho = chi2 - new_chi2

        accept = rho > 0
        # convergence at 1e-5 (sub-0.01-pixel effect); the reference's 1e-10
        # (norm_max(x) <= EPS, dense_tracking.cpp:160) never fires in f32 and
        # forces all 15 iterations even when converged after 5
        stop_acc = jnp.max(jnp.abs(x)) <= 1e-5
        mu_acc = mu * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        trial_new = jnp.where(accept, 0, trial + 1)
        return (
            jnp.where(accept, T_new.R, R),
            jnp.where(accept, T_new.t, t),
            jnp.where(accept, H_new, H),
            jnp.where(accept, b_new, b),
            jnp.where(accept, new_chi2, chi2),
            jnp.where(accept, mu_acc, mu * nu),
            jnp.where(accept, 2.0, nu * 2.0),
            trial_new,
            jnp.where(accept, it + 1, it),
            jnp.where(accept, stop_acc, trial_new >= MAX_TRIALS),
        )

    init = (
        R0, t0, H0, b0, chi2_0,
        jnp.float32(0.01), jnp.float32(2.0),
        jnp.int32(0), jnp.int32(0), jnp.bool_(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    R, t, chi2, it = out[0], out[1], out[4], out[8]
    return R, t, chi2, it


@partial(jax.jit, static_argnames=("cams_static",))
def _dense_tracking_impl(pyr, dx, dy, clouds, intensities, valids, R0, t0, cam_params, cams_static):
    levels = len(pyr)
    R, t = R0, t0
    chi2s = []
    iters = []
    for level in range(levels - 1, -1, -1):
        focal, ppx, ppy, baseline = cam_params[level]
        cam = StereoCamera(focal, jnp.stack([ppx, ppy]), cams_static[level], baseline)
        R, t, chi2, it = _lm_level(
            cam,
            pyr[level],
            dx[level],
            dy[level],
            clouds[level],
            intensities[level],
            valids[level],
            R,
            t,
        )
        chi2s.append(chi2)
        iters.append(it)
    return R, t, jnp.stack(chi2s[::-1]), jnp.stack(iters[::-1])


def dense_tracking(
    frame,  # dict with "pyr", "dx", "dy" tuples (current frame, preprocessed)
    ref_clouds,  # tuple of (N_l, 3) point clouds in actkey frame (prev frame)
    ref_intensities,  # tuple of (N_l,) intensities from prev frame
    ref_valids,  # tuple of (N_l,) bool
    cam_pyramid,  # list[StereoCamera] per level
    T_init: SE3,
) -> DenseTrackingResult:
    """Estimate T_cur_from_actkey. Public API mirror of
    DenseTracker::denseTrackingGpu (dense_tracking.h:61-73)."""
    cam_params = tuple(
        (c.focal, c.pp[0], c.pp[1], c.baseline) for c in cam_pyramid
    )
    cams_static = tuple(c.size for c in cam_pyramid)
    R, t, chi2, iters = _dense_tracking_impl(
        frame["pyr"],
        frame["dx"],
        frame["dy"],
        ref_clouds,
        ref_intensities,
        ref_valids,
        T_init.R,
        T_init.t,
        cam_params,
        cams_static,
    )
    return DenseTrackingResult(SE3(R, t), chi2, iters)


# -- dense point cloud ---------------------------------------------------------

def compute_dense_point_cloud(
    disp: jnp.ndarray,  # (H, W) level-0 disparity, <=0 ~ invalid
    cam: StereoCamera,
    T_cur_from_actkey: SE3,
    stride: int = 1,
):
    """Back-project every `stride`-th pixel into the active keyframe frame.

    Parity: DenseTracker::computeDensePointCloudGpu/Cpu
    (dense_tracking.cpp:195-216, 393-423; GPU kernel dense_tracking.cu:82-148):
    xyz_actkey = T^-1 * unproject(u, v, disp).

    Returns (xyz (N,3), valid (N,)) flattened, N = (H/stride)*(W/stride).
    """
    d = disp[::stride, ::stride]
    h, w = d.shape
    v_idx = jnp.arange(h, dtype=jnp.float32)[:, None] * stride
    u_idx = jnp.arange(w, dtype=jnp.float32)[None, :] * stride
    valid = d > 0.0
    d_safe = jnp.where(valid, d, 1.0)
    z = cam.focal * cam.baseline / d_safe
    x = (u_idx - cam.pp[0]) / cam.focal * z
    y = (v_idx - cam.pp[1]) / cam.focal * z
    xyz = jnp.stack(
        [x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1
    )
    Tinv = T_cur_from_actkey.inverse()
    xyz_ak = Tinv.apply(xyz)
    return xyz_ak, valid.reshape(-1)


@partial(jax.jit, static_argnames=("levels",))
def cloud_pyramid_from_disparity(disp0, cam0: StereoCamera, T: SE3, levels=3):
    """Per-level point clouds + intensity grids for the tracker: level l uses
    the level-0 disparity decimated by 2^l (value-invariant thanks to the
    baseline trick) back-projected with the level-l camera."""
    clouds, valids = [], []
    for level in range(levels):
        s = 2**level
        cam_l = cam0.scale_level(level)
        d_l = disp0[::s, ::s]
        # back-project with the level camera (pixel coords are level-l coords)
        h, w = d_l.shape
        v_idx = jnp.arange(h, dtype=jnp.float32)[:, None]
        u_idx = jnp.arange(w, dtype=jnp.float32)[None, :]
        valid = d_l > 0.0
        d_safe = jnp.where(valid, d_l, 1.0)
        z = cam_l.focal * cam_l.baseline / d_safe
        x = (u_idx - cam_l.pp[0]) / cam_l.focal * z
        y = (v_idx - cam_l.pp[1]) / cam_l.focal * z
        xyz = jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
        xyz_ak = T.inverse().apply(xyz)
        clouds.append(xyz_ak)
        valids.append(valid.reshape(-1))
    return tuple(clouds), tuple(valids)
