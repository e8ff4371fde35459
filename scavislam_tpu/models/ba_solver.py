"""Batched Schur-complement bundle adjustment + pose graph on TPU.

This replaces the reference's g2o/CSparse backend solve
(/root/reference/scavislam/slam_graph.cpp:319-355, 907-1080): a
Levenberg-Marquardt optimizer over

- double-window keyframe poses (inner + outer, SURVEY.md §5 "long-context"),
- active points in anchored inverse-depth parametrization psi = (x/z, y/z,
  1/z) with TERNARY factors (point, observer pose, anchor pose) — the
  reference's G2oEdgeProjectPSI2UVU (g2o_types/anchored_points.cpp:148-189),
- relative-pose binary edges with 6x6 information matrices where either end
  is OUTER — the reference's G2oEdgeSE3 (anchored_points.cpp:207-235).

TPU-native design (the BASELINE.json north star): instead of g2o's
pointer-graph + CSparse Schur, the problem is laid out as fixed-capacity
arrays and the solve is dense-blocked:

  1. all observation residuals/Jacobians batched in one fused vector pass;
  2. H_pp (3x3 point blocks) via segment scatter-add; inverted in closed form;
  3. H_cc (6x6 pose blocks, dense (P,P) block grid) via scatter-add;
  4. Schur complement S = H_cc - W H_pp^-1 W^T as ONE large matmul on the MXU
     ((P*6, L*3) @ (L*3, P*6));
  5. dense Cholesky of S on device; back-substitution for point updates.

Everything is masked/padded; invalid slots get identity diagonals. The whole
multi-iteration LM loop compiles to a single XLA program — zero host syncs,
vs. g2o's per-iteration sparse factorization on CPU.

Observation weighting parity (slam_graph.cpp:983-1032): information scaled by
4^-level per pyramid level and 1/3^2 on the disparity (u_right) component;
Huber kernel width from OptParams (backend.cpp:187: 2 iterations, Huber 3).
g2o's initial lambda in the reference is 50 (slam_graph.cpp:1062).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scavislam_tpu.core.lie import SE3, ad_se3, hat

# default capacities (one BA window)
NUM_POSES = 128
NUM_POINTS = 2048
NUM_OBS = 8192
NUM_EDGES = 512


class BAProblem(NamedTuple):
    """Fixed-capacity double-window BA problem (all device arrays)."""

    R: jnp.ndarray  # (P, 3, 3) T_kw rotations
    t: jnp.ndarray  # (P, 3)
    pose_valid: jnp.ndarray  # (P,) slot holds a pose
    pose_fixed: jnp.ndarray  # (P,) pose held constant (e.g. root / OUTER-only)

    psi: jnp.ndarray  # (L, 3) inverse-depth in anchor frame
    anchor_slot: jnp.ndarray  # (L,) int32 pose slot of the anchor
    point_valid: jnp.ndarray  # (L,)

    obs_pose: jnp.ndarray  # (O,) int32 observer pose slot
    obs_point: jnp.ndarray  # (O,) int32 point index
    obs_uvu: jnp.ndarray  # (O, 3)
    obs_weight: jnp.ndarray  # (O,) scalar info scale (4^-level)
    obs_valid: jnp.ndarray  # (O,)

    edge_i: jnp.ndarray  # (E,) int32
    edge_j: jnp.ndarray  # (E,)
    # constraint stores T_j_from_i (second vertex from first): the residual is
    # d = log(T_ji * T_iw * T_jw^-1), zero iff current relative pose matches —
    # same vertex-order convention as the reference's G2oEdgeSE3 error
    # log(T_21 * T_1w * T_w2) (anchored_points.cpp:207-214).
    edge_R: jnp.ndarray  # (E, 3, 3)
    edge_t: jnp.ndarray  # (E, 3)
    edge_info: jnp.ndarray  # (E, 6, 6)
    edge_valid: jnp.ndarray  # (E,)

    @staticmethod
    def empty(P=NUM_POSES, L=NUM_POINTS, O=NUM_OBS, E=NUM_EDGES) -> "BAProblem":
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (P, 3, 3))
        return BAProblem(
            eye, jnp.zeros((P, 3), jnp.float32),
            jnp.zeros((P,), bool), jnp.zeros((P,), bool),
            jnp.zeros((L, 3), jnp.float32), jnp.zeros((L,), jnp.int32),
            jnp.zeros((L,), bool),
            jnp.zeros((O,), jnp.int32), jnp.zeros((O,), jnp.int32),
            jnp.zeros((O, 3), jnp.float32), jnp.ones((O,), jnp.float32),
            jnp.zeros((O,), bool),
            jnp.zeros((E,), jnp.int32), jnp.zeros((E,), jnp.int32),
            jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (E, 3, 3)),
            jnp.zeros((E, 3), jnp.float32),
            jnp.zeros((E, 6, 6), jnp.float32), jnp.zeros((E,), bool),
        )


class BAStats(NamedTuple):
    chi2_initial: jnp.ndarray
    chi2_final: jnp.ndarray
    num_obs: jnp.ndarray
    num_edges: jnp.ndarray


# observation information: diag(4^-level, 4^-level, 0.333^2) — note the
# disparity component is NOT level-scaled in the reference
# (slam_graph.cpp:1009-1013: Lambda(0,0) and (1,1) *= pyr_factor,
# Lambda(2,2) *= 0.333^2). obs_weight carries the 4^-level factor.
_DISP_INFO = 0.333 * 0.333


def _obs_residuals(cam_params, prob: BAProblem, R, t, psi):
    """Residuals + masks for every observation (batched)."""
    focal, ppx, ppy, baseline = cam_params
    c = prob.obs_pose
    pidx = prob.obs_point
    a = prob.anchor_slot[pidx]

    psi_o = psi[pidx]
    q = psi_o[:, 2:3]
    q_safe = jnp.where(jnp.abs(q) < 1e-9, 1e-9, q)
    xyz_a = jnp.concatenate([psi_o[:, :2], jnp.ones_like(q)], axis=-1) / q_safe

    R_c, t_c = R[c], t[c]
    R_a, t_a = R[a], t[a]
    # T_ca = T_cw * T_aw^-1
    R_ca = jnp.einsum("nij,nkj->nik", R_c, R_a)
    t_ca = t_c - jnp.einsum("nij,nj->ni", R_ca, t_a)
    y = jnp.einsum("nij,nj->ni", R_ca, xyz_a) + t_ca

    z = y[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = y[:, 0] / z_safe * focal + ppx
    v = y[:, 1] / z_safe * focal + ppy
    ur = (y[:, 0] - baseline) / z_safe * focal + ppx
    pred = jnp.stack([u, v, ur], axis=-1)
    r = prob.obs_uvu - pred

    mask = (
        prob.obs_valid
        & prob.point_valid[pidx]
        & prob.pose_valid[c]
        & prob.pose_valid[a]
        & (z > 0.1)
        & (q[:, 0] > 1e-9)
        & jnp.all(jnp.isfinite(r), axis=-1)
    )
    r = jnp.where(mask[:, None], r, 0.0)
    return r, mask, (y, R_ca, xyz_a, q_safe[:, 0])


def _edge_residuals(prob: BAProblem, R, t):
    """Relative-pose edge residuals d = log(T_ji * T_iw * T_jw^-1), where the
    stored constraint is T_j_from_i (see BAProblem field docs)."""
    i, j = prob.edge_i, prob.edge_j
    R_i, t_i = R[i], t[i]
    R_j, t_j = R[j], t[j]
    # T_iw * T_jw^-1
    R_rel = jnp.einsum("nij,nkj->nik", R_i, R_j)
    t_rel = t_i - jnp.einsum("nij,nj->ni", R_rel, t_j)
    # T_ij * rel
    R_err = prob.edge_R @ R_rel
    t_err = jnp.einsum("nij,nj->ni", prob.edge_R, t_rel) + prob.edge_t
    d = SE3(R_err, t_err).log()
    mask = (
        prob.edge_valid
        & prob.pose_valid[i]
        & prob.pose_valid[j]
        & jnp.all(jnp.isfinite(d), axis=-1)
    )
    return jnp.where(mask[:, None], d, 0.0), mask


def _huber_weight(s, delta):
    """g2o Huber: weight 1 inside, delta/sqrt(s) outside."""
    return jnp.where(s <= delta * delta, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-12)))


def _disp_info_vec(prob, disp_info):
    """Third-component (right-u) information per obs: the stereo default is
    the reference's 0.333^2 (slam_graph.cpp:1009-1013); MONO problems pass a
    zero vector — uv-only observations through the SAME solver (the
    reference's mono scaffold instantiates its graph with ObsDim=2,
    slam_graph-impl.cpp:128-249; zero-weighting the third row is exactly
    that, with no second program variant)."""
    if disp_info is None:
        return jnp.full_like(prob.obs_weight, _DISP_INFO)
    return disp_info


def _chi2(cam_params, prob, R, t, psi, huber, sp_axis=None, disp_info=None):
    r, mask, _ = _obs_residuals(cam_params, prob, R, t, psi)
    # per-component info: (w_l, w_l, 0.333^2) with w_l = obs_weight = 4^-level
    info = jnp.stack(
        [prob.obs_weight, prob.obs_weight,
         _disp_info_vec(prob, disp_info)], axis=-1)
    s = jnp.sum(r * r * info, axis=-1)
    w = _huber_weight(s, huber)
    chi_obs = jnp.sum(jnp.where(mask, w * s, 0.0))
    d, emask = _edge_residuals(prob, R, t)
    se = jnp.einsum("ni,nij,nj->n", d, prob.edge_info, d)
    chi_e = jnp.sum(jnp.where(emask, se, 0.0))
    if sp_axis is not None:
        # obs are sharded over sp_axis; edges are replicated, so count them
        # on shard 0 only, then assemble the global chi2 over ICI
        chi_e = chi_e * (jax.lax.axis_index(sp_axis) == 0)
        return jax.lax.psum(chi_obs + chi_e, sp_axis)
    return chi_obs + chi_e


def _build_normal_equations(cam_params, prob: BAProblem, R, t, psi, huber,
                            sp_axis=None, anchor_perm=None, disp_info=None):
    """One linearization: dense block H_cc, W, H_pp, gradients.

    With `sp_axis`, the observation arrays in `prob` are the LOCAL shard of a
    mesh-sharded problem: each shard scatter-adds its own observations and
    the full system is assembled with one psum over ICI (edges, replicated,
    contribute from shard 0 only).

    `anchor_perm` (O,) int32 enables the SORTED-scatter fast path for the W
    blocks (measured 4x faster than unsorted scatter on TPU): the CALLER
    PROMISES observations are packed sorted by (obs_pose, obs_point) and
    anchor_perm sorts them by (anchor_slot, obs_point). slam_graph.optimize
    packs this way; hand-built problems just pass None."""
    focal, ppx, ppy, baseline = cam_params
    P = prob.R.shape[0]
    L = prob.psi.shape[0]

    r, mask, (y, R_ca, xyz_a, q) = _obs_residuals(cam_params, prob, R, t, psi)
    c = prob.obs_pose
    pidx = prob.obs_point
    a = prob.anchor_slot[pidx]

    # --- Jacobians of the PREDICTION (residual jac = -J), batched
    x_, y_, z_ = y[:, 0], y[:, 1], y[:, 2]
    z_s = jnp.where(jnp.abs(z_) < 1e-6, 1e-6, z_)
    z2 = z_s * z_s
    zero = jnp.zeros_like(z_)
    Jproj = jnp.stack(
        [
            jnp.stack([focal / z_s, zero, -focal * x_ / z2], -1),
            jnp.stack([zero, focal / z_s, -focal * y_ / z2], -1),
            jnp.stack([focal / z_s, zero, -focal * (x_ - baseline) / z2], -1),
        ],
        axis=-2,
    )  # (O, 3, 3)
    eyeO = jnp.broadcast_to(jnp.eye(3, dtype=y.dtype), (*z_.shape, 3, 3))
    Jexp_y = jnp.concatenate([eyeO, -hat(y)], axis=-1)  # (O, 3, 6)
    Jf = Jproj @ Jexp_y  # d pred / d xi_observer
    Jexp_x = jnp.concatenate([eyeO, -hat(xyz_a)], axis=-1)
    Ja = -(Jproj @ R_ca @ Jexp_x)  # d pred / d xi_anchor
    # d pred / d psi: Jproj @ d_Tinvpsi_d_psi(T_ca, psi)
    r1 = R_ca[..., :, 0]
    r2 = R_ca[..., :, 1]
    Rx = jnp.einsum("nij,nj->ni", R_ca, xyz_a)
    Jpsi_inner = jnp.stack([r1, r2, -Rx], axis=-1) / q[:, None, None]
    Jp = Jproj @ Jpsi_inner  # (O, 3, 3)

    # --- robust info weights: diag(w_l, w_l, 0.333^2) scaled by Huber
    info = jnp.stack(
        [prob.obs_weight, prob.obs_weight,
         _disp_info_vec(prob, disp_info)], axis=-1)
    s = jnp.sum(r * r * info, axis=-1)
    w = _huber_weight(s, huber) * mask
    Winfo = w[:, None] * info  # (O, 3) diagonal info per obs

    # residual Jacobian = -J; gradient g = J^T W r with our sign conventions:
    # minimize ||obs-pred||_W; normal equations H dx = J^T W r.
    JfW = Jf * Winfo[:, :, None]
    JaW = Ja * Winfo[:, :, None]
    JpW = Jp * Winfo[:, :, None]

    # Hcc via ONE-HOT einsums instead of 4 dense scatter-adds: P is small
    # (<=128), so the (O, P) one-hots are tiny and the contraction runs on
    # the MXU — measured 1.10 ms vs 1.82 ms for the scatter form at
    # O=8192, P=128. Per-obs 12-dof jacobian [Jf | Ja] gives the 4 pose-pair
    # quadrants in one product.
    J12 = jnp.concatenate([Jf, Ja], -1)  # (O, 3, 12)
    J12W = jnp.concatenate([JfW, JaW], -1)
    X12 = jnp.einsum("nij,nik->njk", J12W, J12)  # (O, 12, 12)
    U = jax.nn.one_hot(c, P, dtype=jnp.float32)  # observer slot one-hot
    V = jax.nn.one_hot(a, P, dtype=jnp.float32)  # anchor slot one-hot
    Hcc = jnp.einsum("np,nij,nq->pqij", U, X12[:, :6, :6], U)
    Hcc += jnp.einsum("np,nij,nq->pqij", V, X12[:, 6:, 6:], V)
    Hfa = jnp.einsum("np,nij,nq->pqij", U, X12[:, :6, 6:], V)
    Hcc += Hfa + jnp.swapaxes(jnp.swapaxes(Hfa, 0, 1), -1, -2)

    # W blocks (pose x point) as flat-index scatters into (P*L, 18) — the
    # linearized form is ~1.5x faster than two (P, L) 2-D block scatters
    # (measured 1.93 vs 2.77 ms), and the host-sorted form another ~4x on
    # the scatter itself (0.40 vs 1.61 ms).
    wb_f = jnp.einsum("nij,nik->njk", JfW, Jp).reshape(-1, 18)
    wb_a = jnp.einsum("nij,nik->njk", JaW, Jp).reshape(-1, 18)
    if anchor_perm is not None:
        # host packed obs sorted by (c, pidx): observer stream is sorted;
        # anchor stream sorts under the uploaded permutation
        idx_a = (a * L + pidx)[anchor_perm]
        Wcp_flat = (
            jnp.zeros((P * L, 18), jnp.float32)
            .at[c * L + pidx].add(wb_f, indices_are_sorted=True)
            .at[idx_a].add(wb_a[anchor_perm], indices_are_sorted=True)
        )
    else:
        w_flat_idx = (jnp.concatenate([c, a]) * L
                      + jnp.concatenate([pidx, pidx]))
        Wcp_flat = jnp.zeros((P * L, 18), jnp.float32).at[w_flat_idx].add(
            jnp.concatenate([wb_f, wb_a], 0))
    Wcp = Wcp_flat.reshape(P, L, 6, 3)

    # H_pp (L, 3, 3)
    Hpp = jnp.zeros((L, 3, 3), jnp.float32)
    Hpp = Hpp.at[pidx].add(jnp.einsum("nij,nik->njk", JpW, Jp))

    # gradients
    g_c = jnp.zeros((P, 6), jnp.float32)
    g_c = g_c.at[c].add(jnp.einsum("nij,ni->nj", JfW, r))
    g_c = g_c.at[a].add(jnp.einsum("nij,ni->nj", JaW, r))
    g_p = jnp.zeros((L, 3), jnp.float32)
    g_p = g_p.at[pidx].add(jnp.einsum("nij,ni->nj", JpW, r))

    # --- pose-graph edges
    d, emask = _edge_residuals(prob, R, t)
    A = ad_se3(d)
    eye6 = jnp.broadcast_to(jnp.eye(6, dtype=d.dtype), A.shape)
    Jr_inv = eye6 + 0.5 * A + (1.0 / 12.0) * (A @ A)
    Jl_inv = eye6 - 0.5 * A + (1.0 / 12.0) * (A @ A)
    # Adj of the constraint T_ij
    tR = hat(prob.edge_t) @ prob.edge_R
    zeros33 = jnp.zeros_like(prob.edge_R)
    Adj_ij = jnp.concatenate(
        [
            jnp.concatenate([prob.edge_R, tR], axis=-1),
            jnp.concatenate([zeros33, prob.edge_R], axis=-1),
        ],
        axis=-2,
    )
    Ji = Jl_inv @ Adj_ij  # d err / d xi_i
    Jj = -Jr_inv  # d err / d xi_j
    # edge error convention: err = d, minimize d^T Info d; H += J^T Info J,
    # g += -J^T Info d (Gauss-Newton on err -> update xi = solve(H, g))
    W_e = prob.edge_info * emask[:, None, None]
    if sp_axis is not None:
        W_e = W_e * (jax.lax.axis_index(sp_axis) == 0)
    JiW = jnp.einsum("nji,njk->nik", Ji, W_e)  # Ji^T W  (6x6)
    JjW = jnp.einsum("nji,njk->nik", Jj, W_e)
    i, j = prob.edge_i, prob.edge_j
    Hcc = Hcc.at[i, i].add(JiW @ Ji)
    Hcc = Hcc.at[j, j].add(JjW @ Jj)
    Hij = JiW @ Jj
    Hcc = Hcc.at[i, j].add(Hij)
    Hcc = Hcc.at[j, i].add(jnp.swapaxes(Hij, -1, -2))
    # note the SIGN: for edges the residual IS the error (not obs - pred), so
    # the descent rhs is -J^T W d.
    g_c = g_c.at[i].add(-jnp.einsum("nij,nj->ni", JiW, d))
    g_c = g_c.at[j].add(-jnp.einsum("nij,nj->ni", JjW, d))

    if sp_axis is not None:
        # the ICI collective: full normal equations from per-shard partials
        Hcc, Wcp, Hpp, g_c, g_p = jax.lax.psum(
            (Hcc, Wcp, Hpp, g_c, g_p), sp_axis
        )
    return Hcc, Wcp, Hpp, g_c, g_p


def _inv3x3(M):
    """Batched closed-form 3x3 inverse with regularization."""
    M = M + 1e-8 * jnp.eye(3, dtype=M.dtype)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


@partial(jax.jit, static_argnames=("iters", "sp_axis"))
def solve_ba(
    cam_params,  # (focal, ppx, ppy, baseline) — level-0 camera
    prob: BAProblem,
    iters: int = 2,
    huber: float = 3.0,
    lambda0: float = 50.0,
    sp_axis=None,  # mesh axis name when obs are sharded (see parallel/)
    anchor_perm=None,  # sorted-scatter fast path (see _build_normal_equations)
    disp_info=None,  # (O,) third-component info; None = stereo 0.333^2,
    # zeros = MONO uv-only observations (slam_graph-impl.cpp:128-249 analog)
):
    """LM with `iters` accepted-or-rejected rounds (g2o parity:
    OptParams(2 iters, Huber 3), lambda0 = 50). Returns
    (R, t, psi, BAStats)."""
    P = prob.R.shape[0]
    L = prob.psi.shape[0]
    R, t, psi = prob.R, prob.t, prob.psi
    lam = jnp.float32(lambda0)

    chi2_0 = _chi2(cam_params, prob, R, t, psi, huber, sp_axis,
                   disp_info)
    free = (prob.pose_valid & ~prob.pose_fixed).astype(jnp.float32)

    def lm_round(carry, _):
        R, t, psi, lam, chi2 = carry
        Hcc, Wcp, Hpp, g_c, g_p = _build_normal_equations(
            cam_params, prob, R, t, psi, huber, sp_axis, anchor_perm,
            disp_info,
        )
        # damp
        Hpp_d = Hpp + lam * jnp.eye(3, dtype=Hpp.dtype)[None]
        Hpp_inv = _inv3x3(Hpp_d)
        # mask out fixed/invalid poses: zero their rows/cols, identity diag
        free_m = free[:, None] * free[None, :]
        Hcc = Hcc * free_m[:, :, None, None]
        Wcp = Wcp * free[:, None, None, None]
        g_c = g_c * free[:, None]

        # Schur: S = Hcc + lam I - W Hpp^-1 W^T ; rhs = g_c - W Hpp^-1 g_p
        Wp = jnp.einsum("plik,lkj->plij", Wcp, Hpp_inv)  # (P, L, 6, 3)
        A_mat = Wp.transpose(0, 2, 1, 3).reshape(P * 6, L * 3)
        B_mat = Wcp.transpose(0, 2, 1, 3).reshape(P * 6, L * 3)
        S = Hcc.transpose(0, 2, 1, 3).reshape(P * 6, P * 6) - (
            A_mat @ B_mat.T
        )
        rhs = (g_c.reshape(-1) - A_mat @ g_p.reshape(-1))

        diag_boost = lam * jnp.ones((P * 6,), jnp.float32)
        # invalid/fixed slots get a pure identity row via the masking above +
        # this diagonal, keeping the factorization well posed.
        anchor_diag = jnp.repeat(1.0 - free, 6)
        S = S + jnp.diag(diag_boost + anchor_diag)

        dc = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(S, lower=True), rhs
        )
        dc = jnp.where(jnp.isfinite(dc), dc, 0.0).reshape(P, 6) * free[:, None]

        # back-substitute points: dp = Hpp^-1 (g_p - W^T dc)
        WTdc = jnp.einsum("plij,pi->lj", Wcp, dc)
        dp = jnp.einsum("lij,lj->li", Hpp_inv, g_p - WTdc)
        dp = jnp.where(jnp.isfinite(dp), dp, 0.0) * prob.point_valid[:, None]

        # apply: left-mult pose update, additive psi update
        T_new = SE3.exp(dc) @ SE3(R, t)
        psi_new = psi + dp
        chi2_new = _chi2(cam_params, prob, T_new.R, T_new.t, psi_new, huber,
                         sp_axis, disp_info)
        accept = chi2_new < chi2
        R_n = jnp.where(accept, T_new.R, R)
        t_n = jnp.where(accept, T_new.t, t)
        psi_n = jnp.where(accept, psi_new, psi)
        chi2_n = jnp.where(accept, chi2_new, chi2)
        lam_n = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (R_n, t_n, psi_n, lam_n, chi2_n), chi2_n

    (R, t, psi, lam, chi2), _ = jax.lax.scan(
        lm_round, (R, t, psi, lam, chi2_0), None, length=iters
    )
    n_obs = jnp.sum(prob.obs_valid.astype(jnp.int32))
    if sp_axis is not None:
        n_obs = jax.lax.psum(n_obs, sp_axis)
    stats = BAStats(
        chi2_0, chi2, n_obs,
        jnp.sum(prob.edge_valid.astype(jnp.int32)),
    )
    return R, t, psi, stats
