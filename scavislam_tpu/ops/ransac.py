"""Batched RANSAC for SE3 absolute orientation on device.

Re-implements the reference's RanSaC<SE3Model>
(/root/reference/scavislam/ransac.{hpp,cpp} + ransac_models.{h,cpp}): the
model is Horn/Arun closed-form absolute orientation from 3 point
correspondences (SVD of the 3x3 cross-covariance, ransac_models.cpp:44-81),
scored by per-component uvu reprojection error (ransac_models.cpp:27-42).

TPU-native: the reference's sequential sample-hypothesize-score loop with
goto-based resampling (ransac.cpp:63-125) becomes a VMAPPED sweep — all M
hypotheses estimated and scored in one program; degenerate samples are
masked, not retried (use 2-4x more hypotheses instead of retry loops; at
M=256 this still beats the reference's 100 sequential iterations).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scavislam_tpu.core.lie import SE3


def _horn_abs_orientation(A, B):
    """R, t with B ~ R @ A + t for point triplets A, B (3, 3) each row a pt."""
    ca = jnp.mean(A, axis=0)
    cb = jnp.mean(B, axis=0)
    H = (A - ca).T @ (B - cb)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), d]))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    return R, t


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_se3(
    key,
    xyz_a: jnp.ndarray,  # (N, 3) points in frame A
    xyz_b: jnp.ndarray,  # (N, 3) corresponding points in frame B
    valid: jnp.ndarray,  # (N,)
    cam_params,  # (focal, ppx, ppy, baseline) for reprojection scoring
    inlier_thr: float = 3.0,
    num_hypotheses: int = 256,
):
    """Estimate T_b_from_a. Returns (R, t, inlier_mask, num_inliers).

    Scoring parity: inlier iff |uvu_obs - uvu(R a + t)| < thr per component
    (ransac_models.cpp:27-42) where uvu_obs is the projection of xyz_b.
    """
    focal, ppx, ppy, baseline = cam_params
    n = xyz_a.shape[0]
    nv = jnp.maximum(jnp.sum(valid), 1)

    # sample 3 indices per hypothesis among valid entries: draw from the
    # valid-compacted range and gather
    order = jnp.argsort(~valid)  # valid first
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (num_hypotheses, 3), 0, n)
    idx = idx % nv
    idx = order[idx]  # (M, 3) indices of valid points
    degenerate = (
        (idx[:, 0] == idx[:, 1]) | (idx[:, 0] == idx[:, 2])
        | (idx[:, 1] == idx[:, 2])
    )

    A = xyz_a[idx]  # (M, 3, 3)
    B = xyz_b[idx]

    R_h, t_h = jax.vmap(_horn_abs_orientation)(A, B)

    # score every hypothesis against every correspondence
    def uvu(xyz):
        z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-6, 1e-6, xyz[..., 2])
        u = xyz[..., 0] / z * focal + ppx
        v = xyz[..., 1] / z * focal + ppy
        ur = (xyz[..., 0] - baseline) / z * focal + ppx
        return jnp.stack([u, v, ur], axis=-1)

    obs = uvu(xyz_b)  # (N, 3)
    pred = uvu(
        jnp.einsum("mij,nj->mni", R_h, xyz_a) + t_h[:, None, :]
    )  # (M, N, 3)
    err_ok = jnp.all(jnp.abs(obs[None] - pred) < inlier_thr, axis=-1)
    err_ok = err_ok & valid[None, :] & (~degenerate)[:, None]
    counts = jnp.sum(err_ok, axis=1)

    best = jnp.argmax(counts)
    return R_h[best], t_h[best], err_ok[best], counts[best]


def _horn_sim3(A, B):
    """s, R, t with B ~ s R A + t (Horn absolute orientation with scale).

    Parity surface: Sim3Model::calc_motion (ransac_models.cpp:85-136, the
    reference's MONO-gated model). The reference computes scale from
    UNCENTERED point norms — a quirk we deliberately do not reproduce; the
    standard centered Horn scale is used instead (the uncentered form is
    biased whenever the centroids are far from the origin)."""
    ca = jnp.mean(A, axis=0)
    cb = jnp.mean(B, axis=0)
    Ac, Bc = A - ca, B - cb
    H = Ac.T @ Bc
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), d]))
    R = Vt.T @ D @ U.T
    na = jnp.sum(Ac * Ac)
    nb = jnp.sum(Bc * Bc)
    s = jnp.sqrt(nb / jnp.maximum(na, 1e-12))
    t = cb - s * (R @ ca)
    return s, R, t


@partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_sim3(
    key,
    xyz_a: jnp.ndarray,  # (N, 3) points in frame A
    xyz_b: jnp.ndarray,  # (N, 3) corresponding points in frame B
    valid: jnp.ndarray,  # (N,)
    cam_params,
    inlier_thr: float = 3.0,
    num_hypotheses: int = 256,
):
    """Estimate Sim3 S_b_from_a (monocular loop closure needs the scale dof:
    mono SLAM drifts in scale, so SE3 loop constraints are inconsistent —
    the reference scaffolds this as RanSaC<Sim3Model> behind MONO).
    Returns (s, R, t, inlier_mask, num_inliers)."""
    focal, ppx, ppy, baseline = cam_params
    n = xyz_a.shape[0]
    nv = jnp.maximum(jnp.sum(valid), 1)
    order = jnp.argsort(~valid)
    idx = jax.random.randint(key, (num_hypotheses, 3), 0, n) % nv
    idx = order[idx]
    degenerate = (
        (idx[:, 0] == idx[:, 1]) | (idx[:, 0] == idx[:, 2])
        | (idx[:, 1] == idx[:, 2])
    )
    A, B = xyz_a[idx], xyz_b[idx]
    s_h, R_h, t_h = jax.vmap(_horn_sim3)(A, B)

    def uvu(xyz):
        z = jnp.where(jnp.abs(xyz[..., 2]) < 1e-6, 1e-6, xyz[..., 2])
        u = xyz[..., 0] / z * focal + ppx
        v = xyz[..., 1] / z * focal + ppy
        ur = (xyz[..., 0] - baseline) / z * focal + ppx
        return jnp.stack([u, v, ur], axis=-1)

    obs = uvu(xyz_b)
    pred = uvu(
        s_h[:, None, None]
        * jnp.einsum("mij,nj->mni", R_h, xyz_a) + t_h[:, None, :]
    )
    err_ok = jnp.all(jnp.abs(obs[None] - pred) < inlier_thr, axis=-1)
    err_ok = err_ok & valid[None, :] & (~degenerate)[:, None]
    counts = jnp.sum(err_ok, axis=1)
    best = jnp.argmax(counts)
    return s_h[best], R_h[best], t_h[best], err_ok[best], counts[best]


def refine_se3_from_inliers(xyz_a, xyz_b, inliers):
    """Weighted Horn/Arun over ALL inliers (least-squares polish)."""
    w = inliers.astype(jnp.float32)[:, None]
    sw = jnp.maximum(jnp.sum(w), 1e-6)
    ca = jnp.sum(xyz_a * w, axis=0) / sw
    cb = jnp.sum(xyz_b * w, axis=0) / sw
    H = ((xyz_a - ca) * w).T @ (xyz_b - cb)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), d]))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    return SE3(R, t)
