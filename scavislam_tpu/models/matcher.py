"""Guided patch matching against bucketed FAST corners.

Re-implements the reference's GuidedMatcher
(/root/reference/scavislam/matcher.{hpp,cpp}): for each candidate map point,
predict its pixel position under the current pose estimate, query nearby
corners, warp the point's reference patch by a local affine approximation,
score with ZMSSD, and build a stereo uvu observation from the disparity map
(matcher.cpp:99-397, matcher-impl.cpp:32-51).

TPU-first re-design decisions:
- The quadtree window query (matcher.cpp:351-357) becomes a gather over the
  3x3 neighborhood of a fixed corner-bucket grid (ops.fast.corner_buckets):
  O(1), shape-static, batched over all points at once.
- The reference warps patches straight out of the anchor keyframe IMAGE;
  that requires indexed access to a dynamic set of images. Instead each map
  point stores a 16x16 SOURCE patch captured at anchor time, and the matcher
  warp-samples the central 8x8 from it — same first-order warp model, no
  image gather, and the per-point storage (256 floats) lives happily in HBM.
- Subpixel refinement: the reference's is stubbed out (matcher.cpp:242-309
  returns the integer position). The fused frame path goes beyond parity
  with one IC-LK step on the winning patch pair
  (frontend_step._subpixel_delta) — gradients from in-patch central
  differences on data already gathered, no extra image samples.

Intentionally NOT reproduced (deviation ledger):
- warpPatchProjective (matcher.cpp:461-525): a projective-homography patch
  warp that is dead code in the reference — never called from any matching
  path (only the affine warpAffinve is), left half-debugged with cerr spam.
  The affine warp model here covers every live reference call site.

All outputs are padded fixed-shape arrays with masks.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.ops.image import bilinear_sample, nearest_sample
from scavislam_tpu.ops.patches import PATCH, affine_from_geometry


def _patch_offsets_int(size: int):
    """Integer offsets -size//2 .. size//2-1 (reference patch alignment;
    keeps source capture, warped sampling, and candidate extraction all on
    the SAME physical grid — mixing the centered half-pixel grid with exact
    pixels blurs one side of the ZMSSD and kills matches)."""
    r = np.arange(size, dtype=np.float32) - size // 2
    ou, ov = np.meshgrid(r, r)
    return np.stack([ou.reshape(-1), ov.reshape(-1)], axis=-1)

SOURCE_PATCH = 16  # stored per-point source patch side
DEPTH_RATIO_MAX = 3.0  # reject depth change > 3x (matcher.cpp:99-142)


class MatchResult(NamedTuple):
    obs_uvu: jnp.ndarray  # (N, 3) level-0 uvu observations
    matched: jnp.ndarray  # (N,) bool
    corner_uv: jnp.ndarray  # (N, 2) matched corner, level-l pixel coords
    score: jnp.ndarray  # (N,) best ZMSSD score
    pred_uv: jnp.ndarray  # (N, 2) predicted position, level-l coords


def capture_source_patches(img_level: jnp.ndarray, uv_level: jnp.ndarray):
    """Extract (N, 16, 16) source patches at anchor time (axis-aligned,
    integer offsets: grid position g corresponds to physical offset
    g - SOURCE_PATCH//2)."""
    offs = jnp.asarray(_patch_offsets_int(SOURCE_PATCH))
    coords = uv_level[:, None, :] + offs[None, :, :]
    vals, ok = bilinear_sample(img_level, coords)
    return (
        vals.reshape(-1, SOURCE_PATCH, SOURCE_PATCH),
        jnp.all(ok, axis=-1),
    )


def qpack_patches(source: jnp.ndarray) -> jnp.ndarray:
    """(N, S, S) patches -> (N*S*S, 4) per-pixel 2x2 tap pack, so warping
    needs ONE 4-wide contiguous gather per sample instead of 4 scalar
    gathers (TPU gathers are transaction-bound). Wrapped entries in each
    patch's last row/column are never indexed (coords clipped to S-2).
    Build once per frame and reuse across the per-level match calls."""
    r1 = jnp.roll(source, -1, 2)
    d1 = jnp.roll(source, -1, 1)
    q = jnp.stack([source, r1, d1, jnp.roll(d1, -1, 2)], -1)
    return q.reshape(-1, 4)


def _warp_from_source(source: jnp.ndarray, A: jnp.ndarray, offsets=None,
                      source_q: jnp.ndarray = None):
    """Sample the central 8x8 of each 16x16 source patch through affine A
    (A maps current-frame offsets to anchor-frame offsets).

    source: (N, 16, 16); A: (N, 2, 2) -> (N, 64)
    source_q: optional qpack_patches(source) to share across calls.
    """
    offs = jnp.asarray(
        offsets if offsets is not None else _patch_offsets_int(PATCH)
    )  # (64, 2)
    center = float(SOURCE_PATCH // 2)
    w_offs = jnp.einsum("nij,pj->npi", A, offs)  # (N, 64, 2)
    coords = w_offs + center
    # flat single gather across all patches (vmap-of-gather with a batched
    # operand lowers poorly on TPU): global index n*S*S + v*S + u.
    n = source.shape[0]
    S = SOURCE_PATCH
    u = coords[..., 0]
    v = coords[..., 1]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, S - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, S - 2)
    fu = u - u0
    fv = v - v0
    ok = (u >= 0) & (v >= 0) & (u <= S - 1) & (v <= S - 1)
    base = (jnp.arange(n, dtype=jnp.int32) * (S * S))[:, None]
    if source_q is None:
        source_q = qpack_patches(source)
    q = source_q[base + v0 * S + u0]  # (N, 64, 4)
    vals = (q[..., 0] * (1 - fu) + q[..., 1] * fu) * (1 - fv) + (
        q[..., 2] * (1 - fu) + q[..., 3] * fu
    ) * fv
    return vals, jnp.all(ok, axis=-1)


def match_level(
    cam_level: StereoCamera,
    img_level: jnp.ndarray,
    T_cw: SE3,
    xyz_w: jnp.ndarray,
    anchors: SE3,  # batched (N,) anchor poses
    source_patches: jnp.ndarray,
    point_valid: jnp.ndarray,
    buckets: dict,
    disp0: jnp.ndarray,
    level: int,
    zmssd_thr: float = 0.18,
    search_radius: float = 10.0,
) -> MatchResult:
    """Match one level's candidate points. Thin wrapper assembling the jitted
    pieces (kept split so the patch-sampling gather reuses XLA fusion)."""
    return _match_level(
        (cam_level.focal, cam_level.pp[0], cam_level.pp[1], cam_level.baseline),
        cam_level.size,
        img_level,
        T_cw.R, T_cw.t,
        xyz_w,
        anchors.R, anchors.t,
        source_patches,
        point_valid,
        buckets["uv"],
        buckets["valid"],
        disp0,
        level,
        zmssd_thr,
        search_radius,
    )


@partial(jax.jit, static_argnames=("cam_size", "level"))
def _match_level(
    cam_params, cam_size, img_level, R_cw, t_cw, xyz_w, R_aw, t_aw,
    source_patches, point_valid, buckets_uv, buckets_valid, disp0,
    level, zmssd_thr, search_radius,
):
    focal, ppx, ppy, baseline = cam_params
    w, h = cam_size
    N = xyz_w.shape[0]
    cy, cx, K, _ = buckets_uv.shape
    cell_h = -(-h // cy)
    cell_w = -(-w // cx)

    # ---- predict
    xyz_c = jnp.einsum("ij,nj->ni", R_cw, xyz_w) + t_cw
    z_c = xyz_c[:, 2]
    z_safe = jnp.where(jnp.abs(z_c) < 1e-6, 1e-6, z_c)
    u = xyz_c[:, 0] / z_safe * focal + ppx
    v = xyz_c[:, 1] / z_safe * focal + ppy
    pred_uv = jnp.stack([u, v], axis=-1)
    in_img = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (z_c > 0.1)

    xyz_a = jnp.einsum("nij,nj->ni", R_aw, xyz_w) + t_aw
    z_a = xyz_a[:, 2]
    ratio = z_a / z_safe
    depth_ok = (
        (ratio < DEPTH_RATIO_MAX)
        & (ratio > 1.0 / DEPTH_RATIO_MAX)
        & (z_a > 0.1)
    )
    cand_ok = point_valid & in_img & depth_ok

    # ---- gather 3x3 corner buckets
    pc_y = jnp.clip((v // cell_h).astype(jnp.int32), 0, cy - 1)
    pc_x = jnp.clip((u // cell_w).astype(jnp.int32), 0, cx - 1)
    d = jnp.array([-1, 0, 1], jnp.int32)
    ny = jnp.clip(pc_y[:, None] + d[None, :], 0, cy - 1)
    nx = jnp.clip(pc_x[:, None] + d[None, :], 0, cx - 1)
    gy = jnp.repeat(ny, 3, axis=1)
    gx = jnp.tile(nx, (1, 3))
    c_uv = buckets_uv[gy, gx].reshape(N, 9 * K, 2)
    c_val = buckets_valid[gy, gx].reshape(N, 9 * K)
    dist2 = jnp.sum((c_uv - pred_uv[:, None, :]) ** 2, axis=-1)
    c_val = c_val & (dist2 <= search_radius * search_radius)

    # ---- affine warp of stored source patches
    R_ca = jnp.einsum("ij,nkj->nik", R_cw, R_aw)  # R_cw @ R_aw^T
    A_a2c = affine_from_geometry(focal, focal, R_ca, xyz_a, xyz_c)
    det = A_a2c[:, 0, 0] * A_a2c[:, 1, 1] - A_a2c[:, 0, 1] * A_a2c[:, 1, 0]
    det_ok = jnp.abs(det) > 1e-4
    det_safe = jnp.where(det_ok, det, 1.0)
    A_c2a = (
        jnp.stack(
            [
                jnp.stack([A_a2c[:, 1, 1], -A_a2c[:, 0, 1]], axis=-1),
                jnp.stack([-A_a2c[:, 1, 0], A_a2c[:, 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det_safe[:, None, None]
    )
    ref_patch, warp_ok = _warp_from_source(source_patches, A_c2a)
    cand_ok = cand_ok & det_ok & warp_ok

    # ---- candidate patches + ZMSSD (integer offsets, same grid as warp)
    offs = jnp.asarray(_patch_offsets_int(PATCH))
    coords = c_uv[:, :, None, :] + offs[None, None, :, :]  # (N, M, 64, 2)
    cand_patches, patch_ok = bilinear_sample(img_level, coords)
    patch_ok = jnp.all(patch_ok, axis=-1)  # (N, M)

    a = ref_patch - jnp.mean(ref_patch, axis=-1, keepdims=True)
    b = cand_patches - jnp.mean(cand_patches, axis=-1, keepdims=True)
    score = (
        jnp.sum(a * a, axis=-1)[:, None]
        + jnp.sum(b * b, axis=-1)
        - 2.0 * jnp.einsum("np,nmp->nm", a, b,
                           preferred_element_type=jnp.float32)
    )
    score = jnp.where(c_val & patch_ok, score, jnp.inf)

    best = jnp.argmin(score, axis=-1)
    best_score = jnp.min(score, axis=-1)
    corner = jnp.take_along_axis(c_uv, best[:, None, None], axis=1)[:, 0, :]
    matched = cand_ok & jnp.isfinite(best_score) & (best_score < zmssd_thr)

    # ---- build level-0 uvu observation from the disparity map
    s = jnp.float32(2 ** level)
    uv0 = (corner + 0.5) * s - 0.5
    disp_val, disp_ok = nearest_sample(disp0, uv0)
    matched = matched & disp_ok & (disp_val > 0)
    obs = jnp.stack(
        [uv0[:, 0], uv0[:, 1], uv0[:, 0] - disp_val], axis=-1
    )
    return MatchResult(obs, matched, corner, best_score, pred_uv)
