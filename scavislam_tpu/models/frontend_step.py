"""The fused per-frame frontend step: ONE device program per frame.

The reference pipeline crosses the host<->device boundary dozens of times per
frame (uploads, disparity download, per-iteration H/b readbacks —
stereo_frontend.cpp:139, 559-612, dense_tracking.cpp:129-176). Early versions
of this frontend mirrored that structure with one jit per stage and paid a
host round-trip per stage — fatal over a remote-chip link.

This module fuses the WHOLE per-frame compute into a single XLA program:

    preprocess -> block-matching stereo -> FAST corner buckets (3 levels)
    -> dense photometric tracking (full coarse-to-fine LM)
    -> candidate materialization from the device map tables
    -> guided ZMSSD matching (3 levels)
    -> robust motion-only BA (LM + rejection round)
    -> reprojection gating + keyframe-policy statistics
    -> next frame's dense point-cloud state

Per frame the host sends: two images + one candidate-id vector; it receives:
one pose, the gate mask + observations, and ~a dozen policy scalars — a
single jax.device_get of one small pytree. Everything else stays in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scavislam_tpu.core.lie import SE3
from scavislam_tpu.models.dense_tracker import _lm_level_ic, template_jacobian
from scavislam_tpu.models.map_store import PointTable, PoseTable
from scavislam_tpu.models.matcher import _warp_from_source, qpack_patches
from scavislam_tpu.models.pose_optimizer import motion_only_ba
from scavislam_tpu.ops.fast import detect_corners_grid
from scavislam_tpu.ops.image import (
    bilinear_sample,
    build_pyramid,
    nearest_sample,
    sobel_xy,
)
from scavislam_tpu.ops.patches import PATCH, affine_from_geometry
import numpy as np


def level_sections(levels: int, C: int) -> tuple:
    """Fixed per-level candidate capacities: cand_ids is split into
    CONTIGUOUS per-level sections so each level's matcher only does work for
    its own candidates (a shared pool cost 3x the gathers/warps: every level
    warped and scored all C candidates and masked the wrong-level ones).
    Proportions track the reference's per-level feature budget
    (2000*4^-l corners / 300*4^-l new points, stereo_frontend.cpp:79,743),
    rounded to lane-friendly multiples of 32. The HOST packs candidates
    into these sections (frontend._collect_candidates)."""
    frac = {1: (), 2: (0.25,), 3: (0.25, 1.0 / 12.0)}.get(
        levels, tuple(4.0 ** -l for l in range(1, levels)))
    caps = [max(32, int(C * f) // 32 * 32) for f in frac]
    return (C - sum(caps), *caps)


def _patch_offsets_int(size: int):
    """Integer offsets -size//2 .. size//2-1 (the reference's patch
    alignment; integer corners + integer offsets = pure gather, no bilinear)."""
    r = np.arange(size, dtype=np.float32) - size // 2
    ou, ov = np.meshgrid(r, r)
    return np.stack([ou.reshape(-1), ov.reshape(-1)], axis=-1)


def _extract_bucket_patches(img, buckets_uv, buckets_valid):
    """8x8 patches at INTEGER bucket-corner positions: (cy, cx, K, 64).
    Replaces per-candidate bilinear re-sampling (the dominant cost of the
    match stage: 3.5M bilinear samples per level).

    Gather formulation: TPU gathers are TRANSACTION-bound, and gathering
    multi-element ROWS is ~2.6x cheaper per transaction than scalar takes
    (measured, benchmarks/micro_gather_batched.py: 196k scalar takes 1.25 ms
    vs 196k 4-wide rows 0.48 ms). Each patch row of 8 pixels is fetched as
    TWO 4-wide row gathers from a shifted-stack pack of the image — 16
    transactions per patch instead of 64 scalar takes (was the dominant,
    B-linear cost of the batched multistream step: corners+buckets scaled
    8.4x over 8 vmapped streams)."""
    h, w = img.shape
    cy, cx, K, _ = buckets_uv.shape
    half = PATCH // 2
    u0 = buckets_uv[..., 0].astype(jnp.int32)
    v0 = buckets_uv[..., 1].astype(jnp.int32)
    ut, vt = u0 - half, v0 - half  # patch top-left
    ok = (
        (ut >= 0) & (ut + PATCH <= w) & (vt >= 0) & (vt + PATCH <= h)
    ) & buckets_valid
    utc = jnp.clip(ut, 0, w - PATCH)
    vtc = jnp.clip(vt, 0, h - PATCH)
    g = img.reshape(-1)
    # q4[i] = (g[i], g[i+1], g[i+2], g[i+3]); valid bases never wrap rows
    # (utc <= w - PATCH, chunk start <= utc + 4, so start+3 <= w-1)
    q4 = jnp.stack(
        [g, jnp.roll(g, -1), jnp.roll(g, -2), jnp.roll(g, -3)], axis=-1
    )
    rows = np.arange(PATCH, dtype=np.int32)
    chunks = np.arange(0, PATCH, 4, dtype=np.int32)
    offs16 = jnp.asarray((rows[:, None] * w + chunks[None, :]).reshape(-1))
    base = (vtc * w + utc)[..., None]
    vals = q4[base + offs16]  # (cy, cx, K, 16, 4)
    # (16, 4) unpacks row-major to the same (ov, ou) raster order as before
    return vals.reshape(cy, cx, K, PATCH * PATCH), ok
from scavislam_tpu.ops.stereo import block_matching_disparity
from scavislam_tpu.core.camera import StereoCamera

import os as _os
import jax as _jax

# the fused Pallas stereo kernel runs on real TPU backends; CPU tests and
# explicit opt-out use the XLA formulation (identical semantics)
_USE_PALLAS_BM = (
    _jax.default_backend() not in ("cpu",)
    and _os.environ.get("SCAVISLAM_NO_PALLAS", "0") != "1"
)

# guided-match window radius in level pixels (parity: matcher.cpp:351-357's
# 4-10 px quadtree query; widened to 16 px — the most the 3x3 bucket
# neighborhood of 16 px cells can GUARANTEE to cover — because the radius
# sets the pipeline staleness budget: the frontend's depth guard converts
# it to a rotation budget (StereoFrontend._effective_depth), and 16 px at
# the loop-closure benchmark's 4.1 deg/frame admits dispatch-ahead depth 3
# (RTT fully hidden) where 10 px clamped to 2 (measured: fetch_wait was
# half the frame period). The wider gate's extra distractor corners are
# still filtered by ZMSSD + the depth-ratio gate — ATE unchanged on the
# exact-GT suites).
MATCH_SEARCH_RADIUS_PX = 16.0

# per-level extra subsampling of the dense-tracking cloud (on top of the
# pyramid's 2^l): level-l effective stride in level-0 pixels is 2^l * sub.
DENSE_SUBS = (2, 2, 1)
# batched (multistream) default: the dense LM's gathers are the dominant,
# B-linear cost of the batched step (measured 31.9 of 54.5 ms at B=8,
# benchmarks/profile_multistream.py); levels 0-1 at every 4th pixel match
# the reference's own CPU tracker density (dense_tracking.h:82) and cut
# the cloud 73k -> 27.6k points at 512x384. The COARSE level stays at full
# density: it carries the large-rotation convergence basin — measured
# (CPU, deterministic): a 4 deg/frame 360-spin tracks at ATE 0.0172 with
# (4,4,1) (default (2,2,1): 0.0174) but LOSES TRACKING at frame 7 with
# (4,4,2); forward-arc ATE is density-invariant at 1e-5.
DENSE_SUBS_BATCHED = (4, 4, 1)


class FrontendStepOut(NamedTuple):
    # `packed` is THE one host-fetched array per frame: every scalar/mask the
    # host policy needs, concatenated into a single f32 vector — fetching N
    # separate small arrays costs N round-trips on a remote-chip link
    # (measured ~360 ms each over the axon tunnel vs ~8 ms for one array).
    packed: jnp.ndarray
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    R_cak: jnp.ndarray  # T_cur_from_actkey
    t_cak: jnp.ndarray
    gate: jnp.ndarray  # (C,) bool gated matches
    matched: jnp.ndarray  # (C,) bool raw matches
    obs_uvu: jnp.ndarray  # (C, 3)
    n_matched: jnp.ndarray
    n_gated: jnp.ndarray
    quad_counts: jnp.ndarray  # (4,)
    t_norm: jnp.ndarray  # |t_cur_from_actkey|
    mean_track_len: jnp.ndarray
    dense_chi2: jnp.ndarray
    ba_chi2: jnp.ndarray
    # device-resident outputs (not fetched)
    pyr: tuple
    dx: tuple
    dy: tuple
    disp: jnp.ndarray
    clouds: tuple
    cloud_valids: tuple
    intens: tuple
    cloud_J: tuple  # per-level (N, 6) template Jacobians (IC dense tracking)


def _subpixel_delta(tmpl, patch):
    """One inverse-compositional LK translation step on an 8x8 patch pair:
    the sub-pixel offset of `patch` (current image at the integer corner)
    relative to `tmpl` (warped source). The reference STUBS its sub-pixel
    refinement and returns the integer corner (matcher.cpp:242-309) — this
    closes that gap for free: gradients come from in-patch central
    differences on data already gathered, no extra image samples.

    Returns (N, 2) du/dv, clamped to +-1 px, zero where ill-conditioned."""
    n = tmpl.shape[0]
    t2 = tmpl.reshape(n, PATCH, PATCH)
    p2 = patch.reshape(n, PATCH, PATCH)
    # zero-mean (ZMSSD's brightness-offset robustness)
    t2 = t2 - jnp.mean(t2, axis=(-2, -1), keepdims=True)
    p2 = p2 - jnp.mean(p2, axis=(-2, -1), keepdims=True)
    # template gradients, central differences (borders excluded from sums)
    gx = jnp.zeros_like(t2).at[:, :, 1:-1].set(
        0.5 * (t2[:, :, 2:] - t2[:, :, :-2]))
    gy = jnp.zeros_like(t2).at[:, 1:-1, :].set(
        0.5 * (t2[:, 2:, :] - t2[:, :-2, :]))
    r = p2 - t2
    h00 = jnp.sum(gx * gx, axis=(-2, -1))
    h01 = jnp.sum(gx * gy, axis=(-2, -1))
    h11 = jnp.sum(gy * gy, axis=(-2, -1))
    b0 = jnp.sum(gx * r, axis=(-2, -1))
    b1 = jnp.sum(gy * r, axis=(-2, -1))
    det = h00 * h11 - h01 * h01
    ok = det > 1e-8
    det_safe = jnp.where(ok, det, 1.0)
    # d solves T(x + d) ~ I(x); a feature sitting at +s inside the image
    # patch yields d = -s (verified numerically), so the corner estimate
    # moves by -d — the caller SUBTRACTS this delta
    du = (h11 * b0 - h01 * b1) / det_safe
    dv = (h00 * b1 - h01 * b0) / det_safe
    d = jnp.stack([du, dv], axis=-1)
    d = jnp.clip(jnp.where(ok[:, None], d, 0.0), -1.0, 1.0)
    return d


def _match_one_level(cam_l, img_level, R_cw, t_cw, xyz_w, R_aw, t_aw,
                     source_patches, point_valid, buckets_uv, buckets_valid,
                     bucket_patches, bucket_patch_ok,
                     disp0, level, zmssd_thr, search_radius,
                     source_patches_q=None):
    """Inlined guided matching for one level (same math as matcher._match_level
    but callable inside the fused step).

    `disp0=None` selects MONOCULAR matching (trace-time branch): the
    observation is the sub-pixel level-0 uv with a zero third component and
    no disparity gating (the mono pipeline has no right image)."""
    focal, ppx, ppy = cam_l["focal"], cam_l["ppx"], cam_l["ppy"]
    w, h = cam_l["size"]
    N = xyz_w.shape[0]
    cy, cx, K, _ = buckets_uv.shape
    cell_h = -(-h // cy)
    cell_w = -(-w // cx)

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
    depth_ok = (ratio < 3.0) & (ratio > 1.0 / 3.0) & (z_a > 0.1)
    cand_ok = point_valid & in_img & depth_ok

    pc_y = jnp.clip((v // cell_h).astype(jnp.int32), 0, cy - 1)
    pc_x = jnp.clip((u // cell_w).astype(jnp.int32), 0, cx - 1)
    d3 = jnp.array([-1, 0, 1], jnp.int32)
    ny = jnp.clip(pc_y[:, None] + d3[None, :], 0, cy - 1)
    nx = jnp.clip(pc_x[:, None] + d3[None, :], 0, cx - 1)
    gy = jnp.repeat(ny, 3, axis=1)
    gx = jnp.tile(nx, (1, 3))
    c_uv = buckets_uv[gy, gx].reshape(N, 9 * K, 2)
    c_val = buckets_valid[gy, gx].reshape(N, 9 * K)
    dist2 = jnp.sum((c_uv - pred_uv[:, None, :]) ** 2, axis=-1)
    c_val = c_val & (dist2 <= search_radius * search_radius)

    R_ca = jnp.einsum("ij,nkj->nik", R_cw, R_aw)
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
    ref_patch, warp_ok = _warp_from_source(
        source_patches, A_c2a, offsets=_patch_offsets_int(PATCH),
        source_q=source_patches_q,
    )
    cand_ok = cand_ok & det_ok & warp_ok

    # candidate patches: row-gather from the per-level precomputed table
    cand_patches = bucket_patches[gy, gx].reshape(N, 9 * K, 64)
    patch_ok = bucket_patch_ok[gy, gx].reshape(N, 9 * K)

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

    # sub-pixel: one IC-LK step on the winning patch pair (already gathered)
    best_patch = jnp.take_along_axis(
        cand_patches, best[:, None, None], axis=1)[:, 0, :]
    corner = corner - _subpixel_delta(ref_patch, best_patch)

    s = jnp.float32(2**level)
    uv0 = (corner + 0.5) * s - 0.5
    if disp0 is None:  # monocular: uv observation, no disparity gate
        obs = jnp.concatenate([uv0, jnp.zeros_like(uv0[:, :1])], axis=-1)
        return obs, matched
    disp_val, disp_ok = nearest_sample(disp0, uv0)
    matched = matched & disp_ok & (disp_val > 0)
    obs = jnp.stack([uv0[:, 0], uv0[:, 1], uv0[:, 0] - disp_val], axis=-1)
    return obs, matched


@partial(
    jax.jit,
    static_argnames=(
        "cam_statics", "levels", "num_disp", "use_external_disp",
        "max_reproj_err", "zmssd_thr", "stereo_method", "stereo_opts",
        "prefilter", "dense_subs", "dense_sample",
    ),
)
def frontend_step(
    frames_stacked,  # (2 or 3, H, W): left, right[, external disparity] —
    # ONE upload per frame (each separate host->device transfer costs a full
    # link round-trip)
    prev_clouds, prev_intens, prev_valids, prev_J,
    R_cw_prev, t_cw_prev,  # previous frame's world pose (chain seed)
    actkey_id,  # device scalar int (keyframe-policy statistics only)
    poses: PoseTable,
    points: PointTable,
    cand_ids,  # (C,) int32, -1 padded
    cam_params,  # per-level (focal, ppx, ppy, baseline) dynamic scalars
    cam_statics,  # per-level (w, h) static
    levels: int = 3,
    num_disp: int = 64,
    use_external_disp: bool = False,
    max_reproj_err: float = 2.0,
    zmssd_thr: float = 0.18,
    stereo_method: int = 2,  # 1/2 BM, 3 BP, 4 CSBP (stereo_frontend.cpp:535)
    stereo_opts: tuple = (4, 4, 4),  # (iters, levels, nr_plane) for BP/CSBP
    prefilter: bool = True,  # 3x3 binomial sensor-noise prefilter
    dense_subs: tuple = DENSE_SUBS,  # dense-cloud per-level subsampling
    dense_sample: str = "qpack",  # dense-tracking sampler: "qpack" exact
    # scalar gathers (single-stream default) | "matmul" MXU bilinear
    # (batched mode: gathers serialize across vmapped streams —
    # dense_tracker._sample_matmul)
) -> FrontendStepOut:
    # -- 1. unpack + preprocess (uint8 frames normalized on device)
    if frames_stacked.dtype == jnp.uint8:
        frames_f = frames_stacked.astype(jnp.float32) / 255.0
    else:
        frames_f = frames_stacked
    img = frames_f[0]
    right = frames_f[1]
    external_disp = frames_f[2] if use_external_disp else frames_f[0]
    # sensor-noise prefilter, SURGICAL: only the stereo-matching inputs and
    # the corner-detection inputs are smoothed (the reference inherits
    # OpenCV StereoBM's prefilter; without one, 10%-of-full-scale noise
    # collapses BM validity to 15% and floods the FAST cells — measured,
    # benchmarks/robustness.py). Dense tracking and ZMSSD patches keep the
    # RAW pyramid: smoothing them costs clean-sequence subpixel accuracy
    # (ATE 0.0064 -> 0.0080 measured) for no robustness gain — their own
    # robust losses (residual clamp, zero-mean normalization) carry noise.
    if prefilter:
        from scavislam_tpu.ops.image import binomial3

        img_s, right_s = binomial3(img), binomial3(right)
    else:
        img_s, right_s = img, right
    pyr = build_pyramid(img, levels)
    dxs, dys = [], []
    for p in pyr:
        dx_, dy_ = sobel_xy(p)
        dxs.append(dx_)
        dys.append(dy_)
    dxs, dys = tuple(dxs), tuple(dys)

    # -- 2. disparity (runtime-selectable like the reference's 4 methods,
    # stereo_frontend.cpp:530-614; the method is a static arg, so each
    # selection compiles its own fused program)
    if use_external_disp:
        disp = external_disp
    elif stereo_method == 3:
        from scavislam_tpu.ops.stereo_bp import belief_propagation_disparity

        disp = belief_propagation_disparity(
            img_s, right_s, num_disp=num_disp,
            iters=max(5, stereo_opts[0]), levels=max(4, stereo_opts[1]),
        )
    elif stereo_method == 4:
        from scavislam_tpu.ops.stereo_bp import constant_space_bp_disparity

        disp = constant_space_bp_disparity(
            img_s, right_s, num_disp=num_disp, iters=stereo_opts[0],
            levels=stereo_opts[1], nr_plane=stereo_opts[2],
        )
    elif stereo_method != 1 and _USE_PALLAS_BM and img.shape[0] % 32 == 0:
        from scavislam_tpu.ops.stereo_pallas import (
            block_matching_disparity_pallas,
        )

        disp = block_matching_disparity_pallas(
            img_s, right_s, num_disp=num_disp, radius=5
        )
    else:
        # method 1 (the reference's CPU StereoBM) maps to the XLA twin
        disp = block_matching_disparity(img_s, right_s, num_disp=num_disp,
                                        radius=5)

    # actkey pose from the device table (keyframe-policy statistics only)
    R_akw = poses.R[actkey_id]
    t_akw = poses.t[actkey_id]

    # -- 3. dense tracking (coarse to fine): the reference cloud is anchored
    # at the PREVIOUS FRAME (the reference anchors at the active keyframe and
    # integrates T_cur_from_actkey, dense_tracking.cpp; anchoring at the
    # previous frame is equivalent — the prior seeds matching only, and the
    # world pose is chained through the BA-refined estimate — and it makes
    # keyframe changes a no-op for the dense state).
    R_d = jnp.eye(3, dtype=jnp.float32)
    t_d = jnp.zeros(3, jnp.float32)
    dense_chi2 = jnp.float32(0.0)
    for level in range(levels - 1, -1, -1):
        focal, ppx, ppy, baseline = cam_params[level]
        cam_l = StereoCamera(
            focal, jnp.stack([ppx, ppy]), cam_statics[level], baseline
        )
        # NOTE: capping level-0 iterations below the reference's 15 loses
        # tracking on the 360-spin system test — rotation-heavy motion needs
        # the full fine-level refinement; the early-stop in _lm_level_ic
        # already bounds easy frames.
        R_d, t_d, chi2_l, _ = _lm_level_ic(
            cam_l, pyr[level],
            prev_clouds[level], prev_intens[level], prev_J[level],
            prev_valids[level], R_d, t_d,
            sample_mode=dense_sample,
        )
        dense_chi2 = chi2_l

    # -- 4. pose estimate in world frame: delta composed onto the previous
    # frame's (BA-refined) world pose
    R_cw = R_d @ R_cw_prev
    t_cw = jnp.einsum("ij,j->i", R_d, t_cw_prev) + t_d

    # -- 5. materialize candidates from the device tables
    P_cap = points.psi.shape[0]
    safe = jnp.clip(cand_ids, 0, P_cap - 1)
    psi = points.psi[safe]
    q = psi[:, 2:3]
    q_safe = jnp.where(jnp.abs(q) < 1e-9, 1e-9, q)
    xyz_a = jnp.concatenate([psi[:, :2], jnp.ones_like(q)], axis=-1) / q_safe
    a_idx = points.anchor[safe]
    R_aw = poses.R[a_idx]
    t_aw = poses.t[a_idx]
    xyz_w = jnp.einsum("nji,nj->ni", R_aw, xyz_a - t_aw)
    patches = points.patch[safe]
    cand_levels = points.level[safe]
    cand_uv0 = points.uv0[safe]
    cand_anchor = a_idx
    ok = (
        (cand_ids >= 0) & points.valid[safe] & poses.valid[a_idx]
        & (q[:, 0] > 1e-9)
    )

    # -- 6. guided matching per level (unrolled static loop). cand_ids is
    # split into contiguous per-level sections (level_sections): each level
    # gathers/warps/scores ONLY its own section — the matching stage was the
    # dominant device cost (~10 ms of a 21 ms step) when every level did
    # full-C work and masked the rest.
    C = cand_ids.shape[0]
    caps = level_sections(levels, C)
    sec_off = 0
    obs_secs, matched_secs = [], []
    for l in range(levels):
        focal, ppx, ppy, baseline = cam_params[l]
        w_l, h_l = cam_statics[l]
        # buckets at this level
        # 16-px cells x 4 corners/cell tracks the reference's feature budget
        # (2000*4^-l corners at level l, stereo_frontend.cpp:79): 24x32x4 =
        # 3072 at level 0 — an 8-px grid held 12k corners, 6x the budget, and
        # its per-corner patch table dominated the match stage (7 ms/frame)
        cells_y = max(h_l // 16, 4)
        cells_x = max(w_l // 16, 4)
        # corner detection on the smoothed level (noise-corner flood guard);
        # bucket patches for ZMSSD stay on the raw level
        from scavislam_tpu.ops.image import binomial3 as _b3

        uvb, scoreb, validb = detect_corners_grid(
            _b3(pyr[l]) if prefilter else pyr[l],
            10.0 / 255.0, cells_y, cells_x, 4
        )
        buckets_uv = uvb.reshape(cells_y, cells_x, 4, 2)
        buckets_valid = validb.reshape(cells_y, cells_x, 4)
        bucket_patches, bucket_patch_ok = _extract_bucket_patches(
            pyr[l], buckets_uv, buckets_valid
        )
        sl = slice(sec_off, sec_off + caps[l])
        sec_off += caps[l]
        sec_patches = patches[sl]
        lvl_ok = ok[sl] & (cand_levels[sl] == l)
        obs_l, m_l = _match_one_level(
            {"focal": focal, "ppx": ppx, "ppy": ppy, "size": (w_l, h_l)},
            pyr[l], R_cw, t_cw, xyz_w[sl], R_aw[sl], t_aw[sl], sec_patches,
            lvl_ok,
            buckets_uv, buckets_valid, bucket_patches, bucket_patch_ok,
            disp, l, zmssd_thr, MATCH_SEARCH_RADIUS_PX,
            source_patches_q=qpack_patches(sec_patches),
        )
        obs_secs.append(obs_l)
        matched_secs.append(m_l)
    obs_all = jnp.concatenate(obs_secs, axis=0)
    matched_all = jnp.concatenate(matched_secs, axis=0)

    n_matched = jnp.sum(matched_all.astype(jnp.int32))

    # -- 7. robust motion-only BA (2 rounds with rejection)
    focal0, ppx0, ppy0, baseline0 = cam_params[0]
    cam0 = StereoCamera(
        focal0, jnp.stack([ppx0, ppy0]), cam_statics[0], baseline0
    )
    weights = (0.25 ** cand_levels.astype(jnp.float32)) * matched_all
    res = motion_only_ba(cam0, SE3(R_cw, t_cw), xyz_w, obs_all, weights,
                         matched_all, 1.0)
    keep = (
        matched_all & res.inlier_mask
        & (jnp.max(jnp.abs(res.residuals), axis=-1) < max_reproj_err * 2.0)
    )
    res = motion_only_ba(cam0, res.T, xyz_w, obs_all, weights, keep, 1.0)

    # -- 8. gating + policy statistics
    lvl_scale = (2.0 ** cand_levels).astype(jnp.float32)
    resid = res.residuals
    gate = (
        matched_all & res.inlier_mask
        & (jnp.abs(resid[:, 0]) < max_reproj_err * lvl_scale)
        & (jnp.abs(resid[:, 1]) < max_reproj_err * lvl_scale)
        & (jnp.abs(resid[:, 0] - resid[:, 2]) < 6.0)
    )
    n_gated = jnp.sum(gate.astype(jnp.int32))
    # A BA below the tracking floor (stereo_frontend.cpp:1053 declares
    # tracking FAILED under 20 obs) must not move the pose CHAIN: the
    # chained R_cw/t_cw feeds every later frame's dense tracking, and one
    # poorly-constrained solve corrupts the chain irreversibly. The floor
    # is judged on the FINAL per-level reprojection gate, not the BA's own
    # looser inlier set: measured on the 360-spin, a stale-candidate frame
    # passed ~40 round-1 inliers into the solve but only 8 survived the
    # gate — the solve had been pulled 0.14 m sideways by confident
    # mismatches, and the next frame compounded it to 0.26 m, permanently
    # (the chain never recovers what one frame loses). Keeping the
    # dense-tracking pose leaves the frame's stats below the floor (the
    # host consume still treats it as failed/transient) while the chain
    # stays recoverable.
    ba_ok = (n_matched >= 20) & (n_gated >= 20)
    R_cw = jnp.where(ba_ok, res.T.R, R_cw)
    t_cw = jnp.where(ba_ok, res.T.t, t_cw)

    w0, h0 = cam_statics[0]
    qx = (obs_all[:, 0] > w0 / 2).astype(jnp.int32)
    qy = (obs_all[:, 1] > h0 / 2).astype(jnp.int32)
    quad = qy * 2 + qx
    quad_counts = jnp.sum(
        jax.nn.one_hot(quad, 4, dtype=jnp.int32) * gate[:, None].astype(jnp.int32),
        axis=0,
    )

    # T_cur_from_actkey (statistics / host policy)
    R_cak_new = R_cw @ R_akw.T
    t_cak_new = t_cw - jnp.einsum("ij,j->i", R_cak_new, t_akw)
    t_norm = jnp.linalg.norm(t_cak_new)

    own = gate & (cand_anchor == actkey_id)
    track_len = jnp.linalg.norm(obs_all[:, :2] - cand_uv0, axis=-1)
    n_own = jnp.maximum(jnp.sum(own.astype(jnp.float32)), 1.0)
    mean_track_len = jnp.sum(jnp.where(own, track_len, 0.0)) / n_own

    # -- 9. next frame's dense state (cloud pyramid + IC template Jacobians,
    # anchored at THIS frame)
    clouds, valids, intens, cloud_J = _cloud_state(
        pyr, disp, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        cam_params, levels, dxs, dys, dense_subs=dense_subs
    )

    packed = jnp.concatenate([
        R_cw.reshape(-1), t_cw,                      # 0:9, 9:12
        R_cak_new.reshape(-1), t_cak_new,            # 12:21, 21:24
        jnp.stack([
            n_matched.astype(jnp.float32),           # 24
            n_gated.astype(jnp.float32),             # 25
            t_norm, mean_track_len,                  # 26, 27
            dense_chi2, res.chi2,                    # 28, 29
        ]),
        quad_counts.astype(jnp.float32),             # 30:34
        gate.astype(jnp.float32),                    # 34:34+C
        matched_all.astype(jnp.float32),             # +C
        obs_all.reshape(-1),                         # +3C
    ])
    return FrontendStepOut(
        packed,
        R_cw, t_cw, R_cak_new, t_cak_new,
        gate, matched_all, obs_all,
        n_matched, n_gated, quad_counts, t_norm, mean_track_len,
        dense_chi2, res.chi2,
        pyr, dxs, dys, disp,
        clouds, valids, intens, cloud_J,
    )


def _cloud_state(pyr, disp, R_cak, t_cak, cam_params, levels, dxs=None,
                 dys=None, dense_subs=DENSE_SUBS):
    """Back-project the disparity map into the ACTKEY frame per level.

    Levels are subsampled per DENSE_SUBS (the reference's CPU path samples
    every 4th pixel, dense_tracking.h:82; the photometric solve is massively
    over-determined, and the bilinear gathers are the dominant cost — note
    level 1 UNSTRIDED has as many pixels as level 0 at stride 2).

    When dxs/dys (the frame's Sobel pyramids) are given, also returns the
    per-level inverse-compositional template Jacobians — exact integer-pixel
    gradients (the cloud IS the grid back-projected), computed once here
    instead of re-sampled every LM iteration. The Jacobians are only valid
    for the identity anchor (R_cak = I): they linearize in the frame whose
    grid the template pixels live on.
    """
    clouds, valids, intens, Js = [], [], [], []
    Rt = R_cak.T
    for level in range(levels):
        s = 2**level
        sub = dense_subs[level] if level < len(dense_subs) else 1
        focal, ppx, ppy, baseline = cam_params[level]
        d_l = disp[:: s * sub, :: s * sub]
        hh, ww = d_l.shape
        # pixel coordinates in LEVEL-l units (stride sub within the level)
        v_idx = jnp.arange(hh, dtype=jnp.float32)[:, None] * sub
        u_idx = jnp.arange(ww, dtype=jnp.float32)[None, :] * sub
        valid = d_l > 0.0
        d_safe = jnp.where(valid, d_l, 1.0)
        # cam_params[level] are ALREADY the level camera's (focal/2^l,
        # scaled pp, baseline*2^l); f*b is level-invariant so the level-0
        # disparity VALUE gives the right depth directly.
        z = focal * baseline / d_safe
        x = (u_idx - ppx) / focal * z
        y = (v_idx - ppy) / focal * z
        xyz = jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], -1)
        xyz_ak = jnp.einsum("ij,nj->ni", Rt, xyz - t_cak[None, :])
        clouds.append(xyz_ak)
        valids.append(valid.reshape(-1))
        intens.append(pyr[level][::sub, ::sub].reshape(-1))
        if dxs is not None:
            Js.append(template_jacobian(
                focal, xyz,  # pre-rebase xyz: the template frame's coords
                dxs[level][::sub, ::sub].reshape(-1),
                dys[level][::sub, ::sub].reshape(-1),
                valid.reshape(-1),
            ))
    if dxs is not None:
        return tuple(clouds), tuple(valids), tuple(intens), tuple(Js)
    return tuple(clouds), tuple(valids), tuple(intens)


@partial(jax.jit, static_argnames=("levels",))
def rebuild_cloud_state(pyr, disp, R_cak, t_cak, cam_params, levels=3):
    """Re-express the dense-tracking reference state relative to a NEW
    actkey (used after keyframe creation/switch: the state produced inside
    the frame step is anchored to the actkey AT DISPATCH TIME)."""
    return _cloud_state(pyr, disp, R_cak, t_cak, cam_params, levels)


# -- fused new-keyframe point spawning ---------------------------------------

SOURCE_PATCH = 16


@partial(
    jax.jit,
    static_argnames=("cam_statics", "levels", "caps", "clearance"),
)
def spawn_points_step(
    pyr,  # tuple of level images (from frontend_step output)
    disp,  # level-0 disparity
    tracked_uv0,  # (T, 2) level-0 positions of gated tracked obs (padded)
    tracked_valid,  # (T,)
    points: PointTable,
    start_indices,  # (levels,) int32 — block starts in the point table
    kf_id,  # device scalar int32
    cam_params,
    cam_statics,
    levels: int = 3,
    caps: tuple = (320, 96, 32),
    clearance: float = 2.0,
    pr_vocab=None,  # (K, 128) BoW vocabulary: fuse place-recognition
    # description into this program (the PR block rides home in the same
    # payload fetch — a separate per-keyframe describe dispatch+fetch was
    # ~25-30 ms of tunnel contention each at reference keyframe cadence)
):
    """Detect corners per level, gate by disparity + clearance from tracked
    observations, back-project to anchored psi, capture 16x16 source patches,
    and write all blocks into the point table — ONE device program per new
    keyframe (parity: addMorePoints, stereo_frontend.cpp:706-823; with
    pr_vocab it also subsumes the describe half of
    placerecognizer.cpp:222-246).

    Returns (new_points_table, one packed host-fetchable payload vector).
    """
    payloads = []
    offs = jnp.asarray(_patch_offsets_int(SOURCE_PATCH))
    from scavislam_tpu.ops.image import binomial3 as _b3

    for l in range(levels):
        cap = caps[l]
        focal, ppx, ppy, baseline = cam_params[l]
        # detection on the smoothed level (same noise-corner guard as the
        # frame step); source patches below stay RAW for ZMSSD sharpness
        uv, score, valid = detect_corners_grid(
            _b3(pyr[l]), 10.0 / 255.0, 3, 3, -(-cap // 9)
        )
        s = jnp.float32(2**l)
        uv0 = (uv + 0.5) * s - 0.5
        dval, dok = nearest_sample(disp, uv0)
        ok = valid & dok & (dval > 0.5)
        # clearance vs tracked obs (quadtree-gated 2px in the reference)
        d2 = jnp.sum(
            (uv0[:, None, :] - tracked_uv0[None, :, :]) ** 2, axis=-1
        )
        d2 = jnp.where(tracked_valid[None, :], d2, jnp.inf)
        min_d2 = jnp.min(d2, axis=-1)
        cl = clearance * s
        ok = ok & (min_d2 > cl * cl)
        # top-cap by score among ok
        rank_score = jnp.where(ok, score, -1.0)
        top_idx = jnp.argsort(-rank_score)[:cap]
        uv_k = uv[top_idx]
        uv0_k = uv0[top_idx]
        d_k = dval[top_idx]
        ok_k = ok[top_idx] & (rank_score[top_idx] > 0)

        # psi in the new keyframe frame; cam_params[l] are already the
        # LEVEL camera's parameters (no extra scaling!)
        d_safe = jnp.where(ok_k, d_k, 1.0)
        z = focal * baseline / d_safe
        x = (uv_k[:, 0] - ppx) / focal * z
        y = (uv_k[:, 1] - ppy) / focal * z
        psi = jnp.stack([x / z, y / z, 1.0 / z], axis=-1)

        coords = uv_k[:, None, :] + offs[None, :, :]
        pvals, p_ok = bilinear_sample(pyr[l], coords)
        ok_k = ok_k & jnp.all(p_ok, axis=-1)
        patches = pvals.reshape(-1, SOURCE_PATCH, SOURCE_PATCH)

        uvu0 = jnp.stack(
            [uv0_k[:, 0], uv0_k[:, 1], uv0_k[:, 0] - d_k], axis=-1
        )
        points = points.insert_block(
            start_indices[l], psi, kf_id,
            jnp.full((cap,), l, jnp.int32), patches, uv0_k, ok_k,
        )
        payloads.append(
            jnp.concatenate(
                [psi.reshape(-1), uvu0.reshape(-1), ok_k.astype(jnp.float32)]
            )
        )
    if pr_vocab is not None:
        from scavislam_tpu.ops.descriptors import bow_describe

        payloads.append(bow_describe(
            pyr[0], disp, pr_vocab, cam_params[0], mono=False).reshape(-1))
    # ONE packed payload array (per-level fetches each cost a link round-trip)
    return points, jnp.concatenate(payloads)


@partial(
    jax.jit,
    static_argnames=("cam_statics", "levels", "caps", "clearance",
                     "tracked_cap"),
)
def spawn_points_step_packed(
    pyr, disp, packed, points: PointTable, cam_params, cam_statics,
    levels: int = 3, caps: tuple = (320, 96, 32), clearance: float = 2.0,
    tracked_cap: int = 1024, pr_vocab=None,
):
    """spawn_points_step behind ONE host->device upload: `packed` carries
    [tracked_uv0.ravel() (2T) | tracked_valid (T) | start_indices (levels) |
    kf_id] as a single f32 vector. The unpacked form shipped 4 separate
    arrays per keyframe spawn — 4 upload dispatches over the tunnel, a
    measured chunk of the 20-60 ms keyframe-drop spikes in the pipelined
    frame loop."""
    T = tracked_cap
    uv0 = packed[: 2 * T].reshape(T, 2)
    t_val = packed[2 * T: 3 * T] > 0.5
    starts = packed[3 * T: 3 * T + levels].astype(jnp.int32)
    kf_id = packed[3 * T + levels].astype(jnp.int32)
    return spawn_points_step(
        pyr, disp, uv0, t_val, points, starts, kf_id, cam_params,
        cam_statics, levels, caps, clearance, pr_vocab,
    )
