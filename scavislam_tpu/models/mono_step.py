"""The fused per-frame MONOCULAR frontend step: ONE device program per frame.

The reference scaffolds a monocular mode behind ``#ifdef MONO`` that is never
enabled (README:14-15): Sim3 vertices, uv prediction models
(transformations.h:623-660), and the single-landmark information filter
``filterSingleFeatureOnly`` (pose_optimizer.h:300-422, Strasdat et al. RSS
2010) all exist but no mono frontend ships. This module ENABLES that mode,
TPU-first: the whole per-frame mono pipeline is one XLA program —

    preprocess -> FAST corner buckets (3 levels)
    -> candidate materialization from the device map tables
    -> guided ZMSSD matching (uv observations, no disparity)
    -> robust motion-only BA over uv residuals (converged points carry
       full weight; unconverged candidates enter at a small prior weight so
       the bootstrap frames are constrained by the inverse-depth prior)
    -> batched information-filter depth update of every gated candidate
       (the RSS'10 filter, all landmarks in parallel)
    -> scatter of the filtered psi/Lambda back into the device tables.

Depth/scale semantics: candidates spawn with a prior inverse depth (the
global scale gauge — mono is scale-free, so trajectories are meaningful up
to one similarity transform; evaluate with a Sim3-aligned ATE). Bearing is
pinned by the anchor observation (large Lambda in the first two psi
components); depth information accrues only with parallax, exactly like the
reference's filter.

Host <-> device traffic per frame: one image upload + one candidate-id
vector in; ONE packed f32 vector out (same discipline as frontend_step —
every extra fetch is a full link round-trip on a remote TPU).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.lie import SE3
from scavislam_tpu.models.frontend_step import (
    _extract_bucket_patches,
    _match_one_level,
    _patch_offsets_int,
    level_sections,
)
from scavislam_tpu.models.map_store import PointTable, PoseTable
from scavislam_tpu.models.matcher import qpack_patches
from scavislam_tpu.models.pose_optimizer import (
    filter_points_info,
    motion_only_ba_uv,
)
from scavislam_tpu.ops.fast import detect_corners_grid
from scavislam_tpu.ops.image import bilinear_sample, binomial3, build_pyramid

SOURCE_PATCH = 16

# bearing prior: the anchor observation fixes the first two psi components
# to sub-pixel accuracy; 1e4 px^2-information pins them while depth stays
# free (Lambda_qq starts at 0 = fully unobserved)
BEARING_INFO = 1e4


class MonoStepOut(NamedTuple):
    packed: jnp.ndarray  # THE one host fetch per frame
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    gate: jnp.ndarray  # (C,)
    obs_uv: jnp.ndarray  # (C, 2)
    points: PointTable  # psi updated by the filter
    Lam: jnp.ndarray  # (P, 3, 3) updated information table
    pyr: tuple  # device-resident (spawn program input)


@partial(
    jax.jit,
    static_argnames=("cam_statics", "levels", "max_reproj_err", "zmssd_thr",
                     "prefilter"),
)
def mono_step(
    img,  # (H, W) f32 in [0,1] or uint8
    R_cw_prev, t_cw_prev,  # previous frame's world pose (the motion seed:
    # mono has no dense tracker, so guided matching searches around the
    # previous pose's predictions — search_radius covers camera-rate motion)
    actkey_id,  # device scalar int32
    poses: PoseTable,
    points: PointTable,
    Lam,  # (P, 3, 3) per-point information matrices (filter state)
    cand_ids,  # (C,) int32, -1 padded, packed in per-level sections
    conv_q_info,  # scalar: Lambda_qq above which a point is depth-CONVERGED
    prior_weight,  # scalar: BA weight of unconverged candidates (<< 1)
    cam_params,  # per-level (focal, ppx, ppy) dynamic scalars
    cam_statics,  # per-level (w, h) static
    levels: int = 3,
    max_reproj_err: float = 2.0,
    zmssd_thr: float = 0.18,
    prefilter: bool = True,
) -> MonoStepOut:
    # -- 1. preprocess
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    pyr = build_pyramid(img, levels)

    # -- 2. materialize candidates from the device tables
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
    lam_qq = Lam[safe][:, 2, 2]
    ok = (
        (cand_ids >= 0) & points.valid[safe] & poses.valid[a_idx]
        & (q[:, 0] > 1e-9)
    )

    # -- 3. guided matching per level (uv observations; same per-level
    # section layout as the stereo step)
    C = cand_ids.shape[0]
    caps = level_sections(levels, C)
    sec_off = 0
    obs_secs, matched_secs = [], []
    for l in range(levels):
        focal, ppx, ppy = cam_params[l]
        w_l, h_l = cam_statics[l]
        cells_y = max(h_l // 16, 4)
        cells_x = max(w_l // 16, 4)
        uvb, scoreb, validb = detect_corners_grid(
            binomial3(pyr[l]) if prefilter else pyr[l],
            10.0 / 255.0, cells_y, cells_x, 4,
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
            pyr[l], R_cw_prev, t_cw_prev, xyz_w[sl], R_aw[sl], t_aw[sl],
            sec_patches, lvl_ok,
            buckets_uv, buckets_valid, bucket_patches, bucket_patch_ok,
            None, l, zmssd_thr, 12.0,
            source_patches_q=qpack_patches(sec_patches),
        )
        obs_secs.append(obs_l)
        matched_secs.append(m_l)
    obs_all3 = jnp.concatenate(obs_secs, axis=0)  # (C, 3), third col zero
    obs_uv = obs_all3[:, :2]
    matched_all = jnp.concatenate(matched_secs, axis=0)
    n_matched = jnp.sum(matched_all.astype(jnp.int32))

    # -- 4. robust motion-only BA over uv residuals. Depth-converged points
    # carry full weight; unconverged candidates enter at `prior_weight` so
    # the bootstrap frames (no converged depth yet) stay constrained by the
    # spawn-time inverse-depth prior — the scale gauge of the whole run.
    focal0, ppx0, ppy0 = cam_params[0]
    cam0 = (focal0, ppx0, ppy0)
    converged = lam_qq > conv_q_info
    conf = jnp.where(converged, 1.0, prior_weight)
    weights = (0.25 ** cand_levels.astype(jnp.float32)) * conf * matched_all
    res = motion_only_ba_uv(cam0, SE3(R_cw_prev, t_cw_prev), xyz_w, obs_uv,
                            weights, matched_all, 1.0)
    keep = (
        matched_all & res.inlier_mask
        & (jnp.max(jnp.abs(res.residuals), axis=-1) < max_reproj_err * 2.0)
    )
    res = motion_only_ba_uv(cam0, res.T, xyz_w, obs_uv, weights, keep, 1.0)

    # -- 5. gating (per-level reprojection bound, uv only)
    lvl_scale = (2.0 ** cand_levels).astype(jnp.float32)
    resid = res.residuals
    gate = (
        matched_all & res.inlier_mask
        & (jnp.abs(resid[:, 0]) < max_reproj_err * lvl_scale)
        & (jnp.abs(resid[:, 1]) < max_reproj_err * lvl_scale)
    )
    n_gated = jnp.sum(gate.astype(jnp.int32))
    # Same chain guard as the stereo step (frontend_step.py): a BA below
    # the mono tracking floor (MIN_TRACK_OBS=15, mono_frontend.py) must not
    # move the chained pose — judged on the FINAL per-level reprojection
    # gate, not the BA's own looser inlier set (a stale-candidate frame can
    # pass dozens of confident mismatches into the solve while only a
    # handful survive the gate; the solve is then pulled sideways and every
    # later frame inherits the error). Keeping the previous pose leaves the
    # frame's stats below the floor (the host consume treats it as failed)
    # while the chain stays recoverable.
    ba_ok = (n_matched >= 15) & (n_gated >= 15)
    R_cw = jnp.where(ba_ok, res.T.R, R_cw_prev)
    t_cw = jnp.where(ba_ok, res.T.t, t_cw_prev)
    n_conv_gated = jnp.sum((gate & converged).astype(jnp.int32))

    # -- 6. information-filter depth update of every gated candidate with
    # the refined pose (pose_optimizer.filter_points_info — all landmarks in
    # parallel; parity: filterSingleFeatureOnly, pose_optimizer.h:300-422)
    R_ca = jnp.einsum("ij,nkj->nik", R_cw, R_aw)  # R_cw @ R_aw^T
    t_ca = t_cw[None, :] - jnp.einsum("nij,nj->ni", R_ca, t_aw)
    filt = filter_points_info(
        cam0, R_ca, t_ca, psi, Lam[safe], obs_uv, gate, iters=5
    )
    upd_ids = jnp.where(gate, cand_ids, P_cap)  # OOB rows dropped
    new_psi_tab = points.psi.at[upd_ids].set(filt.psi, mode="drop")
    new_lam = Lam.at[upd_ids].set(filt.Lambda, mode="drop")
    points = points._replace(psi=new_psi_tab)
    lam_qq_new = filt.Lambda[:, 2, 2]

    # -- 7. keyframe-policy statistics (quadrant coverage + track length,
    # stereo_frontend.cpp:512-528; t_norm is in PRIOR-SCALE units)
    w0, h0 = cam_statics[0]
    qx = (obs_uv[:, 0] > w0 / 2).astype(jnp.int32)
    qy = (obs_uv[:, 1] > h0 / 2).astype(jnp.int32)
    quad = qy * 2 + qx
    quad_counts = jnp.sum(
        jax.nn.one_hot(quad, 4, dtype=jnp.int32)
        * gate[:, None].astype(jnp.int32),
        axis=0,
    )
    R_akw = poses.R[actkey_id]
    t_akw = poses.t[actkey_id]
    R_cak = R_cw @ R_akw.T
    t_cak = t_cw - jnp.einsum("ij,j->i", R_cak, t_akw)
    t_norm = jnp.linalg.norm(t_cak)
    own = gate & (a_idx == actkey_id)
    track_len = jnp.linalg.norm(obs_uv - cand_uv0, axis=-1)
    n_own = jnp.maximum(jnp.sum(own.astype(jnp.float32)), 1.0)
    mean_track_len = jnp.sum(jnp.where(own, track_len, 0.0)) / n_own

    packed = jnp.concatenate([
        R_cw.reshape(-1), t_cw,                      # 0:9, 9:12
        R_cak.reshape(-1), t_cak,                    # 12:21, 21:24
        jnp.stack([
            n_matched.astype(jnp.float32),           # 24
            n_gated.astype(jnp.float32),             # 25
            n_conv_gated.astype(jnp.float32),        # 26
            t_norm, mean_track_len, res.chi2,        # 27, 28, 29
        ]),
        quad_counts.astype(jnp.float32),             # 30:34
        gate.astype(jnp.float32),                    # 34:34+C
        matched_all.astype(jnp.float32),             # +C
        obs_uv.reshape(-1),                          # +2C
        lam_qq_new,                                  # +C (post-update info)
    ])
    return MonoStepOut(packed, R_cw, t_cw, gate, obs_uv, points, new_lam, pyr)


@partial(
    jax.jit,
    static_argnames=("cam_statics", "levels", "caps", "clearance"),
)
def spawn_points_mono(
    pyr,  # tuple of level images (from mono_step output)
    tracked_uv0,  # (T, 2) level-0 positions of gated obs (padded)
    tracked_valid,  # (T,)
    points: PointTable,
    Lam,  # (P, 3, 3)
    start_indices,  # (levels,) int32
    kf_id,  # device scalar int32
    prior_q,  # scalar: prior inverse depth (the scale gauge)
    cam_params,
    cam_statics,
    levels: int = 3,
    caps: tuple = (192, 64, 32),
    clearance: float = 2.0,
):
    """Monocular point spawning: corners per level, clearance-gated vs
    tracked observations, psi = (bearing from the pixel, prior inverse
    depth), bearing-pinned Lambda, 16x16 source patches — one device
    program per new keyframe (the mono analogue of spawn_points_step;
    reference candidate creation: addNewPoints under MONO would come from
    the filter, pose_optimizer.h:300-422 — here the filter starts at spawn).
    """
    payloads = []
    offs = jnp.asarray(_patch_offsets_int(SOURCE_PATCH))
    lam_init = jnp.asarray(
        np.diag([BEARING_INFO, BEARING_INFO, 0.0]).astype(np.float32))
    for l in range(levels):
        cap = caps[l]
        focal, ppx, ppy = cam_params[l]
        uv, score, valid = detect_corners_grid(
            binomial3(pyr[l]), 10.0 / 255.0, 3, 3, -(-cap // 9)
        )
        s = jnp.float32(2**l)
        uv0 = (uv + 0.5) * s - 0.5
        ok = valid
        d2 = jnp.sum(
            (uv0[:, None, :] - tracked_uv0[None, :, :]) ** 2, axis=-1
        )
        d2 = jnp.where(tracked_valid[None, :], d2, jnp.inf)
        cl = clearance * s
        ok = ok & (jnp.min(d2, axis=-1) > cl * cl)
        rank_score = jnp.where(ok, score, -1.0)
        top_idx = jnp.argsort(-rank_score)[:cap]
        uv_k = uv[top_idx]
        uv0_k = uv0[top_idx]
        ok_k = ok[top_idx] & (rank_score[top_idx] > 0)

        # psi: bearing from the (level-camera) pixel, depth = the prior
        psi = jnp.stack(
            [(uv_k[:, 0] - ppx) / focal, (uv_k[:, 1] - ppy) / focal,
             jnp.broadcast_to(prior_q, uv_k[:, 0].shape)],
            axis=-1,
        )
        coords = uv_k[:, None, :] + offs[None, :, :]
        pvals, p_ok = bilinear_sample(pyr[l], coords)
        ok_k = ok_k & jnp.all(p_ok, axis=-1)
        patches = pvals.reshape(-1, SOURCE_PATCH, SOURCE_PATCH)

        points = points.insert_block(
            start_indices[l], psi, kf_id,
            jnp.full((cap,), l, jnp.int32), patches, uv0_k, ok_k,
        )
        Lam = jax.lax.dynamic_update_slice(
            Lam, jnp.broadcast_to(lam_init, (cap, 3, 3)),
            (start_indices[l], 0, 0),
        )
        payloads.append(
            jnp.concatenate(
                [psi.reshape(-1), uv0_k.reshape(-1),
                 ok_k.astype(jnp.float32)]
            )
        )
    return points, Lam, jnp.concatenate(payloads)
