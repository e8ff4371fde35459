"""Monocular loop closure: Sim3 constraints + scale-drift-aware correction.

Completes the mono mode's backend story (the part the reference scaffolds
behind MONO and never ships: Sim3Model RANSAC ransac_models.cpp:85-136, Sim3
g2o vertices/edges anchored_points.h:180-218): given two keyframes whose
filtered maps overlap, estimate the 7-DoF Sim3 constraint between them from
patch-matched converged points, then distribute the accumulated scale/pose
drift over the keyframe chain with the Sim3 pose graph
(models.sim3_graph.optimize_sim3_pose_graph) and re-gauge every anchored
inverse depth to the corrected poses.

Device work: all-pairs ZMSSD patch scoring is one MXU matmul; the Sim3
RANSAC is the vmapped hypothesis sweep in ops.ransac. Host work: edge
assembly and pose write-back (scalar, numpy).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from scavislam_tpu.core.lie import Sim3, umeyama_sim3
from scavislam_tpu.models.map_store import MAX_POINTS
from scavislam_tpu.models.sim3_graph import optimize_sim3_pose_graph
from scavislam_tpu.ops.ransac import ransac_sim3

MATCH_CAP = 256  # padded correspondence capacity per loop check


@jax.jit
def _zmssd_all_pairs(pa, pb, va, vb):
    """All-pairs zero-mean SSD between two patch stacks (Na,16,16) x
    (Nb,16,16): one |a|^2 + |b|^2 - 2ab^T MXU matmul. Returns (Na, Nb)."""
    a = pa.reshape(pa.shape[0], -1)
    b = pb.reshape(pb.shape[0], -1)
    a = a - jnp.mean(a, axis=-1, keepdims=True)
    b = b - jnp.mean(b, axis=-1, keepdims=True)
    s = (
        jnp.sum(a * a, -1)[:, None] + jnp.sum(b * b, -1)[None, :]
        - 2.0 * (a @ b.T)
    )
    return jnp.where(va[:, None] & vb[None, :], s, jnp.inf)


def _kf_points_padded(fe, kf_id, cap=MATCH_CAP):
    """Converged anchored points of a keyframe, PADDED to a fixed capacity
    (every device gather below keeps one shape — a per-length gather would
    recompile on every loop check). Returns (ids (cap,), valid (cap,))."""
    ids = np.asarray(fe.kf_point_ids.get(kf_id, np.zeros(0, np.int64)))
    ids = ids[fe._meta_anchor[np.clip(ids, 0, MAX_POINTS - 1)] == kf_id]
    ids_pad = np.zeros(cap, np.int64)
    val = np.zeros(cap, bool)
    n = min(len(ids), cap)
    ids_pad[:n] = ids[:n]
    val[:n] = True
    lam_qq = np.asarray(fe.Lam[jnp.asarray(ids_pad)][:, 2, 2])
    val &= lam_qq > fe.conv_q_info
    return ids_pad, val


def match_keyframes(fe, kf_a: int, kf_b: int, zmssd_thr: float = 0.18,
                    ratio: float = 0.8):
    """Mutual-best ZMSSD patch matching between the converged anchored
    points of two keyframes. Returns (ids_a, ids_b) correspondence arrays
    (host numpy; the scoring matrix is one fixed-shape device program)."""
    ids_a, va = _kf_points_padded(fe, kf_a)
    ids_b, vb = _kf_points_padded(fe, kf_b)
    if va.sum() < 3 or vb.sum() < 3:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    pa = fe.points.patch[jnp.asarray(ids_a)]
    pb = fe.points.patch[jnp.asarray(ids_b)]
    score = np.asarray(_zmssd_all_pairs(
        pa, pb, jnp.asarray(va), jnp.asarray(vb)))
    best_b = score.argmin(1)
    best_s = score.min(1)
    second = np.partition(score, 1, axis=1)[:, 1]
    mutual = score.argmin(0)[best_b] == np.arange(len(ids_a))
    # per-pixel ZMSSD threshold (patches are 16x16 in [0,1])
    keep = (va & mutual & np.isfinite(best_s)
            & (best_s < zmssd_thr * 256) & (best_s < ratio * second))
    return ids_a[keep], ids_b[best_b[keep]]


def _anchored_xyz_padded(fe, ids):
    """Anchor-frame xyz for `ids`, zero-padded to MATCH_CAP (fixed-shape
    device gather)."""
    ids_pad = np.zeros(MATCH_CAP, np.int64)
    n = min(len(ids), MATCH_CAP)
    ids_pad[:n] = ids[:n]
    psi = np.asarray(fe.points.psi[jnp.asarray(ids_pad)])
    q = np.maximum(psi[:, 2:3], 1e-9)
    return np.concatenate([psi[:, :2] / q, 1.0 / q], axis=1), n


def estimate_sim3(fe, kf_a: int, kf_b: int, inlier_thr: float = 1.5,
                  min_inliers: int = 12, seed: int = 0):
    """Sim3 S_a_from_b between two keyframes from matched converged points
    (anchor-frame 3-D on both sides): vmapped 3-point RANSAC, then a
    closed-form Umeyama refit over ALL inliers (3-point hypotheses alone
    leave ~2x the residual — measured). Returns (Sim3, n_inliers) or
    (None, n) when the geometric check fails — the mono analogue of the
    reference's >30-inlier SE3 acceptance (placerecognizer.cpp:174-202),
    with the scale dof mono needs. inlier_thr is in PIXELS; the default is
    tighter than the stereo path's 3.0 because wrong-but-nearby matches on
    textured surfaces reproject within 3 px at typical mono depths."""
    ids_a, ids_b = match_keyframes(fe, kf_a, kf_b)
    if len(ids_a) < max(3, min_inliers // 2):
        return None, 0
    xa, n = _anchored_xyz_padded(fe, ids_a)
    xb, _ = _anchored_xyz_padded(fe, ids_b)
    valid = np.zeros(MATCH_CAP, bool)
    valid[:n] = True
    cam0 = fe.cams[0]
    s, R, t, inl, cnt = ransac_sim3(
        jax.random.PRNGKey(seed), jnp.asarray(xb, jnp.float32),
        jnp.asarray(xa, jnp.float32), jnp.asarray(valid),
        (cam0.focal, cam0.pp[0], cam0.pp[1], cam0.baseline),
        inlier_thr=inlier_thr,
    )
    cnt = int(cnt)
    if cnt < min_inliers:
        return None, cnt
    keep = np.asarray(inl) & valid
    s_r, R_r, t_r = umeyama_sim3(xb[keep], xa[keep])
    return Sim3(jnp.asarray(R_r), jnp.asarray(t_r), jnp.float32(s_r)), cnt


def close_loop_sim3(fe, kf_query: int, kf_loop: int, S_q_from_l: Sim3,
                    iters: int = 12):
    """Distribute the loop residual over the keyframe chain and re-gauge.

    Graph: one Sim3 node per keyframe (node-from-world, scale 1 from VO),
    consecutive-keyframe odometry edges from the CURRENT poses, plus the
    measured loop edge. Node 0 is the gauge. Write-back per keyframe k with
    corrected (R*, t*, s*): T_kw <- SE3(R*, t*/s*) and every psi anchored at
    k re-gauges q <- q * s* (x_k_new = x_k_old / s*: same world point,
    anchor frame re-scaled — the mono analogue of the reference teleporting
    the loop vertex into the query's metric frame, slam_graph.cpp:207-251).

    Returns {kf_id: scale} of the applied per-keyframe re-gauges."""
    if hasattr(fe, "invalidate_pending_ba"):
        # a re-gauge makes any in-flight window solve inapplicable
        fe.invalidate_pending_ba()
    kf_ids = sorted(fe.pose_np.keys())
    n = len(kf_ids)
    idx = {k: i for i, k in enumerate(kf_ids)}
    nodes = Sim3(
        jnp.asarray(np.stack([fe.pose_np[k][0] for k in kf_ids])),
        jnp.asarray(np.stack([fe.pose_np[k][1] for k in kf_ids])),
        jnp.ones((n,), jnp.float32),
    )
    ei, ej, eR, et, es = [], [], [], [], []
    for a, b in zip(kf_ids[:-1], kf_ids[1:]):
        Ra, ta = fe.pose_np[a]
        Rb, tb = fe.pose_np[b]
        # S_a_from_b = S_aw S_bw^-1 at unit scales
        R_ab = Ra @ Rb.T
        t_ab = ta - R_ab @ tb
        ei.append(idx[a])
        ej.append(idx[b])
        eR.append(R_ab)
        et.append(t_ab)
        es.append(1.0)
    ei.append(idx[kf_query])
    ej.append(idx[kf_loop])
    eR.append(np.asarray(S_q_from_l.R))
    et.append(np.asarray(S_q_from_l.t))
    es.append(float(S_q_from_l.s))
    edges = Sim3(
        jnp.asarray(np.stack(eR), jnp.float32),
        jnp.asarray(np.stack(et), jnp.float32),
        jnp.asarray(np.asarray(es), jnp.float32),
    )
    out, hist = optimize_sim3_pose_graph(
        nodes, jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
        edges, jnp.ones(len(ei), bool), iters=iters,
    )
    Rs = np.asarray(out.R)
    ts = np.asarray(out.t)
    ss = np.asarray(out.s)

    # the query keyframe's correction, captured BEFORE write-back: the
    # tracking chain rebases through it (current frame = query-relative)
    Rq_old, tq_old = fe.pose_np[kf_query]
    R_cq = fe._R_cw @ Rq_old.T
    t_cq = fe._t_cw - R_cq @ tq_old

    scales = {}
    new_R = np.zeros((n, 3, 3), np.float32)
    new_t = np.zeros((n, 3), np.float32)
    for k in kf_ids:
        i = idx[k]
        s = float(ss[i])
        R = Rs[i].astype(np.float32)
        t = (ts[i] / s).astype(np.float32)
        fe.pose_np[k] = (R, t)
        new_R[i] = R
        new_t[i] = t
        scales[k] = s
    # ONE device scatter for all keyframe poses
    fe.poses = fe.poses.set_many(
        jnp.asarray(np.asarray(kf_ids, np.int32)),
        jnp.asarray(new_R), jnp.asarray(new_t),
    )
    # re-gauge anchored depths: q <- q * s_anchor (one whole-table program)
    s_per_point = np.ones(MAX_POINTS, np.float32)
    for k, s in scales.items():
        s_per_point[fe._meta_anchor == k] = s
    fe.points = fe.points._replace(
        psi=_regauge_psi(fe.points.psi, jnp.asarray(s_per_point)))
    # the tracking chain continues from the corrected world pose: keep the
    # current frame's query-relative delta and chain it through the
    # CORRECTED query pose (T_cw = T_cq @ T_qw_new)
    Rq_new, tq_new = fe.pose_np[kf_query]
    fe._R_cw = (R_cq @ Rq_new).astype(np.float32)
    fe._t_cw = (R_cq @ tq_new + t_cq).astype(np.float32)
    fe._dev_R_cw = None
    fe._dev_t_cw = None
    return scales


@jax.jit
def _regauge_psi(psi, s_per_point):
    return psi * jnp.stack(
        [jnp.ones_like(s_per_point), jnp.ones_like(s_per_point),
         s_per_point], axis=-1)


# --------------------------------------------------------------------- #
# automatic loop DETECTION for mono: BoW retrieval + Sim3 verification
# --------------------------------------------------------------------- #


@dataclass
class MonoDetectedLoop:
    """The mono analogue of DetectedLoop: the constraint is a Sim3 (scale
    dof included), not an SE3."""

    query_id: int
    loop_id: int
    S_query_from_loop: Sim3
    inliers: int


def make_mono_place_recognizer(fe, vocabulary=None, score_thr=None,
                               min_inliers: int = 12):
    """BoW loop detection for the mono frontend: the stereo PlaceRecognizer's
    retrieval path (corner descriptors -> word quantization -> TF-IDF over
    the inverted index with covis exclusion, placerecognizer.cpp:130-172,
    249-298) indexes keyframe images WITHOUT depth (describe(disp=None));
    the geometric check is the mono Sim3 verification over the keyframes'
    FILTERED maps (estimate_sim3) instead of the 3-point SE3 check — mono
    loop constraints need the scale dof.

    Returns a PlaceRecognizer subclass instance; feed it
    ``add_location({"kf_id": k, "img": level0_image, "disp": None,
    "exclude": covis_ids})`` per keyframe and consume detected loops from
    its monitor or the return value, then apply close_loop_sim3."""
    from scavislam_tpu.models.placerec import SCORE_THR, PlaceRecognizer

    class _MonoPlaceRecognizer(PlaceRecognizer):
        def _geometric_check(self, query, cand):
            S, n_inl = estimate_sim3(self.fe, query.kf_id, cand.kf_id,
                                     min_inliers=self.min_inliers)
            if S is None:
                return None
            return MonoDetectedLoop(query.kf_id, cand.kf_id, S, n_inl)

    pr = _MonoPlaceRecognizer(
        fe.cam, vocabulary,
        score_thr=SCORE_THR if score_thr is None else score_thr,
        min_inliers=min_inliers,
    )
    pr.fe = fe
    return pr


def add_keyframe_to_recognizer(pr, fe, kf_id: int, img):
    """Index a mono keyframe and return a MonoDetectedLoop if retrieval +
    Sim3 verification fire (excludes the keyframe's covisible neighborhood,
    like the reference's exclude_set, placerecognizer.cpp:249-298)."""
    exclude = set(fe.covis.get(kf_id, {})) | {kf_id}
    return pr.add_location(
        {"kf_id": kf_id, "img": img, "disp": None, "exclude": exclude})
