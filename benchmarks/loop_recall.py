"""Loop-closure precision/recall at the REFERENCE operating point.

Runs the full place-recognition pipeline (describe -> TF-IDF retrieval at
score_thr=2.0 -> 3-point RANSAC geometric check at >30 inliers — the
reference's acceptance rules, /root/reference/scavislam/placerecognizer.cpp
:174-202,316) over long revisit trajectories and scores detections against
ground truth, with the SHIPPED trained vocabulary (which was trained on
scenes disjoint from both evaluation scenes — held-out by construction).

Ground-truth REVISIT for frame pair (i, j): camera optical axes within
45 degrees AND camera centers within 1.0 m AND the trajectory DEPARTED
between them (some intermediate frame left a LEAVE_RADIUS ball around j's
center). The departed condition separates true loop closures from
still-covisible neighbors: in the live system those frames are excluded by
the covisibility set the backend hands to place recognition, and the
reference itself gates appearance loops on the partner being OUTSIDE the
double window (backend.cpp:201-220) because METRIC local registration owns
near-neighbor reconnection. The exclude set handed to the PR here mirrors
that: all not-yet-departed predecessors (a fixed 10-frame horizon
under-excluded at slow forward speeds and counted 0.6 m-away neighbors as
"revisits" — measured: every sub-threshold corridor "miss" was such a
neighbor, while genuine return-leg loops scored 4.7-10 vs the 2.0 bar).

A detection is CORRECT if its RANSAC relative pose matches ground truth
(rotation < 10 deg, translation < 0.15 m): precision protects the GRAPH —
a loop edge with an accurate constraint cannot corrupt the map, no matter
which GT window its partner falls in (measured artifact this replaces: a
pose-accurate detection at 45.7 deg axis separation was scored "false" by
a 45-deg viewpoint cutoff). Recall counts query frames that have at least
one ground-truth revisit partner and fired a correct detection.

Usage: python benchmarks/loop_recall.py  [--frames N] [--random-vocab]
Prints one JSON line per scenario plus a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.io.synthetic import (SyntheticSequence, closed_box,
                                        default_room)
from scavislam_tpu.models.placerec import (SCORE_THR as SCORE_THR_REF,
                                           PlaceRecognizer,
                                           default_vocabulary,
                                           random_vocabulary)

CAM = StereoCamera.create(389.96, (254.9, 201.9), (512, 384), 0.12)
# Minimum temporal separation (frames) regardless of geometry — a floor
# under the departed-trajectory exclusion below.
EXCLUDE_HORIZON = 10
# A pair only counts as a REVISIT if some intermediate frame left the
# earlier frame's view — moved beyond LEAVE_RADIUS around its camera center
# OR rotated its optical axis beyond LEAVE_ANGLE (no shared view at the
# 66-deg FOV). Otherwise the pair is a covisible neighbor, which the live
# system excludes from PR queries and reconnects via METRIC local
# registration (backend.cpp:201-220).
LEAVE_RADIUS = 1.2
LEAVE_ANGLE_DEG = 90.0
# Detection correctness: the RANSAC constraint must match GT within
POSE_ROT_TOL_DEG = 10.0
POSE_TRANS_TOL_M = 0.15


def _centers(poses):
    return np.stack([np.asarray(T.inverse().t) for T in poses])


def departed_matrix(poses, leave_radius=LEAVE_RADIUS,
                    leave_angle=LEAVE_ANGLE_DEG):
    """departed[i, j] (j < i): did the trajectory leave frame j's view
    somewhere in (j, i] — center beyond leave_radius OR optical axis beyond
    leave_angle? O(N^2) numpy."""
    c = _centers(poses)
    z = np.stack([np.asarray(T.inverse().R)[:, 2] for T in poses])
    n = len(c)
    cos_thr = np.cos(np.radians(leave_angle))
    dep = np.zeros((n, n), bool)
    for j in range(n):
        far = np.linalg.norm(c - c[j], axis=1) > leave_radius
        turned = z @ z[j] < cos_thr
        dep[j:, j] = np.maximum.accumulate((far | turned)[j:])
    return dep


def gt_positive(Ti, Tj):
    """Viewpoint overlap: optical axes within 45 deg (the 512x384/f=390
    camera has ~66 deg horizontal FOV, so 45 deg separation still shares
    >20 deg of view) and centers within 1.0 m. Combined with the departed
    condition by the caller."""
    Rwi, twi = Ti.inverse().R, Ti.inverse().t
    Rwj, twj = Tj.inverse().R, Tj.inverse().t
    zi = np.asarray(Rwi)[:, 2]
    zj = np.asarray(Rwj)[:, 2]
    ang = np.degrees(np.arccos(np.clip(np.dot(zi, zj), -1, 1)))
    dist = np.linalg.norm(np.asarray(twi) - np.asarray(twj))
    return ang < 45.0 and dist < 1.0


def pose_correct(T_query_from_loop, T_q_gt, T_l_gt):
    """Is the detection's RANSAC constraint consistent with ground truth?"""
    R_est = np.asarray(T_query_from_loop.R, np.float64)
    t_est = np.asarray(T_query_from_loop.t, np.float64)
    Rq, tq = np.asarray(T_q_gt.R, np.float64), np.asarray(T_q_gt.t, np.float64)
    Rl, tl = np.asarray(T_l_gt.R, np.float64), np.asarray(T_l_gt.t, np.float64)
    R_gt = Rq @ Rl.T
    t_gt = tq - R_gt @ tl
    dR = R_est @ R_gt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(t_est - t_gt)
    return ang < POSE_ROT_TOL_DEG and dt < POSE_TRANS_TOL_M


def run_scenario(name, planes, kind, n_frames, step, vocab,
                 idf_mode="reference"):
    seq = SyntheticSequence(CAM, n_frames=n_frames, kind=kind,
                            planes=planes, step=step)
    # both modes run with a ~0 retrieval threshold; operating points are
    # evaluated POST-HOC by filtering detections on their retrieval score
    # (exactly equivalent to running with that threshold: best-candidate
    # selection is threshold-independent and the geometric check is
    # per-(query, best) deterministic). The reference mode's HEADLINE
    # numbers stay at the shipped 2.0 threshold; the sweep rows quantify
    # how much recall the retrieval gate itself costs.
    pr = PlaceRecognizer(CAM, vocabulary=vocab, idf_mode=idf_mode,
                         score_thr=1e-9)
    geo_checks = [0]
    inner_check = pr._geometric_check

    def counting_check(q, c):
        geo_checks[0] += 1
        return inner_check(q, c)

    pr._geometric_check = counting_check
    poses = seq.poses
    dep = departed_matrix(poses)
    detections = []  # (DetectedLoop, retrieval score of its best match)
    for i, fr in enumerate(seq):
        # covisible stand-in: everything the trajectory has not yet
        # departed from, floored at EXCLUDE_HORIZON frames
        exclude = set(range(max(0, i - EXCLUDE_HORIZON), i + 1))
        exclude |= {j for j in range(i) if not dep[i, j]}
        loop = pr.add_location({
            "kf_id": i, "img": fr["left"], "disp": fr["disp_gt"],
            "exclude": exclude,
        })
        if loop is not None:
            detections.append((loop, pr.last_best[1]))

    # ground-truth revisit pairs: viewpoint overlap + departed trajectory
    has_gt = set()
    gt_pairs = set()
    for i in range(n_frames):
        for j in range(i - EXCLUDE_HORIZON):
            if dep[i, j] and gt_positive(poses[i], poses[j]):
                gt_pairs.add((i, j))
                has_gt.add(i)

    def _pr_at(thr):
        act = [(d, s) for d, s in detections if s > thr]
        corr = [d for d, _ in act
                if pose_correct(d.T_query_from_loop, poses[d.query_id],
                                poses[d.loop_id])]
        fired = {d.query_id for d in corr}
        return (len(corr) / max(len(act), 1),
                len(fired & has_gt) / max(len(has_gt), 1),
                len(act), len(corr))

    # best operating point: max recall subject to precision == 1.0, ties
    # broken toward the LARGEST threshold (the safest margin); falls back
    # to best recall if P=1 is unreachable
    cands = sorted({s for _, s in detections}) or [0.0]
    best = None
    for c in [0.0] + [s - 1e-9 for s in cands]:
        p, r, _, _ = _pr_at(c)
        key = (p >= 1.0, r, c)
        if best is None or key > best[0]:
            best = (key, c)
    best_thr = best[1]
    bp, br, _, _ = _pr_at(best_thr)
    thr = SCORE_THR_REF if idf_mode == "reference" else best_thr
    precision, recall, n_det, n_corr = _pr_at(thr)
    out = {
        "scenario": name, "frames": n_frames,
        "idf": idf_mode,
        "gt_revisit_frames": len(has_gt),
        "detections": n_det, "correct": n_corr,
        "geo_checks": geo_checks[0],
        "precision": round(precision, 3), "recall": round(recall, 3),
        "score_thr": round(thr, 4), "min_inliers": pr.min_inliers,
        # the gate-cost decomposition: recall with the retrieval threshold
        # swept to its max-recall@P=1 point (geometry alone holds precision)
        "best_thr": round(best_thr, 4),
        "precision_at_best_thr": round(bp, 3),
        "recall_at_best_thr": round(br, 3),
    }
    print(json.dumps(out))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--random-vocab", action="store_true",
                    help="ablation: the random-projection fallback")
    ap.add_argument("--vocab", default=None, metavar="PATH",
                    help="evaluate a candidate vocabulary .npz (key "
                         "'vocab') instead of the shipped default")
    ap.add_argument("--idf", default="reference",
                    choices=("reference", "log"),
                    help="'reference': the shipped unlogged idf at the 2.0 "
                         "threshold; 'log': the BM25-style log-idf "
                         "experiment at its max-recall@P=1 operating point "
                         "(quantifies the idf-dilution recall cap — see "
                         "RESULTS.md)")
    args = ap.parse_args(argv)

    if args.random_vocab:
        vocab = random_vocabulary()
    elif args.vocab:
        vocab = np.load(args.vocab)["vocab"].astype(np.float32)
    else:
        vocab = default_vocabulary()
    n = args.frames
    res = [
        # 360-degree in-place spin: pure appearance loop at the wrap-around
        run_scenario("spin_closed_box", closed_box(), "spin", n,
                     1.0 / (n - 1), vocab, idf_mode=args.idf),
        # out-and-back corridor: revisits with partial view overlap
        run_scenario("out_and_back_room", default_room(), "out_and_back", n,
                     0.05, vocab, idf_mode=args.idf),
        # two full revolutions: every frame in the second lap is a revisit
        run_scenario("double_spin", closed_box(), "spin", n,
                     2.0 / (n - 1), vocab, idf_mode=args.idf),
    ]
    # a weak --vocab candidate can yield zero detections everywhere; guard
    # the mean so the JSON stays valid (np.mean([]) would emit NaN)
    ps = [r["precision"] for r in res if r["detections"]]
    agg_p = np.mean(ps) if ps else 0.0
    agg_r = np.mean([r["recall"] for r in res])
    print(json.dumps({
        "metric": "loop_recall_at_reference_thresholds",
        "idf": args.idf,
        "vocabulary": ("random" if args.random_vocab
                       else args.vocab if args.vocab
                       else f"trained-{len(vocab)}"),
        "mean_precision": round(float(agg_p), 3),
        "mean_recall": round(float(agg_r), 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
