"""Loop-closure precision/recall at the REFERENCE operating point.

Runs the full place-recognition pipeline (describe -> TF-IDF retrieval at
score_thr=2.0 -> 3-point RANSAC geometric check at >30 inliers — the
reference's acceptance rules, /root/reference/scavislam/placerecognizer.cpp
:174-202,316) over long revisit trajectories and scores detections against
ground truth, with the SHIPPED trained vocabulary (which was trained on
scenes disjoint from both evaluation scenes — held-out by construction).

Ground-truth positive for frame pair (i, j): camera optical axes within
30 degrees AND camera centers within 1.0 m AND temporal separation beyond
the exclusion horizon. A detection is CORRECT if its partner is a
ground-truth positive; recall counts query frames that have at least one
ground-truth revisit partner and fired a correct detection.

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
from scavislam_tpu.models.placerec import (PlaceRecognizer,
                                           default_vocabulary,
                                           random_vocabulary)

CAM = StereoCamera.create(389.96, (254.9, 201.9), (512, 384), 0.12)
# Keyframes adjacent in time stand in for the covisible neighborhood that
# the backend excludes in a real run. 10 frames > the 45-deg GT window at
# spin rate (5.7 deg/frame), so every pair beyond the horizon that meets the
# GT criterion is a genuine loop, not a temporal neighbor.
EXCLUDE_HORIZON = 10


def gt_positive(Ti, Tj):
    """True revisit: optical axes within 45 deg (the 512x384/f=390 camera
    has ~66 deg horizontal FOV, so 45 deg separation still shares >20 deg
    of view) and centers within 1.0 m."""
    Rwi, twi = Ti.inverse().R, Ti.inverse().t
    Rwj, twj = Tj.inverse().R, Tj.inverse().t
    zi = np.asarray(Rwi)[:, 2]
    zj = np.asarray(Rwj)[:, 2]
    ang = np.degrees(np.arccos(np.clip(np.dot(zi, zj), -1, 1)))
    dist = np.linalg.norm(np.asarray(twi) - np.asarray(twj))
    return ang < 45.0 and dist < 1.0


def run_scenario(name, planes, kind, n_frames, step, vocab):
    seq = SyntheticSequence(CAM, n_frames=n_frames, kind=kind,
                            planes=planes, step=step)
    pr = PlaceRecognizer(CAM, vocabulary=vocab)  # reference thresholds
    geo_checks = [0]
    inner_check = pr._geometric_check

    def counting_check(q, c):
        geo_checks[0] += 1
        return inner_check(q, c)

    pr._geometric_check = counting_check
    detections = []  # (query, loop)
    for i, fr in enumerate(seq):
        exclude = set(range(max(0, i - EXCLUDE_HORIZON), i + 1))
        loop = pr.add_location({
            "kf_id": i, "img": fr["left"], "disp": fr["disp_gt"],
            "exclude": exclude,
        })
        if loop is not None:
            detections.append((loop.query_id, loop.loop_id))

    poses = seq.poses
    # ground-truth revisit pairs outside the exclusion horizon
    has_gt = set()
    gt_pairs = set()
    for i in range(n_frames):
        for j in range(i - EXCLUDE_HORIZON):
            if gt_positive(poses[i], poses[j]):
                gt_pairs.add((i, j))
                has_gt.add(i)

    correct = [d for d in detections if d in gt_pairs]
    fired = {q for q, _ in correct}
    recall = len(fired & has_gt) / max(len(has_gt), 1)
    precision = len(correct) / max(len(detections), 1)
    out = {
        "scenario": name, "frames": n_frames,
        "gt_revisit_frames": len(has_gt),
        "detections": len(detections), "correct": len(correct),
        "geo_checks": geo_checks[0],
        "precision": round(precision, 3), "recall": round(recall, 3),
        "score_thr": pr.score_thr, "min_inliers": pr.min_inliers,
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
                     1.0 / (n - 1), vocab),
        # out-and-back corridor: revisits with partial view overlap
        run_scenario("out_and_back_room", default_room(), "out_and_back", n,
                     0.05, vocab),
        # two full revolutions: every frame in the second lap is a revisit
        run_scenario("double_spin", closed_box(), "spin", n,
                     2.0 / (n - 1), vocab),
    ]
    # a weak --vocab candidate can yield zero detections everywhere; guard
    # the mean so the JSON stays valid (np.mean([]) would emit NaN)
    ps = [r["precision"] for r in res if r["detections"]]
    agg_p = np.mean(ps) if ps else 0.0
    agg_r = np.mean([r["recall"] for r in res])
    print(json.dumps({
        "metric": "loop_recall_at_reference_thresholds",
        "vocabulary": ("random" if args.random_vocab
                       else args.vocab if args.vocab
                       else f"trained-{len(vocab)}"),
        "mean_precision": round(float(agg_p), 3),
        "mean_recall": round(float(agg_r), 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
