"""Map / graph checkpointing.

The reference has NO persistence: its g2o read/write methods are
assert(false) stubs (anchored_points.cpp:61-74, 126-146, 193-205; SURVEY.md
§5 "Checkpoint / resume"). This module adds real map serialization — save and
restore the complete SLAM state (keyframe poses, covisibility edges with
marginalized constraints, anchored points with observations) as a single
compressed .npz — enabling resume, offline relocalization against a prior
map, and reproducible evaluation.
"""

from __future__ import annotations

import json

import numpy as np

from scavislam_tpu.models.slam_graph import GraphEdge, GraphPoint, GraphVertex, SlamGraph


def save_graph(graph: SlamGraph, path: str):
    """Serialize a SlamGraph to .npz (arrays) + embedded JSON (topology)."""
    kf_ids = sorted(graph.vertices)
    R = np.stack([graph.vertices[k].R for k in kf_ids]) if kf_ids else (
        np.zeros((0, 3, 3)))
    t = np.stack([graph.vertices[k].t for k in kf_ids]) if kf_ids else (
        np.zeros((0, 3)))

    pt_ids = sorted(graph.points)
    psi = np.stack([graph.points[p].psi for p in pt_ids]) if pt_ids else (
        np.zeros((0, 3)))
    anchor = np.asarray([graph.points[p].anchor_id for p in pt_ids], np.int64)
    level = np.asarray([graph.points[p].level for p in pt_ids], np.int64)

    # observations: (kf, point, uvu, level)
    obs_kf, obs_pt, obs_uvu, obs_lvl = [], [], [], []
    for k in kf_ids:
        for pid, (uvu, lvl) in graph.vertices[k].feature_table.items():
            obs_kf.append(k)
            obs_pt.append(pid)
            obs_uvu.append(uvu)
            obs_lvl.append(lvl)

    edges = []
    e_R, e_t, e_lam = [], [], []
    for (a, b), e in sorted(graph.edges.items()):
        marg = e.is_marginalized()
        edges.append((a, b, e.strength, e.edge_type, int(marg)))
        if marg:
            e_R.append(e.R_1_from_2)
            e_t.append(e.t_1_from_2)
            e_lam.append(e.Lambda)
        else:
            e_R.append(np.eye(3))
            e_t.append(np.zeros(3))
            e_lam.append(np.zeros((6, 6)))

    meta = {
        "kf_ids": kf_ids,
        "pt_ids": pt_ids,
        "vis_sets": {str(p): sorted(graph.points[p].vis_set) for p in pt_ids},
        "strengths": {
            str(k): graph.vertices[k].neighbor_strengths for k in kf_ids
        },
        "covis_thr": graph.covis_thr,
        "inner_window_size": graph.inner_window_size,
        "double_window_size": graph.double_window_size,
    }
    np.savez_compressed(
        path,
        meta=json.dumps(meta),
        R=R, t=t, psi=psi, anchor=anchor, level=level,
        obs_kf=np.asarray(obs_kf, np.int64),
        obs_pt=np.asarray(obs_pt, np.int64),
        obs_uvu=np.asarray(obs_uvu, np.float64).reshape(-1, 3),
        obs_lvl=np.asarray(obs_lvl, np.int64),
        edges=np.asarray(edges, np.int64).reshape(-1, 5),
        e_R=np.asarray(e_R, np.float64).reshape(-1, 3, 3),
        e_t=np.asarray(e_t, np.float64).reshape(-1, 3),
        e_lam=np.asarray(e_lam, np.float64).reshape(-1, 6, 6),
    )


def load_graph(path: str, cam) -> SlamGraph:
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    g = SlamGraph(
        cam,
        covis_thr=meta["covis_thr"],
        inner_window_size=meta["inner_window_size"],
        double_window_size=meta["double_window_size"],
    )
    for i, k in enumerate(meta["kf_ids"]):
        v = GraphVertex(int(k), z["R"][i].copy(), z["t"][i].copy())
        v.neighbor_strengths = {
            int(a): int(s) for a, s in meta["strengths"][str(k)].items()
        }
        g.vertices[int(k)] = v
    for i, p in enumerate(meta["pt_ids"]):
        g.points[int(p)] = GraphPoint(
            int(p), z["psi"][i].copy(), int(z["anchor"][i]),
            int(z["level"][i]), set(meta["vis_sets"][str(p)]),
        )
    for kf, pt, uvu, lvl in zip(
        z["obs_kf"], z["obs_pt"], z["obs_uvu"], z["obs_lvl"]
    ):
        g.vertices[int(kf)].feature_table[int(pt)] = (uvu.copy(), int(lvl))
    for i, (a, b, s, et, marg) in enumerate(z["edges"]):
        e = GraphEdge(int(a), int(b), int(s), int(et))
        if marg:
            e.R_1_from_2 = z["e_R"][i].copy()
            e.t_1_from_2 = z["e_t"][i].copy()
            e.Lambda = z["e_lam"][i].copy()
        g.edges[(int(a), int(b))] = e
    return g


def save_trajectory_tum(trajectory, path: str):
    """TUM format: timestamp tx ty tz qx qy qz qw (T_wc), the standard
    interchange format for ATE evaluation tools."""
    rows = []
    for fid, T_cw in trajectory:
        T_wc = T_cw.inverse()
        R = np.asarray(T_wc.R, np.float64)
        t = np.asarray(T_wc.t, np.float64)
        q = _quat_from_R(R)
        rows.append([float(fid), *t, q[1], q[2], q[3], q[0]])
    np.savetxt(path, np.asarray(rows), fmt="%.6f")


def _quat_from_R(R):
    """(w, x, y, z) from a rotation matrix (numerically safe branch set)."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        return np.array([
            0.25 * s,
            (R[2, 1] - R[1, 2]) / s,
            (R[0, 2] - R[2, 0]) / s,
            (R[1, 0] - R[0, 1]) / s,
        ])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q
