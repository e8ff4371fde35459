"""Headless map / trajectory visualization.

Replacement for the reference's Pangolin GUI (stereo_slam.cpp:124-642: image
pyramids, keyframe views, 3-D map/graph view, timing plot) in a headless
environment: renders the map top-down (x-z plane) to PNG via PIL —
keyframes, covisibility/marginalized edges, map points, the estimated
trajectory, and optionally the ground truth. The per-frame overlay renders
tracked features onto the camera image (the reference's left view with
DrawItems overlays).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw

from scavislam_tpu.models.slam_graph import APPEARANCE, LOCAL, METRIC

EDGE_COLORS = {
    LOCAL: (90, 110, 230),
    METRIC: (80, 200, 120),
    APPEARANCE: (240, 120, 70),
}


def _to_px(xy, bounds, size, margin=30):
    (x0, x1), (z0, z1) = bounds
    w, h = size
    sx = (w - 2 * margin) / max(x1 - x0, 1e-6)
    sz = (h - 2 * margin) / max(z1 - z0, 1e-6)
    s = min(sx, sz)
    return (
        margin + (xy[0] - x0) * s,
        h - margin - (xy[1] - z0) * s,
    )


def render_map_topdown(
    graph, trajectory=None, gt_poses=None, size=(900, 900), path=None
):
    """Top-down (x-z) view of the SLAM graph. Returns a PIL Image;
    writes to `path` if given."""
    img = Image.new("RGB", size, (18, 18, 24))
    draw = ImageDraw.Draw(img)

    # gather world positions
    kf_xy = {}
    for k, v in graph.vertices.items():
        T_wc_t = -v.R.T @ v.t  # camera center in world
        kf_xy[k] = (float(T_wc_t[0]), float(T_wc_t[2]))
    pts = []
    for p in graph.points.values():
        if p.anchor_id in graph.vertices:
            v = graph.vertices[p.anchor_id]
            xyz_a = np.array([p.psi[0] / p.psi[2], p.psi[1] / p.psi[2],
                              1.0 / p.psi[2]])
            xyz_w = v.R.T @ (xyz_a - v.t)
            pts.append((float(xyz_w[0]), float(xyz_w[2])))

    all_xy = list(kf_xy.values()) + pts
    if trajectory:
        for _fid, T in trajectory:
            c = -np.asarray(T.R).T @ np.asarray(T.t)
            all_xy.append((float(c[0]), float(c[2])))
    if not all_xy:
        if path:
            img.save(path)
        return img
    xs = [p[0] for p in all_xy]
    zs = [p[1] for p in all_xy]
    bounds = ((min(xs), max(xs)), (min(zs), max(zs)))

    # map points
    for p in pts:
        x, y = _to_px(p, bounds, size)
        draw.point((x, y), fill=(120, 120, 130))

    # edges
    for (a, b), e in graph.edges.items():
        if a in kf_xy and b in kf_xy:
            pa = _to_px(kf_xy[a], bounds, size)
            pb = _to_px(kf_xy[b], bounds, size)
            color = EDGE_COLORS.get(e.edge_type, (150, 150, 150))
            if e.is_marginalized():
                color = tuple(c // 2 for c in color)
            draw.line([pa, pb], fill=color, width=1)

    # ground truth + estimate trajectories
    if gt_poses:
        pts_gt = []
        for T in gt_poses:
            c = -np.asarray(T.R).T @ np.asarray(T.t)
            pts_gt.append(_to_px((float(c[0]), float(c[2])), bounds, size))
        if len(pts_gt) > 1:
            draw.line(pts_gt, fill=(90, 90, 90), width=2)
    if trajectory:
        pts_est = []
        for _fid, T in trajectory:
            c = -np.asarray(T.R).T @ np.asarray(T.t)
            pts_est.append(_to_px((float(c[0]), float(c[2])), bounds, size))
        if len(pts_est) > 1:
            draw.line(pts_est, fill=(250, 210, 60), width=2)

    # keyframes on top
    for k, xy in kf_xy.items():
        x, y = _to_px(xy, bounds, size)
        draw.ellipse([x - 3, y - 3, x + 3, y + 3], fill=(240, 240, 255))

    if path:
        img.save(path)
    return img


def render_frame_overlay(left_img01, tracked_uv=None, corners_uv=None,
                         path=None):
    """Camera image with tracked features (the reference's left view with
    DrawItems overlays, stereo_slam.cpp:267-333)."""
    arr = (np.clip(np.asarray(left_img01), 0, 1) * 255).astype(np.uint8)
    img = Image.fromarray(arr).convert("RGB")
    draw = ImageDraw.Draw(img)
    if corners_uv is not None:
        for u, v in np.asarray(corners_uv):
            draw.point((float(u), float(v)), fill=(90, 110, 230))
    if tracked_uv is not None:
        for u, v in np.asarray(tracked_uv):
            draw.ellipse([u - 2, v - 2, u + 2, v + 2],
                         outline=(80, 220, 120))
    if path:
        img.save(path)
    return img
