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


# --------------------------------------------------------------------- #
# debug image modes (parity: the reference GUI's ui.debug 0-6 selector +
# ui.debug_level, stereo_slam.cpp:267-333)
# --------------------------------------------------------------------- #

DEBUG_MODES = (
    "residual", "cur_pyr", "prev_pyr", "dx", "dy", "right", "color_disp",
)


def _to_img(arr01) -> Image.Image:
    a = np.asarray(arr01, np.float32)
    return Image.fromarray(
        (np.clip(a, 0.0, 1.0) * 255).astype(np.uint8)
    ).convert("RGB")


def disparity_hsv(disp, num_disp=64) -> Image.Image:
    """HSV-mapped disparity like the reference's color_disp view
    (cv::gpu::drawColorDisp / the CPU HSV merge, stereo_frontend.cpp:645-655):
    hue encodes disparity, invalid (<= 0) renders black."""
    d = np.asarray(disp, np.float32)
    h, w = d.shape
    hsv = np.zeros((h, w, 3), np.uint8)
    hsv[..., 0] = np.clip(d * (180.0 / max(num_disp, 1)), 0, 179).astype(
        np.uint8)
    valid = d > 0
    hsv[..., 1] = 255
    hsv[..., 2] = np.where(valid, 255, 0).astype(np.uint8)
    return Image.fromarray(hsv, mode="HSV").convert("RGB")


def residual_image(cam, img_level01, cloud_xyz, intens, valid, R, t,
                   clamp=0.1) -> Image.Image:
    """Photometric-residual visualization of the dense tracker's state
    (parity: GpuTracker::residualImage, gpu/dense_tracking.cu:494-541 — the
    reference colors each tracked pixel green..red by |residual| and blue
    where the point projects out of view). Host-side numpy; debug only."""
    img = np.asarray(img_level01, np.float32)
    h, w = img.shape
    out = np.stack([img, img, img], -1) * 0.5

    X = np.asarray(cloud_xyz, np.float32)
    x_c = X @ np.asarray(R, np.float32).T + np.asarray(t, np.float32)
    z = x_c[:, 2]
    focal = float(cam.focal)
    pp = np.asarray(cam.pp, np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = focal * x_c[:, 0] / z + pp[0]
        v = focal * x_c[:, 1] / z + pp[1]
    ok = (np.asarray(valid, bool) & (z > 1e-6)
          & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1))
    oob = np.asarray(valid, bool) & ~ok

    ui = np.clip(u[ok].astype(np.int32), 0, w - 1)
    vi = np.clip(v[ok].astype(np.int32), 0, h - 1)
    r = np.abs(img[vi, ui] - np.asarray(intens, np.float32)[ok])
    m = np.clip(r / clamp, 0.0, 1.0)
    out[vi, ui] = np.stack([m, 1.0 - m, np.zeros_like(m)], -1)

    # blue: valid points that left the view (the reference's "invalid" color)
    Xo = X[oob]
    if len(Xo):
        uo = np.clip(u[oob], 0, w - 1).astype(np.int32)
        vo = np.clip(v[oob], 0, h - 1).astype(np.int32)
        out[vo, uo] = (0.2, 0.2, 1.0)
    return _to_img(out)


def render_debug_image(mode: int, level: int, frontend, num_disp=64,
                       path=None) -> Image.Image:
    """The reference GUI's 7-way debug view (ui.debug, ui.debug_level).
    Reads the frontend's rolled device state — one fetch per array; a
    debug/inspection path, not the frame loop."""
    pyr = frontend.last_pyr  # tuple of device arrays, set per frame
    lvl = min(level, len(pyr) - 1)
    name = DEBUG_MODES[mode]
    if name == "residual":
        from scavislam_tpu.core.camera import StereoCamera

        focal, ppx, ppy, baseline = (
            float(x) for x in np.asarray(
                frontend._cam_params[lvl], np.float32))
        cam_l = StereoCamera.create(
            focal, (ppx, ppy), frontend._cam_statics[lvl], baseline)
        img = residual_image(
            cam_l, pyr[lvl],
            frontend._prev_clouds[lvl], frontend._prev_intens[lvl],
            frontend._prev_valids[lvl],
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
        )
    elif name == "cur_pyr":
        img = _to_img(pyr[lvl])
    elif name == "prev_pyr":
        prev = getattr(frontend, "prev_pyr", None)
        img = _to_img(prev[lvl] if prev is not None else pyr[lvl])
    elif name == "dx":
        img = _to_img(np.asarray(frontend.last_dx[lvl]) * 2.0 + 0.5)
    elif name == "dy":
        img = _to_img(np.asarray(frontend.last_dy[lvl]) * 2.0 + 0.5)
    elif name == "right":
        arr = np.asarray(frontend.last_right)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        img = _to_img(arr)
    else:  # color_disp
        img = disparity_hsv(frontend.last_disp, num_disp)
    if path:
        img.save(path)
    return img


def render_keyframe_view(frontend, kf_id: int, path=None) -> Image.Image:
    """A chosen keyframe's image with its anchored map points (parity:
    the GUI's ui.show_keyframe pyramid views, stereo_slam.cpp:253-257,
    567-607)."""
    kf = frontend.keyframe_map[kf_id]
    if "pyr" not in kf:
        raise KeyError(
            f"keyframe {kf_id} has no stored image: set "
            "frontend.keep_kf_images = True before the run (retention is "
            "off by default to bound device memory on long runs)")
    img = _to_img(np.asarray(kf["pyr"][0]))
    draw = ImageDraw.Draw(img)
    ids = frontend.kf_point_ids.get(kf_id, np.zeros(0, np.int64))
    if len(ids):
        anchored = ids[frontend._meta_anchor[
            np.clip(ids, 0, len(frontend._meta_anchor) - 1)] == kf_id]
        if len(anchored):
            psi = np.asarray(frontend.points.psi)[anchored]
            focal, ppx, ppy, _ = (
                float(x) for x in np.asarray(
                    frontend._cam_params[0], np.float32))
            # psi is (x/z, y/z, 1/z) in the anchor frame: project directly
            u = focal * psi[:, 0] + ppx
            v = focal * psi[:, 1] + ppy
            for uu, vv in zip(u, v):
                draw.ellipse([uu - 2, vv - 2, uu + 2, vv + 2],
                             outline=(250, 210, 60))
    if path:
        img.save(path)
    return img


# stage palette for the stacked timing plot
_STAGE_COLORS = [
    (96, 146, 222), (222, 146, 96), (120, 200, 120), (200, 120, 200),
    (222, 200, 96), (96, 222, 200), (160, 160, 160), (222, 96, 120),
    (140, 120, 220), (180, 220, 96), (96, 180, 120),
]


def render_timing_plot(per_mon, size=(900, 360), path=None) -> Image.Image:
    """Stacked per-stage timing histogram over frames (parity: the
    reference's live plotter fed by PerformanceMonitor,
    stereo_slam.cpp:155-160,635-637)."""
    img = Image.new("RGB", size, (18, 18, 24))
    draw = ImageDraw.Draw(img)
    hist = per_mon.history
    if not hist:
        if path:
            img.save(path)
        return img
    stages = [n for n in per_mon._names
              if any(h.get(n, 0.0) > 0 for h in hist)]
    w, h = size
    margin = 28
    n = len(hist)
    totals = [sum(f.get(s, 0.0) for s in stages) for f in hist]
    y_max = max(max(totals), 1e-6) * 1.1
    bar_w = max(1, (w - 2 * margin) // max(n, 1))
    for i, f in enumerate(hist):
        x0 = margin + i * bar_w
        if x0 + bar_w > w - margin:
            break
        y = h - margin
        for si, s in enumerate(stages):
            dt = f.get(s, 0.0)
            if dt <= 0:
                continue
            hh = dt / y_max * (h - 2 * margin)
            draw.rectangle([x0, y - hh, x0 + bar_w - 1, y],
                           fill=_STAGE_COLORS[si % len(_STAGE_COLORS)])
            y -= hh
    # legend
    ly = margin // 2
    lx = margin
    for si, s in enumerate(stages):
        draw.rectangle([lx, ly, lx + 8, ly + 8],
                       fill=_STAGE_COLORS[si % len(_STAGE_COLORS)])
        draw.text((lx + 12, ly - 2), s, fill=(220, 220, 220))
        lx += 12 + 7 * len(s) + 14
        if lx > w - 120:
            lx, ly = margin, ly + 14
    draw.text((w - margin - 130, margin // 2),
              f"ymax {y_max*1e3:.1f} ms", fill=(220, 220, 220))
    if path:
        img.save(path)
    return img
