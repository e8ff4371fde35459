"""Synthetic stereo sequence renderer with exact ground truth.

The reference validates end-to-end on the New College dataset by eyeball
(/root/reference/README:181-197); that dataset is not available here, so this
module renders photometrically-consistent stereo sequences from an analytic
scene (textured planes) with EXACT ground-truth poses and disparity. Used by
unit/integration tests and by bench.py.

Scene model: a "room" of 3 textured planes (back wall, floor, side wall).
For each pixel we ray-cast against all planes, take the nearest positive hit,
and evaluate a smooth procedural texture at the hit point. Left/right images
are rendered from the two rectified stereo viewpoints, so stereo geometry and
photometric constancy are exact by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3


class Plane(NamedTuple):
    normal: jnp.ndarray  # (3,) unit, world frame
    offset: jnp.ndarray  # scalar: points x with n.x = offset
    tex_u: jnp.ndarray  # (3,) texture axis 1
    tex_v: jnp.ndarray  # (3,) texture axis 2
    tex_phase: jnp.ndarray  # scalar, decorrelates textures across planes


def default_room() -> list[Plane]:
    """Back wall at z=6, floor at y=1.5, right wall at x=4 (world frame;
    camera starts at origin looking down +z)."""
    f32 = jnp.float32
    return [
        Plane(
            jnp.array([0.0, 0.0, 1.0], f32),
            jnp.array(6.0, f32),
            jnp.array([1.0, 0.0, 0.0], f32),
            jnp.array([0.0, 1.0, 0.0], f32),
            jnp.array(0.0, f32),
        ),
        Plane(
            jnp.array([0.0, 1.0, 0.0], f32),
            jnp.array(1.5, f32),
            jnp.array([1.0, 0.0, 0.0], f32),
            jnp.array([0.0, 0.0, 1.0], f32),
            jnp.array(11.0, f32),
        ),
        Plane(
            jnp.array([1.0, 0.0, 0.0], f32),
            jnp.array(4.0, f32),
            jnp.array([0.0, 0.0, 1.0], f32),
            jnp.array([0.0, 1.0, 0.0], f32),
            jnp.array(23.0, f32),
        ),
    ]


def closed_box() -> list[Plane]:
    """A fully closed textured box around the origin — every viewing
    direction hits scenery, enabling 360-degree (spin / orbit) trajectories
    for loop-closure workloads."""
    f32 = jnp.float32

    def plane(n, off, tu, tv, ph):
        return Plane(jnp.array(n, f32), jnp.array(off, f32),
                     jnp.array(tu, f32), jnp.array(tv, f32),
                     jnp.array(ph, f32))

    return [
        plane([0, 0, 1], 6.0, [1, 0, 0], [0, 1, 0], 0.0),    # front wall
        plane([0, 0, -1], 6.0, [1, 0, 0], [0, 1, 0], 7.0),   # back wall
        plane([1, 0, 0], 5.0, [0, 0, 1], [0, 1, 0], 23.0),   # right wall
        plane([-1, 0, 0], 5.0, [0, 0, 1], [0, 1, 0], 31.0),  # left wall
        plane([0, 1, 0], 1.8, [1, 0, 0], [0, 0, 1], 11.0),   # floor
        plane([0, -1, 0], 1.8, [1, 0, 0], [0, 0, 1], 17.0),  # ceiling
    ]


def varied_box(seed: int) -> list[Plane]:
    """A closed box with per-plane texture phases drawn from ``seed`` —
    distinct scene appearance per seed. Used to build the vocabulary-training
    corpus (scenes disjoint from the benchmark scenes default_room /
    closed_box) and for robustness sweeps."""
    f32 = jnp.float32
    rng = np.random.RandomState(seed)
    return [
        Plane(p.normal, p.offset, p.tex_u, p.tex_v,
              jnp.array(float(rng.uniform(0, 100)), f32))
        for p in closed_box()
    ]


class Box(NamedTuple):
    """Free-standing axis-aligned textured box (true interior occlusion
    boundaries: its silhouette writes depth discontinuities INSIDE the
    image, which textured planes alone never produce — the gap called out
    by the reference's real-imagery validation workload,
    /root/reference/README:181-197)."""

    lo: jnp.ndarray  # (3,) min corner, world frame
    hi: jnp.ndarray  # (3,) max corner
    tex_phase: jnp.ndarray


class Sphere(NamedTuple):
    """Free-standing textured sphere (curved occlusion boundary + smoothly
    varying depth — exercises the matcher's depth-ratio gate and the dense
    tracker's clamp at depth edges)."""

    center: jnp.ndarray  # (3,)
    radius: jnp.ndarray  # scalar
    tex_phase: jnp.ndarray


def cluttered_room(seed: int = 0, n_boxes: int = 3,
                   n_spheres: int = 2) -> list:
    """default_room plus free-standing boxes and spheres at distinct depths
    in front of the camera: renders contain interior occlusion boundaries,
    depth discontinuities, and background-revealing parallax. Placement is
    drawn from ``seed`` but kept inside the forward-arc viewing frustum and
    clear of the camera path (z >= 1.6, the trajectory advances ~1 m)."""
    f32 = jnp.float32
    rng = np.random.RandomState(seed + 101)
    prims: list = list(default_room())
    for k in range(n_boxes):
        cx = float(rng.uniform(-1.6, 2.2))
        cy = float(rng.uniform(-0.4, 1.0))
        cz = float(rng.uniform(1.8, 4.6))
        s = rng.uniform(0.18, 0.45, size=3)
        prims.append(Box(
            jnp.array([cx - s[0], cy - s[1], cz - s[2]], f32),
            jnp.array([cx + s[0], cy + s[1], cz + s[2]], f32),
            jnp.array(float(rng.uniform(40, 80)), f32),
        ))
    for k in range(n_spheres):
        cx = float(rng.uniform(-1.2, 2.0))
        cy = float(rng.uniform(-0.3, 0.9))
        cz = float(rng.uniform(1.6, 4.2))
        prims.append(Sphere(
            jnp.array([cx, cy, cz], f32),
            jnp.array(float(rng.uniform(0.18, 0.4)), f32),
            jnp.array(float(rng.uniform(40, 80)), f32),
        ))
    return prims


# skew texture-projection axes for curved/boxed primitives: no face or
# viewing direction is degenerate under either projection
_TEX_A1 = np.array([0.90, 0.45, 0.20], np.float32)
_TEX_A2 = np.array([0.20, 0.80, -0.55], np.float32)


def _intersect_box(origin_w, dirs_w, box: Box):
    """Slab-method ray/AABB: returns entry t (inf on miss)."""
    d = jnp.where(jnp.abs(dirs_w) < 1e-9, 1e-9, dirs_w)
    t1 = (box.lo - origin_w) / d
    t2 = (box.hi - origin_w) / d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tmax >= tmin) & (tmin > 0.1)
    return jnp.where(hit, tmin, jnp.inf)


def _intersect_sphere(origin_w, dirs_w, sp: Sphere):
    """Nearest positive ray/sphere intersection (inf on miss)."""
    oc = origin_w - sp.center
    a = jnp.sum(dirs_w * dirs_w, axis=-1)
    b = 2.0 * jnp.einsum("...i,i->...", dirs_w, oc)
    c = jnp.dot(oc, oc) - sp.radius * sp.radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    t = jnp.where(t0 > 0.1, t0, t1)
    hit = (disc > 0.0) & (t > 0.1)
    return jnp.where(hit, t, jnp.inf)


def _hash_lattice(ix, iy, phase):
    """Pseudo-random value in [0,1) at integer lattice points (sin hash)."""
    h = jnp.sin(ix * 12.9898 + iy * 78.233 + phase * 37.719) * 43758.5453
    return h - jnp.floor(h)


def _value_noise(u, v, phase):
    """Smoothly interpolated lattice noise — genuinely aperiodic, unlike
    cosine gratings, whose self-similarity aliases patch matching and dense
    tracking under rotation."""
    iu = jnp.floor(u)
    iv = jnp.floor(v)
    fu = u - iu
    fv = v - iv
    # smoothstep weights keep the field C1 (bilinear sampling stays clean)
    wu = fu * fu * (3.0 - 2.0 * fu)
    wv = fv * fv * (3.0 - 2.0 * fv)
    n00 = _hash_lattice(iu, iv, phase)
    n01 = _hash_lattice(iu + 1.0, iv, phase)
    n10 = _hash_lattice(iu, iv + 1.0, phase)
    n11 = _hash_lattice(iu + 1.0, iv + 1.0, phase)
    return (
        (n00 * (1 - wu) + n01 * wu) * (1 - wv)
        + (n10 * (1 - wu) + n11 * wu) * wv
    )


def _texture(u, v, phase):
    """Multi-octave value noise in ~[0.05, 0.95]: band-limited (smooth
    interpolation) yet locally distinctive at every scale."""
    val = (
        0.45 * _value_noise(u * 0.7, v * 0.7, phase)
        + 0.30 * _value_noise(u * 1.9 + 31.0, v * 1.9, phase + 1.0)
        + 0.15 * _value_noise(u * 4.3, v * 4.3 + 17.0, phase + 2.0)
        + 0.10 * _value_noise(u * 9.1 + 5.0, v * 9.1, phase + 3.0)
    )
    return 0.08 + 0.84 * val


class Degradation(NamedTuple):
    """Sensor/scene degradation model for robustness evaluation (the
    reference validates on real New College imagery, README:181-197; this
    model injects the real-world effects that imagery has and analytic
    renders lack). All effects are applied INSIDE the jitted render:

    - ``noise_std``: additive per-pixel Gaussian (independent per eye and
      per frame), in [0,1] intensity units (0.04 ~ 10/255).
    - ``exposure_amp`` / ``exposure_period``: global multiplicative gain
      drift 1 + amp*sin(2*pi*i/period) — violates the photometric-constancy
      assumption of dense tracking between frames.
    - ``vignette``: radial intensity falloff (static per eye) — violates
      photometric constancy under ROTATION (pixels traverse the profile).
    - ``occluder_frac``: a textured square of this fraction of image width
      sweeping across the view at ``occluder_depth`` meters — an
      independently moving object; its pixels violate the static-scene
      assumption and must be rejected by the robust losses. Ground-truth
      disparity/depth are updated consistently (both eyes see the occluder
      at its own disparity); ground-truth POSE is not.
    - ``motion_blur``: horizontal directional blur (dominant-yaw apparent
      motion), strength in [0,1] mixing a 5-px box along u — softens the
      corners FAST keys on and the patch detail ZMSSD scores. Applied
      before noise (blur is optical, noise is sensor readout).
    """

    noise_std: float = 0.0
    exposure_amp: float = 0.0
    exposure_period: float = 40.0
    vignette: float = 0.0
    occluder_frac: float = 0.0
    occluder_depth: float = 1.2
    motion_blur: float = 0.0
    seed: int = 0


def _apply_occluder(left, right, disp, depth, i, n_frames, deg: Degradation,
                    cam: StereoCamera):
    w, h = cam.size
    side = deg.occluder_frac * w
    # sweep across the view over the sequence
    prog = jnp.float32(i) / max(n_frames - 1, 1)
    cx = (0.15 + 0.7 * prog) * w
    cy = 0.55 * h
    d_occ = cam.focal * cam.baseline / deg.occluder_depth
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    box_l = (jnp.abs(u - cx) < side / 2) & (jnp.abs(v - cy) < side / 2)
    box_r = (jnp.abs(u - (cx - d_occ)) < side / 2) & (
        jnp.abs(v - cy) < side / 2)
    # the object carries its own texture and moves relative to the scene
    tex_l = _texture(u * 0.12 + prog * 7.0, v * 0.12, jnp.float32(55.0))
    tex_r = _texture((u + d_occ) * 0.12 + prog * 7.0, v * 0.12,
                     jnp.float32(55.0))
    left = jnp.where(box_l, jnp.broadcast_to(tex_l, left.shape), left)
    right = jnp.where(box_r, jnp.broadcast_to(tex_r, right.shape), right)
    disp = jnp.where(box_l, d_occ, disp)
    depth = jnp.where(box_l, deg.occluder_depth, depth)
    return left, right, disp, depth


def _degrade_view(img, i, eye, deg: Degradation, cam: StereoCamera):
    w, h = cam.size
    if deg.motion_blur > 0.0:
        # 5-px horizontal box mixed in at `motion_blur` strength (the
        # wrap-around rows are negligible at image widths)
        box = (img + jnp.roll(img, 1, 1) + jnp.roll(img, -1, 1)
               + jnp.roll(img, 2, 1) + jnp.roll(img, -2, 1)) / 5.0
        img = (1.0 - deg.motion_blur) * img + deg.motion_blur * box
    if deg.vignette > 0.0:
        u = (jnp.arange(w, dtype=jnp.float32) - cam.pp[0]) / (w / 2)
        v = (jnp.arange(h, dtype=jnp.float32) - cam.pp[1]) / (h / 2)
        r2 = u[None, :] ** 2 + v[:, None] ** 2
        img = img * (1.0 - 0.5 * deg.vignette * r2)
    if deg.exposure_amp > 0.0:
        gain = 1.0 + deg.exposure_amp * jnp.sin(
            2.0 * jnp.pi * jnp.float32(i) / deg.exposure_period)
        img = img * gain
    if deg.noise_std > 0.0:
        key = jax.random.fold_in(jax.random.PRNGKey(deg.seed),
                                 jnp.int32(i) * 2 + eye)
        img = img + deg.noise_std * jax.random.normal(key, img.shape,
                                                      jnp.float32)
    return jnp.clip(img, 0.0, 1.0)


def _render_view(planes, T_cw: SE3, cam: StereoCamera, eye_offset: float):
    """Render one view; eye_offset is 0 (left) or baseline (right eye sits at
    +baseline along the camera x-axis)."""
    w, h = cam.size
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    # ray directions in camera frame
    dx = (u - cam.pp[0]) / cam.focal
    dy = (v - cam.pp[1]) / cam.focal
    dirs_c = jnp.stack(
        [jnp.broadcast_to(dx, (h, w)), jnp.broadcast_to(dy, (h, w)),
         jnp.ones((h, w), jnp.float32)],
        axis=-1,
    )
    T_wc = T_cw.inverse()
    origin_c = jnp.array([eye_offset, 0.0, 0.0], jnp.float32)
    origin_w = T_wc.apply(origin_c)
    dirs_w = jnp.einsum("ij,hwj->hwi", T_wc.R, dirs_c)

    best_t = jnp.full((h, w), jnp.inf, jnp.float32)
    img = jnp.zeros((h, w), jnp.float32)
    for p in planes:
        if isinstance(p, Plane):
            denom = jnp.einsum("hwi,i->hw", dirs_w, p.normal)
            denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
            t = (p.offset - jnp.dot(origin_w, p.normal)) / denom
            t = jnp.where(t > 0.1, t, jnp.inf)
            tex_u, tex_v = p.tex_u, p.tex_v
        elif isinstance(p, Box):
            t = _intersect_box(origin_w, dirs_w, p)
            tex_u, tex_v = jnp.asarray(_TEX_A1), jnp.asarray(_TEX_A2)
        else:  # Sphere
            t = _intersect_sphere(origin_w, dirs_w, p)
            tex_u, tex_v = jnp.asarray(_TEX_A1), jnp.asarray(_TEX_A2)
        hit = t < best_t
        t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
        pt = origin_w + t_safe[..., None] * dirs_w
        tu = jnp.einsum("hwi,i->hw", pt, tex_u)
        tv = jnp.einsum("hwi,i->hw", pt, tex_v)
        tex = _texture(tu * 4.0, tv * 4.0, p.tex_phase)
        img = jnp.where(hit, tex, img)
        best_t = jnp.where(hit, t, best_t)

    # depth along camera z = t * dirs_c.z = t (dirs_c z == 1) in the EYE frame
    depth = best_t
    return img, depth


def render_stereo_frame(planes, T_cw: SE3, cam: StereoCamera):
    """Render (left, right, disparity, depth) for camera pose T_cw.

    Disparity is exact: d = f*b/z with z the left-eye depth.
    """
    left, depth = _render_view(planes, T_cw, cam, 0.0)
    right, _ = _render_view(planes, T_cw, cam, float(cam.baseline))
    disp = cam.focal * cam.baseline / depth
    disp = jnp.where(jnp.isfinite(disp), disp, 0.0)
    return left, right, disp, depth


render_stereo_frame_jit = jax.jit(
    render_stereo_frame, static_argnums=()
)


def make_trajectory(
    n_frames: int, kind: str = "forward_arc", step: float = 0.02
) -> list[SE3]:
    """Ground-truth camera poses T_cw (world->camera).

    ``step`` is the per-frame progress along the path (the reference pipeline
    runs at camera rate with small inter-frame motion; dense tracking has a
    limited convergence basin, dense_tracking.cpp relies on the same).
    """
    poses = []
    for i in range(n_frames):
        s = i * step
        if kind == "forward_arc":
            # move forward with a slight lateral arc and yaw
            t_wc = np.array([0.6 * np.sin(s * 1.2), -0.1 * s, 1.8 * s])
            yaw = 0.15 * np.sin(s * 2.0)
        elif kind == "orbit":
            t_wc = np.array([1.2 * np.sin(s * 2.4), 0.0, 1.2 * (1 - np.cos(s * 2.4))])
            yaw = -0.5 * s
        elif kind == "out_and_back":
            # drive forward then return to the start (loop-closure workload)
            total = max((n_frames - 1) * step, 1e-6)
            half = total / 2.0
            p = s / half if s <= half else max(total - s, 0.0) / half
            t_wc = np.array([0.3 * np.sin(p * 1.5), 0.0, 2.2 * p])
            yaw = 0.1 * np.sin(p * 3.0)
        elif kind == "spin":
            # in-place 360-degree yaw rotation (use with the closed_box
            # scene): the revisit of the initial orientation is a pure
            # appearance loop — frames half-way through share NO covisibility
            # with the start.
            t_wc = np.array([0.05 * np.sin(s * 6.28), 0.0,
                             0.05 * (1 - np.cos(s * 6.28))])
            yaw = 2.0 * np.pi * s
        elif kind == "wander":
            # long NON-self-revisiting path inside a closed box:
            # incommensurate Lissajous in x/z plus a slow bounded yaw
            # sweep. Built for the constant-time (DWO) benchmark — 1000+
            # frames spawning 100+ keyframes at reference-like cadence
            # without triggering keyframe switches back to old views
            # (stereo_frontend.cpp:445-510 switches only when a previous
            # keyframe is closer than 0.5*parallax_thr). Yaw rate stays
            # ~0.1 deg/frame at step=0.015 — far inside the pipelined
            # staleness budget.
            # starts at the ORIGIN (s=0 -> t=0): the raw ATE metric assumes
            # estimate and ground truth share the first-frame gauge
            # z amplitude 2.0 keeps the camera >= ~2.3 m from the closed
            # box's back wall over the full phase range (disparity stays
            # inside the default search range)
            t_wc = np.array([
                3.0 * np.sin(0.7 * s),
                0.3 * np.sin(1.1 * s),
                2.0 * (np.sin(0.41 * s + 1.0) - np.sin(1.0)),
            ])
            yaw = 0.6 * np.sin(0.23 * s)
        elif kind == "still":
            t_wc = np.zeros(3)
            yaw = 0.0
        else:
            raise ValueError(kind)
        cy, sy = np.cos(yaw), np.sin(yaw)
        R_wc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=np.float32)
        T_wc = SE3(jnp.asarray(R_wc), jnp.asarray(t_wc, dtype=jnp.float32))
        poses.append(T_wc.inverse())
    return poses


class SyntheticSequence:
    """Iterator over rendered stereo frames with ground truth.

    Mirrors the role of the reference's FileGrabber+FrameGrabber pair for
    tests: each item has left/right float images in [0,1], exact disparity,
    and the ground-truth pose T_cw.
    """

    def __init__(self, cam: StereoCamera, n_frames=30, kind="forward_arc",
                 planes=None, step=0.02, degrade: Degradation = None):
        self.cam = cam
        self.planes = planes if planes is not None else default_room()
        self.poses = make_trajectory(n_frames, kind, step)
        self.degrade = degrade
        n_total = n_frames

        def render(R, t, i):
            left, right, disp, depth = render_stereo_frame(
                self.planes, SE3(R, t), cam)
            d = self.degrade
            if d is not None:
                if d.occluder_frac > 0.0:
                    left, right, disp, depth = _apply_occluder(
                        left, right, disp, depth, i, n_total, d, cam)
                left = _degrade_view(left, i, 0, d, cam)
                right = _degrade_view(right, i, 1, d, cam)
            return left, right, disp, depth

        self._render = jax.jit(render)

    def __len__(self):
        return len(self.poses)

    def frame(self, i):
        T = self.poses[i]
        left, right, disp, depth = self._render(T.R, T.t, jnp.int32(i))
        return {
            "frame_id": i,
            "left": left,
            "right": right,
            "disp_gt": disp,
            "depth_gt": depth,
            "T_cw_gt": T,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self.frame(i)
