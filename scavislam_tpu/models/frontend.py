"""Stereo front-end: per-frame tracking, keyframe policy, map-point creation.

Re-implements the reference's StereoFrontend
(/root/reference/scavislam/stereo_frontend.{h,cpp}) as a thin host
orchestrator over ONE fused device program per frame
(models.frontend_step.frontend_step — see its docstring for the stage list
and the host<->device traffic contract) plus one fused program per new
keyframe (spawn_points_step).

Host responsibilities (scalar/set work only):
- candidate-id assembly from covisibility bookkeeping
  (the 3-stage matching of stereo_frontend.cpp:977-1050);
- keyframe switch/drop policy on the step's fetched statistics
  (stereo_frontend.cpp:445-528);
- id allocation, covisibility strengths, AddToOptimizer packets.

Pose/point numpy mirrors are kept host-side so policy never reads device
memory; the device tables remain the single source of truth for compute.
"""

from __future__ import annotations

import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.models.frontend_step import (
    MATCH_SEARCH_RADIUS_PX,
    FrontendStepOut,
    frontend_step,
    level_sections,
    spawn_points_step_packed,
)
from scavislam_tpu.models.map_store import (
    MAX_KEYFRAMES,
    MAX_POINTS,
    PointTable,
    PoseTable,
)
from scavislam_tpu.utils.config import Config


# fixed scatter capacities: padding a scatter is nearly free, and ONE shape
# per site means ONE compile ever (variable-length eager scatters recompiled
# ~3.5 s on every keyframe — it dominated end-to-end fps)
_POSE_SCATTER_CAP = 128
_PSI_SCATTER_CAP = 8192


@jax.jit
def _nb_scatter_packed(R_tab, t_tab, valid_tab, psi_tab, buf):
    """Neighborhood adoption as ONE device program over ONE packed upload:
    pose writeback (R, t, valid — semantics of PoseTable.set_many) and psi
    writeback (semantics of scatter_psi) fused. Layout of `buf` (f32):
    [pose idx (P), R (P*9), t (P*3), psi idx (C), psi (C*3)]; indices are
    integral f32 values (pad sentinel 1<<30 is exactly representable) and
    drop-mode scatters ignore the OOB padding rows."""
    P, C = _POSE_SCATTER_CAP, _PSI_SCATTER_CAP
    o = 0
    pidx = buf[o:o + P].astype(jnp.int32)
    o += P
    Rp = buf[o:o + P * 9].reshape(P, 3, 3)
    o += P * 9
    tp = buf[o:o + P * 3].reshape(P, 3)
    o += P * 3
    cidx = buf[o:o + C].astype(jnp.int32)
    o += C
    vals = buf[o:o + C * 3].reshape(C, 3)
    return (R_tab.at[pidx].set(Rp, mode="drop"),
            t_tab.at[pidx].set(tp, mode="drop"),
            valid_tab.at[pidx].set(True, mode="drop"),
            psi_tab.at[cidx].set(vals, mode="drop"))

# static capacities
CAND_CAP = 768  # candidate points considered per frame (measured live
# candidate counts 420-700 on New College-shaped runs; the reference's
# 3-stage assembly is budget-capped too, stereo_frontend.cpp:977-1065)
NEW_PER_LEVEL = (320, 96, 32)  # new points per keyframe per level
# (reference budget: <=300*4^-l at level 0, stereo_frontend.cpp:743)
TRACKED_CAP = 1024  # padded tracked-obs buffer for clearance tests
MIN_TRACK_OBS = 20  # tracking failure threshold (stereo_frontend.cpp:1053)
# minimum match signal for a rescue spawn (below-floor frame that still
# sees a real fraction of its candidates; a kidnapped frame sees ~0)
RESCUE_MIN_MATCHES = 10


@dataclass
class AddToOptimizer:
    """Frontend -> backend keyframe packet
    (parity: AddToOptimzer [sic], data_structures.h:153-171). Carries the new
    points' full payload plus immutable snapshots of the device tables and
    this keyframe's pyramid for registration / loop-closure re-matching (the
    reference clones the frame, keyframes.h:48-88; jax arrays are immutable
    so a reference IS a snapshot)."""

    kf_id: int
    T_kw: tuple  # numpy (R, t) — device arrays here cost a tunnel fetch
    new_point_ids: np.ndarray
    new_psi: np.ndarray  # (m, 3)
    new_levels: np.ndarray  # (m,)
    new_uvu: np.ndarray  # (m, 3)
    tracked_point_ids: np.ndarray
    tracked_obs: np.ndarray  # (n, 3)
    tracked_levels: np.ndarray
    covis_strengths: dict
    pyr: tuple = None
    disp: object = None
    points_snapshot: object = None
    poses_snapshot: object = None
    # BoW describe block computed inside the fused spawn program (numpy
    # (BOW_KEYPOINTS, BOW_COLS)); when present the place recognizer indexes
    # this keyframe with ZERO device work (ops.descriptors.bow_describe)
    pr_packed: np.ndarray = None


@dataclass
class FrontendDrawData:
    """Minimal draw snapshot (parity surface: StereoFrontendDrawData,
    stereo_frontend.h:41-82)."""

    tracked_uv: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    new_uv: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))


class TrackingFailure(Exception):
    pass


class StereoFrontend:
    """Public surface mirrors stereo_frontend.h:85-128."""

    def __init__(self, cam: StereoCamera, cfg: Config = None):
        self.cfg = cfg or Config()
        self.cam = cam
        self.levels = self.cfg.use_n_levels_in_frontent
        self.cams = [cam.scale_level(l) for l in range(self.levels)]
        self._cam_params = tuple(
            (c.focal, c.pp[0], c.pp[1], c.baseline) for c in self.cams
        )
        self._cam_statics = tuple(c.size for c in self.cams)
        self.tables_version = 0
        self.poses = PoseTable.empty()
        self.points = PointTable.empty()

        self.next_kf = 0
        self.next_point = 0
        self.kf_point_ids: dict[int, np.ndarray] = {}
        self.covis: dict[int, dict[int, int]] = {}
        self.keyframe_map: dict[int, dict] = {}
        # keep each keyframe's device pyramid/disparity in keyframe_map.
        # NOTHING in the SLAM pipeline reads them back — only the debug
        # keyframe view (apps/visualize.render_keyframe_view, parity:
        # stereo_slam.cpp:253-257). Off by default: on a long run they
        # accumulate ~0.5 MB of live device buffers per keyframe forever,
        # the opposite of the DWO bounded-memory story (the apps flip this
        # on when a keyframe view is requested).
        self.keep_kf_images = False
        # when set to a list, process_frame_pipelined appends one
        # (frame_id, dispatch_s, fetch_wait_s, consume_s) tuple per frame —
        # the long-run decay diagnosis surface (benchmarks config 7)
        self.timing_log = None
        self._fetch_wait_s = 0.0
        self.pose_np: dict[int, tuple] = {}  # host mirror of keyframe poses
        self.actkey_id = -1
        self.neighborhood = None
        self.to_optimizer_stack: list[AddToOptimizer] = []
        self.draw_data = FrontendDrawData()

        # host numpy mirrors of point metadata (for policy only)
        self._meta_anchor = np.full(MAX_POINTS, -1, np.int64)
        self._meta_level = np.zeros(MAX_POINTS, np.int64)

        # BoW vocabulary (device (K, 128)): when set (SlamSystem wires it
        # from the PlaceRecognizer), every keyframe spawn also computes the
        # place-recognition describe block inside the fused spawn program
        # and ships it home in the spawn payload — the PR thread then does
        # zero per-keyframe device work
        self.pr_vocab = None

        # dense-cloud density (per-level extra stride; StreamPool swaps in
        # the batched reference-CPU-parity density, frontend_step.py)
        from scavislam_tpu.models.frontend_step import DENSE_SUBS

        self.dense_subs = DENSE_SUBS
        # dense-tracking sampler: "qpack" (exact f32 scalar gathers, the
        # default) or "matmul" (MXU bilinear, bf16 — the batched-mode
        # sampler; measured ~2x faster per stream on TPU, see
        # dense_tracker._sample_matmul). Single-stream keeps qpack unless
        # a run opts in.
        self.dense_sample = "qpack"

        # rolling per-frame state (device + small host scalars)
        self._prev_clouds = None
        self._prev_intens = None
        self._prev_valids = None
        self._prev_J = None
        self._R_cak = np.eye(3, dtype=np.float32)
        self._t_cak = np.zeros(3, np.float32)
        self._R_cw = np.eye(3, dtype=np.float32)
        self._t_cw = np.zeros(3, np.float32)
        self._num_disp = 16 * self.cfg.ui.num_disp16
        from scavislam_tpu.ops.rectify import Rectifier

        self._rectifier = Rectifier(cam, self.cfg)
        self.frame_id = -1

        self._tracked_ids = np.zeros((0,), np.int64)
        self._tracked_obs = np.zeros((0, 3), np.float32)
        self._tracked_levels = np.zeros((0,), np.int64)
        self.per_mon = None  # optional named-stage timer (set by SlamSystem)

        # pipelined mode state: device-resident pose chain + in-flight frames
        self._cand_np = None
        self._cand_dev = None
        self._dev_R_cw = None  # device arrays chaining the world pose
        self._dev_t_cw = None
        # deferred keyframe spawn: (rec, pkt_args) whose payload fetch is in
        # flight; finalized once the fetch lands (pipelined mode only)
        self._pending_spawn = None
        # in-flight neighborhood-adoption upload (apply_neighborhood ships
        # the packed scatter buffer via the fetch pool; the scatter applies
        # at the next frame once the upload lands)
        self._nb_pending = None
        # True after a RESCUE spawn (see _consume) until a frame passes the
        # tracking floor again: a second below-floor frame while a rescue is
        # unvalidated is a genuine loss, not staleness
        self._rescue_pending = False
        # finalized AddToOptimizer packets not yet handed to the system
        # (SlamSystem drains this every frame and pushes to the backend)
        self._ready_packets = []
        # in-flight frame queue; each entry is a mutable list
        # [frame_id, cand_ids_np, FrontendStepOut, fut, corr_R, corr_t,
        #  kf_epoch] where (corr_R, corr_t) right-corrects the fetched world
        # pose for backend rebases that happened after the frame was
        # dispatched, and kf_epoch stamps which keyframe generation the
        # frame's candidate set belongs to
        self._pending = deque()
        # keyframe generation counter: frames dispatched before a keyframe
        # spawn carry a stale candidate set whose device stats (quadrant
        # counts, track lengths) re-trigger the keyframe conditions the
        # spawn just fixed — their decisions are suppressed at consume
        # (measured on the 360-spin: 77 keyframes instead of ~19, one per
        # in-flight frame, each force-finalizing the previous spawn at a
        # blocking ~30 ms — the dominant config-2 cost)
        self._kf_epoch = 0
        # how many frames stay in flight before results are consumed. Depth 2
        # gives each packed fetch TWO frame periods to complete: one link
        # round-trip (~30 ms) exceeds a 60 fps frame period, so at depth 1
        # the consume blocks ~16 ms/frame on the fetch (measured). Keyframe
        # policy lags `depth` frames.
        self.pipeline_depth = 2
        # auto staleness guard: pipeline depth is a STALENESS budget, not
        # just an RTT-hiding knob — keyframe decisions lag dispatch by
        # `depth` frames, and depth x per-frame-rotation must stay within
        # the matcher search radius expressed as rotation or matching
        # collapses below the tracking floor (measured on the 360-spin
        # benchmark: 4 deg/frame, depth 4 -> deterministic 0.26 m chain
        # divergence, ATE 0.1997; depth 2 -> ATE 0.015). _effective_depth
        # clamps the dispatch-ahead depth from the measured rotation rate
        # and warns once. Set auto_depth=False to force the raw depth.
        self.auto_depth = True
        self._rot_hist = deque(maxlen=8)
        self._prev_consumed_R = None
        self._depth_clamp_warned = False
        # 4 workers: each fetch is one link round-trip (~30 ms on a remote
        # chip); with one worker the fetch THROUGHPUT (1/RT) caps the frame
        # rate even though the latency is hidden. Concurrent round-trips
        # overlap on the link; per-frame futures keep results ordered.
        # NOTE: 6 workers measured SLOWER (more GIL contention from fetch
        # threads at small frame sizes); 4 covers depth-4 pipelining in
        # practice because fetches resolve within ~1.5 frame periods.
        self._fetch_pool = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="packed-fetch"
        )

    # -- device table accessors ------------------------------------------ #
    # poses/points are properties so EVERY write bumps tables_version:
    # StreamPool keys its batched-table restack cache on the version (id()
    # of the table objects is unsound — CPython recycles ids after GC, so
    # two table swaps between dispatches could alias and the batched step
    # would silently run against stale tables).
    @property
    def poses(self):
        return self._poses_table

    @poses.setter
    def poses(self, value):
        self._poses_table = value
        self.tables_version += 1

    @property
    def points(self):
        return self._points_table

    @points.setter
    def points(self, value):
        self._points_table = value
        self.tables_version += 1

    # -- public pose accessors ------------------------------------------- #
    @property
    def T_cur_from_actkey(self) -> SE3:
        return SE3(jnp.asarray(self._R_cak), jnp.asarray(self._t_cak))

    def _world_pose(self) -> "PoseRT":
        # numpy, NOT SE3: this is called per frame for the trajectory, and
        # a device-backed pose makes every later trajectory consumer (ATE,
        # TUM export, viz) pay eager device ops + a tunnel fetch per pose
        from scavislam_tpu.core.lie import PoseRT

        return PoseRT(self._R_cw.astype(np.float64).copy(),
                      self._t_cw.astype(np.float64).copy())

    # -- frame processing -------------------------------------------------- #
    def _cand_device(self, cand_ids):
        """Upload candidate ids only when they changed (the upload is a
        full link round-trip)."""
        if self._cand_np is None or not np.array_equal(self._cand_np, cand_ids):
            self._cand_np = cand_ids.copy()
            self._cand_dev = jnp.asarray(cand_ids, jnp.int32)
        return self._cand_dev

    def _actkey_dev(self):
        """Device scalar of the active keyframe id, re-uploaded only when it
        changes (a fresh jnp.int32 per frame is a device_put dispatch)."""
        key = max(self.actkey_id, 0)
        cached = getattr(self, "_actkey_cache", None)
        if cached is None or cached[0] != key:
            cached = (key, jnp.int32(key))
            self._actkey_cache = cached
        return cached[1]

    def _run_step(self, frame, cand_ids):
        ext = frame.get("disp")
        use_ext = ext is not None or frame.get("use_gt_disp", False)
        if frame.get("use_gt_disp", False):
            ext = frame["disp_gt"]
        if "stacked_dev" in frame:
            # device-resident frames (prefetched by the IO layer — the
            # TPU-native analogue of the reference's 50-frame RAM prefetch)
            stacked = frame["stacked_dev"]
        else:
            # ONE stacked upload: (2|3, H, W); uint8 when no external
            # disparity plane is needed (4x less tunnel traffic; the step
            # normalizes on device)
            left = np.asarray(frame["left"])
            right = (np.asarray(frame["right"]) if "right" in frame
                     else np.zeros_like(left))
            if use_ext:
                planes = [np.asarray(left, np.float32),
                          np.asarray(right, np.float32),
                          np.asarray(ext, np.float32)]
                stacked = jnp.asarray(np.stack(planes))
            else:
                stacked = jnp.asarray(np.stack([
                    _to_u8(left), _to_u8(right)
                ]))
        # optional undistort+rectify ahead of the fused step (reference:
        # rectify_frame, frame_grabber.cpp:245-256) — device-resident maps,
        # one extra program, no host sync
        stacked = self._rectifier.rectify_stacked(stacked)
        # device pose-chain: reuse last step's device outputs when available
        # (invalidated when the host rebases the world pose, e.g. after a
        # backend neighborhood update)
        R_cw = (self._dev_R_cw if self._dev_R_cw is not None
                else jnp.asarray(self._R_cw))
        t_cw = (self._dev_t_cw if self._dev_t_cw is not None
                else jnp.asarray(self._t_cw))
        out = frontend_step(
            stacked,
            self._prev_clouds, self._prev_intens, self._prev_valids,
            self._prev_J,
            R_cw, t_cw,
            self._actkey_dev(),
            self.poses, self.points,
            self._cand_device(cand_ids),
            self._cam_params, self._cam_statics,
            self.levels, self._num_disp, bool(use_ext),
            float(self.cfg.ui.max_reproj_error), 0.18,
            int(self.cfg.ui.stereo_method),
            (int(self.cfg.ui.stereo_iters), int(self.cfg.ui.stereo_levels),
             int(self.cfg.ui.stereo_nr_plane)),
            dense_subs=self.dense_subs,
            dense_sample=self.dense_sample,
        )
        self._dev_R_cw = out.R_cw
        self._dev_t_cw = out.t_cw
        # device-resident debug state for the GUI's 7-way debug view
        # (apps.visualize.render_debug_image; fetched only when inspected)
        self.prev_pyr = getattr(self, "last_pyr", None)
        self.last_pyr = out.pyr
        self.last_dx, self.last_dy = out.dx, out.dy
        self.last_disp = out.disp
        self.last_right = stacked[1]
        return out

    def _empty_prev_state(self, shape):
        h, w = shape
        clouds, intens, valids, Js = [], [], [], []
        for l in range(self.levels):
            sub = (self.dense_subs[l]
                   if l < len(self.dense_subs) else 1)
            step = (2**l) * sub
            n = -(-h // step) * -(-w // step)
            clouds.append(jnp.zeros((n, 3), jnp.float32))
            intens.append(jnp.zeros((n,), jnp.float32))
            valids.append(jnp.zeros((n,), bool))
            Js.append(jnp.zeros((n, 6), jnp.float32))
        return tuple(clouds), tuple(intens), tuple(valids), tuple(Js)

    def process_first_frame(self, frame: dict):
        """Bootstrap: frame 0 becomes the first keyframe at the origin."""
        h, w = np.asarray(frame["left"]).shape
        (self._prev_clouds, self._prev_intens, self._prev_valids,
         self._prev_J) = self._empty_prev_state((h, w))
        cand_ids = np.full(CAND_CAP, -1, np.int64)
        self.frame_id = frame.get("frame_id", 0)
        out = self._run_step(frame, cand_ids)
        pkt = self.bootstrap_first(out, frame)
        self._roll(out)
        return pkt

    def bootstrap_first(self, out: FrontendStepOut, frame: dict):
        """First-keyframe bookkeeping given an already-run step output (the
        step may have been executed externally, e.g. as one row of a batched
        multi-stream program — parallel.stream_pool)."""
        self.frame_id = frame.get("frame_id", 0)
        kf_id = self._new_keyframe_id()
        T_kw = frame.get("T_cw_init", SE3.identity())
        T_np = (np.asarray(T_kw.R, np.float32), np.asarray(T_kw.t, np.float32))
        self.poses = self.poses.set(kf_id, T_kw)
        self.pose_np[kf_id] = T_np
        self.actkey_id = kf_id
        self._R_cak = np.eye(3, dtype=np.float32)
        self._t_cak = np.zeros(3, np.float32)
        self._R_cw = np.asarray(T_kw.R)
        self._t_cw = np.asarray(T_kw.t)

        new_ids, new_psi, new_lvl, new_uvu, pr_packed = self._spawn(
            out, kf_id, None)
        self.kf_point_ids[kf_id] = new_ids
        self.covis[kf_id] = {}
        self.keyframe_map[kf_id] = (
            {"pyr": out.pyr, "disp": out.disp, "T_kw": T_np}
            if self.keep_kf_images else {"T_kw": T_np}
        )
        pkt = AddToOptimizer(
            kf_id, T_np, new_ids, new_psi, new_lvl, new_uvu,
            np.zeros(0, np.int64), np.zeros((0, 3), np.float32),
            np.zeros(0, np.int64), {},
            pyr=out.pyr, disp=out.disp,
            points_snapshot=self.points, poses_snapshot=self.poses,
            pr_packed=pr_packed,
        )
        self.to_optimizer_stack.append(pkt)
        return pkt

    def process_frame(self, frame: dict):
        """Track one frame. Returns (success, dropped_new_keyframe)."""
        self._apply_nb_pending(block=True)  # sync mode: no table lag
        self.frame_id = frame.get("frame_id", self.frame_id + 1)
        cand_ids = self._collect_candidates()
        out = self._run_step(frame, cand_ids)

        # ---- the ONE host fetch per frame (single packed array — separate
        # small fetches cost a tunnel round-trip EACH)
        C = CAND_CAP
        pk = np.asarray(out.packed)
        R_cw = pk[0:9].reshape(3, 3)
        t_cw = pk[9:12]
        R_cak = pk[12:21].reshape(3, 3)
        t_cak = pk[21:24]
        n_matched, n_gated, t_norm, mean_track_len = pk[24:28]
        quad_counts = pk[30:34]
        gate = pk[34:34 + C] > 0.5
        obs_all = pk[34 + 2 * C: 34 + 5 * C].reshape(C, 3)

        if int(n_matched) < MIN_TRACK_OBS or int(n_gated) < MIN_TRACK_OBS:
            return False, False
        if not np.isfinite(t_cw).all():
            return False, False

        self._R_cw, self._t_cw = R_cw, t_cw
        self._R_cak, self._t_cak = R_cak, t_cak

        levels_arr = self._meta_level[np.clip(cand_ids, 0, MAX_POINTS - 1)]
        self._tracked_ids = cand_ids[gate]
        self._tracked_obs = obs_all[gate]
        self._tracked_levels = levels_arr[gate]
        self.draw_data.tracked_uv = obs_all[gate][:, :2]

        dropped = False
        switched = self._maybe_switch_keyframe(float(t_norm))
        if not switched and self._shall_drop_keyframe(
            quad_counts, float(t_norm), float(mean_track_len)
        ):
            self._add_new_keyframe(out)
            dropped = True

        self._roll(out)
        return True, dropped

    def _roll(self, out: FrontendStepOut):
        self._prev_clouds = out.clouds
        self._prev_valids = out.cloud_valids
        self._prev_intens = out.intens
        self._prev_J = out.cloud_J

    # -- pipelined mode ------------------------------------------------------ #
    def process_frame_pipelined(self, frame: dict):
        """Dispatch this frame, then consume the results of the frame
        dispatched `pipeline_depth` frames ago (fetch + keyframe policy).
        The device pose chain advances without waiting for the host, so the
        link round-trip and the host policy overlap the in-flight frames'
        device execution. Keyframe decisions lag `pipeline_depth` frames
        relative to the synchronous mode (the reference creates the keyframe
        within the same processFrame; a couple of camera periods of extra
        parallax is well inside its own thresholds).

        Returns (success, dropped, consumed_frame_id) for the consumed frame,
        or None while the pipeline is still filling."""
        tlog = self.timing_log
        t_a = time.perf_counter() if tlog is not None else 0.0
        self._apply_nb_pending()
        self.frame_id = frame.get("frame_id", self.frame_id + 1)
        cand_ids = self._collect_candidates()
        out = self._run_step(frame, cand_ids)
        # fetch `packed` in a helper thread: on a remote chip the download is
        # a full link round-trip (~30 ms) that would otherwise sit SERIALLY
        # in the frame loop — started here, it overlaps the in-flight frames'
        # device execution and is already resolved when consumed
        fut = self._fetch_pool.submit(np.asarray, out.packed)
        self._pending.append(
            [self.frame_id, cand_ids, out, fut, None, None, self._kf_epoch]
        )
        self._roll(out)
        if tlog is not None:
            t_b = time.perf_counter()
        if len(self._pending) <= self._effective_depth():
            if tlog is not None:
                tlog.append((self.frame_id, t_b - t_a, 0.0, 0.0))
            return None
        entry = self._pending.popleft()
        fid = entry[0]
        self._fetch_wait_s = 0.0
        success, dropped = self._consume(*entry[1:])
        if tlog is not None:
            t_c = time.perf_counter()
            tlog.append((fid, t_b - t_a, self._fetch_wait_s,
                         t_c - t_b - self._fetch_wait_s))
        return success, dropped, fid

    def flush_pipeline(self):
        """Consume ALL in-flight frames (end of sequence). Returns a list of
        (success, dropped, frame_id, world_pose, keyframe_packet_or_None),
        stopping at the first failure. Pose and packet are captured at each
        consume — by the time the caller iterates, later consumes have
        already advanced the frontend state."""
        results = []
        while self._pending:
            entry = self._pending.popleft()
            fid = entry[0]
            success, dropped = self._consume(*entry[1:])
            pkt = self.to_optimizer_stack[-1] if dropped else None
            results.append((success, dropped, fid, self._world_pose(), pkt))
            if not success:
                self._pending.clear()
                break
        if self._pending_spawn is not None:
            # a keyframe decided at the last consume: finalize its packet now
            # (fid None — no trajectory entry, just the backend push)
            rec, pkt_args = self._pending_spawn
            self._pending_spawn = None
            pkt = self._finalize_keyframe(rec, pkt_args)
            results.append((True, True, None, None, pkt))
        return results

    def _effective_depth(self) -> int:
        """Dispatch-ahead depth after the staleness guard. The budget is
        the documented rule (benchmarks/run_configs.py config 2) enforced
        in code: depth x median per-frame rotation <= FACTOR x
        (search_radius / focal). FACTOR calibrated by measurement on the
        360-spin (4 deg/frame, f=195, radius 10 px -> 2.94 deg): depth 2
        tracks (ATE 0.015), depth 4 diverges deterministically (ATE
        0.1997); the 10-degree budget admits 2 and clamps 4."""
        d = max(1, self.pipeline_depth)
        if not self.auto_depth or len(self._rot_hist) < 4:
            return d
        rate = float(np.median(self._rot_hist))  # rad/frame
        if rate <= 1e-6:
            return d
        budget = 3.4 * MATCH_SEARCH_RADIUS_PX / float(self.cam.focal)
        d_max = max(1, int(budget / rate))
        if d > d_max and not self._depth_clamp_warned:
            import warnings

            warnings.warn(
                f"pipeline_depth={d} exceeds the staleness budget at the "
                f"measured rotation rate {np.degrees(rate):.1f} deg/frame "
                f"(matcher search radius {MATCH_SEARCH_RADIUS_PX:.0f} px at "
                f"f={float(self.cam.focal):.0f}); clamping dispatch-ahead "
                f"depth to {d_max} to avoid deterministic tracking "
                f"divergence", stacklevel=3)
            self._depth_clamp_warned = True
        return min(d, d_max)

    def _freshest_spawn_source(self):
        """Spawn-at-pipeline-head: the newest in-flight frame whose packed
        fetch has LANDED and whose stats pass the tracking floor, as a
        (out, T_np, tracked) triple for _add_new_keyframe — or None.

        Keyframe decisions lag dispatch by `pipeline_depth` frames, so a
        spawn from the CONSUMED frame's view is already depth frames stale
        the moment it exists; under fast rotation (the 360-spin benchmark:
        4 deg/frame at depth 4) frames then match a (cadence+depth)-frame-
        old view and decay below the floor before the next decision can
        fire. Spawning from the newest landed frame cuts the staleness to
        the link round-trip (~2-3 frames) with zero extra device work or
        fetches — the packet was already fetched for its own consume, which
        still happens normally later (stale-epoch, so its own keyframe
        decision is suppressed; its pose update proceeds)."""
        C = CAND_CAP
        for entry in reversed(self._pending):
            fid, cand_ids, out, fut, corr_R, corr_t, _ep = entry
            if fut is None or not fut.done():
                continue
            pk = fut.result()
            R_cw = pk[0:9].reshape(3, 3)
            t_cw = pk[9:12]
            if corr_R is not None:
                t_cw = R_cw @ corr_t + t_cw
                R_cw = R_cw @ corr_R
            n_matched, n_gated = int(pk[24]), int(pk[25])
            if (n_matched < MIN_TRACK_OBS or n_gated < MIN_TRACK_OBS
                    or not np.isfinite(t_cw).all()):
                continue
            gate = pk[34:34 + C] > 0.5
            obs_all = pk[34 + 2 * C: 34 + 5 * C].reshape(C, 3)
            lv = self._meta_level[np.clip(cand_ids, 0, MAX_POINTS - 1)]
            T_np = (np.asarray(R_cw, np.float32),
                    np.asarray(t_cw, np.float32))
            tracked = (cand_ids[gate], obs_all[gate], lv[gate])
            return out, T_np, tracked
        return None

    def _consume(self, cand_ids, out: FrontendStepOut, fut=None,
                 corr_R=None, corr_t=None, epoch=None):
        C = CAND_CAP
        # a keyframe decided at an earlier consume finalizes once its spawn
        # payload fetch has landed (the spawn program runs behind the
        # in-flight frame programs, so forcing it at the very next consume
        # would block ~3 frame periods — measured ~50 ms)
        spawn_landed = False
        if (self._pending_spawn is not None
                and self._pending_spawn[0]["fut"].done()):
            rec, pkt_args = self._pending_spawn
            self._pending_spawn = None
            self._finalize_keyframe(rec, pkt_args)
            spawn_landed = True
        if fut is not None:
            if self.timing_log is not None and not fut.done():
                t_w = time.perf_counter()
                pk = fut.result()
                self._fetch_wait_s = time.perf_counter() - t_w
            else:
                pk = fut.result()
        else:
            pk = np.asarray(out.packed)
        R_cw = pk[0:9].reshape(3, 3)
        t_cw = pk[9:12]
        if corr_R is not None:
            # this frame was dispatched before a backend rebase: apply the
            # same right-multiplicative world correction the chain received
            t_cw = R_cw @ corr_t + t_cw
            R_cw = R_cw @ corr_R
        R_cak = pk[12:21].reshape(3, 3)
        t_cak = pk[21:24]
        n_matched, n_gated, t_norm, mean_track_len = pk[24:28]
        quad_counts = pk[30:34]
        gate = pk[34:34 + C] > 0.5
        obs_all = pk[34 + 2 * C: 34 + 5 * C].reshape(C, 3)

        bad = (int(n_matched) < MIN_TRACK_OBS
               or int(n_gated) < MIN_TRACK_OBS
               or not np.isfinite(t_cw).all())
        if bad:
            if epoch is not None and epoch != self._kf_epoch:
                # transient, not a loss: this frame was dispatched BEFORE the
                # latest keyframe spawn, so its candidate set is up to
                # (keyframe cadence + pipeline depth) frames stale — under
                # fast rotation the last pre-spawn frames can decay below the
                # match floor while the first post-spawn frame recovers
                # fully (measured on the 360-spin: 299->60 matches across
                # one epoch, 117 on the next frame). Skip the frame: keep
                # the previous host pose, no keyframe decision; the device
                # chain re-converges on its own (frame-to-frame IC tracking
                # is independent of this consume). A genuine loss also fails
                # CURRENT-epoch frames within `pipeline_depth` frames.
                return True, spawn_landed
            if (not self._rescue_pending
                    and int(n_matched) >= RESCUE_MIN_MATCHES
                    and int(n_gated) > 0
                    and np.isfinite(t_cw).all()
                    and np.isfinite(R_cw).all()):
                # n_gated > 0: the rescue keyframe's tracked set (and thus
                # its covis strengths) comes from `gate`; with zero gated
                # matches it would spawn DISCONNECTED from the covis graph
                # (unreachable by double-window/neighborhood/loop anchoring)
                # RESCUE SPAWN. Under fast rotation the pipelined policy has
                # a structural blind window: decisions are suppressed for
                # stale-epoch frames, so after one spawn the next possible
                # decision comes from a frame whose keyframe view is already
                # (cadence + depth) frames old — on the 360-spin benchmark
                # (4 deg/frame, depth 4) the first CURRENT-epoch frame
                # matched 48 / gated 7, under the floor before the policy
                # could fire again. The synchronous reference never sees
                # this (its policy runs on fresh stats every frame,
                # stereo_frontend.cpp:1019-1081). Partial matching + a
                # finite chain means the pose is still good (the step keeps
                # the dense-tracking chain when BA is under-constrained) —
                # so refresh the candidate set by spawning a keyframe from
                # THIS frame's own view instead of declaring loss. One
                # rescue per validation: if the next current-epoch frame is
                # still under the floor against 1-frame-old candidates, the
                # loss is real (kidnap/occlusion) and lost-mode takes over.
                self._R_cw, self._t_cw = R_cw, t_cw
                self._tracked_ids = cand_ids[gate]
                self._tracked_obs = obs_all[gate]
                self._tracked_levels = self._meta_level[
                    np.clip(cand_ids, 0, MAX_POINTS - 1)][gate]
                # the rescue spawns from the CONSUMED frame itself, never an
                # older landed entry: if the chain diverged (e.g. the dense
                # stage picked the translation branch of the planar
                # rotation/translation ambiguity), only a keyframe whose
                # view AND pose both come from the post-divergence frame is
                # self-consistent — an older good keyframe leaves predicted
                # projections offset by the divergence and matching never
                # recovers (measured on the 360-spin). The offset becomes
                # bounded trajectory drift; loop closure exists to fix it.
                self._add_new_keyframe(out, defer=True)
                self._rescue_pending = True
                return True, spawn_landed
            return False, False
        self._rescue_pending = False
        if self._prev_consumed_R is not None:
            # rotation-rate sample for the staleness guard (host numpy)
            c = (np.trace(self._prev_consumed_R.T @ R_cw) - 1.0) * 0.5
            self._rot_hist.append(float(np.arccos(np.clip(c, -1.0, 1.0))))
        self._prev_consumed_R = np.asarray(R_cw, np.float64).copy()
        self._R_cw, self._t_cw = R_cw, t_cw
        # derive the chain from the WORLD pose + the CURRENT actkey: if a
        # keyframe/switch happened after this frame was dispatched, the
        # fetched device chain refers to the old actkey and must be rebased.
        Rk, tk = self.pose_np[self.actkey_id]
        self._R_cak = (R_cw @ Rk.T).astype(np.float32)
        self._t_cak = (t_cw - self._R_cak @ tk).astype(np.float32)

        levels_arr = self._meta_level[np.clip(cand_ids, 0, MAX_POINTS - 1)]
        self._tracked_ids = cand_ids[gate]
        self._tracked_obs = obs_all[gate]
        self._tracked_levels = levels_arr[gate]
        self.draw_data.tracked_uv = obs_all[gate][:, :2]

        switched = self._maybe_switch_keyframe(
            float(np.linalg.norm(self._t_cak))
        )
        # frames dispatched before the latest keyframe spawn carry stale
        # candidate-set stats — suppress their keyframe decisions (the
        # synchronous reference never decides on pre-spawn information)
        epoch_ok = epoch is None or epoch == self._kf_epoch
        if not switched and epoch_ok and self._shall_drop_keyframe(
            quad_counts, float(np.linalg.norm(self._t_cak)),
            float(mean_track_len),
        ):
            if self.per_mon is not None:
                self.per_mon.start("drop keyframe")
            # decision + device dispatch now; the packet (and the `dropped`
            # signal the caller uses to push it) land at the NEXT consume.
            # The spawn SOURCE is the newest landed in-flight frame when one
            # qualifies (spawn-at-pipeline-head — see _freshest_spawn_source)
            src = self._freshest_spawn_source()
            if src is not None:
                self._add_new_keyframe(src[0], defer=True,
                                       T_np=src[1], tracked=src[2])
            else:
                self._add_new_keyframe(out, defer=True)
            if self.per_mon is not None:
                self.per_mon.stop("drop keyframe")
        return True, spawn_landed

    # -- candidate assembly ------------------------------------------------ #
    def _collect_candidates(self) -> np.ndarray:
        """actkey's points + covis neighbors' points + neighborhood list,
        deduped, padded (parity: stereo_frontend.cpp:977-1050)."""
        lists = []
        if self.actkey_id in self.kf_point_ids:
            lists.append(self.kf_point_ids[self.actkey_id])
        for nbr in sorted(
            self.covis.get(self.actkey_id, {}),
            key=lambda k: -self.covis[self.actkey_id][k],
        ):
            lists.append(self.kf_point_ids.get(nbr, np.zeros(0, np.int64)))
        if self.neighborhood is not None:
            lists.append(np.asarray(
                self.neighborhood.get("point_ids", []), np.int64))
        if lists:
            ids = pd_unique(np.concatenate(lists))
        else:
            ids = np.zeros(0, np.int64)
        # pack into the per-level sections the fused step matches against
        # (each level's matcher only sees its own contiguous section);
        # priority order (actkey -> covis -> neighborhood) is preserved
        # within each section
        out = np.full((CAND_CAP,), -1, np.int64)
        if len(ids):
            lv = self._meta_level[np.clip(ids, 0, MAX_POINTS - 1)]
            off = 0
            for l, cap in enumerate(level_sections(self.levels, CAND_CAP)):
                sel = ids[lv == l][:cap]
                out[off:off + len(sel)] = sel
                off += cap
        return out

    # -- keyframe policy --------------------------------------------------- #
    def _shall_drop_keyframe(self, quad_counts, t_norm, mean_track_len):
        """Parity: stereo_frontend.cpp:512-528."""
        cfg = self.cfg
        featureless = int(
            (np.asarray(quad_counts) < cfg.ui.min_num_points).sum()
        )
        if featureless >= cfg.frontend.new_keyframe_featureless_corners_thr:
            return True
        if t_norm > cfg.ui.parallax_thr:
            return True
        if mean_track_len > cfg.frontend.new_keyframe_pixel_thr:
            return True
        return False

    def _maybe_switch_keyframe(self, t_norm: float) -> bool:
        """Parity: stereo_frontend.cpp:445-510."""
        ids = self._tracked_ids
        if len(ids) == 0 or self.actkey_id < 0:
            return False
        anch = self._meta_anchor[np.clip(ids, 0, MAX_POINTS - 1)]
        best = None
        for nbr in self.covis.get(self.actkey_id, {}):
            shared = int((anch == nbr).sum())
            if shared <= 100 or nbr not in self.pose_np:
                continue
            Rn, tn = self.pose_np[nbr]
            R_cn = self._R_cw @ Rn.T
            d = float(np.linalg.norm(self._t_cw - R_cn @ tn))
            if d < 0.5 * self.cfg.ui.parallax_thr and d < t_norm:
                if best is None or d < best[1]:
                    best = (nbr, d)
        if best is None:
            return False
        nbr = best[0]
        Rn, tn = self.pose_np[nbr]
        R_cn = self._R_cw @ Rn.T
        t_cn = self._t_cw - R_cn @ tn
        self.actkey_id = nbr
        self._R_cak = R_cn.astype(np.float32)
        self._t_cak = t_cn.astype(np.float32)
        self._cand_np = None
        return True

    # -- keyframe creation ------------------------------------------------- #
    def _new_keyframe_id(self) -> int:
        kf = self.next_kf
        assert kf < MAX_KEYFRAMES, "keyframe table full"
        self.next_kf += 1
        return kf

    def _spawn_dispatch(self, out: FrontendStepOut, kf_id: int, tracked_obs):
        """Dispatch the fused spawn program + host id allocation; the payload
        fetch (one link round-trip) resolves in a helper thread. Metas are
        set optimistically for every allocated slot — the device table's
        valid flags gate matching, and finalize clears the rejected slots."""
        caps = NEW_PER_LEVEL[: self.levels]
        # wrap-around recycling when the table fills: the oldest points'
        # slots are reused (their keyframes have long scrolled out of every
        # matching candidate set; the backend keeps its own host copies)
        total = sum(caps)
        if self.next_point + total > MAX_POINTS:
            self.next_point = 0
        starts = []
        for cap in caps:
            starts.append(self.next_point)
            self.next_point += cap

        # ONE packed upload: [uv0 | valid | starts | kf_id] (4 separate
        # uploads cost 4 dispatches over the tunnel per keyframe spawn)
        packed_in = np.zeros(3 * TRACKED_CAP + self.levels + 1, np.float32)
        if tracked_obs is not None and len(tracked_obs) > 0:
            n = min(len(tracked_obs), TRACKED_CAP)
            # rows 0..n of the (T, 2) uv block, row-major (the unpack
            # reshape is (T, 2))
            packed_in[: 2 * n] = np.asarray(
                tracked_obs[:n, :2], np.float32).ravel()
            packed_in[2 * TRACKED_CAP: 2 * TRACKED_CAP + n] = 1.0
        packed_in[3 * TRACKED_CAP: 3 * TRACKED_CAP + self.levels] = starts
        packed_in[3 * TRACKED_CAP + self.levels] = kf_id

        self.points, payloads = spawn_points_step_packed(
            out.pyr, out.disp,
            jnp.asarray(packed_in),
            self.points,
            self._cam_params, self._cam_statics,
            self.levels, tuple(caps),
            float(self.cfg.frontend.newpoint_clearance),
            TRACKED_CAP, self.pr_vocab,
        )
        for l, cap in enumerate(caps):
            ids = np.arange(starts[l], starts[l] + cap, dtype=np.int64)
            self._meta_anchor[ids] = kf_id
            self._meta_level[ids] = l
        fut = self._fetch_pool.submit(np.asarray, payloads)
        return {"kf_id": kf_id, "caps": caps, "starts": starts, "fut": fut}

    def _spawn_finalize(self, rec):
        """Consume the spawn payload fetch: exact per-slot validity.
        Returns (ids, psi, levels, uvu0, pr_packed) — pr_packed is the
        fused BoW describe block, or None when no vocabulary is wired."""
        payloads = rec["fut"].result()
        caps, starts, kf_id = rec["caps"], rec["starts"], rec["kf_id"]
        all_ids, all_psi, all_lvl, all_uvu = [], [], [], []
        off = 0
        for l, cap in enumerate(caps):
            psi = payloads[off: off + cap * 3].reshape(cap, 3)
            off += cap * 3
            uvu0 = payloads[off: off + cap * 3].reshape(cap, 3)
            off += cap * 3
            ok = payloads[off: off + cap] > 0.5
            off += cap
            ids = np.arange(starts[l], starts[l] + cap, dtype=np.int64)
            self._meta_anchor[ids[~ok]] = -1  # clear rejected slots
            all_ids.append(ids[ok])
            all_psi.append(psi[ok])
            all_lvl.append(np.full(int(ok.sum()), l, np.int64))
            all_uvu.append(uvu0[ok])
        pr_packed = None
        if self.pr_vocab is not None:
            from scavislam_tpu.ops.descriptors import BOW_COLS, BOW_KEYPOINTS

            pr_packed = payloads[off: off + BOW_KEYPOINTS * BOW_COLS].reshape(
                BOW_KEYPOINTS, BOW_COLS)
        return (
            np.concatenate(all_ids),
            np.concatenate(all_psi),
            np.concatenate(all_lvl),
            np.concatenate(all_uvu),
            pr_packed,
        )

    def _spawn(self, out: FrontendStepOut, kf_id: int, tracked_obs):
        """Synchronous spawn (first frame + non-pipelined mode)."""
        return self._spawn_finalize(
            self._spawn_dispatch(out, kf_id, tracked_obs)
        )

    def _add_new_keyframe(self, out: FrontendStepOut, defer: bool = False,
                          T_np=None, tracked=None):
        """Parity: addNewKeyframe (stereo_frontend.cpp:309-443).

        With defer=True (pipelined mode) the spawn payload fetch — one link
        round-trip that would otherwise stall the frame loop ~30 ms — is
        left in flight; the AddToOptimizer packet is finalized at the NEXT
        consume (the backend receives the keyframe one frame later, well
        inside its FIFO-queue semantics). Everything matching needs — device
        point table, actkey switch, candidate ids — is in place immediately.

        T_np/tracked override the keyframe pose + tracked-observation set
        when the spawn SOURCE is not the consumed frame (the
        spawn-at-pipeline-head path, _freshest_spawn_source): `out` must be
        the step output of the SAME frame the pose/observations came from."""
        if self._pending_spawn is not None:
            # consecutive keyframe decisions: force the outstanding one out
            rec, pkt_args = self._pending_spawn
            self._pending_spawn = None
            self._finalize_keyframe(rec, pkt_args)
        if T_np is None:
            # packets/snapshots carry the NUMPY pose pair: a device-backed
            # SE3 in the packet costs the backend a ~25 ms tunnel fetch per
            # keyframe when it converts with np.asarray (measured — it was
            # the single largest per-keyframe cost in the loop benchmark)
            T_np = (self._R_cw.copy(), self._t_cw.copy())
        if tracked is None:
            tracked = (self._tracked_ids, self._tracked_obs,
                       self._tracked_levels)
        tracked_ids, tracked_obs, tracked_levels = tracked
        self._kf_epoch += 1
        kf_id = self._new_keyframe_id()
        T_cw = SE3(jnp.asarray(T_np[0]), jnp.asarray(T_np[1]))
        self.poses = self.poses.set(kf_id, T_cw)
        self.pose_np[kf_id] = T_np

        anch = self._meta_anchor[
            np.clip(tracked_ids, 0, MAX_POINTS - 1)
        ]
        strengths = {}
        for a, c in zip(*np.unique(anch, return_counts=True)):
            if int(a) >= 0 and int(c) >= self.cfg.frontend.covis_thr:
                strengths[int(a)] = int(c)
        self.covis[kf_id] = dict(strengths)
        for a, c in strengths.items():
            self.covis.setdefault(a, {})[kf_id] = c

        rec = self._spawn_dispatch(out, kf_id, tracked_obs)
        all_slots = np.concatenate([
            np.arange(s, s + c, dtype=np.int64)
            for s, c in zip(rec["starts"], rec["caps"])
        ])
        self.keyframe_map[kf_id] = (
            {"pyr": out.pyr, "disp": out.disp, "T_kw": T_np}
            if self.keep_kf_images else {"T_kw": T_np}
        )
        pkt_args = dict(
            kf_id=kf_id, T_cw=T_np,
            tracked_ids=np.asarray(tracked_ids).copy(),
            tracked_obs=np.asarray(tracked_obs).copy(),
            tracked_levels=np.asarray(tracked_levels).copy(),
            strengths=strengths, pyr=out.pyr, disp=out.disp,
        )
        if defer:
            # optimistic candidate set: every allocated slot (device valid
            # flags gate the rejected ones); exact ids land at finalize
            self.kf_point_ids[kf_id] = np.concatenate(
                [all_slots, np.asarray(tracked_ids)]
            )
            self._pending_spawn = (rec, pkt_args)
        else:
            self._finalize_keyframe(rec, pkt_args)
        self.actkey_id = kf_id
        # current-frame-from-actkey: identity when the spawn source IS the
        # consumed frame; the relative pose when the source is a newer
        # in-flight frame (spawn-at-pipeline-head)
        self._R_cak = (self._R_cw @ T_np[0].T).astype(np.float32)
        self._t_cak = (self._t_cw
                       - self._R_cak @ T_np[1]).astype(np.float32)
        self._cand_np = None

    def _finalize_keyframe(self, rec, pkt_args) -> AddToOptimizer:
        """Consume the spawn payloads, build + push the backend packet."""
        new_ids, new_psi, new_lvl, new_uvu, pr_packed = \
            self._spawn_finalize(rec)
        kf_id = pkt_args["kf_id"]
        self.kf_point_ids[kf_id] = np.concatenate(
            [new_ids, pkt_args["tracked_ids"]]
        )
        self._cand_np = None  # exact candidate ids replace the optimistic set
        pkt = AddToOptimizer(
            kf_id, pkt_args["T_cw"], new_ids, new_psi, new_lvl, new_uvu,
            pkt_args["tracked_ids"], pkt_args["tracked_obs"],
            pkt_args["tracked_levels"], pkt_args["strengths"],
            pyr=pkt_args["pyr"], disp=pkt_args["disp"],
            points_snapshot=self.points, poses_snapshot=self.poses,
            pr_packed=pr_packed,
        )
        self.to_optimizer_stack.append(pkt)
        self._ready_packets.append(pkt)
        return pkt

    def reseed(self, R_cw: np.ndarray, t_cw: np.ndarray,
               actkey_id: int = None):
        """Re-seed the tracking state at an externally estimated world pose
        (relocalization — no reference analogue; the reference exits on
        tracking failure, stereo_slam.cpp:706-710). In-flight pipelined
        frames are discarded (their pose chain is invalid)."""
        self._pending.clear()
        self._pending_spawn = None
        self._dev_R_cw = None
        self._dev_t_cw = None
        self._R_cw = np.asarray(R_cw, np.float32)
        self._t_cw = np.asarray(t_cw, np.float32)
        if actkey_id is not None and actkey_id in self.pose_np:
            self.actkey_id = actkey_id
        if self.actkey_id in self.pose_np:
            Rk, tk = self.pose_np[self.actkey_id]
            self._R_cak = (self._R_cw @ Rk.T).astype(np.float32)
            self._t_cak = (self._t_cw - self._R_cak @ tk).astype(np.float32)
        self._cand_np = None

    def take_ready_packets(self):
        """Finalized keyframe packets since the last call (drained by the
        system's main loop, which pushes them to the backend monitor)."""
        pkts, self._ready_packets = self._ready_packets, []
        return pkts

    # -- backend feedback --------------------------------------------------- #
    def apply_neighborhood(self, nb):
        """Adopt a backend-optimized neighborhood (stereo_slam.cpp:694-703:
        adopt only if it contains the current actkey).

        The whole adoption is ONE packed upload + ONE fused scatter program
        (_nb_scatter_packed). The previous shape — separate pose/psi
        scatters with ~6 small uploads — cost a ~25-30 ms tunnel round-trip
        PER ARRAY once per keyframe; at reference keyframe cadence
        (~1/5-10 frames) that was the dominant per-keyframe frame-loop cost
        (measured: ~46 ms of extra wall per keyframe, most of it in this
        method)."""
        if nb is None:
            return False
        kf_ids = nb.get("kf_ids", [])
        if self.actkey_id not in kf_ids:
            # accept a neighborhood rooted at the actkey's covis PARENT:
            # under pipelined spawning the backend answers queries at the
            # newest inserted keyframe (backend.step), which is the new
            # actkey's direct ancestor — same map region, and the table
            # writes are by absolute id. A neighborhood sharing no covis
            # link with the actkey (a genuinely different region, e.g.
            # after a switch) is still rejected, as the reference does
            # (stereo_slam.cpp:694-703).
            if not set(kf_ids) & set(self.covis.get(self.actkey_id, {})):
                return False
        nb_poses = nb.get("poses", {})
        P, C = _POSE_SCATTER_CAP, _PSI_SCATTER_CAP
        # index padding 1<<30 (exactly representable in f32; the device
        # casts back to int32 and drop-mode scatters ignore OOB rows)
        pidx = np.full(P, 1 << 30, np.int32)
        Rp = np.zeros((P, 3, 3), np.float32)
        tp = np.zeros((P, 3), np.float32)
        if nb_poses:
            kfs = np.fromiter(nb_poses.keys(), np.int64, len(nb_poses))[:P]
            Rs = np.stack([nb_poses[int(k)][0]
                           for k in kfs]).astype(np.float32)
            ts = np.stack([nb_poses[int(k)][1]
                           for k in kfs]).astype(np.float32)
            pidx[: len(kfs)] = kfs
            Rp[: len(kfs)] = Rs
            tp[: len(kfs)] = ts
            for k, R, t in zip(kfs, Rs, ts):
                self.pose_np[int(k)] = (R, t)
        cidx = np.full(C, 1 << 30, np.int32)
        vals = np.zeros((C, 3), np.float32)
        pids = nb.get("psi_ids")
        n_psi = 0 if pids is None else min(len(pids), C)
        if n_psi:
            cidx[:n_psi] = np.asarray(pids)[:n_psi]
            vals[:n_psi] = np.asarray(nb["psi_vals"], np.float32)[:n_psi]
        if nb_poses or n_psi:
            buf = np.concatenate([
                pidx.astype(np.float32), Rp.reshape(-1), tp.reshape(-1),
                cidx.astype(np.float32), vals.reshape(-1),
            ])
            # the upload is SYNCHRONOUS on the tunnel (~30 ms): ship it via
            # the fetch pool and apply the scatter when it lands (next
            # frame) — table ids written here (backend-optimized poses/psis)
            # are disjoint from anything a spawn writes in between, and one
            # frame of device-table lag is far inside the adoption's own
            # backend-poll staleness. Host mirrors update immediately below.
            if self._nb_pending is not None:
                self._apply_nb_pending(block=True)
            self._nb_pending = self._fetch_pool.submit(jnp.asarray, buf)
        # keep world pose consistent with the (possibly moved) actkey.
        # SVD-project the product back onto SO(3): each adoption multiplies
        # more near-rotations together, and without the projection the
        # orthonormality error grows ~3x per adoption (measured — it loses
        # tracking within ~13 adoptions on the 360-spin system test).
        R_old, t_old = self._R_cw.copy(), self._t_cw.copy()
        Rk, tk = self.pose_np[self.actkey_id]
        self._R_cw = _project_so3(self._R_cak @ Rk)
        self._t_cw = (self._R_cak @ tk + self._t_cak).astype(np.float32)
        # Propagate the rebase to the in-flight device pose chain EXACTLY:
        # every chained pose is T_j = T_j<-c ∘ T_cw_old (c = the frame whose
        # pose we just rebased), so the fix is one right-multiplication by
        # D = T_cw_old^-1 ∘ T_cw_new. (Re-seeding the chain from the host
        # pose instead would drop the in-flight frames' dense-tracking
        # deltas — a permanent 1-2 frame motion skew in the trajectory.)
        if self._dev_R_cw is not None and np.isfinite(R_old).all():
            D_R = (R_old.T @ self._R_cw).astype(np.float32)
            D_t = (R_old.T @ (self._t_cw - t_old)).astype(np.float32)
            self._dev_R_cw, self._dev_t_cw = _compose_right(
                self._dev_R_cw, self._dev_t_cw,
                jnp.asarray(D_R), jnp.asarray(D_t),
            )
            # already-fetched (or in-fetch) packed results of in-flight
            # frames are raw: record the correction for their consume
            for entry in self._pending:
                if entry[4] is None:
                    entry[4], entry[5] = D_R, D_t
                else:
                    cR, ct = entry[4], entry[5]
                    entry[4] = (cR @ D_R).astype(np.float32)
                    entry[5] = (cR @ D_t + ct).astype(np.float32)
        self.neighborhood = nb
        self._cand_np = None  # neighborhood may add candidates
        return True

    def _apply_nb_pending(self, block: bool = False):
        """Apply a landed neighborhood-adoption upload to the device tables
        (ONE dispatch, zero fetches). Called at the top of every frame; with
        ``block`` waits for the upload (only when a second adoption arrives
        before the first applied — rare)."""
        fut = self._nb_pending
        if fut is None or (not block and not fut.done()):
            return
        self._nb_pending = None
        dev_buf = fut.result()
        Rn, tn, vn, psin = _nb_scatter_packed(
            self.poses.R, self.poses.t, self.poses.valid,
            self.points.psi, dev_buf,
        )
        self.poses = PoseTable(Rn, tn, vn)
        self.points = self.points._replace(psi=psin)


def _project_so3(R: np.ndarray) -> np.ndarray:
    """Nearest rotation matrix (Frobenius) via SVD, host-side."""
    u, _, vt = np.linalg.svd(R.astype(np.float64))
    u[:, 2] *= np.sign(np.linalg.det(u @ vt))
    return (u @ vt).astype(np.float32)


@jax.jit
def _compose_right(R, t, D_R, D_t):
    """(R,t) ∘ (D_R,D_t): right-multiply a pose by a correction, then
    re-orthonormalize by Gram-Schmidt on the rows (handedness preserved via
    the cross product) — the correction chain must not accumulate
    non-orthonormality (see apply_neighborhood)."""
    Rc = R @ D_R
    r0 = Rc[0] / jnp.linalg.norm(Rc[0])
    r1 = Rc[1] - jnp.dot(Rc[1], r0) * r0
    r1 = r1 / jnp.linalg.norm(r1)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2]), R @ D_t + t


def _to_u8(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def pd_unique(ids: np.ndarray) -> np.ndarray:
    """Order-preserving unique (first occurrence wins)."""
    _, idx = np.unique(ids, return_index=True)
    return ids[np.sort(idx)]
