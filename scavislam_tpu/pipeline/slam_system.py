"""Complete SLAM system: frontend + backend + place recognition pipeline.

Mirrors the reference's process topology (/root/reference/scavislam/
stereo_slam.cpp:164-216, 681-747): a main thread runs the frontend at camera
rate; a backend thread maintains the DWO graph; a place-recognizer thread
detects appearance loops. All cross-thread traffic uses the monitor mailboxes
of pipeline.monitors with the reference's exact channel semantics.

Two execution modes:
- threaded=True : real threads, like the reference (backend.cpp:157,
  placerecognizer.cpp:114, spawned at stereo_slam.cpp:195-196);
- threaded=False: synchronous stepping (deterministic; used by tests/bench).

Per-frame main loop (parity: stereo_slam.cpp:681-747):
  1. grab + process frame through the frontend;
  2. queryNeighborhood(actkey) to the backend;
  3. adopt the backend's neighborhood answer if it contains the actkey;
  4. on keyframe drop: push the AddToOptimizer packet;
  5. collect closed-loop notifications (highlighting only).

Unlike the reference — which prints FAILURE and exits on tracking loss
(stereo_slam.cpp:706-710) — tracking failure is surfaced to the caller.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.models.backend import Backend
from scavislam_tpu.models.frontend import StereoFrontend
from scavislam_tpu.models.placerec import PlaceRecognizer
from scavislam_tpu.pipeline.monitors import (
    BackendMonitor,
    PlaceRecognizerMonitor,
)
from scavislam_tpu.utils.config import Config
from scavislam_tpu.utils.perfmon import PerformanceMonitor

# the reference's 11 named stages (stereo_slam.cpp:174-184)
STAGES = (
    "drawing", "back end", "grab frame", "preprocess", "stereo",
    "dense tracking", "fast", "match", "process points", "drop keyframe",
    "dense point cloud",
)


class SlamSystem:
    def __init__(self, cam: StereoCamera, cfg: Config = None,
                 threaded: bool = False, enable_loop_closure: bool = True,
                 vocabulary=None, pipelined: bool = False,
                 pipeline_depth: int = None, pr_lossless: bool = False):
        # pr_lossless: feed EVERY keyframe to place recognition through a
        # FIFO instead of the reference's newest-only/refusing mailbox
        # (placerecognizer.cpp:36-63). Use for benchmarks/offline runs where
        # frames stream faster than real time: with the reference semantics,
        # which keyframes get indexed depends on thread scheduling and loop
        # detection becomes non-deterministic run-to-run.
        # pipeline_depth: frames in flight before results are consumed.
        # Pick ~ceil(link_RTT / frame_period): depth 2 suits 512x384
        # (~16 ms/frame vs ~28 ms RTT); small frames (256x192, ~10 ms)
        # need 3-4 or every consume stalls on the fetch.
        self.cfg = cfg or Config()
        self.cam = cam
        self.per_mon = PerformanceMonitor()
        for s in STAGES:
            self.per_mon.add(s)

        self.backend_monitor = BackendMonitor()
        self.place_monitor = (
            PlaceRecognizerMonitor(lossless=pr_lossless)
            if enable_loop_closure else None
        )
        self.frontend = StereoFrontend(cam, self.cfg)
        self.frontend.per_mon = self.per_mon
        if pipeline_depth is not None:
            self.frontend.pipeline_depth = int(pipeline_depth)
        self.backend = Backend(cam, self.cfg, self.backend_monitor,
                               self.place_monitor)
        self.backend.per_mon = self.per_mon
        if not threaded:
            # unthreaded runs must be DETERMINISTIC (the TPU/CPU parity
            # benchmark depends on identical event ordering): disable the
            # wall-clock device-solve budget so every dirty query solves,
            # like the reference's per-query optimize
            self.backend.MIN_SOLVE_PERIOD_S = 0.0
        self.place_recognizer = (
            PlaceRecognizer(cam, vocabulary, self.place_monitor)
            if enable_loop_closure else None
        )
        if self.place_recognizer is not None:
            # fuse PR description into the keyframe-spawn device program:
            # the BoW block rides home in the spawn payload and the PR
            # thread does zero per-keyframe device work (it contended with
            # the frame loop for the host<->device link — measured ~25-30 ms
            # of tunnel time per keyframe indexed)
            self.frontend.pr_vocab = self.place_recognizer.vocab
        self.threaded = threaded
        self._stop = threading.Event()
        self._threads = []
        self.trajectory = []  # (frame_id, PoseRT T_cw estimate)
        self.closed_loops = []
        self.tracking_ok = True
        # relocalization (no reference analogue — the reference exits on
        # tracking failure): when place recognition is available, a failure
        # puts the system in `lost` mode; each new frame is BoW-queried
        # against the keyframe index until a geometric check re-seeds the
        # pose. relocalizations counts successful recoveries.
        self.lost = False
        self.relocalizations = 0
        # pipelined: overlap the device step with the host fetch/policy of
        # the previous frame (keyframe decisions lag one frame)
        self.pipelined = pipelined

        if threaded:
            t_be = threading.Thread(
                target=self.backend.run, args=(self._stop,), daemon=True
            )
            t_be.start()
            self._threads.append(t_be)
            if self.place_recognizer is not None:
                t_pr = threading.Thread(
                    target=self.place_recognizer.run, args=(self._stop,),
                    daemon=True,
                )
                t_pr.start()
                self._threads.append(t_pr)

    # ------------------------------------------------------------------ #
    def process_first_frame(self, frame: dict):
        pkt = self.frontend.process_first_frame(frame)
        self.backend_monitor.pushKeyframe(pkt)
        if not self.threaded:
            self._drain_workers()
        self.trajectory.append(
            (frame.get("frame_id", 0), self.frontend._world_pose())
        )

    def process_frame(self, frame: dict) -> bool:
        """One main-loop iteration. Returns False on tracking failure
        (unrecoverable: no place recognizer, or relocalization pending —
        the system stays alive in `lost` mode while one is available)."""
        pm = self.per_mon
        pm.new_frame()

        if self.lost:
            if self._try_relocalize(frame):
                self.lost = False
                self.tracking_ok = True
                self.relocalizations += 1
            return True  # stay alive; keep consuming frames while lost

        # neighborhood adoption (stereo_slam.cpp:694-703)
        nb = self.backend_monitor.getNeighborhood()
        if nb is not None:
            self.frontend.apply_neighborhood(nb)

        # All device-side stages (preprocess/stereo/dense tracking/fast/
        # match) are FUSED into one XLA program here, so unlike the
        # reference they cannot be bracketed individually; the fused
        # dispatch+consume is accounted under "dense tracking" (its dominant
        # component) and the host-side stages keep their own timers.
        pm.start("dense tracking")
        if self.pipelined:
            res = self.frontend.process_frame_pipelined(frame)
            if res is None:
                pm.stop("dense tracking")
                return True  # pipeline still filling; nothing consumed yet
            success, dropped, consumed_id = res
        else:
            success, dropped = self.frontend.process_frame(frame)
            consumed_id = frame.get("frame_id", len(self.trajectory))
        pm.stop("dense tracking")
        if not success:
            if self.place_recognizer is not None:
                self.lost = True
                # drop stale in-flight frames; relocalization restarts the
                # chain from scratch
                self.frontend._pending.clear()
                return True
            self.tracking_ok = False
            return False

        self.backend_monitor.queryNeighborhood(self.frontend.actkey_id)
        for pkt in self.frontend.take_ready_packets():
            self.backend_monitor.pushKeyframe(pkt)

        loop = self.backend_monitor.getClosedLoop()
        if loop is not None:
            self.closed_loops.append(loop)

        if not self.threaded:
            self._drain_workers()

        self.trajectory.append(
            (consumed_id, self.frontend._world_pose())
        )
        return True

    def _try_relocalize(self, frame: dict) -> bool:
        """Kidnapped-robot recovery: run the fused step for this frame's
        pyramid + disparity (its pose output is garbage and discarded),
        BoW-query the place index with NO covisibility exclusions, and on a
        passed geometric check re-seed the frontend at
        T_query_from_loop * T_loop_from_world."""
        import jax.numpy as jnp

        fe = self.frontend
        cand = np.full((len(fe._collect_candidates()),), -1, np.int64)
        out = fe._run_step(frame, cand)
        hit = self.place_recognizer.relocalize(out.pyr[0], out.disp)
        if hit is None:
            return False
        loop_id, (R_ql, t_ql) = hit
        # loop keyframe's world pose: prefer the backend-optimized graph
        g = self.backend.graph
        if loop_id in g.vertices:
            R_lw = np.asarray(g.vertices[loop_id].R, np.float32)
            t_lw = np.asarray(g.vertices[loop_id].t, np.float32)
        elif loop_id in fe.pose_np:
            R_lw, t_lw = fe.pose_np[loop_id]
        else:
            return False
        R_qw = (R_ql @ R_lw).astype(np.float32)
        t_qw = (R_ql @ t_lw + t_ql).astype(np.float32)
        fe.reseed(R_qw, t_qw, actkey_id=loop_id)
        # the step's rolled cloud state anchors dense tracking at THIS
        # frame, so the next frame tracks normally from the recovered pose
        fe._roll(out)
        self.trajectory.append(
            (frame.get("frame_id", len(self.trajectory)),
             fe._world_pose())
        )
        return True

    def _drain_workers(self):
        def drain_backend():
            while True:
                if self.backend.step():
                    continue
                # deterministic unthreaded semantics: BLOCK on in-flight
                # async work (registration fetch, solve fetch) instead of
                # letting it land on a later frame — threaded runs overlap
                # these, unthreaded runs (tests, the TPU/CPU parity
                # benchmark) need identical event ordering on every backend
                if self.backend._pending_reg is not None:
                    self.backend._pending_reg[2].result()
                    continue
                if self.backend.graph.solve_pending():
                    self.backend.graph.finish_pending()
                    continue
                break

        drain_backend()
        if self.place_recognizer is not None:
            while self.place_recognizer.step():
                pass
            # loops found by PR need one more backend pass
            drain_backend()

    # ------------------------------------------------------------------ #
    def finish(self, timeout: float = 60.0):
        """Drain pending backend / place-recognition work after the last
        frame. The reference's worker threads keep consuming while the GUI
        idles (stereo_slam.cpp main loop runs until quit); without this, a
        threaded run that ends right after the last frame abandons queued
        keyframes — and any loop closure they would have produced."""
        self._flush_frontend()
        if not self.threaded:
            self._drain_workers()
        else:
            t0 = time.time()
            while time.time() - t0 < timeout:
                loop = self.backend_monitor.getClosedLoop()
                if loop is not None:
                    self.closed_loops.append(loop)
                    continue
                busy = (
                    len(self.backend_monitor.keyframes) > 0
                    or getattr(self.backend, "working", False)
                    or bool(self.backend.local_registration_stack)
                    or self.backend._pending_reg is not None
                    or self.backend.graph.solve_pending()
                    or (self.place_monitor is not None
                        and (self.place_monitor.pending()
                             or getattr(self.place_recognizer, "working",
                                        False)))
                )
                if not busy:
                    break
                time.sleep(0.005)
        # adopt any async BA solve still in flight (the drain loops above
        # stop as soon as no *poll* work remains, which can precede the fetch)
        self.backend.graph.finish_pending()
        loop = self.backend_monitor.getClosedLoop()
        while loop is not None:
            self.closed_loops.append(loop)
            loop = self.backend_monitor.getClosedLoop()

    def _flush_frontend(self):
        if self.pipelined and (len(self.frontend._pending) > 0
                               or self.frontend._pending_spawn is not None):
            for success, dropped, fid, pose, pkt in \
                    self.frontend.flush_pipeline():
                if not success:
                    self.tracking_ok = False
                    break
                if fid is not None:
                    self.trajectory.append((fid, pose))
            for pkt in self.frontend.take_ready_packets():
                self.backend_monitor.pushKeyframe(pkt)

    def shutdown(self):
        self._flush_frontend()
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5.0)

    def export_trajectory(self) -> np.ndarray:
        """(N, 8): frame_id, tx, ty, tz, qw... — actually stores the 6-dof
        log for compactness: frame_id + translation + rotation-log."""
        rows = []
        for fid, T in self.trajectory:
            xi = np.asarray(T.log())
            rows.append(np.concatenate([[fid], np.asarray(T.t), xi[3:]]))
        return np.asarray(rows)


def ate_rmse_aligned(trajectory, gt_poses, with_scale: bool = True) -> float:
    """ATE RMSE after a closed-form Sim3 (Umeyama) alignment of the camera
    centers. Monocular trajectories are defined up to one global similarity
    (scale gauged by the inverse-depth prior), so this is THE mono metric;
    with_scale=False gives the SE3-aligned variant."""
    from scavislam_tpu.core.lie import PoseRT

    est, gt = [], []
    for (fid, T_est), T_gt in zip(trajectory, gt_poses):
        Te = PoseRT.from_any(T_est)
        Tg = PoseRT.from_any(T_gt)
        est.append(-Te.R.T @ Te.t)  # camera centers in world
        gt.append(-Tg.R.T @ Tg.t)
    from scavislam_tpu.core.lie import umeyama_sim3

    est = np.stack(est)
    gt = np.stack(gt)
    s, R, t = umeyama_sim3(est, gt, with_scale=with_scale)
    resid = gt - (s * est @ R.T + t)
    return float(np.sqrt((resid ** 2).sum(axis=1).mean()))


def ate_rmse(trajectory, gt_poses) -> float:
    """Absolute trajectory error (translation RMSE), no alignment: both
    trajectories share the first-frame gauge. All math in numpy — an eager
    jnp compose + fetch per pose costs a tunnel round-trip each."""
    from scavislam_tpu.core.lie import PoseRT

    errs = []
    for (fid, T_est), T_gt in zip(trajectory, gt_poses):
        e = PoseRT.from_any(T_est) @ PoseRT.from_any(T_gt).inverse()
        errs.append(e.t)
    errs = np.stack(errs)
    return float(np.sqrt((errs**2).sum(axis=1).mean()))
