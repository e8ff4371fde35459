"""Stereo front-end: per-frame tracking, keyframe policy, map-point creation.

Re-implements the reference's StereoFrontend
(/root/reference/scavislam/stereo_frontend.{h,cpp}) as a thin host
orchestrator over jitted device stages. Per-frame pipeline
(parity: StereoFrontend::processFrame, stereo_frontend.cpp:183-306):

 1. preprocess (pyramid + gradients)                 [device]
 2. dense tracking vs previous frame's cloud         [device, one program]
 3. block-matching disparity                         [device]
 4. FAST corner buckets per pyramid level            [device]
 5. guided matching of candidate map points          [device]
 6. robust motion-only BA (>=20 obs or failure,
    stereo_frontend.cpp:1053-1056)                   [device]
 7. reprojection gating (+-max_reproj_error * 2^l px,
    +-6 px disparity; stereo_frontend.cpp:834-974)   [device]
 8. keyframe switch / drop decisions                 [host, scalar stats]
 9. new-keyframe assembly: covis strengths, per-cell
    point replenishment with clearance
    (stereo_frontend.cpp:309-443, 706-823)           [device + host ids]
10. dense point cloud for the next frame             [device]

Host<->device traffic per frame: candidate-id index arrays down, a handful of
policy scalars back — the images and map tables stay device-resident
(SURVEY.md §2 "parallelism strategies" item 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.core.transforms import psi_from_xyz
from scavislam_tpu.models.dense_tracker import (
    cloud_pyramid_from_disparity,
    dense_tracking,
)
from scavislam_tpu.models.map_store import (
    MAX_KEYFRAMES,
    MAX_POINTS,
    PointTable,
    PoseTable,
    materialize_points,
)
from scavislam_tpu.models.matcher import _match_level, capture_source_patches
from scavislam_tpu.models.pose_optimizer import motion_only_ba_robust
from scavislam_tpu.ops.fast import corner_buckets, detect_corners_grid
from scavislam_tpu.ops.image import preprocess_frame_jit
from scavislam_tpu.ops.stereo import block_matching_disparity
from scavislam_tpu.utils.config import Config

# static capacities
CAND_CAP = 1536  # candidate points considered per frame
NEW_PER_LEVEL = (320, 96, 32)  # new points per keyframe per level
# (reference budget: <=300*4^-l at level 0, stereo_frontend.cpp:743)
MIN_TRACK_OBS = 20  # tracking failure threshold (stereo_frontend.cpp:1053)


@dataclass
class AddToOptimizer:
    """Frontend -> backend keyframe packet
    (parity: AddToOptimzer [sic], data_structures.h:153-171). Carries the
    new points' full payload (psi/level/uvu) so the backend graph needs no
    access to frontend internals, plus immutable snapshots of the device
    tables and this keyframe's pyramid for local registration / loop
    closure re-matching (the reference clones the frame, keyframes.h:48-88;
    jax arrays are immutable so a reference IS a snapshot)."""

    kf_id: int
    T_kw: SE3
    new_point_ids: np.ndarray  # global ids of newly created points
    new_psi: np.ndarray  # (m, 3) inverse-depth in this keyframe's frame
    new_levels: np.ndarray  # (m,)
    new_uvu: np.ndarray  # (m, 3) creation observation, level-0 uvu
    tracked_point_ids: np.ndarray  # ids of re-observed points
    tracked_obs: np.ndarray  # (n, 3) level-0 uvu
    tracked_levels: np.ndarray  # (n,)
    covis_strengths: dict  # kf_id -> shared-feature count
    pyr: tuple = None  # this keyframe's image pyramid (device arrays)
    disp: object = None  # level-0 disparity
    points_snapshot: object = None  # PointTable at packet time
    poses_snapshot: object = None  # PoseTable at packet time


@dataclass
class FrontendDrawData:
    """Minimal draw snapshot (parity surface: StereoFrontendDrawData,
    stereo_frontend.h:41-82)."""

    tracked_uv: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    new_uv: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))
    corners_uv: np.ndarray = field(default_factory=lambda: np.zeros((0, 2)))


class TrackingFailure(Exception):
    pass


class StereoFrontend:
    """Host shell; all bulk math on device. Public surface mirrors
    stereo_frontend.h:85-128: initialize / processFirstFrame / processFrame,
    `to_optimizer_stack`, `T_cur_from_actkey`, `actkey_id`, `neighborhood`."""

    def __init__(self, cam: StereoCamera, cfg: Config = None):
        self.cfg = cfg or Config()
        self.cam = cam
        self.levels = self.cfg.use_n_levels_in_frontent
        self.cams = [cam.scale_level(l) for l in range(self.levels)]
        self.poses = PoseTable.empty()
        self.points = PointTable.empty()

        self.next_kf = 0
        self.next_point = 0
        self.kf_point_ids: dict[int, np.ndarray] = {}
        self.covis: dict[int, dict[int, int]] = {}
        self.keyframe_map: dict[int, dict] = {}  # kf_id -> snapshot for backend
        self.actkey_id = -1
        self.T_cur_from_actkey = SE3.identity()
        self.neighborhood = None  # set by the pipeline from backend output
        self.to_optimizer_stack: list[AddToOptimizer] = []
        self.draw_data = FrontendDrawData()

        # per-frame rolling state
        self._prev_clouds = None
        self._prev_intens = None
        self._prev_valids = None
        self._num_disp = 16 * self.cfg.ui.num_disp16
        self.frame_id = -1

        # tracked set: ids currently matched (for covis + track stats)
        self._tracked_ids = np.zeros((0,), np.int64)
        self._tracked_obs = np.zeros((0, 3), np.float32)
        self._tracked_levels = np.zeros((0,), np.int64)

    # ------------------------------------------------------------------ #
    def _preprocess(self, left, right):
        pre = preprocess_frame_jit(left, self.levels)
        disp = block_matching_disparity(
            left, right, num_disp=self._num_disp, radius=5
        )
        buckets = [
            corner_buckets(
                pre["pyr"][l],
                threshold=10.0 / 255.0,
                cells_y=max(self.cams[l].height // 8, 4),
                cells_x=max(self.cams[l].width // 8, 4),
                per_cell=4,
            )
            for l in range(self.levels)
        ]
        return pre, disp, buckets

    def _world_pose(self) -> SE3:
        """T_cur_from_world from the (possibly backend-updated) actkey pose."""
        T_ak_w = SE3(self.poses.R[self.actkey_id], self.poses.t[self.actkey_id])
        return self.T_cur_from_actkey @ T_ak_w

    # ------------------------------------------------------------------ #
    def process_first_frame(self, frame: dict):
        """Bootstrap: make frame 0 the first keyframe at the origin.
        Parity: StereoFrontend::processFirstFrame (stereo_frontend.cpp)."""
        self.frame_id = frame.get("frame_id", 0)
        left, right = frame["left"], frame["right"]
        pre, disp, buckets = self._preprocess(left, right)
        if "disp_gt" in frame and frame.get("use_gt_disp", False):
            disp = frame["disp_gt"]
        kf_id = self._new_keyframe_id()
        T_kw = frame.get("T_cw_init", SE3.identity())
        self.poses = self.poses.set(kf_id, T_kw)
        self.actkey_id = kf_id
        self.T_cur_from_actkey = SE3.identity()
        new_ids, new_psi, new_lvl, new_uvu = self._spawn_points(
            kf_id, pre, disp, buckets, tracked_uv0=None
        )
        self.kf_point_ids[kf_id] = new_ids
        self.covis[kf_id] = {}
        self.keyframe_map[kf_id] = {
            "pyr": pre["pyr"], "disp": disp, "T_kw": T_kw,
        }
        pkt = AddToOptimizer(
            kf_id, T_kw, new_ids, new_psi, new_lvl, new_uvu,
            np.zeros(0, np.int64),
            np.zeros((0, 3), np.float32), np.zeros(0, np.int64), {},
            pyr=pre["pyr"], disp=disp,
            points_snapshot=self.points, poses_snapshot=self.poses,
        )
        self.to_optimizer_stack.append(pkt)
        self._roll_dense_state(pre, disp, SE3.identity())
        return pkt

    # ------------------------------------------------------------------ #
    def process_frame(self, frame: dict):
        """Track one frame. Returns (success, dropped_new_keyframe)."""
        self.frame_id = frame.get("frame_id", self.frame_id + 1)
        left, right = frame["left"], frame["right"]
        pre, disp, buckets = self._preprocess(left, right)
        if "disp_gt" in frame and frame.get("use_gt_disp", False):
            disp = frame["disp_gt"]

        # -- 1. dense tracking prior (stereo_frontend.cpp:192-196)
        cur = {"pyr": pre["pyr"], "dx": pre["dx"], "dy": pre["dy"]}
        dt = dense_tracking(
            cur,
            self._prev_clouds,
            self._prev_intens,
            self._prev_valids,
            self.cams,
            self.T_cur_from_actkey,
        )
        self.T_cur_from_actkey = dt.T

        # -- 2. candidate assembly (host ids -> device gather)
        cand_ids = self._collect_candidates()
        T_cw_est = self._world_pose()

        xyz_w, R_aw, t_aw, patches, ok = materialize_points(
            self.poses, self.points, jnp.asarray(cand_ids)
        )
        levels_arr = np.asarray(self.points.level)[np.clip(cand_ids, 0, MAX_POINTS - 1)]

        # -- 3. guided matching per level
        obs_all = np.zeros((CAND_CAP, 3), np.float32)
        matched_all = np.zeros((CAND_CAP,), bool)
        corner_all = np.zeros((CAND_CAP, 2), np.float32)
        for l in range(self.levels):
            lvl_mask = jnp.asarray((levels_arr == l) & (cand_ids >= 0))
            res = _match_level(
                (self.cams[l].focal, self.cams[l].pp[0], self.cams[l].pp[1],
                 self.cams[l].baseline),
                self.cams[l].size,
                pre["pyr"][l],
                T_cw_est.R, T_cw_est.t,
                xyz_w,
                R_aw, t_aw,
                patches,
                ok & lvl_mask,
                buckets[l]["uv"], buckets[l]["valid"],
                disp,
                l,
                0.18,
                10.0,
            )
            m = np.asarray(res.matched)
            obs_all[m] = np.asarray(res.obs_uvu)[m]
            matched_all |= m
            corner_all[m] = np.asarray(res.corner_uv)[m]

        n_matched = int(matched_all.sum())
        if n_matched < MIN_TRACK_OBS:
            return False, False

        # -- 4. robust motion-only BA (stereo_frontend.cpp:977-1065)
        weights = jnp.asarray(
            (0.25 ** levels_arr) * matched_all.astype(np.float32)
        )
        ba = motion_only_ba_robust(
            self.cam,
            T_cw_est,
            xyz_w,
            jnp.asarray(obs_all),
            weights,
            jnp.asarray(matched_all),
            huber_delta=1.0,
            reject_thresh=float(self.cfg.ui.max_reproj_error) * 2.0,
        )
        T_cw = ba.T
        T_ak_w = SE3(self.poses.R[self.actkey_id], self.poses.t[self.actkey_id])
        self.T_cur_from_actkey = T_cw @ T_ak_w.inverse()

        # -- 5. reprojection gating (stereo_frontend.cpp:834-974)
        resid = np.asarray(ba.residuals)
        lvl_scale = (2.0 ** levels_arr).astype(np.float32)
        max_err = float(self.cfg.ui.max_reproj_error)
        gate = (
            matched_all
            & np.asarray(ba.inlier_mask)
            & (np.abs(resid[:, 0]) < max_err * lvl_scale)
            & (np.abs(resid[:, 1]) < max_err * lvl_scale)
            & (np.abs(resid[:, 0] - resid[:, 2]) < 6.0)
        )
        n_gated = int(gate.sum())
        if n_gated < MIN_TRACK_OBS:
            return False, False

        self._tracked_ids = cand_ids[gate]
        self._tracked_obs = obs_all[gate]
        self._tracked_levels = levels_arr[gate]
        self.draw_data.tracked_uv = obs_all[gate][:, :2]

        # -- 6. keyframe policy (stereo_frontend.cpp:445-528)
        dropped = False
        switched = self._maybe_switch_keyframe()
        if not switched and self._shall_drop_keyframe(gate, obs_all):
            self._add_new_keyframe(pre, disp, buckets, T_cw)
            dropped = True

        # -- 7. dense cloud for next frame (stereo_frontend.cpp:297-303)
        self._roll_dense_state(pre, disp, self.T_cur_from_actkey)
        return True, dropped

    # ------------------------------------------------------------------ #
    def _collect_candidates(self) -> np.ndarray:
        """actkey's points + covis neighbors' points + neighborhood list,
        deduped, padded to CAND_CAP with -1
        (parity: the 3-stage matching of stereo_frontend.cpp:977-1050)."""
        lists = []
        if self.actkey_id in self.kf_point_ids:
            lists.append(self.kf_point_ids[self.actkey_id])
        for nbr in sorted(
            self.covis.get(self.actkey_id, {}),
            key=lambda k: -self.covis[self.actkey_id][k],
        ):
            lists.append(self.kf_point_ids.get(nbr, np.zeros(0, np.int64)))
        if self.neighborhood is not None:
            lists.append(np.asarray(self.neighborhood.get("point_ids", []),
                                    np.int64))
        if lists:
            ids = np.concatenate(lists)
            ids = pd_unique(ids)
        else:
            ids = np.zeros(0, np.int64)
        out = np.full((CAND_CAP,), -1, np.int64)
        n = min(len(ids), CAND_CAP)
        out[:n] = ids[:n]
        return out

    # ------------------------------------------------------------------ #
    def _shall_drop_keyframe(self, gate, obs_all) -> bool:
        """Parity: stereo_frontend.cpp:512-528 — drop when
        (a) >= featureless_thr image quadrants have < min_num_points tracked,
        (b) parallax ||t|| exceeds parallax_thr, or
        (c) average track length exceeds new_keyframe_pixel_thr."""
        cfg = self.cfg
        w, h = self.cam.size
        uv = obs_all[gate][:, :2]
        qx = (uv[:, 0] > w / 2).astype(int)
        qy = (uv[:, 1] > h / 2).astype(int)
        quad_counts = np.bincount(qy * 2 + qx, minlength=4)
        featureless = int((quad_counts < cfg.ui.min_num_points).sum())
        if featureless >= cfg.frontend.new_keyframe_featureless_corners_thr:
            return True
        if float(jnp.linalg.norm(self.T_cur_from_actkey.t)) > cfg.ui.parallax_thr:
            return True
        # average track length for points anchored at actkey
        ids = self._tracked_ids
        anch = np.asarray(self.points.anchor)[np.clip(ids, 0, MAX_POINTS - 1)]
        own = anch == self.actkey_id
        if own.sum() > 0:
            uv0 = np.asarray(self.points.uv0)[ids[own]]
            track_len = np.linalg.norm(
                self._tracked_obs[own][:, :2] - uv0, axis=-1
            )
            if float(track_len.mean()) > cfg.frontend.new_keyframe_pixel_thr:
                return True
        return False

    def _maybe_switch_keyframe(self) -> bool:
        """Parity: stereo_frontend.cpp:445-510 — retarget actkey if another
        covisible keyframe is closer than half the parallax threshold and
        shares >100 tracked features."""
        ids = self._tracked_ids
        if len(ids) == 0 or self.actkey_id < 0:
            return False
        anch = np.asarray(self.points.anchor)[np.clip(ids, 0, MAX_POINTS - 1)]
        t_cur_norm = float(jnp.linalg.norm(self.T_cur_from_actkey.t))
        T_cw = self._world_pose()
        best = None
        for nbr in self.covis.get(self.actkey_id, {}):
            shared = int((anch == nbr).sum())
            if shared <= 100:
                continue
            T_nw = SE3(self.poses.R[nbr], self.poses.t[nbr])
            d = float(jnp.linalg.norm((T_cw @ T_nw.inverse()).t))
            if d < 0.5 * self.cfg.ui.parallax_thr and d < t_cur_norm:
                if best is None or d < best[1]:
                    best = (nbr, d)
        if best is None:
            return False
        new_ak = best[0]
        T_nw = SE3(self.poses.R[new_ak], self.poses.t[new_ak])
        self.T_cur_from_actkey = self._world_pose() @ T_nw.inverse()
        self.actkey_id = new_ak
        return True

    # ------------------------------------------------------------------ #
    def _new_keyframe_id(self) -> int:
        kf = self.next_kf
        assert kf < MAX_KEYFRAMES, "keyframe table full"
        self.next_kf += 1
        return kf

    def _spawn_points(self, kf_id, pre, disp, buckets, tracked_uv0):
        """Create new anchored points from corners with valid disparity,
        respecting clearance from already-tracked observations
        (parity: addMorePoints, stereo_frontend.cpp:706-823)."""
        all_new = []
        all_psi, all_lvl, all_uvu = [], [], []
        for l in range(self.levels):
            cap = NEW_PER_LEVEL[l]
            uv, score, valid = detect_corners_grid(
                pre["pyr"][l],
                threshold=10.0 / 255.0,
                cells_y=3,
                cells_x=3,
                per_cell=-(-cap // 9),
            )
            uv_np = np.asarray(uv)
            ok = np.array(valid)  # writable copy
            s = 2**l
            uv0 = (uv_np + 0.5) * s - 0.5
            d0 = np.asarray(disp)
            ui = np.clip(np.round(uv0[:, 0]).astype(int), 0, d0.shape[1] - 1)
            vi = np.clip(np.round(uv0[:, 1]).astype(int), 0, d0.shape[0] - 1)
            dvals = d0[vi, ui]
            ok &= dvals > 0.5
            # clearance vs tracked observations (reference: quadtree-gated
            # 2 px clearance; here a brute-force distance test, still tiny)
            if tracked_uv0 is not None and len(tracked_uv0) > 0:
                clearance = self.cfg.frontend.newpoint_clearance * s
                d2 = (
                    (uv0[:, None, 0] - tracked_uv0[None, :, 0]) ** 2
                    + (uv0[:, None, 1] - tracked_uv0[None, :, 1]) ** 2
                )
                ok &= d2.min(axis=1) > clearance * clearance
            # keep top `cap` by score among ok
            order = np.argsort(-np.asarray(score) * ok)
            keep = order[:cap]
            uv_l = uv_np[keep]
            uv0_k = uv0[keep]
            ok_k = ok[keep]
            d_k = dvals[keep]

            # psi in the new keyframe's frame (xyz from level camera)
            cam_l = self.cams[l]
            d_safe = np.where(ok_k, d_k, 1.0)
            xyz_a = np.asarray(
                cam_l.uv_disp_to_xyz(
                    jnp.asarray(uv_l[:, 0], jnp.float32),
                    jnp.asarray(uv_l[:, 1], jnp.float32),
                    jnp.asarray(d_safe, jnp.float32),
                )
            )
            psi = np.asarray(psi_from_xyz(jnp.asarray(xyz_a)))
            patches, p_ok = capture_source_patches(
                pre["pyr"][l], jnp.asarray(uv_l, jnp.float32)
            )
            ok_k = ok_k & np.asarray(p_ok)

            start = self.next_point
            assert start + cap <= MAX_POINTS, "point table full"
            self.points = self.points.insert_block(
                start,
                jnp.asarray(psi, jnp.float32),
                kf_id,
                jnp.full((cap,), l, jnp.int32),
                patches,
                jnp.asarray(uv0_k, jnp.float32),
                jnp.asarray(ok_k),
            )
            ids = np.arange(start, start + cap, dtype=np.int64)
            all_new.append(ids[ok_k])
            all_psi.append(psi[ok_k])
            all_lvl.append(np.full(int(ok_k.sum()), l, np.int64))
            uvu0 = np.stack(
                [uv0_k[:, 0], uv0_k[:, 1], uv0_k[:, 0] - d_k], axis=-1
            )
            all_uvu.append(uvu0[ok_k])
            self.next_point += cap
        if not all_new:
            z = np.zeros(0, np.int64)
            return z, np.zeros((0, 3)), z, np.zeros((0, 3))
        return (
            np.concatenate(all_new),
            np.concatenate(all_psi),
            np.concatenate(all_lvl),
            np.concatenate(all_uvu),
        )

    def _add_new_keyframe(self, pre, disp, buckets, T_cw: SE3):
        """Parity: addNewKeyframe (stereo_frontend.cpp:309-443)."""
        kf_id = self._new_keyframe_id()
        self.poses = self.poses.set(kf_id, T_cw)

        # covis strengths: count gated tracked points per anchor keyframe
        anch = np.asarray(self.points.anchor)[
            np.clip(self._tracked_ids, 0, MAX_POINTS - 1)
        ]
        strengths = {}
        for a, c in zip(*np.unique(anch, return_counts=True)):
            if int(c) >= self.cfg.frontend.covis_thr:
                strengths[int(a)] = int(c)
        self.covis[kf_id] = dict(strengths)
        for a, c in strengths.items():
            self.covis.setdefault(a, {})[kf_id] = c

        new_ids, new_psi, new_lvl, new_uvu = self._spawn_points(
            kf_id, pre, disp, buckets, tracked_uv0=self._tracked_obs[:, :2]
        )
        # the keyframe "owns" its new points plus the tracked ones
        self.kf_point_ids[kf_id] = np.concatenate(
            [new_ids, self._tracked_ids]
        )
        self.keyframe_map[kf_id] = {
            "pyr": pre["pyr"], "disp": disp, "T_kw": T_cw,
        }
        pkt = AddToOptimizer(
            kf_id,
            T_cw,
            new_ids, new_psi, new_lvl, new_uvu,
            self._tracked_ids.copy(),
            self._tracked_obs.copy(),
            self._tracked_levels.copy(),
            strengths,
            pyr=pre["pyr"], disp=disp,
            points_snapshot=self.points, poses_snapshot=self.poses,
        )
        self.to_optimizer_stack.append(pkt)
        self.actkey_id = kf_id
        self.T_cur_from_actkey = SE3.identity()

    # ------------------------------------------------------------------ #
    def apply_neighborhood(self, nb):
        """Adopt a backend-optimized neighborhood: update device pose/point
        tables and the candidate point list. Mirrors the reference's
        neighborhood adoption in the main loop (stereo_slam.cpp:694-703),
        which only adopts when the current actkey is included."""
        if nb is None or self.actkey_id not in nb.get("kf_ids", []):
            return False
        import jax.numpy as jnp

        for kf, (R, t) in nb.get("poses", {}).items():
            self.poses = self.poses.set(
                int(kf),
                SE3(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)),
            )
        pids = nb.get("psi_ids")
        if pids is not None and len(pids) > 0:
            psi_new = jnp.asarray(nb["psi_vals"], jnp.float32)
            self.points = self.points._replace(
                psi=self.points.psi.at[jnp.asarray(pids)].set(psi_new)
            )
        self.neighborhood = nb
        return True

    # ------------------------------------------------------------------ #
    def _roll_dense_state(self, pre, disp, T_cur_from_actkey: SE3):
        clouds, valids = cloud_pyramid_from_disparity(
            disp, self.cam, T_cur_from_actkey, self.levels
        )
        self._prev_clouds = clouds
        self._prev_valids = valids
        self._prev_intens = tuple(p.reshape(-1) for p in pre["pyr"])


def pd_unique(ids: np.ndarray) -> np.ndarray:
    """Order-preserving unique (first occurrence wins)."""
    _, idx = np.unique(ids, return_index=True)
    return ids[np.sort(idx)]
