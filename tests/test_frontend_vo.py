"""End-to-end visual odometry: frontend over a synthetic sequence, ATE check.

This is the "minimum end-to-end slice" milestone of SURVEY.md §7 step 4:
grabber + preprocessing + dense tracking + disparity + FAST + guided matching
+ motion-only BA + keyframe policy, no backend optimization yet (poses chain
from the keyframe graph exactly as the reference behaves before any optimize
call runs).
"""

import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.models.frontend import StereoFrontend
from scavislam_tpu.utils.config import Config

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)


def run_vo(n_frames=8, kind="forward_arc", step=0.02, use_gt_disp=False):
    seq = SyntheticSequence(CAM, n_frames=n_frames, kind=kind, step=step)
    fe = StereoFrontend(CAM, Config())
    f0 = seq.frame(0)
    f0["use_gt_disp"] = use_gt_disp
    fe.process_first_frame(f0)
    est, gt = [f0["T_cw_gt"]], [f0["T_cw_gt"]]
    for i in range(1, n_frames):
        f = seq.frame(i)
        f["use_gt_disp"] = use_gt_disp
        success, dropped = fe.process_frame(f)
        assert success, f"tracking failed at frame {i}"
        est.append(fe._world_pose())
        gt.append(f["T_cw_gt"])
    return fe, est, gt


def ate_rmse(est, gt):
    errs = []
    for Te, Tg in zip(est, gt):
        errs.append(np.asarray((Te @ Tg.inverse()).t))
    errs = np.stack(errs)
    return float(np.sqrt((errs**2).sum(axis=1).mean()))


class TestVisualOdometry:
    def test_short_sequence_ate(self):
        fe, est, gt = run_vo(n_frames=8)
        ate = ate_rmse(est, gt)
        assert ate < 0.02, f"ATE {ate:.4f} m too large"

    def test_keyframes_created_on_motion(self):
        fe, est, gt = run_vo(n_frames=10, step=0.06)
        # moving ~0.1m/frame with parallax_thr 0.75 should still mostly hold
        # one keyframe; with enough motion eventually drops a second one
        assert fe.next_kf >= 1
        assert len(fe.to_optimizer_stack) == fe.next_kf

    def test_point_map_grows(self):
        fe, est, gt = run_vo(n_frames=4)
        assert fe.next_point > 0
        valid = np.asarray(fe.points.valid)
        assert valid.sum() > 100

    def test_tracking_failure_reported(self):
        seq = SyntheticSequence(CAM, n_frames=2)
        fe = StereoFrontend(CAM, Config())
        f0 = seq.frame(0)
        fe.process_first_frame(f0)
        # feed a black frame: no corners, no matches -> failure, no crash
        blank = {
            "frame_id": 1,
            "left": jnp.zeros_like(f0["left"]),
            "right": jnp.zeros_like(f0["right"]),
        }
        success, dropped = fe.process_frame(blank)
        assert not success


class TestPipelinedMode:
    def test_pipelined_matches_sync_trajectory(self):
        """Pipelined execution (policy lag 1 frame) must track the same
        trajectory within a small tolerance."""
        from scavislam_tpu.pipeline.slam_system import SlamSystem
        from scavislam_tpu.utils.config import Config as Cfg

        seq = SyntheticSequence(CAM, n_frames=8, step=0.02)
        frames = [seq.frame(i) for i in range(8)]

        results = {}
        for mode in ("sync", "pipe"):
            sysm = SlamSystem(CAM, Cfg(), threaded=False,
                              enable_loop_closure=False,
                              pipelined=(mode == "pipe"))
            sysm.process_first_frame(frames[0])
            for f in frames[1:]:
                assert sysm.process_frame(dict(f))
            sysm.shutdown()
            results[mode] = {fid: T for fid, T in sysm.trajectory}

        common = set(results["sync"]) & set(results["pipe"])
        assert len(common) >= 6
        for fid in common:
            d = (results["sync"][fid] @ results["pipe"][fid].inverse()).log()
            assert float(jnp.max(jnp.abs(d))) < 5e-3, (fid, np.asarray(d))


class TestAutoPipelineDepth:
    """The staleness guard (frontend._effective_depth): depth x rotation
    rate must stay within the matcher-search-radius rotation budget.
    Pure host policy — no device programs compile here."""

    def _fe(self, depth):
        fe = StereoFrontend(CAM, Config())
        fe.pipeline_depth = depth
        return fe

    def test_no_clamp_before_warmup_or_when_slow(self):
        fe = self._fe(4)
        assert fe._effective_depth() == 4  # no rotation history yet
        for _ in range(8):
            fe._rot_hist.append(np.radians(0.2))  # slow pan
        assert fe._effective_depth() == 4

    def test_clamps_fast_rotation(self):
        # config 2's measured failure point: 4 deg/frame at f=195 (depth 4
        # diverged at the old 10 px radius; the 16 px radius raises the
        # budget to ~16 deg -> depth 3 admitted, 4 still clamped)
        import dataclasses as dc

        cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
        fe = StereoFrontend(cam, Config())
        fe.pipeline_depth = 4
        for _ in range(8):
            fe._rot_hist.append(np.radians(4.0))
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            d = fe._effective_depth()
            assert d == 3, d  # budget ~16 deg / 4 deg-per-frame -> 3
            assert any("staleness budget" in str(x.message) for x in w)
        # warns once only
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            fe._effective_depth()
            assert not w

    def test_auto_depth_off_respects_raw_depth(self):
        fe = self._fe(4)
        fe.auto_depth = False
        for _ in range(8):
            fe._rot_hist.append(np.radians(30.0))
        assert fe._effective_depth() == 4
