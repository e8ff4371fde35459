"""Monocular mode: uv motion-only BA, the fused mono frame step, and
end-to-end mono VO (the reference's #ifdef-MONO scaffold, ENABLED).

Scale semantics: mono is gauge-free in scale — trajectories are asserted
after Sim3 (Umeyama) alignment. One camera/shape is shared by every test in
this file (each distinct shape is its own multi-second XLA compile).
"""

import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.pipeline.slam_system import ate_rmse_aligned

# ONE camera for the whole file (shared compiled programs)
CAM = StereoCamera.create(130.0, (63.5, 47.5), (128, 96), 0.12)
CAM_UV = (130.0, 63.5, 47.5)


class TestMotionOnlyBaUv:
    def test_recovers_pose_from_exact_uv(self):
        from scavislam_tpu.models.pose_optimizer import motion_only_ba_uv

        rng = np.random.RandomState(0)
        n = 64
        xyz_w = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                          rng.uniform(3, 9, n)], -1).astype(np.float32)
        T_gt = SE3.exp(jnp.asarray([0.08, -0.05, 0.1, 0.03, -0.04, 0.02],
                                   jnp.float32))
        y = xyz_w @ np.asarray(T_gt.R).T + np.asarray(T_gt.t)
        f, px, py = CAM_UV
        obs = np.stack([y[:, 0] / y[:, 2] * f + px,
                        y[:, 1] / y[:, 2] * f + py], -1).astype(np.float32)

        res = motion_only_ba_uv(
            CAM_UV, SE3.identity(), jnp.asarray(xyz_w), jnp.asarray(obs),
            jnp.ones(n, jnp.float32), jnp.ones(n, bool))
        err = np.asarray((res.T @ T_gt.inverse()).log())
        assert np.abs(err).max() < 1e-4, err
        assert float(res.chi2) < 1e-6

    def test_outliers_downweighted(self):
        from scavislam_tpu.models.pose_optimizer import motion_only_ba_uv

        rng = np.random.RandomState(1)
        n = 64
        xyz_w = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                          rng.uniform(3, 9, n)], -1).astype(np.float32)
        T_gt = SE3.exp(jnp.asarray([0.05, 0.02, 0.08, -0.02, 0.03, 0.01],
                                   jnp.float32))
        y = xyz_w @ np.asarray(T_gt.R).T + np.asarray(T_gt.t)
        f, px, py = CAM_UV
        obs = np.stack([y[:, 0] / y[:, 2] * f + px,
                        y[:, 1] / y[:, 2] * f + py], -1).astype(np.float32)
        obs[:8] += rng.uniform(15, 40, (8, 2))  # gross outliers

        res = motion_only_ba_uv(
            CAM_UV, SE3.identity(), jnp.asarray(xyz_w), jnp.asarray(obs),
            jnp.ones(n, jnp.float32), jnp.ones(n, bool))
        err = np.asarray((res.T @ T_gt.inverse()).log())
        # pseudo-Huber keeps the solution near truth despite 12% outliers
        assert np.abs(err).max() < 2e-2, err


def run_mono(n_frames, kind="forward_arc", step=0.035, **fe_kw):
    from scavislam_tpu.models.mono_frontend import MonoFrontend

    seq = SyntheticSequence(CAM, n_frames=n_frames, kind=kind, step=step)
    fe = MonoFrontend(CAM, **fe_kw)
    fe.process_first_frame(seq.frame(0))
    for i in range(1, n_frames):
        ok, _ = fe.process_frame(seq.frame(i))
        assert ok, f"tracking failed at frame {i}"
    gt = [seq.frame(i)["T_cw_gt"] for i in range(n_frames)]
    return fe, gt, seq


class TestMonoVo:
    def test_tracks_up_to_scale_and_depths_converge(self):
        """Forward-arc run: Sim3-aligned ATE small, and the information
        filter actually recovers metric structure — filtered inverse depths
        match ground truth (up to the global scale) for converged points."""
        n = 16
        fe, gt, seq = run_mono(n)
        ate = ate_rmse_aligned(fe.trajectory, gt)
        path_len = 0.0
        from scavislam_tpu.core.lie import PoseRT

        for a, b in zip(gt[:-1], gt[1:]):
            ca = -PoseRT.from_any(a).R.T @ PoseRT.from_any(a).t
            cb = -PoseRT.from_any(b).R.T @ PoseRT.from_any(b).t
            path_len += float(np.linalg.norm(cb - ca))
        assert ate < 0.06 * path_len, (ate, path_len)

        # depth convergence: compare filtered q to GT depth for kf0 points
        ids = fe.kf_point_ids[0]
        psi = np.asarray(fe.points.psi)[ids]
        lam_qq = np.asarray(fe.Lam)[ids, 2, 2]
        conv = lam_qq > fe.conv_q_info
        assert conv.sum() >= 30, f"only {conv.sum()} points converged"
        depth0 = np.asarray(seq.frame(0)["depth_gt"])
        uv0 = np.asarray(fe.points.uv0)[ids]  # ALREADY level-0 coords
        u_l0 = np.clip(uv0[:, 0].round().astype(int), 0, depth0.shape[1] - 1)
        v_l0 = np.clip(uv0[:, 1].round().astype(int), 0, depth0.shape[0] - 1)
        z_gt = depth0[v_l0, u_l0]
        z_est = 1.0 / np.maximum(psi[:, 2], 1e-6)
        sel = conv & (z_gt > 0.5)
        ratio = z_est[sel] / z_gt[sel]
        # depths correct up to the (single) scale gauge, tightly clustered
        med = np.median(ratio)
        frac_close = (np.abs(ratio / med - 1.0) < 0.15).mean()
        assert frac_close > 0.85, (med, frac_close)

    def test_pure_prior_scale_gauge(self):
        """The recovered global scale tracks the inverse-depth prior: with a
        prior 2x deeper, the trajectory scale halves (same Sim3-aligned
        shape). This pins down the documented scale-gauge semantics."""
        n = 8
        fe_a, gt, _ = run_mono(n, prior_idepth=0.25)
        fe_b, _, _ = run_mono(n, prior_idepth=0.125)
        ta = np.stack([np.asarray(T.t) for _f, T in fe_a.trajectory])
        tb = np.stack([np.asarray(T.t) for _f, T in fe_b.trajectory])
        na, nb = np.linalg.norm(ta[-1]), np.linalg.norm(tb[-1])
        assert 1.6 < nb / na < 2.4, (na, nb)
        # both align to GT equally well
        assert ate_rmse_aligned(fe_b.trajectory, gt) < 0.05

    def test_keyframes_and_covisibility(self):
        import dataclasses

        from scavislam_tpu.utils.config import Config

        # defaults (parallax 0.75 prior-scale units) keep this 16-frame run
        # keyframe-free by design; a lower threshold exercises the spawn +
        # covisibility path (measured t_norm ~0.04/frame on this baseline)
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, ui=dataclasses.replace(cfg.ui, parallax_thr=0.3))
        n = 16
        fe, gt, _ = run_mono(n, cfg=cfg)
        assert fe.next_kf >= 2, "no keyframe was dropped on this baseline"
        # covisibility recorded symmetrically
        for kf, nbrs in fe.covis.items():
            for nbr, s in nbrs.items():
                assert fe.covis[nbr].get(kf, 0) == s
