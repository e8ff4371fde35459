"""Schur-complement BA solver: recovery of ground truth from perturbed states."""

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.core.transforms import psi_from_xyz
from scavislam_tpu.models.ba_solver import BAProblem, solve_ba

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
CAM_PARAMS = (CAM.focal, CAM.pp[0], CAM.pp[1], CAM.baseline)
KEY = jax.random.PRNGKey(11)


def build_gt_problem(n_poses=6, n_points=96, P=8, L=128, O=1024, E=16,
                     noise_pose=0.02, noise_psi=0.02, fix_first_two=True,
                     key=KEY):
    """Poses on an arc, points on a wall, exact uvu observations from every
    pose to every point; poses+points perturbed."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # GT poses: move right along x, looking at the wall at z=6
    gt = []
    for i in range(n_poses):
        T_wc = SE3(jnp.eye(3), jnp.array([0.25 * i, 0.0, 0.1 * i]))
        gt.append(T_wc.inverse())

    # GT points on the wall (world frame), anchored round-robin
    px = jax.random.uniform(k1, (n_points,)) * 4.0 - 1.0
    py = jax.random.uniform(k2, (n_points,)) * 2.0 - 1.0
    xyz_w = jnp.stack([px, py, jnp.full((n_points,), 6.0)], axis=-1)
    anchors = np.arange(n_points) % n_poses

    psi_gt = []
    for p in range(n_points):
        xa = gt[anchors[p]].apply(xyz_w[p])
        psi_gt.append(psi_from_xyz(xa))
    psi_gt = jnp.stack(psi_gt)

    prob = BAProblem.empty(P, L, O, E)
    # fill poses (perturbed; first pose(s) fixed at GT)
    R_list, t_list, pv, pf = [], [], np.zeros(P, bool), np.zeros(P, bool)
    pert = jax.random.normal(k3, (n_poses, 6)) * noise_pose
    for i in range(n_poses):
        fixed = i < (2 if fix_first_two else 1)
        T = gt[i] if fixed else SE3.exp(pert[i]) @ gt[i]
        R_list.append(T.R)
        t_list.append(T.t)
        pv[i] = True
        pf[i] = fixed
    R0 = prob.R.at[: n_poses].set(jnp.stack(R_list))
    t0 = prob.t.at[: n_poses].set(jnp.stack(t_list))

    psi0 = prob.psi.at[:n_points].set(
        psi_gt + jax.random.normal(k4, (n_points, 3)) * noise_psi
    )
    point_valid = prob.point_valid.at[:n_points].set(True)
    anchor_slot = prob.anchor_slot.at[:n_points].set(
        jnp.asarray(anchors, jnp.int32)
    )

    # observations: every pose observes every point (exact, from GT)
    obs_pose, obs_point, obs_uvu = [], [], []
    for i in range(n_poses):
        uvu = CAM.map_uvu(gt[i].apply(xyz_w))
        for p in range(n_points):
            obs_pose.append(i)
            obs_point.append(p)
            obs_uvu.append(uvu[p])
    n_obs = len(obs_pose)
    assert n_obs <= O
    prob = prob._replace(
        R=R0, t=t0,
        pose_valid=jnp.asarray(pv), pose_fixed=jnp.asarray(pf),
        psi=psi0, anchor_slot=anchor_slot, point_valid=point_valid,
        obs_pose=prob.obs_pose.at[:n_obs].set(jnp.asarray(obs_pose, jnp.int32)),
        obs_point=prob.obs_point.at[:n_obs].set(jnp.asarray(obs_point, jnp.int32)),
        obs_uvu=prob.obs_uvu.at[:n_obs].set(jnp.stack(obs_uvu)),
        obs_valid=prob.obs_valid.at[:n_obs].set(True),
    )
    return prob, gt, psi_gt, n_poses, n_points


class TestInnerWindowBA:
    def test_chi2_decreases(self):
        prob, gt, psi_gt, n_poses, n_points = build_gt_problem()
        R, t, psi, stats = solve_ba(CAM_PARAMS, prob, iters=2)
        assert float(stats.chi2_final) < float(stats.chi2_initial) * 0.1

    def test_recovers_poses_and_points(self):
        prob, gt, psi_gt, n_poses, n_points = build_gt_problem()
        R, t, psi, stats = solve_ba(CAM_PARAMS, prob, iters=6, lambda0=1.0)
        for i in range(2, n_poses):
            err = (SE3(R[i], t[i]) @ gt[i].inverse()).log()
            assert float(jnp.max(jnp.abs(err))) < 2e-3, (
                f"pose {i}: {np.asarray(err)}"
            )
        perr = jnp.abs(psi[:n_points] - psi_gt)
        assert float(jnp.median(perr)) < 1e-3

    def test_fixed_poses_unchanged(self):
        prob, gt, psi_gt, n_poses, n_points = build_gt_problem()
        # iters=2 shares the compiled solver with the other tests
        R, t, psi, stats = solve_ba(CAM_PARAMS, prob, iters=2)
        for i in range(2):
            np.testing.assert_allclose(np.asarray(R[i]), np.asarray(gt[i].R),
                                       atol=1e-7)
            np.testing.assert_allclose(np.asarray(t[i]), np.asarray(gt[i].t),
                                       atol=1e-7)

    def test_huber_tolerates_outlier_obs(self):
        """5% gross outliers in RANDOM directions (mismatched corners look
        like this); the Huber kernel must keep the solution near GT where the
        quadratic cost would not. (Coherent same-direction outliers genuinely
        move the robust optimum — the reference relies on frontend gating for
        those, stereo_frontend.cpp:834-974.)

        Initial perturbation is small (BA refines poses already solved by the
        motion-only tracker, so inlier residuals start inside the Huber
        quadratic zone — with 20px initial residuals ANY delta=3 robust
        LM, g2o included, can walk into a non-convex bad basin)."""
        prob, gt, psi_gt, n_poses, n_points = build_gt_problem(
            noise_pose=0.004, noise_psi=0.004
        )
        key = jax.random.PRNGKey(5)
        k1, k2 = jax.random.split(key)
        bad = jax.random.uniform(k1, (prob.obs_uvu.shape[0],)) < 0.05
        offs = jax.random.normal(k2, prob.obs_uvu.shape) * 25.0
        obs = jnp.where((bad & prob.obs_valid)[:, None],
                        prob.obs_uvu + offs, prob.obs_uvu)
        prob = prob._replace(obs_uvu=obs)
        # reference operating point: 2 LM iterations, Huber 3, lambda0 50
        # (backend.cpp:187, slam_graph.cpp:1062)
        R, t, psi, stats = solve_ba(CAM_PARAMS, prob, iters=2, huber=3.0)
        errs_huber = [
            float(jnp.max(jnp.abs((SE3(R[i], t[i]) @ gt[i].inverse()).log())))
            for i in range(2, n_poses)
        ]
        R2, t2, _, _ = solve_ba(CAM_PARAMS, prob, iters=2, huber=1e9)
        errs_plain = [
            float(jnp.max(jnp.abs((SE3(R2[i], t2[i]) @ gt[i].inverse()).log())))
            for i in range(2, n_poses)
        ]
        # bounded drift with the robust kernel; dramatically better than the
        # quadratic cost (Huber's flat valley at 5% gross outliers still
        # permits a small drift — g2o shares this property).
        assert max(errs_huber) < 0.1, errs_huber
        assert max(errs_huber) < 0.3 * max(errs_plain), (
            f"huber {errs_huber} vs plain {errs_plain}"
        )


class TestPoseGraph:
    def test_chain_relaxation(self):
        """Pose-graph-only: chain + loop constraint pulls the chain back."""
        P, L, O, E = 8, 16, 16, 16
        prob = BAProblem.empty(P, L, O, E)
        n = 6
        gt = [SE3.exp(jnp.array([0.3 * i, 0.0, 0.0, 0.0, 0.2 * i, 0.0]))
              for i in range(n)]
        key = jax.random.PRNGKey(2)
        pert = jax.random.normal(key, (n, 6)) * 0.05
        pv = np.zeros(P, bool)
        pf = np.zeros(P, bool)
        Rs, ts = [], []
        for i in range(n):
            T = gt[i] if i == 0 else SE3.exp(pert[i]) @ gt[i]
            Rs.append(T.R)
            ts.append(T.t)
            pv[i] = True
        pf[0] = True
        # consecutive constraints + a loop edge 0-5, all exact
        ei, ej, eR, et, einfo = [], [], [], [], []
        pairs = [(i, i + 1) for i in range(n - 1)] + [(0, n - 1)]
        for (i, j) in pairs:
            T_ji = gt[j] @ gt[i].inverse()  # constraint = T_j_from_i
            ei.append(i)
            ej.append(j)
            eR.append(T_ji.R)
            et.append(T_ji.t)
            einfo.append(jnp.eye(6) * 100.0)
        ne = len(ei)
        prob = prob._replace(
            R=prob.R.at[:n].set(jnp.stack(Rs)),
            t=prob.t.at[:n].set(jnp.stack(ts)),
            pose_valid=jnp.asarray(pv), pose_fixed=jnp.asarray(pf),
            edge_i=prob.edge_i.at[:ne].set(jnp.asarray(ei, jnp.int32)),
            edge_j=prob.edge_j.at[:ne].set(jnp.asarray(ej, jnp.int32)),
            edge_R=prob.edge_R.at[:ne].set(jnp.stack(eR)),
            edge_t=prob.edge_t.at[:ne].set(jnp.stack(et)),
            edge_info=prob.edge_info.at[:ne].set(jnp.stack(einfo)),
            edge_valid=prob.edge_valid.at[:ne].set(True),
        )
        R, t, psi, stats = solve_ba(CAM_PARAMS, prob, iters=6, lambda0=1.0)
        assert float(stats.chi2_final) < float(stats.chi2_initial) * 1e-3
        for i in range(n):
            err = (SE3(R[i], t[i]) @ gt[i].inverse()).log()
            assert float(jnp.max(jnp.abs(err))) < 1e-3, (
                f"pose {i}: {np.asarray(err)}"
            )


class TestSortedScatterPath:
    def test_anchor_perm_matches_unsorted(self):
        """The host-sorted W-block scatter fast path (anchor_perm) must give
        the same solution as the unsorted path — on a problem packed the
        way slam_graph.optimize packs it (obs sorted by (pose, point))."""
        import __graft_entry__ as G
        from scavislam_tpu.models.ba_solver import solve_ba

        _, (prob,) = G.entry()
        cam_params = (389.96, 254.9, 201.9, 0.12)
        obs_pose = np.asarray(prob.obs_pose)
        obs_point = np.asarray(prob.obs_point)
        order = np.lexsort((obs_point, obs_pose))
        prob = prob._replace(
            obs_pose=jnp.asarray(obs_pose[order]),
            obs_point=jnp.asarray(obs_point[order]),
            obs_uvu=jnp.asarray(np.asarray(prob.obs_uvu)[order]),
            obs_weight=jnp.asarray(np.asarray(prob.obs_weight)[order]),
            obs_valid=jnp.asarray(np.asarray(prob.obs_valid)[order]),
        )
        anchor = np.asarray(prob.anchor_slot)[np.asarray(prob.obs_point)]
        aperm = np.lexsort((np.asarray(prob.obs_point), anchor)).astype(
            np.int32)

        R1, t1, psi1, s1 = solve_ba(cam_params, prob, iters=2)
        R2, t2, psi2, s2 = solve_ba(cam_params, prob, iters=2,
                                    anchor_perm=jnp.asarray(aperm))
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=2e-5)
        np.testing.assert_allclose(np.asarray(psi1), np.asarray(psi2),
                                   atol=2e-5)
        assert abs(float(s1.chi2_final) - float(s2.chi2_final)) <= (
            1e-3 * max(1.0, float(s1.chi2_final)))
