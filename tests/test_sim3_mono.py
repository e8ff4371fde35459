"""Monocular-mode scaffold: Sim3 RANSAC + scale-drift-aware pose graph
(parity surface: the reference's MONO-gated Sim3Model / Sim3 g2o types,
ransac_models.cpp:85-136, anchored_points.h:180-218)."""

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.lie import SO3, Sim3

CAM_PARAMS = (195.0, 127.0, 95.0, 0.12)


class TestSim3Ransac:
    def test_recovers_similarity_with_outliers(self):
        from scavislam_tpu.ops.ransac import ransac_sim3

        rng = np.random.RandomState(3)
        n = 80
        xyz_a = np.stack([
            rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
            rng.uniform(3, 8, n)], -1).astype(np.float32)
        R_gt = np.asarray(SO3.exp(jnp.asarray([0.05, -0.1, 0.02])).R)
        s_gt, t_gt = 1.35, np.array([0.3, -0.1, 0.5], np.float32)
        xyz_b = (s_gt * xyz_a @ R_gt.T + t_gt).astype(np.float32)
        # 25% outliers
        n_out = n // 4
        xyz_b[:n_out] += rng.uniform(0.5, 2.0, (n_out, 3))
        valid = np.ones(n, bool)

        s, R, t, inl, cnt = ransac_sim3(
            jax.random.PRNGKey(0), jnp.asarray(xyz_a), jnp.asarray(xyz_b),
            jnp.asarray(valid), CAM_PARAMS, inlier_thr=2.0)
        assert int(cnt) > 0.8 * (n - n_out)
        assert abs(float(s) - s_gt) < 0.02
        np.testing.assert_allclose(np.asarray(R), R_gt, atol=2e-2)
        np.testing.assert_allclose(np.asarray(t), t_gt, atol=5e-2)
        # outliers largely rejected
        assert np.asarray(inl)[:n_out].mean() < 0.3


class TestSim3PoseGraph:
    def test_scale_drift_loop_closure(self):
        """A mono trajectory around a circle accumulates scale drift; the
        Sim3 loop edge distributes the scale error over the cycle (the
        scale-drift-aware loop closure the MONO scaffold exists for)."""
        from scavislam_tpu.models.sim3_graph import optimize_sim3_pose_graph

        n = 12
        # ground-truth poses on a circle, node-from-world (the g2o vertex
        # convention the edge error log(S_m^-1 S_i S_j^-1) assumes), unit
        # scale
        gt = []
        for k in range(n):
            a = 2 * np.pi * k / n
            R = np.asarray(SO3.exp(jnp.asarray([0.0, a, 0.0])).R)
            c = np.array([np.cos(a), 0.0, np.sin(a)], np.float32)
            t = (-R @ c).astype(np.float32)  # node-from-world translation
            gt.append(Sim3(jnp.asarray(R, jnp.float32),
                           jnp.asarray(t), jnp.float32(1.0)))

        # odometry measurements S_k_from_k+1 = S_k S_{k+1}^-1 with a
        # per-step scale drift
        drift = 1.04  # 4% per step: ~60% over the loop
        meas = []
        for k in range(n):
            S = gt[k] @ gt[(k + 1) % n].inverse()
            meas.append(Sim3(S.R, S.t, S.s * drift))
        # the loop edge (n-1 -> 0) measures the TRUE relative pose
        meas[-1] = gt[n - 1] @ gt[0].inverse()

        # integrate drifted odometry for the initial estimate:
        # S_{k+1} = meas_k^-1 S_k
        est = [gt[0]]
        for k in range(n - 1):
            est.append(meas[k].inverse() @ est[-1])
        nodes = Sim3(
            jnp.stack([e.R for e in est]),
            jnp.stack([e.t for e in est]),
            jnp.stack([jnp.asarray(e.s, jnp.float32) for e in est]),
        )
        # drift is visible before optimization (1/1.04^11 ~ 0.65)
        assert float(nodes.s[-1]) < 0.7

        ei = np.arange(n, dtype=np.int32)
        ej = (np.arange(n, dtype=np.int32) + 1) % n
        edges = Sim3(
            jnp.stack([m.R for m in meas]),
            jnp.stack([m.t for m in meas]),
            jnp.stack([jnp.asarray(m.s, jnp.float32) for m in meas]),
        )
        out, hist = optimize_sim3_pose_graph(
            nodes, ei, ej, edges, jnp.ones(n, bool), iters=12)
        # the measurement cycle is inconsistent by construction (11 drifted
        # edges + 1 exact loop edge compose to scale 1.04^11): the optimum
        # distributes ln(1.54)^2 over 12 edges = 0.0155 — that IS the floor
        assert hist[-1] < hist[0] * 0.05, hist
        assert abs(hist[-1] - np.log(1.04**11) ** 2 / 12) < 3e-3, hist[-1]
        # every edge now consistent; scale spread shrinks drastically
        s = np.asarray(out.s)
        assert s.max() / s.min() < 1.25, s
        # node 0 stayed fixed (gauge)
        np.testing.assert_allclose(np.asarray(out.t[0]),
                                   np.asarray(nodes.t[0]), atol=1e-4)

    def test_noise_free_graph_is_fixed_point(self):
        from scavislam_tpu.models.sim3_graph import optimize_sim3_pose_graph

        n = 5
        rng = np.random.RandomState(0)
        nodes_list = [Sim3.identity()]
        for _ in range(n - 1):
            xi = jnp.asarray(rng.randn(7) * 0.2, jnp.float32)
            nodes_list.append(nodes_list[-1] @ Sim3.exp(xi))
        nodes = Sim3(
            jnp.stack([e.R for e in nodes_list]),
            jnp.stack([e.t for e in nodes_list]),
            jnp.stack([jnp.asarray(e.s, jnp.float32) for e in nodes_list]),
        )
        ei = np.arange(n - 1, dtype=np.int32)
        ej = ei + 1
        meas = [nodes_list[i] @ nodes_list[i + 1].inverse()
                for i in range(n - 1)]
        edges = Sim3(
            jnp.stack([m.R for m in meas]),
            jnp.stack([m.t for m in meas]),
            jnp.stack([jnp.asarray(m.s, jnp.float32) for m in meas]),
        )
        out, hist = optimize_sim3_pose_graph(
            nodes, ei, ej, edges, jnp.ones(n - 1, bool), iters=3)
        assert hist[-1] < 1e-8
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(nodes.t),
                                   atol=1e-4)


class TestMonoPointFilter:
    """Batched information-filter point init (the MONO-gated
    filterSingleFeatureOnly, pose_optimizer.h:300-422)."""

    CAM = (200.0, 128.0, 96.0)

    def _project(self, R_ca, t_ca, xyz_a):
        y = xyz_a @ np.asarray(R_ca).T + t_ca
        f, px, py = self.CAM
        return np.stack([y[:, 0] / y[:, 2] * f + px,
                         y[:, 1] / y[:, 2] * f + py], -1)

    def test_depth_recovered_with_parallax(self):
        from scavislam_tpu.models.pose_optimizer import filter_points_info

        rng = np.random.RandomState(1)
        n = 32
        xyz = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n),
                        rng.uniform(3, 8, n)], -1)
        psi_true = np.stack([xyz[:, 0] / xyz[:, 2], xyz[:, 1] / xyz[:, 2],
                             1.0 / xyz[:, 2]], -1).astype(np.float32)
        # bearing known from the anchor view, depth initialized WRONG
        psi0 = psi_true.copy()
        psi0[:, 2] = 0.5  # init q = 1/2m for all
        Lam0 = np.zeros((n, 3, 3), np.float32)
        Lam0[:, 0, 0] = Lam0[:, 1, 1] = 1e4  # bearing fixed by anchor obs
        # observe from a translated camera (baseline -> parallax)
        R_ca = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
        t_ca = np.tile(np.array([-0.5, 0.0, 0.0], np.float32), (n, 1))
        obs = self._project(np.eye(3), t_ca[0], xyz).astype(np.float32)

        out = filter_points_info(
            self.CAM, jnp.asarray(R_ca), jnp.asarray(t_ca),
            jnp.asarray(psi0), jnp.asarray(Lam0), jnp.asarray(obs),
            jnp.ones(n, bool), iters=8)
        q = np.asarray(out.psi[:, 2])
        np.testing.assert_allclose(q, psi_true[:, 2], rtol=0.02)
        # information accumulated along the observable direction
        dL = np.asarray(out.Lambda - Lam0)
        assert (dL[:, 2, 2] > 0).all()
        # update is PSD (information only ever added)
        ev = np.linalg.eigvalsh(dL)
        assert ev.min() > -1e-2

    def test_pure_rotation_leaves_depth_unobserved(self):
        from scavislam_tpu.models.pose_optimizer import filter_points_info

        n = 8
        rng = np.random.RandomState(2)
        xyz = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.8, 0.8, n),
                        rng.uniform(3, 8, n)], -1)
        psi_true = np.stack([xyz[:, 0] / xyz[:, 2], xyz[:, 1] / xyz[:, 2],
                             1.0 / xyz[:, 2]], -1).astype(np.float32)
        R = np.asarray(SO3.exp(jnp.asarray([0.0, 0.05, 0.0])).R,
                       np.float32)
        R_ca = np.tile(R, (n, 1, 1))
        t_ca = np.zeros((n, 3), np.float32)
        obs = self._project(R, np.zeros(3), xyz).astype(np.float32)

        out = filter_points_info(
            self.CAM, jnp.asarray(R_ca), jnp.asarray(t_ca),
            jnp.asarray(psi_true), np.zeros((n, 3, 3), np.float32),
            jnp.asarray(obs), jnp.ones(n, bool), iters=5)
        # no parallax: the depth column of the added information is ~0
        dL = np.asarray(out.Lambda)
        assert abs(dL[:, 2, 2]).max() < 1e-4 * abs(dL[:, 0, 0]).max()
        # and the filter did not invent a depth change
        np.testing.assert_allclose(np.asarray(out.psi), psi_true, atol=1e-3)
