"""Auxiliary subsystems: serialization, visualization, rectification, Sim3,
dictionary builder, performance monitor."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3, Sim3
from scavislam_tpu.core.transforms import homography_c2_from_c1
from scavislam_tpu.utils.perfmon import PerformanceMonitor

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray([0.2, -0.1, 0.3, 0.05, -0.12, 0.08, 0.15])
        T = Sim3.exp(xi)
        np.testing.assert_allclose(np.asarray(T.log()), np.asarray(xi),
                                   atol=1e-5)

    def test_group_ops(self):
        a = Sim3.exp(jnp.asarray([0.1, 0.2, -0.1, 0.03, 0.05, -0.02, 0.1]))
        b = Sim3.exp(jnp.asarray([-0.2, 0.1, 0.2, -0.04, 0.02, 0.06, -0.08]))
        x = jnp.asarray([1.0, -2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray((a @ b).apply(x)), np.asarray(a.apply(b.apply(x))),
            atol=1e-5,
        )
        I = a @ a.inverse()
        np.testing.assert_allclose(np.asarray(I.t), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(I.s), 1.0, atol=1e-6)


class TestHomography:
    def test_plane_transfer(self):
        """x2 ~ H x1 for points on the plane."""
        T = SE3.exp(jnp.asarray([0.1, -0.05, 0.2, 0.02, -0.03, 0.05]))
        n = jnp.asarray([0.0, 0.0, 1.0])
        p0 = jnp.asarray([0.3, -0.2, 4.0])  # plane z=4 in frame 1
        H = homography_c2_from_c1(T, n, p0)
        # a point on the plane
        x1 = jnp.asarray([1.0, 0.5, 4.0])
        x2 = T.apply(x1)
        h = H @ (x1 / x1[2])
        np.testing.assert_allclose(
            np.asarray(h / h[2]), np.asarray(x2 / x2[2]), atol=1e-5
        )


class TestRectify:
    def test_zero_distortion_identity(self):
        from scavislam_tpu.ops.rectify import build_rectify_map

        m = build_rectify_map(CAM, (0, 0, 0, 0, 0), (0, 0, 0))
        us, vs = np.meshgrid(np.arange(256), np.arange(192))
        np.testing.assert_allclose(m[..., 0], us, atol=1e-4)
        np.testing.assert_allclose(m[..., 1], vs, atol=1e-4)

    def test_distortion_roundtrip(self):
        """Remapping an image through distort-then-undistort maps recovers it
        approximately in the interior."""
        from scavislam_tpu.ops.rectify import build_rectify_map

        # a map with mild radial distortion
        m = build_rectify_map(CAM, (0.05, 0.0, 0, 0, 0), (0, 0, 0))
        # distorted coords differ from identity away from center
        center_err = np.abs(m[96, 128] - np.array([128, 96])).max()
        corner_err = np.abs(m[10, 10] - np.array([10, 10])).max()
        assert center_err < 1.0 and corner_err > 2.0

    def test_rotation_shifts_image(self):
        from scavislam_tpu.ops.rectify import build_rectify_map

        m = build_rectify_map(CAM, (0, 0, 0, 0, 0), (0.0, 0.02, 0.0))
        # small y-rotation ~ horizontal shift by f*angle
        shift = m[96, 128, 0] - 128
        assert abs(abs(shift) - 195.0 * 0.02) < 1.0

    @pytest.mark.slow
    def test_pipeline_wiring_identity(self):
        """rectify_frame=True with zero distortion must track the same
        trajectory as the plain path (the reference applies rectification
        inside the grabber, frame_grabber.cpp:245-256; here it is one extra
        device program ahead of frontend_step)."""
        import dataclasses

        from scavislam_tpu.io.synthetic import SyntheticSequence
        from scavislam_tpu.models.frontend import StereoFrontend
        from scavislam_tpu.utils.config import Config

        seq = SyntheticSequence(CAM, n_frames=4, step=0.02)
        frames = [seq.frame(i) for i in range(4)]
        poses = {}
        for rect in (False, True):
            cfg = Config()
            cfg = dataclasses.replace(
                cfg, framepipe=dataclasses.replace(
                    cfg.framepipe, rectify_frame=rect))
            fe = StereoFrontend(CAM, cfg)
            fe.process_first_frame(dict(frames[0]))
            for f in frames[1:]:
                ok, _ = fe.process_frame(dict(f))
                assert ok
            poses[rect] = fe._world_pose()
        d = (poses[False] @ poses[True].inverse()).log()
        assert float(jnp.max(jnp.abs(jnp.asarray(d)))) < 1e-3


class TestSerialization:
    def test_graph_roundtrip(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_slam_graph import build_graph

        from scavislam_tpu.utils.serialization import load_graph, save_graph

        g, _ = build_graph(6)
        g.prepare_for_optimization(5)
        p = str(tmp_path / "map.npz")
        save_graph(g, p)
        g2 = load_graph(p, CAM)
        assert set(g2.vertices) == set(g.vertices)
        assert set(g2.points) == set(g.points)
        assert set(g2.edges) == set(g.edges)
        for k in g.vertices:
            np.testing.assert_allclose(g2.vertices[k].R, g.vertices[k].R)
            np.testing.assert_allclose(g2.vertices[k].t, g.vertices[k].t)
            assert (g2.vertices[k].neighbor_strengths
                    == g.vertices[k].neighbor_strengths)
        for p_ in g.points:
            np.testing.assert_allclose(g2.points[p_].psi, g.points[p_].psi)
            assert g2.points[p_].vis_set == g.points[p_].vis_set
        for e_ in g.edges:
            assert (g2.edges[e_].is_marginalized()
                    == g.edges[e_].is_marginalized())
            if g.edges[e_].is_marginalized():
                np.testing.assert_allclose(
                    g2.edges[e_].Lambda, g.edges[e_].Lambda)
        # loaded graph must optimize without error
        assert g2.prepare_for_optimization(5)
        g2.optimize(num_iters=1)

    def test_tum_trajectory_export(self, tmp_path):
        from scavislam_tpu.utils.serialization import save_trajectory_tum

        traj = [(i, SE3.exp(jnp.asarray([0.1 * i, 0, 0, 0, 0.05 * i, 0])))
                for i in range(5)]
        p = str(tmp_path / "traj.txt")
        save_trajectory_tum(traj, p)
        rows = np.loadtxt(p)
        assert rows.shape == (5, 8)
        # quaternions normalized
        np.testing.assert_allclose(
            np.linalg.norm(rows[:, 4:8], axis=1), 1.0, atol=1e-5
        )


class TestVisualize:
    def test_render_map(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from test_slam_graph import build_graph, gt_pose

        from scavislam_tpu.apps.visualize import (
            render_frame_overlay,
            render_map_topdown,
        )

        g, _ = build_graph(6)
        traj = [(i, gt_pose(i)) for i in range(6)]
        p = str(tmp_path / "map.png")
        img = render_map_topdown(g, trajectory=traj,
                                 gt_poses=[gt_pose(i) for i in range(6)],
                                 path=p)
        assert os.path.exists(p)
        assert img.size == (900, 900)

        p2 = str(tmp_path / "frame.png")
        render_frame_overlay(
            np.random.rand(192, 256),
            tracked_uv=np.array([[10.0, 20.0], [100.0, 90.0]]),
            path=p2,
        )
        assert os.path.exists(p2)

    def test_debug_views_and_timing_plot(self, tmp_path):
        """The GUI-parity surfaces: 7-way debug view (ui.debug 0-6),
        keyframe view, stacked timing plot (stereo_slam.cpp:267-333,
        155-160)."""
        from scavislam_tpu.apps.visualize import (
            DEBUG_MODES,
            render_debug_image,
            render_keyframe_view,
            render_timing_plot,
        )
        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.io.synthetic import SyntheticSequence
        from scavislam_tpu.pipeline.slam_system import SlamSystem
        from scavislam_tpu.utils.config import Config

        cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
        seq = SyntheticSequence(cam, n_frames=3, step=0.02)
        system = SlamSystem(cam, Config(), threaded=False,
                            enable_loop_closure=False)
        # keyframe image retention is opt-in (bounded device memory on long
        # runs); the keyframe view needs it — same wiring as the app
        system.frontend.keep_kf_images = True
        system.process_first_frame(seq.frame(0))
        for i in (1, 2):
            assert system.process_frame(seq.frame(i))

        for mode in range(len(DEBUG_MODES)):
            p = str(tmp_path / f"dbg{mode}.png")
            img = render_debug_image(mode, 0, system.frontend, path=p)
            assert os.path.exists(p)
            assert img.size == (256, 192)
        # coarser pyramid level
        img = render_debug_image(1, 2, system.frontend)
        assert img.size == (64, 48)

        pk = str(tmp_path / "kf.png")
        render_keyframe_view(system.frontend, 0, path=pk)
        assert os.path.exists(pk)

        pt = str(tmp_path / "timing.png")
        render_timing_plot(system.per_mon, path=pt)
        assert os.path.exists(pt)
        assert len(system.per_mon.history) >= 1


class TestWatch:
    def test_watch_artifacts_and_live_retune(self, tmp_path):
        """--watch: the Pangolin-Var analogue (stereo_slam.cpp:234-257).

        Covers: template written on startup, atomic artifact refresh
        (map.png / debug.png / timing.png / status.json), live retuning of
        keyframe thresholds through tunables.cfg WITHOUT restart, and the
        pause+quit protocol (pause=1 with quit=1 must not block)."""
        import json

        from scavislam_tpu.apps.watch import Watcher
        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.io.synthetic import SyntheticSequence
        from scavislam_tpu.pipeline.slam_system import SlamSystem
        from scavislam_tpu.utils.config import Config

        cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
        seq = SyntheticSequence(cam, n_frames=4, step=0.02)
        system = SlamSystem(cam, Config(), threaded=False,
                            enable_loop_closure=False)
        wdir = str(tmp_path / "watch")
        watcher = Watcher(wdir, system, period=0.0)  # refresh every tick

        tun = os.path.join(wdir, "tunables.cfg")
        assert os.path.exists(tun), "template must be written on startup"
        template = open(tun).read()
        for key in ("parallax_thr", "pixel_thr", "pause", "quit"):
            assert key in template

        system.process_first_frame(seq.frame(0))
        watcher.tick(0)
        for name in ("map.png", "timing.png", "status.json", "map3d.html"):
            assert os.path.exists(os.path.join(wdir, name)), name
        assert not os.path.exists(os.path.join(wdir, "status.json.tmp"))

        # live retune: edits apply to the RUNNING system at the next tick
        with open(tun, "w") as f:
            f.write("# retuned mid-run\nparallax_thr = 0.011\n"
                    "pixel_thr = 33\nfeatureless_thr = 3\ndebug_mode = 2\n")
        assert system.process_frame(seq.frame(1))
        watcher.tick(1)
        assert system.cfg.ui.parallax_thr == pytest.approx(0.011)
        assert system.frontend.cfg.ui.parallax_thr == pytest.approx(0.011)
        fe = system.cfg.frontend
        assert fe.new_keyframe_pixel_thr == pytest.approx(33.0)
        assert fe.new_keyframe_featureless_corners_thr == 3
        assert watcher.debug_mode == 2
        assert os.path.exists(os.path.join(wdir, "debug.png"))

        with open(os.path.join(wdir, "status.json")) as f:
            status = json.load(f)
        assert status["frame"] == 1
        assert status["keyframes"] >= 1
        assert status["parallax_thr"] == pytest.approx(0.011)

        # pause=1 + quit=1 together: applies both, returns without blocking
        with open(tun, "w") as f:
            f.write("pause = 1\nquit = 1\n")
        assert system.process_frame(seq.frame(2))
        watcher.tick(2)
        assert watcher.quit


class TestMap3d:
    def test_scene_geometry_and_html_export(self, tmp_path):
        """apps/map3d (the interactive 3-D view, parity: the reference GUI's
        v_graph 3-D scene, stereo_slam.cpp:497-565): anchored inverse-depth
        points and keyframe centers must land at their true WORLD positions
        in the exported scene, edges must carry type + marginalization, and
        the HTML must be self-contained (inline data, no external fetches)."""
        import json as _json
        import types

        from scavislam_tpu.apps.map3d import export_map_html, extract_scene
        from scavislam_tpu.core.lie import SE3
        from scavislam_tpu.models.slam_graph import APPEARANCE, LOCAL

        rng = np.random.RandomState(5)
        T0 = SE3.exp(np.array([0.1, -0.2, 0.3, 0.04, -0.02, 0.05],
                             np.float32))
        T1 = SE3.exp(np.array([-0.3, 0.1, 0.6, -0.03, 0.06, 0.01],
                             np.float32))
        vert = {}
        for k, T in ((0, T0), (7, T1)):
            vert[k] = types.SimpleNamespace(
                R=np.asarray(T.R, np.float64), t=np.asarray(T.t, np.float64))
        xyz_w = rng.randn(3) + np.array([0.0, 0.0, 4.0])
        xyz_a = vert[0].R @ xyz_w + vert[0].t  # world -> anchor cam
        psi = np.array([xyz_a[0] / xyz_a[2], xyz_a[1] / xyz_a[2],
                        1.0 / xyz_a[2]])
        points = {
            3: types.SimpleNamespace(anchor_id=0, psi=psi),
            4: types.SimpleNamespace(anchor_id=99, psi=psi),  # dangling
        }
        edges = {
            (0, 7): types.SimpleNamespace(
                edge_type=LOCAL, is_marginalized=lambda: True),
            (7, 0): types.SimpleNamespace(
                edge_type=APPEARANCE, is_marginalized=lambda: False),
        }
        graph = types.SimpleNamespace(vertices=vert, points=points,
                                      edges=edges)

        scene = extract_scene(graph, actkey_id=7)
        assert scene["kf_ids"] == [0, 7]
        assert scene["actkey"] == 1
        # camera centers: -R^T t
        np.testing.assert_allclose(
            scene["kf_centers"][0], -vert[0].R.T @ vert[0].t, atol=1e-3)
        # the anchored point must come back at its true world position;
        # the dangling-anchor point must be dropped
        assert len(scene["points"]) == 1
        np.testing.assert_allclose(scene["points"][0], xyz_w, atol=2e-3)
        assert sorted(e[2:] for e in scene["edges"]) == sorted(
            [[int(LOCAL), 1], [int(APPEARANCE), 0]])

        out = str(tmp_path / "m.html")
        export_map_html(graph, path=out, actkey_id=7)
        html = open(out).read()
        assert "<canvas" in html and "localStorage" in html
        assert "http://" not in html and "https://" not in html  # no CDN
        payload = html.split("const SCENE = ", 1)[1].split(";\n", 1)[0]
        assert _json.loads(payload)["kf_ids"] == [0, 7]
        assert not os.path.exists(out + ".tmp")


class TestDictionaryBuilder:
    def test_end_to_end(self, tmp_path):
        from scavislam_tpu.apps import create_dictionary as cd
        from scavislam_tpu.io.synthetic import SyntheticSequence
        from PIL import Image

        seq = SyntheticSequence(CAM, n_frames=3, step=0.1)
        for i in range(3):
            arr = (np.asarray(seq.frame(i)["left"]) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
        out = str(tmp_path / "dict.npz")
        cd.main([str(tmp_path), "3", "32", "--out", out])
        vocab = np.load(out)["vocab"]
        assert vocab.shape == (32, 128)
        np.testing.assert_allclose(
            np.linalg.norm(vocab, axis=1), 1.0, atol=1e-3
        )


class TestPerfMon:
    def test_stages_and_fps(self):
        import time

        pm = PerformanceMonitor()
        pm.add("stage_a")
        for _ in range(3):
            pm.new_frame()
            pm.start("stage_a")
            time.sleep(0.005)
            pm.stop("stage_a")
        pm.new_frame()
        s = pm.summary()
        assert s["frames"] == 3
        assert s["stages_ms"]["stage_a"] >= 4.0
        assert s["fps"] > 0


class TestStereoSlamCli:
    def test_synthetic_run_with_exports(self, tmp_path):
        from scavislam_tpu.apps import stereo_slam

        # reference-format .cfg selecting the camera the other tests in
        # this process already compiled programs for (Config() defaults
        # would run 512x384 — a one-off ~40 s compile+run on the 1-core CI
        # machine for plumbing this test doesn't check; resolution-bearing
        # paths are benched on TPU)
        cfg = tmp_path / "test.cfg"
        cfg.write_text(
            "cam.width = 256;\ncam.height = 192;\ncam.f = 195.0;\n"
            "cam.px = 127.0;\ncam.py = 95.0;\ncam.baseline = 0.12;\n")
        out = stereo_slam.main([
            str(cfg),
            "--synthetic", "6", "--no-loop-closure",
            "--out", str(tmp_path / "traj.txt"),
            "--save-map", str(tmp_path / "map.npz"),
            "--save-traj-tum", str(tmp_path / "traj_tum.txt"),
            "--viz", str(tmp_path / "map.png"),
        ])
        assert out["frames_processed"] == 6
        assert out["ate_rmse_m"] < 0.05
        for f in ("traj.txt", "map.npz", "traj_tum.txt", "map.png"):
            assert os.path.exists(tmp_path / f)
