"""Multi-stream sharded tracking over the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.parallel.multistream import build_multistream_step, make_mesh

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
CAM_PARAMS = (195.0, 127.0, 95.0, 0.12)


def make_problem(B=8, N=256, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    xyz = jnp.stack(
        [jax.random.normal(ks[0], (B, N)) * 1.5,
         jax.random.normal(ks[1], (B, N)) * 1.0,
         jax.random.uniform(ks[2], (B, N)) * 5 + 3],
        axis=-1,
    )
    T_gt = [SE3.exp(jax.random.normal(jax.random.fold_in(key, i), (6,)) * 0.1)
            for i in range(B)]
    obs = jnp.stack([CAM.map_uvu(T.apply(xyz[i])) for i, T in enumerate(T_gt)])
    R0 = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
    t0 = jnp.zeros((B, 3))
    w = jnp.ones((B, N))
    v = jnp.ones((B, N), bool)
    return R0, t0, xyz, obs, w, v, T_gt


class TestMultiStream:
    def test_mesh_creation(self):
        mesh = make_mesh(8)
        assert mesh.shape["dp"] * mesh.shape["sp"] == 8

    def test_sharded_step_recovers_poses(self):
        assert len(jax.devices()) >= 8, "conftest provides 8 CPU devices"
        mesh = make_mesh(8)
        step = build_multistream_step(mesh, CAM_PARAMS, iters=10)
        R0, t0, xyz, obs, w, v, T_gt = make_problem(B=mesh.shape["dp"] * 2)

        args = [
            jax.device_put(R0, NamedSharding(mesh, P("dp", None, None))),
            jax.device_put(t0, NamedSharding(mesh, P("dp", None))),
            jax.device_put(xyz, NamedSharding(mesh, P("dp", "sp", None))),
            jax.device_put(obs, NamedSharding(mesh, P("dp", "sp", None))),
            jax.device_put(w, NamedSharding(mesh, P("dp", "sp"))),
            jax.device_put(v, NamedSharding(mesh, P("dp", "sp"))),
        ]
        R, t, chi = step(*args)
        for i, T in enumerate(T_gt):
            err = (SE3(R[i], t[i]) @ T.inverse()).log()
            assert float(jnp.max(jnp.abs(err))) < 1e-3, (i, np.asarray(err))

    def test_matches_single_device(self):
        """Sharded result must equal the unsharded computation."""
        mesh = make_mesh(8)
        step = build_multistream_step(mesh, CAM_PARAMS, iters=5)
        R0, t0, xyz, obs, w, v, T_gt = make_problem(B=mesh.shape["dp"])
        R_sh, t_sh, _ = step(R0, t0, xyz, obs, w, v)

        mesh1 = make_mesh(1, dp=1)
        step1 = build_multistream_step(mesh1, CAM_PARAMS, iters=5)
        R_1, t_1, _ = step1(R0, t0, xyz, obs, w, v)
        np.testing.assert_allclose(np.asarray(R_sh), np.asarray(R_1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_sh), np.asarray(t_1),
                                   atol=1e-5)


class TestShardedBA:
    """DWO bundle adjustment with the observation axis sharded over "sp"
    (parallel.multistream.build_sharded_ba): partial normal equations per
    shard + one psum over the mesh must reproduce the single-device solve
    bit-for-bit."""

    def test_matches_single_device(self):
        import __graft_entry__ as G
        from jax.sharding import Mesh
        from scavislam_tpu.models.ba_solver import solve_ba
        from scavislam_tpu.parallel.multistream import build_sharded_ba

        fn, (prob,) = G.entry()
        cam_params = (389.96, 254.9, 201.9, 0.12)
        R1, t1, psi1, stats = solve_ba(cam_params, prob, iters=2)

        devs = np.array(jax.devices()[:8]).reshape(1, 8)
        mesh = Mesh(devs, ("dp", "sp"))
        step = build_sharded_ba(mesh, cam_params, iters=2)
        rep, sp = P(), P("sp")
        specs = dict(R=rep, t=rep, pose_valid=rep, pose_fixed=rep, psi=rep,
                     anchor_slot=rep, point_valid=rep,
                     obs_pose=sp, obs_point=sp, obs_uvu=P("sp", None),
                     obs_weight=sp, obs_valid=sp,
                     edge_i=rep, edge_j=rep, edge_R=rep, edge_t=rep,
                     edge_info=rep, edge_valid=rep)
        prob_sh = type(prob)(**{
            k: jax.device_put(getattr(prob, k), NamedSharding(mesh, specs[k]))
            for k in specs
        })
        R2, t2, psi2, chi2 = step(prob_sh)
        assert abs(float(stats.chi2_final) - float(chi2)) <= (
            1e-3 * max(1.0, float(stats.chi2_final)))
        np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(psi1), np.asarray(psi2),
                                   atol=1e-5)


@pytest.mark.slow
class TestMultistreamFrontend:
    def test_vmapped_full_step_matches_per_stream(self):
        """build_multistream_frontend (the FULL fused frontend step over a
        stream batch) must agree with per-stream frontend_step calls."""
        import jax.numpy as jnp

        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.models import frontend_step as FS
        from scavislam_tpu.models.map_store import PointTable, PoseTable
        from scavislam_tpu.ops.image import build_pyramid, sobel_xy
        from scavislam_tpu.ops.stereo import block_matching_disparity
        from scavislam_tpu.parallel.multistream import (
            build_multistream_frontend,
        )

        levels, B = 3, 2
        h, w = 64, 96
        cam = StereoCamera.create(48.0, (47.5, 31.5), (w, h), 0.1)
        cams = [cam.scale_level(l) for l in range(levels)]
        cam_params = tuple(
            (c.focal, c.pp[0], c.pp[1], c.baseline) for c in cams)
        cam_statics = tuple(
            (int(c.size[0]), int(c.size[1])) for c in cams)
        rng = np.random.RandomState(0)
        frames = jnp.asarray(rng.rand(B, 2, h, w).astype(np.float32))

        def one_state(img, right):
            pyr = build_pyramid(img, levels)
            dxs, dys = zip(*[sobel_xy(p) for p in pyr])
            disp = block_matching_disparity(img, right, num_disp=16,
                                            radius=5)
            return FS._cloud_state(
                pyr, disp, jnp.eye(3, dtype=jnp.float32),
                jnp.zeros(3, jnp.float32), cam_params, levels, dxs, dys)

        clouds, valids, intens, Js = jax.vmap(one_state)(
            frames[:, 0], frames[:, 1])
        batch = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        poses_b = jax.tree.map(batch, PoseTable.empty())
        points_b = jax.tree.map(batch, PointTable.empty())
        cand = jnp.full((B, 768), -1, jnp.int32)
        Rb = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
        tb = jnp.zeros((B, 3), jnp.float32)
        ak = jnp.zeros((B,), jnp.int32)

        # qpack sampler: this test pins the VMAP property (batched ==
        # per-stream) exactly; the production batched default ("matmul",
        # bf16 MXU sampling) is intentionally not bit-equal to the f32
        # gather path — its numerics are pinned by
        # tests/test_dense_tracker.py::TestMatmulSampler
        step = build_multistream_frontend(None, cam_params, cam_statics,
                                          levels=levels, num_disp=16,
                                          dense_sample="qpack")
        out = step(frames, clouds, intens, valids, Js, Rb, tb, ak,
                   poses_b, points_b, cand)

        # unbatch on the HOST: eager jnp `x[s]` indexing compiles a
        # dynamic_slice+squeeze pair per distinct leaf shape (dozens of
        # 15-50 ms compiles on this 1-core machine); numpy slicing is free
        # and frontend_step device_puts its inputs anyway
        np_leaf = lambda x: np.asarray(x)
        frames_n, Rb_n, tb_n, ak_n, cand_n = map(
            np_leaf, (frames, Rb, tb, ak, cand))
        clouds_n, intens_n, valids_n, Js_n, poses_n, points_n = (
            jax.tree.map(np_leaf, t)
            for t in (clouds, intens, valids, Js, poses_b, points_b))
        for s in range(B):
            ref = FS.frontend_step(
                frames_n[s],
                jax.tree.map(lambda x: x[s], clouds_n),
                jax.tree.map(lambda x: x[s], intens_n),
                jax.tree.map(lambda x: x[s], valids_n),
                jax.tree.map(lambda x: x[s], Js_n),
                Rb_n[s], tb_n[s], ak_n[s],
                jax.tree.map(lambda x: x[s], poses_n),
                jax.tree.map(lambda x: x[s], points_n),
                cand_n[s], cam_params, cam_statics, levels, 16, False,
                2.0, 0.18, 1)
            np.testing.assert_allclose(
                np.asarray(out.packed[s]), np.asarray(ref.packed),
                atol=1e-4)


@pytest.mark.slow
class TestMultistreamMono:
    def test_vmapped_mono_step_matches_per_stream(self):
        """build_multistream_mono (the fused mono step over a stream batch,
        sharded over dp) must agree with per-stream mono_step calls. Stream
        state comes from REAL short mono runs (different step sizes), so the
        parity check covers populated point/Lambda tables and live
        candidate sections. Camera matches tests/test_mono.py so the
        per-stream program is shared within a full-suite process."""
        import jax.numpy as jnp

        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.io.synthetic import SyntheticSequence
        from scavislam_tpu.models.mono_frontend import MonoFrontend
        from scavislam_tpu.models.mono_step import mono_step
        from scavislam_tpu.parallel.multistream import (
            build_multistream_mono,
            make_mesh,
        )

        cam = StereoCamera.create(130.0, (63.5, 47.5), (128, 96), 0.12)
        B = 2
        fes, imgs = [], []
        for s in range(B):
            seq = SyntheticSequence(cam, n_frames=3, kind="forward_arc",
                                    step=0.03 + 0.01 * s)
            fe = MonoFrontend(cam)
            fe.process_first_frame(seq.frame(0))
            ok, _ = fe.process_frame(seq.frame(1))
            assert ok
            fes.append(fe)
            imgs.append(np.asarray(seq.frame(2)["left"], np.float32))

        cands = [fe._collect_candidates() for fe in fes]
        stack = lambda xs: jnp.asarray(np.stack([np.asarray(x) for x in xs]))
        batch = dict(
            imgs=stack(imgs),
            R=stack([fe._R_cw for fe in fes]),
            t=stack([fe._t_cw for fe in fes]),
            ak=jnp.asarray(np.array([max(fe.actkey_id, 0) for fe in fes],
                                    np.int32)),
            poses=jax.tree.map(
                lambda *xs: jnp.stack(xs), *[fe.poses for fe in fes]),
            points=jax.tree.map(
                lambda *xs: jnp.stack(xs), *[fe.points for fe in fes]),
            Lam=stack([fe.Lam for fe in fes]),
            cand=jnp.asarray(np.stack(cands).astype(np.int32)),
            conv=jnp.asarray(np.full(B, fes[0].conv_q_info, np.float32)),
            pw=jnp.asarray(np.full(B, fes[0].prior_weight, np.float32)),
        )
        mesh = make_mesh(8, dp=2)
        step = build_multistream_mono(
            mesh, fes[0]._cam_params, fes[0]._cam_statics, levels=3)
        out = step(batch["imgs"], batch["R"], batch["t"], batch["ak"],
                   batch["poses"], batch["points"], batch["Lam"],
                   batch["cand"], batch["conv"], batch["pw"])
        packed_b = np.asarray(out.packed)

        for s in range(B):
            fe = fes[s]
            ref = mono_step(
                jnp.asarray(imgs[s]), jnp.asarray(fe._R_cw),
                jnp.asarray(fe._t_cw), jnp.int32(max(fe.actkey_id, 0)),
                fe.poses, fe.points, fe.Lam,
                jnp.asarray(cands[s].astype(np.int32)),
                jnp.float32(fe.conv_q_info), jnp.float32(fe.prior_weight),
                fe._cam_params, fe._cam_statics, 3, 2.0, 0.18,
            )
            r = np.asarray(ref.packed)
            C = cands[s].shape[0]
            # pose/scalars/gates/obs agree tightly; the trailing Lambda_qq
            # segment (post-filter information, magnitudes ~25+) carries
            # f32 reduction-order noise from the vmapped J^T J einsums —
            # measured <=1.3e-3 with ZERO gate/match flips
            np.testing.assert_allclose(packed_b[s][:34 + 4 * C],
                                       r[:34 + 4 * C], atol=1e-4)
            np.testing.assert_allclose(packed_b[s][34 + 4 * C:],
                                       r[34 + 4 * C:], rtol=1e-3, atol=5e-3)


@pytest.mark.slow
class TestShardedBALiveRun:
    """graph.solve_mesh wires the sharded DWO solve (obs axis psum over
    "sp") into a LIVE SlamSystem run: the trajectory must match the
    single-device solve's to float-reduction tolerance. Exact bit-equality
    is impossible by construction: the psum reassociates the normal-equation
    additions. One solve on one problem matches to <=1e-6 (the standalone
    TestShardedBA check); in a LIVE run each solve feeds the next through
    the neighborhood->frontend->tracking loop, so the reduction noise
    amplifies to a measured ~3e-5 over 30 frames — still 100x below the
    trajectory's own ATE (~5 mm)."""

    def _run(self, solve_mesh_n):
        import dataclasses

        from scavislam_tpu.io.synthetic import SyntheticSequence
        from scavislam_tpu.pipeline.slam_system import SlamSystem
        from scavislam_tpu.utils.config import Config

        cfg = Config()
        cfg = dataclasses.replace(
            cfg,
            frontend=dataclasses.replace(cfg.frontend, covis_thr=10),
            ui=dataclasses.replace(cfg.ui, parallax_thr=0.25),
            graph=dataclasses.replace(cfg.graph, inner_window=5,
                                      outer_window=20,
                                      solve_mesh=solve_mesh_n),
        )
        n = 30
        seq = SyntheticSequence(CAM, n_frames=n, step=0.02)
        system = SlamSystem(CAM, cfg, threaded=False,
                            enable_loop_closure=False)
        frames = [seq.frame(i) for i in range(n)]
        system.process_first_frame(frames[0])
        for f in frames[1:]:
            assert system.process_frame(dict(f))
        system.finish()
        poses = {k: (v.R.copy(), v.t.copy())
                 for k, v in system.backend.graph.vertices.items()}
        traj = [(fid, np.asarray(T.R), np.asarray(T.t))
                for fid, T in system.trajectory]
        n_solves = system.backend.graph.stats.get("n_solves", None)
        system.shutdown()
        return poses, traj, system.backend.graph.solve_mesh

    def test_live_run_matches_single_device(self):
        poses1, traj1, mesh1 = self._run(0)
        poses8, traj8, mesh8 = self._run(8)
        assert mesh1 is None
        assert mesh8 is not None and mesh8.shape["sp"] == 8
        assert poses1.keys() == poses8.keys() and len(poses1) >= 2
        for k in poses1:
            np.testing.assert_allclose(poses1[k][0], poses8[k][0], atol=2e-4)
            np.testing.assert_allclose(poses1[k][1], poses8[k][1], atol=2e-4)
        assert len(traj1) == len(traj8)
        for (f1, R1, t1), (f8, R8, t8) in zip(traj1, traj8):
            assert f1 == f8
            np.testing.assert_allclose(t1, t8, atol=2e-4)


@pytest.mark.slow
class TestStreamPool:
    """StreamPool: N live VO streams through ONE batched device program with
    per-stream host keyframe policy (the product surface over
    build_multistream_frontend)."""

    def test_two_streams_end_to_end(self):
        import dataclasses

        from scavislam_tpu.io.synthetic import (
            SyntheticSequence,
            default_room,
            varied_box,
        )
        from scavislam_tpu.parallel.stream_pool import StreamPool
        from scavislam_tpu.pipeline.slam_system import ate_rmse
        from scavislam_tpu.utils.config import Config

        cfg = Config()
        # low parallax threshold so keyframe spawns happen mid-run (the
        # deferred spawn + epoch-guard paths must run in pool mode)
        cfg = dataclasses.replace(
            cfg, ui=dataclasses.replace(cfg.ui, parallax_thr=0.1))
        n, B = 14, 2
        seqs = [
            SyntheticSequence(
                CAM, n_frames=n, step=0.02,
                planes=default_room() if s == 0 else varied_box(1))
            for s in range(B)
        ]
        gt = [[] for _ in range(B)]
        ticks = []
        for i in range(n):
            tick = []
            for s in range(B):
                f = seqs[s].frame(i)
                gt[s].append(f["T_cw_gt"])
                tick.append({
                    "frame_id": i,
                    "left": np.asarray(f["left"]),
                    "right": np.asarray(f["right"]),
                })
            ticks.append(tick)

        mesh = make_mesh(2, dp=2)  # 1 stream/device over 2 of the 8 devices
        pool = StreamPool(CAM, cfg, n_streams=B, mesh=mesh,
                          pipeline_depth=2)
        pool.process_first_frames(ticks[0])
        for i in range(1, n):
            pool.process_frames(ticks[i])
        pool.finish()

        for s in range(B):
            assert pool.alive[s], f"stream {s} lost tracking"
            traj = pool.trajectories[s]
            assert len(traj) == n
            # mid-run keyframes actually spawned (deferred spawn path)
            assert pool.fes[s].next_kf >= 2, (
                f"stream {s}: no mid-run keyframe")
            pairs = [(fid, T) for fid, T in traj]
            ate = ate_rmse(pairs, [gt[s][int(fid)] for fid, _ in pairs])
            assert ate < 0.05, f"stream {s} ATE {ate}"
        # streams tracked DIFFERENT scenes: trajectories must differ in
        # estimate (same gt trajectory, different scenes -> different noise)
        t_end0 = pool.trajectories[0][-1][1].t
        t_end1 = pool.trajectories[1][-1][1].t
        assert np.any(np.abs(t_end0 - t_end1) > 0), "streams identical"
        # exactly one batched packed fetch per tick: per-stream frontends
        # never ran their own device step
        assert pool.fes[0]._dev_R_cw is None
