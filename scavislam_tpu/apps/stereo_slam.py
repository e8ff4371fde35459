"""Headless stereo/RGB-D SLAM CLI.

Equivalent of the reference's stereo_slam executable
(/root/reference/scavislam/stereo_slam.cpp) minus the Pangolin GUI: runs the
full pipeline (frontend + DWO backend + place recognition) over a disk
sequence or a synthetic benchmark sequence, exports the trajectory, and
prints per-stage timing (the reference plotted these live,
stereo_slam.cpp:155-160).

Usage:
  python -m scavislam_tpu.apps.stereo_slam <config.cfg> [options]
  python -m scavislam_tpu.apps.stereo_slam --synthetic 100 [options]

The config file format is the reference's (data/newcollege.cfg parses
unmodified).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.utils.config import Config, load_config


def build_camera(cfg: Config) -> StereoCamera:
    return StereoCamera.create(
        cfg.cam.f, (cfg.cam.px, cfg.cam.py),
        (cfg.cam.width, cfg.cam.height), cfg.cam.baseline,
    )


def run_streams(args, cfg: Config, cam: StereoCamera):
    """N concurrent synthetic streams, end-to-end: per-stream keyframe
    policy + map on the host, ONE batched fused device program + ONE packed
    fetch per tick for all streams (parallel.stream_pool.StreamPool).

    Each stream tracks a DIFFERENT scene (default_room for stream 0,
    varied_box(seed=s) beyond) on the forward-arc trajectory, so per-stream
    trajectories/ATEs are independent results, not replicas. Prints one JSON
    summary (aggregate fps + per-stream ATE/keyframes) and writes one
    trajectory file per stream next to --out."""
    import os
    import time

    from scavislam_tpu.io.synthetic import (
        SyntheticSequence,
        default_room,
        varied_box,
    )
    from scavislam_tpu.parallel.stream_pool import StreamPool
    from scavislam_tpu.pipeline.slam_system import ate_rmse

    B = args.streams
    n = args.synthetic or 60
    if not args.synthetic:
        print("--streams currently drives synthetic sequences; "
              f"defaulting to --synthetic {n}", file=sys.stderr)

    mesh = None
    if args.streams_mesh != 0:
        import jax

        ndev = len(jax.devices())
        want = args.streams_mesh if args.streams_mesh > 0 else ndev
        if want > 1 and B % want == 0:
            from scavislam_tpu.parallel.multistream import make_mesh

            mesh = make_mesh(want, dp=want)  # pure data parallel (sp=1)

    # pre-render every stream's frames to host uint8 once: rendering is
    # jitted on the default backend, and fetching B frames per tick over
    # the TPU tunnel would serialize a link round-trip per stream
    seqs = [
        SyntheticSequence(
            cam, n_frames=n, step=args.synthetic_step,
            planes=default_room() if s == 0 else varied_box(s),
        )
        for s in range(B)
    ]
    gt = [[] for _ in range(B)]
    frames_u8 = []  # [i][s] -> frame dict
    for i in range(n):
        tick = []
        for s in range(B):
            f = seqs[s].frame(i)
            gt[s].append(f["T_cw_gt"])
            tick.append({
                "frame_id": i,
                "left": (np.clip(np.asarray(f["left"]), 0, 1) * 255 + 0.5)
                .astype(np.uint8),
                "right": (np.clip(np.asarray(f["right"]), 0, 1) * 255 + 0.5)
                .astype(np.uint8),
            })
        frames_u8.append(tick)

    pool = StreamPool(cam, cfg, n_streams=B, mesh=mesh,
                      pipeline_depth=args.pipeline_depth or 2)
    pool.process_first_frames(frames_u8[0])
    # warm the remaining programs (consume path + spawn) before timing
    warm = min(4, n - 1)
    for i in range(1, 1 + warm):
        pool.process_frames(frames_u8[i])
    t0 = time.perf_counter()
    for i in range(1 + warm, n):
        pool.process_frames(frames_u8[i])
    pool.finish()
    dt = time.perf_counter() - t0
    timed = max(n - 1 - warm, 1)

    stem, ext = os.path.splitext(args.out)
    per_stream = []
    for s in range(B):
        traj = pool.trajectories[s]
        rows = [np.concatenate([[fid], T.t, T.log()[3:]])
                for fid, T in traj]
        np.savetxt(f"{stem}_s{s}{ext or '.txt'}", np.asarray(rows))
        pairs = [(fid, T) for fid, T in traj if 0 <= int(fid) < n]
        ate = ate_rmse(pairs, [gt[s][int(fid)] for fid, _ in pairs])
        per_stream.append({
            "stream": s,
            "alive": bool(pool.alive[s]),
            "frames": len(traj),
            "keyframes": int(pool.fes[s].next_kf),
            "ate_rmse_m": round(float(ate), 5),
        })

    summary = {
        "streams": B,
        "mesh": None if mesh is None else
        {ax: int(sz) for ax, sz in mesh.shape.items()},
        "frames_per_stream": n,
        "aggregate_fps": round(B * timed / dt, 1),
        "per_stream_fps": round(timed / dt, 1),
        "per_stream": per_stream,
    }
    print(json.dumps(summary, indent=2))
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", help="reference-format .cfg file")
    ap.add_argument("--dataset", help="override framepipe.path_str")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N synthetic frames instead of a dataset")
    ap.add_argument("--synthetic-step", type=float, default=0.02)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--out", default="trajectory.txt")
    ap.add_argument("--no-loop-closure", action="store_true")
    ap.add_argument("--threaded", action="store_true",
                    help="run backend/PR in real threads (reference topology)")
    ap.add_argument("--vocabulary", help=".npz vocabulary from create_dictionary")
    ap.add_argument("--save-map", help="save the final SLAM graph to .npz")
    ap.add_argument("--save-system",
                    help="checkpoint the FULL system (graph + frontend "
                         "tables + BoW index) for resume/map reuse")
    ap.add_argument("--load-system",
                    help="start from a saved system checkpoint; begins in "
                         "lost mode and relocalizes against the loaded map")
    ap.add_argument("--save-traj-tum", help="export trajectory in TUM format")
    ap.add_argument("--viz", help="render a top-down map PNG at the end")
    ap.add_argument("--viz-html",
                    help="export the interactive 3-D map viewer (one "
                         "self-contained HTML file) at the end")
    ap.add_argument("--pipelined", action="store_true",
                    help="pipelined frame processing (policy lags 2 frames)")
    ap.add_argument("--pipeline-depth", type=int, default=None,
                    help="frames in flight (default 2; use 3-4 for small "
                         "frames whose period is under the link RTT)")
    ap.add_argument("--debug-mode", type=int, default=-1,
                    help="0-6: per-frame debug view PNGs (residual/cur/prev/"
                         "dx/dy/right/color-disp — the GUI's ui.debug)")
    ap.add_argument("--debug-level", type=int, default=0,
                    help="pyramid level for --debug-mode (ui.debug_level)")
    ap.add_argument("--debug-out", default="debug_frames",
                    help="directory for --debug-mode PNGs")
    ap.add_argument("--debug-every", type=int, default=10,
                    help="write every Nth frame's debug view")
    ap.add_argument("--timing-plot",
                    help="stacked per-stage timing histogram PNG (the "
                         "GUI's live plotter)")
    ap.add_argument("--keyframe-view",
                    help="PNG of the last keyframe's image + anchored "
                         "points (the GUI's ui.show_keyframe view)")
    ap.add_argument("--watch", metavar="DIR",
                    help="live observability: refresh map/debug/timing PNGs "
                         "+ status.json in DIR and re-read DIR/tunables.cfg "
                         "while running (the headless analogue of the "
                         "reference's Pangolin GUI + Vars)")
    ap.add_argument("--watch-period", type=float, default=1.0,
                    help="watch refresh period in seconds (also live-tunable)")
    ap.add_argument("--streams", type=int, default=0,
                    help="run N concurrent synthetic streams through ONE "
                         "batched device program (parallel.stream_pool): "
                         "per-stream keyframe maps + trajectories + ATEs, "
                         "one packed fetch per tick for all streams")
    ap.add_argument("--streams-mesh", type=int, default=-1,
                    help="shard the stream batch over a dp-mesh of this many "
                         "devices (-1: auto — all devices when streams divide "
                         "evenly; 0: force single-device)")
    args = ap.parse_args(argv)

    cfg = load_config(args.config) if args.config else Config()
    cam = build_camera(cfg)

    if args.streams:
        return run_streams(args, cfg, cam)

    vocab = None
    if args.vocabulary:
        vocab = np.load(args.vocabulary)["vocab"]

    from scavislam_tpu.pipeline.slam_system import SlamSystem, ate_rmse

    if args.load_system:
        from scavislam_tpu.utils.serialization import load_system

        system = load_system(
            args.load_system, cam, cfg, threaded=args.threaded,
            enable_loop_closure=not args.no_loop_closure,
            pipelined=args.pipelined, pipeline_depth=args.pipeline_depth,
        )
    else:
        system = SlamSystem(
            cam, cfg, threaded=args.threaded,
            enable_loop_closure=not args.no_loop_closure,
            vocabulary=vocab, pipelined=args.pipelined,
            pipeline_depth=args.pipeline_depth,
        )

    gt_poses = []
    if args.synthetic:
        from scavislam_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(cam, n_frames=args.synthetic,
                                step=args.synthetic_step)
        frames = iter(seq)
    else:
        from scavislam_tpu.io.filegrabber import FileGrabber

        path = args.dataset or cfg.framepipe.path_str
        grabber = FileGrabber(
            path,
            base_pattern=cfg.framepipe.base_str,
            fmt=cfg.framepipe.format_str,
            right_img=cfg.framepipe.right_img,
            disp_img=cfg.framepipe.disp_img,
            depth_img=cfg.framepipe.depth_img,
            skip=cfg.framepipe.skip_imgs,
            focal=cfg.cam.f,
            baseline=cfg.cam.baseline,
            device_prefetch=args.pipelined,
        )

        frames = iter(grabber)

    if args.debug_mode >= 0:
        import os

        os.makedirs(args.debug_out, exist_ok=True)

    if args.keyframe_view:
        # the keyframe debug view reads stored keyframe pyramids; retention
        # is off by default (bounded device memory on long runs)
        system.frontend.keep_kf_images = True

    watcher = None
    if args.watch:
        from scavislam_tpu.apps.watch import Watcher

        watcher = Watcher(args.watch, system, period=args.watch_period,
                          num_disp=16 * cfg.ui.num_disp16,
                          debug_mode=max(args.debug_mode, 0))

    n = 0
    for frame in frames:
        if args.max_frames and n >= args.max_frames:
            break
        if "T_cw_gt" in frame:
            gt_poses.append(frame["T_cw_gt"])
        if n == 0:
            system.process_first_frame(frame)
        else:
            ok = system.process_frame(frame)
            if not ok:
                print("FAILURE! tracking lost at frame", n, file=sys.stderr)
                break
        if watcher is not None:
            watcher.tick(n, gt_poses)
            if watcher.quit:
                print("watch: quit requested", file=sys.stderr)
                break
        if args.debug_mode >= 0 and n % max(args.debug_every, 1) == 0:
            from scavislam_tpu.apps.visualize import render_debug_image

            render_debug_image(
                args.debug_mode, args.debug_level, system.frontend,
                num_disp=16 * cfg.ui.num_disp16,
                path=f"{args.debug_out}/debug_{n:06d}.png",
            )
        n += 1

    system.finish()
    system.shutdown()
    traj = system.export_trajectory()
    np.savetxt(args.out, traj)
    if args.save_traj_tum:
        from scavislam_tpu.utils.serialization import save_trajectory_tum

        save_trajectory_tum(system.trajectory, args.save_traj_tum)
    if args.save_map:
        from scavislam_tpu.utils.serialization import save_graph

        save_graph(system.backend.graph, args.save_map)
    if args.save_system:
        from scavislam_tpu.utils.serialization import save_system

        save_system(system, args.save_system)
    if args.viz:
        from scavislam_tpu.apps.visualize import render_map_topdown

        render_map_topdown(
            system.backend.graph, trajectory=system.trajectory,
            gt_poses=gt_poses or None, path=args.viz,
        )

    if args.viz_html:
        from scavislam_tpu.apps.map3d import export_map_html

        export_map_html(
            system.backend.graph, trajectory=system.trajectory,
            gt_poses=gt_poses or None, path=args.viz_html,
            actkey_id=system.frontend.actkey_id,
        )
    if args.timing_plot:
        from scavislam_tpu.apps.visualize import render_timing_plot

        render_timing_plot(system.per_mon, path=args.timing_plot)
    if args.keyframe_view and system.frontend.keyframe_map:
        from scavislam_tpu.apps.visualize import render_keyframe_view

        render_keyframe_view(
            system.frontend, max(system.frontend.keyframe_map),
            path=args.keyframe_view,
        )

    summary = system.per_mon.summary()
    summary["frames_processed"] = n
    summary["keyframes"] = len(system.frontend.keyframe_map)
    summary["map_points"] = int(np.asarray(system.frontend.points.valid).sum())
    summary["closed_loops"] = len(system.closed_loops)
    if gt_poses:
        # align by frame id (pipelined mode can skip/flush entries)
        pairs = [(fid, T) for fid, T in system.trajectory
                 if 0 <= int(fid) < len(gt_poses)]
        summary["ate_rmse_m"] = ate_rmse(
            pairs, [gt_poses[int(fid)] for fid, _ in pairs]
        )
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
