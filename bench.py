"""End-to-end benchmark: stereo SLAM frames/sec on one TPU chip.

Runs the full pipeline (preprocess + block-matching stereo + FAST + dense
tracking + guided matching + motion-only BA + keyframe policy + DWO backend)
on synthetic New College-shaped frames (512x384, the reference's validated
workload, /root/reference/data/newcollege.cfg) and reports steady-state
frames/sec. Baseline target: 60 fps (BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _wait_for_device(budget_s: float = 1500.0, probe_timeout: float = 120.0):
    """Pre-flight probe: the TPU tunnel occasionally WEDGES (all calls hang,
    historically clearing within ~20 min). A hung jax call cannot be
    interrupted in-process, so probe in a SUBPROCESS with a timeout and
    retry until the device answers or the budget runs out — a wedged start
    then costs minutes instead of the whole benchmark record."""
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return  # forced-CPU runs (tests) never wedge
    code = ("import jax, jax.numpy as jnp, numpy as np; "
            "jax.devices(); print(np.asarray(jnp.ones(2) + 1)[0])")
    deadline = time.time() + budget_s
    attempt = 0
    hard_failures = 0
    while True:
        attempt += 1
        try:
            res = subprocess.run(
                [sys.executable, "-c", code], timeout=probe_timeout,
                capture_output=True)
            if res.returncode == 0:
                if attempt > 1:
                    print(f"bench: device answered after {attempt} probes",
                          file=sys.stderr)
                return
            # HARD failure (backend raised, not a hang): surface it and
            # bail quickly — retrying for 25 min cannot fix a broken
            # install, and main() will show the same error anyway
            hard_failures += 1
            print("bench: device probe FAILED (rc=%d):\n%s" % (
                res.returncode,
                res.stderr.decode(errors="replace")[-500:]),
                file=sys.stderr)
            if hard_failures >= 3:
                print("bench: 3 hard probe failures; proceeding",
                      file=sys.stderr)
                return
        except subprocess.TimeoutExpired:
            pass  # a hang IS the wedge signature: keep waiting
        if time.time() > deadline:
            print("bench: device probe budget exhausted; proceeding anyway",
                  file=sys.stderr)
            return
        print(f"bench: device unresponsive (probe {attempt}); retrying in "
              "60 s", file=sys.stderr)
        time.sleep(60.0)


def main():
    # import AFTER potential env setup; uses the default platform (TPU chip
    # under the driver, CPU if forced)
    _wait_for_device()
    import jax

    from scavislam_tpu.core.camera import StereoCamera
    from scavislam_tpu.io.synthetic import SyntheticSequence
    from scavislam_tpu.pipeline.slam_system import SlamSystem
    from scavislam_tpu.utils.config import Config

    cfg = Config()  # newcollege-like defaults
    cam = StereoCamera.create(
        cfg.cam.f, (cfg.cam.px, cfg.cam.py),
        (cfg.cam.width, cfg.cam.height), cfg.cam.baseline,
    )

    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 80
    warmup = 6

    import jax.numpy as jnp

    # wander-in-closed-box at reference walking-pace cadence (~1 keyframe
    # per 5-12 frames through the 0.75 m parallax + 75 px track-length drop
    # rules, stereo_frontend.cpp:512-528) — the headline must PAY
    # keyframe-spawn + backend cost at the reference's cadence, not
    # amortize it away over a near-static dolly (VERDICT r4 item 5; the old
    # dolly spawned ~3 keyframes in 230 frames, and at walking step sizes
    # it exits the finite synthetic room). The closed box bounds the
    # geometry, so cadence is uniform for any run length (same workload
    # family as benchmark config 7).
    from scavislam_tpu.io.synthetic import closed_box

    seq = SyntheticSequence(cam, n_frames=n_total, kind="wander",
                            planes=closed_box(), step=0.06)
    # pre-render + pre-upload all frames as device-resident uint8 stacks —
    # the role of the IO prefetch thread (the reference prefetches 50 frames
    # into RAM, filegrabber.cpp:54-61; on a remote chip the prefetch target
    # is HBM). The grabber upload happens off the critical path either way.
    frames = []
    for i in range(n_total):
        f = seq.frame(i)
        l8 = (np.clip(np.asarray(f["left"]), 0, 1) * 255 + 0.5).astype(np.uint8)
        r8 = (np.clip(np.asarray(f["right"]), 0, 1) * 255 + 0.5).astype(np.uint8)
        frames.append({
            "frame_id": i,
            "left": l8,
            "right": r8,
            "stacked_dev": jnp.asarray(np.stack([l8, r8])),
        })

    # ---- warmup: compile EVERY jit path before timing. A separate throwaway
    # system with a tiny parallax threshold forces keyframe drops (spawn +
    # backend prepare/optimize paths compile here; jit caches are shared).
    import dataclasses

    warm_cfg = dataclasses.replace(
        cfg, ui=dataclasses.replace(cfg.ui, parallax_thr=0.02)
    )
    warm = SlamSystem(cam, warm_cfg, threaded=False,
                      enable_loop_closure=False)
    warm.process_first_frame(frames[0])
    for i in range(1, warmup):
        warm.process_frame(frames[i])
    warm.finish()
    # warm the local-registration program family too — it compiles at the
    # first registration, which otherwise lands mid-timing (10-30 s over
    # the tunnel on an 80-frame run)
    be = warm.backend
    if be.keyframe_snapshots and be._last_tables is not None:
        snap = be.keyframe_snapshots[max(be.keyframe_snapshots)]
        root = max(be.graph.vertices)
        be._match_and_align(snap, be.graph.vertices[root].T,
                            np.arange(64, dtype=np.int64),
                            *be._last_tables)

    # median of 3 independent timed runs: the tunnel's fps jitter is ±15%
    # with occasional 2x degradation spikes (same variance armor as config
    # 4's median-of-reps; jit caches are process-wide so repeat systems
    # re-use every compiled program). ATE is deterministic either way.
    # threaded: the backend runs in its own thread like the reference
    # (stereo_slam.cpp:195-196); the measured rate is the main tracking
    # loop's, exactly what the reference's on-screen FPS reports.
    reps = []
    n_kf = 0
    for _ in range(3):
        system = SlamSystem(cam, cfg, threaded=True,
                            enable_loop_closure=False,
                            pipelined=True, pipeline_depth=3)
        system.process_first_frame(frames[0])
        system.process_frame(frames[1])
        t0 = time.perf_counter()
        n_timed = 0
        for i in range(2, n_total):
            ok = system.process_frame(frames[i])
            if not ok:
                break
            n_timed += 1
        jax.effects_barrier()
        dt = time.perf_counter() - t0
        system.finish()
        system.shutdown()
        reps.append(n_timed / dt if dt > 0 else 0.0)
        n_kf = len(system.frontend.keyframe_map)
    fps = float(np.median(reps))
    print(json.dumps({
        "metric": "stereo_slam_fps_512x384",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
        "reps_fps": [round(r, 1) for r in reps],
        "keyframes": n_kf,
        "frames_per_keyframe": round(n_total / max(n_kf, 1), 1),
    }))


if __name__ == "__main__":
    main()
