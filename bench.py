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


def main():
    # import AFTER potential env setup; uses the default platform (TPU chip
    # under the driver, CPU if forced)
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

    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    warmup = 6

    seq = SyntheticSequence(cam, n_frames=n_total, step=0.015)
    # pre-render all frames (device->host) so rendering cost isn't measured;
    # feeding from host mirrors a real grabber.
    frames = []
    for i in range(n_total):
        f = seq.frame(i)
        frames.append({
            "frame_id": i,
            "left": np.asarray(f["left"]),
            "right": np.asarray(f["right"]),
        })

    system = SlamSystem(cam, cfg, threaded=False, enable_loop_closure=False)
    system.process_first_frame(frames[0])
    # warmup: trigger every jit path (incl. a keyframe drop is unlikely in
    # warmup, so its compile lands in the timed region once — acceptable)
    for i in range(1, warmup):
        system.process_frame(frames[i])

    t0 = time.perf_counter()
    n_timed = 0
    for i in range(warmup, n_total):
        ok = system.process_frame(frames[i])
        if not ok:
            break
        n_timed += 1
    jax.effects_barrier()
    dt = time.perf_counter() - t0

    fps = n_timed / dt if dt > 0 else 0.0
    print(json.dumps({
        "metric": "stereo_slam_fps_512x384",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
