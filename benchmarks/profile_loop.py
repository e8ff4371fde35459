"""Profile the pipelined frame loop: where does wall time go per frame?

Breaks process_frame_pipelined into dispatch (collect candidates + _run_step)
vs consume (fetch wait + host policy) vs system overhead, plus keyframe-drop
cost. Run on the real TPU: `python benchmarks/profile_loop.py [n_frames]`.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scavislam_tpu.core.camera import StereoCamera
    from scavislam_tpu.io.synthetic import SyntheticSequence
    from scavislam_tpu.pipeline.slam_system import SlamSystem
    from scavislam_tpu.utils.config import Config

    cfg = Config()
    cam = StereoCamera.create(
        cfg.cam.f, (cfg.cam.px, cfg.cam.py),
        (cfg.cam.width, cfg.cam.height), cfg.cam.baseline,
    )
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seq = SyntheticSequence(cam, n_frames=n_total, step=0.015)
    frames = []
    for i in range(n_total):
        f = seq.frame(i)
        l8 = (np.clip(np.asarray(f["left"]), 0, 1) * 255 + 0.5).astype(np.uint8)
        r8 = (np.clip(np.asarray(f["right"]), 0, 1) * 255 + 0.5).astype(np.uint8)
        frames.append({
            "frame_id": i, "left": l8, "right": r8,
            "stacked_dev": jnp.asarray(np.stack([l8, r8])),
        })

    import dataclasses
    warm_cfg = dataclasses.replace(
        cfg, ui=dataclasses.replace(cfg.ui, parallax_thr=0.02))
    warm = SlamSystem(cam, warm_cfg, threaded=False, enable_loop_closure=False)
    warm.process_first_frame(frames[0])
    for i in range(1, 6):
        warm.process_frame(frames[i])

    system = SlamSystem(cam, cfg, threaded=True, enable_loop_closure=False,
                        pipelined=True)
    fe = system.frontend
    if len(sys.argv) > 2:
        fe.pipeline_depth = int(sys.argv[2])

    # monkeypatch stage timers around the frontend internals
    stats = {k: [] for k in
             ("collect", "dispatch", "fetch_wait", "policy", "loop_other",
              "total")}
    kf_frames = []

    orig_run = fe._run_step
    orig_consume = fe._consume
    orig_collect = fe._collect_candidates

    def run_step(frame, cand_ids):
        t0 = time.perf_counter()
        out = orig_run(frame, cand_ids)
        stats["dispatch"].append(time.perf_counter() - t0)
        return out

    def collect():
        t0 = time.perf_counter()
        r = orig_collect()
        stats["collect"].append(time.perf_counter() - t0)
        return r

    def consume(cand_ids, out, fut=None, corr_R=None, corr_t=None):
        t0 = time.perf_counter()
        if fut is not None:
            fut.result()
        t1 = time.perf_counter()
        stats["fetch_wait"].append(t1 - t0)
        nkf = len(fe.to_optimizer_stack)
        r = orig_consume(cand_ids, out, fut, corr_R, corr_t)
        if len(fe.to_optimizer_stack) > nkf:
            kf_frames.append((len(kf_frames), time.perf_counter() - t1))
        stats["policy"].append(time.perf_counter() - t1)
        return r

    fe._run_step = run_step
    fe._consume = consume
    fe._collect_candidates = collect

    system.process_first_frame(frames[0])
    system.process_frame(frames[1])

    t_loop0 = time.perf_counter()
    for i in range(2, n_total):
        t0 = time.perf_counter()
        ok = system.process_frame(frames[i])
        stats["total"].append(time.perf_counter() - t0)
        if not ok:
            print(f"tracking failed at {i}")
            break
    dt = time.perf_counter() - t_loop0
    n = len(stats["total"])
    system.shutdown()

    print(f"\n{n} frames, {n/dt:.1f} fps, {1e3*dt/n:.2f} ms/frame")
    for k in ("collect", "dispatch", "fetch_wait", "policy", "total"):
        v = np.asarray(stats[k][-n:]) * 1e3
        if len(v):
            print(f"{k:>11}: mean {v.mean():6.2f}  p50 {np.percentile(v,50):6.2f}"
                  f"  p90 {np.percentile(v,90):6.2f}  max {v.max():7.2f} ms")
    print(f"keyframe drops: {len(kf_frames)}; drop costs ms: "
          f"{[round(c*1e3,1) for _, c in kf_frames[:12]]}")


if __name__ == "__main__":
    main()
