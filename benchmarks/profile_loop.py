"""Profile the pipelined frame loop: where does wall time go per frame?

Breaks process_frame_pipelined into dispatch (collect candidates + _run_step)
vs consume (fetch wait + host policy) vs system overhead, plus keyframe-drop
cost. Run on the real TPU:

    python benchmarks/profile_loop.py [n_frames] [pipeline_depth]
    python benchmarks/profile_loop.py --config2 [n_frames] [pipeline_depth]

`--config2` profiles the LOOP-CLOSURE workload (the 360-spin in a closed box
at 256x192 with place recognition + backend threads live — the exact
benchmark config 2 shape), additionally reporting how much device/link time
the backend BA and the place recognizer steal from the frame loop.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scavislam_tpu.core.camera import StereoCamera
    from scavislam_tpu.io.synthetic import SyntheticSequence, closed_box
    from scavislam_tpu.pipeline.slam_system import SlamSystem
    from scavislam_tpu.utils.config import Config

    import dataclasses

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    config2 = "--config2" in sys.argv[1:]
    n_total = int(args[0]) if args else (90 if config2 else 60)
    depth = int(args[1]) if len(args) > 1 else None

    cfg = Config()
    if config2:
        # exact benchmark-config-2 shape (run_configs.config2)
        cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
        cfg = dataclasses.replace(
            cfg,
            frontend=dataclasses.replace(cfg.frontend, covis_thr=10),
            ui=dataclasses.replace(cfg.ui, parallax_thr=0.25),
            graph=dataclasses.replace(cfg.graph, inner_window=3,
                                      outer_window=8),
        )
        seq = SyntheticSequence(cam, n_frames=n_total, kind="spin",
                                planes=closed_box(), step=1.0 / (n_total - 1))
    else:
        cam = StereoCamera.create(
            cfg.cam.f, (cfg.cam.px, cfg.cam.py),
            (cfg.cam.width, cfg.cam.height), cfg.cam.baseline,
        )
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

    warm_cfg = dataclasses.replace(
        cfg, ui=dataclasses.replace(cfg.ui, parallax_thr=0.02))
    warm = SlamSystem(cam, warm_cfg, threaded=False,
                      enable_loop_closure=config2)
    warm.process_first_frame(dict(frames[0]))
    for i in range(1, 8 if config2 else 6):
        warm.process_frame(dict(frames[i]))
    warm.finish()
    warm.shutdown()

    system = SlamSystem(cam, cfg, threaded=True, enable_loop_closure=config2,
                        pipelined=True,
                        pipeline_depth=4 if config2 else None)
    if config2:
        system.place_recognizer.warmup()
    fe = system.frontend
    if depth is not None:
        fe.pipeline_depth = depth

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

    def consume(cand_ids, out, fut=None, corr_R=None, corr_t=None,
                epoch=None):
        t0 = time.perf_counter()
        if fut is not None:
            fut.result()
        t1 = time.perf_counter()
        stats["fetch_wait"].append(t1 - t0)
        nkf = len(fe.to_optimizer_stack)
        r = orig_consume(cand_ids, out, fut, corr_R, corr_t, epoch)
        if len(fe.to_optimizer_stack) > nkf:
            kf_frames.append((len(kf_frames), time.perf_counter() - t1))
        stats["policy"].append(time.perf_counter() - t1)
        return r

    fe._run_step = run_step
    fe._consume = consume
    fe._collect_candidates = collect

    # backend / place-recognizer device+link interference (their programs
    # serialize with the frame step on the single chip)
    interference = {"ba_dispatch": [], "ba_adopt": [], "pr_describe": [],
                    "pr_geo": [], "match_align": []}
    if config2:
        g = system.backend.graph
        orig_opt, orig_adopt = g.optimize, g.adopt_pending

        def opt(*a, **k):
            t0 = time.perf_counter()
            r = orig_opt(*a, **k)
            interference["ba_dispatch"].append(time.perf_counter() - t0)
            return r

        def adopt(*a, **k):
            t0 = time.perf_counter()
            r = orig_adopt(*a, **k)
            if r:
                interference["ba_adopt"].append(time.perf_counter() - t0)
            return r

        g.optimize, g.adopt_pending = opt, adopt
        pr = system.place_recognizer
        orig_desc, orig_geo = pr.describe, pr._geometric_check

        def desc(*a, **k):
            t0 = time.perf_counter()
            r = orig_desc(*a, **k)
            interference["pr_describe"].append(time.perf_counter() - t0)
            return r

        def geo(*a, **k):
            t0 = time.perf_counter()
            r = orig_geo(*a, **k)
            interference["pr_geo"].append(time.perf_counter() - t0)
            return r

        pr.describe, pr._geometric_check = desc, geo
        be = system.backend
        orig_ma = be._match_and_align

        def ma(*a, **k):
            t0 = time.perf_counter()
            r = orig_ma(*a, **k)
            interference["match_align"].append(time.perf_counter() - t0)
            return r

        be._match_and_align = ma

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
    if config2:
        print("\nbackend/PR work stealing device+link time from the loop "
              "(worker-thread wall, overlaps the frame loop only when the "
              "chip is idle):")
        for k, v in interference.items():
            if v:
                a = np.asarray(v) * 1e3
                print(f"{k:>12}: n={len(a):3d}  mean {a.mean():6.2f}  "
                      f"total {a.sum():7.1f} ms")
        print(f"loops closed: {len(system.closed_loops)}")


if __name__ == "__main__":
    main()
