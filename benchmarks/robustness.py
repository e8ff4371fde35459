"""Robustness evaluation: ATE degradation under sensor/scene perturbations.

The reference validates on real New College imagery (reference README:
181-197) — noisy, exposure-varying, with independently moving objects. The
synthetic benchmarks are photometrically exact, so this sweep injects each
real-world effect separately (io/synthetic.Degradation) and measures the ATE
and tracking-survival cost on a fixed trajectory with everything else held
constant.

What should carry the load (and is verified to):
- sensor noise     -> ZMSSD patch scoring (zero-mean, contrast-normalized)
                      + the dense tracker's Huber-style +-0.1 residual clamp
- exposure drift   -> ZMSSD is gain/offset tolerant per-patch; the dense
                      tracker's clamp bounds the photometric-constancy
                      violation per pixel
- vignetting       -> static per-eye profile; hurts only where pixels
                      traverse the profile quickly (rotation)
- moving occluder  -> motion-BA inlier rejection + matcher depth-ratio gate
                      must reject the object's points

Run on the real TPU: python benchmarks/robustness.py [n_frames]
Prints one JSON line per scenario.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import numpy as np


def run_case(name, deg, n=60, planes=None):
    import jax.numpy as jnp

    from scavislam_tpu.core.camera import StereoCamera
    from scavislam_tpu.io.synthetic import SyntheticSequence
    from scavislam_tpu.pipeline.slam_system import SlamSystem, ate_rmse
    from scavislam_tpu.utils.config import Config

    cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend, covis_thr=10),
        ui=dataclasses.replace(cfg.ui, parallax_thr=0.15),
    )
    seq = SyntheticSequence(cam, n_frames=n, step=0.01, degrade=deg,
                            planes=planes)
    frames = []
    for i in range(n):
        f = seq.frame(i)
        l8 = (np.clip(np.asarray(f["left"]), 0, 1) * 255 + 0.5).astype(
            np.uint8)
        r8 = (np.clip(np.asarray(f["right"]), 0, 1) * 255 + 0.5).astype(
            np.uint8)
        frames.append({"frame_id": i, "left": l8, "right": r8,
                       "T_cw_gt": f["T_cw_gt"],
                       "stacked_dev": jnp.asarray(np.stack([l8, r8]))})

    system = SlamSystem(cam, cfg, threaded=False, enable_loop_closure=False,
                        pipelined=True, pipeline_depth=2)
    system.process_first_frame(frames[0])
    lost_at = None
    for f in frames[1:]:
        if not system.process_frame(dict(f)):
            lost_at = f["frame_id"]
            break
    system.finish()
    system.shutdown()
    gtmap = {f["frame_id"]: f["T_cw_gt"] for f in frames}
    pairs = [(fid, T) for fid, T in system.trajectory if fid in gtmap]
    ate = ate_rmse(pairs, [gtmap[fid] for fid, _ in pairs]) if pairs else -1.0
    return {"scenario": name, "ate_rmse_m": round(float(ate), 4),
            "tracked_frames": len(pairs), "n_frames": n,
            "lost_at": lost_at,
            "keyframes": len(system.frontend.keyframe_map)}


def run_case_mono(name, deg, n=40, planes=None):
    """The same perturbation through the MONOCULAR pipeline (apps/mono_vo's
    engine): mono has no disparity-validity cross-check, so noise robustness
    leans entirely on the ZMSSD matcher, the prefiltered corner detection,
    and the motion-BA rejection; the metric is the Sim3-aligned ATE."""
    from scavislam_tpu.core.camera import StereoCamera
    from scavislam_tpu.io.synthetic import SyntheticSequence
    from scavislam_tpu.models.mono_frontend import MonoFrontend
    from scavislam_tpu.pipeline.slam_system import ate_rmse_aligned

    cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
    seq = SyntheticSequence(cam, n_frames=n, step=0.02, degrade=deg,
                            planes=planes)
    fe = MonoFrontend(cam)
    fe.process_first_frame(seq.frame(0))
    lost_at = None
    gts = [seq.frame(0)["T_cw_gt"]]
    for i in range(1, n):
        f = seq.frame(i)
        gts.append(f["T_cw_gt"])
        ok, _ = fe.process_frame(f)
        if not ok:
            lost_at = i
            break
    pairs = [(fid, T) for fid, T in fe.trajectory if fid < len(gts)]
    ate = (ate_rmse_aligned(pairs, [gts[fid] for fid, _ in pairs])
           if len(pairs) > 3 else -1.0)
    return {"scenario": name, "mode": "mono",
            "ate_sim3_m": round(float(ate), 4),
            "tracked_frames": len(pairs), "n_frames": n, "lost_at": lost_at,
            "keyframes": fe.next_kf}


def main():
    from scavislam_tpu.io.synthetic import Degradation, cluttered_room

    mono = "--mono" in sys.argv
    argv = [a for a in sys.argv if a != "--mono"]
    n = int(argv[1]) if len(argv) > 1 else (40 if mono else 60)
    cases = [
        ("clean", None),
        ("noise_2pct", Degradation(noise_std=0.02)),
        ("noise_5pct", Degradation(noise_std=0.05)),
        ("noise_10pct", Degradation(noise_std=0.10)),
        ("exposure_10pct", Degradation(exposure_amp=0.10,
                                       exposure_period=30.0)),
        ("exposure_25pct", Degradation(exposure_amp=0.25,
                                       exposure_period=30.0)),
        ("vignette_0.3", Degradation(vignette=0.3)),
        ("vignette_0.6", Degradation(vignette=0.6)),
        ("motion_blur_0.5", Degradation(motion_blur=0.5)),
        ("motion_blur_1.0", Degradation(motion_blur=1.0)),
        ("occluder_15pct", Degradation(occluder_frac=0.15)),
        ("occluder_25pct", Degradation(occluder_frac=0.25)),
        ("combined_moderate", Degradation(noise_std=0.03, exposure_amp=0.10,
                                          exposure_period=30.0, vignette=0.3,
                                          occluder_frac=0.15)),
        # non-planar scene: free-standing boxes/spheres -> interior
        # occlusion boundaries + depth discontinuities (the real-imagery
        # property the textured planes lack; VERDICT r2 gap 1)
        ("cluttered_clean", None, cluttered_room(0)),
        ("cluttered_noise_5pct", Degradation(noise_std=0.05),
         cluttered_room(0)),
        ("cluttered_combined", Degradation(noise_std=0.03, exposure_amp=0.10,
                                           exposure_period=30.0,
                                           vignette=0.3, occluder_frac=0.15),
         cluttered_room(0)),
    ]
    results = []
    for case in cases:
        name, deg = case[0], case[1]
        planes = case[2] if len(case) > 2 else None
        t0 = time.perf_counter()
        r = (run_case_mono(name, deg, n, planes) if mono
             else run_case(name, deg, n, planes))
        r["wall_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(r), flush=True)
        results.append(r)
    key = "ate_sim3_m" if mono else "ate_rmse_m"
    clean = results[0][key]
    print(json.dumps({"summary": "ate_vs_clean",
                      "clean_ate_m": clean,
                      "worst": max(results, key=lambda r: r[key])[
                          "scenario"]}))


if __name__ == "__main__":
    main()
