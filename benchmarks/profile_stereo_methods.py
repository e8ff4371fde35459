"""Per-method disparity timing on the real TPU — the reference's four
runtime-selectable stereo methods (stereo_frontend.cpp:530-614, ui key
`stereo_method` 1-4) each timed as its own device program at the New College
shape (512x384, 64 disparities), with a real-time verdict per method.

Methods (models/frontend_step.py:336-366 wiring):
  1  BM (XLA)     — the reference's CPU StereoBM path (ops/stereo.py)
  2  BM (Pallas)  — VMEM cost-volume kernel (ops/stereo_pallas.py), default
  3  BP           — hierarchical loopy BP, FH distance transform
  4  CSBP         — constant-space BP, top-K plane selection

Timing uses the chained-execution method (see profile_stages.py): k
data-dependent executions per host fetch so the ~30 ms tunnel RTT and its
>10 ms jitter cancel in the slope. Verdict: the full fused frame step is
~9 ms of which BM contributes ~1 ms, so a method fits the 60 fps budget
(16.7 ms) iff its time <= ~8 ms (9 - 1 + headroom); anything slower is an
offline/keyframe-quality option, matching the reference where BP/CSBP were
already far slower than BM on the 2011 GPU (the README recommends BM for
real-time use).

Run: python benchmarks/profile_stereo_methods.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHAIN = 4  # dependent executions per fetch (BP is slow; keep chains short)
BUDGET_MS = 8.0  # disparity share of the 60 fps frame budget (see docstring)


def timeit(fn, reps):
    fn(1)  # warm/compile
    fn(CHAIN)
    t1, tk = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(1)
        t1.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn(CHAIN)
        tk.append(time.perf_counter() - t0)
    return (float(np.median(tk)) - float(np.median(t1))) / (CHAIN - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from scavislam_tpu.core.camera import StereoCamera
    from scavislam_tpu.io.synthetic import SyntheticSequence
    from scavislam_tpu.ops.stereo import block_matching_disparity
    from scavislam_tpu.ops.stereo_bp import (
        belief_propagation_disparity,
        constant_space_bp_disparity,
    )
    from scavislam_tpu.ops.stereo_pallas import (
        block_matching_disparity_pallas,
    )
    from scavislam_tpu.utils.config import Config

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    cfg = Config()
    cam = StereoCamera.create(
        cfg.cam.f, (cfg.cam.px, cfg.cam.py),
        (cfg.cam.width, cfg.cam.height), cfg.cam.baseline,
    )
    seq = SyntheticSequence(cam, n_frames=2, step=0.015)
    f0 = seq.frame(0)
    left = jnp.asarray(np.asarray(f0["left"], np.float32))
    right = jnp.asarray(np.asarray(f0["right"], np.float32))

    # frontend_step's operating parameters for each method
    # (models/frontend_step.py:341-366)
    methods = [
        ("1 BM (XLA)", lambda l, r: block_matching_disparity(
            l, r, num_disp=64, radius=5)),
        ("2 BM (Pallas)", lambda l, r: block_matching_disparity_pallas(
            l, r, num_disp=64, radius=5)),
        ("3 BP", lambda l, r: belief_propagation_disparity(
            l, r, num_disp=64, iters=5, levels=4)),
        ("4 CSBP", lambda l, r: constant_space_bp_disparity(
            l, r, num_disp=64, iters=4, levels=4, nr_plane=4)),
    ]

    def chained(prog):
        jitted = jax.jit(lambda l, r, acc: jnp.sum(prog(l + acc * 1e-12, r)))

        def run(k):
            acc = jnp.float32(0.0)
            for _ in range(k):
                acc = jitted(left, right, acc)
            return np.asarray(acc)

        return run

    print(f"{'method':>16}  device ms   verdict (512x384xD64, 60fps budget)")
    rows = []
    for name, prog in methods:
        ms = timeit(chained(prog), reps)
        verdict = ("real-time" if ms <= BUDGET_MS
                   else "offline / keyframe-quality only")
        rows.append({"method": name, "device_ms": round(ms, 2),
                     "verdict": verdict})
        print(f"{name:>16}  {ms:9.2f}   {verdict}")
    import json
    print(json.dumps({"metric": "stereo_method_device_ms_512x384",
                      "rows": rows}))


if __name__ == "__main__":
    main()
