"""Device-time scaling of the BATCHED (multistream) frontend step.

VERDICT r3 weak-point 4: 8 vmapped streams took ~85 ms/step vs ~9 ms
single-stream — 9.4x time for 8x work, i.e. batching bought ~nothing
aggregate. This profiler decomposes WHERE the linear (or worse) scaling
lives: each stage of models/frontend_step.frontend_step is timed as its own
jitted program vmapped over B streams, for B in (1, 2, 4, 8), using the
chained-execution method of profile_stages.py (k data-dependent executions
per fetch; the tunnel RTT cancels in the slope).

A stage that uses the MXU/VPU well should show strongly sublinear time in B
at these sizes (the chip is far from saturated at B=1); transaction-bound
gathers scale ~linearly in B.

Run on the real TPU: `python benchmarks/profile_multistream.py [reps]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHAIN = 6
BATCHES = (1, 2, 4, 8)


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
    from scavislam_tpu.models import frontend_step as FS
    from scavislam_tpu.models.dense_tracker import _lm_level_ic
    from scavislam_tpu.models.frontend import CAND_CAP
    from scavislam_tpu.models.map_store import PointTable, PoseTable
    from scavislam_tpu.ops.fast import detect_corners_grid
    from scavislam_tpu.ops.image import build_pyramid, sobel_xy
    from scavislam_tpu.ops.stereo_pallas import (
        block_matching_disparity_pallas,
    )
    from scavislam_tpu.parallel.multistream import build_multistream_frontend
    from scavislam_tpu.utils.config import Config

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    cfg = Config()
    cam = StereoCamera.create(
        cfg.cam.f, (cfg.cam.px, cfg.cam.py),
        (cfg.cam.width, cfg.cam.height), cfg.cam.baseline,
    )
    levels = 3
    cams = [cam.scale_level(l) for l in range(levels)]
    cam_params = tuple((c.focal, c.pp[0], c.pp[1], c.baseline) for c in cams)
    cam_statics = tuple((int(c.size[0]), int(c.size[1])) for c in cams)

    seq = SyntheticSequence(cam, n_frames=3, step=0.015)
    f0, f1 = seq.frame(0), seq.frame(1)
    left = jnp.asarray(np.asarray(f0["left"], np.float32))
    right = jnp.asarray(np.asarray(f0["right"], np.float32))

    pyr = build_pyramid(left, levels)
    dxs, dys = zip(*[sobel_xy(p) for p in pyr])
    disp = block_matching_disparity_pallas(left, right, num_disp=64, radius=5)
    clouds1, valids1, intens1, cloud_J1 = FS._cloud_state(
        pyr, disp, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        cam_params, levels, dxs, dys,
    )
    cur_pyr1 = build_pyramid(
        jnp.asarray(np.asarray(f1["left"], np.float32)), levels)

    C = CAND_CAP
    results = {b: {} for b in BATCHES}

    for B in BATCHES:
        batch = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        stacked_b = batch(jnp.stack([left, right]))
        cur_pyr_b = [batch(p) for p in cur_pyr1]
        clouds_b = [batch(c) for c in clouds1]
        valids_b = [batch(v) for v in valids1]
        intens_b = [batch(i) for i in intens1]
        cloud_J_b = [batch(j) for j in cloud_J1]
        disp_b = batch(disp)
        Rb = batch(jnp.eye(3, dtype=jnp.float32))
        tb = jnp.zeros((B, 3), jnp.float32)

        @jax.jit
        def p_preprocess(st, acc):
            def one(img):
                out = jnp.float32(0)
                for p in build_pyramid(img, levels):
                    dx, dy = sobel_xy(p)
                    out += jnp.sum(dx) + jnp.sum(dy) + jnp.sum(p)
                return out
            return jnp.sum(jax.vmap(one)(st[:, 0] + acc * 1e-12))

        @jax.jit
        def p_stereo_map(st, acc):
            # the legacy formulation: lax.map of the Pallas kernel
            d = jax.lax.map(
                lambda fr: block_matching_disparity_pallas(
                    fr[0], fr[1], num_disp=64, radius=5),
                st + acc * 1e-12)
            return jnp.sum(d)

        @jax.jit
        def p_stereo_batched(st, acc):
            # the production formulation: ONE (B, h//rows)-grid launch
            from scavislam_tpu.ops.stereo_pallas import (
                block_matching_disparity_pallas_batched,
            )

            s = st + acc * 1e-12
            d = block_matching_disparity_pallas_batched(
                s[:, 0], s[:, 1], num_disp=64, radius=5)
            return jnp.sum(d)

        def make_dense(mode):
            @jax.jit
            def p_dense(pyrs, clouds, intens, valids, Js, acc):
                def one(pyr_c, cl, it, va, J):
                    R_d = jnp.eye(3, dtype=jnp.float32)
                    t_d = jnp.zeros(3, jnp.float32) + acc * 1e-12
                    for level in range(levels - 1, -1, -1):
                        focal, ppx, ppy, baseline = cam_params[level]
                        cam_l = StereoCamera(focal, jnp.stack([ppx, ppy]),
                                             cam_statics[level], baseline)
                        R_d, t_d, chi2, _ = _lm_level_ic(
                            cam_l, pyr_c[level], cl[level], it[level],
                            J[level], va[level], R_d, t_d,
                            sample_mode=mode)
                    return jnp.sum(R_d) + jnp.sum(t_d) + chi2
                return jnp.sum(jax.vmap(one)(pyrs, clouds, intens, valids,
                                             Js))
            return p_dense

        p_dense = make_dense("qpack")
        p_dense_mm = make_dense("matmul")

        @jax.jit
        def p_corners(pyrs, acc):
            def one(pyr_c):
                out = jnp.float32(0)
                for l in range(levels):
                    w_l, h_l = cam_statics[l]
                    cy, cx = max(h_l // 16, 4), max(w_l // 16, 4)
                    img_l = pyr_c[l] + acc * 1e-12
                    uvb, scoreb, validb = detect_corners_grid(
                        img_l, 10.0 / 255.0, cy, cx, 4)
                    bp, ok = FS._extract_bucket_patches(
                        img_l, uvb.reshape(cy, cx, 4, 2),
                        validb.reshape(cy, cx, 4))
                    out += jnp.sum(uvb) + jnp.sum(bp)
                return out
            return jnp.sum(jax.vmap(one)(pyrs))

        @jax.jit
        def p_cloud(pyrs, disps, acc):
            def one(pyr_c, dsp):
                dxs2, dys2 = zip(*[sobel_xy(p + acc * 1e-12) for p in pyr_c])
                cl, va, it, J = FS._cloud_state(
                    pyr_c, dsp, jnp.eye(3, dtype=jnp.float32),
                    jnp.zeros(3, jnp.float32), cam_params, levels,
                    dxs2, dys2)
                return sum(jnp.sum(c) for c in cl) + sum(
                    jnp.sum(j) for j in J)
            return jnp.sum(jax.vmap(one)(pyrs, disps))

        # FULL batched step (the production program), at both the legacy
        # density and the pool's DENSE_SUBS_BATCHED (what StreamPool ships)
        poses_b = jax.tree.map(batch, PoseTable.empty())
        points_b = jax.tree.map(batch, PointTable.empty())
        cand = jnp.full((B, C), -1, jnp.int32)
        ak = jnp.zeros((B,), jnp.int32)

        def make_full(subs):
            fstep = build_multistream_frontend(
                None, cam_params, cam_statics, levels=levels, num_disp=64,
                dense_subs=subs)
            if subs is None:
                cl0, va0, it0, J0 = (clouds_b, valids_b, intens_b,
                                     cloud_J_b)
            else:
                cl1, va1, it1, J1 = FS._cloud_state(
                    pyr, disp, jnp.eye(3, dtype=jnp.float32),
                    jnp.zeros(3, jnp.float32), cam_params, levels, dxs,
                    dys, dense_subs=subs)
                cl0 = [batch(c) for c in cl1]
                va0 = [batch(v) for v in va1]
                it0 = [batch(i) for i in it1]
                J0 = [batch(j) for j in J1]

            def p_full(k):
                acc = jnp.float32(0.0)
                cl, va, it, J = cl0, va0, it0, J0
                R, t = Rb, tb
                for _ in range(k):
                    out = fstep(
                        (stacked_b + acc * 1e-12).astype(jnp.float32),
                        cl, it, va, J, R, t, ak, poses_b, points_b, cand)
                    cl, va, it, J = (out.clouds, out.cloud_valids,
                                     out.intens, out.cloud_J)
                    R, t = out.R_cw, out.t_cw
                    acc = out.packed[0, 0]
                return np.asarray(acc)
            return p_full

        p_full = make_full(None)
        p_full_pool = make_full(FS.DENSE_SUBS_BATCHED)

        def chained(prog, *args):
            def run(k):
                acc = jnp.float32(0.0)
                for _ in range(k):
                    acc = prog(*args, acc)
                return np.asarray(acc)
            return run

        rows = [
            ("FULL batched step", p_full),
            ("FULL (pool density)", p_full_pool),
            ("preprocess", chained(p_preprocess, stacked_b)),
            ("stereo lax.map", chained(p_stereo_map, stacked_b)),
            ("stereo batched-grid", chained(p_stereo_batched, stacked_b)),
            ("dense tracking", chained(
                p_dense, cur_pyr_b, clouds_b, intens_b, valids_b,
                cloud_J_b)),
            ("dense (MXU sampler)", chained(
                p_dense_mm, cur_pyr_b, clouds_b, intens_b, valids_b,
                cloud_J_b)),
            ("corners+buckets", chained(p_corners, cur_pyr_b)),
            ("cloud state", chained(p_cloud, cur_pyr_b, disp_b)),
        ]
        for name, fn in rows:
            results[B][name] = timeit(fn, reps)
        print(f"B={B}: " + "  ".join(
            f"{n}={results[B][n]:.2f}ms" for n, _ in rows), flush=True)

    names = list(results[BATCHES[0]].keys())
    print(f"\n{'stage':>20} " + " ".join(f"{('B=%d' % b):>8}" for b in BATCHES)
          + "   x8-scaling")
    for n in names:
        vals = [results[b][n] for b in BATCHES]
        scale = vals[-1] / vals[0] if vals[0] > 0 else float("nan")
        print(f"{n:>20} " + " ".join(f"{v:8.2f}" for v in vals)
              + f"   {scale:5.2f}x")
    # residual = full - sum(stages): the match stage + epilogue
    stage_names = [n for n in names if not n.startswith("FULL")]
    print(f"{'match+epilogue (resid)':>20} " + " ".join(
        f"{results[b]['FULL batched step'] - sum(results[b][n] for n in stage_names):8.2f}"
        for b in BATCHES))


if __name__ == "__main__":
    main()
