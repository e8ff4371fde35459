"""Device-time breakdown of the fused frontend step's stages.

Each stage of models/frontend_step.frontend_step is timed as its OWN jitted
program on realistic shapes (512x384, 3 levels, CAND_CAP candidates), using
CHAINED executions: k data-dependent calls per host fetch, so the tunnel
round-trip and dispatch overhead cancel in t(k) - t(1) and the slope is pure
device time. (Single-call timing over the axon tunnel is useless: the ~30 ms
RTT has >10 ms jitter, bigger than most stages.)

Run on the real TPU: `python benchmarks/profile_stages.py [reps]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHAIN = 8  # dependent executions per fetch


def timeit(fn, reps):
    """fn(k) runs k CHAINED (data-dependent) executions and one fetch.
    Per-execution device time = (t[CHAIN] - t[1]) / (CHAIN - 1)."""
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
    from scavislam_tpu.core.lie import SE3
    from scavislam_tpu.io.synthetic import SyntheticSequence
    from scavislam_tpu.models import frontend_step as FS
    from scavislam_tpu.models.dense_tracker import _lm_level_ic
    from scavislam_tpu.models.frontend import CAND_CAP
    from scavislam_tpu.models.pose_optimizer import motion_only_ba
    from scavislam_tpu.ops.fast import detect_corners_grid
    from scavislam_tpu.ops.image import build_pyramid, sobel_xy
    from scavislam_tpu.ops.stereo_pallas import (
        block_matching_disparity_pallas,
    )
    from scavislam_tpu.utils.config import Config

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 9
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
    stacked = jnp.stack([left, right])

    # shared device intermediates
    pyr = build_pyramid(left, levels)
    dxs, dys = zip(*[sobel_xy(p) for p in pyr])
    disp = block_matching_disparity_pallas(left, right, num_disp=64, radius=5)
    clouds, valids, intens, cloud_J = FS._cloud_state(
        pyr, disp, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        cam_params, levels, dxs, dys,
    )
    cur_pyr = build_pyramid(
        jnp.asarray(np.asarray(f1["left"], np.float32)), levels)

    rng = np.random.RandomState(0)
    C = CAND_CAP
    xyz_w = jnp.asarray(
        np.stack([rng.uniform(-2, 2, C), rng.uniform(-1.5, 1.5, C),
                  rng.uniform(2, 8, C)], -1).astype(np.float32))
    obs = jnp.asarray(
        np.stack([rng.uniform(0, 511, C), rng.uniform(0, 383, C),
                  rng.uniform(0, 511, C)], -1).astype(np.float32))
    weights = jnp.ones((C,), jnp.float32)
    mask = jnp.asarray(rng.rand(C) > 0.3)

    # --- stage programs: each takes a dependence scalar `acc` folded into
    # its data input so k calls chain serially on device ------------------
    @jax.jit
    def p_preprocess(st, acc):
        img = st[0] + acc * 1e-12
        out = jnp.float32(0)
        for p in build_pyramid(img, levels):
            dx, dy = sobel_xy(p)
            out += jnp.sum(dx) + jnp.sum(dy) + jnp.sum(p)
        return out

    @jax.jit
    def p_stereo(l, r, acc):
        return jnp.sum(block_matching_disparity_pallas(
            l + acc * 1e-12, r, num_disp=64, radius=5))

    @jax.jit
    def p_dense(pyr_cur, clouds, intens, valids, cloud_J, cam_p, acc):
        R_d = jnp.eye(3, dtype=jnp.float32)
        t_d = jnp.zeros(3, jnp.float32) + acc * 1e-12
        for level in range(levels - 1, -1, -1):
            focal, ppx, ppy, baseline = cam_p[level]
            cam_l = StereoCamera(focal, jnp.stack([ppx, ppy]),
                                 cam_statics[level], baseline)
            R_d, t_d, chi2, _ = _lm_level_ic(
                cam_l, pyr_cur[level], clouds[level], intens[level],
                cloud_J[level], valids[level], R_d, t_d)
        return jnp.sum(R_d) + jnp.sum(t_d) + chi2

    @jax.jit
    def p_corners(pyr_cur, acc):
        out = jnp.float32(0)
        for l in range(levels):
            w_l, h_l = cam_statics[l]
            cy, cx = max(h_l // 16, 4), max(w_l // 16, 4)
            img_l = pyr_cur[l] + acc * 1e-12
            uvb, scoreb, validb = detect_corners_grid(
                img_l, 10.0 / 255.0, cy, cx, 4)
            bp, ok = FS._extract_bucket_patches(
                img_l, uvb.reshape(cy, cx, 4, 2), validb.reshape(cy, cx, 4))
            out += jnp.sum(uvb) + jnp.sum(bp)
        return out

    @jax.jit
    def p_ba(xyz, obs, w, m, acc):
        cam0 = StereoCamera(
            cam_params[0][0],
            jnp.stack([cam_params[0][1], cam_params[0][2]]),
            cam_statics[0], cam_params[0][3])
        res = motion_only_ba(
            cam0, SE3(jnp.eye(3, dtype=jnp.float32),
                      jnp.zeros(3, jnp.float32)),
            xyz + acc * 1e-12, obs, w, m, 1.0)
        res = motion_only_ba(cam0, res.T, xyz, obs, w,
                             m & res.inlier_mask, 1.0)
        return jnp.sum(res.T.t) + res.chi2

    @jax.jit
    def p_cloud(pyr_cur, disp, cam_p, acc):
        dxs2, dys2 = zip(*[sobel_xy(p + acc * 1e-12) for p in pyr_cur])
        cl, va, it, J = FS._cloud_state(
            pyr_cur, disp, jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), cam_p, levels, dxs2, dys2)
        return sum(jnp.sum(c) for c in cl) + sum(jnp.sum(j) for j in J)

    # full fused step (empty map tables: gather/matching work is
    # shape-dependent, not value-dependent, so this is representative)
    from scavislam_tpu.models.map_store import PointTable, PoseTable

    poses = PoseTable.empty()
    points = PointTable.empty()
    cand_ids = jnp.asarray(np.full(C, -1, np.int64))

    def p_full(k):
        acc = jnp.float32(0.0)
        for _ in range(k):
            out = FS.frontend_step(
                stacked + acc * 1e-12, clouds, intens, valids, cloud_J,
                jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
                jnp.int32(0), poses, points, cand_ids, cam_params,
                cam_statics, levels=levels, num_disp=64,
            )
            acc = out.packed[0]
        return np.asarray(acc)

    def chained(prog, *args):
        def run(k):
            acc = jnp.float32(0.0)
            for _ in range(k):
                acc = prog(*args, acc)
            return np.asarray(acc)
        return run

    rows = [
        ("FULL fused step", p_full),
        ("preprocess", chained(p_preprocess, stacked)),
        ("stereo BM (pallas)", chained(p_stereo, left, right)),
        ("dense tracking", chained(
            p_dense, cur_pyr, clouds, intens, valids, cloud_J, cam_params)),
        ("corners+buckets", chained(p_corners, cur_pyr)),
        ("motion BA x2", chained(p_ba, xyz_w, obs, weights, mask)),
        ("cloud state", chained(p_cloud, cur_pyr, disp, cam_params)),
    ]
    results = {}
    for name, fn in rows:
        results[name] = timeit(fn, reps)
    total = 0.0
    print(f"{'stage':>20}  device ms")
    for name, _ in rows:
        if name != "FULL fused step":
            total += results[name]
        print(f"{name:>20}  {results[name]:7.2f}")
    print(f"{'sum of stages':>20}  {total:7.2f}   "
          "(full - sum ~ match stage + epilogue)")


if __name__ == "__main__":
    main()
