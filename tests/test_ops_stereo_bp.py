"""Belief-propagation stereo (methods 3/4 of the reference's runtime
selection, stereo_frontend.cpp:530-614): accuracy on synthetic piecewise
disparity + end-to-end tracking with each method selected."""

import numpy as np
import jax.numpy as jnp
import pytest

from scavislam_tpu.ops.stereo_bp import (
    belief_propagation_disparity,
    constant_space_bp_disparity,
)


def make_pair(H=96, W=128, seed=0):
    """Rectified pair with piecewise-constant GT disparity (5 | 12)."""
    rng = np.random.RandomState(seed)
    tex = rng.rand(H, W + 64).astype(np.float32)
    for _ in range(3):
        tex = 0.25 * (np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
                      + np.roll(tex, 1, 1) + np.roll(tex, -1, 1))
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    d_gt = np.where(np.arange(W)[None, :] < W // 2, 5, 12).astype(np.int32)
    d_gt = d_gt * np.ones((H, 1), np.int32)
    right = tex[:, 20:20 + W].copy()
    xs = np.arange(W)[None, :] - d_gt
    left = tex[np.arange(H)[:, None], 20 + xs]
    interior = np.zeros((H, W), bool)
    interior[8:-8, 16:-8] = True
    return left, right, d_gt, interior


# one (num_disp, iters, levels) point per method: every distinct static
# tuple is its own ~10 s XLA compile on the 1-core CI machine, so all
# assertions per method share one program. GT disparities are 5 and 12, so
# num_disp=16 keeps 25% headroom.
_BP_ARGS = dict(num_disp=16, iters=5, levels=4)
# CSBP needs num_disp/2^(levels-1) >= nr_plane or the coarsest level's
# top-K candidate set degenerates (16/8=2 < 4 -> fails to recover the GT)
_CSBP_ARGS = dict(num_disp=32, iters=4, levels=4, nr_plane=4)


class TestBeliefPropagation:
    def test_recovers_piecewise_disparity(self):
        left, right, d_gt, interior = make_pair()
        disp = np.asarray(belief_propagation_disparity(
            jnp.asarray(left), jnp.asarray(right), **_BP_ARGS))
        err = np.abs(disp - d_gt)[interior]
        assert (err <= 1.0).mean() > 0.97, f"only {(err<=1).mean():.2f} <=1px"
        assert err.mean() < 0.3

    def test_dense_output(self):
        left, right, _, _ = make_pair()
        disp = np.asarray(belief_propagation_disparity(
            jnp.asarray(left), jnp.asarray(right), **_BP_ARGS))
        assert disp.shape == left.shape
        assert np.isfinite(disp).all()
        assert disp.min() >= 0.0 and disp.max() <= _BP_ARGS["num_disp"]


class TestConstantSpaceBP:
    def test_recovers_piecewise_disparity(self):
        left, right, d_gt, interior = make_pair()
        disp = np.asarray(constant_space_bp_disparity(
            jnp.asarray(left), jnp.asarray(right), **_CSBP_ARGS))
        err = np.abs(disp - d_gt)[interior]
        # constant-space keeps only nr_plane candidates/pixel — coarser
        # than full BP by design
        assert (err <= 1.0).mean() > 0.9, f"only {(err<=1).mean():.2f} <=1px"

    def test_odd_disparities_reachable(self):
        """The per-level candidate expansion must reach odd disparities
        (pure doubling locks the output to multiples of 2^(levels-1))."""
        left, right, d_gt, interior = make_pair()
        disp = np.asarray(constant_space_bp_disparity(
            jnp.asarray(left), jnp.asarray(right), **_CSBP_ARGS))
        frac_odd_correct = (np.abs(disp - 5.0) < 0.5)[
            interior & (d_gt == 5)].mean()
        assert frac_odd_correct > 0.8


class TestMethodSelection:
    @pytest.mark.parametrize("method", [1, 3])
    def test_fused_step_wiring_traces(self, method):
        """Methods 1 (XLA-BM twin) and 3 (BP) wire into the fused frontend
        program (parity: ui.stereo_method, stereo_frontend.cpp:535).

        `stereo_method` is a STATIC argument — selection happens at trace
        time — so `jax.eval_shape` proves the whole per-frame program
        builds with the selected op (shape/dtype wiring bugs surface here)
        without paying the ~25 s/method XLA compile on the 1-core CI
        machine. Each method's disparity NUMERICS are covered directly by
        the op-level tests above and in test_ops_stereo.py; method 4 keeps
        the full end-to-end run below."""
        import jax

        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.models import frontend_step as FS
        from scavislam_tpu.models.map_store import PointTable, PoseTable

        h, w, levels = 64, 96, 3
        cam = StereoCamera.create(48.0, (47.5, 31.5), (w, h), 0.1)
        cams = [cam.scale_level(l) for l in range(levels)]
        params = tuple((c.focal, c.pp[0], c.pp[1], c.baseline) for c in cams)
        statics = tuple((int(c.size[0]), int(c.size[1])) for c in cams)

        from scavislam_tpu.ops.image import build_pyramid, sobel_xy
        from scavislam_tpu.ops.stereo import block_matching_disparity

        frames = jnp.zeros((2, h, w), jnp.float32)

        def one_state(img, right):
            pyr = build_pyramid(img, levels)
            dxs, dys = zip(*[sobel_xy(p) for p in pyr])
            disp = block_matching_disparity(img, right, num_disp=16,
                                            radius=5)
            return FS._cloud_state(
                pyr, disp, jnp.eye(3, dtype=jnp.float32),
                jnp.zeros(3, jnp.float32), params, levels, dxs, dys)

        # shapes only — nothing in this test needs an XLA compile
        clouds, valids, intens, Js = jax.eval_shape(
            one_state, frames[0], frames[1])
        out = jax.eval_shape(
            lambda fr, cl, it, va, J, R, t, ak, po, pt, cd: FS.frontend_step(
                fr, cl, it, va, J, R, t, ak, po, pt, cd, params, statics,
                levels=levels, num_disp=16, stereo_method=method,
                stereo_opts=(3, 3, 4)),
            frames, clouds, intens, valids, Js,
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            jnp.zeros((), jnp.int32), PoseTable.empty(), PointTable.empty(),
            jnp.full((768,), -1, jnp.int32),
        )
        assert out.packed.dtype == jnp.float32

    @pytest.mark.slow
    @pytest.mark.parametrize("method", [4])
    def test_frontend_tracks_with_method(self, method):
        """End-to-end VO with a non-default runtime-selected disparity
        method (parity: ui.stereo_method, stereo_frontend.cpp:535). CSBP is
        the structurally furthest from the default Pallas BM (per-level
        top-K plane expansion), so it is the one that earns the full run."""
        import dataclasses

        from scavislam_tpu.core.camera import StereoCamera
        from scavislam_tpu.io.synthetic import SyntheticSequence
        from scavislam_tpu.models.frontend import StereoFrontend
        from scavislam_tpu.utils.config import Config

        cam = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, ui=dataclasses.replace(
                cfg.ui, stereo_method=method, stereo_iters=3,
                stereo_levels=3, stereo_nr_plane=4))
        seq = SyntheticSequence(cam, n_frames=4, step=0.02)
        fe = StereoFrontend(cam, cfg)
        fe.process_first_frame(seq.frame(0))
        errs = []
        for i in range(1, 4):
            f = seq.frame(i)
            ok, _ = fe.process_frame(f)
            assert ok, f"method {method}: tracking failed at frame {i}"
            T_err = fe._world_pose() @ f["T_cw_gt"].inverse()
            errs.append(float(np.linalg.norm(np.asarray(T_err.t))))
        assert max(errs) < 0.05, f"method {method}: errs {errs}"
