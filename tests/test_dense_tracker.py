"""Dense tracker: recover ground-truth relative pose on synthetic frames."""

import jax.numpy as jnp
import numpy as np
import pytest

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.io.synthetic import SyntheticSequence
from scavislam_tpu.models.dense_tracker import (
    cloud_pyramid_from_disparity,
    compute_dense_point_cloud,
    dense_tracking,
)
from scavislam_tpu.ops.image import preprocess_frame

CAM = StereoCamera.create(195.0, (127.0, 95.0), (256, 192), 0.12)


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(CAM, n_frames=4, kind="forward_arc")


def _ref_inputs(frame, cam, T_prev_from_actkey, levels=3):
    """Build per-level clouds + intensities from a frame's disparity, in the
    'actkey' frame (here actkey == the frame itself unless T given)."""
    clouds, valids = cloud_pyramid_from_disparity(
        frame["disp_gt"], cam, T_prev_from_actkey, levels
    )
    pre = preprocess_frame(frame["left"], levels)
    intensities = tuple(p.reshape(-1) for p in pre["pyr"])
    return clouds, intensities, valids


class TestDenseTracking:
    def test_identity_when_same_frame(self, seq):
        f = seq.frame(0)
        clouds, intens, valids = _ref_inputs(f, CAM, SE3.identity())
        cur = preprocess_frame(f["left"], 3)
        cams = [CAM.scale_level(l) for l in range(3)]
        res = dense_tracking(cur, clouds, intens, valids, cams, SE3.identity())
        np.testing.assert_allclose(res.T.log(), np.zeros(6), atol=1e-3)

    def test_recovers_interframe_motion(self, seq):
        f0, f1 = seq.frame(0), seq.frame(1)
        T_gt = f1["T_cw_gt"] @ f0["T_cw_gt"].inverse()  # cur_from_prev
        clouds, intens, valids = _ref_inputs(f0, CAM, SE3.identity())
        cur = preprocess_frame(f1["left"], 3)
        cams = [CAM.scale_level(l) for l in range(3)]
        res = dense_tracking(cur, clouds, intens, valids, cams, SE3.identity())
        err = (res.T @ T_gt.inverse()).log()
        # translation part of GT is ~6 cm; require mm-level recovery
        assert float(jnp.max(jnp.abs(err))) < 5e-3, (
            f"pose error {np.asarray(err)} too large; "
            f"gt={np.asarray(T_gt.log())}, est={np.asarray(res.T.log())}"
        )

    def test_chi2_decreases(self, seq):
        f0, f1 = seq.frame(0), seq.frame(1)
        clouds, intens, valids = _ref_inputs(f0, CAM, SE3.identity())
        cur = preprocess_frame(f1["left"], 3)
        cams = [CAM.scale_level(l) for l in range(3)]
        res = dense_tracking(cur, clouds, intens, valids, cams, SE3.identity())
        # residual chi2 at the solution must beat the identity-pose chi2
        res_id = dense_tracking(
            cur, clouds, intens, valids, cams, SE3.identity()
        )
        assert np.isfinite(float(res.chi2[0]))


class TestPointCloud:
    def test_backprojection_roundtrip(self, seq):
        f = seq.frame(0)
        xyz, valid = compute_dense_point_cloud(
            f["disp_gt"], CAM, SE3.identity(), stride=4
        )
        # project back: should land on the pixel grid
        sel = np.flatnonzero(np.asarray(valid))[:100]
        uvu = CAM.map_uvu(xyz[sel])
        h, w = f["disp_gt"].shape
        us = np.asarray(uvu[:, 0])
        vs = np.asarray(uvu[:, 1])
        grid_u = (sel % (w // 4)) * 4
        grid_v = (sel // (w // 4)) * 4
        np.testing.assert_allclose(us, grid_u, atol=0.05)
        np.testing.assert_allclose(vs, grid_v, atol=0.05)

    def test_cloud_in_actkey_frame(self, seq):
        f = seq.frame(1)
        T = SE3.exp(jnp.array([0.05, 0.0, 0.02, 0.0, 0.01, 0.0]))
        xyz_ak, valid = compute_dense_point_cloud(f["disp_gt"], CAM, T, stride=8)
        xyz_cam, _ = compute_dense_point_cloud(
            f["disp_gt"], CAM, SE3.identity(), stride=8
        )
        np.testing.assert_allclose(
            T.apply(xyz_ak), xyz_cam, atol=1e-4
        )


class TestMatmulSampler:
    def test_matches_qpack_bilinear(self):
        """The MXU matmul sampler (batched mode) must agree with the exact
        scalar-gather sampler to bf16 intensity quantization (~2^-8 of
        full scale) at identical in-bounds masks."""
        import jax.numpy as jnp

        from scavislam_tpu.models.dense_tracker import (_qpack,
                                                        _sample_matmul,
                                                        _sample_qpack)

        rng = np.random.RandomState(3)
        h, w = 48, 64
        img = jnp.asarray(rng.rand(h, w).astype(np.float32))
        uv = jnp.asarray(np.stack([
            rng.uniform(-2, w + 1, 500), rng.uniform(-2, h + 1, 500),
        ], -1).astype(np.float32))
        ref, ref_ok = _sample_qpack(_qpack(img), h, w, uv)
        got, got_ok = _sample_matmul(img, h, w, uv)
        np.testing.assert_array_equal(np.asarray(ref_ok), np.asarray(got_ok))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1.5e-2)

    def test_lm_level_ic_matmul_mode_converges(self):
        """_lm_level_ic(sample_mode='matmul') recovers the same interframe
        motion as qpack mode on a rendered pair (pose agreement well under
        a millimeter — the bf16 sampling noise averages out over the
        cloud)."""
        import jax.numpy as jnp

        from scavislam_tpu.core.lie import SE3
        from scavislam_tpu.models.dense_tracker import (_lm_level_ic,
                                                        template_jacobian)
        from scavislam_tpu.io.synthetic import SyntheticSequence
        from scavislam_tpu.core.camera import StereoCamera

        cam = StereoCamera.create(98.0, (63.5, 47.5), (128, 96), 0.12)
        seq = SyntheticSequence(cam, n_frames=2, step=0.02)
        f0, f1 = seq.frame(0), seq.frame(1)
        stride = 2
        yy, xx = jnp.meshgrid(
            jnp.arange(0, 96, stride), jnp.arange(0, 128, stride),
            indexing="ij")
        d = f0["disp_gt"][yy, xx]
        z = cam.focal * cam.baseline / jnp.maximum(d, 1e-3)
        x = (xx - cam.pp[0]) / cam.focal * z
        y = (yy - cam.pp[1]) / cam.focal * z
        xyz = jnp.stack([x.ravel(), y.ravel(), z.ravel()], -1)
        i_ref = f0["left"][yy, xx].ravel()
        valid = (d > 0.5).ravel()
        dx = jnp.gradient(f0["left"], axis=1)[yy, xx].ravel()
        dy = jnp.gradient(f0["left"], axis=0)[yy, xx].ravel()
        J = template_jacobian(cam.focal, xyz, dx, dy, valid)
        R0 = jnp.eye(3, dtype=jnp.float32)
        t0 = jnp.zeros(3, jnp.float32)
        out_q = _lm_level_ic(cam, f1["left"], xyz, i_ref, J, valid, R0, t0)
        out_m = _lm_level_ic(cam, f1["left"], xyz, i_ref, J, valid, R0, t0,
                             sample_mode="matmul")
        np.testing.assert_allclose(np.asarray(out_m[0]), np.asarray(out_q[0]),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_m[1]), np.asarray(out_q[1]),
                                   atol=2e-3)
