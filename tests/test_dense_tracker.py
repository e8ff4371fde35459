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
