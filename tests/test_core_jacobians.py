"""Analytic Jacobians vs jax.jacfwd of the prediction functions."""

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.core.lie import SE3
from scavislam_tpu.core import transforms as tf

CAM = StereoCamera.create(389.96, (254.0, 182.0), (512, 384), 0.12)
KEY = jax.random.PRNGKey(7)


def random_pose(key, scale=0.4):
    return SE3.exp(jax.random.normal(key, (6,)) * scale)


def random_point(key):
    xy = jax.random.normal(key, (2,)) * 0.5
    z = 2.0 + jax.random.uniform(key, ()) * 5.0
    return jnp.array([xy[0] * z, xy[1] * z, z])


class TestElementary:
    def test_d_proj_d_y(self):
        xyz = random_point(KEY)
        J = tf.d_proj_d_y(CAM.focal, xyz)
        Jnum = jax.jacfwd(lambda p: CAM.mono.project(p))(xyz)
        np.testing.assert_allclose(J, Jnum, atol=1e-2, rtol=1e-2)

    def test_d_stereoproj_d_y(self):
        xyz = random_point(KEY)
        J = tf.d_stereoproj_d_y(CAM.focal, CAM.baseline, xyz)
        Jnum = jax.jacfwd(CAM.map_uvu)(xyz)
        np.testing.assert_allclose(J, Jnum, atol=1e-2, rtol=1e-2)

    def test_d_expy_d_y(self):
        y = random_point(KEY)
        J = tf.d_expy_d_y(y)
        Jnum = jax.jacfwd(lambda xi: SE3.exp(xi).apply(y))(jnp.zeros(6))
        np.testing.assert_allclose(J, Jnum, atol=1e-4)

    def test_d_Tinvpsi_d_psi(self):
        k1, k2 = jax.random.split(KEY)
        T = random_pose(k1)
        psi = tf.psi_from_xyz(random_point(k2))
        J = tf.d_Tinvpsi_d_psi(T, psi)
        Jnum = jax.jacfwd(lambda p: T.apply(tf.invert_depth(p)))(psi)
        np.testing.assert_allclose(J, Jnum, atol=1e-2, rtol=1e-2)

    def test_invert_depth_involution(self):
        xyz = random_point(KEY)
        np.testing.assert_allclose(
            tf.invert_depth(tf.psi_from_xyz(xyz)), xyz, atol=1e-4
        )


class TestWorldPointModel:
    def test_frame_jac(self):
        k1, k2 = jax.random.split(KEY)
        T = random_pose(k1)
        xyz_w = T.inverse().apply(random_point(k2))  # in front of camera
        J = tf.frame_jac_uvu_world(CAM, T, xyz_w)
        Jnum = jax.jacfwd(
            lambda xi: tf.predict_uvu_world(CAM, T.retract(xi), xyz_w)
        )(jnp.zeros(6))
        np.testing.assert_allclose(J, Jnum, atol=5e-2, rtol=1e-2)

    def test_point_jac(self):
        k1, k2 = jax.random.split(KEY)
        T = random_pose(k1)
        xyz_w = T.inverse().apply(random_point(k2))
        J = tf.point_jac_uvu_world(CAM, T, xyz_w)
        Jnum = jax.jacfwd(lambda p: tf.predict_uvu_world(CAM, T, p))(xyz_w)
        np.testing.assert_allclose(J, Jnum, atol=5e-2, rtol=1e-2)

    def test_batched(self):
        keys = jax.random.split(KEY, 16)
        Ts = SE3.stack([random_pose(k) for k in keys])
        pts = jnp.stack(
            [T.inverse().apply(random_point(k)) for T, k in
             zip([Ts.slice(i) for i in range(16)], keys)]
        )
        J = jax.vmap(lambda R, t, p: tf.frame_jac_uvu_world(CAM, SE3(R, t), p))(
            Ts.R, Ts.t, pts
        )
        assert J.shape == (16, 3, 6)
        assert np.all(np.isfinite(J))


class TestAnchoredModel:
    def setup_method(self):
        k1, k2, k3 = jax.random.split(KEY, 3)
        self.A_aw = random_pose(k1)
        # small relative pose => point projects near the image center, keeping
        # the f32 comparison against the two-step world-frame path well
        # conditioned.
        self.T_cw = random_pose(k2, scale=0.05) @ self.A_aw
        self.psi = tf.psi_from_xyz(random_point(k3))

    def test_prediction_matches_world_model(self):
        xyz_a = tf.invert_depth(self.psi)
        xyz_w = self.A_aw.inverse().apply(xyz_a)
        np.testing.assert_allclose(
            tf.predict_anchored_uvu(CAM, self.T_cw, self.A_aw, self.psi),
            tf.predict_uvu_world(CAM, self.T_cw, xyz_w),
            atol=1e-3,
        )

    def test_all_three_jacobians(self):
        Jf, Ja, Jp = tf.anchored_jacs(CAM, self.T_cw, self.A_aw, self.psi)
        Jf_num = jax.jacfwd(
            lambda xi: tf.predict_anchored_uvu(
                CAM, self.T_cw.retract(xi), self.A_aw, self.psi
            )
        )(jnp.zeros(6))
        Ja_num = jax.jacfwd(
            lambda xi: tf.predict_anchored_uvu(
                CAM, self.T_cw, self.A_aw.retract(xi), self.psi
            )
        )(jnp.zeros(6))
        Jp_num = jax.jacfwd(
            lambda p: tf.predict_anchored_uvu(CAM, self.T_cw, self.A_aw, p)
        )(self.psi)
        np.testing.assert_allclose(Jf, Jf_num, atol=5e-2, rtol=1e-2)
        np.testing.assert_allclose(Ja, Ja_num, atol=5e-2, rtol=1e-2)
        np.testing.assert_allclose(Jp, Jp_num, atol=5e-2, rtol=1e-2)


class TestRelativePoseEdge:
    def test_error_zero_at_consistency(self):
        k1, k2 = jax.random.split(KEY)
        T_1w = random_pose(k1)
        T_2w = random_pose(k2)
        T_21 = T_2w @ T_1w.inverse()
        err = tf.relative_pose_error(T_21, T_1w, T_2w)
        np.testing.assert_allclose(err, jnp.zeros(6), atol=1e-5)

    def test_bch_jacobians_close_to_autodiff(self):
        k1, k2 = jax.random.split(KEY)
        T_1w = random_pose(k1)
        T_2w = SE3.exp(jax.random.normal(k2, (6,)) * 0.05) @ T_1w
        T_21 = (T_2w @ T_1w.inverse()).retract(
            jax.random.normal(KEY, (6,)) * 0.02
        )

        d, J1, J2 = tf.relative_pose_jacobians(T_21, T_1w, T_2w)
        J1_num = jax.jacfwd(
            lambda xi: tf.relative_pose_error(T_21, T_1w.retract(xi), T_2w)
        )(jnp.zeros(6))
        J2_num = jax.jacfwd(
            lambda xi: tf.relative_pose_error(T_21, T_1w, T_2w.retract(xi))
        )(jnp.zeros(6))
        # BCH series is 2nd order — accurate for small d (|d| ~ 0.02 here).
        np.testing.assert_allclose(J1, J1_num, atol=5e-4)
        np.testing.assert_allclose(J2, J2_num, atol=5e-4)


class TestMonoModels:
    """The reference's remaining prediction models (mono + stereo point
    parametrizations, transformations.h:466-900), autodiff-verified."""

    def test_frame_jac_uv_world(self):
        T = random_pose(jax.random.PRNGKey(11), 0.3)
        x = random_point(jax.random.PRNGKey(12))
        J = tf.frame_jac_uv_world(CAM, T, x)
        Jnum = jax.jacfwd(
            lambda e: tf.predict_uv_world(CAM, SE3.exp(e) @ T, x)
        )(jnp.zeros(6))
        np.testing.assert_allclose(J, Jnum, atol=1e-2, rtol=1e-2)

    def test_uv_psi_jacs(self):
        T = random_pose(jax.random.PRNGKey(13), 0.3)
        psi = tf.psi_from_xyz(random_point(jax.random.PRNGKey(14)))
        Jf, Jp = tf.uv_psi_jacs(CAM, T, psi)
        Jf_num = jax.jacfwd(
            lambda e: tf.predict_uv_psi(CAM, SE3.exp(e) @ T, psi)
        )(jnp.zeros(6))
        Jp_num = jax.jacfwd(lambda p: tf.predict_uv_psi(CAM, T, p))(psi)
        np.testing.assert_allclose(Jf, Jf_num, atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(Jp, Jp_num, atol=1e-2, rtol=1e-2)

    def test_uvu_psi_jacs(self):
        T = random_pose(jax.random.PRNGKey(15), 0.3)
        psi = tf.psi_from_xyz(random_point(jax.random.PRNGKey(16)))
        Jf, Jp = tf.uvu_psi_jacs(CAM, T, psi)
        Jf_num = jax.jacfwd(
            lambda e: tf.predict_uvu_psi(CAM, SE3.exp(e) @ T, psi)
        )(jnp.zeros(6))
        Jp_num = jax.jacfwd(lambda p: tf.predict_uvu_psi(CAM, T, p))(psi)
        np.testing.assert_allclose(Jf, Jf_num, atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(Jp, Jp_num, atol=1e-2, rtol=1e-2)

    def test_uvu_from_uvu_roundtrip(self):
        x = random_point(jax.random.PRNGKey(17))
        uvu = CAM.map_uvu(x)
        # identity pose: the model must reproduce its own parametrization
        np.testing.assert_allclose(
            tf.predict_uvu_from_uvu(CAM, SE3.identity(), uvu), uvu,
            atol=1e-3)
        # general pose: equals map(T * unmap(uvu))
        T = random_pose(jax.random.PRNGKey(18), 0.3)
        np.testing.assert_allclose(
            tf.predict_uvu_from_uvu(CAM, T, uvu),
            CAM.map_uvu(T.apply(x)), atol=1e-2)

    def test_anchored_uv_jacs(self):
        kf, ka, kp = (jax.random.PRNGKey(i) for i in (19, 20, 21))
        T, A = random_pose(kf, 0.3), random_pose(ka, 0.3)
        psi = tf.psi_from_xyz(random_point(kp))
        Jf, Ja, Jp = tf.anchored_uv_jacs(CAM, T, A, psi)
        Jf_num = jax.jacfwd(
            lambda e: tf.predict_anchored_uv(CAM, SE3.exp(e) @ T, A, psi)
        )(jnp.zeros(6))
        Ja_num = jax.jacfwd(
            lambda e: tf.predict_anchored_uv(CAM, T, SE3.exp(e) @ A, psi)
        )(jnp.zeros(6))
        Jp_num = jax.jacfwd(
            lambda p: tf.predict_anchored_uv(CAM, T, A, p))(psi)
        np.testing.assert_allclose(Jf, Jf_num, atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(Ja, Ja_num, atol=1e-2, rtol=1e-2)
        np.testing.assert_allclose(Jp, Jp_num, atol=1e-2, rtol=1e-2)
