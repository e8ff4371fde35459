import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera

CAM = StereoCamera.create(389.96, (254.0, 182.0), (512, 384), 0.12)


class TestStereoCamera:
    def test_map_unmap_roundtrip(self):
        key = jax.random.PRNGKey(1)
        xyz = jnp.stack(
            [
                jax.random.normal(key, (32,)) * 2.0,
                jax.random.normal(jax.random.fold_in(key, 1), (32,)) * 2.0,
                2.0 + jax.random.uniform(jax.random.fold_in(key, 2), (32,)) * 8.0,
            ],
            axis=-1,
        )
        uvu = CAM.map_uvu(xyz)
        back = CAM.unmap_uvu(uvu)
        np.testing.assert_allclose(back, xyz, rtol=1e-4, atol=1e-3)

    def test_disparity_positive_for_positive_depth(self):
        xyz = jnp.array([0.5, -0.3, 4.0])
        uvu = CAM.map_uvu(xyz)
        assert uvu[0] > uvu[2]  # u_left > u_right

    def test_q_matrix_consistent_with_unmap(self):
        # Q @ (u, v, d, 1) ~ (x, y, z) after dehomogenization
        xyz = jnp.array([0.7, 0.2, 3.0])
        uvu = CAM.map_uvu(xyz)
        d = uvu[0] - uvu[2]
        h = CAM.Q() @ jnp.array([uvu[0], uvu[1], d, 1.0])
        np.testing.assert_allclose(h[:3] / h[3], xyz, rtol=1e-4, atol=1e-3)

    def test_depth_to_disp_consistent(self):
        z = jnp.array(4.0)
        xyz = jnp.array([0.0, 0.0, 4.0])
        uvu = CAM.map_uvu(xyz)
        np.testing.assert_allclose(
            CAM.depth_to_disp(z), uvu[0] - uvu[2], rtol=1e-5
        )

    def test_scale_level_disparity_invariant(self):
        """The x2^l baseline trick: same depth -> same disparity value at all
        levels (frame_grabber-impl.cpp:50-59 semantics)."""
        xyz = jnp.array([0.4, -0.2, 5.0])
        d0 = CAM.map_uvu(xyz)
        d0 = d0[0] - d0[2]
        for level in (1, 2):
            cl = CAM.scale_level(level)
            ul = cl.map_uvu(xyz)
            np.testing.assert_allclose(ul[0] - ul[2], d0, rtol=1e-5)

    def test_scale_level_projection_halves(self):
        xyz = jnp.array([0.4, -0.2, 5.0])
        uv0 = CAM.mono.project(xyz)
        c1 = CAM.scale_level(1)
        uv1 = c1.mono.project(xyz)
        np.testing.assert_allclose(uv1, (uv0 + 0.5) / 2.0 - 0.5, atol=1e-4)

    def test_uv_disp_to_xyz(self):
        xyz = jnp.array([0.7, 0.2, 3.0])
        uvu = CAM.map_uvu(xyz)
        got = CAM.uv_disp_to_xyz(uvu[0], uvu[1], uvu[0] - uvu[2])
        np.testing.assert_allclose(got, xyz, rtol=1e-4, atol=1e-3)
