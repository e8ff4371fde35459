import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.lie import SE3, SO3, ad_se3, hat, lie_bracket_se3, vee

KEY = jax.random.PRNGKey(0)


def random_xi(key, scale=1.0, n=None):
    shape = (6,) if n is None else (n, 6)
    return jax.random.normal(key, shape) * scale


class TestSO3:
    def test_exp_log_roundtrip(self):
        omegas = jax.random.normal(KEY, (64, 3)) * 1.5
        # log returns the principal tangent; restrict to |omega| < pi where
        # the roundtrip is the identity.
        norms = jnp.linalg.norm(omegas, axis=-1, keepdims=True)
        omegas = omegas * jnp.minimum(1.0, 2.9 / norms)
        back = jax.vmap(lambda w: SO3.exp(w).log())(omegas)
        np.testing.assert_allclose(back, omegas, atol=1e-4)

    def test_exp_at_zero(self):
        R = SO3.exp(jnp.zeros(3)).R
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-7)

    def test_log_near_pi(self):
        # Rotations with angle close to pi exercise the near-pi branch.
        axis = jnp.array([0.3, -0.5, 0.81])
        axis = axis / jnp.linalg.norm(axis)
        for angle in [3.05, 3.14, np.pi - 1e-3]:
            w = axis * angle
            w_back = SO3.exp(w).log()
            # log may return the equivalent rotation; compare rotations.
            np.testing.assert_allclose(
                SO3.exp(w_back).R, SO3.exp(w).R, atol=5e-4
            )

    def test_orthogonality(self):
        w = jax.random.normal(KEY, (3,))
        R = SO3.exp(w).R
        np.testing.assert_allclose(R @ R.T, jnp.eye(3), atol=1e-6)
        assert jnp.abs(jnp.linalg.det(R) - 1.0) < 1e-6

    def test_exp_grad_finite_at_zero(self):
        g = jax.jacfwd(lambda w: SO3.exp(w).R)(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def test_exp_log_roundtrip(self):
        xis = random_xi(KEY, 1.2, 64)
        # keep rotation part below pi (principal branch)
        norms = jnp.linalg.norm(xis[:, 3:], axis=-1, keepdims=True)
        xis = xis.at[:, 3:].multiply(jnp.minimum(1.0, 2.9 / norms))
        back = jax.vmap(lambda x: SE3.exp(x).log())(xis)
        np.testing.assert_allclose(back, xis, atol=2e-4)

    def test_identity_and_inverse(self):
        xi = random_xi(KEY, 0.8)
        T = SE3.exp(xi)
        I = T @ T.inverse()
        np.testing.assert_allclose(I.R, jnp.eye(3), atol=1e-6)
        np.testing.assert_allclose(I.t, jnp.zeros(3), atol=1e-6)

    def test_composition_matches_matrix(self):
        k1, k2 = jax.random.split(KEY)
        A, B = SE3.exp(random_xi(k1)), SE3.exp(random_xi(k2))
        np.testing.assert_allclose(
            (A @ B).matrix(), A.matrix() @ B.matrix(), atol=1e-5
        )

    def test_apply_matches_matrix(self):
        T = SE3.exp(random_xi(KEY))
        pts = jax.random.normal(jax.random.PRNGKey(3), (10, 3))
        hom = jnp.concatenate([pts, jnp.ones((10, 1))], axis=-1)
        expect = (T.matrix() @ hom.T).T[:, :3]
        np.testing.assert_allclose(T.apply(pts), expect, atol=1e-5)

    def test_adjoint_definition(self):
        k1, k2 = jax.random.split(KEY)
        T = SE3.exp(random_xi(k1, 0.7))
        xi = random_xi(k2, 0.05)
        lhs = (T @ SE3.exp(xi) @ T.inverse()).log()
        rhs = T.adjoint() @ xi
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_retract_left_multiplicative(self):
        k1, k2 = jax.random.split(KEY)
        T = SE3.exp(random_xi(k1))
        d = random_xi(k2, 0.1)
        Tr = T.retract(d)
        expect = SE3.exp(d) @ T
        np.testing.assert_allclose(Tr.matrix(), expect.matrix(), atol=1e-6)

    def test_exp_jittable_and_batched(self):
        f = jax.jit(lambda x: SE3.exp(x).log())
        xis = random_xi(KEY, 0.5, 8)
        np.testing.assert_allclose(f(xis), xis, atol=1e-4)


class TestBracket:
    def test_ad_matches_bracket(self):
        k1, k2 = jax.random.split(KEY)
        a, b = random_xi(k1), random_xi(k2)
        np.testing.assert_allclose(
            ad_se3(a) @ b, lie_bracket_se3(a, b), atol=1e-6
        )

    def test_hat_vee(self):
        w = jax.random.normal(KEY, (3,))
        np.testing.assert_allclose(vee(hat(w)), w, atol=1e-7)
