"""Unit tests for Lie-group ops against scipy closed forms and group axioms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from orbslam3_byzyh_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def random_rotvecs(rng, n=64, max_angle=3.0):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = random_rotvecs(rng)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_small_angle(self, rng):
        w = random_rotvecs(rng, max_angle=1e-7)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_ref = ScipyRot.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-6)

    def test_log_roundtrip(self, rng):
        w = random_rotvecs(rng, max_angle=3.0)
        w_back = np.asarray(lie.so3_log(lie.so3_exp(jnp.asarray(w))))
        np.testing.assert_allclose(w_back, w, atol=2e-4)

    def test_log_near_pi(self, rng):
        axes = rng.normal(size=(32, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        angles = rng.uniform(np.pi - 1e-4, np.pi - 1e-6, size=(32, 1))
        w = (axes * angles).astype(np.float32)
        R = ScipyRot.from_rotvec(w).as_matrix().astype(np.float32)
        w_back = np.asarray(lie.so3_log(jnp.asarray(R)))
        R_back = ScipyRot.from_rotvec(w_back).as_matrix()
        # Axis sign may flip at exactly pi; compare rotation matrices.
        np.testing.assert_allclose(R_back, R, atol=1e-3)

    def test_right_jacobian_finite_difference(self, rng):
        """Jr satisfies exp(w + dw) ~ exp(w) exp(Jr(w) dw)."""
        w = random_rotvecs(rng, n=16, max_angle=2.5)
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
        eps = 1e-3
        for k in range(3):
            dw = np.zeros(3, np.float32)
            dw[k] = eps
            R1 = np.asarray(lie.so3_exp(jnp.asarray(w + dw)))
            R0 = np.asarray(lie.so3_exp(jnp.asarray(w)))
            delta = np.asarray(
                lie.so3_log(jnp.asarray(np.swapaxes(R0, -1, -2) @ R1))
            )
            np.testing.assert_allclose(delta / eps, Jr[:, :, k], atol=5e-3)

    def test_right_jacobian_inverse(self, rng):
        w = random_rotvecs(rng, n=32, max_angle=2.5)
        Jr = np.asarray(lie.so3_right_jacobian(jnp.asarray(w)))
        Jri = np.asarray(lie.so3_right_jacobian_inv(jnp.asarray(w)))
        prod = Jr @ Jri
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-4)

    def test_normalize_rotation(self, rng):
        w = random_rotvecs(rng, n=8)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_noisy = R + rng.normal(scale=1e-3, size=R.shape).astype(np.float32)
        Rn = np.asarray(lie.normalize_rotation(jnp.asarray(R_noisy)))
        np.testing.assert_allclose(Rn @ np.swapaxes(Rn, -1, -2),
                                   np.broadcast_to(np.eye(3), Rn.shape), atol=1e-5)
        assert np.all(np.linalg.det(Rn) > 0.99)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.uniform(-1.5, 1.5, size=(64, 6)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        xi_back = np.asarray(lie.se3_log(R, t))
        np.testing.assert_allclose(xi_back, xi, atol=3e-4)

    def test_mul_inv(self, rng):
        xi = rng.uniform(-1, 1, size=(16, 6)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        Ri, ti = lie.se3_inv(R, t)
        Re, te = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Re), np.broadcast_to(np.eye(3), Re.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(te), 0, atol=1e-5)

    def test_apply(self, rng):
        xi = rng.uniform(-1, 1, size=(6,)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi))
        p = rng.normal(size=(10, 3)).astype(np.float32)
        q = np.asarray(lie.se3_apply(R, t, jnp.asarray(p)))
        q_ref = p @ np.asarray(R).T + np.asarray(t)
        np.testing.assert_allclose(q, q_ref, atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = rng.uniform(-1.0, 1.0, size=(64, 7)).astype(np.float32)
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        xi_back = np.asarray(lie.sim3_log(R, t, s))
        np.testing.assert_allclose(xi_back, xi, atol=1e-3)

    def test_small_tangent_roundtrip(self, rng):
        xi = rng.uniform(-1e-6, 1e-6, size=(16, 7)).astype(np.float32)
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)
        xi_back = np.asarray(lie.sim3_log(R, t, s))
        np.testing.assert_allclose(xi_back, xi, atol=1e-6)

    def test_mul_inv(self, rng):
        xi = rng.uniform(-1, 1, size=(16, 7)).astype(np.float32)
        R, t, s = lie.sim3_exp(jnp.asarray(xi))
        Ri, ti, si = lie.sim3_inv(R, t, s)
        Re, te, se = lie.sim3_mul(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(np.asarray(Re), np.broadcast_to(np.eye(3), Re.shape), atol=1e-5)
        np.testing.assert_allclose(np.asarray(te), 0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(se), 1, atol=1e-5)

    def test_apply_composition(self, rng):
        """(A*B) applied to p equals A applied to (B applied to p)."""
        xa = rng.uniform(-1, 1, size=(7,)).astype(np.float32)
        xb = rng.uniform(-1, 1, size=(7,)).astype(np.float32)
        A = lie.sim3_exp(jnp.asarray(xa))
        B = lie.sim3_exp(jnp.asarray(xb))
        AB = lie.sim3_mul(*A, *B)
        p = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        lhs = np.asarray(lie.sim3_apply(*AB, p))
        rhs = np.asarray(lie.sim3_apply(*A, lie.sim3_apply(*B, p)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)


class TestQuaternion:
    def test_quat_roundtrip(self, rng):
        w = random_rotvecs(rng, n=128, max_angle=3.1)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        q = np.asarray(lie.rot_to_quat(jnp.asarray(R)))
        R_back = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
        np.testing.assert_allclose(R_back, R, atol=1e-5)

    def test_quat_matches_scipy(self, rng):
        w = random_rotvecs(rng, n=64)
        R = ScipyRot.from_rotvec(w)
        q_ref = R.as_quat()  # scipy: (x, y, z, w)
        q = np.asarray(lie.rot_to_quat(jnp.asarray(R.as_matrix().astype(np.float32))))
        # Quaternions are sign-ambiguous.
        sign = np.sign(np.sum(q * q_ref, axis=-1, keepdims=True))
        np.testing.assert_allclose(q * sign, q_ref, atol=1e-5)
