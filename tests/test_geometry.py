"""Two-view geometry tests on synthetic scenes with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import geometry, lie

K = np.array([[458.0, 0, 376.0], [0, 457.0, 240.0], [0, 0, 1.0]], np.float32)


def synth_two_view(rng, n=200, planar=False, baseline=0.3, noise=0.5):
    """Random scene + two cameras; returns pixel obs and GT pose/points."""
    if planar:
        # Points on z=4 plane.
        X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                      np.full(n, 4.0)], -1)
    else:
        X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
                      rng.uniform(3, 8, n)], -1)
    # Camera 1 at origin; camera 2 translated + slightly rotated.
    rvec = np.array([0.02, -0.05, 0.01])
    R = np.asarray(lie.so3_exp(jnp.asarray(rvec.astype(np.float32))))
    t = np.array([baseline, 0.02, 0.01], np.float32)

    def project(Rc, tc, Xw):
        Xc = Xw @ Rc.T + tc
        p = Xc @ K.T
        return p[:, :2] / p[:, 2:3], Xc[:, 2]

    x1, z1 = project(np.eye(3, dtype=np.float32), np.zeros(3, np.float32), X)
    x2, z2 = project(R, t, X)
    x1 += rng.normal(0, noise, x1.shape)
    x2 += rng.normal(0, noise, x2.shape)
    ok = (z1 > 0) & (z2 > 0)
    return (x1.astype(np.float32), x2.astype(np.float32), X.astype(np.float32),
            R.astype(np.float32), t, ok)


class TestTriangulate:
    def test_dlt_recovers_points(self, rng):
        x1, x2, X, R, t, ok = synth_two_view(rng, noise=0.0)
        P1 = geometry.projection_matrix(jnp.asarray(K), jnp.eye(3), jnp.zeros(3))
        P2 = geometry.projection_matrix(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t))
        Xt = np.asarray(geometry.triangulate_dlt(
            P1, P2, jnp.asarray(x1), jnp.asarray(x2)))
        np.testing.assert_allclose(Xt[ok], X[ok], atol=2e-2)

    def test_dlt_with_noise(self, rng):
        x1, x2, X, R, t, ok = synth_two_view(rng, noise=0.5)
        P1 = geometry.projection_matrix(jnp.asarray(K), jnp.eye(3), jnp.zeros(3))
        P2 = geometry.projection_matrix(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t))
        Xt = np.asarray(geometry.triangulate_dlt(
            P1, P2, jnp.asarray(x1), jnp.asarray(x2)))
        err = np.linalg.norm(Xt[ok] - X[ok], axis=-1)
        assert np.median(err) < 0.15, np.median(err)


class TestMinimalSolvers:
    def test_fundamental_epipolar_constraint(self, rng):
        x1, x2, X, R, t, ok = synth_two_view(rng, noise=0.0)
        m = jnp.asarray(ok)
        x1n, T1 = geometry.normalize_points(jnp.asarray(x1), m.astype(jnp.float32))
        x2n, T2 = geometry.normalize_points(jnp.asarray(x2), m.astype(jnp.float32))
        sel = np.where(ok)[0][:8]
        Fn = geometry.fundamental_8pt(x1n[sel], x2n[sel])
        F = np.asarray(T2).T @ np.asarray(Fn) @ np.asarray(T1)
        x1h = np.concatenate([x1, np.ones((len(x1), 1))], -1)
        x2h = np.concatenate([x2, np.ones((len(x2), 1))], -1)
        resid = np.abs(np.sum(x2h * (x1h @ F.T), -1))
        # Residual scale depends on F normalization; compare to line norms.
        lines = x1h @ F.T
        d = resid / np.linalg.norm(lines[:, :2], axis=-1)
        assert np.median(d[ok]) < 1.0, np.median(d[ok])

    def test_homography_planar(self, rng):
        x1, x2, X, R, t, ok = synth_two_view(rng, planar=True, noise=0.0)
        m = jnp.asarray(ok).astype(jnp.float32)
        x1n, T1 = geometry.normalize_points(jnp.asarray(x1), m)
        x2n, T2 = geometry.normalize_points(jnp.asarray(x2), m)
        sel = np.where(ok)[0][:8]
        Hn = geometry.homography_dlt(x1n[sel], x2n[sel])
        H = np.linalg.inv(np.asarray(T2)) @ np.asarray(Hn) @ np.asarray(T1)
        x1h = np.concatenate([x1, np.ones((len(x1), 1))], -1)
        p = x1h @ H.T
        p = p[:, :2] / p[:, 2:3]
        err = np.linalg.norm(p - x2, axis=-1)
        assert np.median(err[ok]) < 0.5, np.median(err[ok])


class TestTwoViewReconstruct:
    def test_general_scene_uses_f(self, rng):
        x1, x2, X, R, t, ok = synth_two_view(rng, noise=0.5)
        res = geometry.two_view_reconstruct(
            jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(K), jnp.asarray(ok))
        assert bool(res.success)
        assert not bool(res.used_h)
        R_est, t_est = np.asarray(res.R), np.asarray(res.t)
        # Rotation error in degrees.
        dR = R_est.T @ R
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, ang
        # Translation direction (scale is unobservable).
        cos_t = abs(t_est @ t / (np.linalg.norm(t_est) * np.linalg.norm(t)))
        assert cos_t > 0.995, cos_t
        # Triangulated points match GT up to the global scale.
        good = np.asarray(res.good)
        assert good.sum() > 100
        Xe = np.asarray(res.points)[good]
        scale = np.median(X[good][:, 2] / Xe[:, 2])
        err = np.linalg.norm(Xe * scale - X[good], axis=-1)
        # Expected depth noise ~ z^2/(f*b) * sigma_px ~ 0.18 m at z=6 m.
        assert np.median(err) < 0.25, np.median(err)

    def test_planar_scene_uses_h(self, rng):
        x1, x2, X, R, t, ok = synth_two_view(rng, planar=True, noise=0.5)
        res = geometry.two_view_reconstruct(
            jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(K), jnp.asarray(ok))
        assert bool(res.success)
        assert bool(res.used_h)
        R_est = np.asarray(res.R)
        dR = R_est.T @ R
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.5, ang

    def test_no_parallax_fails(self, rng):
        """Pure rotation (no baseline) must be rejected."""
        x1, x2, X, R, t, ok = synth_two_view(rng, baseline=0.0, noise=0.3)
        res = geometry.two_view_reconstruct(
            jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2),
            jnp.asarray(K), jnp.asarray(ok))
        assert not bool(res.success)
