"""RANSAC PnP vs ground truth with outliers (MLPnPsolver equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import pnp
from scipy.spatial.transform import Rotation


def _make_problem(rng, n=200, outlier_frac=0.3, noise=0.5):
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    rng.uniform(4, 12, n)], -1)
    R = Rotation.from_rotvec(rng.normal(0, 0.2, 3)).as_matrix()
    t = rng.normal(0, 0.5, 3)
    t[2] = abs(t[2])
    cam_params = np.array([400.0, 400.0, 320.0, 240.0], np.float32)
    pc = pts @ R.T + t
    uv = np.stack([400 * pc[:, 0] / pc[:, 2] + 320,
                   400 * pc[:, 1] / pc[:, 2] + 240], -1)
    uv += rng.normal(0, noise, uv.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(30, 200, (n_out, 2)) * rng.choice(
        [-1, 1], (n_out, 2))
    return pts, uv, R, t, cam_params, out_idx


class TestPnPRansac:
    def test_recovers_pose_with_outliers(self, rng):
        pts, uv, R, t, cam_params, out_idx = _make_problem(rng)
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(0), jnp.asarray(pts, jnp.float32),
            jnp.asarray(uv, jnp.float32), jnp.ones(len(pts), jnp.float32),
            jnp.ones(len(pts), bool), jnp.asarray(cam_params))
        assert bool(res.ok)
        assert int(res.n_inliers) > 100
        R_err = Rotation.from_matrix(np.asarray(res.R) @ R.T).magnitude()
        assert R_err < 0.01, f"rotation error {np.degrees(R_err):.2f} deg"
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.05

    def test_outliers_rejected(self, rng):
        pts, uv, R, t, cam_params, out_idx = _make_problem(rng)
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(1), jnp.asarray(pts, jnp.float32),
            jnp.asarray(uv, jnp.float32), jnp.ones(len(pts), jnp.float32),
            jnp.ones(len(pts), bool), jnp.asarray(cam_params))
        inl = np.asarray(res.inlier)
        assert not inl[out_idx].any() or inl[out_idx].mean() < 0.05

    def test_degenerate_fails_gracefully(self, rng):
        """Too few valid points: ok must be False, no NaNs."""
        pts = np.zeros((50, 3), np.float32)
        uv = np.zeros((50, 2), np.float32)
        res = pnp.pnp_ransac(
            jax.random.PRNGKey(2), jnp.asarray(pts), jnp.asarray(uv),
            jnp.ones(50, jnp.float32), jnp.zeros(50, bool),
            jnp.asarray([400.0, 400, 320, 240], jnp.float32))
        assert not bool(res.ok)
