"""Fused Pallas pose-opt kernel vs the XLA reference path.

Runs the kernel in interpreter mode on CPU (the kernel itself is exercised
for real on the TPU chip by bench.py / scripts/check_tpu_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import lie
from orbslam3_byzyh_tpu.solver import pallas_pose_opt, pose_opt


def make_problem(rng, n=700, noise=0.5, n_outliers=60):
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    rng.uniform(4, 12, n)], -1).astype(np.float32)
    w = rng.normal(0, 0.05, 3).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_gt = np.array([0.3, -0.1, 0.2], np.float32)
    cam = np.array([420.0, 420.0, 320.0, 240.0], np.float32)
    pc = pts @ R_gt.T + t_gt
    uv = np.stack([cam[0] * pc[:, 0] / pc[:, 2] + cam[2],
                   cam[1] * pc[:, 1] / pc[:, 2] + cam[3]], -1)
    uv += rng.normal(0, noise, uv.shape)
    out_idx = rng.choice(n, n_outliers, replace=False)
    uv[out_idx] += rng.uniform(20, 80, (n_outliers, 2))
    levels = rng.integers(0, 4, n)
    inv_s2 = (1.0 / 1.2 ** (2.0 * levels)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[rng.choice(n, 30, replace=False)] = False
    return (jnp.asarray(R_gt), jnp.asarray(t_gt), jnp.asarray(pts),
            jnp.asarray(uv.astype(np.float32)), jnp.asarray(inv_s2),
            jnp.asarray(valid), jnp.asarray(cam), out_idx)


class TestFusedPoseOpt:
    def test_matches_xla_path(self, rng):
        R_gt, t_gt, pts, uv, inv_s2, valid, cam, _ = make_problem(rng)
        # Start from a perturbed pose (like the motion-model prediction).
        dR = lie.so3_exp(jnp.asarray([0.01, -0.02, 0.015]))
        R0 = dR @ R_gt
        t0 = t_gt + jnp.asarray([0.05, -0.03, 0.08])

        ref = pose_opt.pose_optimization(R0, t0, pts, uv, inv_s2, valid, cam)
        Rk, tk, inl, n_inl, chi2 = pallas_pose_opt.pose_optimization_fused(
            R0, t0, pts, uv, inv_s2, valid, cam, interpret=True)

        # Both must land on the same pose (allow small float divergence from
        # the Gram-Schmidt vs SVD rotation re-projection).
        assert np.allclose(np.asarray(Rk), np.asarray(ref.R), atol=2e-3)
        assert np.allclose(np.asarray(tk), np.asarray(ref.t), atol=5e-3)
        # Inlier sets agree except near the chi2 boundary.
        agree = (np.asarray(inl) == np.asarray(ref.inlier)).mean()
        assert agree > 0.98, agree

    def test_recovers_gt_pose(self, rng):
        R_gt, t_gt, pts, uv, inv_s2, valid, cam, out_idx = make_problem(rng)
        R0 = lie.so3_exp(jnp.asarray([0.02, 0.01, -0.02])) @ R_gt
        t0 = t_gt + jnp.asarray([-0.06, 0.04, 0.05])
        Rk, tk, inl, n_inl, chi2 = pallas_pose_opt.pose_optimization_fused(
            R0, t0, pts, uv, inv_s2, valid, cam, interpret=True)
        ang = np.degrees(np.linalg.norm(np.asarray(
            lie.so3_log(Rk @ R_gt.T))))
        assert ang < 0.2, ang
        assert np.linalg.norm(np.asarray(tk) - np.asarray(t_gt)) < 0.02
        # Injected outliers must be flagged.
        inl_np = np.asarray(inl)
        assert inl_np[out_idx].mean() < 0.1
