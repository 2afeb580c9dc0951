#!/usr/bin/env python3
"""On-chip validation of the Pallas kernels against their XLA reference
paths (the CPU test suite runs them in interpreter mode; this script is the
real-hardware check)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import lie
from orbslam3_byzyh_tpu.solver import pallas_pose_opt, pose_opt


def main():
    assert pallas_pose_opt.tpu_available(), "no TPU backend"
    rng = np.random.default_rng(42)
    n = 1024
    pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
                    rng.uniform(4, 12, n)], -1).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(
        rng.normal(0, 0.05, 3).astype(np.float32))))
    t_gt = np.array([0.3, -0.1, 0.2], np.float32)
    cam = jnp.asarray([420.0, 420.0, 320.0, 240.0])
    pc = pts @ R_gt.T + t_gt
    uv = np.stack([420 * pc[:, 0] / pc[:, 2] + 320,
                   420 * pc[:, 1] / pc[:, 2] + 240], -1)
    uv += rng.normal(0, 0.5, uv.shape)
    inv_s2 = np.ones(n, np.float32)
    valid = np.ones(n, bool)
    R0 = lie.so3_exp(jnp.asarray([0.01, -0.02, 0.015])) @ jnp.asarray(R_gt)
    t0 = jnp.asarray(t_gt) + jnp.asarray([0.05, -0.03, 0.08])

    Rk, tk, inl, n_inl, chi2 = pallas_pose_opt.pose_optimization_fused(
        R0, t0, jnp.asarray(pts), jnp.asarray(uv.astype(np.float32)),
        jnp.asarray(inv_s2), jnp.asarray(valid), cam)
    ang = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(Rk @ R_gt.T))))
    terr = float(np.linalg.norm(np.asarray(tk) - t_gt))
    print(f"fused pose opt on TPU: rot err {ang:.4f} deg, "
          f"trans err {terr:.4f} m, inliers {int(n_inl)}/{n}")
    assert ang < 0.2 and terr < 0.02, "fused kernel diverged on TPU"
    print("OK")


if __name__ == "__main__":
    main()
