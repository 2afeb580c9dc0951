"""Joint visual-inertial BA tests on a synthetic trajectory with landmarks."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import imu, lie
from orbslam3_byzyh_tpu.solver import inertial_ba
from test_imu import NOISE, WALK
from test_inertial import make_kf_chain

CAM = np.array([400.0, 400.0, 320.0, 240.0], np.float32)


def make_vi_problem(rng, n_kf=6, n_lm=200, noise_px=0.5):
    # The synthetic measurements are noiseless but first-order integrated;
    # the preintegration noise model must COVER that discretization error or
    # the (huge) IMU information pulls the joint optimum away from GT.
    import jax.numpy as _jnp
    noise = _jnp.diag(_jnp.asarray([2e-3] * 3 + [2e-2] * 3) ** 2)
    Rs, ps, vs, preints = make_kf_chain(n_kf=n_kf, seg_steps=300,
                                        rate=1000.0, seed=2,
                                        noise_cov=noise)
    # Landmarks in front of the trajectory (world z roughly forward for the
    # identity-extrinsic camera looking along +z of the body).
    X = np.stack([rng.uniform(-3, 3, n_lm), rng.uniform(-2, 2, n_lm),
                  rng.uniform(4, 9, n_lm)], -1).astype(np.float32)
    R_cb = np.eye(3, dtype=np.float32)
    t_cb = np.zeros(3, np.float32)

    max_obs = n_kf
    obs_kf = np.full((n_lm, max_obs), -1, np.int32)
    obs_uv = np.zeros((n_lm, max_obs, 2), np.float32)
    obs_valid = np.zeros((n_lm, max_obs), bool)
    fx, fy, cx, cy = CAM
    for l in range(n_lm):
        for k in range(n_kf):
            xb = Rs[k].T @ (X[l] - ps[k])
            xc = R_cb @ xb + t_cb
            if xc[2] < 0.5:
                continue
            u = fx * xc[0] / xc[2] + cx
            v = fy * xc[1] / xc[2] + cy
            if not (0 <= u < 640 and 0 <= v < 480):
                continue
            obs_kf[l, k] = k
            obs_uv[l, k] = [u + rng.normal(0, noise_px),
                            v + rng.normal(0, noise_px)]
            obs_valid[l, k] = True

    edges_i = np.arange(n_kf - 1, dtype=np.int32)
    edges_j = np.arange(1, n_kf, dtype=np.int32)
    return Rs, ps, vs, preints, X, dict(
        obs_kf=obs_kf, obs_uv=obs_uv, obs_valid=obs_valid,
        edges_i=edges_i, edges_j=edges_j, R_cb=R_cb, t_cb=t_cb)


class TestVIBA:
    def test_refines_perturbed_states(self, rng):
        n_kf = 6
        Rs, ps, vs, preints, X, d = make_vi_problem(rng, n_kf=n_kf)
        Rp = Rs.copy()
        pp = ps.copy()
        vp = vs.copy()
        for k in range(2, n_kf):
            dR = np.asarray(lie.so3_exp(jnp.asarray(
                rng.uniform(-0.02, 0.02, 3).astype(np.float32))))
            Rp[k] = Rs[k] @ dR
            pp[k] = ps[k] + rng.uniform(-0.05, 0.05, 3)
            vp[k] = vs[k] + rng.uniform(-0.2, 0.2, 3)
        Xp = X + rng.uniform(-0.05, 0.05, X.shape).astype(np.float32)
        fixed = np.zeros(n_kf, bool)
        fixed[:2] = True

        prob = inertial_ba.VIBAProblem(
            R_wb=jnp.asarray(Rp), p_w=jnp.asarray(pp), v_w=jnp.asarray(vp),
            bg=jnp.zeros((n_kf, 3)), ba=jnp.zeros((n_kf, 3)),
            points=jnp.asarray(Xp),
            obs_kf=jnp.asarray(d["obs_kf"]), obs_uv=jnp.asarray(d["obs_uv"]),
            obs_w=jnp.ones(d["obs_kf"].shape, jnp.float32),
            obs_valid=jnp.asarray(d["obs_valid"]),
            lm_valid=jnp.ones(len(X), bool),
            edges_i=jnp.asarray(d["edges_i"]), edges_j=jnp.asarray(d["edges_j"]),
            preints=preints, edge_valid=jnp.ones(n_kf - 1, bool),
            walk_info=jnp.full((6,), 1e4, jnp.float32),
            R_cb=jnp.asarray(d["R_cb"]), t_cb=jnp.asarray(d["t_cb"]),
            cam_params=jnp.asarray(CAM),
            fixed=jnp.asarray(fixed),
            prior_bias_w=jnp.asarray([1e2, 1e4], jnp.float32))
        res = inertial_ba.vi_bundle_adjust(prob)

        for k in range(2, n_kf):
            dR = np.asarray(res.R_wb[k]).T @ Rs[k]
            ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            assert ang < 0.3, (k, ang)
            assert np.linalg.norm(np.asarray(res.p_w[k]) - ps[k]) < 0.03, k
            assert np.linalg.norm(np.asarray(res.v_w[k]) - vs[k]) < 0.1, k

    def test_preserves_metric_scale(self, rng):
        """Starting near the metric optimum (where the reference's dedicated
        InertialOptimization puts the map before FullInertialBA — correcting
        a large scale error is ITS job, solver/inertial.py, tested in
        test_inertial.py), joint VI-BA must refine without drifting scale."""
        n_kf = 6
        Rs, ps, vs, preints, X, d = make_vi_problem(rng, n_kf=n_kf)
        pp = ps + rng.uniform(-0.01, 0.01, ps.shape).astype(np.float32)
        vp = vs + rng.uniform(-0.05, 0.05, vs.shape).astype(np.float32)
        Xp = X + rng.uniform(-0.02, 0.02, X.shape).astype(np.float32)
        fixed = np.zeros(n_kf, bool)
        fixed[0] = True  # single anchor: scale held by the IMU only
        prob = inertial_ba.VIBAProblem(
            R_wb=jnp.asarray(Rs), p_w=jnp.asarray(pp), v_w=jnp.asarray(vp),
            bg=jnp.zeros((n_kf, 3)), ba=jnp.zeros((n_kf, 3)),
            points=jnp.asarray(Xp),
            obs_kf=jnp.asarray(d["obs_kf"]), obs_uv=jnp.asarray(d["obs_uv"]),
            obs_w=jnp.ones(d["obs_kf"].shape, jnp.float32),
            obs_valid=jnp.asarray(d["obs_valid"]),
            lm_valid=jnp.ones(len(X), bool),
            edges_i=jnp.asarray(d["edges_i"]), edges_j=jnp.asarray(d["edges_j"]),
            preints=preints, edge_valid=jnp.ones(n_kf - 1, bool),
            walk_info=jnp.full((6,), 1e4, jnp.float32),
            R_cb=jnp.asarray(d["R_cb"]), t_cb=jnp.asarray(d["t_cb"]),
            cam_params=jnp.asarray(CAM),
            fixed=jnp.asarray(fixed),
            prior_bias_w=jnp.asarray([1e2, 1e4], jnp.float32))
        res = inertial_ba.vi_bundle_adjust(prob, stages=(5, 10))
        d_gt = np.linalg.norm(ps[-1] - ps[0])
        d_after = np.linalg.norm(np.asarray(res.p_w[-1] - res.p_w[0]))
        assert abs(d_after - d_gt) / d_gt < 0.02, (d_gt, d_after)
        # Inter-KF distances (gauge-free scale checks) stay metric.
        for k in range(1, n_kf):
            dk_gt = np.linalg.norm(ps[k] - ps[0])
            dk = np.linalg.norm(np.asarray(res.p_w[k] - res.p_w[0]))
            assert abs(dk - dk_gt) < 0.02 + 0.03 * dk_gt, (k, dk_gt, dk)
