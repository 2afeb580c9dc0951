"""Bundle adjustment tests on synthetic multi-view problems."""

import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import lie
from orbslam3_byzyh_tpu.solver import ba

K_PARAMS = np.array([458.0, 457.0, 376.0, 240.0], np.float32)


def synth_ba(rng, n_kf=6, n_lm=300, max_obs=8, noise=0.5):
    """Cameras on an arc looking at a point cloud; landmark-major obs."""
    X = np.stack([rng.uniform(-4, 4, n_lm), rng.uniform(-3, 3, n_lm),
                  rng.uniform(6, 12, n_lm)], -1).astype(np.float32)
    Rs, ts = [], []
    for k in range(n_kf):
        rvec = np.array([0.0, -0.03 * k, 0.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(rvec)))
        t = np.array([-0.4 * k, 0.0, 0.0], np.float32)
        Rs.append(R)
        ts.append(t)
    Rs, ts = np.stack(Rs), np.stack(ts)

    fx, fy, cx, cy = K_PARAMS
    obs_kf = np.full((n_lm, max_obs), -1, np.int32)
    obs_uv = np.zeros((n_lm, max_obs, 2), np.float32)
    obs_valid = np.zeros((n_lm, max_obs), bool)
    for l in range(n_lm):
        slot = 0
        for k in range(n_kf):
            if slot >= max_obs:
                break
            pc = Rs[k] @ X[l] + ts[k]
            if pc[2] < 0.5:
                continue
            u = fx * pc[0] / pc[2] + cx
            v = fy * pc[1] / pc[2] + cy
            if not (0 <= u < 752 and 0 <= v < 480):
                continue
            obs_kf[l, slot] = k
            obs_uv[l, slot] = [u + rng.normal(0, noise), v + rng.normal(0, noise)]
            obs_valid[l, slot] = True
            slot += 1
    return X, Rs, ts, obs_kf, obs_uv, obs_valid


def make_problem(X, Rs, ts, obs_kf, obs_uv, obs_valid, fixed):
    n_lm = len(X)
    return ba.BAProblem(
        R=jnp.asarray(Rs), t=jnp.asarray(ts), points=jnp.asarray(X),
        obs_kf=jnp.asarray(obs_kf), obs_uv=jnp.asarray(obs_uv),
        obs_w=jnp.ones(obs_kf.shape, jnp.float32),
        obs_valid=jnp.asarray(obs_valid),
        fixed=jnp.asarray(fixed),
        lm_valid=jnp.ones(n_lm, bool),
        cam_params=jnp.asarray(K_PARAMS))


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestBundleAdjust:
    def test_refines_perturbed_problem(self, rng):
        X, Rs, ts, okf, ouv, oval = synth_ba(rng)
        n_kf = len(Rs)
        # Perturb everything except KF0 (gauge).
        Rp, tp = Rs.copy(), ts.copy()
        for k in range(1, n_kf):
            dR = np.asarray(lie.so3_exp(jnp.asarray(
                rng.uniform(-0.02, 0.02, 3).astype(np.float32))))
            Rp[k] = dR @ Rs[k]
            tp[k] = ts[k] + rng.uniform(-0.05, 0.05, 3)
        Xp = X + rng.uniform(-0.1, 0.1, X.shape).astype(np.float32)
        # Fix two poses: monocular BA has a free gauge (global scale) with
        # only one anchor, which would otherwise drift against GT.
        fixed = np.zeros(n_kf, bool)
        fixed[0] = True
        fixed[1] = True
        Rp[1], tp[1] = Rs[1], ts[1]
        prob = make_problem(Xp, Rp, tp, okf, ouv, oval, fixed)
        res = ba.bundle_adjust(prob)
        # Tolerances sit above the statistical floor: the converged cost is
        # BELOW the cost at ground truth (the ML fit absorbs the 0.5 px noise).
        for k in range(2, n_kf):
            assert rot_err_deg(np.asarray(res.R[k]), Rs[k]) < 0.15, k
            assert np.linalg.norm(np.asarray(res.t[k]) - ts[k]) < 0.03, k
        err = np.linalg.norm(np.asarray(res.points) - X, axis=-1)
        assert np.median(err) < 0.08

    def test_fixed_poses_unchanged(self, rng):
        X, Rs, ts, okf, ouv, oval = synth_ba(rng, n_kf=4)
        fixed = np.array([True, True, False, False])
        Xp = X + rng.uniform(-0.05, 0.05, X.shape).astype(np.float32)
        prob = make_problem(Xp, Rs, ts, okf, ouv, oval, fixed)
        res = ba.bundle_adjust(prob)
        np.testing.assert_array_equal(np.asarray(res.R[:2]), Rs[:2])
        np.testing.assert_array_equal(np.asarray(res.t[:2]), ts[:2])

    def test_outlier_observations_gated(self, rng):
        X, Rs, ts, okf, ouv, oval = synth_ba(rng, noise=0.3)
        # Corrupt 5% of observations badly.
        n_bad = 0
        flat = np.argwhere(oval)
        rng.shuffle(flat)
        bad = flat[: len(flat) // 20]
        for l, o in bad:
            ouv[l, o] += rng.uniform(30, 80, 2) * rng.choice([-1, 1], 2)
            n_bad += 1
        fixed = np.zeros(len(Rs), bool)
        fixed[0] = True
        fixed[1] = True
        prob = make_problem(X, Rs, ts, okf, ouv, oval, fixed)
        res = ba.bundle_adjust(prob)
        inl = np.asarray(res.obs_inlier)
        bad_kept = sum(bool(inl[l, o]) for l, o in bad)
        assert bad_kept == 0
        # Poses should stay close to GT despite outliers.
        for k in range(2, len(Rs)):
            assert rot_err_deg(np.asarray(res.R[k]), Rs[k]) < 0.15

    def test_empty_landmarks_are_noops(self, rng):
        X, Rs, ts, okf, ouv, oval = synth_ba(rng, n_lm=100)
        # Invalidate half the landmarks entirely.
        oval[50:] = False
        fixed = np.zeros(len(Rs), bool)
        fixed[0] = True
        prob = make_problem(X, Rs, ts, okf, ouv, oval, fixed)
        res = ba.bundle_adjust(prob)
        np.testing.assert_allclose(np.asarray(res.points[50:]), X[50:], atol=1e-6)


class TestStereoBA:
    """BA with mixed mono/stereo observations (EdgeStereoSE3ProjectXYZ:
    third residual u_r = u - bf/z per stereo row, chi2 gate 7.815)."""

    def test_stereo_rows_match_and_tighten(self, rng):
        bf = 40.0
        X, Rs, ts, okf, ouv, oval = synth_ba(rng, n_kf=5, n_lm=240)
        n_kf = len(Rs)
        # Ground-truth u_r from true geometry for ~60% of observations.
        fx, fy, cx, cy = K_PARAMS
        our = np.full(okf.shape, -1.0, np.float32)
        for l in range(len(X)):
            for o in range(okf.shape[1]):
                k = okf[l, o]
                if k < 0 or not oval[l, o]:
                    continue
                if rng.uniform() > 0.6:
                    continue
                pc = Rs[k] @ X[l] + ts[k]
                our[l, o] = (fx * pc[0] / pc[2] + cx - bf / pc[2]
                             + rng.normal(0, 0.4))

        # Perturb poses + points, then adjust with and without stereo rows.
        Rp, tp = Rs.copy(), ts.copy()
        for k in range(2, n_kf):
            dR = np.asarray(lie.so3_exp(jnp.asarray(
                rng.uniform(-0.02, 0.02, 3).astype(np.float32))))
            Rp[k] = dR @ Rs[k]
            tp[k] = ts[k] + rng.uniform(-0.05, 0.05, 3)
        Xp = X + rng.normal(0, 0.03, X.shape).astype(np.float32)
        fixed = np.zeros(n_kf, bool)
        fixed[:2] = True

        prob_m = make_problem(Xp, Rp, tp, okf, ouv, oval, fixed)
        prob_s = prob_m._replace(obs_ur=jnp.asarray(our),
                                 bf=jnp.asarray(bf, jnp.float32))
        res_m = ba.bundle_adjust(prob_m)
        res_s = ba.bundle_adjust(prob_s)

        for res in (res_m, res_s):
            for k in range(2, n_kf):
                assert rot_err_deg(np.asarray(res.R[k]), Rs[k]) < 0.3
                assert np.linalg.norm(np.asarray(res.t[k]) - ts[k]) < 0.05
        # Stereo rows must not hurt; typically they tighten translation.
        err_m = sum(np.linalg.norm(np.asarray(res_m.t[k]) - ts[k])
                    for k in range(2, n_kf))
        err_s = sum(np.linalg.norm(np.asarray(res_s.t[k]) - ts[k])
                    for k in range(2, n_kf))
        assert err_s < err_m * 1.5, (err_s, err_m)
