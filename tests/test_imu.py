"""IMU preintegration tests against analytic trajectories and finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import imu, lie


def synth_trajectory(n_steps=200, rate=200.0, seed=0):
    """Analytic sinusoidal trajectory; returns perfect IMU measurements.

    World frame: z up, gravity (0,0,-9.81). Returns body-frame gyro/accel
    sampled at `rate`, plus ground-truth (R, v, p) at both endpoints.
    """
    rng = np.random.default_rng(seed)
    dt = 1.0 / rate
    ts = np.arange(n_steps + 1) * dt
    # Position: sum of sines; Rotation: rotvec linear in t around a fixed axis.
    amp = rng.uniform(0.2, 0.8, size=3)
    freq = rng.uniform(0.5, 1.5, size=3)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    w_mag = 0.8  # rad/s

    def p_of(t):
        return amp * np.sin(2 * np.pi * freq * t + phase)

    def v_of(t):
        return amp * 2 * np.pi * freq * np.cos(2 * np.pi * freq * t + phase)

    def a_of(t):
        return -amp * (2 * np.pi * freq) ** 2 * np.sin(2 * np.pi * freq * t + phase)

    def R_of(t):
        from scipy.spatial.transform import Rotation
        return Rotation.from_rotvec(axis * w_mag * t).as_matrix()

    g = np.array([0.0, 0.0, -imu.GRAVITY])
    accs, gyrs = [], []
    for i in range(n_steps):
        t_mid = ts[i] + 0.5 * dt  # midpoint sampling reduces discretization bias
        R = R_of(t_mid)
        accs.append(R.T @ (a_of(t_mid) - g))
        gyrs.append(axis * w_mag)
    gt = {
        "R0": R_of(0.0), "v0": v_of(0.0), "p0": p_of(0.0),
        "R1": R_of(ts[-1]), "v1": v_of(ts[-1]), "p1": p_of(ts[-1]),
        "T": ts[-1],
    }
    return (np.asarray(accs, np.float32), np.asarray(gyrs, np.float32),
            np.full(n_steps, dt, np.float32), gt)


NOISE = jnp.diag(jnp.asarray([1.7e-4] * 3 + [2e-3] * 3, jnp.float32) ** 2)
WALK = jnp.diag(jnp.asarray([2e-5] * 3 + [3e-3] * 3, jnp.float32) ** 2)


class TestPreintegration:
    def test_predicts_analytic_trajectory(self):
        # 1 kHz so the first-order (Euler) discretization error stays < 5e-3.
        acc, gyr, dts, gt = synth_trajectory(n_steps=1000, rate=1000.0)
        state = imu.integrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                              jnp.zeros(6), NOISE, WALK)
        R1, v1, p1 = imu.predict_state(
            jnp.asarray(gt["R0"].astype(np.float32)),
            jnp.asarray(gt["v0"].astype(np.float32)),
            jnp.asarray(gt["p0"].astype(np.float32)),
            state, jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(R1), gt["R1"], atol=2e-3)
        np.testing.assert_allclose(np.asarray(v1), gt["v1"], atol=5e-3)
        np.testing.assert_allclose(np.asarray(p1), gt["p1"], atol=5e-3)
        assert abs(float(state.dT) - gt["T"]) < 1e-5

    def test_padding_is_identity(self):
        acc, gyr, dts, _ = synth_trajectory(n_steps=50)
        s_plain = imu.integrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                                jnp.zeros(6), NOISE, WALK)
        pad = 30
        acc_p = np.concatenate([acc, np.ones((pad, 3), np.float32)])
        gyr_p = np.concatenate([gyr, np.ones((pad, 3), np.float32)])
        dts_p = np.concatenate([dts, np.zeros(pad, np.float32)])
        s_pad = imu.integrate(jnp.asarray(acc_p), jnp.asarray(gyr_p),
                              jnp.asarray(dts_p), jnp.zeros(6), NOISE, WALK)
        for a, b in zip(jax.tree.leaves(s_plain), jax.tree.leaves(s_pad)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_bias_jacobians_match_reintegration(self):
        """First-order bias correction ~ full re-integration with new bias."""
        acc, gyr, dts, _ = synth_trajectory(n_steps=100)
        bias0 = jnp.zeros(6)
        db = np.array([3e-3, -2e-3, 1e-3, 2e-2, -1e-2, 1.5e-2], np.float32)
        s0 = imu.integrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                           bias0, NOISE, WALK)
        s1 = imu.integrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                           jnp.asarray(db), NOISE, WALK)
        dR_corr = np.asarray(imu.delta_rotation(s0, jnp.asarray(db)))
        dV_corr = np.asarray(imu.delta_velocity(s0, jnp.asarray(db)))
        dP_corr = np.asarray(imu.delta_position(s0, jnp.asarray(db)))
        np.testing.assert_allclose(dR_corr, np.asarray(s1.dR), atol=2e-4)
        np.testing.assert_allclose(dV_corr, np.asarray(s1.dV), atol=2e-3)
        np.testing.assert_allclose(dP_corr, np.asarray(s1.dP), atol=2e-3)

    def test_covariance_psd_and_growth(self):
        acc, gyr, dts, _ = synth_trajectory(n_steps=100)
        s = imu.integrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                          jnp.zeros(6), NOISE, WALK)
        C = np.asarray(s.C, np.float64)
        C = 0.5 * (C + C.T)
        eig = np.linalg.eigvalsh(C)
        assert eig.min() > -1e-10
        # NOISE holds *discrete* (per-sample) sigmas; each step contributes
        # sigma_d^2 * dt^2, so after T seconds the rotation diagonal is
        # sigma_d^2 * dt * T (== sigma_c^2 * T when sigma_d = sigma_c*sqrt(rate)).
        T = float(s.dT)
        dt = float(dts[0])
        expected = (1.7e-4) ** 2 * dt * T
        diag_rot = np.diag(C)[:3]
        np.testing.assert_allclose(diag_rot, expected, rtol=0.3)

    def test_merge_equals_concatenation(self):
        """Integrating A then B's measurements == integrating A+B (KF culling merge)."""
        acc, gyr, dts, _ = synth_trajectory(n_steps=120)
        half = 60
        full = imu.integrate(jnp.asarray(acc), jnp.asarray(gyr), jnp.asarray(dts),
                             jnp.zeros(6), NOISE, WALK)
        # Merge = re-run scan continuing from the first state.
        s_a = imu.integrate(jnp.asarray(acc[:half]), jnp.asarray(gyr[:half]),
                            jnp.asarray(dts[:half]), jnp.zeros(6), NOISE, WALK)
        s_ab = s_a
        for i in range(half, 120):
            s_ab = imu.integrate_step(s_ab, jnp.asarray(acc[i]), jnp.asarray(gyr[i]),
                                      jnp.asarray(dts[i]), NOISE, WALK)
        np.testing.assert_allclose(np.asarray(s_ab.dP), np.asarray(full.dP), atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_ab.dR), np.asarray(full.dR), atol=1e-6)

    def test_split_interval(self):
        stamps = jnp.asarray(np.array([0.0, 0.01, 0.02, 0.03, 0.04], np.float32))
        dts = np.asarray(imu.split_interval(0.005, 0.035, stamps))
        np.testing.assert_allclose(dts, [0.005, 0.01, 0.01, 0.005], atol=1e-7)
