"""Inertial optimizer tests: residual correctness, scale/gravity/bias init."""

import jax
import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import imu, lie
from orbslam3_byzyh_tpu.solver import inertial
from test_imu import NOISE, WALK, synth_trajectory


def make_kf_chain(n_kf=11, seg_steps=100, rate=200.0, seed=1,
                  bg_true=None, ba_true=None):
    """Analytic trajectory sampled into KFs with preintegrated segments."""
    acc, gyr, dts, gt = synth_trajectory(n_steps=(n_kf - 1) * seg_steps,
                                         rate=rate, seed=seed)
    if bg_true is not None:
        gyr = gyr + bg_true
    if ba_true is not None:
        acc = acc + ba_true
    from scipy.spatial.transform import Rotation

    # Recompute GT states at KF boundaries by re-deriving the trajectory.
    rng = np.random.default_rng(seed)
    amp = rng.uniform(0.2, 0.8, size=3)
    freq = rng.uniform(0.5, 1.5, size=3)
    phase = rng.uniform(0, 2 * np.pi, size=3)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    w_mag = 0.8
    dt = 1.0 / rate

    def p_of(t):
        return amp * np.sin(2 * np.pi * freq * t + phase)

    def v_of(t):
        return amp * 2 * np.pi * freq * np.cos(2 * np.pi * freq * t + phase)

    def R_of(t):
        return Rotation.from_rotvec(axis * w_mag * t).as_matrix()

    kf_t = np.arange(n_kf) * seg_steps * dt
    Rs = np.stack([R_of(t) for t in kf_t]).astype(np.float32)
    ps = np.stack([p_of(t) for t in kf_t]).astype(np.float32)
    vs = np.stack([v_of(t) for t in kf_t]).astype(np.float32)

    preints = []
    for k in range(n_kf - 1):
        lo, hi = k * seg_steps, (k + 1) * seg_steps
        st = imu.integrate(jnp.asarray(acc[lo:hi]), jnp.asarray(gyr[lo:hi]),
                           jnp.asarray(dts[lo:hi]), jnp.zeros(6), NOISE, WALK)
        preints.append(st)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *preints)
    return Rs, ps, vs, stacked


class TestInertialResidual:
    def test_zero_at_ground_truth(self):
        Rs, ps, vs, preints = make_kf_chain(n_kf=5)
        r = inertial.inertial_residual(
            jnp.asarray(Rs[:-1]), jnp.asarray(ps[:-1]), jnp.asarray(vs[:-1]),
            jnp.asarray(Rs[1:]), jnp.asarray(ps[1:]), jnp.asarray(vs[1:]),
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), preints)
        # First-order integration error only.
        assert np.abs(np.asarray(r)).max() < 2e-2, np.abs(np.asarray(r)).max()

    def test_nonzero_with_wrong_velocity(self):
        Rs, ps, vs, preints = make_kf_chain(n_kf=5)
        vs_bad = vs + 0.5
        r = inertial.inertial_residual(
            jnp.asarray(Rs[:-1]), jnp.asarray(ps[:-1]), jnp.asarray(vs_bad[:-1]),
            jnp.asarray(Rs[1:]), jnp.asarray(ps[1:]), jnp.asarray(vs_bad[1:]),
            jnp.zeros((4, 3)), jnp.zeros((4, 3)), preints)
        assert np.abs(np.asarray(r)).max() > 0.05


class TestInertialInit:
    def test_recovers_scale_gravity_bias(self):
        bg_true = np.array([0.004, -0.003, 0.002], np.float32)
        Rs, ps, vs, preints = make_kf_chain(n_kf=11, bg_true=bg_true)

        # Build the "visual" world: rotated (gravity not aligned) + scaled.
        from scipy.spatial.transform import Rotation
        R_vw = Rotation.from_euler("xy", [8, -5], degrees=True).as_matrix() \
            .astype(np.float32)
        s_true = 2.0  # metric = s_true * visual
        R_vis = np.einsum("ij,kjl->kil", R_vw, Rs)
        p_vis = (ps @ R_vw.T) / s_true

        res = inertial.inertial_only_optimization(
            jnp.asarray(R_vis), jnp.asarray(p_vis), preints,
            prior_g=1e2, prior_a=1e10)
        # Scale within 2% (reference claims <5% after 2 s, Changelog.md:45).
        assert abs(float(res.scale) - s_true) / s_true < 0.02, float(res.scale)
        # Gravity direction: Rwg * (0,0,-G) should match the visual-frame
        # gravity R_vw @ (0,0,-G) within 1 degree.
        g_est = np.asarray(res.R_wg) @ np.array([0, 0, -1.0])
        g_true = R_vw @ np.array([0, 0, -1.0])
        ang = np.degrees(np.arccos(np.clip(g_est @ g_true, -1, 1)))
        assert ang < 1.0, ang
        # Gyro bias recovered.
        np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=2.5e-3)

    def test_fix_scale_mode(self):
        Rs, ps, vs, preints = make_kf_chain(n_kf=8)
        res = inertial.inertial_only_optimization(
            jnp.asarray(Rs), jnp.asarray(ps), preints,
            prior_g=1e2, prior_a=1e5, fix_scale=True)
        assert float(res.scale) == 1.0
        # Velocities should match GT closely (metric-consistent input).
        np.testing.assert_allclose(np.asarray(res.vel), vs, atol=0.05)
