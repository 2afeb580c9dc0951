"""TrajectoryLog: relative-pose frame records replayed against current KF
poses (Tracking.cc:3396-3419 + System::SaveTrajectoryEuRoC semantics)."""

import numpy as np

from orbslam3_byzyh_tpu.pipeline.trajectory_log import TrajectoryLog


def rand_pose(rng):
    from scipy.spatial.transform import Rotation
    R = Rotation.random(random_state=rng.integers(1 << 30)).as_matrix()
    return R.astype(np.float32), rng.normal(size=3).astype(np.float32)


def compose(Ra, ta, Rb, tb):
    return Ra @ Rb, Ra @ tb + ta


def test_replay_identity_when_kfs_static(rng):
    log = TrajectoryLog()
    kR = np.stack([rand_pose(rng)[0] for _ in range(4)])
    kt = np.stack([rand_pose(rng)[1] for _ in range(4)])
    frames = []
    for i in range(10):
        R, t = rand_pose(rng)
        ref = i % 4
        log.log(0.1 * i, R, t, ref, kR[ref], kt[ref])
        frames.append((R, t))
    out = log.replay(kR, kt)
    for (R, t), (_, Ro, to) in zip(frames, out):
        np.testing.assert_allclose(Ro, R, atol=1e-5)
        np.testing.assert_allclose(to, t, atol=1e-5)


def test_replay_applies_kf_correction(rng):
    """Moving a KF pose retroactively moves its frames rigidly."""
    log = TrajectoryLog()
    kR0, kt0 = rand_pose(rng)
    R, t = rand_pose(rng)
    log.log(0.0, R, t, 0, kR0, kt0)
    # Correct the KF by a rigid world transform g: T_rw' = T_rw ∘ g⁻¹.
    gR, gt = rand_pose(rng)
    gRi, gti = gR.T, -gR.T @ gt
    kR1, kt1 = compose(kR0, kt0, gRi, gti)
    out = log.replay(kR1[None], kt1[None])
    R_exp, t_exp = compose(R, t, gRi, gti)
    np.testing.assert_allclose(out[0][1], R_exp, atol=1e-5)
    np.testing.assert_allclose(out[0][2], t_exp, atol=1e-5)


def test_rebase_preserves_current_geometry(rng):
    log = TrajectoryLog()
    kR = np.stack([rand_pose(rng)[0] for _ in range(3)])
    kt = np.stack([rand_pose(rng)[1] for _ in range(3)])
    R, t = rand_pose(rng)
    log.log(0.0, R, t, 2, kR[2], kt[2])
    before = log.replay(kR, kt)
    dead = np.array([False, False, True])
    parent_of = np.array([-1, -1, 1])
    log.rebase(dead, parent_of, kR, kt)
    assert log.refs[0] == 1
    after = log.replay(kR, kt)
    np.testing.assert_allclose(after[0][1], before[0][1], atol=1e-5)
    np.testing.assert_allclose(after[0][2], before[0][2], atol=1e-5)
    # ...and future corrections to the parent now propagate.
    gR, gt = rand_pose(rng)
    gRi, gti = gR.T, -gR.T @ gt
    kR2, kt2 = kR.copy(), kt.copy()
    kR2[1], kt2[1] = compose(kR[1], kt[1], gRi, gti)
    moved = log.replay(kR2, kt2)
    R_exp, t_exp = compose(before[0][1], before[0][2], gRi, gti)
    np.testing.assert_allclose(moved[0][1], R_exp, atol=1e-5)
    np.testing.assert_allclose(moved[0][2], t_exp, atol=1e-4)


def test_rebase_no_parent_freezes_absolute(rng):
    log = TrajectoryLog()
    kR = np.stack([rand_pose(rng)[0] for _ in range(2)])
    kt = np.stack([rand_pose(rng)[1] for _ in range(2)])
    R, t = rand_pose(rng)
    log.log(0.0, R, t, 0, kR[0], kt[0])
    before = log.replay(kR, kt)
    log.rebase(np.array([True, False]), np.array([-1, -1]), kR, kt)
    assert log.refs[0] == -1
    after = log.replay(kR, kt)
    np.testing.assert_allclose(after[0][1], before[0][1], atol=1e-5)
    np.testing.assert_allclose(after[0][2], before[0][2], atol=1e-5)


def test_rescale_matches_map_rebase(rng):
    """Gravity/scale rebase x' = s R_gw x: replaying rescaled records
    against the rebased KF poses equals transforming the original frame
    pose directly."""
    from scipy.spatial.transform import Rotation
    log = TrajectoryLog()
    kR0, kt0 = rand_pose(rng)
    R, t = rand_pose(rng)
    log.log(0.0, R, t, 0, kR0, kt0)
    s = 2.7
    R_gw = Rotation.random(random_state=7).as_matrix().astype(np.float32)
    # Map rebase: R_cw' = R_cw R_gw^T, t_cw' = s t_cw (inertial_system).
    kR1 = (kR0 @ R_gw.T)[None]
    kt1 = (s * kt0)[None]
    log.rescale(s)
    out = log.replay(kR1, kt1)
    np.testing.assert_allclose(out[0][1], R @ R_gw.T, atol=1e-5)
    np.testing.assert_allclose(out[0][2], s * t, atol=1e-4)


def test_freeze_and_remap(rng):
    log = TrajectoryLog()
    kR = np.stack([rand_pose(rng)[0] for _ in range(3)])
    kt = np.stack([rand_pose(rng)[1] for _ in range(3)])
    R, t = rand_pose(rng)
    log.log(0.0, R, t, 1, kR[1], kt[1])
    log.log(0.1, R, t, 2, kR[2], kt[2])
    # Remap after compaction 1 -> 0, 2 -> 1.
    old2new = np.array([-1, 0, 1])
    log.remap(old2new)
    out = log.replay(kR[1:], kt[1:])
    np.testing.assert_allclose(out[0][1], R, atol=1e-5)
    np.testing.assert_allclose(out[1][2], t, atol=1e-5)
    # Freeze: records become absolute and immune to KF motion.
    log.freeze_all(kR[1:], kt[1:])
    assert all(r == -1 for r in log.refs)
    out2 = log.replay(np.zeros((2, 3, 3)), np.zeros((2, 3)))
    np.testing.assert_allclose(out2[0][1], R, atol=1e-5)


def test_transform_frozen_follows_weld(rng):
    """Multi-session: frozen records of a banked map are re-coordinated by
    the welding Sim3 exactly like Atlas.merge transforms its keyframes."""
    log = TrajectoryLog()
    kR, kt = rand_pose(rng)
    R, t = rand_pose(rng)
    log.log(0.0, R, t, 0, kR, kt)
    log.freeze_all(kR[None], kt[None], map_tag=0)
    assert log.tags[0] == 0 and log.refs[0] == -1
    # Weld: x_active = s R_m x_other + t_m.
    R_m, t_m = rand_pose(rng)
    s = 1.07
    log.transform_frozen(0, R_m, t_m, s, new_tag=0)
    # A world point x_o on the old camera ray maps consistently: the
    # transformed pose must satisfy x_cam' = R' (s R_m x_o + t_m) + t'
    # = s * (R x_o + t)  (same camera ray, metrically rescaled).
    x_o = rng.normal(size=3).astype(np.float32)
    x_a = s * R_m @ x_o + t_m
    lhs = log.R_cr[0] @ x_a + log.t_cr[0]
    rhs = s * (R @ x_o + t)
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)
