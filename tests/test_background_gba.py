"""Time-sliced background global BA (pipeline/background_gba.py):
RunGlobalBundleAdjustment parity (/root/reference/src/LoopClosing.cc:2869)
— snapshot solve in bounded per-frame slices, spanning-tree propagation of
the correction to keyframes/landmarks created during the solve."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.models import map_state as ms
from orbslam3_byzyh_tpu.pipeline import mapping
from orbslam3_byzyh_tpu.pipeline.background_gba import BackgroundGBA

K_PARAMS = np.array([300.0, 300.0, 160.0, 120.0], np.float32)
W, H = 320, 240


def build_map(rng, n_kf=12, max_kf=16, n_feat=128, max_lm=512, max_obs=6,
              pose_noise=0.0):
    """Small corridor map (cameras along +x, local visibility)."""
    n_lm = max_lm - 32
    X = np.stack([
        rng.uniform(0, 0.4 * n_kf + 3, n_lm),
        rng.uniform(-2, 2, n_lm),
        rng.uniform(3, 6, n_lm)], -1).astype(np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (max_kf, 1, 1))
    ts = np.zeros((max_kf, 3), np.float32)
    for k in range(n_kf):
        ts[k] = [-0.4 * k, 0.0, 0.0]
    fx, fy, cx, cy = K_PARAMS
    state = ms.empty_map(max_kf, max_lm, max_obs, n_feat)
    kp_xy = np.zeros((max_kf, n_feat, 2), np.float32)
    kp_valid = np.zeros((max_kf, n_feat), bool)
    cursor = np.zeros(max_kf, np.int32)
    obs_kf = np.full((max_lm, max_obs), -1, np.int32)
    obs_kp = np.full((max_lm, max_obs), -1, np.int32)
    obs_valid = np.zeros((max_lm, max_obs), bool)
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
            if not (0 <= u < W and 0 <= v < H):
                continue
            kp = cursor[k]
            if kp >= n_feat:
                continue
            cursor[k] = kp + 1
            kp_xy[k, kp] = [u + rng.normal(0, 0.3), v + rng.normal(0, 0.3)]
            kp_valid[k, kp] = True
            obs_kf[l, slot] = k
            obs_kp[l, slot] = kp
            obs_valid[l, slot] = True
            slot += 1
    n_obs = obs_valid.sum(-1).astype(np.int32)
    lm_valid = n_obs >= 2
    # Perturb the poses the solver should refine (KF0 stays the anchor).
    ts_noisy = ts.copy()
    if pose_noise > 0:
        ts_noisy[1:n_kf] += rng.normal(0, pose_noise, (n_kf - 1, 3)) \
            .astype(np.float32)
    first_kf = np.asarray([int(obs_kf[l][obs_valid[l]][0])
                           if obs_valid[l].any() else 0
                           for l in range(max_lm)], np.int32)
    kfs = state.kfs._replace(
        R=jnp.asarray(Rs), t=jnp.asarray(ts_noisy),
        kp_xy=jnp.asarray(kp_xy), kp_valid=jnp.asarray(kp_valid),
        valid=jnp.asarray(np.arange(max_kf) < n_kf))
    lms = state.lms._replace(
        pos=jnp.asarray(np.pad(X, ((0, 32), (0, 0)))),
        n_obs=jnp.asarray(n_obs), valid=jnp.asarray(lm_valid),
        first_kf=jnp.asarray(first_kf))
    obs = ms.Observations(kf=jnp.asarray(obs_kf), kp=jnp.asarray(obs_kp),
                          valid=jnp.asarray(obs_valid))
    return state._replace(kfs=kfs, lms=lms, obs=obs), ts, n_kf


def _rmse_t(state, ts_gt, n_kf):
    t = np.asarray(state.kfs.t)[:n_kf]
    return float(np.sqrt(((t - ts_gt[:n_kf]) ** 2).sum(-1).mean()))


class TestBackgroundGBA:
    def test_converges_like_inline(self, rng):
        state, ts_gt, n_kf = build_map(rng, pose_noise=0.05)
        cam = jnp.asarray(K_PARAMS)
        err0 = _rmse_t(state, ts_gt, n_kf)

        g = BackgroundGBA()
        g.start(state, n_kf, cam)
        ticks = 0
        while not g.tick():
            ticks += 1
        assert ticks + 1 == g.total_iters
        kf_parent = np.arange(-1, 15, dtype=np.int32)
        merged = g.merge(state, kf_parent)
        assert not g.active
        err_bg = _rmse_t(merged, ts_gt, n_kf)

        inline = mapping.global_ba(state, cam)
        err_in = _rmse_t(inline, ts_gt, n_kf)
        assert err_bg < 0.25 * err0, (err0, err_bg)
        assert err_bg < err_in * 1.5 + 1e-4, (err_bg, err_in)

    def test_propagates_to_new_keyframe(self, rng):
        state, ts_gt, n_kf = build_map(rng, pose_noise=0.05)
        cam = jnp.asarray(K_PARAMS)
        g = BackgroundGBA()
        g.start(state, n_kf, cam)

        # Tracking continues: a NEW keyframe lands mid-solve, placed
        # relative to the last snapshot KF.
        dR = np.eye(3, dtype=np.float32)
        dt = np.array([-0.4, 0.02, 0.01], np.float32)
        R_par = np.asarray(state.kfs.R[n_kf - 1])
        t_par = np.asarray(state.kfs.t[n_kf - 1])
        R_new = dR @ R_par
        t_new = dR @ t_par + dt
        kfs = state.kfs._replace(
            R=state.kfs.R.at[n_kf].set(jnp.asarray(R_new)),
            t=state.kfs.t.at[n_kf].set(jnp.asarray(t_new)),
            valid=state.kfs.valid.at[n_kf].set(True))
        # ... and a new landmark created BY that keyframe.
        lm_new = state.lms.pos.shape[0] - 1
        x_new = np.array([0.4 * n_kf, 0.5, 4.0], np.float32)
        lms = state.lms._replace(
            pos=state.lms.pos.at[lm_new].set(jnp.asarray(x_new)),
            valid=state.lms.valid.at[lm_new].set(True),
            first_kf=state.lms.first_kf.at[lm_new].set(n_kf))
        state2 = state._replace(kfs=kfs, lms=lms)

        while not g.tick():
            pass
        kf_parent = np.arange(-1, 15, dtype=np.int32)  # chain parents
        merged = g.merge(state2, kf_parent)

        # The new KF must keep its EXACT relative pose to its (refined)
        # parent: Tcw_new' · Twc_parent' == Tcw_new · Twc_parent.
        Rp2 = np.asarray(merged.kfs.R[n_kf - 1])
        tp2 = np.asarray(merged.kfs.t[n_kf - 1])
        Rn2 = np.asarray(merged.kfs.R[n_kf])
        tn2 = np.asarray(merged.kfs.t[n_kf])
        rel_R = Rn2 @ Rp2.T
        rel_t = tn2 - rel_R @ tp2
        np.testing.assert_allclose(rel_R, dR, atol=1e-5)
        np.testing.assert_allclose(rel_t, dt, atol=1e-5)

        # The new landmark moved rigidly with its creating keyframe: its
        # coordinates in that camera are unchanged.
        xc_before = R_new @ x_new + t_new
        x_after = np.asarray(merged.lms.pos[lm_new])
        xc_after = Rn2 @ x_after + tn2
        np.testing.assert_allclose(xc_after, xc_before, atol=1e-5)

    def test_abort_leaves_state_untouched(self, rng):
        state, ts_gt, n_kf = build_map(rng, pose_noise=0.05)
        cam = jnp.asarray(K_PARAMS)
        g = BackgroundGBA()
        g.start(state, n_kf, cam)
        g.tick()
        g.abort()
        assert not g.active
        assert not g.tick()          # no-op after abort
        assert not g.flush()

    def test_flush_completes(self, rng):
        state, ts_gt, n_kf = build_map(rng, pose_noise=0.05)
        cam = jnp.asarray(K_PARAMS)
        g = BackgroundGBA()
        g.start(state, n_kf, cam)
        g.tick()                      # partial progress
        assert g.flush()              # finishes the rest inline
        merged = g.merge(state, np.arange(-1, 15, dtype=np.int32))
        assert _rmse_t(merged, ts_gt, n_kf) < 0.02
