"""Windowed local BA: O(window) problem extraction inside one jitted kernel.

Validates the covisibility-window semantics of
``mapping.windowed_local_ba`` against the reference's
LocalBundleAdjustment contract (/root/reference/src/Optimizer.cc:1740-1810):
only the free window moves, everything outside the window is untouched, and
the window is bounded regardless of map size.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.models import map_state as ms
from orbslam3_byzyh_tpu.ops import lie
from orbslam3_byzyh_tpu.pipeline import mapping

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)

K_PARAMS = np.array([400.0, 400.0, 320.0, 240.0], np.float32)
W, H = 640, 480


def build_line_map(rng, n_kf=64, max_kf=96, n_feat=256, max_lm=2048,
                   max_obs=8, noise=0.3):
    """Cameras marching along +x; landmarks scattered along the corridor so
    visibility is local — distant KFs share no landmarks (like a real
    trajectory)."""
    n_lm = max_lm - 64
    X = np.stack([
        rng.uniform(0, 0.45 * n_kf + 4, n_lm),
        rng.uniform(-3, 3, n_lm),
        rng.uniform(4, 8, n_lm)], -1).astype(np.float32)
    Rs = np.tile(np.eye(3, dtype=np.float32), (max_kf, 1, 1))
    ts = np.zeros((max_kf, 3), np.float32)
    for k in range(n_kf):
        ts[k] = [-0.45 * k, 0.0, 0.0]     # t_cw: camera at x = 0.45 k

    fx, fy, cx, cy = K_PARAMS
    state = ms.empty_map(max_kf, max_lm, max_obs, n_feat)
    kp_xy = np.zeros((max_kf, n_feat, 2), np.float32)
    kp_valid = np.zeros((max_kf, n_feat), bool)
    kp_cursor = np.zeros(max_kf, np.int32)
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
            kp = kp_cursor[k]
            if kp >= n_feat:
                continue
            kp_cursor[k] = kp + 1
            kp_xy[k, kp] = [u + rng.normal(0, noise),
                            v + rng.normal(0, noise)]
            kp_valid[k, kp] = True
            obs_kf[l, slot] = k
            obs_kp[l, slot] = kp
            obs_valid[l, slot] = True
            slot += 1

    n_obs = obs_valid.sum(-1).astype(np.int32)
    lm_valid = n_obs >= 2
    kfs = state.kfs._replace(
        R=jnp.asarray(Rs), t=jnp.asarray(ts),
        kp_xy=jnp.asarray(kp_xy), kp_valid=jnp.asarray(kp_valid),
        valid=jnp.asarray(np.arange(max_kf) < n_kf))
    lms = state.lms._replace(
        pos=jnp.asarray(np.pad(X, ((0, 64), (0, 0)))),
        n_obs=jnp.asarray(n_obs),
        valid=jnp.asarray(lm_valid))
    obs = ms.Observations(kf=jnp.asarray(obs_kf), kp=jnp.asarray(obs_kp),
                          valid=jnp.asarray(obs_valid))
    return state._replace(kfs=kfs, lms=lms, obs=obs), X, Rs.copy(), ts.copy()


@pytest.fixture(scope="module")
def line_map():
    rng = np.random.default_rng(7)
    return build_line_map(rng), rng


class TestWindowedLocalBA:
    def test_window_refines_free_poses_only(self, line_map):
        (state, X, Rs_gt, ts_gt), rng = line_map
        n_kf, kf_id = 64, 63
        # Perturb the newest few poses + the landmarks they see.
        Rp = np.asarray(state.kfs.R).copy()
        tp = np.asarray(state.kfs.t).copy()
        for k in range(n_kf - 4, n_kf):
            dR = np.asarray(lie.so3_exp(jnp.asarray(
                rng.uniform(-0.015, 0.015, 3).astype(np.float32))))
            Rp[k] = dR @ Rp[k]
            tp[k] = tp[k] + rng.uniform(-0.04, 0.04, 3)
        pos_p = np.asarray(state.lms.pos).copy()
        okf = np.asarray(state.obs.kf)
        oval = np.asarray(state.obs.valid)
        seen_recent = ((okf >= n_kf - 4) & oval).any(-1)
        pos_p[seen_recent] += rng.uniform(-0.05, 0.05,
                                          (seen_recent.sum(), 3))
        st = state._replace(
            kfs=state.kfs._replace(R=jnp.asarray(Rp), t=jnp.asarray(tp)),
            lms=state.lms._replace(pos=jnp.asarray(pos_p)))

        out = mapping.windowed_local_ba(
            st, jnp.asarray(kf_id, jnp.int32), jnp.asarray(K_PARAMS),
            n_free=5, n_window=16, n_lm_window=512)

        R_out = np.asarray(out.kfs.R)
        t_out = np.asarray(out.kfs.t)
        # Poses far outside the window are bit-identical.
        np.testing.assert_array_equal(R_out[:40], Rp[:40])
        np.testing.assert_array_equal(t_out[:40], tp[:40])
        # The newest pose moved toward ground truth.
        err_before = np.linalg.norm(tp[kf_id] - ts_gt[kf_id])
        err_after = np.linalg.norm(t_out[kf_id] - ts_gt[kf_id])
        assert err_after < 0.6 * err_before
        # Landmarks seen only by old KFs are untouched.
        far_lm = ~((okf >= 40) & oval).any(-1) & np.asarray(state.lms.valid)
        np.testing.assert_array_equal(
            np.asarray(out.lms.pos)[far_lm], pos_p[far_lm])

    def test_out_of_window_observations_not_gated(self, line_map):
        (state, _, _, _), _ = line_map
        out = mapping.windowed_local_ba(
            state, jnp.asarray(63, jnp.int32), jnp.asarray(K_PARAMS),
            n_free=5, n_window=16, n_lm_window=512)
        okf = np.asarray(state.obs.kf)
        oval_in = np.asarray(state.obs.valid)
        oval_out = np.asarray(out.obs.valid)
        # Observations held by KFs far outside the window keep validity.
        outside = (okf >= 0) & (okf < 40) & oval_in
        assert (oval_out[outside]).all()

    def test_gauge_guard_tiny_map(self, line_map):
        """A 2-KF map has no fixed observers: the guard must anchor one free
        pose instead of producing a rank-deficient solve."""
        (state, _, _, _), _ = line_map
        kf_valid = np.zeros(96, bool)
        kf_valid[:2] = True
        okf = np.asarray(state.obs.kf)
        oval = np.asarray(state.obs.valid) & (okf >= 0) & (okf < 2)
        tiny = state._replace(
            kfs=state.kfs._replace(valid=jnp.asarray(kf_valid)),
            obs=state.obs._replace(valid=jnp.asarray(oval)),
            lms=state.lms._replace(
                valid=state.lms.valid & (jnp.asarray(oval).sum(-1) >= 2)))
        out = mapping.windowed_local_ba(
            tiny, jnp.asarray(1, jnp.int32), jnp.asarray(K_PARAMS),
            n_free=5, n_window=16, n_lm_window=512)
        assert np.isfinite(np.asarray(out.kfs.t)[:2]).all()
        assert np.isfinite(np.asarray(out.lms.pos)).all()
