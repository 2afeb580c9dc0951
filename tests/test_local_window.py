"""Bounded per-frame local map (UpdateLocalKeyFrames/UpdateLocalPoints,
/root/reference/src/Tracking.cc:4851-4895): tracking matches against the
covisible keyframes' landmarks, NOT the whole map — per-frame cost is
O(window) and old structure outside the local window is invisible until a
loop closure re-joins it."""

import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.pipeline import tracking


def _window(last_bind, obs_kf, obs_valid, lm_valid, n_kf, max_kf=16,
            **kw):
    return tracking.select_local_window(
        jnp.asarray(last_bind, jnp.int32), jnp.asarray(obs_kf, jnp.int32),
        jnp.asarray(obs_valid, bool), jnp.asarray(lm_valid, bool),
        jnp.asarray(n_kf, jnp.int32), max_kf=max_kf, **kw)


class TestSelectLocalWindow:
    def _world(self):
        """12 landmarks: 0-5 observed by OLD KFs (0,1); 6-11 by RECENT
        KFs (8,9). Last frame is bound to landmarks 6,7 (so KF 8,9 get the
        K1 vote)."""
        L, O = 16, 4
        obs_kf = np.full((L, O), -1, np.int32)
        obs_valid = np.zeros((L, O), bool)
        for l in range(6):
            obs_kf[l, :2] = [0, 1]
            obs_valid[l, :2] = True
        for l in range(6, 12):
            obs_kf[l, :2] = [8, 9]
            obs_valid[l, :2] = True
        lm_valid = np.zeros(L, bool)
        lm_valid[:12] = True
        last_bind = np.full(8, -1, np.int32)
        last_bind[0] = 6
        last_bind[1] = 7
        return last_bind, obs_kf, obs_valid, lm_valid

    def test_excludes_old_structure(self):
        lb, okf, ov, lv = self._world()
        win = _window(lb, okf, ov, lv, n_kf=10, n_local_kf=2,
                      n_local_lm=8, recent_kf=2)
        ids = np.asarray(win.lm_ids)[np.asarray(win.lm_ok)]
        # Landmarks of the old KFs (0,1) are NOT in the window: neither
        # voted for by the bindings nor among the recent keyframes.
        assert set(ids) == set(range(6, 12)), ids

    def test_includes_old_structure_when_bound(self):
        """After a relocalization/loop match binds an OLD landmark, its
        observers re-enter the local window (the K1 vote follows the
        bindings)."""
        lb, okf, ov, lv = self._world()
        lb[2] = 0                     # one binding into the old structure
        win = _window(lb, okf, ov, lv, n_kf=10, n_local_kf=4,
                      n_local_lm=16, recent_kf=2)
        ids = set(np.asarray(win.lm_ids)[np.asarray(win.lm_ok)])
        assert set(range(12)) == ids, ids

    def test_truncation_prefers_bound(self):
        lb, okf, ov, lv = self._world()
        win = _window(lb, okf, ov, lv, n_kf=10, n_local_kf=2,
                      n_local_lm=2, recent_kf=2)
        ids = set(np.asarray(win.lm_ids)[np.asarray(win.lm_ok)])
        assert ids == {6, 7}, ids     # the bound landmarks rank first

    def test_loc_is_inverse(self):
        lb, okf, ov, lv = self._world()
        win = _window(lb, okf, ov, lv, n_kf=10, n_local_kf=2,
                      n_local_lm=8, recent_kf=2)
        loc = np.asarray(win.loc)
        ids = np.asarray(win.lm_ids)
        ok = np.asarray(win.lm_ok)
        for w, (i, o) in enumerate(zip(ids, ok)):
            if o:
                assert loc[i] == w
        assert (loc[~np.isin(np.arange(16), ids[ok])] == -1).all()

    def test_windowed_tracker_matches_fullmap_on_small_map(self):
        """When the capacity fits in the window the windowed entry point
        must reduce to the full-map tracker (static fall-through)."""
        rng = np.random.default_rng(0)
        n_lm, n_kp = 64, 32
        lm_pos = rng.normal(0, 1, (n_lm, 3)).astype(np.float32)
        lm_pos[:, 2] += 5.0
        lm_desc = rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)
        lm_valid = np.ones(n_lm, bool)
        normal = np.tile(np.array([0, 0, -1.0], np.float32), (n_lm, 1))
        cam_params = jnp.asarray([400.0, 400.0, 320.0, 240.0], jnp.float32)
        pc = lm_pos
        uv = np.stack([400 * pc[:, 0] / pc[:, 2] + 320,
                       400 * pc[:, 1] / pc[:, 2] + 240], -1)
        feats_xy = np.zeros((n_kp, 2), np.float32)
        feats_desc = np.zeros((n_kp, 8), np.uint32)
        feats_valid = np.zeros(n_kp, bool)
        for k in range(n_kp):
            feats_xy[k] = uv[k]
            feats_desc[k] = lm_desc[k]
            feats_valid[k] = True
        feats_level = np.zeros(n_kp, np.int32)
        bindings = np.full(n_kp, -1, np.int32)
        obs_kf = np.full((n_lm, 2), -1, np.int32)
        obs_valid = np.zeros((n_lm, 2), bool)
        args = (jnp.eye(3), jnp.zeros(3), jnp.asarray(bindings),
                jnp.asarray(lm_pos), jnp.asarray(lm_desc),
                jnp.asarray(normal),
                jnp.zeros(n_lm), jnp.full(n_lm, 100.0),
                jnp.asarray(lm_valid))
        full = tracking.track_local_map(
            *args[:2], args[2], *args[3:],
            jnp.asarray(feats_xy), jnp.asarray(feats_level),
            jnp.asarray(feats_desc), jnp.asarray(feats_valid),
            cam_params, 640, 480)
        win = tracking.track_local_map_windowed(
            *args[:2], args[2], *args[3:],
            jnp.asarray(obs_kf), jnp.asarray(obs_valid),
            jnp.asarray(1, jnp.int32),
            jnp.asarray(feats_xy), jnp.asarray(feats_level),
            jnp.asarray(feats_desc), jnp.asarray(feats_valid),
            jnp.full(n_kp, -1.0), jnp.asarray(0.0),
            cam_params, 640, 480, max_kf=8, n_local_lm=n_lm)
        np.testing.assert_array_equal(np.asarray(full.bindings),
                                      np.asarray(win.bindings))
        assert int(full.n_inliers) == int(win.n_inliers)
