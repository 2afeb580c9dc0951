"""Loop-closing tests on a hand-built drifted circular map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.models import map_state as ms
from orbslam3_byzyh_tpu.ops import bow, fast_orb, lie
from orbslam3_byzyh_tpu.pipeline import loop_closing

N_FEAT = 128
MAX_KF = 32
MAX_LM = 2048


def build_circular_map(rng, n_kf=16, drift_scale=1.015):
    """KFs around a circle revisiting the start; landmarks on the walls.

    Each KF observes its own patch of landmarks; the first and last KFs see
    the SAME physical landmarks but the last KF's copies live at drifted
    positions (fresh landmark entries), simulating accumulated drift with
    scale creep.
    """
    state = ms.empty_map(MAX_KF, MAX_LM, 8, N_FEAT)

    # Shared descriptor pool: revisited region re-observes the same descs.
    descs = rng.integers(0, 2**32, (MAX_LM, 8), dtype=np.uint32)

    # GT circle poses.
    Rs_gt, cs_gt = [], []
    for k in range(n_kf):
        ang = 2 * np.pi * k / n_kf
        R_wc = np.asarray(lie.so3_exp(jnp.asarray(
            np.array([0, ang, 0], np.float32))))
        c = np.array([np.sin(ang) * 4, 0, 4 - np.cos(ang) * 4], np.float32)
        Rs_gt.append(R_wc.T)
        cs_gt.append(c)

    # Drifted poses: scale creep applied cumulatively to centers.
    scales = drift_scale ** np.arange(n_kf)
    lm_cursor = 0
    kf_lms = []
    for k in range(n_kf):
        R_cw = Rs_gt[k]
        c = cs_gt[k] * scales[k]
        t_cw = -R_cw @ c

        # Landmarks in front of this camera (GT at unit scale, stored at
        # this KF's drift scale). The LAST KF re-observes KF0's physical
        # landmarks (same descriptors), drifted.
        n_pts = 60
        if k == n_kf - 1:
            desc_rows = np.arange(0, n_pts)          # same as KF0's
        else:
            desc_rows = np.arange(lm_cursor, lm_cursor + n_pts)
        pts_cam = np.stack([
            rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1, 1, n_pts),
            rng.uniform(3, 6, n_pts)], -1).astype(np.float32)
        if k == n_kf - 1:
            # Re-use KF0's physical points, expressed in the drifted world.
            pts_world_gt = kf0_world_pts
            pts_world = pts_world_gt * scales[k]
        else:
            pts_world = (R_cw.T @ (pts_cam.T - t_cw[:, None])).T
            if k == 0:
                kf0_world_pts = pts_world.copy()

        # Fake keypoints/descriptors for the KF slab.
        feats = fast_orb.FrameFeatures(
            xy=jnp.zeros((N_FEAT, 2)),
            level=jnp.zeros((N_FEAT,), jnp.int32),
            angle=jnp.zeros((N_FEAT,)),
            response=jnp.zeros((N_FEAT,)),
            desc=jnp.asarray(np.concatenate(
                [descs[desc_rows],
                 rng.integers(0, 2**32, (N_FEAT - n_pts, 8), dtype=np.uint32)])),
            valid=jnp.ones((N_FEAT,), bool))
        state = ms.add_keyframe(state, k, jnp.asarray(R_cw),
                                jnp.asarray(t_cw), float(k), feats)

        slots = jnp.asarray(lm_cursor + np.arange(n_pts))
        if k < n_kf - 1:
            state = ms.add_landmarks(
                state, slots, jnp.asarray(pts_world),
                jnp.asarray(descs[desc_rows]),
                k, jnp.arange(n_pts, dtype=jnp.int32),
                # second obs slot: same KF (a kp binds ONE landmark; using
                # another KF's kp indices would corrupt the kp->lm maps)
                k, jnp.arange(n_pts, dtype=jnp.int32),
                jnp.ones(n_pts, bool),
                jnp.zeros((n_pts, 3)), jnp.zeros(n_pts),
                jnp.full((n_pts,), 100.0))
            kf_lms.append(np.arange(lm_cursor, lm_cursor + n_pts))
            lm_cursor += n_pts
        else:
            # Last KF: create NEW landmark entries for the same physical
            # points (drifted duplicates, like real pre-loop maps).
            state = ms.add_landmarks(
                state, slots, jnp.asarray(pts_world),
                jnp.asarray(descs[desc_rows]),
                k, jnp.arange(n_pts, dtype=jnp.int32),
                k, jnp.arange(n_pts, dtype=jnp.int32),
                jnp.ones(n_pts, bool),
                jnp.zeros((n_pts, 3)), jnp.zeros(n_pts),
                jnp.full((n_pts,), 100.0))
            lm_cursor += n_pts
    return state, n_kf, np.stack(Rs_gt), np.stack(cs_gt)


@pytest.fixture(scope="module")
def voc():
    rng = np.random.default_rng(0)
    descs = rng.integers(0, 2**32, (2000, 8), dtype=np.uint32)
    return bow.train_vocabulary(descs, k=6, depth=3)


class TestLoopCloser:
    def test_detects_revisit(self, voc, rng):
        state, n_kf, Rs_gt, cs_gt = build_circular_map(rng)
        lc = loop_closing.LoopCloser(voc, MAX_KF, N_FEAT)
        for k in range(n_kf):
            lc.add_keyframe(state, k)
        det = lc.detect(state, n_kf - 1, n_kf)
        assert det is not None
        cand, corr = det
        assert cand == 0, cand
        R_m, t_m, s_m, n_inl = corr
        assert n_inl >= 20
        # Correction scale should undo the accumulated drift (~1/1.015^15).
        expected = 1.0 / (1.015 ** 15)
        assert abs(s_m - expected) / expected < 0.05, (s_m, expected)

    def test_no_detection_without_revisit(self, voc, rng):
        state, n_kf, _, _ = build_circular_map(rng)
        lc = loop_closing.LoopCloser(voc, MAX_KF, N_FEAT)
        for k in range(n_kf - 1):   # exclude the revisit KF
            lc.add_keyframe(state, k)
        det = lc.detect(state, n_kf - 2, n_kf - 1)
        assert det is None

    def test_close_corrects_drift(self, voc, rng):
        state, n_kf, Rs_gt, cs_gt = build_circular_map(rng)
        lc = loop_closing.LoopCloser(voc, MAX_KF, N_FEAT)
        for k in range(n_kf):
            lc.add_keyframe(state, k)
        det = lc.detect(state, n_kf - 1, n_kf)
        assert det is not None
        cand, corr = det

        c_before = -np.asarray(state.kfs.R[n_kf - 1]).T @ \
            np.asarray(state.kfs.t[n_kf - 1])
        err_before = np.linalg.norm(c_before - cs_gt[n_kf - 1])

        state2 = lc.close(state, n_kf - 1, cand, corr, n_kf)
        c_after = -np.asarray(state2.kfs.R[n_kf - 1]).T @ \
            np.asarray(state2.kfs.t[n_kf - 1])
        err_after = np.linalg.norm(c_after - cs_gt[n_kf - 1])
        assert err_after < 0.5 * err_before, (err_before, err_after)
