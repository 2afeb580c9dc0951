"""Landmark capacity valve + recycled-slot hygiene (fast tier).

A fixed-capacity array map must recycle landmark slots; the reference's
heap map never fills (MapPoints only die via culling). Covers:
  * mapping.landmark_overflow_valve retires the least-recently-observed
    landmarks when free slots drop below the margin, and spares recently
    observed ones;
  * ms.add_landmarks clears the WHOLE observation row of a recycled slot
    (stale obs at indices >= 2 from the previous occupant must not leak
    into the new landmark's observation list).
"""

import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.models import map_state as ms
from orbslam3_byzyh_tpu.pipeline import mapping


def _filled_state(max_lm=32, max_obs=4, live=None):
    state = ms.empty_map(8, max_lm, max_obs, 16)
    live = max_lm if live is None else live
    lms = state.lms._replace(
        valid=jnp.arange(max_lm) < live,
        pos=jnp.ones((max_lm, 3), jnp.float32))
    # Landmark i was last observed by keyframe (i % 8): last-seen spread.
    kf = jnp.tile((jnp.arange(max_lm) % 8)[:, None], (1, max_obs))
    obs = state.obs._replace(
        kf=jnp.where(jnp.arange(max_obs)[None, :] == 0, kf, -1),
        valid=(jnp.arange(max_obs)[None, :] == 0)
        & (jnp.arange(max_lm)[:, None] < live))
    return state._replace(lms=lms, obs=obs)


class TestOverflowValve:
    def test_noop_when_room(self):
        state = _filled_state(live=16)          # 16 free of 32
        out = mapping.landmark_overflow_valve(state, 8)
        assert int(out.lms.valid.sum()) == 16

    def test_retires_oldest_last_seen(self):
        state = _filled_state(live=32)          # full
        out = mapping.landmark_overflow_valve(state, 8)
        valid = np.asarray(out.lms.valid)
        assert valid.sum() == 24
        last_seen = np.asarray(jnp.max(
            jnp.where(state.obs.valid, state.obs.kf, -1), axis=1))
        # The 8 retired rows are exactly those with the smallest last-seen
        # keyframe ids (ties broken by slot order).
        killed = ~valid
        assert killed.sum() == 8
        assert last_seen[killed].max() <= last_seen[valid].min()

    def test_recent_landmarks_survive(self):
        state = _filled_state(live=32)
        out = mapping.landmark_overflow_valve(state, 8)
        valid = np.asarray(out.lms.valid)
        last_seen = np.asarray(jnp.max(
            jnp.where(state.obs.valid, state.obs.kf, -1), axis=1))
        assert valid[last_seen >= 6].all()      # newest KFs' landmarks kept


class TestRecycledSlotHygiene:
    def test_add_landmarks_clears_stale_obs_row(self):
        state = _filled_state(live=32, max_obs=4)
        # Slot 3 carries observations at indices 0.. (from _filled_state)
        # plus a fake stale one at index 2.
        obs = state.obs._replace(
            kf=state.obs.kf.at[3, 2].set(5),
            kp=state.obs.kp.at[3, 2].set(7),
            valid=state.obs.valid.at[3, 2].set(True))
        state = state._replace(obs=obs)
        # Recycle slot 3 with a brand-new landmark.
        state = ms.add_landmarks(
            state, jnp.asarray([3]), jnp.ones((1, 3), jnp.float32),
            jnp.zeros((1, 8), jnp.uint32),
            6, jnp.asarray([0], jnp.int32), 7, jnp.asarray([1], jnp.int32),
            jnp.asarray([True]), jnp.zeros((1, 3), jnp.float32),
            jnp.zeros((1,), jnp.float32), jnp.ones((1,), jnp.float32))
        row_valid = np.asarray(state.obs.valid[3])
        row_kf = np.asarray(state.obs.kf[3])
        assert row_valid.tolist() == [True, True, False, False]
        assert row_kf[0] == 6 and row_kf[1] == 7
        assert row_kf[2] == -1, "stale observation leaked into recycled slot"
