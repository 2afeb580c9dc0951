"""System-level relocalization + localization-only mode.

Covers Tracking::Relocalization (/root/reference/src/Tracking.cc:5087 —
BoW candidates -> PnP RANSAC -> local-map tracking) and
System::ActivateLocalizationMode (/root/reference/include/System.h:125-129 —
frozen map, no keyframe insertion)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import bow, fast_orb
from orbslam3_byzyh_tpu.pipeline import system as base
from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig
from synth_world import SynthWorld

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)


@pytest.fixture(scope="module")
def trained_slam():
    world = SynthWorld(seed=3)
    # Vocabulary from the world's own descriptor statistics.
    descs = []
    for t in (0.0, 0.7, 1.4):
        f = fast_orb.extract(jnp.asarray(world.render(t), jnp.float32),
                             n_features=1536)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs), k=6, depth=3)

    cfg = SlamConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                     width=world.w, height=world.h, n_features=1536,
                     max_kf=48, max_lm=4096, max_obs=8, fps=10,
                     min_init_matches=60,
                     vocabulary=voc, use_loop_closing=False,
                     lost_grace_frames=30)
    slam = MonoSlam(cfg)
    for t in np.arange(0, 2.0, 0.1):
        slam.track(world.render(t), float(t))
    assert slam.status == base.OK, "did not initialize/track"
    return slam, world


class TestLocalizationMode:
    def test_frozen_map_keeps_tracking(self, trained_slam):
        slam, world = trained_slam
        slam.activate_localization_mode()
        kf_before, lm_before = slam.n_kf, slam.n_lm
        poses = [slam.track(world.render(t), float(t))
                 for t in np.arange(2.0, 2.5, 0.1)]
        slam.deactivate_localization_mode()
        assert all(p is not None for p in poses)
        assert slam.status == base.OK
        assert slam.n_kf == kf_before     # no insertion in frozen mode
        assert slam.n_lm == lm_before


class TestCrossMapRelocalization:
    def test_reenters_old_map_directly(self):
        """Lose tracking, spawn a fresh map, revisit old-map territory
        BEFORE the fresh map initializes: relocalization must mine the old
        map's database and switch back INTO it (cross-map reloc — the
        reference can only rejoin old maps through the merge path,
        KeyFrameDatabase.cc:926-928 filters reloc candidates to the
        current map)."""
        world = SynthWorld(seed=3)
        descs = []
        for t in (0.0, 0.7, 1.4):
            f = fast_orb.extract(jnp.asarray(world.render(t), jnp.float32),
                                 n_features=1536)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        voc = bow.train_vocabulary(np.concatenate(descs), k=6, depth=3)
        cfg = SlamConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                         width=world.w, height=world.h, n_features=1536,
                         max_kf=48, max_lm=4096, max_obs=8, fps=10,
                         min_init_matches=60, vocabulary=voc,
                         use_loop_closing=False, lost_grace_frames=2)
        slam = MonoSlam(cfg)
        for t in np.arange(0, 2.0, 0.1):
            slam.track(world.render(t), float(t))
        assert slam.status == base.OK
        assert slam.n_kf >= 10, "old map must be mature enough to keep"
        old_map = slam.atlas.current
        old_n_kf = slam.n_kf

        # Blackout past the grace budget: the mature map is kept in the
        # Atlas and a FRESH map is spawned (CreateMapInAtlas).
        rng = np.random.default_rng(5)
        for i in range(6):
            noise = rng.uniform(0, 30, (world.h, world.w)).astype(np.float32)
            slam.track(noise, 2.0 + 0.1 * i)
        assert slam.status == base.NOT_INITIALIZED
        assert len(slam.atlas.maps) == 2
        assert slam.atlas.current != old_map

        # Revisit mapped territory BEFORE the fresh map maps anything:
        # cross-map reloc must switch straight back into the old map.
        recovered = False
        for i, t in enumerate(np.arange(1.0, 1.6, 0.1)):
            pose = slam.track(world.render(t), 2.7 + 0.1 * i)
            if slam.status == base.OK:
                recovered = True
                break
        assert recovered, "cross-map relocalization failed"
        assert slam.atlas.current == old_map
        assert slam.n_kf == old_n_kf      # the OLD map's content is live
        # Tracking continues in the re-entered map.
        p = slam.track(world.render(1.7), 3.6)
        assert p is not None and slam.status == base.OK


class TestRelocalization:
    def test_recovers_after_blackout(self, trained_slam):
        slam, world = trained_slam
        map_idx = slam.atlas.current
        rng = np.random.default_rng(5)
        # Blackout: featureless noise frames force RECENTLY_LOST.
        for i in range(4):
            noise = rng.uniform(0, 30, (world.h, world.w)).astype(np.float32)
            slam.track(noise, 2.6 + 0.1 * i)
        assert slam.status == base.RECENTLY_LOST

        # Resume views of the mapped region: relocalization must recover
        # into the SAME map (no reset/new-map fallback).
        recovered = False
        for i, t in enumerate(np.arange(1.0, 1.5, 0.1)):
            slam.track(world.render(t), 3.1 + 0.1 * i)
            if slam.status == base.OK:
                recovered = True
                break
        assert recovered, "relocalization failed"
        assert slam.atlas.current == map_idx
