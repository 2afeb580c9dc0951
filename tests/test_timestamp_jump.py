"""Timestamp-discontinuity failure handling (Tracking.cc:2704-2765):
a >1 s gap while tracking resets a small map, or banks a mature one."""

import numpy as np

from orbslam3_byzyh_tpu.pipeline import system as base
from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig
from synth_world import SynthWorld
import pytest

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)


def make_slam(world):
    cfg = SlamConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                     width=world.w, height=world.h, n_features=1536,
                     max_kf=48, max_lm=4096, max_obs=8, fps=10,
                     min_init_matches=60, use_loop_closing=False)
    return MonoSlam(cfg)


def test_small_map_reset_on_jump():
    world = SynthWorld(seed=3)
    slam = make_slam(world)
    for t in np.arange(0, 0.7, 0.1):
        slam.track(world.render(t), float(t))
    assert slam.status == base.OK
    assert slam.n_kf < 10, slam.n_kf
    # Jump 5 s forward: the young map must be RESET in place.
    out = slam.track(world.render(0.7), 6.2)
    assert out is None
    assert slam.status == base.NOT_INITIALIZED
    assert len(slam.atlas.maps) == 1
    assert slam.n_kf == 0
    # And tracking re-initializes afterwards.
    for i, t in enumerate(np.arange(0.7, 1.9, 0.1)):
        slam.track(world.render(t), 6.2 + 0.1 * i)
    assert slam.status == base.OK


def test_mature_map_banked_on_jump():
    world = SynthWorld(seed=3)
    slam = make_slam(world)
    for t in np.arange(0, 3.0, 0.1):
        slam.track(world.render(t), float(t))
    assert slam.status == base.OK
    kf_before = slam.n_kf
    assert kf_before >= 10
    slam.track(world.render(3.0), 9.0)
    # Mature map kept in the Atlas, fresh map active.
    assert len(slam.atlas.maps) == 2
    assert slam.atlas.meta[0].n_kf == kf_before
    assert slam.status == base.NOT_INITIALIZED
