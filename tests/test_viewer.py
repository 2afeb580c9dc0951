"""Viewer rendering smoke tests (MapDrawer/FrameDrawer parity surface)."""

import os

import numpy as np

from orbslam3_byzyh_tpu.ops import fast_orb
from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig
from orbslam3_byzyh_tpu.utils import viewer
from synth_world import SynthWorld
import pytest

pytestmark = pytest.mark.slow  # measurement-study tier (see pyproject)


def test_snapshot_renders(tmp_path):
    import jax.numpy as jnp

    world = SynthWorld(seed=3)
    cfg = SlamConfig(fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                     width=world.w, height=world.h, n_features=512,
                     max_kf=16, max_lm=2048, max_obs=6, fps=10,
                     use_loop_closing=False, kf_ref_min_obs=1)
    slam = MonoSlam(cfg)
    img = None
    for t in np.arange(0, 1.2, 0.1):
        img = world.render(t)
        slam.track(img, float(t))
    feats = fast_orb.extract(jnp.asarray(img, jnp.float32), n_features=512)
    out = str(tmp_path / "snap.png")
    viewer.snapshot(slam, out, img=img, feats=feats)
    assert os.path.exists(out) and os.path.getsize(out) > 10000

    # Map-only snapshot too.
    out2 = str(tmp_path / "map.png")
    viewer.snapshot(slam, out2)
    assert os.path.exists(out2) and os.path.getsize(out2) > 10000
