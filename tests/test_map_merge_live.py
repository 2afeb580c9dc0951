"""Live multi-map lifecycle: loss -> new map -> revisit -> merge-back.

Covers the Atlas mechanism end to end (CreateMapInAtlas on loss,
Tracking.cc:3374) plus the LoopClosing merge branch
(NewDetectCommonRegions finding the common region in a DIFFERENT map ->
MergeLocal weld, /root/reference/src/LoopClosing.cc:383,1590)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import bow, fast_orb
from orbslam3_byzyh_tpu.pipeline import system as base
from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig
from synth_world import SynthWorld

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)


def test_loss_newmap_merge_back():
    world = SynthWorld(seed=3)
    descs = []
    for t in (0.0, 1.0, 2.0):
        f = fast_orb.extract(jnp.asarray(world.render(t), jnp.float32),
                             n_features=1536)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = bow.train_vocabulary(np.concatenate(descs), k=6, depth=3)

    cfg = SlamConfig(
        kf_ref_min_obs=1,  # quantized world: dense-KF cadence
        fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                     width=world.w, height=world.h, n_features=1536,
                     max_kf=64, max_lm=8192, max_obs=8, fps=10,
                     min_init_matches=60, vocabulary=voc,
                     use_loop_closing=True, lost_grace_frames=2,
                     cross_map_reloc=False)  # force the MERGE path
                     # (cross-map reloc would re-enter map A directly;
                     # that path is covered by test_reloc_localization)
    slam = MonoSlam(cfg)

    # Phase 1: build map A.
    for t in np.arange(0, 3.0, 0.1):
        slam.track(world.render(t), float(t))
    assert slam.status == base.OK
    kf_a = slam.n_kf
    assert kf_a >= 10, f"map A too small ({kf_a} KFs) to survive loss"

    # Phase 2: blackout beyond the grace budget -> keep map A, start map B.
    rng = np.random.default_rng(7)
    for i in range(6):
        noise = rng.uniform(0, 30, (world.h, world.w)).astype(np.float32)
        slam.track(noise, 3.0 + 0.1 * i)
        if len(slam.atlas.maps) > 1:
            break
    assert len(slam.atlas.maps) == 2, "loss did not spawn a second map"

    # Phase 3: revisit the region mapped by A; map B initializes there and
    # the merge branch must weld A back in.
    merged = False
    for i, t in enumerate(np.arange(0.5, 2.5, 0.1)):
        slam.track(world.render(t), 3.8 + 0.1 * i)
        if len(slam.atlas.maps) == 1:
            merged = True
            break
    assert merged, "maps were never merged back"
    # The merged map carries both sessions' keyframes.
    assert slam.n_kf > kf_a * 0.8
    assert slam.status == base.OK or slam.status == base.NOT_INITIALIZED
