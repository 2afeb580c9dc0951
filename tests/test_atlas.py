"""Atlas multi-map lifecycle tests."""

import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.models import atlas, map_state as ms
from orbslam3_byzyh_tpu.ops import fast_orb, lie
import pytest

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)


def make_feats(rng, n_feat=64):
    return fast_orb.FrameFeatures(
        xy=jnp.asarray(rng.uniform(0, 100, (n_feat, 2)).astype(np.float32)),
        level=jnp.zeros((n_feat,), jnp.int32),
        angle=jnp.zeros((n_feat,)),
        response=jnp.ones((n_feat,)),
        desc=jnp.asarray(rng.integers(0, 2**32, (n_feat, 8), dtype=np.uint32)),
        valid=jnp.ones((n_feat,), bool))


def fill_map(at, rng, n_kf=3, n_lm=20):
    for k in range(n_kf):
        at.state = ms.add_keyframe(
            at.state, k, jnp.eye(3), jnp.asarray([0.1 * k, 0, 0]),
            float(k), make_feats(rng))
    slots = jnp.arange(n_lm)
    at.state = ms.add_landmarks(
        at.state, slots,
        jnp.asarray(rng.normal(size=(n_lm, 3)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)),
        0, jnp.arange(n_lm, dtype=jnp.int32),
        1, jnp.arange(n_lm, dtype=jnp.int32),
        jnp.ones(n_lm, bool), jnp.zeros((n_lm, 3)),
        jnp.zeros(n_lm), jnp.full((n_lm,), 10.0))
    at.meta[at.current] = atlas.MapMeta(n_kf=n_kf, n_lm=n_lm)


class TestAtlas:
    def test_create_new_map(self, rng):
        at = atlas.Atlas(16, 256, 4, 64)
        fill_map(at, rng)
        old = at.current
        at.create_new_map()
        assert at.current != old
        assert not bool(at.state.kfs.valid.any())
        # Old map preserved.
        assert bool(at.maps[old].kfs.valid[0])

    def test_reset_active(self, rng):
        at = atlas.Atlas(16, 256, 4, 64)
        fill_map(at, rng)
        at.reset_active_map()
        assert not bool(at.state.kfs.valid.any())

    def test_merge_welds_geometry(self, rng):
        at = atlas.Atlas(16, 256, 4, 64)
        fill_map(at, rng, n_kf=3, n_lm=20)
        at.create_new_map()
        fill_map(at, rng, n_kf=2, n_lm=10)
        other = at.current
        # Switch back to map 0 as current and weld map 1 into it with a
        # known Sim3.
        at.current = 0
        xi = np.zeros(7, np.float32)
        xi[:3] = [1.0, 0.5, -0.2]
        xi[6] = np.log(2.0)
        R_m, t_m, s_m = lie.sim3_exp(jnp.asarray(xi))
        lm_pos_before = np.asarray(at.maps[other].lms.pos[:10])
        kf_R_before = np.asarray(at.maps[other].kfs.R[:2])
        kf_t_before = np.asarray(at.maps[other].kfs.t[:2])
        at.merge(other, np.asarray(R_m), np.asarray(t_m), float(s_m))

        meta = at.counts()
        assert meta.n_kf == 5 and meta.n_lm == 30
        # Welded landmark positions transformed by the Sim3.
        expected = float(s_m) * lm_pos_before @ np.asarray(R_m).T + np.asarray(t_m)
        np.testing.assert_allclose(
            np.asarray(at.state.lms.pos[20:30]), expected, atol=1e-5)
        # Welded keyframes reproject the same camera-frame points:
        # R'(s R_m x + t_m) + t' == s (R x + t) for any x.
        x = rng.normal(size=3).astype(np.float32)
        for k in range(2):
            lhs = np.asarray(at.state.kfs.R[3 + k]) @ (
                float(s_m) * np.asarray(R_m) @ x + np.asarray(t_m)) \
                + np.asarray(at.state.kfs.t[3 + k])
            rhs = float(s_m) * (kf_R_before[k] @ x + kf_t_before[k])
            np.testing.assert_allclose(lhs, rhs, atol=1e-4)
        # Observation kf ids shifted.
        assert int(at.state.obs.kf[20, 0]) == 3


class TestAtlasResume:
    """Save -> load -> relocalize/merge back (System::SaveAtlas/LoadAtlas +
    resume-into-loaded-atlas semantics)."""

    def test_save_load_resume_merges_back(self, tmp_path, rng):
        import jax.numpy as jnp

        from orbslam3_byzyh_tpu.ops import bow, fast_orb
        from orbslam3_byzyh_tpu.pipeline import system as base
        from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig
        from synth_world import SynthWorld

        world = SynthWorld(seed=3)
        descs = []
        for t in (0.0, 1.0, 2.0):
            f = fast_orb.extract(jnp.asarray(world.render(t), jnp.float32),
                                 n_features=1536)
            descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
        voc = bow.train_vocabulary(np.concatenate(descs), k=6, depth=3)
        cfg = SlamConfig(fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                         width=world.w, height=world.h, n_features=1536,
                         max_kf=64, max_lm=8192, max_obs=8, fps=10,
                         min_init_matches=60, vocabulary=voc,
                         kf_ref_min_obs=1)  # quantized world: dense cadence
        slam = MonoSlam(cfg)
        for t in np.arange(0, 2.5, 0.1):
            slam.track(world.render(t), float(t))
        assert slam.status == base.OK
        kf_before = slam.n_kf
        ckpt = str(tmp_path / "atlas_ckpt")
        slam.save_atlas_checkpoint(ckpt)

        # Fresh engine resumes from the checkpoint and revisits the place:
        # the loaded map must be re-joined — either MERGED back through the
        # welding Sim3, or re-entered directly through cross-map
        # relocalization (the round-5 path: reloc candidates span the whole
        # Atlas and a hit in a non-active map switches into it, which fires
        # BEFORE the young fresh map can mature enough to merge).
        slam2 = MonoSlam(cfg)
        slam2.load_atlas_checkpoint(ckpt)
        assert len(slam2.atlas.maps) == 2   # loaded + fresh active
        rejoined = False
        for i, t in enumerate(np.arange(0.5, 2.4, 0.1)):
            slam2.track(world.render(t), 5.0 + 0.1 * i)
            if (len(slam2.atlas.maps) == 1
                    or slam2.n_cross_map_relocs >= 1):
                rejoined = True
        assert rejoined, "loaded atlas never re-joined"
        assert slam2.n_kf > kf_before * 0.8


def test_map_invariants_hold_after_run():
    """check_invariants (Map::CheckEssentialGraph-style debug oracle) holds
    on a live map and detects injected corruption."""
    import jax.numpy as jnp

    from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig
    from synth_world import SynthWorld

    world = SynthWorld(seed=3)
    cfg = SlamConfig(fx=world.fx, fy=world.fy, cx=world.cx, cy=world.cy,
                     width=world.w, height=world.h, n_features=1536,
                     max_kf=48, max_lm=4096, max_obs=8, fps=10,
                     min_init_matches=60, use_loop_closing=False,
                     kf_ref_min_obs=1)
    slam = MonoSlam(cfg)
    for t in np.arange(0, 2.0, 0.1):
        slam.track(world.render(t), float(t))
    # Settle the async keyframe bundle first: its landmark high-water mark
    # is read back lazily, so the host n_lm cursor trails the device state
    # until the drain (by design — see MonoSlam._drain_pending).
    slam._drain_pending()
    errs = ms.check_invariants(slam.state, slam.n_kf, slam.n_lm)
    assert errs == [], errs

    # Inject corruption: an observation pointing at a dead keyframe.
    bad = slam.state.obs.kf.at[0, 0].set(slam.cfg.max_kf - 1)
    state_bad = slam.state._replace(
        obs=slam.state.obs._replace(kf=bad,
                                    valid=slam.state.obs.valid.at[0, 0]
                                    .set(True)))
    errs = ms.check_invariants(state_bad, slam.n_kf, slam.n_lm)
    assert any("dead keyframes" in e for e in errs), errs
