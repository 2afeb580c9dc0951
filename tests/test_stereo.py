"""Stereo matching tests on a rendered synthetic rectified pair."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import fast_orb, stereo
from synth_world import SynthWorld


@pytest.fixture(scope="module")
def stereo_pair():
    world = SynthWorld(seed=5)
    baseline = 0.2
    R, t = world.pose(0.0)
    img_l = world.render(0.0)
    # Right camera: center shifted +baseline along the camera x axis, same
    # rotation (rectified pair): C_r = C_l + R^T [b,0,0] => t_r = t - [b,0,0].
    import copy
    world_r = copy.copy(world)
    t_r = t - np.array([baseline, 0, 0], np.float32)
    world_r.pose = lambda tt: (R, t_r)
    img_r = world_r.render(0.0)
    bf = baseline * world.fx
    # GT depth at left camera for scene points.
    pc = world.pts @ R.T + t
    return world, img_l, img_r, bf, pc


class TestStereoMatch:
    def test_depth_recovery(self, stereo_pair):
        world, img_l, img_r, bf, pc = stereo_pair
        fl = fast_orb.extract(jnp.asarray(img_l), n_features=1024)
        fr = fast_orb.extract(jnp.asarray(img_r), n_features=1024)
        res = stereo.stereo_match(
            fl.xy, fl.level, fl.desc, fl.valid,
            fr.xy, fr.level, fr.desc, fr.valid,
            jnp.asarray(img_l), jnp.asarray(img_r),
            jnp.asarray(bf, jnp.float32), 0.4)
        valid = np.asarray(res.valid)
        depth = np.asarray(res.depth)
        assert valid.sum() > 150, valid.sum()

        # Compare depths against the nearest GT scene point's depth.
        xy = np.asarray(fl.xy)
        R, t = world.pose(0.0)
        proj = pc @ np.diag([world.fx, world.fy, 1.0])
        uv_gt = np.stack([proj[:, 0] / pc[:, 2] + world.cx,
                          proj[:, 1] / pc[:, 2] + world.cy], -1)
        errs = []
        for i in np.where(valid)[0]:
            j = np.linalg.norm(uv_gt - xy[i], axis=-1).argmin()
            if np.linalg.norm(uv_gt[j] - xy[i]) > 6:
                continue
            errs.append(abs(depth[i] - pc[j, 2]) / pc[j, 2])
        errs = np.asarray(errs)
        assert len(errs) > 50
        # Median relative depth error < 5%.
        assert np.median(errs) < 0.05, np.median(errs)

    def test_row_constraint_rejects_shifted_rows(self, stereo_pair):
        """A vertically shifted right image violates the rectified-row
        constraint: matches must mostly disappear."""
        world, img_l, img_r, bf, pc = stereo_pair
        fl = fast_orb.extract(jnp.asarray(img_l), n_features=512)
        fr = fast_orb.extract(jnp.asarray(img_r), n_features=512)
        fr_shifted = fr._replace(xy=fr.xy + jnp.asarray([0.0, 25.0]))
        res = stereo.stereo_match(
            fl.xy, fl.level, fl.desc, fl.valid,
            fr_shifted.xy, fr_shifted.level, fr_shifted.desc, fr_shifted.valid,
            jnp.asarray(img_l), jnp.asarray(img_r),
            jnp.asarray(bf, jnp.float32), 0.4)
        assert np.asarray(res.valid).mean() < 0.1


class TestFisheyeStereoMatch:
    """fisheye_stereo_match on a NON-rectified pair (rotated right camera):
    descriptor matching + two-view triangulation must recover metric depth
    (KannalaBrandt8::TriangulateMatches semantics)."""

    def test_depth_recovery_rotated_rig(self):
        import copy

        from orbslam3_byzyh_tpu.ops import lie

        world = SynthWorld(seed=7)
        baseline = 0.2
        R, t = world.pose(0.0)
        img_l = world.render(0.0)
        # Right camera: +baseline along x, yawed 4 degrees (NOT rectified).
        R_d = np.asarray(lie.so3_exp(jnp.asarray([0.0, np.deg2rad(4.0), 0.0])))
        t_r0 = t - np.array([baseline, 0, 0], np.float32)
        R_r = (R_d @ R).astype(np.float32)
        t_r = (R_d @ t_r0).astype(np.float32)
        world_r = copy.copy(world)
        world_r.pose = lambda tt: (R_r, t_r)
        img_r = world_r.render(0.0)

        import jax.numpy as jnp2
        fl = fast_orb.extract(jnp2.asarray(img_l), n_features=1024)
        fr = fast_orb.extract(jnp2.asarray(img_r), n_features=1024)
        cam_l = jnp.asarray([world.fx, world.fy, world.cx, world.cy],
                            jnp.float32)
        # x_r = R_rl x_l + t_rl with R_rl = R_d, t_rl = t_r - R_d t.
        R_rl = jnp.asarray(R_d, jnp.float32)
        t_rl = jnp.asarray(t_r - R_d @ t, jnp.float32)
        res = stereo.fisheye_stereo_match(
            fl.xy, fl.level, fl.desc, fl.valid,
            fr.xy, fr.level, fr.desc, fr.valid,
            cam_l, cam_l, R_rl, t_rl)
        valid = np.asarray(res.valid)
        depth = np.asarray(res.depth)
        assert valid.sum() > 60, valid.sum()

        pc = world.pts @ R.T + t
        uv_gt = np.stack([world.fx * pc[:, 0] / pc[:, 2] + world.cx,
                          world.fy * pc[:, 1] / pc[:, 2] + world.cy], -1)
        xy = np.asarray(fl.xy)
        errs = []
        for i in np.where(valid)[0]:
            j = np.linalg.norm(uv_gt - xy[i], axis=-1).argmin()
            if np.linalg.norm(uv_gt[j] - xy[i]) > 6:
                continue
            errs.append(abs(depth[i] - pc[j, 2]) / pc[j, 2])
        errs = np.asarray(errs)
        # No sub-pixel refinement on this path (the reference's
        # TriangulateMatches also triangulates raw keypoint coords), so
        # tolerances are looser than the rectified+SAD path.
        assert len(errs) > 15
        assert np.median(errs) < 0.08, np.median(errs)

    def test_parallax_gate_rejects_zero_baseline(self):
        """With no baseline every ray pair is parallel: the cos-parallax
        gate (0.9998) must kill essentially everything."""
        world = SynthWorld(seed=8)
        img = world.render(0.0)
        fl = fast_orb.extract(jnp.asarray(img), n_features=512)
        cam_l = jnp.asarray([world.fx, world.fy, world.cx, world.cy],
                            jnp.float32)
        res = stereo.fisheye_stereo_match(
            fl.xy, fl.level, fl.desc, fl.valid,
            fl.xy, fl.level, fl.desc, fl.valid,
            cam_l, cam_l, jnp.eye(3), jnp.zeros(3))
        assert np.asarray(res.valid).mean() < 0.05
