"""Keyframe-policy rules (Tracking::NeedNewKeyFrame,
/root/reference/src/Tracking.cc:4388-4540): the stereo/RGB-D c1c
close-point-deficit rule and the stereo thRefRatio = 0.75 vs mono 0.9."""

import numpy as np

from orbslam3_byzyh_tpu.pipeline.stereo_system import StereoConfig, StereoSlam
from orbslam3_byzyh_tpu.pipeline.system import MonoSlam, SlamConfig


def _stereo():
    cfg = StereoConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                       width=640, height=480, n_features=256,
                       max_kf=32, max_lm=1024, max_obs=4,
                       fps=10, bf=80.0, th_depth=35.0,
                       vocabulary=None)
    return StereoSlam(cfg)


def _mono():
    cfg = SlamConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0,
                     width=640, height=480, n_features=256,
                     max_kf=32, max_lm=1024, max_obs=4, fps=10,
                     vocabulary=None)
    return MonoSlam(cfg)


class TestStereoKeyframePolicy:
    def test_close_point_starvation_forces_kf(self):
        """c1c: tracked-close < 100 while > 70 close points are creatable
        forces a KF even with inliers ABOVE the mono 0.9 ratio and no
        frame-interval trigger (Tracking.cc:4474-4514)."""
        slam = _stereo()
        slam.frames_since_kf = 1          # far from the c1a interval
        slam._close_counts = (40, 120)    # starving + creatable
        # 180/200 = 0.9: mono c2 (inliers < 0.9*ref) would NOT fire.
        assert slam._need_new_keyframe(180, ref_matches=200)

    def test_no_kf_when_close_points_healthy(self):
        slam = _stereo()
        slam.frames_since_kf = 1
        slam._close_counts = (150, 120)   # plenty tracked-close
        # 180 >= 0.75*200: stereo c2 does not fire either.
        assert not slam._need_new_keyframe(180, ref_matches=200)

    def test_stereo_ratio_075(self):
        """thRefRatio 0.75 (stereo) vs 0.9 (mono): 160/200 = 0.8 inserts
        under the mono rule but not the stereo one."""
        st = _stereo()
        st.frames_since_kf = 1
        st._close_counts = (150, 0)
        assert not st._need_new_keyframe(160, ref_matches=200)
        mono = _mono()
        mono.frames_since_kf = 1
        assert mono._need_new_keyframe(160, ref_matches=200)

    def test_c1c_needs_c2(self):
        """The reference gates every insert on c2 (inliers must also be
        below the ratio OR close-starved): a close-starved frame with no
        creatable close points does not insert."""
        slam = _stereo()
        slam.frames_since_kf = 1
        slam._close_counts = (40, 10)     # starving but nothing creatable
        assert not slam._need_new_keyframe(190, ref_matches=200)

    def test_interval_rule_still_applies(self):
        slam = _stereo()
        slam.frames_since_kf = slam.max_frames
        slam._close_counts = (150, 0)
        # c1a + c2 (120 < 0.75*200).
        assert slam._need_new_keyframe(120, ref_matches=200)
