"""Stereo-inertial SLAM system (the reference's flagship configuration —
BASELINE config 3, EuRoC MH01-05 stereo-inertial).

Composes the stereo front-end (``pipeline/stereo_system.py``: one-frame
metric initialization + depth landmark creation) with the inertial machinery
(``pipeline/inertial_system.py``: preintegration, IMU init, VIBA schedule,
inertial tracking). Mirrors ``System::TrackStereo`` with an IMU
(/root/reference/src/System.cc TrackStereo + Tracking inertial paths); the
stereo IMU init uses the (1e2, 1e5) prior and a 1 s window
(/root/reference/src/LocalMapping.cc:241-243 stereo branch).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import stereo as stereo_ops
from . import system as base
from .inertial_system import ImuConfig, MonoInertialSlam
from .stereo_system import (FisheyeStereoConfig, FisheyeStereoSlam,
                            StereoConfig, StereoSlam)


class StereoInertialSlam(MonoInertialSlam, StereoSlam):
    """Stereo-inertial engine. MRO: inertial hooks wrap the stereo hooks
    (keyframe creation adds depth landmarks, then the IMU schedule runs)."""

    def __init__(self, config: StereoConfig, imu_cfg: ImuConfig, **kw):
        super().__init__(config, imu_cfg, **kw)
        self._depth = None
        # Stereo IMU-init gates (LocalMapping.cc:1516 stereo branch); scale
        # comes from stereo depth, so the init fixes it (Optimizer.cc:3778).
        self.imu_init_prior = (1e2, 1e5)
        self.imu_init_min_time = 1.0
        self.imu_fix_scale = True

    # ------------------------------------------------------------------
    def track(self, img_left: np.ndarray, img_right: np.ndarray,
              stamp: float, imu_data=None):
        stamp = self._rel_stamp(stamp)
        self._kf_host_pending = False
        if self._check_timestamp_jump(stamp):
            return None
        if imu_data is not None and len(imu_data[0]) > 0:
            self.buf.append(np.asarray(imu_data[0], np.float64) - self.t0,
                            imu_data[1], imu_data[2])
        self._cur_stamp = stamp

        with self._stage("orb_extract"):
            feats = self._extract(img_left)
            feats_r = self._extract(img_right)
        with self._stage("stereo_match"):
            m = stereo_ops.stereo_match(
                feats.xy, feats.level, feats.desc, feats.valid,
                feats_r.xy, feats_r.level, feats_r.desc, feats_r.valid,
                jnp.asarray(img_left, jnp.float32),
                jnp.asarray(img_right, jnp.float32),
                jnp.asarray(self.cfg.bf, jnp.float32), self.cfg.min_z)
            self._depth = jnp.where(m.valid, m.depth, -1.0)
            self._ur = jnp.where(m.valid, m.u_right, -1.0)

        if self.status == base.NOT_INITIALIZED:
            pose = self._stereo_initialize(feats, stamp)
            # Single-KF metric init: the temporal chain starts at this KF
            # (no preintegration needed before it).
        elif self.imu_ready:
            pose = self._track_inertial(feats, stamp)
        else:
            pose = self._track_frame(feats, stamp)

        self._last_stamp = stamp
        if pose is not None:
            self._log_frame(stamp, pose)
        return pose


class FisheyeStereoInertialSlam(MonoInertialSlam, FisheyeStereoSlam):
    """Stereo-inertial on a non-rectified fisheye rig (TUM-VI 512x512
    KB8 pair + IMU — the tum_vi stereo-inertial mains,
    /root/reference/Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc)."""

    def __init__(self, config: FisheyeStereoConfig, imu_cfg: ImuConfig, **kw):
        super().__init__(config, imu_cfg, **kw)
        self._depth = None
        self.imu_init_prior = (1e2, 1e5)
        self.imu_init_min_time = 1.0
        self.imu_fix_scale = True
        self._cam2 = jnp.asarray(config.cam2, jnp.float32)
        self._R_rl = jnp.asarray(config.R_rl, jnp.float32)
        self._t_rl = jnp.asarray(config.t_rl, jnp.float32)

    def track(self, img_left: np.ndarray, img_right: np.ndarray,
              stamp: float, imu_data=None):
        stamp = self._rel_stamp(stamp)
        self._kf_host_pending = False
        if self._check_timestamp_jump(stamp):
            return None
        if imu_data is not None and len(imu_data[0]) > 0:
            self.buf.append(np.asarray(imu_data[0], np.float64) - self.t0,
                            imu_data[1], imu_data[2])
        self._cur_stamp = stamp

        with self._stage("orb_extract"):
            feats = self._extract(img_left)
            feats_r = self._extract(
                img_right, cam_params=self._cam2,
                kb8=self.cfg.kb8_2, dist=self.cfg.dist2)
        with self._stage("stereo_match"):
            m = stereo_ops.fisheye_stereo_match(
                feats.xy, feats.level, feats.desc, feats.valid,
                feats_r.xy, feats_r.level, feats_r.desc, feats_r.valid,
                self.cam_params, self._cam2, self._R_rl, self._t_rl)
            self._depth = jnp.where(m.valid, m.depth, -1.0)

        if self.status == base.NOT_INITIALIZED:
            pose = self._stereo_initialize(feats, stamp)
        elif self.imu_ready:
            pose = self._track_inertial(feats, stamp)
        else:
            pose = self._track_frame(feats, stamp)

        self._last_stamp = stamp
        if pose is not None:
            self._log_frame(stamp, pose)
        return pose
