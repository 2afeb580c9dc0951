"""Stereo and RGB-D SLAM system variants.

Replaces the stereo/RGB-D paths of the reference pipeline:
``System::TrackStereo/TrackRGBD`` (System.h:113-121),
``Tracking::StereoInitialization`` (:3438 — the map starts from ONE frame
using metric depths), the depth-based landmark creation in
``CreateNewKeyFrame`` (:4589 stereo branch), and the RGB-D pseudo-stereo
conversion (Frame::ComputeStereoFromRGBD :1361).

Both variants reuse the monocular tracking core (projection matching +
motion-only pose optimization); metric depth enters through landmark
creation, which also removes the monocular scale ambiguity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import map_state as ms
from ..ops import stereo as stereo_ops
from . import mapping
from . import system as base


@dataclasses.dataclass
class StereoConfig(base.SlamConfig):
    bf: float = 40.0            # baseline * fx (Camera.bf)
    th_depth: float = 35.0      # close/far threshold factor (Camera.ThDepth)
    min_z: float = 0.3
    # One-frame metric init gates (StereoInitialization :3438 needs >= 500
    # depth points; scaled down for low-texture rigs/tests).
    min_init_depth_points: int = 300
    min_init_landmarks: int = 100

    @property
    def depth_threshold(self):
        """Close-point gate: bf/fx * ThDepth (Tracking ctor behaviour)."""
        return self.bf / self.fx * self.th_depth


class StereoSlam(base.MonoSlam):
    """Stereo SLAM engine (System::TrackStereo equivalent)."""

    def __init__(self, config: StereoConfig):
        super().__init__(config)
        self._depth = None          # (N,) per-keypoint depth of current frame
        if self.loop_closer is not None:
            # Metric depth fixes scale: SE3 pose graph + scale-gated merges
            # (bFixScale plumbing, OptimizeEssentialGraph / Sim3Solver).
            self.loop_closer.cfg.fix_scale = True

    # ------------------------------------------------------------------
    def track(self, img_left: np.ndarray, img_right: np.ndarray,
              stamp: float):
        stamp = self._rel_stamp(stamp)
        self._kf_host_pending = False
        if self._check_timestamp_jump(stamp):
            return None
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
        return self._track_with_depth(feats, stamp)

    # ------------------------------------------------------------------
    def _ba_kwargs(self) -> dict:
        if self._ur is None:
            return {}
        return dict(use_stereo=True, bf=float(self.cfg.bf))

    # ------------------------------------------------------------------
    def _track_local_map(self, res, feats):
        """Mixed mono/stereo-residual pose optimization against the bounded
        local window: keypoints with a right-image match add the
        u_r = u - bf/z constraint (EdgeStereoSE3ProjectXYZOnlyPose, chi2
        gate 7.815)."""
        if self._ur is None:
            return super()._track_local_map(res, feats)
        from . import tracking
        lms = self.state.lms
        return tracking.track_local_map_windowed(
            res.R, res.t, res.bindings,
            lms.pos, lms.desc, lms.normal, lms.min_dist, lms.max_dist,
            lms.valid, self.state.obs.kf, self.state.obs.valid,
            jnp.asarray(self.n_kf, jnp.int32),
            feats.xy, feats.level, feats.desc, feats.valid,
            self._ur, jnp.asarray(self.cfg.bf, jnp.float32),
            self.cam_params, self.cfg.width, self.cfg.height,
            use_stereo=True, **self._local_window_kwargs())

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, n_inliers: int,
                           ref_matches: int | None = None) -> bool:
        """Stereo/RGB-D NeedNewKeyFrame rules
        (/root/reference/src/Tracking.cc:4440-4514): the close-point
        deficit c1c (tracked-close < 100 while > 70 close points are
        creatable forces a KF even mid-interval) and the stereo reference
        ratio thRefRatio = 0.75 (vs the mono 0.9)."""
        if not self._kf_slot_available():
            return False
        if ref_matches is None:
            ref_matches = self._ref_kf_matches()
        n_tracked_close, n_untracked_close = self._close_counts
        need_close = (n_tracked_close < 100) and (n_untracked_close > 70)
        c1a = self.frames_since_kf >= self.max_frames
        c1b = self.frames_since_kf >= self.cfg.min_frames
        c1c = (n_inliers < ref_matches * 0.25) or need_close
        c2 = ((n_inliers < ref_matches * 0.75) or need_close) \
            and n_inliers > 15
        return (c1a or (c1b and c2) or c1c) and c2

    # ------------------------------------------------------------------
    def _track_with_depth(self, feats, stamp):
        if self.status == base.NOT_INITIALIZED:
            pose = self._stereo_initialize(feats, stamp)
        else:
            pose = self._track_frame(feats, stamp)
        if pose is not None:
            self._log_frame(stamp, pose)
        return pose

    # ------------------------------------------------------------------
    def _stereo_initialize(self, feats, stamp):
        """One-frame metric initialization (StereoInitialization :3438):
        needs >= 500 valid depth points."""
        depth = np.asarray(self._depth)
        good = (depth > 0) & np.asarray(feats.valid)
        if good.sum() < self.cfg.min_init_depth_points:
            return None

        self.state = ms.add_keyframe(self.state, 0, jnp.eye(3),
                                     jnp.zeros(3), stamp, feats, ur=self._ur)
        self.n_kf = 1
        n_new = self._create_depth_landmarks(0, feats, jnp.asarray(good))
        if n_new < self.cfg.min_init_landmarks:
            self.atlas.reset_active_map()
            return None

        seen, kp_of = ms.landmarks_seen_by(self.state, 0)
        bindings = jnp.full((self.cfg.n_features,), -1, jnp.int32)
        lm_ids = jnp.arange(self.cfg.max_lm)
        tgt = jnp.where(seen, kp_of, self.cfg.n_features)
        bindings = bindings.at[tgt].set(
            jnp.where(seen, lm_ids, -1), mode="drop")

        self._last = dict(feats=feats, bindings=bindings,
                          R=jnp.eye(3), t=jnp.zeros(3), stamp=stamp)
        self._vel = None
        self.status = base.OK
        self.last_kf_id = 0
        self.frames_since_kf = 0
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(self.state, 0)
        self._refresh_ref_cache()
        return (jnp.eye(3), jnp.zeros(3))

    # ------------------------------------------------------------------
    def _create_depth_landmarks(self, kf_id: int, feats, mask) -> int:
        """Back-project keypoints with valid depth into world landmarks."""
        depth = self._depth
        mask = mask & (depth > 0) & feats.valid
        n_new = int(np.asarray(mask).sum())
        if n_new == 0:
            return 0
        fx, fy, cx, cy = (self.cfg.fx, self.cfg.fy, self.cfg.cx, self.cfg.cy)
        x = (feats.xy[:, 0] - cx) / fx * depth
        y = (feats.xy[:, 1] - cy) / fy * depth
        pc = jnp.stack([x, y, depth], -1)
        R = self.state.kfs.R[kf_id]
        t = self.state.kfs.t[kf_id]
        pw = (pc - t) @ R          # R^T (pc - t)
        cam_center = -jnp.einsum("ji,j->i", R, t)
        ray = pw - cam_center
        dist = jnp.linalg.norm(ray, axis=-1)
        normal = ray / jnp.maximum(dist, 1e-9)[:, None]
        level_f = feats.level.astype(jnp.float32)
        max_dist = dist * 1.2 ** level_f
        min_dist = max_dist / 1.2 ** 7

        # Free-slot allocation (recycles culled slots, same as the
        # triangulation path in mapping.keyframe_bundle — the old
        # high-water-cursor allocation never reused freed slots, so long
        # stereo runs exhausted max_lm while the array held dead rows).
        slots, write = mapping._alloc_landmark_slots(self.state.lms.valid,
                                                     mask)
        kp_idx = jnp.arange(self.cfg.n_features, dtype=jnp.int32)
        self.state = ms.add_landmarks(
            self.state, slots, pw, feats.desc,
            kf_id, kp_idx, kf_id, kp_idx,
            write, normal, min_dist, max_dist)
        self.n_lm = max(self.n_lm, int(jnp.max(
            jnp.where(write, slots + 1, 0))))

        # Bind them into the live tracking context if present.
        if self._last is not None:
            lm_ids = jnp.where(write, slots, -1)
            tgt = jnp.where(write, kp_idx, self.cfg.n_features)
            self._last["bindings"] = self._last["bindings"].at[tgt].set(
                lm_ids, mode="drop")
        return n_new

    # ------------------------------------------------------------------
    def _create_keyframe(self, feats, track_res, stamp):
        super()._create_keyframe(feats, track_res, stamp)
        # Stereo branch of CreateNewKeyFrame (:4620-4700): create landmarks
        # for close-depth keypoints that are still unbound.
        kf_id = self.last_kf_id
        seen, kp_of = ms.landmarks_seen_by(self.state, kf_id)
        bound = jnp.zeros((self.cfg.n_features,), bool).at[
            jnp.where(seen, kp_of, self.cfg.n_features)].set(True, mode="drop")
        close = self._depth < self.cfg.depth_threshold
        self._create_depth_landmarks(kf_id, feats, ~bound & close)


@dataclasses.dataclass
class FisheyeStereoConfig(StereoConfig):
    """Non-rectified stereo rig with per-camera models (TUM-VI 512x512
    Kannala-Brandt pair — the reference's fisheye stereo path,
    Frame::ComputeStereoFishEyeMatches, Frame.h:349)."""
    cam2: np.ndarray = None       # (4,) right [fx fy cx cy]
    kb8_2: np.ndarray = None      # (4,) right KB8 coeffs (None = pinhole)
    dist2: np.ndarray = None      # right radtan (None = none)
    R_rl: np.ndarray = None       # left-cam -> right-cam rotation
    t_rl: np.ndarray = None       # left-cam -> right-cam translation


class FisheyeStereoSlam(StereoSlam):
    """Stereo SLAM on a non-rectified (e.g. fisheye) rig: descriptor
    matching + two-view triangulation replaces the rectified row search."""

    def __init__(self, config: FisheyeStereoConfig):
        super().__init__(config)
        self._cam2 = jnp.asarray(config.cam2, jnp.float32)
        self._R_rl = jnp.asarray(config.R_rl, jnp.float32)
        self._t_rl = jnp.asarray(config.t_rl, jnp.float32)

    def track(self, img_left: np.ndarray, img_right: np.ndarray,
              stamp: float):
        stamp = self._rel_stamp(stamp)
        self._kf_host_pending = False
        if self._check_timestamp_jump(stamp):
            return None
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
        return self._track_with_depth(feats, stamp)


@dataclasses.dataclass
class RgbdConfig(StereoConfig):
    depth_scale: float = 1.0    # DepthMapFactor


class RgbdSlam(StereoSlam):
    """RGB-D SLAM engine (System::TrackRGBD equivalent).

    Depth comes from the depth image sampled at keypoint locations
    (ComputeStereoFromRGBD :1361 — the reference also synthesizes a virtual
    right coordinate u - bf/depth, which feeds the stereo residual in pose
    optimization).
    """

    def track(self, img: np.ndarray, depth_img: np.ndarray, stamp: float):
        stamp = self._rel_stamp(stamp)
        self._kf_host_pending = False
        if self._check_timestamp_jump(stamp):
            return None
        feats = self._extract(img)
        d = jnp.asarray(depth_img, jnp.float32) / self.cfg.depth_scale
        h, w = depth_img.shape
        ix = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0, w - 1)
        iy = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0, h - 1)
        depth = d.reshape(-1)[iy * w + ix]
        ok = (depth > self.cfg.min_z) & feats.valid
        self._depth = jnp.where(ok, depth, -1.0)
        # Virtual right coordinate u_r = u - bf/depth
        # (ComputeStereoFromRGBD :1361) feeds the stereo residual.
        self._ur = jnp.where(ok, feats.xy[:, 0] - self.cfg.bf / depth, -1.0)
        return self._track_with_depth(feats, stamp)
