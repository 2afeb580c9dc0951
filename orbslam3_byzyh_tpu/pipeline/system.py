"""SLAM system facade: host orchestration of the jitted pipeline stages.

Replaces ``System`` (/root/reference/src/System.cc) + the thread/state-machine
core of ``Tracking`` (/root/reference/src/Tracking.cc:2692 Track): the three
reference threads (Tracking/LocalMapping/LoopClosing, System.cc:223-265)
become sequential (later: async-dispatch) stages over a functional MapState —
no locks, ownership passes along the pipeline.

Monocular visual path (BASELINE config 1). State machine:
NOT_INITIALIZED -> OK -> (RECENTLY_LOST -> reloc | new map).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import atlas as atlas_mod
from ..models import map_state as ms
from ..ops import camera as cam
from ..ops import fast_orb, geometry, lie
from ..solver import pose_opt
from ..utils import verbose
from . import mapping, tracking, trajectory_log
from .loop_closing import LoopCloser

NOT_INITIALIZED = 0
OK = 1
RECENTLY_LOST = 2
LOST = 3


@dataclasses.dataclass
class SlamConfig:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    dist: Optional[np.ndarray] = None      # [k1,k2,p1,p2,(k3)] or None
    kb8: Optional[np.ndarray] = None       # [k0..k3] Kannala-Brandt fisheye
    n_features: int = 1024
    max_kf: int = 256
    max_lm: int = 16384
    max_obs: int = 12
    fps: float = 20.0
    min_frames: int = 0                    # KF policy (Tracking.cc:4388)
    max_frames: Optional[int] = None       # defaults to fps
    local_window: int = 8                  # covisible neighbours free in local BA
    ba_window: int = 32                    # total KFs (free + fixed) in local BA
    ba_lm_window: int = 4096               # landmark rows gathered for local BA
    # Bounded per-frame local map (UpdateLocalKeyFrames/Points parity,
    # Tracking.cc:4851-4895): tracking matches against the landmarks of the
    # top `local_kf_window` covisible KFs (+ the `recent_kf_window` newest),
    # truncated at `local_lm_window` rows — O(window) per frame, not O(map).
    local_kf_window: int = 20
    local_lm_window: int = 4096
    recent_kf_window: int = 4
    # Min observations for a ref-KF landmark to count in the c2 keyframe
    # ratio (TrackedMapPoints(nMinObs), Tracking.cc:4407-4412; reference
    # default 3). Synthetic worlds with frame-to-frame descriptor churn
    # (quantized blob rendering) may need 1 to keep the old dense-KF
    # crutch; real imagery uses the parity default.
    kf_ref_min_obs: int = 3
    min_init_matches: int = 100            # two-view init gate (Tracking.cc:3620)
    triangulation_neighbors: int = 3
    # Time-sliced background global BA after loop corrections (the
    # reference's detached RunGlobalBundleAdjustment thread,
    # LoopClosing.cc:2869): one LM iteration per tracked frame against a
    # map snapshot, merged back through the spanning tree when done.
    # False = solve inline (blocks the frame loop for the whole solve).
    background_gba: bool = True
    vocabulary: Optional[object] = None    # ops.bow.Vocabulary for reloc/loops
    use_loop_closing: bool = True
    # Device mesh for the distributed solvers (parallel/dist_ba): None =
    # auto (use all local devices when >1); False = force single-device.
    device_mesh: Optional[object] = None
    min_reloc_inliers: int = 30            # Relocalization gate (~:5230)
    # Mine reloc candidates from every atlas map and switch into the map
    # that relocalizes (extension; the reference filters candidates to the
    # current map and rejoins old maps only through MergeLocal).
    cross_map_reloc: bool = True
    lost_grace_frames: Optional[int] = None  # RECENTLY_LOST budget (~fps)
    chessboard: Optional[object] = None    # utils.chessboard.ChessboardConfig

    def cam_params(self):
        return np.array([self.fx, self.fy, self.cx, self.cy], np.float32)


class MonoSlam:
    """Monocular SLAM engine (System::TrackMonocular equivalent)."""

    def __init__(self, config: SlamConfig):
        self.cfg = config
        self.cam_params = jnp.asarray(config.cam_params())
        self.dist = (jnp.asarray(config.dist.astype(np.float32))
                     if config.dist is not None else None)
        self.atlas = atlas_mod.Atlas(config.max_kf, config.max_lm,
                                     config.max_obs, config.n_features)
        self.status = NOT_INITIALIZED
        self.max_frames = config.max_frames or int(config.fps)
        self.lost_grace = config.lost_grace_frames or int(config.fps)
        self.lost_frames = 0
        self.loop_closer = None
        if config.vocabulary is not None:
            self.loop_closer = LoopCloser(config.vocabulary, config.max_kf,
                                          config.n_features,
                                          cam_params=config.cam_params())
        # Chessboard world-frame initialization (fork feature).
        self._chess_pose = None
        self._chess_applied = False
        # Localization-only mode (System::ActivateLocalizationMode,
        # System.h:125-129): track against the frozen map, no KF insertion.
        self.localization_only = False
        # Distributed-BA mesh: global/merge BA shards its landmark axis over
        # all local devices (parallel/dist_ba; no-op on a single chip).
        self.mesh = config.device_mesh
        if self.mesh is None and jax.device_count() > 1:
            from ..parallel import dist_ba
            self.mesh = dist_ba.make_mesh()
        elif self.mesh is False:
            self.mesh = None

        # Reference frame for initialization.
        self._init_feats = None
        self._init_stamp = None
        # Last-frame tracking context.
        self._last = None           # dict(feats, bindings, R, t, stamp)
        self._ur = None             # (N,) right-u per keypoint (stereo/RGBD)
        self._depth = None          # (N,) per-keypoint depth (stereo/RGBD)
        self._vel = None            # (R_v, t_v): T_cur = vel * T_last
        self.frames_since_kf = 0
        self.last_kf_id = -1
        # Frame-trajectory log: per-frame poses are stored RELATIVE to their
        # reference keyframe and replayed against current KF poses on read,
        # so loop/GBA/rebase corrections apply retroactively
        # (Tracking.cc:3396-3419 + System::SaveTrajectoryEuRoC replay).
        # Stamps are RELATIVE to the first frame (self.t0): absolute dataset
        # stamps (EuRoC ~1.4e9 s) would lose ~100 s of precision in the
        # float32 keyframe-stamp arrays. Writers add self.t0 back.
        self._traj = trajectory_log.TrajectoryLog()
        # (ref_kf_id, R_rw, t_rw) host cache of the reference KF's pose,
        # refreshed whenever the map moves it (KF creation, loop closure,
        # rebase, compaction) — avoids a device read per tracked frame.
        self._ref_cache = None
        # Bumped by every _refresh_ref_cache: _drain_pending only restores
        # its bundle-time pose if no VIBA/rebase refreshed the cache since
        # the bundle dispatch (a stale restore would log frames against a
        # pre-rebase reference pose).
        self._ref_cache_gen = 0
        # Deferred outputs of the last keyframe_bundle dispatch (drained at
        # the next KF / before any state-sensitive host operation).
        self._pending_kf = None
        # Time-sliced background global BA (pipeline/background_gba.py).
        self._bg_gba = None
        self._corr_Rw = None
        # Count of cross-map relocalizations (old-map re-entries).
        self.n_cross_map_relocs = 0
        self._t0 = None
        # (n_tracked_close, n_untracked_close) of the latest frame — the
        # stereo/RGB-D c1c keyframe rule inputs (Tracking.cc:4440-4461).
        self._close_counts = (0, 0)
        self.rng_key = jax.random.PRNGKey(0)
        # Per-stage timers (REGISTER_TIMES parity, SURVEY §5): None = off.
        # Enable with enable_stage_timers(); runners save ExecTimeMean.txt.
        self.timers = None

    # ------------------------------------------------------------------
    def enable_stage_timers(self):
        """Turn on the reference's REGISTER_TIMES stage taxonomy
        (/root/reference/include/Settings.h:23-24; vectors Tracking.h:182-196)."""
        from ..utils.timers import StageTimers
        self.timers = StageTimers()
        return self.timers

    def _stage(self, name: str):
        import contextlib
        if self.timers is None:
            return contextlib.nullcontext()
        return self.timers.time(name)

    @property
    def t0(self) -> float:
        """Absolute timestamp of the first tracked frame (0.0 if none)."""
        return self._t0 or 0.0

    def _rel_stamp(self, stamp: float) -> float:
        if self._t0 is None:
            self._t0 = float(stamp)
        return float(stamp) - self._t0

    # ------------------------------------------------------------------
    @property
    def state(self) -> ms.MapState:
        return self.atlas.state

    @state.setter
    def state(self, s: ms.MapState):
        self.atlas.state = s

    @property
    def n_kf(self) -> int:
        return self.atlas.counts().n_kf

    @n_kf.setter
    def n_kf(self, v: int):
        self.atlas.counts().n_kf = v

    @property
    def n_lm(self) -> int:
        return self.atlas.counts().n_lm

    @n_lm.setter
    def n_lm(self, v: int):
        self.atlas.counts().n_lm = v

    @property
    def kf_parent(self) -> np.ndarray:
        """Spanning-tree parent per KF slot (-1 = root) — the essential
        graph's tree edges, stored per map (KeyFrame::GetParent)."""
        meta = self.atlas.counts()
        if meta.kf_parent is None:
            meta.kf_parent = np.full(self.cfg.max_kf, -1, np.int32)
        return meta.kf_parent

    # ------------------------------------------------------------------
    def _extract(self, img: np.ndarray, cam_params=None, kb8=None,
                 dist=None) -> fast_orb.FrameFeatures:
        """Extract ORB features and rectify keypoints onto the (virtual)
        pinhole. Optional per-camera overrides support heterogeneous stereo
        rigs (fisheye right camera, stereo_system.FisheyeStereoSlam)."""
        cam_params = self.cam_params if cam_params is None else cam_params
        kb8 = self.cfg.kb8 if kb8 is None else kb8
        dist = self.dist if dist is None else dist
        feats = fast_orb.extract(jnp.asarray(img, jnp.float32),
                                 n_features=self.cfg.n_features)
        if kb8 is not None:
            # Kannala-Brandt fisheye: rectify detected keypoints onto the
            # virtual pinhole (fx, fy, cx, cy). The reference instead keeps
            # the KB8 model in every projection (GeometricCamera plumbing);
            # rectifying once at extraction reaches the same geometry with
            # one kernel — KB8 stays available natively in the solvers via
            # ops/camera.py model_id for residual-level parity work.
            kb8_params = jnp.concatenate([
                jnp.asarray(cam_params), jnp.asarray(kb8, jnp.float32)])
            ray = cam.kb8_unproject(kb8_params, feats.xy)
            und = cam.pinhole_project(jnp.asarray(cam_params), ray)
            feats = feats._replace(xy=und)
        elif dist is not None:
            und = cam.undistort_pixels(jnp.asarray(cam_params),
                                       jnp.asarray(dist), feats.xy)
            feats = feats._replace(xy=und)
        return feats

    # ------------------------------------------------------------------
    def track(self, img: np.ndarray, stamp: float):
        """Process one frame; returns Tcw (R, t) or None while initializing."""
        stamp = self._rel_stamp(stamp)
        self._kf_host_pending = False
        if self._check_timestamp_jump(stamp):
            return None
        if (self.cfg.chessboard is not None and self._chess_pose is None
                and self.status == NOT_INITIALIZED):
            self._snoop_chessboard(img)
        with self._stage("orb_extract"):
            feats = self._extract(img)
            if self.timers is not None:
                jax.block_until_ready(feats.desc)

        if self.status == NOT_INITIALIZED:
            pose = self._try_initialize(feats, stamp)
        else:
            pose = self._track_frame(feats, stamp)

        if pose is not None:
            self._log_frame(stamp, pose)
        return pose

    # ------------------------------------------------------------------
    @property
    def trajectory(self):
        """Per-frame (stamp, R_cw, t_cw) list, replayed against the CURRENT
        keyframe poses so map corrections apply retroactively (the
        reference's save-time relative-pose replay)."""
        self._drain_pending()
        self._gba_flush()
        return self._traj.replay(np.asarray(self.state.kfs.R),
                                 np.asarray(self.state.kfs.t))

    def _log_frame(self, stamp: float, pose):
        """Record one tracked frame relative to its reference keyframe.

        A frame that HOSTS a new keyframe is logged as that keyframe with
        an exact identity relative pose (its solved pose IS the keyframe's
        creation pose), so replay follows every later correction — BA,
        gravity/scale rebase, loop closure — with no residual. Logging it
        against ``_ref_cache`` instead is wrong whenever the keyframe work
        already refreshed the cache (IMU init / VIBA / scale refinement
        rebase the world between the pose solve and this call): the stale
        solved pose composed with the rebased reference produced a
        meter-scale one-frame outlier in the saved trajectory."""
        R_cw, t_cw = np.asarray(pose[0]), np.asarray(pose[1])
        if getattr(self, "_kf_host_pending", False) and self.last_kf_id >= 0:
            self._kf_host_pending = False
            self._traj.log(stamp, R_cw, t_cw, self.last_kf_id, R_cw, t_cw)
        elif self._ref_cache is None:
            self._traj.log(stamp, R_cw, t_cw, -1)
        else:
            ref, R_rw, t_rw = self._ref_cache
            self._traj.log(stamp, R_cw, t_cw, ref, R_rw, t_rw)
        # One bounded slice of any in-flight background global BA.
        self._gba_tick()

    def _refresh_ref_cache(self):
        """Re-read the reference KF's pose after anything that moved it."""
        self._ref_cache_gen += 1
        k = self.last_kf_id
        if k < 0:
            self._ref_cache = None
        else:
            self._ref_cache = (k, np.asarray(self.state.kfs.R[k]),
                               np.asarray(self.state.kfs.t[k]))

    # ------------------------------------------------------------------
    # Initialization (MonocularInitialization :3578 + CreateInitialMap :3680)
    # ------------------------------------------------------------------
    def _try_initialize(self, feats, stamp):
        # Before building a fresh map, try relocalizing into an OLD atlas
        # map (cross-map reloc): revisiting known territory after a loss
        # re-enters the old map directly instead of mapping it again and
        # waiting for the merge path.
        if (len(self.atlas.maps) > 1 and self.loop_closer is not None
                and self.cfg.cross_map_reloc):
            reloc = self._relocalize(feats, stamp)
            if reloc is not None:
                return reloc
        n_valid = int(np.asarray(feats.valid).sum())
        if self._init_feats is None:
            if n_valid >= 100:
                self._init_feats, self._init_stamp = feats, stamp
            return None

        ref = self._init_feats
        mj = tracking.match_for_initialization(
            ref.xy, ref.desc, ref.valid, ref.level,
            feats.xy, feats.desc, feats.valid, feats.level,
            ref_angle=ref.angle, cur_angle=feats.angle)
        mj_np = np.asarray(mj)
        n_matches = int((mj_np >= 0).sum())
        if n_matches < self.cfg.min_init_matches:
            # Too few: make the newer frame the reference (reference resets
            # when matches are scarce, Tracking.cc:3620).
            if n_valid >= 100:
                self._init_feats, self._init_stamp = feats, stamp
            return None

        K = jnp.array([[self.cfg.fx, 0, self.cfg.cx],
                       [0, self.cfg.fy, self.cfg.cy],
                       [0, 0, 1.0]], jnp.float32)
        matched = mj >= 0
        x1 = ref.xy
        x2 = feats.xy[jnp.maximum(mj, 0)]
        self.rng_key, sub = jax.random.split(self.rng_key)
        res = geometry.two_view_reconstruct(sub, x1, x2, K, matched)
        if not bool(res.success):
            return None

        # --- Create the initial map (CreateInitialMapMonocular :3680). ---
        good = np.asarray(res.good)
        X = np.asarray(res.points)
        depths = X[good][:, 2]
        if good.sum() < 50:
            return None
        med_depth = float(np.median(depths))
        if med_depth <= 0:
            return None
        inv_md = 1.0 / med_depth
        X_scaled = jnp.asarray(X * inv_md)
        R1 = res.R
        t1 = res.t * inv_md

        # KF0 = reference frame at identity; KF1 = current frame.
        self.state = ms.add_keyframe(self.state, 0, jnp.eye(3),
                                     jnp.zeros(3), self._init_stamp, ref)
        self.state = ms.add_keyframe(self.state, 1, R1, t1, stamp, feats)
        self.n_kf = 2

        good_j = jnp.asarray(good)
        n_new = int(good.sum())
        slots = jnp.cumsum(good_j.astype(jnp.int32)) - 1
        ca = jnp.zeros(3)
        cb = -jnp.einsum("ji,j->i", R1, t1)
        ray_a = X_scaled - ca
        da = jnp.linalg.norm(ray_a, axis=-1)
        normal = ray_a / jnp.maximum(da, 1e-9)[:, None]
        level_a = ref.level.astype(jnp.float32)
        max_dist = da * (1.2 ** level_a)
        min_dist = max_dist / 1.2 ** 7
        self.state = ms.add_landmarks(
            self.state, slots, X_scaled, ref.desc,
            0, jnp.arange(ref.xy.shape[0], dtype=jnp.int32),
            1, jnp.maximum(mj, 0).astype(jnp.int32),
            good_j, normal, min_dist, max_dist)
        self.n_lm = n_new

        # Global BA on the 2-KF map (reference: 20 iters).
        free = jnp.zeros(self.cfg.max_kf, bool).at[1].set(True)
        self.state = mapping.local_ba(self.state, free, self.cam_params)

        # Tracking context: bindings of the current frame.
        lm_ids = jnp.where(good_j, slots, -1)            # per ref-kp landmark id
        bindings = jnp.full((self.cfg.n_features,), -1, jnp.int32)
        tgt = jnp.where(good_j & (mj >= 0), jnp.maximum(mj, 0),
                        self.cfg.n_features)
        bindings = bindings.at[tgt].set(lm_ids, mode="drop")

        R_cur = self.state.kfs.R[1]
        t_cur = self.state.kfs.t[1]
        self._last = dict(feats=feats, bindings=bindings, R=R_cur, t=t_cur,
                          stamp=stamp)
        self._vel = None
        self.status = OK
        self.last_kf_id = 1
        self.frames_since_kf = 0
        self.kf_parent[1] = 0
        # Log KF0's pose retroactively (relative to KF0 itself: identity).
        self._traj.log(self._init_stamp, np.eye(3, dtype=np.float32),
                       np.zeros(3, np.float32), 0,
                       np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        self._refresh_ref_cache()
        return (R_cur, t_cur)

    # ------------------------------------------------------------------
    # Per-frame tracking (Track :2692 OK-state path)
    # ------------------------------------------------------------------
    def _ba_kwargs(self) -> dict:
        """Extra bundle-adjustment args; stereo systems add the u_r
        residual (use_stereo/bf)."""
        return {}

    def _local_window_kwargs(self) -> dict:
        """Static args of the bounded per-frame local map."""
        return dict(max_kf=self.cfg.max_kf,
                    n_local_kf=self.cfg.local_kf_window,
                    n_local_lm=self.cfg.local_lm_window,
                    recent_kf=self.cfg.recent_kf_window)

    def _track_local_map(self, res, feats):
        """Local-map tracking + final pose optimization against the
        BOUNDED local window (UpdateLocalKeyFrames/Points). Stereo systems
        override this with the mixed mono/stereo-residual variant."""
        lms = self.state.lms
        return tracking.track_local_map_windowed(
            res.R, res.t, res.bindings,
            lms.pos, lms.desc, lms.normal, lms.min_dist, lms.max_dist,
            lms.valid, self.state.obs.kf, self.state.obs.valid,
            jnp.asarray(self.n_kf, jnp.int32),
            feats.xy, feats.level, feats.desc, feats.valid,
            jnp.full((self.cfg.n_features,), -1.0, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
            self.cam_params, self.cfg.width, self.cfg.height,
            use_stereo=False, **self._local_window_kwargs())

    # ------------------------------------------------------------------
    def _track_frame(self, feats, stamp):
        last = self._last
        if self._vel is not None:
            Rv, tv = self._vel
            R_pred = Rv @ last["R"]
            t_pred = jnp.einsum("ij,j->i", Rv, last["t"]) + tv
        else:
            R_pred, t_pred = last["R"], last["t"]

        # One fused device step (motion model + widened retry + local-map
        # track + counters + ref-KF count); ONE 14-float host read per frame
        # instead of the previous 4-5 blocking transfers.
        lms = self.state.lms
        ba_kw = self._ba_kwargs()
        use_stereo = bool(ba_kw.get("use_stereo")) and self._ur is not None
        with self._stage("lm_track"):
            res, info, n_found, n_visible = tracking.frame_step(
                R_pred, t_pred, last["R"], last["t"],
                lms.pos, lms.desc, lms.normal, lms.min_dist, lms.max_dist,
                lms.valid,
                last["bindings"], last["feats"].desc, last["feats"].angle,
                feats.xy, feats.level, feats.desc, feats.valid, feats.angle,
                (self._ur if use_stereo
                 else jnp.full((self.cfg.n_features,), -1.0, jnp.float32)),
                jnp.asarray(ba_kw.get("bf", 0.0), jnp.float32),
                jnp.asarray(getattr(self.cfg, "depth_threshold", 0.0)
                            if use_stereo else 0.0, jnp.float32),
                self.state.obs.kf, self.state.obs.valid,
                jnp.asarray(self.last_kf_id, jnp.int32),
                jnp.asarray(self.cfg.kf_ref_min_obs, jnp.int32),
                jnp.asarray(self.n_kf, jnp.int32),
                lms.n_found, lms.n_visible,
                self.cam_params, self.cfg.width, self.cfg.height,
                use_stereo=use_stereo, **self._local_window_kwargs())
            info_np = np.asarray(info)       # the one per-frame device sync
        n_inliers = int(info_np[0])
        ref_matches = max(int(info_np[1]), 1)
        self._close_counts = (int(info_np[2]), int(info_np[3]))
        R_np = info_np[4:13].reshape(3, 3)
        t_np = info_np[13:16]

        if n_inliers < 15 and self.last_kf_id >= 0:
            # TrackReferenceKeyFrame fallback (Tracking.cc:3931): match the
            # current frame against the reference KF by descriptor (BoW
            # semantics, ratio 0.7) instead of projection. Rare path.
            fb = self._track_reference_keyframe(last, feats)
            fb = self._track_local_map(fb, feats)
            n_fb = int(fb.n_inliers)
            if n_fb >= 15:
                res = fb
                n_inliers = n_fb
                R_np = np.asarray(fb.R)
                t_np = np.asarray(fb.t)
                # frame_step skipped the counter update (its n_inliers<15).
                bound = res.bindings
                add = jnp.zeros((self.cfg.max_lm,), jnp.int32).at[
                    jnp.where(bound >= 0, bound, self.cfg.max_lm)].add(
                        1, mode="drop")
                n_found = lms.n_found + add
                n_visible = lms.n_visible + add

        if n_inliers < 15:
            # RECENTLY_LOST (Tracking.cc:2925-2947): dead-reckon for a grace
            # period while attempting relocalization; then give the map up.
            self.status = RECENTLY_LOST
            self.lost_frames += 1
            reloc = self._relocalize(feats, stamp)
            if reloc is not None:
                return reloc
            if self.lost_frames > self.lost_grace:
                self._handle_lost(feats, stamp)
                return None
            return (res.R, res.t)
        self.status = OK
        self.lost_frames = 0

        # Found/visible counters for culling (computed in frame_step).
        self.state = self.state._replace(lms=self.state.lms._replace(
            n_found=n_found, n_visible=n_visible))

        # Chessboard world-frame rebase, once, after successful init
        # (fork behaviour, Tracking.cc:3324-3341).
        if (self._chess_pose is not None and not self._chess_applied
                and self.n_kf >= 2):
            self._apply_chessboard_rebase()

        # Motion model update (host floats — no device reads).
        R_lw = np.asarray(last["R"])
        t_lw = np.asarray(last["t"])
        Rv_new = R_np @ R_lw.T
        tv_new = t_np - Rv_new @ t_lw
        self._vel = (Rv_new, tv_new)
        self._last = dict(feats=feats, bindings=res.bindings, R=R_np,
                          t=t_np, stamp=stamp)
        self.frames_since_kf += 1

        with self._stage("new_kf_decision"):
            need_kf = (not self.localization_only
                       and self._need_new_keyframe(n_inliers, ref_matches))
        if need_kf:
            with self._stage("total_mapping"):
                self._create_keyframe(
                    feats, res._replace(R=jnp.asarray(R_np),
                                        t=jnp.asarray(t_np)), stamp)
        return (R_np, t_np)

    # ------------------------------------------------------------------
    def _track_reference_keyframe(self, last, feats):
        """Build the reference-KF kp->landmark table and run the BoW-style
        fallback matcher (TrackReferenceKeyFrame, Tracking.cc:3931)."""
        kf = self.last_kf_id
        kfs = self.state.kfs
        seen, kp_of = ms.landmarks_seen_by(self.state, kf)
        n_feat = self.cfg.n_features
        n_lm = self.cfg.max_lm
        ref_lm = jnp.full((n_feat,), -1, jnp.int32).at[
            jnp.where(seen, kp_of, n_feat)].set(
                jnp.where(seen, jnp.arange(n_lm), -1), mode="drop")
        return tracking.track_reference_keyframe(
            last["R"], last["t"],
            kfs.kp_desc[kf], kfs.kp_angle[kf], kfs.kp_valid[kf], ref_lm,
            self.state.lms.pos, self.state.lms.valid,
            feats.xy, feats.level, feats.desc, feats.valid, feats.angle,
            self.cam_params)

    # ------------------------------------------------------------------
    def change_dataset(self):
        """Multi-session boundary (System::ChangeDataset, used by the
        multi-sequence example mains): keep the atlas, close the current
        map and start the next sequence in a fresh one. Re-joining happens
        through the loop-closing merge path when places are revisited."""
        self._handle_lost(None, None)

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Freeze the map; keep tracking/relocalizing against it."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, n_inliers: int,
                           ref_matches: int | None = None) -> bool:
        """NeedNewKeyFrame (:4388), monocular subset of the rules.
        ``ref_matches`` comes from the fused frame step when available
        (avoids a separate device read)."""
        if not self._kf_slot_available():
            return False
        if ref_matches is None:
            ref_matches = self._ref_kf_matches()
        c1a = self.frames_since_kf >= self.max_frames
        c1b = self.frames_since_kf >= self.cfg.min_frames
        c2 = (n_inliers < ref_matches * 0.9) and n_inliers > 15
        return (c1a or (c1b and c2)) and c2

    # ------------------------------------------------------------------
    # Capacity lifecycle: culled KF/landmark slots are recycled by an
    # order-preserving compaction when the fixed-capacity arrays fill up.
    # (The reference's heap map frees deleted objects implicitly; here the
    # compaction is the array-state equivalent, run rarely at capacity.)
    # ------------------------------------------------------------------
    def _kf_slot_available(self) -> bool:
        if self.n_kf < self.cfg.max_kf - 1:
            return True
        self._drain_pending()
        # Compaction renumbers KF ids: a background-GBA snapshot keyed on
        # the old ids cannot merge — finish it first (cheap vs losing it).
        self._gba_flush()
        # Overflow valve: if (almost) every slot is live, force-cull the
        # most redundant keyframes so a full-length run degrades to
        # sliding-window culling instead of silently stopping mapping
        # (VERDICT r4 missing #6; the reference's heap map never fills, so
        # this is array-capacity-specific).
        n_live = int(np.asarray(self.state.kfs.valid).sum())
        if n_live >= self.cfg.max_kf - 1:
            n_freed = self._force_cull_keyframes(
                max(self.cfg.max_kf // 8, 2))
            verbose.print_mess(
                f"map at capacity max_kf={self.cfg.max_kf}: force-culled "
                f"{n_freed} most-redundant keyframes")
        state, old2new, n_valid = ms.compact_keyframes(self.state, self.n_kf)
        if n_valid >= self.cfg.max_kf - 1:
            verbose.print_mess(
                f"map full: {n_valid} live keyframes at capacity "
                f"max_kf={self.cfg.max_kf}; KF insertion suspended — raise "
                "SlamConfig.max_kf or loosen culling")
            return False
        verbose.print_mess(
            f"compacted keyframes: {self.n_kf} slots -> {n_valid} live",
            verbose.VERBOSE)
        # Any frame records still referencing a dead slot are rebased onto
        # the nearest earlier live KF before ids move (the cull hooks
        # normally do this eagerly; this is the safety net).
        old2new = np.asarray(old2new)
        dead = old2new < 0
        if any(r >= 0 and dead[r] for r in self._traj.refs):
            self._traj.rebase(dead, self._nearest_live_parent(~dead),
                              np.asarray(self.state.kfs.R),
                              np.asarray(self.state.kfs.t))
        self._traj.remap(old2new)
        # Spanning tree follows the renumbering (dead parents resolved
        # through the dead chain first).
        par = self.kf_parent
        resolved = self._resolve_dead_parents(par, ~dead)
        new_par = np.full_like(par, -1)
        for old in np.where(~dead)[0]:
            p = resolved[old]
            new_par[old2new[old]] = old2new[p] if p >= 0 else -1
        par[:] = new_par
        self.state = state
        self.n_kf = n_valid
        self.last_kf_id = int(old2new[self.last_kf_id])
        if self.loop_closer is not None:
            self.loop_closer.remap_keyframes(old2new, n_valid)
        self._on_keyframes_compacted(old2new)
        self._refresh_ref_cache()
        return True

    def _force_cull_keyframes(self, n: int) -> int:
        """Capacity overflow: drop up to ``n`` keyframes in redundancy
        order, IGNORING the 0.9 redundancy gate (KeyFrameCulling's score,
        LocalMapping.cc:1177, used as a ranking here). KF0 and the newest
        keyframes are protected. Inertial systems override with the
        chain-aware variant (preintegration re-merge)."""
        count = 0
        live_order = np.where(np.asarray(self.state.kfs.valid))[0]
        protect = set(live_order[-8:].tolist()) | {0}
        for _ in range(n):
            valid = np.asarray(self.state.kfs.valid)
            eligible = valid.copy()
            for k in protect:
                if k < len(eligible):
                    eligible[k] = False
            if not eligible.any():
                break
            out = np.asarray(mapping.cull_candidate(
                self.state, jnp.asarray(eligible), min_seen=0))
            best = int(out[0])
            if out[1] < 0 or not eligible[best]:
                break
            self.state = mapping.drop_keyframe(
                self.state, jnp.asarray(best, jnp.int32))
            self._rebase_culled(valid)
            count += 1
        return count

    @staticmethod
    def _resolve_dead_parents(parent: np.ndarray,
                              live: np.ndarray) -> np.ndarray:
        """parent array with dead intermediate parents walked through
        (children of a culled KF reattach to its parent — the reference's
        spanning-tree reassignment in KeyFrame::SetBadFlag)."""
        out = parent.copy()
        for k in range(len(out)):
            p = out[k]
            hops = 0
            while p >= 0 and not live[p] and hops < len(out):
                p = parent[p]
                hops += 1
            out[k] = p if p >= 0 else -1
        return out

    @staticmethod
    def _nearest_live_parent(live: np.ndarray) -> np.ndarray:
        """parent_of[k] = nearest earlier live slot (slot order == insertion
        order == temporal order), the array-state stand-in for the
        reference's spanning-tree parent walk at save time."""
        parent = np.full(len(live), -1, np.int64)
        last = -1
        for k in range(len(live)):
            parent[k] = last
            if live[k]:
                last = k
        return parent

    def _on_keyframes_compacted(self, old2new: np.ndarray):
        """Subclass hook: remap any per-KF side arrays (inertial chain)."""

    def _lm_slots_available(self, n_new: int) -> int:
        """Landmark budget for a triangulation batch, compacting culled
        slots first when the array is full. Returns how many fit."""
        if self.n_lm + n_new <= self.cfg.max_lm:
            return n_new
        self._gba_flush()
        state, old2new, n_valid = ms.compact_landmarks(self.state, self.n_lm)
        if n_valid + n_new > self.cfg.max_lm:
            verbose.print_mess(
                f"landmark capacity: {n_valid} live of max_lm="
                f"{self.cfg.max_lm}; dropping "
                f"{n_new - max(self.cfg.max_lm - n_valid, 0)} new landmarks")
            if n_valid >= self.n_lm:   # compaction freed nothing
                return max(self.cfg.max_lm - self.n_lm, 0)
        self.state = state
        self.n_lm = n_valid
        o2n = jnp.asarray(old2new)
        b = self._last["bindings"]
        self._last["bindings"] = jnp.where(b >= 0, o2n[jnp.maximum(b, 0)], -1)
        self._on_landmarks_compacted(old2new)
        return min(n_new, self.cfg.max_lm - n_valid)

    def _on_landmarks_compacted(self, old2new: np.ndarray):
        """Subclass hook: remap any per-landmark side arrays."""

    def _ref_kf_matches(self) -> int:
        """Reference-KF tracked-point count (TrackedMapPoints(3) parity;
        see tracking.ref_kf_matches)."""
        n = int(tracking.ref_kf_matches(
            self.state.obs.kf, self.state.obs.valid,
            jnp.asarray(self.last_kf_id, jnp.int32),
            jnp.asarray(self.cfg.kf_ref_min_obs, jnp.int32)))
        return max(n, 1)

    # ------------------------------------------------------------------
    # Per-KF mapping work: fused async bundle. Visual systems run the
    # windowed local BA + culling INSIDE the bundle; inertial systems
    # (``_bundle_local_ba = False``) run LocalInertialBA + chain-aware
    # culling on the host right after (their schedule needs the temporal
    # chain), still with the triangulation/fusion machinery fused.
    # ------------------------------------------------------------------
    _bundle_local_ba = True

    def _create_keyframe(self, feats, track_res, stamp):
        """CreateNewKeyFrame (:4589) + the LocalMapping work for this KF.

        ONE device dispatch covers insert/triangulate/fuse(/windowed-BA/
        culling); its small outputs are read back LAZILY (at the next
        keyframe) so tracking keeps running while the device crunches —
        the array-state analog of the reference's Tracking ∥ LocalMapping
        threads with a lagging LoopClosing queue (System.cc:223-265).
        """
        # Settle the PREVIOUS keyframe's deferred work first (its bundle has
        # had a whole KF interval of device time to finish). The drain can
        # run a lagging loop-closing MERGE that fills the keyframe array
        # (atlas.merge transplants a whole map), so re-check capacity after
        # it — the _need_new_keyframe check predates the drain.
        self._drain_pending()
        if self.n_kf >= self.cfg.max_kf - 1 and not self._kf_slot_available():
            return
        kf_id = self.n_kf
        ba_kw = self._ba_kwargs()
        use_stereo = bool(ba_kw.get("use_stereo")) and self._ur is not None
        ur = (self._ur if self._ur is not None
              else jnp.full((self.cfg.n_features,), -1.0, jnp.float32))
        state, bindings, info, culled = mapping.keyframe_bundle(
            self.state, kf_id, track_res.R, track_res.t, stamp, feats, ur,
            track_res.bindings, self.cam_params, self.n_lm,
            float(self.cfg.width), float(self.cfg.height),
            use_stereo=use_stereo, bf=float(ba_kw.get("bf", 0.0)),
            n_neighbors=self.cfg.triangulation_neighbors,
            n_free=self.cfg.local_window + 1,
            n_window=self.cfg.ba_window,
            n_lm_window=self.cfg.ba_lm_window,
            do_kf_cull=(self._bundle_local_ba and self.n_kf >= 8),
            do_local_ba=self._bundle_local_ba)
        valid_before = np.asarray(self.state.kfs.valid)  # pre-bundle (host)
        self.state = state
        self.n_kf = kf_id + 1
        self.frames_since_kf = 0
        self.last_kf_id = kf_id
        self._last["bindings"] = bindings
        self._last["R"] = state.kfs.R[kf_id]
        self._last["t"] = state.kfs.t[kf_id]
        # Reference-KF pose cache: set from the pre-BA tracked pose now
        # (exact post-BA value lands when the pending info is drained).
        self._ref_cache = (kf_id, np.asarray(track_res.R),
                          np.asarray(track_res.t))
        if not self._bundle_local_ba:
            # Inertial refinement + culling (host-scheduled).
            with self._stage("lba"):
                self._local_refine(kf_id, None, None)
            with self._stage("mp_culling"):
                self.state = mapping.cull_landmarks(
                    self.state, jnp.asarray(kf_id, jnp.int32))
            with self._stage("kf_culling"):
                self._maybe_cull_keyframes(kf_id)
            self._last["R"] = self.state.kfs.R[kf_id]
            self._last["t"] = self.state.kfs.t[kf_id]
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(self.state, kf_id)  # no host sync
        self._pending_kf = dict(kf_id=kf_id, info=info, culled=culled,
                                valid_before=valid_before,
                                ref_gen=self._ref_cache_gen)
        # The hosting frame's trajectory record is this KF + identity
        # (consumed by _log_frame in the same track() call).
        self._kf_host_pending = True

    def _drain_pending(self):
        """Settle the deferred outputs of the last keyframe bundle: parent
        assignment, culled-KF trajectory rebase, landmark high-water mark,
        exact reference-pose cache — then run its (lagging) loop-closing
        detection, like the reference's queued LoopClosing thread."""
        pend = getattr(self, "_pending_kf", None)
        if pend is None:
            return
        self._pending_kf = None
        kf_id = pend["kf_id"]
        info_np = np.asarray(pend["info"])        # one consolidated sync
        parent, parent_cnt = int(info_np[0]), int(info_np[1])
        self.kf_parent[kf_id] = (
            parent if parent_cnt > 0 else
            (kf_id - 1 if kf_id > 0 else -1))
        self.n_lm = max(self.n_lm, int(info_np[2]))
        if (self.last_kf_id == kf_id
                and pend["ref_gen"] == self._ref_cache_gen):
            # Exact post-bundle pose — but ONLY if no VIBA/rebase/loop event
            # refreshed the cache since the bundle dispatch (the bundle-time
            # pose is pre-rebase and would mislabel frames until the next KF).
            self._ref_cache = (kf_id, info_np[3:12].reshape(3, 3).copy(),
                               info_np[12:15].copy())
        culled = np.asarray(pend["culled"])
        if culled.any():
            par = self.kf_parent
            par[:] = self._resolve_dead_parents(
                par, np.asarray(self.state.kfs.valid))
            if any(r >= 0 and culled[r] for r in self._traj.refs):
                # Dead poses are frozen once dead, so rebasing against the
                # CURRENT state stays exact even one keyframe later.
                self._traj.rebase(
                    culled,
                    self._nearest_live_parent(
                        np.asarray(self.state.kfs.valid)),
                    np.asarray(self.state.kfs.R),
                    np.asarray(self.state.kfs.t))
        self._run_loop_closing(kf_id)

    # ------------------------------------------------------------------
    # Background global BA (RunGlobalBundleAdjustment parity)
    # ------------------------------------------------------------------
    def _ensure_bg_gba(self):
        if self._bg_gba is None:
            from .background_gba import BackgroundGBA
            self._bg_gba = BackgroundGBA()
        return self._bg_gba

    def _gba_tick(self):
        """Advance the background solve by one bounded slice (called once
        per tracked frame); merge + re-coordinate when it completes."""
        g = self._bg_gba
        if g is None or not g.active:
            return
        with self._stage("global_ba"):
            if g.tick():
                self._merge_bg_gba()

    def _gba_flush(self):
        """Finish any in-flight background GBA inline (the save/shutdown
        paths wait for the detached GBA thread the same way)."""
        g = self._bg_gba
        if g is not None and g.flush():
            self._merge_bg_gba()

    def _gba_abort(self):
        """mbStopGBA: drop the in-flight solve (map reset / compaction /
        merge invalidated the snapshot's ids)."""
        if self._bg_gba is not None:
            self._bg_gba.abort()

    def _merge_bg_gba(self):
        self.state = self._bg_gba.merge(self.state, self.kf_parent)
        self._on_map_corrected(self.last_kf_id)

    def _on_map_corrected(self, kf_id: int):
        """Re-coordinate the live tracking context after a map correction
        (loop closure / GBA merge): the last frame follows its reference
        keyframe's correction, T' = T · Twc_ref_old · Tcw_ref_new (the
        reference recomputes frame poses from the stored relative pose the
        same way). Sets ``self._corr_Rw`` (world-frame rotation correction)
        for subclasses that carry world-frame state (body velocity)."""
        self._corr_Rw = None
        if self.last_kf_id != kf_id or self._last is None or kf_id < 0:
            return
        R_rn = np.asarray(self.state.kfs.R[kf_id])
        t_rn = np.asarray(self.state.kfs.t[kf_id])
        cache = self._ref_cache
        if cache is not None and cache[0] == kf_id:
            _, R_ro, t_ro = cache
            R_l = np.asarray(self._last["R"])
            t_l = np.asarray(self._last["t"])
            rel = R_l @ R_ro.T
            self._last["R"] = (rel @ R_rn).astype(np.float32)
            self._last["t"] = (rel @ (t_rn - t_ro) + t_l).astype(np.float32)
            # Old-world -> new-world rotation at this anchor.
            self._corr_Rw = (R_rn.T @ R_ro).astype(np.float32)
        else:
            self._last["R"] = R_rn
            self._last["t"] = t_rn
        self._vel = None
        self._refresh_ref_cache()

    def _run_loop_closing(self, kf_id: int):
        """Per-KF LoopClosing work (detection + correction + GBA)."""
        if (self.loop_closer is not None and self.cfg.use_loop_closing
                and self._loops_allowed()
                and bool(self.state.kfs.valid[kf_id])):
            with self._stage("loop_detect"):
                det = self.loop_closer.detect(self.state, kf_id, self.n_kf)
            if det is not None:
                cand, corr = det
                with self._stage("loop_correct"):
                    self.state = self.loop_closer.close(
                        self.state, kf_id, cand, corr, self.n_kf,
                        span_parent=self.kf_parent)
                    # Fuse the drifted duplicates with their loop-side
                    # originals (SearchAndFuse, LoopClosing.cc:2689).
                    self.state = mapping.fuse_duplicates(
                        self.state, jnp.asarray(kf_id, jnp.int32),
                        self.cam_params, float(self.cfg.width),
                        float(self.cfg.height))
                # Re-coordinate the live tracking context to the corrected
                # map (only if this is still the newest KF).
                self._on_map_corrected(kf_id)
                # Refine with global BA. Default: time-sliced in the
                # BACKGROUND against a snapshot (one LM iteration per
                # tracked frame) while tracking continues —
                # RunGlobalBundleAdjustment detached-thread parity
                # (LoopClosing.cc:2869; abort flag :1281-1307).
                if self.cfg.background_gba:
                    kw = self._ba_kwargs()
                    self._ensure_bg_gba().start(
                        self.state, self.n_kf, self.cam_params,
                        use_stereo=bool(kw.get("use_stereo")),
                        bf=float(kw.get("bf", 0.0)))
                else:
                    with self._stage("global_ba"):
                        self.state = mapping.global_ba(
                            self.state, self.cam_params, mesh=self.mesh,
                            **self._ba_kwargs())
                        if self.timers is not None:
                            jax.block_until_ready(self.state.kfs.R)
                    self._on_map_corrected(kf_id)
            elif len(self.atlas.maps) > 1:
                # Merge branch: common region in ANOTHER map
                # (LoopClosing::MergeLocal, :1590).
                mdet = self.loop_closer.detect_merge(self.state, kf_id,
                                                     self.atlas)
                if mdet is not None:
                    self._merge_maps(kf_id, *mdet)

    # ------------------------------------------------------------------
    # Atlas persistence (System::SaveAtlas/LoadAtlas, System.cc:1484,1535)
    # ------------------------------------------------------------------
    def save_atlas_checkpoint(self, path: str):
        from ..io import checkpoint
        self._drain_pending()
        self._gba_flush()
        checkpoint.save_atlas(path, self.atlas)

    def load_atlas_checkpoint(self, path: str):
        """Resume from a saved atlas: tracking starts in a FRESH map; the
        loaded maps are re-joined through relocalization or the merge-back
        path once their places are revisited (the reference relocalizes
        into the loaded atlas the same way, System.cc:179 + Tracking)."""
        from ..io import checkpoint
        self._gba_abort()
        # Existing frame records reference the outgoing state: freeze them.
        self._traj.freeze_all(np.asarray(self.state.kfs.R),
                              np.asarray(self.state.kfs.t))
        self._ref_cache = None
        self.atlas = checkpoint.load_atlas(path)
        if self.loop_closer is not None:
            self.loop_closer.dbs = {}
            for idx, (state, meta) in enumerate(
                    zip(self.atlas.maps, self.atlas.meta)):
                self.loop_closer.switch_map(idx)
                for k in range(meta.n_kf):
                    self.loop_closer.add_keyframe(state, k)
        self.atlas.create_new_map()
        if self.loop_closer is not None:
            self.loop_closer.switch_map(self.atlas.current)
        self.status = NOT_INITIALIZED
        self._init_feats = None
        self._init_stamp = None
        self._last = None
        self._vel = None
        self.last_kf_id = -1
        self.frames_since_kf = 0

    def _loops_allowed(self) -> bool:
        """Loop/merge detection gate. Inertial systems require the map to
        be past VIBA2 (LoopClosing.cc:407-430 inertial guard); pure visual
        has no extra condition."""
        return True

    def _merge_maps(self, kf_id: int, other_idx: int, cand: int, corr):
        """Weld the matched OLD map into the active one + refine
        (MergeLocal, /root/reference/src/LoopClosing.cc:1590: welding-window
        duplication + merge BA; here the weld is an array concat under the
        inverse Sim3 followed by a full-map BA — cheap once batched)."""
        # A running GBA snapshot predates the weld: abort (mbStopGBA on
        # merge, LoopClosing.cc:2292 region).
        self._gba_abort()
        R_m, t_m, s_m, _ = corr            # x_other = s R x_active + t
        # Invert: x_active = (1/s) R^T (x_other - t).
        R_i = np.asarray(R_m).T
        s_i = 1.0 / float(s_m)
        t_i = -s_i * (R_i @ np.asarray(t_m))
        kf_lo = self.n_kf
        self.atlas.merge(other_idx, R_i, t_i, s_i)
        kf_hi = self.n_kf
        # Attach the welded map's spanning-tree root to the matched KF so
        # the essential graph stays one tree across the weld.
        if kf_lo < kf_hi and self.kf_parent[kf_lo] < 0:
            self.kf_parent[kf_lo] = kf_id
        self.loop_closer.on_maps_merged(self.atlas.current, other_idx,
                                        self.state, kf_lo, kf_hi)
        # Frozen frame records of the merged-away session follow the weld
        # into active-world coordinates (multi-session SaveTrajectoryEuRoC:
        # the reference replays every session against the merged map).
        self._traj.transform_frozen(other_idx, R_i, t_i, s_i,
                                    self.atlas.current)
        # Duplicate fusion in the welding window (SearchAndFuse, :2689):
        # transplanted landmarks re-observed by the current KF replace/bind.
        self.state = mapping.fuse_duplicates(
            self.state, jnp.asarray(kf_id, jnp.int32), self.cam_params,
            float(self.cfg.width), float(self.cfg.height))
        # Merge refinement. Small atlases: full-map BA (exact). Large
        # multi-session atlases: the reference's WELDING-WINDOW local BA
        # (merge variant of LocalBundleAdjustment, src/Optimizer.cc:5195 —
        # free = current KF + its covisible group, which after fusion spans
        # both sides of the weld), O(window) instead of O(map). The
        # reference's follow-up OptimizeEssentialGraph (:5667) propagates
        # the correction to the rest of the OLD map; here atlas.merge
        # already rebased the whole transplanted map rigidly through the
        # welding Sim3, so no graph solve is needed for propagation.
        if self.n_kf <= 64:
            self.state = mapping.global_ba(self.state, self.cam_params,
                                           mesh=self.mesh,
                                           **self._ba_kwargs())
        else:
            self.state = mapping.windowed_local_ba(
                self.state, jnp.asarray(kf_id, jnp.int32), self.cam_params,
                n_free=max(self.cfg.local_window + 1, 12),
                n_window=self.cfg.ba_window,
                n_lm_window=self.cfg.ba_lm_window,
                **self._ba_kwargs())
        self._last["R"] = self.state.kfs.R[kf_id]
        self._last["t"] = self.state.kfs.t[kf_id]
        self._vel = None
        self._refresh_ref_cache()

    def _maybe_cull_keyframes(self, kf_id: int):
        """KeyFrameCulling hook (inertial systems skip it: culling a chain
        KF would require merging preintegrations, ImuTypes.cc:330)."""
        if self.n_kf >= 8:
            valid_before = np.asarray(self.state.kfs.valid)
            self.state = mapping.cull_keyframes(
                self.state, jnp.asarray(kf_id, jnp.int32))
            self._rebase_culled(valid_before)

    def _rebase_culled(self, valid_before: np.ndarray):
        """Move frame-trajectory records off freshly-culled KFs onto a
        surviving earlier KF (the reference walks the spanning tree at save
        time, Tracking.cc SaveTrajectoryEuRoC isBad loop; array slots get
        reused, so the walk happens eagerly at cull time)."""
        valid_after = np.asarray(self.state.kfs.valid)
        dead = valid_before & ~valid_after
        if not dead.any():
            return
        # Children of culled KFs reattach to their grandparent.
        par = self.kf_parent
        par[:] = self._resolve_dead_parents(par, valid_after)
        if not any(r >= 0 and dead[r] for r in self._traj.refs):
            return
        self._traj.rebase(dead, self._nearest_live_parent(valid_after),
                          np.asarray(self.state.kfs.R),
                          np.asarray(self.state.kfs.t))

    def _local_refine(self, kf_id: int, counts, order):
        """Local BA after a new KF: covisibility-windowed (free = this KF +
        best covisible neighbors, fixed = other observers;
        LocalBundleAdjustment dispatch, LocalMapping.cc:208). One jitted
        kernel with static window shapes — per-KF cost is O(window), not
        O(map). The inertial system overrides this with LocalInertialBA
        (:199)."""
        self.state = mapping.windowed_local_ba(
            self.state, jnp.asarray(kf_id, jnp.int32), self.cam_params,
            n_free=self.cfg.local_window + 1,
            n_window=self.cfg.ba_window,
            n_lm_window=self.cfg.ba_lm_window,
            **self._ba_kwargs())

    def _triangulate_with(self, kf_a: int, kf_b: int, feats, free_kp):
        kfs = self.state.kfs
        res = mapping.triangulate_pair(
            kfs.R[kf_a], kfs.t[kf_a], feats.xy, feats.level, feats.desc,
            free_kp,
            kfs.R[kf_b], kfs.t[kf_b], kfs.kp_xy[kf_b], kfs.kp_level[kf_b],
            kfs.kp_desc[kf_b], kfs.kp_valid[kf_b],
            self.cam_params)
        good = np.asarray(res.good)
        n_new = int(good.sum())
        if n_new == 0:
            return
        n_new = self._lm_slots_available(n_new)
        if n_new <= 0:
            return
        good_j = jnp.asarray(good)
        order = jnp.cumsum(good_j.astype(jnp.int32)) - 1
        slots = self.n_lm + order
        mask = good_j & (order < n_new)
        self.state = ms.add_landmarks(
            self.state, slots, res.pos, res.desc,
            kf_a, res.kp_a, kf_b, res.kp_b,
            mask, res.normal, res.min_dist, res.max_dist)
        self.n_lm += n_new

        # New landmarks also bind into the current frame context.
        lm_ids = jnp.where(mask, slots, -1)
        tgt = jnp.where(mask, res.kp_a, self.cfg.n_features)
        self._last["bindings"] = self._last["bindings"].at[tgt].set(
            lm_ids, mode="drop")

    # ------------------------------------------------------------------
    # Relocalization + map lifecycle (Relocalization :5087; Atlas flow)
    # ------------------------------------------------------------------
    def _relocalize(self, feats, stamp):
        if self.loop_closer is None:
            return None
        # Active map first — the reference restricts candidates to the
        # current map (DetectRelocalizationCandidates map filter,
        # /root/reference/src/KeyFrameDatabase.cc:926-928).
        hit = self._relocalize_in_map(feats, self.atlas.current)
        if hit is not None:
            res, _ = hit
            self._adopt_reloc(res, feats, stamp)
            return (res.R, res.t)
        # Cross-map extension: mine every OTHER Atlas map's database too
        # and SWITCH into the map that relocalizes — old maps become
        # re-enterable directly, without waiting for enough fresh mapping
        # to trigger the merge path (the reference can only rejoin old
        # maps through MergeLocal).
        if not self.cfg.cross_map_reloc:
            return None
        for m in range(len(self.atlas.maps) - 1, -1, -1):
            if m == self.atlas.current:
                continue
            hit = self._relocalize_in_map(feats, m)
            if hit is not None:
                res, cand = hit
                self._switch_to_map_for_reloc(m, cand)
                self._adopt_reloc(res, feats, stamp)
                self.n_cross_map_relocs += 1
                verbose.print_mess(
                    f"relocalized into atlas map {m} (KF {cand})")
                return (res.R, res.t)
        return None

    def _relocalize_in_map(self, feats, map_idx: int):
        """SearchByBoW candidate mining + MLPnP-equivalent RANSAC +
        local-map tracking against ONE atlas map (Tracking.cc:5111-5146).
        Returns (TrackResult, candidate_kf) or None — no state mutation."""
        from ..ops import matching, pnp
        db = self.loop_closer.dbs.get(map_idx)
        if db is None:
            return None
        state = self.atlas.maps[map_idx]
        # Covisibility-group accumulated candidate scoring, like loop
        # detection (DetectRelocalizationCandidates shares the group logic,
        # /root/reference/src/KeyFrameDatabase.cc:827).
        ids, scores, _ = db.query_groups(
            feats.desc, feats.valid, ms.covisibility_matrix(state),
            top_n=3)
        lms = state.lms
        for cand in ids:
            if cand < 0 or not bool(state.kfs.valid[cand]):
                continue
            seen, _ = ms.landmarks_seen_by(state, int(cand))
            mj, _ = matching.match(lms.desc, feats.desc, seen, feats.valid,
                                   max_dist=matching.TH_LOW, ratio=0.75)
            kp = jnp.maximum(mj, 0)
            self.rng_key, sub = jax.random.split(self.rng_key)
            pr = pnp.pnp_ransac(
                sub, lms.pos, feats.xy[kp],
                tracking.INV_SIGMA2[feats.level[kp]],
                (mj >= 0) & seen, self.cam_params)
            if bool(pr.ok) and int(pr.n_inliers) >= 10:
                R0, t0 = pr.R, pr.t
            else:
                # Fall back to the candidate KF's own pose.
                R0 = state.kfs.R[int(cand)]
                t0 = state.kfs.t[int(cand)]
            res = tracking.track_local_map(
                R0, t0,
                jnp.full((self.cfg.n_features,), -1, jnp.int32),
                lms.pos, lms.desc, lms.normal, lms.min_dist, lms.max_dist,
                lms.valid,
                feats.xy, feats.level, feats.desc, feats.valid,
                self.cam_params, self.cfg.width, self.cfg.height)
            if int(res.n_inliers) >= self.cfg.min_reloc_inliers:
                return res, int(cand)
        return None

    def _adopt_reloc(self, res, feats, stamp):
        self.status = OK
        self.lost_frames = 0
        self._vel = None
        self._last = dict(feats=feats, bindings=res.bindings,
                          R=res.R, t=res.t, stamp=stamp)

    def _switch_to_map_for_reloc(self, map_idx: int, cand: int):
        """Make ``map_idx`` the active map after a cross-map reloc hit.
        The outgoing map stays in the Atlas if mature (merge-back joins it
        later), or is reset in place if too young to keep — the same
        keep/reset split as _handle_lost (Tracking.cc:3349-3378)."""
        self._drain_pending()
        self._gba_abort()
        keep = self.n_kf >= 10
        # Frame records of the outgoing map must stop replaying against
        # the incoming map's keyframe slots.
        self._traj.freeze_all(np.asarray(self.state.kfs.R),
                              np.asarray(self.state.kfs.t),
                              map_tag=(self.atlas.current if keep else -1))
        if not keep:
            self.atlas.reset_active_map()
            if self.loop_closer is not None:
                self.loop_closer.reset_active()
        self.atlas.current = map_idx
        self.loop_closer.switch_map(map_idx, fresh=False)
        self.last_kf_id = cand
        self.frames_since_kf = 0
        self._init_feats = None
        self._init_stamp = None
        self._refresh_ref_cache()
        self._on_cross_map_reloc(cand)

    def _on_cross_map_reloc(self, cand: int):
        """Subclass hook (inertial systems restart their chain here)."""

    def _check_timestamp_jump(self, stamp: float) -> bool:
        """Timestamp discontinuity guard (Tracking.cc:2704-2765): a gap
        > 1 s or a backwards stamp while tracking resets the machinery —
        small map discarded, mature map kept in the Atlas. Returns True if
        a reset happened (the current frame is dropped, like the reference
        which returns after CreateMapInAtlas)."""
        if self._last is None or self.status == NOT_INITIALIZED:
            return False
        dt = stamp - self._last["stamp"]
        if -1e-6 <= dt <= 1.0:
            return False
        from ..utils import verbose
        verbose.print_mess(
            f"timestamp jump of {dt:.2f}s detected: "
            + ("starting new map" if self.n_kf >= 10 else "resetting map"))
        self._handle_lost(None, stamp)
        return True

    def _handle_lost(self, feats, stamp):
        """LOST: small map -> reset; mature map -> keep it, start a new one
        (Tracking.cc:3349-3378 + CreateMapInAtlas)."""
        self._drain_pending()
        self._gba_abort()      # the snapshot's map is going away
        # The active map's KF slots are about to be reused: replay its
        # frame records once and store them absolute. If the map survives
        # in the Atlas (mature-map branch), tag the records with its index
        # so a later merge-back re-coordinates them through the weld.
        keep_map = self.n_kf >= 10
        self._traj.freeze_all(np.asarray(self.state.kfs.R),
                              np.asarray(self.state.kfs.t),
                              map_tag=(self.atlas.current if keep_map
                                       else -1))
        self._ref_cache = None
        if self.n_kf < 10:
            self.atlas.reset_active_map()
            if self.loop_closer is not None:
                self.loop_closer.reset_active()
        else:
            self.atlas.create_new_map()
            if self.loop_closer is not None:
                self.loop_closer.switch_map(self.atlas.current)
        self.status = NOT_INITIALIZED
        self.lost_frames = 0
        self._init_feats = None
        self._init_stamp = None
        self._last = None
        self._vel = None
        self.last_kf_id = -1
        self.frames_since_kf = 0

    # ------------------------------------------------------------------
    # Chessboard world-frame init (fork feature; utils/chessboard.py)
    # ------------------------------------------------------------------
    def _snoop_chessboard(self, img):
        from ..utils import chessboard as cb

        corners = cb.detect_chessboard(np.asarray(img), self.cfg.chessboard)
        if corners is None:
            return
        K = np.array([[self.cfg.fx, 0, self.cfg.cx],
                      [0, self.cfg.fy, self.cfg.cy], [0, 0, 1.0]])
        pose = cb.pose_from_chessboard(corners, self.cfg.chessboard, K)
        if pose is not None:
            self._chess_pose = pose
            self._chess_frame_is_next_init = True

    def _apply_chessboard_rebase(self):
        from ..utils import chessboard as cb

        R_chess, t_chess = self._chess_pose
        # The chessboard pose was taken (approximately) at the first init
        # frame == keyframe 0 of this map.
        R_slam = np.asarray(self.state.kfs.R[0])
        t_slam = np.asarray(self.state.kfs.t[0])
        R_m, t_m = cb.rebase_transform(R_chess, t_chess, R_slam, t_slam)
        self.state = cb.rebase_map(self.state, R_m, t_m)
        # Tracking context must follow the rebase.
        if self._last is not None:
            R_l = np.asarray(self._last["R"]) @ R_m.T
            t_l = np.asarray(self._last["t"]) - R_l @ t_m
            self._last["R"] = jnp.asarray(R_l)
            self._last["t"] = jnp.asarray(t_l)
            self._vel = None
        self._refresh_ref_cache()
        self._chess_applied = True

    # ------------------------------------------------------------------
    def keyframe_trajectory(self):
        """(stamps, Rcw, tcw) arrays of live keyframes (absolute stamps)."""
        self._drain_pending()
        self._gba_flush()
        kfs = self.state.kfs
        valid = np.asarray(kfs.valid)
        return (np.asarray(kfs.stamp, np.float64)[valid] + self.t0,
                np.asarray(kfs.R)[valid], np.asarray(kfs.t)[valid])
