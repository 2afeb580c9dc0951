"""Loop closing: detection, Sim3 verification, correction, pose graph.

Replaces the core single-map loop path of ``LoopClosing``
(/root/reference/src/LoopClosing.cc): ``NewDetectCommonRegions`` (:383) BoW
candidate mining + geometric verification, ``CorrectLoop`` (:1273) Sim3
propagation + landmark correction + essential-graph optimization.
(Multi-map merge — MergeLocal — builds on the same pieces and lives at the
Atlas layer.)

Verification ladder parity (Appendix A): BoW matches >= 20, Sim3 RANSAC
inliers >= 20, projection matches >= 50 gate the acceptance; temporal
consistency requires `consecutive_needed` successive confirmations (the
reference uses 3, :475).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import map_state as ms
from ..ops import bow, lie, matching, sim3_solve
from ..solver import pose_graph
from .keyframe_db import KeyframeDatabase


@dataclasses.dataclass
class LoopCloserConfig:
    """Verification-ladder gates (DetectCommonRegionsFromBoW,
    /root/reference/src/LoopClosing.cc:738-742 defaults)."""
    min_bow_matches: int = 20      # nBoWMatches
    min_ransac_inliers: int = 15   # nBoWInliers (Sim3 RANSAC gate)
    min_sim3_inliers: int = 20     # nSim3Inliers (OptimizeSim3 inlier gate)
    min_proj_matches: int = 50     # nProjMatches (coarse guided projection)
    min_proj_opt_matches: int = 80  # nProjOptMatches (refined projection)
    consecutive_needed: int = 3    # temporal verifications (LoopClosing.cc:475)
    max_not_found: int = 2         # streak survives this many silent KFs (:497)
    n_covisibles: int = 10         # candidate window size (nNumCovisibles)
    min_kf_gap: int = 10          # don't match recent covisible KFs
    min_map_kfs: int = 12         # guard (LoopClosing.cc:407-430)
    cov_edge_threshold: int = 30  # essential-graph covisibility weight gate
                                  # (reference: 100; smaller synthetic maps)
    fix_scale: bool = False       # SE3 pose graph for stereo/inertial
    opt_rows: int = 512           # static row budget for OptimizeSim3


class LoopCloser:
    """Host-orchestrated loop closing over a MapState + KeyframeDatabase.

    Multi-map aware: one database per Atlas map (the reference's single
    KeyFrameDatabase spans maps via per-KF map pointers,
    KeyFrameDatabase.h:91; with array-state maps, one db per map keeps KF
    slot ids unambiguous). ``detect`` mines the ACTIVE map (loop path),
    ``detect_merge`` mines the other maps (LoopClosing merge branch,
    /root/reference/src/LoopClosing.cc:383 candidate-in-different-map)."""

    def __init__(self, voc: bow.Vocabulary, max_kf: int, n_feat: int,
                 cfg: LoopCloserConfig | None = None, cam_params=None):
        self.voc = voc
        self.dbs = {0: KeyframeDatabase(voc, max_kf, n_feat)}
        self.active = 0
        self.cfg = cfg or LoopCloserConfig()
        self.max_kf = max_kf
        self.n_feat = n_feat
        # Intrinsics for the guided-projection verification stages. Without
        # them the ladder stops after Sim3 RANSAC (tests / headless tools).
        self.cam_params = (jnp.asarray(cam_params, jnp.float32)
                           if cam_params is not None else None)
        # Temporal-consistency streaks (mnLoopNumCoincidences /
        # mnMergeNumCoincidences, LoopClosing.cc:445-497).
        self._streak = None        # dict(cand, count, miss, corr)
        self._merge_streak = None  # dict(map_idx, cand, count, miss, corr)
        # Persistent loop/merge edges per map (KeyFrame::AddLoopEdge,
        # /root/reference/include/KeyFrame.h:233-247): past closures stay
        # hard constraints in every later essential-graph solve. Entries
        # (i, j, (R, t, s) measurement M_ij at correction time).
        self.loop_edges: dict[int, list] = {0: []}

    @property
    def db(self) -> KeyframeDatabase:
        return self.dbs[self.active]

    # ------------------------------------------------------------------
    # Atlas lifecycle mirroring
    # ------------------------------------------------------------------
    def switch_map(self, map_idx: int, fresh: bool = True):
        """Active map changed (CreateMapInAtlas / multi-session boundary)."""
        self.active = map_idx
        self._streak = None
        self._merge_streak = None
        if fresh or map_idx not in self.dbs:
            self.dbs[map_idx] = KeyframeDatabase(self.voc, self.max_kf,
                                                 self.n_feat)
            self.loop_edges[map_idx] = []

    def reset_active(self):
        """Active map was reset in place (ResetActiveMap)."""
        self._streak = None
        self._merge_streak = None
        self.dbs[self.active] = KeyframeDatabase(self.voc, self.max_kf,
                                                 self.n_feat)
        self.loop_edges[self.active] = []

    def remap_keyframes(self, old2new, n_valid: int):
        """Keyframe-slot compaction: remap the database AND the persistent
        loop edges (edges with a dead endpoint die with it)."""
        self.db.remap(old2new, n_valid)
        edges = []
        for i, j, m in self.loop_edges.get(self.active, []):
            ni, nj = int(old2new[i]), int(old2new[j])
            if ni >= 0 and nj >= 0:
                edges.append((ni, nj, m))
        self.loop_edges[self.active] = edges

    def on_maps_merged(self, kept_idx: int, removed_idx: int,
                       state: ms.MapState, kf_lo: int, kf_hi: int):
        """Map ``removed_idx`` was welded into ``kept_idx``; transplanted
        keyframes occupy slots [kf_lo, kf_hi) of the merged state (other-map
        KF k -> kf_lo + k, Atlas.merge). Indices above removed_idx shift
        down by one (Atlas.merge deletes the map); ``kept_idx`` is the
        Atlas's post-deletion current index."""
        moved_edges = [
            (i + kf_lo, j + kf_lo, m)
            for i, j, m in self.loop_edges.get(removed_idx, [])
            if i + kf_lo < kf_hi and j + kf_lo < kf_hi]
        self.dbs.pop(removed_idx, None)
        self.loop_edges.pop(removed_idx, None)
        self.dbs = {(i - 1 if i > removed_idx else i): d
                    for i, d in self.dbs.items()}
        self.loop_edges = {(i - 1 if i > removed_idx else i): e
                           for i, e in self.loop_edges.items()}
        self.active = kept_idx
        self.loop_edges.setdefault(self.active, []).extend(moved_edges)
        db = self.dbs[self.active]
        for k in range(kf_lo, kf_hi):
            db.add(k, state.kfs.kp_desc[k], state.kfs.kp_valid[k])

    # ------------------------------------------------------------------
    def add_keyframe(self, state: ms.MapState, kf_id: int):
        kfs = state.kfs
        self.db.add(kf_id, kfs.kp_desc[kf_id], kfs.kp_valid[kf_id])

    # ------------------------------------------------------------------
    def detect(self, state: ms.MapState, kf_id: int, n_kf: int):
        """Mine + geometrically verify + temporally confirm a loop.

        Returns (candidate_kf_id, (R, t, s, n_inliers)) once
        ``consecutive_needed`` successive keyframes have verified the same
        place (LoopClosing.cc:445-497); None otherwise.
        """
        hit = self._detect_geometric(state, kf_id, n_kf)
        if hit is None:
            # Streak tolerance: the reference lets up to 2 keyframes fail
            # before dropping the accumulated coincidences (:497).
            if self._streak is not None:
                self._streak["miss"] += 1
                if self._streak["miss"] > self.cfg.max_not_found:
                    self._streak = None
            return None
        cand, corr = hit
        st = self._streak
        if st is not None and self._same_place(state, st["cand"], cand):
            count = st["count"] + 1
        else:
            count = 1
        self._streak = dict(cand=cand, count=count, miss=0, corr=corr)
        if count >= self.cfg.consecutive_needed:
            self._streak = None
            return cand, corr
        return None

    def _same_place(self, state: ms.MapState, prev_cand: int,
                    cand: int) -> bool:
        """Two candidate KFs describe the same place iff the new candidate
        lies in the previous candidate's covisible window (the reference's
        spKFsCurrentCovisibles membership check, LoopClosing.cc:463-472).
        Slot-id proximity is deliberately NOT used: ids are temporal, not
        spatial, and after merges adjacent slots may span sessions."""
        if prev_cand == cand:
            return True
        counts = np.asarray(ms.covisibility_counts(state, prev_cand,
                                                   self.max_kf))
        return counts[cand] > 0

    def _detect_geometric(self, state: ms.MapState, kf_id: int, n_kf: int):
        """One keyframe's candidate mining + geometric verification ladder."""
        if n_kf < self.cfg.min_map_kfs:
            return None
        counts = np.asarray(ms.covisibility_counts(state, kf_id, self.max_kf))
        exclude = np.zeros(self.max_kf, bool)
        exclude[counts > 0] = True
        lo = max(0, kf_id - self.cfg.min_kf_gap)
        exclude[lo:] = True                    # recent KFs
        # Covisibility-group accumulated scoring + 0.8x common-words gate
        # (DetectNBestCandidates, KeyFrameDatabase.cc:649-760).
        covis = ms.covisibility_matrix(state)
        ids, scores, words_q = self.db.query_groups(
            state.kfs.kp_desc[kf_id], state.kfs.kp_valid[kf_id], covis,
            exclude=exclude, top_n=3, n_covisibles=self.cfg.n_covisibles)
        for cand, score in zip(ids, scores):
            if cand < 0 or not bool(state.kfs.valid[cand]):
                continue
            m = self._verify(state, kf_id, state, int(cand), self.db,
                             words_q)
            if m is not None:
                return int(cand), m
        return None

    # ------------------------------------------------------------------
    def detect_merge(self, state: ms.MapState, kf_id: int, atlas):
        """Mine the NON-active maps for a common region (the merge branch of
        NewDetectCommonRegions), with the same temporal-consistency streak
        as the loop branch (mnMergeNumCoincidences). Returns
        (other_map_idx, candidate_kf, (R, t, s, n_inl) with
        x_other = s R x_active + t) or None."""
        hit = self._detect_merge_geometric(state, kf_id, atlas)
        if hit is None:
            if self._merge_streak is not None:
                self._merge_streak["miss"] += 1
                if self._merge_streak["miss"] > self.cfg.max_not_found:
                    self._merge_streak = None
            return None
        idx, cand, corr = hit
        st = self._merge_streak
        if (st is not None and st["map_idx"] == idx
                and self._same_place(atlas.maps[idx], st["cand"], cand)):
            count = st["count"] + 1
        else:
            count = 1
        self._merge_streak = dict(map_idx=idx, cand=cand, count=count,
                                  miss=0, corr=corr)
        if count >= self.cfg.consecutive_needed:
            self._merge_streak = None
            return idx, cand, corr
        return None

    def _detect_merge_geometric(self, state: ms.MapState, kf_id: int, atlas):
        kfs = state.kfs
        for idx, db in sorted(self.dbs.items()):
            if idx == self.active or idx >= len(atlas.maps):
                continue
            if atlas.meta[idx].n_kf < 3:
                continue
            other = atlas.maps[idx]
            ids, scores, words_q = db.query_groups(
                kfs.kp_desc[kf_id], kfs.kp_valid[kf_id],
                ms.covisibility_matrix(other), top_n=3,
                n_covisibles=self.cfg.n_covisibles)
            for cand in ids:
                if cand < 0 or not bool(other.kfs.valid[cand]):
                    continue
                m = self._verify(state, kf_id, other, int(cand), db, words_q)
                if m is not None:
                    if self.cfg.fix_scale and not (0.9 <= m[2] <= 1.1):
                        # Inertial merge scale sanity (LoopClosing.cc:168).
                        continue
                    return idx, int(cand), m
        return None

    # ------------------------------------------------------------------
    def _verify(self, state_q: ms.MapState, q: int, state_c: ms.MapState,
                c: int, db_c: KeyframeDatabase, words_q):
        """Full geometric-verification ladder of one candidate
        (DetectCommonRegionsFromBoW, /root/reference/src/LoopClosing.cc:733):

          1. BoW matches >= min_bow_matches (20)
          2. Sim3 RANSAC inliers >= min_ransac_inliers (15)
          3. guided projection of the candidate window's landmarks
             (radius 8 x scale, desc <= 1.5*TH_LOW) >= min_proj_matches (50)
          4. OptimizeSim3 (Optimizer.cc:4195, th2=10) inliers
             >= min_sim3_inliers (20)
          5. tighter re-projection with the refined Sim3 (radius 5 x scale,
             desc <= TH_LOW) >= min_proj_opt_matches (80)

        Returns the Sim3 correction (R, t, s, n) mapping query world ->
        candidate world, or None. Stages 3-5 need intrinsics; without
        ``cam_params`` the ladder stops after stage 2 (headless tools).
        state_q/state_c may be the same map (loop) or different (merge)."""
        pm = db_c.word_pair_mask(words_q, c)
        mj, dist = matching.match(
            state_q.kfs.kp_desc[q], state_c.kfs.kp_desc[c],
            state_q.kfs.kp_valid[q], state_c.kfs.kp_valid[c],
            pair_mask=pm, max_dist=matching.TH_LOW, ratio=0.75, mutual=True)
        mj_np = np.asarray(mj)
        if (mj_np >= 0).sum() < self.cfg.min_bow_matches:
            return None

        # Landmark positions bound to the matched keypoints on both sides.
        seen_q, kp_q = ms.landmarks_seen_by(state_q, q)
        seen_c, kp_c = ms.landmarks_seen_by(state_c, c)
        # kp -> lm maps.
        lm_of_kp_q = np.full(self.n_feat, -1, np.int64)
        lm_of_kp_c = np.full(self.n_feat, -1, np.int64)
        sq = np.asarray(seen_q)
        sc = np.asarray(seen_c)
        lm_of_kp_q[np.asarray(kp_q)[sq]] = np.where(sq)[0]
        lm_of_kp_c[np.asarray(kp_c)[sc]] = np.where(sc)[0]

        pairs = []
        for i in np.where(mj_np >= 0)[0]:
            lq = lm_of_kp_q[i]
            lc = lm_of_kp_c[mj_np[i]]
            if lq >= 0 and lc >= 0:
                pairs.append((lq, lc))
        if len(pairs) < self.cfg.min_ransac_inliers:
            return None
        pairs = np.asarray(pairs)
        pa = np.asarray(state_q.lms.pos)[pairs[:, 0]]   # query-side (drifted)
        pb = np.asarray(state_c.lms.pos)[pairs[:, 1]]   # candidate-side
        res = sim3_solve.sim3_ransac(
            jax.random.PRNGKey(q), jnp.asarray(pa), jnp.asarray(pb),
            jnp.ones(len(pairs), bool), th=0.1,
            with_scale=not self.cfg.fix_scale,
            min_inliers=self.cfg.min_ransac_inliers)
        if not bool(res.ok):
            return None
        if self.cam_params is None:
            return (np.asarray(res.R), np.asarray(res.t), float(res.s),
                    int(res.n_inliers))
        return self._verify_projective(state_q, q, state_c, c,
                                       lm_of_kp_q, res)

    # ------------------------------------------------------------------
    def _window_landmark_mask(self, state_c: ms.MapState, c: int):
        """Landmarks observed by the candidate window = candidate + its best
        ``n_covisibles`` covisible keyframes (GetBestCovisibilityKeyFrames,
        LoopClosing.cc:925-947). Returns a (max_lm,) bool mask."""
        counts = np.asarray(ms.covisibility_counts(state_c, c, self.max_kf))
        order = np.argsort(-counts)[:self.cfg.n_covisibles]
        in_window = np.zeros(self.max_kf + 1, bool)
        in_window[c] = True
        in_window[order[counts[order] > 0]] = True
        obs_kf = np.asarray(state_c.obs.kf)
        obs_valid = np.asarray(state_c.obs.valid)
        hit = in_window[np.where(obs_valid, obs_kf, self.max_kf)]
        return jnp.asarray(hit.any(-1)) & state_c.lms.valid

    def _guided_projection(self, state_q, q, state_c, c, win_mask,
                           R_u, t_u, s_u, radius_factor, max_dist):
        """SearchByProjection with a world-to-world Sim3 (ORBmatcher.cc
        SearchByProjection(KF, Scw, points, ...)): move the candidate
        window's landmarks into the query world through U = (R_u, t_u, s_u)
        (x_q = s R x_c + t) and match them against the query KF keypoints."""
        kfs_q = state_q.kfs
        lms_c = state_c.lms
        pos_q = s_u * lms_c.pos @ R_u.T + t_u
        R_qw = kfs_q.R[q]
        t_qw = kfs_q.t[q]
        cam_center = -R_qw.T @ t_qw
        dist = jnp.linalg.norm(pos_q - cam_center, axis=-1)
        pred_level = matching.predict_scale_level(dist, lms_c.max_dist * s_u)
        pc = pos_q @ R_qw.T + t_qw
        z = jnp.maximum(pc[:, 2], 1e-6)
        uv = jnp.stack([
            self.cam_params[0] * pc[:, 0] / z + self.cam_params[2],
            self.cam_params[1] * pc[:, 1] / z + self.cam_params[3]], -1)
        in_front = pc[:, 2] > 0.01
        radius = radius_factor * 1.2 ** pred_level.astype(jnp.float32)
        mj, _ = matching.search_by_projection(
            uv, pred_level, lms_c.desc, win_mask & in_front,
            kfs_q.kp_xy[q], kfs_q.kp_level[q], kfs_q.kp_desc[q],
            kfs_q.kp_valid[q], radius, max_dist=max_dist, ratio=None,
            level_window=(-1, 1))
        return mj

    def _verify_projective(self, state_q, q, state_c, c, lm_of_kp_q, res):
        """Ladder stages 3-5 (see _verify)."""
        # U maps candidate world -> query world; RANSAC gave query -> cand.
        R_v = jnp.asarray(res.R)
        t_v = jnp.asarray(res.t)
        s_v = jnp.asarray(res.s)
        from ..ops import lie
        R_u, t_u, s_u = lie.sim3_inv(R_v, t_v, s_v)
        win_mask = self._window_landmark_mask(state_c, c)

        # Stage 3: coarse guided projection (th=8, desc 1.5x).
        mj = self._guided_projection(
            state_q, q, state_c, c, win_mask, R_u, t_u, s_u,
            radius_factor=8.0, max_dist=int(matching.TH_LOW * 1.5))
        mj_np = np.asarray(mj)
        rows = np.where(mj_np >= 0)[0]
        if len(rows) < self.cfg.min_proj_matches:
            return None

        # Stage 4: nonlinear Sim3 refinement on the projection matches.
        M = self.cfg.opt_rows
        rows = rows[:M]
        pad = M - len(rows)
        lm_c = np.pad(rows, (0, pad))
        kp_q = np.pad(mj_np[rows], (0, pad))
        valid_a = np.arange(M) < len(rows)
        kfs_q = state_q.kfs
        from .tracking import INV_SIGMA2
        lvl_q = np.asarray(kfs_q.kp_level[q])[kp_q]
        # Direction B rows: matched query kp with a bound query landmark AND
        # candidate landmark observed by the candidate KF itself.
        lm_q = lm_of_kp_q[kp_q]
        seen_c, kp_of_c = ms.landmarks_seen_by(state_c, c)
        seen_c = np.asarray(seen_c)
        kp_of_c = np.asarray(kp_of_c)
        valid_b = valid_a & (lm_q >= 0) & seen_c[lm_c]
        kp_c_rows = np.where(valid_b, kp_of_c[lm_c], 0)
        lvl_c = np.asarray(state_c.kfs.kp_level[c])[kp_c_rows]
        opt = sim3_solve.optimize_sim3(
            R_u, t_u, s_u,
            state_c.lms.pos[jnp.asarray(lm_c)],
            kfs_q.kp_xy[q][jnp.asarray(kp_q)],
            INV_SIGMA2[jnp.asarray(lvl_q)], jnp.asarray(valid_a),
            kfs_q.R[q], kfs_q.t[q],
            state_q.lms.pos[jnp.asarray(np.maximum(lm_q, 0))],
            state_c.kfs.kp_xy[c][jnp.asarray(kp_c_rows)],
            INV_SIGMA2[jnp.asarray(lvl_c)], jnp.asarray(valid_b),
            state_c.kfs.R[c], state_c.kfs.t[c],
            self.cam_params, fix_scale=self.cfg.fix_scale)
        if int(opt.n_inliers) < self.cfg.min_sim3_inliers:
            return None

        # Stage 5: tighter re-projection with the refined Sim3 (th=5, 1.0x).
        mj2 = self._guided_projection(
            state_q, q, state_c, c, win_mask, opt.R, opt.t, opt.s,
            radius_factor=5.0, max_dist=matching.TH_LOW)
        n_final = int((np.asarray(mj2) >= 0).sum())
        if n_final < self.cfg.min_proj_opt_matches:
            return None

        # Return the query -> candidate convention used by close()/merge.
        R_f, t_f, s_f = lie.sim3_inv(opt.R, opt.t, opt.s)
        return (np.asarray(R_f), np.asarray(t_f), float(s_f), n_final)

    # ------------------------------------------------------------------
    def _posegraph_dof(self) -> int:
        """Pose-graph parameterization for loop correction: Sim3 for
        monocular (drift has 7 DoF), SE3 for stereo/RGB-D, and 4DoF
        (yaw + translation) once the IMU is initialized — gravity pins
        roll/pitch (Optimizer::OptimizeEssentialGraph4DoF selection,
        /root/reference/src/Optimizer.cc:4852 via LoopClosing.cc:1371)."""
        if getattr(self, "inertial_4dof", False):
            return pose_graph.DOF_4
        return (pose_graph.DOF_SE3 if self.cfg.fix_scale
                else pose_graph.DOF_SIM3)

    # ------------------------------------------------------------------
    def close(self, state: ms.MapState, kf_id: int, cand: int, correction,
              n_kf: int, span_parent=None) -> ms.MapState:
        """Correct the loop: essential-graph pose optimization.

        correction: (R_m, t_m, s_m) with x_loop = s R x_drift + t — the
        world-frame Sim3 aligning the query's neighbourhood onto the loop.

        Essential-graph structure parity (OptimizeEssentialGraph,
        /root/reference/src/Optimizer.cc:4509-4700):
          * spanning-tree edges (``span_parent``; temporal chain fallback),
          * covisibility edges with weight >= threshold over ALL KF pairs
            (one covisibility-matrix matmul),
          * persistent loop/merge edges from every PAST closure
            (KeyFrame::AddLoopEdge equivalents, stored per map),
          * the new loop edge (weight 5).
        Initial estimates: the corrected Sim3 is propagated through the
        current KF's covisible group before the solve (CorrectLoop
        :1306-1420 — S_k' = S_k ∘ M⁻¹ for the whole group); measurements
        are built from the NON-corrected poses.
        """
        R_m, t_m, s_m, _ = correction
        kfs = state.kfs

        # Corrected query pose: x_cam = R_q x_drift + t_q and
        # x_drift = (1/s) R_m^T (x_loop - t_m) =>
        # S_q' = S_q * M^{-1} in Sim3.
        Mi = (jnp.asarray(R_m), jnp.asarray(t_m), jnp.asarray(s_m, jnp.float32))
        M_inv = pose_graph.sim3_tuple_inv(Mi)
        Sq = (kfs.R[kf_id], kfs.t[kf_id], jnp.asarray(1.0))
        Sq_corr = pose_graph.sim3_tuple_mul(Sq, M_inv)

        # ---- Edge set over the FULL covisibility graph. ----
        C = np.asarray(ms.covisibility_matrix(state))
        valid_np = np.asarray(kfs.valid)
        pairs = set()
        cur_ei, cur_ej, cur_w = [], [], []          # measured from poses

        def add_cur(i, j, w):
            key = (min(i, j), max(i, j))
            if i == j or key in pairs:
                return
            if not (valid_np[i] and valid_np[j]):
                return
            pairs.add(key)
            cur_ei.append(i)
            cur_ej.append(j)
            cur_w.append(w)

        # 1. Spanning tree (mirrors KeyFrame::GetParent chains; the
        #    temporal chain is the fallback when the caller keeps none).
        if span_parent is not None:
            for k in range(n_kf):
                p = int(span_parent[k])
                if p >= 0:
                    add_cur(k, p, 1.0)
        else:
            for k in range(1, n_kf):
                add_cur(k, k - 1, 1.0)
        # 2. Covisibility edges (weight >= threshold) over all pairs.
        iu, ju = np.nonzero(np.triu(C, 1) >= self.cfg.cov_edge_threshold)
        for i, j in zip(iu.tolist(), ju.tolist()):
            if i < n_kf and j < n_kf:
                add_cur(i, j, 1.0)

        ei = np.asarray(cur_ei, np.int32)
        ej = np.asarray(cur_ej, np.int32)
        ei_j = jnp.asarray(ei)
        ej_j = jnp.asarray(ej)
        ones = jnp.ones(len(ei))
        mR_b, mt_b, ms_b = jax.vmap(pose_graph.relative_sim3)(
            kfs.R[ei_j], kfs.t[ei_j], ones, kfs.R[ej_j], kfs.t[ej_j], ones)
        w_b = np.asarray(cur_w, np.float32)

        # 3. Persistent loop edges from past closures (stored measurements).
        stored = [e for e in self.loop_edges.get(self.active, [])
                  if e[0] < n_kf and e[1] < n_kf
                  and valid_np[e[0]] and valid_np[e[1]]]
        # 4. The new loop edge: measurement = S_q_corrected * S_c^{-1}.
        Sc = (kfs.R[cand], kfs.t[cand], jnp.asarray(1.0))
        Mrel = pose_graph.sim3_tuple_mul(Sq_corr,
                                         pose_graph.sim3_tuple_inv(Sc))
        ei = np.concatenate([ei, [e[0] for e in stored], [kf_id]]).astype(
            np.int32)
        ej = np.concatenate([ej, [e[1] for e in stored], [cand]]).astype(
            np.int32)
        mR = jnp.concatenate(
            [mR_b] + [jnp.asarray(e[2][0])[None] for e in stored]
            + [Mrel[0][None]])
        mt = jnp.concatenate(
            [mt_b] + [jnp.asarray(e[2][1])[None] for e in stored]
            + [Mrel[1][None]])
        ms_w = jnp.concatenate(
            [ms_b] + [jnp.asarray(e[2][2], jnp.float32)[None]
                      for e in stored]
            + [Mrel[2][None]])
        w = jnp.concatenate([jnp.asarray(w_b),
                             jnp.full(len(stored) + 1, 5.0)])

        # Pad the edge list to a bucket so closures reuse the compiled
        # pose-graph kernel instead of recompiling per edge count.
        E = len(ei)
        E_pad = ((E + 127) // 128) * 128
        pad = E_pad - E
        if pad:
            ei = np.concatenate([ei, np.zeros(pad, np.int32)])
            ej = np.concatenate([ej, np.zeros(pad, np.int32)])
            eyeR = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                    (pad, 3, 3))
            mR = jnp.concatenate([mR, eyeR])
            mt = jnp.concatenate([mt, jnp.zeros((pad, 3), jnp.float32)])
            ms_w = jnp.concatenate([ms_w, jnp.ones(pad, jnp.float32)])
            w = jnp.concatenate([w, jnp.zeros(pad, jnp.float32)])

        fixed = np.zeros(self.max_kf, bool)
        fixed[cand] = True
        fixed[0] = True

        # ---- Initial estimates: propagate the correction through the
        # current covisible group (S_k' = S_k ∘ M⁻¹). ----
        group = np.zeros(self.max_kf, bool)
        group[kf_id] = True
        group[C[kf_id] > 0] = True
        group &= valid_np
        group[cand] = False
        group[0] = False
        g = jnp.asarray(group)
        R0g, t0g, s0g = lie.sim3_mul(
            kfs.R, kfs.t, jnp.ones(self.max_kf),
            jnp.broadcast_to(M_inv[0], kfs.R.shape),
            jnp.broadcast_to(M_inv[1], kfs.t.shape),
            jnp.broadcast_to(M_inv[2], (self.max_kf,)))
        R0 = jnp.where(g[:, None, None], R0g, kfs.R)
        t0 = jnp.where(g[:, None], t0g, kfs.t)
        s0 = jnp.where(g, s0g, jnp.ones(self.max_kf))

        dof = self._posegraph_dof()
        res = pose_graph.optimize_pose_graph(
            R0, t0, s0,
            jnp.asarray(ei), jnp.asarray(ej),
            mR, mt, ms_w.astype(jnp.float32), w.astype(jnp.float32),
            jnp.asarray(fixed), dof, n_iters=25,
            # 4-DoF frees yaw about WORLD z (gravity), which needs the
            # world-frame (right) perturbation convention.
            right_perturb=(dof == pose_graph.DOF_4))

        # Persist the verified loop constraint for future closures.
        self.loop_edges.setdefault(self.active, []).append(
            (int(kf_id), int(cand),
             (np.asarray(Mrel[0]), np.asarray(Mrel[1]), float(Mrel[2]))))

        # Correct landmarks through their first-observer keyframe:
        # p' = S_k'^{-1} (S_k_old (p)) (CorrectLoop :1350-1420 semantics).
        first_kf = jnp.maximum(state.lms.first_kf, 0)
        R_old = kfs.R[first_kf]
        t_old = kfs.t[first_kf]
        p_cam = jnp.einsum("lij,lj->li", R_old,
                           state.lms.pos) + t_old      # into old cam frame
        R_new = res.R[first_kf]
        t_new = res.t[first_kf]
        s_new = res.s[first_kf]
        # Invert new Sim3: x_w = (1/s) R^T (x_cam - t).
        pos_new = jnp.einsum("lji,lj->li", R_new,
                             p_cam - t_new) / s_new[:, None]
        pos_new = jnp.where(state.lms.valid[:, None], pos_new, state.lms.pos)

        # Write back: poses (fold scale into translation: Tcw = [R, t/s]).
        kfs = kfs._replace(
            R=res.R, t=res.t / res.s[:, None])
        lms = state.lms._replace(pos=pos_new)
        return state._replace(kfs=kfs, lms=lms)
