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
from ..ops import bow, matching, sim3_solve
from ..solver import pose_graph
from .keyframe_db import KeyframeDatabase


@dataclasses.dataclass
class LoopCloserConfig:
    min_bow_matches: int = 20
    min_sim3_inliers: int = 20
    min_proj_matches: int = 50
    consecutive_needed: int = 1   # reference: 3 temporal verifications
    min_kf_gap: int = 10          # don't match recent covisible KFs
    min_map_kfs: int = 12         # guard (LoopClosing.cc:407-430)
    cov_edge_threshold: int = 30  # essential-graph covisibility weight gate
                                  # (reference: 100; smaller synthetic maps)
    fix_scale: bool = False       # SE3 pose graph for stereo/inertial


class LoopCloser:
    """Host-orchestrated loop closing over a MapState + KeyframeDatabase.

    Multi-map aware: one database per Atlas map (the reference's single
    KeyFrameDatabase spans maps via per-KF map pointers,
    KeyFrameDatabase.h:91; with array-state maps, one db per map keeps KF
    slot ids unambiguous). ``detect`` mines the ACTIVE map (loop path),
    ``detect_merge`` mines the other maps (LoopClosing merge branch,
    /root/reference/src/LoopClosing.cc:383 candidate-in-different-map)."""

    def __init__(self, voc: bow.Vocabulary, max_kf: int, n_feat: int,
                 cfg: LoopCloserConfig | None = None):
        self.voc = voc
        self.dbs = {0: KeyframeDatabase(voc, max_kf, n_feat)}
        self.active = 0
        self.cfg = cfg or LoopCloserConfig()
        self.max_kf = max_kf
        self.n_feat = n_feat

    @property
    def db(self) -> KeyframeDatabase:
        return self.dbs[self.active]

    # ------------------------------------------------------------------
    # Atlas lifecycle mirroring
    # ------------------------------------------------------------------
    def switch_map(self, map_idx: int, fresh: bool = True):
        """Active map changed (CreateMapInAtlas / multi-session boundary)."""
        self.active = map_idx
        if fresh or map_idx not in self.dbs:
            self.dbs[map_idx] = KeyframeDatabase(self.voc, self.max_kf,
                                                 self.n_feat)

    def reset_active(self):
        """Active map was reset in place (ResetActiveMap)."""
        self.dbs[self.active] = KeyframeDatabase(self.voc, self.max_kf,
                                                 self.n_feat)

    def on_maps_merged(self, kept_idx: int, removed_idx: int,
                       state: ms.MapState, kf_lo: int, kf_hi: int):
        """Map ``removed_idx`` was welded into ``kept_idx``; transplanted
        keyframes occupy slots [kf_lo, kf_hi) of the merged state. Indices
        above removed_idx shift down by one (Atlas.merge deletes the map);
        ``kept_idx`` is the Atlas's post-deletion current index."""
        self.dbs.pop(removed_idx, None)
        self.dbs = {(i - 1 if i > removed_idx else i): d
                    for i, d in self.dbs.items()}
        self.active = kept_idx
        db = self.dbs[self.active]
        for k in range(kf_lo, kf_hi):
            db.add(k, state.kfs.kp_desc[k], state.kfs.kp_valid[k])

    # ------------------------------------------------------------------
    def add_keyframe(self, state: ms.MapState, kf_id: int):
        kfs = state.kfs
        self.db.add(kf_id, kfs.kp_desc[kf_id], kfs.kp_valid[kf_id])

    # ------------------------------------------------------------------
    def detect(self, state: ms.MapState, kf_id: int, n_kf: int):
        """Return (candidate_kf_id, matches) or None.

        matches: (N,) index into candidate's keypoints per query keypoint.
        """
        if n_kf < self.cfg.min_map_kfs:
            return None
        counts = np.asarray(ms.covisibility_counts(state, kf_id, self.max_kf))
        exclude = np.zeros(self.max_kf, bool)
        exclude[counts > 0] = True
        lo = max(0, kf_id - self.cfg.min_kf_gap)
        exclude[lo:] = True                    # recent KFs
        ids, scores, words_q = self.db.query(
            state.kfs.kp_desc[kf_id], state.kfs.kp_valid[kf_id],
            exclude=exclude, top_n=3)
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
        NewDetectCommonRegions). Returns (other_map_idx, candidate_kf,
        (R, t, s, n_inl) with x_other = s R x_active + t) or None."""
        kfs = state.kfs
        for idx, db in sorted(self.dbs.items()):
            if idx == self.active or idx >= len(atlas.maps):
                continue
            if atlas.meta[idx].n_kf < 3:
                continue
            other = atlas.maps[idx]
            ids, scores, words_q = db.query(
                kfs.kp_desc[kf_id], kfs.kp_valid[kf_id], top_n=3)
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
        """BoW matching + Sim3 RANSAC + projection count. Returns the Sim3
        correction (R, t, s mapping query world -> candidate world) or None.
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
        if len(pairs) < self.cfg.min_sim3_inliers:
            return None
        pairs = np.asarray(pairs)
        pa = np.asarray(state_q.lms.pos)[pairs[:, 0]]   # query-side (drifted)
        pb = np.asarray(state_c.lms.pos)[pairs[:, 1]]   # candidate-side
        res = sim3_solve.sim3_ransac(
            jax.random.PRNGKey(q), jnp.asarray(pa), jnp.asarray(pb),
            jnp.ones(len(pairs), bool), th=0.1,
            with_scale=not self.cfg.fix_scale,
            min_inliers=self.cfg.min_sim3_inliers)
        if not bool(res.ok):
            return None
        return (np.asarray(res.R), np.asarray(res.t), float(res.s),
                int(res.n_inliers))

    # ------------------------------------------------------------------
    def close(self, state: ms.MapState, kf_id: int, cand: int, correction,
              n_kf: int) -> ms.MapState:
        """Correct the loop: pose-graph over all KFs with the loop edge.

        correction: (R_m, t_m, s_m) with x_loop = s R x_drift + t — the
        world-frame Sim3 aligning the query's neighbourhood onto the loop.
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

        # Build edges: temporal chain + covisibility (> threshold) + loop.
        obs_kf = np.asarray(state.obs.kf)
        obs_valid = np.asarray(state.obs.valid)
        ei, ej, mR, mt, ms_w, w = [], [], [], [], [], []
        R_np = np.asarray(kfs.R)
        t_np = np.asarray(kfs.t)

        def rel(i, j):
            return pose_graph.relative_sim3(
                jnp.asarray(R_np[i]), jnp.asarray(t_np[i]), jnp.asarray(1.0),
                jnp.asarray(R_np[j]), jnp.asarray(t_np[j]), jnp.asarray(1.0))

        for k in range(1, n_kf):
            Rr, tr, sr = rel(k, k - 1)
            ei.append(k); ej.append(k - 1)
            mR.append(np.asarray(Rr)); mt.append(np.asarray(tr))
            ms_w.append(float(sr)); w.append(1.0)
        # Covisibility edges for the query's neighbourhood.
        counts = np.asarray(ms.covisibility_counts(state, kf_id, self.max_kf))
        for k in np.where(counts >= self.cfg.cov_edge_threshold)[0]:
            if abs(int(k) - kf_id) <= 1 or k >= n_kf:
                continue
            Rr, tr, sr = rel(kf_id, int(k))
            ei.append(kf_id); ej.append(int(k))
            mR.append(np.asarray(Rr)); mt.append(np.asarray(tr))
            ms_w.append(float(sr)); w.append(1.0)
        # Loop edge: measurement = S_q_corrected * S_c^{-1}.
        Sc = (kfs.R[cand], kfs.t[cand], jnp.asarray(1.0))
        Mrel = pose_graph.sim3_tuple_mul(Sq_corr, pose_graph.sim3_tuple_inv(Sc))
        ei.append(kf_id); ej.append(cand)
        mR.append(np.asarray(Mrel[0])); mt.append(np.asarray(Mrel[1]))
        ms_w.append(float(Mrel[2])); w.append(5.0)

        fixed = np.zeros(self.max_kf, bool)
        fixed[cand] = True
        fixed[0] = True

        dof = pose_graph.DOF_SE3 if self.cfg.fix_scale else pose_graph.DOF_SIM3
        res = pose_graph.optimize_pose_graph(
            kfs.R, kfs.t, jnp.ones(self.max_kf),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(mR)), jnp.asarray(np.stack(mt)),
            jnp.asarray(ms_w, jnp.float32), jnp.asarray(w, jnp.float32),
            jnp.asarray(fixed), dof, n_iters=25)

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
