"""Atlas: multi-map lifecycle management.

Replaces ``Atlas`` (/root/reference/src/Atlas.cc): current map + stored maps,
``CreateNewMap`` on tracking loss (Atlas.h:83), and the merge-back path
(LoopClosing::MergeLocal operating across maps). Maps are whole MapState
pytrees; "switching" is an index change, merging is a Sim3 weld + array
concatenation into a fresh MapState.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from ..ops import lie
from . import map_state as ms


@dataclasses.dataclass
class MapMeta:
    n_kf: int = 0
    n_lm: int = 0
    # Spanning-tree parents (np int32 (max_kf,), -1 = root/unset): the
    # essential graph's tree edges (KeyFrame::GetParent,
    # /root/reference/include/KeyFrame.h:233-247). Lazily allocated.
    kf_parent: object = None


class Atlas:
    def __init__(self, max_kf: int, max_lm: int, max_obs: int, n_feat: int):
        self.dims = (max_kf, max_lm, max_obs, n_feat)
        self.maps: List[ms.MapState] = [ms.empty_map(*self.dims)]
        self.meta: List[MapMeta] = [MapMeta()]
        self.current = 0

    # ------------------------------------------------------------------
    @property
    def state(self) -> ms.MapState:
        return self.maps[self.current]

    @state.setter
    def state(self, s: ms.MapState):
        self.maps[self.current] = s

    def counts(self) -> MapMeta:
        return self.meta[self.current]

    # ------------------------------------------------------------------
    def create_new_map(self):
        """Tracking lost with a big-enough map: keep it, start fresh
        (CreateMapInAtlas, Tracking.cc:3853)."""
        self.maps.append(ms.empty_map(*self.dims))
        self.meta.append(MapMeta())
        self.current = len(self.maps) - 1
        return self.current

    def reset_active_map(self):
        """Map too young to keep (Tracking.cc:3349-3364)."""
        self.maps[self.current] = ms.empty_map(*self.dims)
        self.meta[self.current] = MapMeta()

    # ------------------------------------------------------------------
    def merge(self, other_idx: int, R_m, t_m, s_m: float) -> int:
        """Weld map `other_idx` into the CURRENT map.

        (R_m, t_m, s_m): Sim3 mapping other-map world coords into
        current-map world coords (the welding transform from loop
        detection across maps — MergeLocal :1590 geometry).
        Returns the merged map index (current). Capacity overflow drops the
        oldest other-map keyframes (documented limitation).
        """
        cur = self.maps[self.current]
        oth = self.maps[other_idx]
        mc = self.meta[self.current]
        mo = self.meta[other_idx]
        max_kf, max_lm, max_obs, n_feat = self.dims

        kf_take = min(mo.n_kf, max_kf - mc.n_kf)
        lm_take = min(mo.n_lm, max_lm - mc.n_lm)
        kf_off = mc.n_kf
        lm_off = mc.n_lm

        R_m = jnp.asarray(R_m, jnp.float32)
        t_m = jnp.asarray(t_m, jnp.float32)
        s = float(s_m)

        # Transform other-map keyframe poses into current world:
        # x_cur = s R_m x_oth + t_m; Tcw_oth' has R' = R R_m^T,
        # t' = s t - R' t_m (folding scale into translation).
        Ro = oth.kfs.R[:kf_take]
        to = oth.kfs.t[:kf_take]
        R_new = jnp.einsum("kij,lj->kil", Ro, R_m)
        t_new = s * to - jnp.einsum("kij,j->ki", R_new, t_m)

        kfs = cur.kfs._replace(
            R=cur.kfs.R.at[kf_off:kf_off + kf_take].set(R_new),
            t=cur.kfs.t.at[kf_off:kf_off + kf_take].set(t_new),
            stamp=cur.kfs.stamp.at[kf_off:kf_off + kf_take].set(
                oth.kfs.stamp[:kf_take]),
            kp_xy=cur.kfs.kp_xy.at[kf_off:kf_off + kf_take].set(
                oth.kfs.kp_xy[:kf_take]),
            kp_level=cur.kfs.kp_level.at[kf_off:kf_off + kf_take].set(
                oth.kfs.kp_level[:kf_take]),
            kp_angle=cur.kfs.kp_angle.at[kf_off:kf_off + kf_take].set(
                oth.kfs.kp_angle[:kf_take]),
            kp_desc=cur.kfs.kp_desc.at[kf_off:kf_off + kf_take].set(
                oth.kfs.kp_desc[:kf_take]),
            kp_valid=cur.kfs.kp_valid.at[kf_off:kf_off + kf_take].set(
                oth.kfs.kp_valid[:kf_take]),
            kp_ur=cur.kfs.kp_ur.at[kf_off:kf_off + kf_take].set(
                oth.kfs.kp_ur[:kf_take]),
            valid=cur.kfs.valid.at[kf_off:kf_off + kf_take].set(
                oth.kfs.valid[:kf_take]),
        )

        pos_new = s * (oth.lms.pos[:lm_take] @ R_m.T) + t_m
        lms = cur.lms._replace(
            pos=cur.lms.pos.at[lm_off:lm_off + lm_take].set(pos_new),
            desc=cur.lms.desc.at[lm_off:lm_off + lm_take].set(
                oth.lms.desc[:lm_take]),
            normal=cur.lms.normal.at[lm_off:lm_off + lm_take].set(
                oth.lms.normal[:lm_take] @ R_m.T),
            min_dist=cur.lms.min_dist.at[lm_off:lm_off + lm_take].set(
                oth.lms.min_dist[:lm_take] * s),
            max_dist=cur.lms.max_dist.at[lm_off:lm_off + lm_take].set(
                oth.lms.max_dist[:lm_take] * s),
            n_obs=cur.lms.n_obs.at[lm_off:lm_off + lm_take].set(
                oth.lms.n_obs[:lm_take]),
            n_found=cur.lms.n_found.at[lm_off:lm_off + lm_take].set(
                oth.lms.n_found[:lm_take]),
            n_visible=cur.lms.n_visible.at[lm_off:lm_off + lm_take].set(
                oth.lms.n_visible[:lm_take]),
            first_kf=cur.lms.first_kf.at[lm_off:lm_off + lm_take].set(
                jnp.where(oth.lms.first_kf[:lm_take] < kf_take,
                          oth.lms.first_kf[:lm_take] + kf_off, -1)),
            valid=cur.lms.valid.at[lm_off:lm_off + lm_take].set(
                oth.lms.valid[:lm_take]),
        )

        # Observations: shift keyframe ids by kf_off. Observations of
        # other-map keyframes that did NOT fit (capacity clip above) must
        # die with them — a shifted id >= max_kf corrupts every consumer
        # that indexes by obs.kf (covisibility, chains, culling).
        okf = oth.obs.kf[:lm_take]
        okf_kept = (okf >= 0) & (okf < kf_take)
        obs = cur.obs._replace(
            kf=cur.obs.kf.at[lm_off:lm_off + lm_take].set(
                jnp.where(okf_kept, okf + kf_off, -1)),
            kp=cur.obs.kp.at[lm_off:lm_off + lm_take].set(
                jnp.where(okf_kept, oth.obs.kp[:lm_take], -1)),
            valid=cur.obs.valid.at[lm_off:lm_off + lm_take].set(
                oth.obs.valid[:lm_take] & okf_kept),
        )

        self.maps[self.current] = cur._replace(kfs=kfs, lms=lms, obs=obs)
        # Transplant the other map's spanning tree, ids shifted by kf_off.
        parent = self.meta[self.current].kf_parent
        po = mo.kf_parent
        if po is not None or parent is not None:
            if parent is None:
                parent = np.full(max_kf, -1, np.int32)
            parent = parent.copy()
            if po is not None:
                # Parents beyond the transplanted range were dropped by the
                # capacity clip: their children root at the weld instead.
                src = po[:kf_take]
                parent[kf_off:kf_off + kf_take] = np.where(
                    (src >= 0) & (src < kf_take), src + kf_off, -1)
        self.meta[self.current] = MapMeta(n_kf=kf_off + kf_take,
                                          n_lm=lm_off + lm_take,
                                          kf_parent=parent)
        # Drop the merged-away map.
        del self.maps[other_idx]
        del self.meta[other_idx]
        if other_idx < self.current:
            self.current -= 1
        return self.current
