"""Keyframe database: BoW signatures, loop/reloc candidate mining.

Replaces ``KeyFrameDatabase`` (/root/reference/src/KeyFrameDatabase.cc): the
word->KF inverted file + accumulated-score candidate search
(``DetectNBestCandidates`` :649, ``DetectRelocalizationCandidates`` :827)
becomes a dense (K, W) tf-idf matrix scored with one matvec on the MXU
(see ops/bow.py design note).

Also hosts SearchByBoW-style matching masks: keypoint pairs are candidates
iff they land in the same vocabulary word (ORBmatcher::SearchByBoW :260).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bow, matching


class KeyframeDatabase:
    """Host-side container of per-keyframe BoW data (device arrays)."""

    def __init__(self, voc: bow.Vocabulary, max_kf: int, n_feat: int):
        self.voc = voc
        self.vecs = jnp.zeros((max_kf, voc.n_words), jnp.float32)
        self.words = jnp.full((max_kf, n_feat), -1, jnp.int32)
        self.valid = jnp.zeros((max_kf,), bool)

    def add(self, kf_id: int, desc: jnp.ndarray, kp_valid: jnp.ndarray):
        words = bow.transform(self.voc, desc, kp_valid)
        vec = bow.bow_vector(self.voc, words)
        self.vecs = self.vecs.at[kf_id].set(vec)
        self.words = self.words.at[kf_id].set(words)
        self.valid = self.valid.at[kf_id].set(True)

    def remap(self, old2new: np.ndarray, n_valid: int):
        """Keyframe slots were compacted (map_state.compact_keyframes):
        gather the BoW rows into their new slots and drop dead entries."""
        max_kf = self.valid.shape[0]
        old_of_new = np.zeros(max_kf, np.int64)
        live = np.where(old2new >= 0)[0]
        old_of_new[old2new[live]] = live
        g = jnp.asarray(old_of_new)
        keep = jnp.arange(max_kf) < n_valid
        self.vecs = jnp.where(keep[:, None], self.vecs[g], 0.0)
        self.words = jnp.where(keep[:, None], self.words[g], -1)
        self.valid = self.valid[g] & keep

    def query(self, desc: jnp.ndarray, kp_valid: jnp.ndarray,
              exclude: np.ndarray | None = None, top_n: int = 3,
              min_score: float = 0.0):
        """Top-N candidate keyframes by L1 BoW score.

        exclude: boolean (K,) mask of KFs to skip (covisible set for loop
        detection — KeyFrameDatabase.cc:667 skips the connected group).
        Returns (ids (top_n,), scores (top_n,)) as numpy; id -1 = none.
        """
        words = bow.transform(self.voc, desc, kp_valid)
        qv = bow.bow_vector(self.voc, words)
        valid = self.valid
        if exclude is not None:
            valid = valid & ~jnp.asarray(exclude)
        scores = bow.score_against_database(qv, self.vecs, valid)
        top_s, top_i = jax.lax.top_k(scores, top_n)
        top_s = np.asarray(top_s)
        top_i = np.asarray(top_i)
        ids = np.where(top_s >= max(min_score, 1e-6), top_i, -1)
        return ids, top_s, words

    def word_pair_mask(self, words_a: jnp.ndarray, kf_id: int) -> jnp.ndarray:
        """(Na, Nb) mask: same vocabulary word (SearchByBoW bucket gate)."""
        words_b = self.words[kf_id]
        return (words_a[:, None] == words_b[None, :]) & (words_a[:, None] >= 0)
