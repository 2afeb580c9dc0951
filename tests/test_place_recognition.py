"""Place-recognition precision/recall at scale with the shipped 10k voc.

VERDICT r1 weakness #6: at 512 words the ``word_pair_mask`` SearchByBoW gate
was nearly a no-op and tf-idf discrimination across hundreds of keyframes
untested. This module scores the shipped 10k-word vocabulary
(scripts/make_synth_vocabulary.py) over 200+ keyframes drawn from worlds the
training corpus never saw.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import bow, fast_orb
from orbslam3_byzyh_tpu.pipeline.keyframe_db import KeyframeDatabase
from synth_world import SynthWorld

pytestmark = pytest.mark.slow  # full-pipeline tier (deselected by default, see pyproject)

VOC_PATH = os.path.join(os.path.dirname(__file__), "..", "vocabulary",
                        "synthetic_voc_10k.npz")

N_FEAT = 1536
N_WORLDS = 4
N_PER_WORLD = 50          # 200 keyframes total
N_QUERIES_PER_WORLD = 8


@pytest.fixture(scope="module")
def voc():
    if not os.path.exists(VOC_PATH):
        pytest.skip("10k vocabulary not built (scripts/make_synth_vocabulary.py)")
    return bow.load_vocabulary(VOC_PATH)


@pytest.fixture(scope="module")
def corpus():
    """(desc, valid) per keyframe for 4 unseen worlds x 50 frames, plus
    re-rendered queries at slightly perturbed times."""
    extract = jax.jit(lambda im: fast_orb.extract(im, n_features=N_FEAT))
    entries, queries = [], []
    for w in range(N_WORLDS):
        world = SynthWorld(seed=20 + w,
                          motion="excited" if w % 2 else "default")
        for i in range(N_PER_WORLD):
            t = i * 0.12
            f = extract(jnp.asarray(world.render(t)))
            entries.append((f.desc, f.valid))
        for qi in range(N_QUERIES_PER_WORLD):
            i = 3 + qi * (N_PER_WORLD // N_QUERIES_PER_WORLD)
            t = i * 0.12 + 0.03          # revisit: slightly moved camera
            f = extract(jnp.asarray(world.render(t)))
            queries.append((w * N_PER_WORLD + i, f.desc, f.valid))
    return entries, queries


class TestPlaceRecognition:
    def test_vocabulary_scale(self, voc):
        assert voc.n_words >= 5000, voc.n_words

    def test_top1_precision_over_200_kfs(self, voc, corpus):
        entries, queries = corpus
        db = KeyframeDatabase(voc, max_kf=256, n_feat=N_FEAT)
        for k, (desc, valid) in enumerate(entries):
            db.add(k, desc, valid)
        hits = 0
        for gt_id, desc, valid in queries:
            ids, scores, _ = db.query(desc, valid, top_n=3)
            # Temporal neighbors of the true frame count as the same place.
            if any(abs(int(i) - gt_id) <= 2 for i in ids[:1]):
                hits += 1
        precision = hits / len(queries)
        assert precision >= 0.8, precision

    def test_word_pair_mask_selectivity(self, voc, corpus):
        """SearchByBoW gate: with 10k words, two frames of DIFFERENT places
        must share words on only a small fraction of keypoint pairs (at 512
        words the mask passed nearly everything)."""
        entries, _ = corpus
        db = KeyframeDatabase(voc, max_kf=8, n_feat=N_FEAT)
        da, va = entries[0]
        db.add(0, da, va)
        # A frame from another world = different place.
        dq, vq = entries[3 * N_PER_WORLD + 25]
        words_q = bow.transform(voc, dq, vq)
        pm = np.asarray(db.word_pair_mask(words_q, 0))
        va_np = np.asarray(va)
        vq_np = np.asarray(vq)
        frac = pm[np.ix_(vq_np, va_np)].mean()
        assert frac < 0.10, frac

    def test_grouped_scoring_matches_reference_semantics(self, voc, corpus):
        """DetectNBestCandidates parity (KeyFrameDatabase.cc:649-760):
        covisibility-group accumulated scoring + the 0.8x common-words gate
        still rank the true place first when neighbours pool their votes."""
        import jax.numpy as jnp
        entries, queries = corpus
        db = KeyframeDatabase(voc, max_kf=256, n_feat=N_FEAT)
        for k, (desc, valid) in enumerate(entries):
            db.add(k, desc, valid)
        # Synthetic covisibility: temporal band (same-world neighbours
        # within +-3 frames share landmarks).
        K = 256
        idx = np.arange(K)
        band = np.maximum(0, 40 - 13 * np.abs(idx[:, None] - idx[None, :]))
        same_world = (idx[:, None] // N_PER_WORLD) == (idx[None] // N_PER_WORLD)
        in_corpus = (idx < len(entries))
        covis = band * same_world * in_corpus[:, None] * in_corpus[None, :]
        np.fill_diagonal(covis, 0)
        covis = jnp.asarray(covis, jnp.int32)
        hits = 0
        for gt_id, desc, valid in queries:
            ids, scores, _ = db.query_groups(desc, valid, covis, top_n=3)
            if any(abs(int(i) - gt_id) <= 3 for i in ids[:1]):
                hits += 1
        precision = hits / len(queries)
        assert precision >= 0.8, precision
