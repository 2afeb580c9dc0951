"""Vocabulary transfer: the deployable 100k-word tree trained on REAL
imagery must discriminate real places where the synthetic-blob 10k
vocabulary does not (VERDICT r4 missing #3 / task 5).

Protocol: ~250 "places" are synthesized as random viewpoint warps of the
real photographs (disjoint warps = different places, including the
held-out image the 100k vocabulary was NOT trained on); each place gets
two independently-perturbed views. One view per place populates a
database of BoW signatures, the other queries it; precision@1 = fraction
of queries whose best-scoring database entry is their own place. This is
the KeyFrameDatabase retrieval problem at a ~250-entry scale with real
descriptor statistics.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import bow, fast_orb

pytestmark = pytest.mark.slow

_VOC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "vocabulary")
_REAL = os.path.join(_VOC_DIR, "real_voc_100k.npz")
_SYNTH = os.path.join(_VOC_DIR, "synthetic_voc_10k.npz")

needs_real_voc = pytest.mark.skipif(
    not os.path.exists(_REAL),
    reason="real vocabulary not trained (scripts/make_real_vocabulary.py)")


def _places(n_per_scene=50, n_feat=512, seed=7):
    """(desc_db, valid_db, desc_q, valid_q) stacks of paired views."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from make_real_vocabulary import augmented_views, load_real_images

    imgs = load_real_images()
    rng = np.random.default_rng(seed)
    db_d, db_v, q_d, q_v = [], [], [], []
    for name, img in imgs.items():
        views = list(augmented_views(img, n_per_scene, rng))
        for view in views:
            # Two views of the SAME place: photometric + tiny-warp jitter.
            import cv2
            jitter = cv2.warpAffine(
                view, np.float32([[1, 0, rng.uniform(-3, 3)],
                                  [0, 1, rng.uniform(-3, 3)]]),
                (view.shape[1], view.shape[0]),
                borderMode=cv2.BORDER_REFLECT)
            jitter = np.clip(jitter * rng.uniform(0.85, 1.15)
                             + rng.uniform(-10, 10), 0, 255)
            for dst_d, dst_v, im in ((db_d, db_v, view),
                                     (q_d, q_v, jitter)):
                f = fast_orb.extract(jnp.asarray(im, jnp.float32),
                                     n_features=n_feat)
                dst_d.append(np.asarray(f.desc))
                dst_v.append(np.asarray(f.valid))
    return (np.stack(db_d), np.stack(db_v), np.stack(q_d), np.stack(q_v))


def _precision_at_1(voc, db_d, db_v, q_d, q_v):
    vecs = []
    for d, v in zip(db_d, db_v):
        words = bow.transform(voc, jnp.asarray(d), jnp.asarray(v))
        vecs.append(bow.bow_vector(voc, words))
    vecs = jnp.stack(vecs)
    valid = jnp.ones((len(db_d),), bool)
    hit = 0
    for i, (d, v) in enumerate(zip(q_d, q_v)):
        words = bow.transform(voc, jnp.asarray(d), jnp.asarray(v))
        qv = bow.bow_vector(voc, words)
        scores = bow.score_against_database(qv, vecs, valid)
        if int(jnp.argmax(scores)) == i:
            hit += 1
    return hit / len(q_d)


@needs_real_voc
class TestVocabularyTransfer:
    @pytest.fixture(scope="class")
    def corpus(self):
        return _places()

    def test_real_voc_discriminates_real_places(self, corpus):
        voc = bow.load_vocabulary(_REAL)
        acc = _precision_at_1(voc, *corpus)
        print(f"real 100k voc precision@1 = {acc:.3f}")
        assert acc >= 0.9, acc

    def test_real_voc_beats_synthetic(self, corpus):
        """The 10k synthetic-blob vocabulary's words do not transfer to
        real descriptor statistics: retrieval at the same scale is
        measurably worse than the real-imagery tree."""
        real = bow.load_vocabulary(_REAL)
        synth = bow.load_vocabulary(_SYNTH)
        acc_real = _precision_at_1(real, *corpus)
        acc_synth = _precision_at_1(synth, *corpus)
        print(f"precision@1: real={acc_real:.3f} synth={acc_synth:.3f}")
        assert acc_real >= acc_synth + 0.05, (acc_real, acc_synth)
