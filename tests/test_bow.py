"""BoW vocabulary and scoring tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import bow


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    # 20 "documents" of 100 descriptors. Each document draws from its OWN
    # window of prototypes (like distinct places sharing some structure);
    # without document-specific word statistics BoW has nothing to score.
    protos = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
    descs, doc_ids = [], []
    for d in range(20):
        lo = d * 9
        window = protos[lo:lo + 25]
        for _ in range(100):
            p = window[rng.integers(len(window))].copy()
            for _ in range(6):
                w = rng.integers(8)
                p[w] ^= np.uint32(1) << np.uint32(rng.integers(32))
            descs.append(p)
            doc_ids.append(d)
    return np.stack(descs), np.asarray(doc_ids)


@pytest.fixture(scope="module")
def voc(corpus):
    descs, doc_ids = corpus
    return bow.train_vocabulary(descs, k=5, depth=3, doc_ids=doc_ids)


class TestVocabulary:
    def test_structure(self, voc):
        assert voc.n_words > 20
        assert int((np.asarray(voc.word_id) >= 0).sum()) == voc.n_words

    def test_transform_deterministic(self, voc, corpus):
        descs, _ = corpus
        d = jnp.asarray(descs[:64])
        v = jnp.ones(64, bool)
        w1 = np.asarray(bow.transform(voc, d, v))
        w2 = np.asarray(bow.transform(voc, d, v))
        np.testing.assert_array_equal(w1, w2)
        assert (w1 >= 0).all()

    def test_similar_descriptors_same_word(self, voc, corpus):
        descs, _ = corpus
        rng = np.random.default_rng(0)
        base = descs[:128].copy()
        noisy = base.copy()
        for i in range(len(noisy)):
            w = rng.integers(8)
            noisy[i, w] ^= np.uint32(1) << np.uint32(rng.integers(32))
        w_base = np.asarray(bow.transform(voc, jnp.asarray(base),
                                          jnp.ones(128, bool)))
        w_noisy = np.asarray(bow.transform(voc, jnp.asarray(noisy),
                                           jnp.ones(128, bool)))
        assert (w_base == w_noisy).mean() > 0.85

    def test_scoring_discriminates(self, voc, corpus):
        """Same-image halves must score far above different images."""
        descs, doc_ids = corpus
        vecs = []
        for d in range(4):
            dd = descs[doc_ids == d]
            w1 = bow.transform(voc, jnp.asarray(dd[:50]), jnp.ones(50, bool))
            w2 = bow.transform(voc, jnp.asarray(dd[50:]), jnp.ones(50, bool))
            vecs.append((bow.bow_vector(voc, w1), bow.bow_vector(voc, w2)))
        same = np.mean([float(bow.l1_score(a, b)) for a, b in vecs])
        diff = np.mean([float(bow.l1_score(vecs[i][0], vecs[j][0]))
                        for i in range(4) for j in range(4) if i != j])
        assert same > diff + 0.2, (same, diff)

    def test_database_scoring(self, voc, corpus):
        descs, doc_ids = corpus
        db = []
        for d in range(10):
            dd = descs[doc_ids == d][:80]
            w = bow.transform(voc, jnp.asarray(dd), jnp.ones(len(dd), bool))
            db.append(bow.bow_vector(voc, w))
        db = jnp.stack(db)
        # Query with the held-out part of doc 3.
        q = descs[doc_ids == 3][80:]
        wq = bow.transform(voc, jnp.asarray(q), jnp.ones(len(q), bool))
        qv = bow.bow_vector(voc, wq)
        scores = np.asarray(bow.score_against_database(
            qv, db, jnp.ones(10, bool)))
        assert scores.argmax() == 3

    def test_save_load_roundtrip(self, voc, corpus, tmp_path):
        descs, _ = corpus
        p = str(tmp_path / "voc.npz")
        bow.save_vocabulary(p, voc)
        voc2 = bow.load_vocabulary(p)
        d = jnp.asarray(descs[:32])
        v = jnp.ones(32, bool)
        np.testing.assert_array_equal(np.asarray(bow.transform(voc, d, v)),
                                      np.asarray(bow.transform(voc2, d, v)))
