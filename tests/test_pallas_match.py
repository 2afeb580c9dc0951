"""Pallas fused matcher vs the jnp reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam3_byzyh_tpu.ops import matching, pallas_match


def _rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32))


def _ref_best2(da, db, valid_a, valid_b, pair_mask):
    dist = matching.masked_hamming(da, db, valid_a, valid_b, pair_mask)
    return matching.best_two(dist)


class TestPallasMatch:
    def test_plain_mode_matches_reference(self, rng):
        n, m = 200, 150
        da, db = _rand_desc(rng, n), _rand_desc(rng, m)
        va = jnp.asarray(rng.random(n) > 0.1)
        vb = jnp.asarray(rng.random(m) > 0.1)
        b, s, j = pallas_match.hamming_best2(da, db, va, vb, interpret=True)
        rb, rs, rj = _ref_best2(da, db, va, vb, None)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        valid_rows = np.asarray(rb) < matching.INVALID_DIST
        np.testing.assert_array_equal(np.asarray(j)[valid_rows],
                                      np.asarray(rj)[valid_rows])

    def test_window_mode_matches_reference(self, rng):
        n, m = 160, 140
        da, db = _rand_desc(rng, n), _rand_desc(rng, m)
        va = jnp.ones(n, bool)
        vb = jnp.ones(m, bool)
        xy_a = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        xy_b = jnp.asarray(rng.uniform(0, 640, (m, 2)).astype(np.float32))
        la = jnp.asarray(rng.integers(0, 8, n, dtype=np.int32))
        lb = jnp.asarray(rng.integers(0, 8, m, dtype=np.int32))
        radius = jnp.asarray(rng.uniform(20, 120, n).astype(np.float32))
        b, s, j = pallas_match.hamming_best2(
            da, db, va, vb, xy_a=xy_a, xy_b=xy_b, radius=radius,
            level_a=la, level_b=lb, level_window=(-1, 1), interpret=True)
        pm = matching.window_mask(xy_a, xy_b, radius) \
            & matching.level_mask(la, lb, -1, 1)
        rb, rs, rj = _ref_best2(da, db, va, vb, pm)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(rb))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(rs))
        valid_rows = np.asarray(rb) < matching.INVALID_DIST
        np.testing.assert_array_equal(np.asarray(j)[valid_rows],
                                      np.asarray(rj)[valid_rows])

    def test_epipolar_mode_matches_reference(self, rng):
        n, m = 130, 170
        da, db = _rand_desc(rng, n), _rand_desc(rng, m)
        va = jnp.ones(n, bool)
        vb = jnp.ones(m, bool)
        xy_a = jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32))
        xy_b = jnp.asarray(rng.uniform(0, 640, (m, 2)).astype(np.float32))
        lb = jnp.asarray(rng.integers(0, 8, m, dtype=np.int32))
        F = jnp.asarray(rng.normal(0, 1e-3, (3, 3)).astype(np.float32))
        sigma2 = jnp.asarray([1.2 ** (2 * i) for i in range(8)], jnp.float32)
        ones = jnp.ones_like(xy_a[:, :1])
        lines = jnp.concatenate([xy_a, ones], -1) @ F.T
        th_b = 3.84 * sigma2[lb]
        b, s, j = pallas_match.hamming_best2(
            da, db, va, vb, xy_b=xy_b, lines=lines, line_th=th_b,
            interpret=True)
        pm = matching.epipolar_mask(F, xy_a, xy_b, lb, sigma2)
        rb, rs, rj = _ref_best2(da, db, va, vb, pm)
        # Float assoc order may differ at the gate boundary; compare the
        # accept decisions + distances, not strict equality of the gate.
        np.testing.assert_array_equal(np.asarray(b), np.asarray(rb))
        valid_rows = np.asarray(rb) < matching.INVALID_DIST
        np.testing.assert_array_equal(np.asarray(j)[valid_rows],
                                      np.asarray(rj)[valid_rows])
