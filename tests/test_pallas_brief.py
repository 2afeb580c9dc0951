"""Pallas BRIEF sampler vs the gather reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from orbslam3_byzyh_tpu.ops import fast_orb as fo
from orbslam3_byzyh_tpu.ops import pallas_brief as pb


class TestPallasBrief:
    def test_matches_gather_path(self, rng):
        h, w = 240, 320
        img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        k = 64
        # Interior keypoints (>= 19 px margin, like EDGE_THRESHOLD).
        xy = jnp.asarray(np.stack([
            rng.uniform(20, w - 21, k), rng.uniform(20, h - 21, k)],
            -1).astype(np.float32))
        angle = jnp.asarray(rng.uniform(-np.pi, np.pi, k).astype(np.float32))

        # Reference: global positions + flat gather.
        gy, gx = fo._pattern_positions(xy, angle, w, h)
        ref = img.reshape(-1)[gy * w + gx]

        ix = jnp.round(xy[:, 0]).astype(jnp.int32)
        iy = jnp.round(xy[:, 1]).astype(jnp.int32)
        y0, x0 = pb.aligned_origins(ix, iy, h, w)
        out = pb.brief_sample(img, y0, x0, jnp.cos(angle), jnp.sin(angle),
                              jnp.round(xy[:, 1]), jnp.round(xy[:, 0]),
                              interpret=True)
        # HIGHEST-precision MXU selection is exact to ~1e-7 relative (the
        # interpreter emulates the bf16x3 passes); positions must agree
        # bit-for-bit, values to float tolerance.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-3)

    def test_origins_aligned_and_in_bounds(self, rng):
        h, w = 480, 640
        ix = jnp.asarray(rng.integers(0, w, 200, dtype=np.int32))
        iy = jnp.asarray(rng.integers(0, h, 200, dtype=np.int32))
        y0, x0 = pb.aligned_origins(ix, iy, h, w)
        y0, x0 = np.asarray(y0), np.asarray(x0)
        hp, wp = pb.pad_for_patches(jnp.zeros((h, w))).shape
        assert (y0 % 8 == 0).all() and (x0 % 128 == 0).all()
        assert (y0 >= 0).all() and (y0 <= hp - pb.PATCH_H).all()
        assert (x0 >= 0).all() and (x0 <= wp - pb.PATCH_W).all()
        # Interior keypoints' +-19 neighborhood is inside the patch.
        inner = ((ix >= 19) & (np.asarray(ix) < w - 19)
                 & (iy >= 19) & (np.asarray(iy) < h - 19))
        iy_n, ix_n = np.asarray(iy)[inner], np.asarray(ix)[inner]
        assert (iy_n - 19 >= y0[inner]).all()
        assert (iy_n + 19 <= y0[inner] + pb.PATCH_H - 1).all()
        assert (ix_n - 19 >= x0[inner]).all()
        assert (ix_n + 19 <= x0[inner] + pb.PATCH_W - 1).all()
