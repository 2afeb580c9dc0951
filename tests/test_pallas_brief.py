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
        out = pb.brief_sample(img, ix, iy, jnp.cos(angle), jnp.sin(angle),
                              jnp.round(xy[:, 1]), jnp.round(xy[:, 0]),
                              interpret=True)
        # HIGHEST-precision MXU selection is exact to ~1e-7 relative (the
        # interpreter emulates the bf16x3 passes); positions must agree
        # bit-for-bit, values to float tolerance.
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-3)

    def test_boundary_keypoints_near_lane_tiles(self, rng):
        """Keypoints straddling 128-lane tile boundaries must route to the
        shifted copy and still sample exactly (the dual-copy trick)."""
        h, w = 240, 640
        img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        # x deliberately within +-19 of multiples of 128 (both sides).
        xs = []
        for b in (128, 256, 384, 512):
            xs += [b - 18, b - 5, b - 1, b, b + 4, b + 18]
        xs = np.asarray(xs, np.float32)
        ys = rng.uniform(25, h - 25, len(xs)).astype(np.float32)
        xy = jnp.asarray(np.stack([xs, ys], -1))
        angle = jnp.asarray(
            rng.uniform(-np.pi, np.pi, len(xs)).astype(np.float32))

        gy, gx = fo._pattern_positions(xy, angle, w, h)
        ref = img.reshape(-1)[gy * w + gx]
        ix = jnp.round(xy[:, 0]).astype(jnp.int32)
        iy = jnp.round(xy[:, 1]).astype(jnp.int32)
        out = pb.brief_sample(img, ix, iy, jnp.cos(angle), jnp.sin(angle),
                              jnp.round(xy[:, 1]), jnp.round(xy[:, 0]),
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-3)

    def test_origins_aligned_and_in_bounds(self, rng):
        h, w = 480, 640
        ix = jnp.asarray(rng.integers(0, w, 400, dtype=np.int32))
        iy = jnp.asarray(rng.integers(0, h, 400, dtype=np.int32))
        y0, xoff, sel = pb._origins(ix, iy, h, w)
        y0 = np.asarray(y0)
        xoff = np.asarray(xoff)
        sel = np.asarray(sel)
        x0 = xoff - 64 * sel            # lane origin inside selected copy
        _, hp, wp = pb._stacked_copies(jnp.zeros((h, w))).shape
        assert (y0 % 8 == 0).all() and (x0 % 128 == 0).all()
        assert (y0 >= 0).all() and (y0 <= hp - pb.PATCH_H).all()
        assert (x0 >= 0).all() and (x0 <= wp - pb.PATCH_W).all()
        # Interior keypoints' +-19 window lies inside the 128-lane patch of
        # the SELECTED copy (in original-x coords the patch covers
        # [xoff, xoff + 128)).
        ix_n, iy_n = np.asarray(ix), np.asarray(iy)
        inner = ((ix_n >= 19) & (ix_n < w - 19)
                 & (iy_n >= 19) & (iy_n < h - 19))
        assert (iy_n[inner] - 19 >= y0[inner]).all()
        assert (iy_n[inner] + 19 <= y0[inner] + pb.PATCH_H - 1).all()
        assert (ix_n[inner] - 19 >= xoff[inner]).all()
        assert (ix_n[inner] + 19 <= xoff[inner] + pb.PATCH_W - 1).all()
