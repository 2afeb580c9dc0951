"""Pallas TPU kernel: fused masked-Hamming top-2 descriptor matching.

The hot loop of the whole tracking path (HOT LOOP 3 in SURVEY §3.2 —
``ORBmatcher::SearchByProjection``, /root/reference/src/ORBmatcher.cc:46,:1951
and the epipolar-gated ``SearchForTriangulation`` :1046). The reference walks
per-keypoint candidate lists; the XLA fallback (ops/matching.py) builds a
dense (N, M) distance matrix in HBM. This kernel fuses, per row tile held in
VMEM:

  popcount Hamming over 8 uint32 words  (VPU population_count)
  + geometric gating computed inline    (window radius / epipolar line /
                                         pyramid-level compatibility)
  + per-row best/second/argmin reduction

so the (N, M) matrix never leaves VMEM: HBM traffic is O(N+M), not O(N*M).
Ratio/rotation/mutual gates run outside on (N,) vectors (cheap).

Row tile 128 × full column range (M <= few thousand): a (128, M) int32 tile
is <= 2 MB of VMEM — well under the ~16 MB budget, and the popcount/min
reductions are pure VPU work at speed of light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INVALID_DIST = 1024
TILE_N = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(da_ref, dbt_ref, va_ref, vb_ref, geo_a_ref, geo_b_ref,
            best_ref, second_ref, bj_ref, *, mode: str,
            level_window: tuple):
    """One row tile: da (T, 8) vs all of dbt (8, M)."""
    m = dbt_ref.shape[1]
    t = da_ref.shape[0]

    dist = jnp.zeros((t, m), jnp.int32)
    for k in range(8):
        x = da_ref[:, k].reshape(t, 1) ^ dbt_ref[k, :].reshape(1, m)
        dist = dist + jax.lax.population_count(x)

    ok = (va_ref[:, 0].reshape(t, 1) > 0) & (vb_ref[0, :].reshape(1, m) > 0)

    if mode == "window":
        # geo_a rows: [u, v, r2, level]; geo_b rows: [u, v, level, 0].
        du = geo_a_ref[:, 0].reshape(t, 1) - geo_b_ref[0, :].reshape(1, m)
        dv = geo_a_ref[:, 1].reshape(t, 1) - geo_b_ref[1, :].reshape(1, m)
        ok &= du * du + dv * dv <= geo_a_ref[:, 2].reshape(t, 1)
        ldiff = (geo_b_ref[2, :].reshape(1, m)
                 - geo_a_ref[:, 3].reshape(t, 1))
        ok &= (ldiff >= level_window[0]) & (ldiff <= level_window[1])
    elif mode == "epipolar":
        # geo_a rows: [a, b, c, inv_norm2]; geo_b rows: [u, v, th, 0].
        num = (geo_a_ref[:, 0].reshape(t, 1) * geo_b_ref[0, :].reshape(1, m)
               + geo_a_ref[:, 1].reshape(t, 1) * geo_b_ref[1, :].reshape(1, m)
               + geo_a_ref[:, 2].reshape(t, 1))
        d2 = num * num * geo_a_ref[:, 3].reshape(t, 1)
        ok &= d2 < geo_b_ref[2, :].reshape(1, m)

    dist = jnp.where(ok, dist, INVALID_DIST)
    # Mosaic lowers argmin only for f32; pack (dist, col) into one exactly-
    # representable f32 key instead: dist <= 1024, col < m, key < 2^24.
    col = jax.lax.broadcasted_iota(jnp.int32, (t, m), 1)
    key = (dist * m + col).astype(jnp.float32)
    k1 = jnp.min(key, axis=1).astype(jnp.int32)
    best = k1 // m
    bj = k1 - best * m
    key2 = jnp.where(col == bj[:, None], jnp.float32(INVALID_DIST * m), key)
    second = jnp.min(key2, axis=1).astype(jnp.int32) // m

    best_ref[:, 0] = best
    second_ref[:, 0] = second
    bj_ref[:, 0] = bj


@functools.partial(jax.jit,
                   static_argnames=("mode", "level_window", "interpret"))
def hamming_best2_pallas(da, dbt, valid_a, valid_b, geo_a, geo_b,
                         mode: str = "none",
                         level_window: tuple = (0, 0),
                         interpret: bool = False):
    """Fused masked top-2 matcher.

    da: (N, 8) int32 query words; dbt: (8, M) int32 target words transposed.
    geo_a: (N, 4) float32 per-row gate data; geo_b: (4, M) per-col (see
    kernel docstring for the per-mode layout). Returns (best, second,
    best_j) each (N,) int32 — callers pad N/M beforehand.
    """
    n = da.shape[0]
    m = dbt.shape[1]
    grid = (n // TILE_N,)
    kern = functools.partial(_kernel, mode=mode, level_window=level_window)
    out_shape = [jax.ShapeDtypeStruct((n, 1), jnp.int32)] * 3
    row = lambda i: (i, 0)  # noqa: E731
    full_b = lambda i: (0, 0)  # noqa: E731
    best, second, bj = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, 8), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, m), full_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), full_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, 4), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, m), full_b, memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((TILE_N, 1), row, memory_space=pltpu.VMEM)] * 3,
        out_shape=out_shape,
        interpret=interpret,
    )(da, dbt, valid_a, valid_b, geo_a, geo_b)
    return best[:, 0], second[:, 0], bj[:, 0]


def _as_words(d):
    return jax.lax.bitcast_convert_type(jnp.asarray(d), jnp.int32)


def hamming_best2(da, db, valid_a, valid_b, *,
                  xy_a=None, xy_b=None, radius=None,
                  level_a=None, level_b=None, level_window=(0, 0),
                  lines=None, line_th=None,
                  interpret: bool = False):
    """Geometry-gated top-2 Hamming match (host-facing wrapper).

    Pads N to the row tile and M to the lane width, packs the per-mode gate
    tensors, and returns (best, second, best_j) trimmed to the input sizes.
    Modes: window (xy_a/xy_b/radius [+ levels]), epipolar (lines/line_th),
    none.
    """
    n, m = da.shape[0], db.shape[0]
    n_pad = _round_up(max(n, TILE_N), TILE_N)
    m_pad = _round_up(max(m, 128), 128)

    daw = jnp.zeros((n_pad, 8), jnp.int32).at[:n].set(_as_words(da))
    dbt = jnp.zeros((8, m_pad), jnp.int32).at[:, :m].set(_as_words(db).T)
    va = jnp.zeros((n_pad, 1), jnp.int32).at[:n, 0].set(
        valid_a.astype(jnp.int32))
    vb = jnp.zeros((1, m_pad), jnp.int32).at[0, :m].set(
        valid_b.astype(jnp.int32))

    geo_a = jnp.zeros((n_pad, 4), jnp.float32)
    geo_b = jnp.zeros((4, m_pad), jnp.float32)
    if lines is not None:
        mode = "epipolar"
        inv_n2 = 1.0 / jnp.maximum(
            lines[:, 0] ** 2 + lines[:, 1] ** 2, 1e-12)
        geo_a = geo_a.at[:n, :3].set(lines).at[:n, 3].set(inv_n2)
        geo_b = geo_b.at[:2, :m].set(xy_b.T)
        geo_b = geo_b.at[2, :m].set(line_th)
    elif xy_a is not None:
        mode = "window"
        r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (n,))
        geo_a = geo_a.at[:n, :2].set(xy_a).at[:n, 2].set(r * r)
        geo_a = geo_a.at[:n, 3].set(level_a.astype(jnp.float32))
        geo_b = geo_b.at[:2, :m].set(xy_b.T)
        geo_b = geo_b.at[2, :m].set(level_b.astype(jnp.float32))
    else:
        mode = "none"

    best, second, bj = hamming_best2_pallas(
        daw, dbt, va, vb, geo_a, geo_b, mode=mode,
        level_window=(float(level_window[0]), float(level_window[1])),
        interpret=interpret)
    return best[:n], second[:n], jnp.minimum(bj[:n], m - 1)


def tpu_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
