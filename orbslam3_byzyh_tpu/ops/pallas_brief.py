"""Pallas TPU kernel: BRIEF descriptor sampling without XLA gathers.

The steered-BRIEF stage needs 512 scattered pixel reads per keypoint
(computeOrbDescriptor, /root/reference/src/ORBextractor.cc:150). XLA's TPU
gather runs at ~10 ns/element, making this the single hottest stage of
feature extraction (~5.4 ms of an 8.6 ms tracking step at 1024 keypoints).

Kernel strategy: the blurred level image lives in VMEM; per keypoint we
dynamic-slice an ALIGNED patch (sublane start multiple of 8, lane start
multiple of 128 — Mosaic's vector-load constraints) and read the 512
samples with a SEPARABLE one-hot contraction instead of a gather:

    rows    = onehot_y(512, 56) @ patch(56, 176)        (MXU)
    samples = sum(rows * onehot_x(512, 176), axis=1)    (VPU)

~400k VPU ops + one small matmul per keypoint — far cheaper than the
gather it replaces.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_H = 56     # 48 needed + 8 sublane-alignment slack
PATCH_W = 176    # 48 needed + 128 lane-alignment slack


def _kernel(y0_ref, x0_ref, ca_ref, sa_ref, cy_ref, cx_ref,
            img_ref, px_ref, py_ref, out_ref, *, orig_h: int, orig_w: int):
    """Per keypoint: rotate the BRIEF pattern in-kernel, slice an aligned
    patch, sample via separable one-hot contraction."""
    n_kp = out_ref.shape[0]
    rows_i = jax.lax.broadcasted_iota(
        jnp.int32, (512, PATCH_H), 1).astype(jnp.float32)
    cols_i = jax.lax.broadcasted_iota(
        jnp.int32, (512, PATCH_W), 1).astype(jnp.float32)
    px = px_ref[:, :]                                     # (512, 1)
    py = py_ref[:, :]

    def body(k, _):
        y0 = pl.multiple_of(y0_ref[k], 8)
        x0 = pl.multiple_of(x0_ref[k], 128)
        patch = img_ref[pl.ds(y0, PATCH_H), pl.ds(x0, PATCH_W)]
        ca = ca_ref[k]
        sa = sa_ref[k]
        # Rotated global sample positions, then patch-local (float compare
        # against float iota avoids int lane ops).
        gx = jnp.round(px * ca - py * sa) + cx_ref[k]        # (512, 1)
        gy = jnp.round(px * sa + py * ca) + cy_ref[k]
        gx = jnp.clip(gx, 0.0, float(orig_w - 1)) - x0.astype(jnp.float32)
        gy = jnp.clip(gy, 0.0, float(orig_h - 1)) - y0.astype(jnp.float32)
        gx = jnp.clip(gx, 0.0, PATCH_W - 1.0)
        gy = jnp.clip(gy, 0.0, PATCH_H - 1.0)
        oh_y = (rows_i == gy).astype(jnp.float32)
        oh_x = (cols_i == gx).astype(jnp.float32)
        # HIGHEST precision: the MXU's default bf16 passes would truncate the
        # sampled VALUES (the one-hot makes this matmul an exact selection).
        rows = jnp.dot(oh_y, patch, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out_ref[k, :] = jnp.sum(rows * oh_x, axis=1)
        return 0

    jax.lax.fori_loop(0, n_kp, body, 0)


def _pattern_cols():
    """(512, 1) f32 pattern x/y offsets: A pattern rows then B pattern.

    Built from the numpy pattern (NOT the jnp module constants) so calling
    under a trace never caches tracers."""
    import numpy as np

    from . import fast_orb as fo
    px = np.concatenate([fo._PATTERN[:, 0], fo._PATTERN[:, 2]]).astype(
        np.float32).reshape(512, 1)
    py = np.concatenate([fo._PATTERN[:, 1], fo._PATTERN[:, 3]]).astype(
        np.float32).reshape(512, 1)
    return jnp.asarray(px), jnp.asarray(py)


import functools


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_sample(img: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray,
                 ca: jnp.ndarray, sa: jnp.ndarray,
                 cy: jnp.ndarray, cx: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Rotate + sample the 512 BRIEF positions per keypoint.

    img: the ORIGINAL (H, W) float32 level image — padded internally via
    pad_for_patches(). y0/x0: (K,) int32 aligned patch origins from
    aligned_origins(). ca/sa: (K,) float32 cos/sin of the keypoint angle;
    cy/cx: (K,) float32 PRE-ROUNDED keypoint centers.
    Returns (K, 512) float32 samples (A pattern cols 0-255, B 256-511).
    """
    orig_h, orig_w = img.shape
    img = pad_for_patches(img)
    k = y0.shape[0]
    px, py = _pattern_cols()
    kern = functools.partial(_kernel, orig_h=orig_h, orig_w=orig_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,            # y0, x0, ca, sa, cy, cx in SMEM
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # img
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pattern x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pattern y
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 512), jnp.float32),
        interpret=interpret,
    )(y0, x0, ca, sa, cy, cx, img, px, py)


def _ceil(a: int, m: int) -> int:
    return (a + m - 1) // m * m


def pad_for_patches(img: jnp.ndarray) -> jnp.ndarray:
    """Edge-pad so every aligned patch origin fits: flooring to the 8/128
    alignment grid can push a border keypoint's patch past the image edge
    otherwise. Valid keypoints (>= 19 px margin) never sample the padding."""
    h, w = img.shape
    return jnp.pad(img, ((0, _ceil(h + 36, 8) - h),
                         (0, _ceil(w + 156, 128) - w)), mode="edge")


def aligned_origins(ix, iy, h: int, w: int):
    """Patch origins covering the +-19 px rotated-BRIEF neighborhood of
    integer centers (ix, iy), aligned to Mosaic's vector-load constraints.
    Origins index the pad_for_patches() image (always in bounds there)."""
    y0 = (jnp.clip(iy - 19, 0, h) // 8) * 8
    x0 = (jnp.clip(ix - 19, 0, w) // 128) * 128
    return y0.astype(jnp.int32), x0.astype(jnp.int32)


def tpu_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
