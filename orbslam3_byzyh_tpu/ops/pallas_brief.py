"""Pallas TPU kernel: BRIEF descriptor sampling without XLA gathers.

The steered-BRIEF stage needs 512 scattered pixel reads per keypoint
(computeOrbDescriptor, /root/reference/src/ORBextractor.cc:150). XLA's TPU
gather runs at ~10 ns/element, making this the single hottest stage of
feature extraction (~5.4 ms of an 8.6 ms tracking step at 1024 keypoints).

Kernel strategy: the blurred level image lives in VMEM; per keypoint we
dynamic-slice an ALIGNED patch (sublane start multiple of 8, lane start
multiple of 128 — Mosaic's vector-load constraints) and read the 512
samples with a SEPARABLE one-hot contraction instead of a gather:

    rows    = onehot_y(512, 48) @ patch(48, 128)        (MXU)
    samples = sum(rows * onehot_x(512, 128), axis=1)    (VPU)

To keep the patch at the minimal 48x128 tile (a 176-lane patch would be
needed for keypoints near a 128-lane boundary), the kernel reads from TWO
stacked copies of the image, the second shifted left by 64 lanes: every
keypoint's +-19 px window fits a single 128-aligned tile in one of the two
copies. ~130k VPU ops + one (512,48)x(48,128) matmul per keypoint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_H = 48     # 39 rows needed + 8 sublane-alignment slack (+rounding)
PATCH_W = 128    # one lane tile (dual-shifted-copy trick)
MARGIN = 19      # +-19 px covers the rotated bit_pattern_31_ extent


def _kernel(y0_ref, xoff_ref, sel_ref, ca_ref, sa_ref, cy_ref, cx_ref,
            img_ref, px_ref, py_ref, out_ref, *, orig_h: int, orig_w: int):
    """Per keypoint: rotate the BRIEF pattern in-kernel, slice an aligned
    patch from the selected image copy, sample via one-hot contraction.

    The 512 samples are laid out (8, 64) — 8 sublanes x 64 lanes — so the
    ~20 rotation/clip ops run one VPU cycle each instead of 64 (a (512, 1)
    layout uses 1/128 of the lanes and dominated the kernel)."""
    n_kp = out_ref.shape[0]
    rows_i = jax.lax.broadcasted_iota(
        jnp.int32, (8, 64, PATCH_H), 2).astype(jnp.float32)
    cols_i = jax.lax.broadcasted_iota(
        jnp.int32, (8, 64, PATCH_W), 2).astype(jnp.float32)
    px = px_ref[:, :]                                     # (8, 64)
    py = py_ref[:, :]

    def body(k, _):
        y0 = pl.multiple_of(y0_ref[k], 8)
        xoff = xoff_ref[k]                 # original-x of patch lane 0
        x0 = pl.multiple_of(xoff - 64 * sel_ref[k], 128)  # lane origin
        patch = img_ref[sel_ref[k], pl.ds(y0, PATCH_H), pl.ds(x0, PATCH_W)]
        ca = ca_ref[k]
        sa = sa_ref[k]
        # Rotated global sample positions, then patch-local (float compare
        # against float iota avoids int lane ops).
        gx = jnp.round(px * ca - py * sa) + cx_ref[k]        # (8, 64)
        gy = jnp.round(px * sa + py * ca) + cy_ref[k]
        gx = jnp.clip(gx, 0.0, float(orig_w - 1)) - xoff.astype(jnp.float32)
        gy = jnp.clip(gy, 0.0, float(orig_h - 1)) - y0.astype(jnp.float32)
        gx = jnp.clip(gx, 0.0, PATCH_W - 1.0)
        gy = jnp.clip(gy, 0.0, PATCH_H - 1.0)
        oh_y = (rows_i == gy[:, :, None]).astype(jnp.float32)  # (8,64,H)
        oh_x = (cols_i == gx[:, :, None]).astype(jnp.float32)  # (8,64,W)
        # HIGHEST precision: the MXU's default bf16 passes would truncate the
        # sampled VALUES (the one-hot makes this matmul an exact selection).
        rows = jax.lax.dot_general(
            oh_y, patch, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (8,64,W)
        out_ref[k] = jnp.sum(rows * oh_x, axis=2)             # (8,64)
        return 0

    jax.lax.fori_loop(0, n_kp, body, 0)


def _pattern_cols():
    """(8, 64) f32 pattern x/y offsets: A pattern samples then B, row-major
    (sample s lives at [s // 64, s % 64] — matching the (K, 8, 64) kernel
    output which reshapes back to (K, 512)).

    Built from the numpy pattern (NOT the jnp module constants) so calling
    under a trace never caches tracers."""
    import numpy as np

    from . import fast_orb as fo
    px = np.concatenate([fo._PATTERN[:, 0], fo._PATTERN[:, 2]]).astype(
        np.float32).reshape(8, 64)
    py = np.concatenate([fo._PATTERN[:, 1], fo._PATTERN[:, 3]]).astype(
        np.float32).reshape(8, 64)
    return jnp.asarray(px), jnp.asarray(py)


def _ceil(a: int, m: int) -> int:
    return (a + m - 1) // m * m


def _stacked_copies(img: jnp.ndarray) -> jnp.ndarray:
    """(2, Hp, Wp): copy 0 = edge-padded image; copy 1 = shifted left by 64
    lanes. Padding bounds: y0 <= ((h-1-19)//8)*8 so Hp >= y0max + 48;
    x0 <= ((w-1)//128)*128 so Wp = ceil(w/128)*128 suffices for x0+128."""
    h, w = img.shape
    hp = _ceil(h + PATCH_H - 8, 8)
    wp = _ceil(max(w, 2 * PATCH_W), PATCH_W)
    img0 = jnp.pad(img, ((0, hp - h), (0, wp - w)), mode="edge")
    img1 = jnp.pad(img0[:, 64:], ((0, 0), (0, 64)), mode="edge")
    return jnp.stack([img0, img1])


def _origins(ix, iy, h: int, w: int):
    """Per-keypoint (y0, xoff, sel): y0 = sublane-aligned row origin;
    sel picks the image copy whose 128-lane tile contains the +-19 px
    window; xoff = ORIGINAL x coordinate of that tile's lane 0.

    Keypoints with x in [19+64k-45, ...) near a tile boundary use the
    shifted copy: x mod 128 in [19, 109) -> copy 0, else copy 1 (where the
    window provably fits because extraction enforces a 19 px border)."""
    xm = ix % PATCH_W
    fits0 = (xm >= MARGIN) & (xm < PATCH_W - MARGIN)
    sel = jnp.where(fits0, 0, 1).astype(jnp.int32)
    x_sel = jnp.where(fits0, ix, ix - 64)          # coordinate inside copy
    x0 = (jnp.maximum(x_sel, 0) // PATCH_W) * PATCH_W
    xoff = x0 + 64 * sel                           # original-x of lane 0
    y0 = (jnp.clip(iy - MARGIN, 0, h) // 8) * 8
    return (y0.astype(jnp.int32), xoff.astype(jnp.int32), sel)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brief_sample(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                 ca: jnp.ndarray, sa: jnp.ndarray,
                 cy: jnp.ndarray, cx: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Rotate + sample the 512 BRIEF positions per keypoint.

    img: the ORIGINAL (H, W) float32 level image. ix/iy: (K,) int32 integer
    keypoint centers. ca/sa: (K,) float32 cos/sin of the keypoint angle;
    cy/cx: (K,) float32 PRE-ROUNDED keypoint centers.
    Returns (K, 512) float32 samples (A pattern cols 0-255, B 256-511).
    """
    orig_h, orig_w = img.shape
    stack = _stacked_copies(img)
    y0, xoff, sel = _origins(ix, iy, orig_h, orig_w)
    k = ix.shape[0]
    px, py = _pattern_cols()
    kern = functools.partial(_kernel, orig_h=orig_h, orig_w=orig_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,      # y0, xoff, sel, ca, sa, cy, cx in SMEM
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # stacked image copies
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pattern x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pattern y
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, 8, 64), jnp.float32),
        interpret=interpret,
    )(y0, xoff, sel, ca, sa, cy, cx, stack, px, py)
    return out.reshape(k, 512)


def tpu_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
