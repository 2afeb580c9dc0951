"""Rectified stereo matching: row-constrained Hamming + SAD subpixel refine.

Replaces ``Frame::ComputeStereoMatches`` (/root/reference/src/Frame.cc:1102):
row-bucketed candidate search (+-2 sigma levels), disparity range
[minD=0, maxD=bf/b], coarse gate at thOrbDist=(TH_HIGH+TH_LOW)/2=75, SAD
refinement over an 11x11 window sliding +-5 px with parabola fit, and the
1.5*1.4*median outlier sweep — all as one batched program.

Deviation (documented): SAD runs on the level-0 Gaussian-blurred image for
every keypoint instead of the keypoint's pyramid level (the reference scales
coordinates into the octave image, Frame.cc:1240-1270). Sub-pixel behaviour
at higher octaves is slightly different; disparities are still computed at
level-0 resolution.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import camera as cam
from . import geometry, matching

SCALE = 1.2
W_SAD = 5          # 11x11 window (w=5), Frame.cc:1247
SLIDE = 5          # +-5 px search
TH_ORB = (matching.TH_HIGH + matching.TH_LOW) // 2   # 75


class StereoMatchResult(NamedTuple):
    u_right: jnp.ndarray   # (N,) refined right-image u coord, -1 invalid
    depth: jnp.ndarray     # (N,) bf / disparity, -1 invalid
    valid: jnp.ndarray     # (N,)


def _gather_window(img, cx, cy, half: int):
    """(N,) centers -> (N, 2h+1, 2h+1) windows, border-clamped."""
    h, w = img.shape
    size = 2 * half + 1
    dy = jnp.arange(-half, half + 1)
    dx = jnp.arange(-half, half + 1)
    yy = jnp.clip(cy[:, None, None] + dy[None, :, None], 0, h - 1)
    xx = jnp.clip(cx[:, None, None] + dx[None, None, :], 0, w - 1)
    return img.reshape(-1)[(yy * w + xx).reshape(-1)].reshape(-1, size, size)


@functools.partial(jax.jit, static_argnames=())
def stereo_match(left_xy, left_level, left_desc, left_valid,
                 right_xy, right_level, right_desc, right_valid,
                 img_left, img_right, bf, min_z) -> StereoMatchResult:
    """bf: baseline*fx; min_z: closest depth (maxD = bf/min_z)."""
    n = left_xy.shape[0]
    sigma = SCALE ** left_level.astype(jnp.float32)

    # Row + disparity constraints (Frame.cc:1130-1166).
    dv = jnp.abs(left_xy[:, 1:2] - right_xy[None, :, 1])
    row_ok = dv <= 2.0 * sigma[:, None]
    disparity = left_xy[:, 0:1] - right_xy[None, :, 0]
    max_d = bf / min_z
    disp_ok = (disparity >= -1.0) & (disparity <= max_d)
    lvl_ok = jnp.abs(left_level[:, None] - right_level[None, :]) <= 1
    pair = row_ok & disp_ok & lvl_ok

    dist = matching.masked_hamming(left_desc, right_desc, left_valid,
                                   right_valid, pair)
    best, second, best_j = matching.best_two(dist)
    coarse_ok = best <= TH_ORB

    # SAD sub-pixel refinement around the coarse match.
    uL = jnp.round(left_xy[:, 0]).astype(jnp.int32)
    vL = jnp.round(left_xy[:, 1]).astype(jnp.int32)
    uR0 = jnp.round(right_xy[jnp.maximum(best_j, 0), 0]).astype(jnp.int32)

    patch_l = _gather_window(img_left, uL, vL, W_SAD)          # (N, 11, 11)
    # Right windows at uR0 + d for d in [-SLIDE, SLIDE].
    sads = []
    for d in range(-SLIDE, SLIDE + 1):
        patch_r = _gather_window(img_right, uR0 + d, vL, W_SAD)
        # Mean-normalized SAD like the reference (it subtracts the center).
        diff = jnp.abs((patch_l - patch_l[:, W_SAD:W_SAD + 1, W_SAD:W_SAD + 1])
                       - (patch_r - patch_r[:, W_SAD:W_SAD + 1,
                                            W_SAD:W_SAD + 1]))
        sads.append(diff.sum((-1, -2)))
    sad = jnp.stack(sads, -1)                                   # (N, 11)
    best_d = jnp.argmin(sad, -1)
    interior = (best_d > 0) & (best_d < 2 * SLIDE)
    im = jnp.clip(best_d, 1, 2 * SLIDE - 1)
    s_m1 = sad[jnp.arange(n), im - 1]
    s_0 = sad[jnp.arange(n), im]
    s_p1 = sad[jnp.arange(n), im + 1]
    denom = jnp.maximum(2.0 * (s_m1 + s_p1 - 2.0 * s_0), 1e-6)
    delta = (s_m1 - s_p1) / denom
    delta = jnp.clip(jnp.where(interior, delta, 0.0), -1.0, 1.0)

    u_right = uR0.astype(jnp.float32) + (im.astype(jnp.float32) - SLIDE) + delta
    disp = left_xy[:, 0] - u_right
    disp = jnp.where(disp <= 0.01, 0.01, disp)
    ok = coarse_ok & left_valid & (left_xy[:, 0] - u_right > 0.0) \
        & (left_xy[:, 0] - u_right <= max_d)

    # Median-based outlier sweep (Frame.cc vDistIdx tail: 1.5*1.4*median).
    sad_best = sad[jnp.arange(n), best_d]
    med = jnp.median(jnp.where(ok, sad_best, jnp.nan))
    med = jnp.nan_to_num(med, nan=1e9)
    ok = ok & (sad_best <= 1.5 * 1.4 * med)

    depth = jnp.where(ok, bf / disp, -1.0)
    return StereoMatchResult(
        u_right=jnp.where(ok, u_right, -1.0),
        depth=depth, valid=ok)


class FisheyeStereoResult(NamedTuple):
    depth: jnp.ndarray     # (N,) z in the LEFT camera frame, -1 invalid
    match_j: jnp.ndarray   # (N,) right-keypoint index, -1 invalid
    valid: jnp.ndarray     # (N,)


@jax.jit
def fisheye_stereo_match(xy_l, level_l, desc_l, valid_l,
                         xy_r, level_r, desc_r, valid_r,
                         cam_l, cam_r, R_rl, t_rl) -> FisheyeStereoResult:
    """Non-rectified (fisheye) stereo matching + triangulation.

    Replaces ``Frame::ComputeStereoFishEyeMatches`` (/root/reference/
    src/Frame.cc, Frame.h:349 — BFMatcher knn with 0.7 ratio) followed by
    ``KannalaBrandt8::TriangulateMatches`` (/root/reference/src/CameraModels/
    KannalaBrandt8.cpp:439): parallax gate (cos >= 0.9998 rejected), positive
    depth in BOTH cameras, and sigma-gated reprojection checks
    (chi2 < 5.991 * sigma^2 per view).

    Design deviation (documented): keypoints arrive already rectified onto
    each camera's virtual pinhole (KB8 unprojection happens once at
    extraction, pipeline/system.py ``_extract``), so rays and reprojection
    gates run in the virtual-pinhole frames — the same geometry as running
    the KB8 model per projection, with one kernel instead of many.

    xy_l/xy_r: virtual-pinhole pixel coords. cam_l/cam_r: (4,) [fx fy cx cy]
    per side. (R_rl, t_rl): left-cam -> right-cam transform (Tlr^{-1}).
    """
    n = xy_l.shape[0]
    dist = matching.masked_hamming(desc_l, desc_r, valid_l, valid_r)
    best, second, bj = matching.best_two(dist)
    acc = matching.ratio_test(best, second, 0.7) & (best <= TH_ORB)
    bj_safe = jnp.maximum(bj, 0)
    xy_rm = xy_r[bj_safe]

    # Rays in each camera frame.
    r1 = cam.pinhole_unproject(cam_l, xy_l)            # (N, 3), z = 1
    r2 = cam.pinhole_unproject(cam_r, xy_rm)
    r2_in_l = jnp.einsum("ji,nj->ni", R_rl, r2)        # R_rl^T r2
    cosp = jnp.sum(r1 * r2_in_l, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2_in_l, axis=-1),
        1e-9)
    parallax_ok = cosp < 0.9998                        # KannalaBrandt8.cpp:470

    # DLT triangulation in normalized coords: P1 = [I|0], P2 = [R_rl|t_rl].
    P1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)
    P2 = jnp.concatenate([R_rl, t_rl[:, None]], -1)
    X = geometry.triangulate_dlt(P1, P2, r1[:, :2] / r1[:, 2:],
                                 r2[:, :2] / r2[:, 2:])
    z1 = X[:, 2]
    X2 = jnp.einsum("ij,nj->ni", R_rl, X) + t_rl
    z2 = X2[:, 2]
    depth_ok = (z1 > 0) & (z2 > 0)

    # Sigma-gated reprojection checks (5.991 * sigma^2 per view).
    sigma2_l = SCALE ** (2.0 * level_l.astype(jnp.float32))
    sigma2_r = SCALE ** (2.0 * level_r[bj_safe].astype(jnp.float32))
    uv1 = cam.pinhole_project(cam_l, X)
    uv2 = cam.pinhole_project(cam_r, X2)
    e1 = jnp.sum((uv1 - xy_l) ** 2, -1)
    e2 = jnp.sum((uv2 - xy_rm) ** 2, -1)
    reproj_ok = (e1 <= 5.991 * sigma2_l) & (e2 <= 5.991 * sigma2_r)

    ok = acc & valid_l & parallax_ok & depth_ok & reproj_ok
    # Mutual-exclusion on the right keypoints: keep the lowest distance.
    ok = ok & matching.mutual_filter_from_best(best, bj, ok, xy_r.shape[0])
    return FisheyeStereoResult(
        depth=jnp.where(ok, z1, -1.0),
        match_j=jnp.where(ok, bj, -1),
        valid=ok)
