"""Closed-form Sim3/SE3 alignment + RANSAC between matched 3D point sets.

Replaces ``Sim3Solver`` (/root/reference/src/Sim3Solver.cc): Horn's closed
form on 3-point samples, all RANSAC hypotheses scored in one vmapped batch
(the reference iterates up to 300 times sequentially, :iterate).
Used by loop closing / map merging for geometric verification.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def horn_sim3(pa: jnp.ndarray, pb: jnp.ndarray, w: jnp.ndarray,
              with_scale: bool = True):
    """Weighted Horn alignment: find (R, t, s) with pb ~ s R pa + t.

    pa, pb: (N, 3); w: (N,) weights. Closed form via SVD of the weighted
    covariance (same math as Sim3Solver::ComputeSim3, expressed matrix-wise).
    """
    wsum = jnp.maximum(w.sum(), 1e-9)
    mu_a = (pa * w[:, None]).sum(0) / wsum
    mu_b = (pb * w[:, None]).sum(0) / wsum
    ac = pa - mu_a
    bc = pb - mu_b
    cov = jnp.einsum("ni,nj->ij", bc * w[:, None], ac, precision=_HI) / wsum
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.stack([1.0, 1.0, d]))
    R = U @ D @ Vt
    var_a = ((ac * ac).sum(-1) * w).sum() / wsum
    s = jnp.where(with_scale,
                  (S * jnp.diagonal(D)).sum() / jnp.maximum(var_a, 1e-12),
                  1.0)
    t = mu_b - s * R @ mu_a
    return R, t, s


class Sim3RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def sim3_ransac(key, pa, pb, mask, n_iters: int = 128,
                th: float = 0.05, with_scale: bool = True,
                min_inliers: int = 20) -> Sim3RansacResult:
    """RANSAC Horn alignment. pa, pb: (N, 3) matched points (world frames of
    two keyframes); th: relative 3D error gate (fraction of scene scale).

    The reference gates by REPROJECTION into both images (Sim3Solver
    CheckInliers); the 3D gate here is scale-normalized by the median point
    depth instead — cheaper and camera-model-free. Final acceptance of a loop
    candidate still happens through projection matching (pipeline layer).
    """
    n = pa.shape[0]
    w = mask.astype(jnp.float32) + 1e-9
    scene_scale = jnp.median(jnp.linalg.norm(
        pb - (pb * w[:, None]).sum(0) / w.sum(), axis=-1))
    abs_th = th * jnp.maximum(scene_scale, 1e-6)

    keys = jax.random.split(key, n_iters)

    def one(k):
        idx = jax.random.choice(k, n, (3,), replace=False, p=w / w.sum())
        ww = jnp.zeros((n,)).at[idx].set(1.0)
        R, t, s = horn_sim3(pa, pb, ww, with_scale)
        resid = jnp.linalg.norm(
            pb - (s * pa @ R.T + t), axis=-1)
        inl = (resid < abs_th) & mask
        return inl.sum(), R, t, s

    counts, Rs, ts, ss = jax.vmap(one)(keys)
    best = jnp.argmax(counts)

    # Refit on the best hypothesis' inliers.
    R0, t0, s0 = Rs[best], ts[best], ss[best]
    resid = jnp.linalg.norm(pb - (s0 * pa @ R0.T + t0), axis=-1)
    inl = (resid < abs_th) & mask
    R, t, s = horn_sim3(pa, pb, inl.astype(jnp.float32) + 1e-9, with_scale)
    resid = jnp.linalg.norm(pb - (s * pa @ R.T + t), axis=-1)
    inl = (resid < abs_th) & mask
    return Sim3RansacResult(R=R, t=t, s=jnp.asarray(s),
                            inliers=inl, n_inliers=inl.sum(),
                            ok=inl.sum() >= min_inliers)
