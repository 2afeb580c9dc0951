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


class OptimizeSim3Result(NamedTuple):
    R: jnp.ndarray            # refined rotation, x_q = s R x_c + t
    t: jnp.ndarray
    s: jnp.ndarray
    inliers_a: jnp.ndarray    # (M,) forward-direction inlier mask
    n_inliers: jnp.ndarray    # pairs inlying in every active direction


def optimize_sim3(R0, t0, s0,
                  p_c, uv_q, invs2_a, valid_a, R_qw, t_qw,
                  p_q, uv_c, invs2_b, valid_b, R_cw, t_cw,
                  cam_params, fix_scale: bool = False,
                  th2: float = 10.0, n_iters: int = 10) -> OptimizeSim3Result:
    """Nonlinear Sim3 refinement from guided-projection matches.

    Replaces ``Optimizer::OptimizeSim3`` (/root/reference/src/Optimizer.cc:4195):
    the reference builds a g2o graph with one VertexSim3Expmap and paired
    forward/backward EdgeSim3ProjectXYZ edges, Huber delta sqrt(10), and two
    solve rounds with outlier removal. Here both residual directions are
    batched rows of one Gauss-Newton iteration (soft IRLS Huber weights), run
    under ``lax.fori_loop`` with static shapes; at the midpoint iteration any
    PAIR with chi2 above ``th2`` in an active direction is hard-dropped for
    the remaining iterations — the static-shape equivalent of the reference's
    second round after ``removeEdge`` (gross outliers keep zero influence,
    not the sqrt(th2/chi2) Huber floor).

    Convention: the optimized transform ``U = (R, t, s)`` maps CANDIDATE-side
    world points into the QUERY-side world, ``x_q = s R x_c + t`` (the
    world-to-world analogue of the reference's camera-frame gScm).

    Direction A (M rows): candidate landmarks ``p_c`` are moved through U and
    projected into the query keyframe ``(R_qw, t_qw)``; residual against the
    matched query keypoint ``uv_q``. Direction B: query landmarks ``p_q`` are
    moved through U^{-1} and projected into the candidate keyframe; residual
    against the candidate keypoint ``uv_c``. ``invs2_*`` are per-row
    information weights (1/sigma^2 of the keypoint's pyramid level).

    Returns the refined transform and the count of pairs that are chi2<th2
    inliers in direction A and, where ``valid_b``, in direction B too.
    """
    fx, fy = cam_params[0], cam_params[1]

    def proj_residual(Rcw, tcw, p_world, uv, w):
        """Point in some world -> camera -> pixel residual + J wrt the point
        (in that world). Returns r (M,2), Jp (M,2,3), chi2 (M,)."""
        pc = jnp.einsum("ij,mj->mi", Rcw, p_world) + tcw
        z = jnp.maximum(pc[:, 2], 1e-6)
        inv_z = 1.0 / z
        u = fx * pc[:, 0] * inv_z + cam_params[2]
        v = fy * pc[:, 1] * inv_z + cam_params[3]
        r = jnp.stack([u, v], -1) - uv
        # d(pixel)/d(cam point), (M, 2, 3).
        zeros = jnp.zeros_like(inv_z)
        Jpi = jnp.stack([
            jnp.stack([fx * inv_z, zeros, -fx * pc[:, 0] * inv_z ** 2], -1),
            jnp.stack([zeros, fy * inv_z, -fy * pc[:, 1] * inv_z ** 2], -1),
        ], 1)
        Jp = jnp.einsum("mab,bc->mac", Jpi, Rcw)
        chi2 = (r * r).sum(-1) * w
        return r, Jp, chi2

    def step(i, carry):
        R, t, s, act = carry
        # ---- direction A: y = U(p_c); residual in the query camera. ----
        y = s * jnp.einsum("ij,mj->mi", R, p_c) + t
        rA, JpA, chi2A = proj_residual(R_qw, t_qw, y, uv_q, invs2_a)
        # d y / d (omega, nu, lambda) = [-[y]x, I, y]  (left perturbation).
        JyA = jnp.concatenate([
            -_batch_skew(y), jnp.broadcast_to(jnp.eye(3), y.shape + (3,)),
            y[:, :, None]], -1)                              # (M, 3, 7)
        JA = jnp.einsum("mab,mbc->mac", JpA, JyA)            # (M, 2, 7)
        wA = _huber_w(chi2A, th2) * invs2_a * valid_a * act

        # ---- direction B: z = U^{-1}(p_q); residual in candidate camera. --
        Rt = R.T
        z3 = (1.0 / s) * jnp.einsum("ij,mj->mi", Rt, p_q - t)
        rB, JpB, chi2B = proj_residual(R_cw, t_cw, z3, uv_c, invs2_b)
        # d z / d delta = (1/s) R^T [ [p_q]x, -I, -p_q ].
        JzB = jnp.concatenate([
            _batch_skew(p_q), jnp.broadcast_to(-jnp.eye(3), p_q.shape + (3,)),
            -p_q[:, :, None]], -1)
        JzB = (1.0 / s) * jnp.einsum("ij,mjc->mic", Rt, JzB)
        JB = jnp.einsum("mab,mbc->mac", JpB, JzB)
        wB = _huber_w(chi2B, th2) * invs2_b * valid_b * act

        H = (jnp.einsum("mac,m,mab->cb", JA, wA, JA, precision=_HI)
             + jnp.einsum("mac,m,mab->cb", JB, wB, JB, precision=_HI))
        b = (jnp.einsum("mac,m,ma->c", JA, wA, rA, precision=_HI)
             + jnp.einsum("mac,m,ma->c", JB, wB, rB, precision=_HI))
        if fix_scale:
            mask = jnp.ones(7).at[6].set(0.0)
            H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            b = b * mask
        H = H + 1e-6 * jnp.eye(7)
        delta = -jnp.linalg.solve(H, b)                      # (omega, nu, lam)
        from . import lie
        xi = jnp.concatenate([delta[3:6], delta[:3], delta[6:7]])  # Sophus
        Rd, td, sd = lie.sim3_exp(xi)
        Rn, tn, sn = lie.sim3_mul(Rd, td, sd, R, t, jnp.asarray(s))
        # Midpoint outlier-removal round (reference's removeEdge pass): a
        # pair whose chi2 exceeds th2 in any active direction is frozen out
        # of the remaining iterations.
        good = ((chi2A < th2) | ~valid_a.astype(bool)) & \
            ((chi2B < th2) | ~valid_b.astype(bool))
        act = jnp.where(i == n_iters // 2 - 1, act & good, act)
        return Rn, tn, sn, act

    R0 = jnp.asarray(R0, jnp.float32)
    t0 = jnp.asarray(t0, jnp.float32)
    s0 = jnp.asarray(s0, jnp.float32)
    act0 = jnp.ones(p_c.shape[0], bool)
    R, t, s, _ = jax.lax.fori_loop(0, n_iters, step, (R0, t0, s0, act0))

    # Final inlier classification (both directions where present).
    y = s * jnp.einsum("ij,mj->mi", R, p_c) + t
    _, _, chi2A = _proj_chi2(R_qw, t_qw, y, uv_q, invs2_a, cam_params)
    z3 = (1.0 / s) * jnp.einsum("ij,mj->mi", R.T, p_q - t)
    _, _, chi2B = _proj_chi2(R_cw, t_cw, z3, uv_c, invs2_b, cam_params)
    inl_a = valid_a & (chi2A < th2)
    inl = inl_a & jnp.where(valid_b, chi2B < th2, True)
    return OptimizeSim3Result(R=R, t=t, s=s, inliers_a=inl_a,
                              n_inliers=inl.sum())


def _batch_skew(v):
    zeros = jnp.zeros_like(v[:, 0])
    return jnp.stack([
        jnp.stack([zeros, -v[:, 2], v[:, 1]], -1),
        jnp.stack([v[:, 2], zeros, -v[:, 0]], -1),
        jnp.stack([-v[:, 1], v[:, 0], zeros], -1)], 1)


def _huber_w(chi2, th2):
    """IRLS weight of the Huber loss at squared error chi2, knee th2."""
    return jnp.where(chi2 <= th2, 1.0,
                     jnp.sqrt(th2 / jnp.maximum(chi2, 1e-12)))


def _proj_chi2(Rcw, tcw, p_world, uv, w, cam_params):
    pc = jnp.einsum("ij,mj->mi", Rcw, p_world) + tcw
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = cam_params[0] * pc[:, 0] / z + cam_params[2]
    v = cam_params[1] * pc[:, 1] / z + cam_params[3]
    r = jnp.stack([u, v], -1) - uv
    chi2 = (r * r).sum(-1) * w
    return r, pc, chi2


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
