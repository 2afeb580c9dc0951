"""Multi-view geometry kernels: triangulation, H/F RANSAC, two-view init.

Replaces the reference's ``GeometricTools`` (/root/reference/src/GeometricTools.cc)
and ``TwoViewReconstruction`` (/root/reference/src/TwoViewReconstruction.cc).

The reference races two CPU threads scoring homography vs fundamental RANSAC
(:124-125). Here every hypothesis of BOTH models is scored in one vmapped
batch — 200 iterations x 8-point solves are a few hundred small SVDs, ideal
for a single fused XLA program.

Behaviour constants (SURVEY Appendix A): 200 iters, 8-point samples, sigma=1,
H score th 5.991 both directions, F th 3.841 / thScore 5.991,
RH = SH/(SH+SF) > 0.5 picks H; accept pose with >=50 triangulated points,
parallax >= 1 deg, dominance checks (ReconstructF :569).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _mv(A, v):
    return jnp.einsum("...ij,...j->...i", A, v, precision=_HI)


# ---------------------------------------------------------------------------
# Triangulation (GeometricTools::Triangulate parity, GeometricTools.h:48-51)
# ---------------------------------------------------------------------------

def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray,
                    x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """DLT triangulation. P1, P2: (3, 4) projection matrices;
    x1, x2: (..., 2) normalized or pixel coords consistent with P. -> (..., 3).
    """
    rows = jnp.stack([
        x1[..., 0, None] * P1[2] - P1[0],
        x1[..., 1, None] * P1[2] - P1[1],
        x2[..., 0, None] * P2[2] - P2[0],
        x2[..., 1, None] * P2[2] - P2[1],
    ], axis=-2)  # (..., 4, 4)
    # Solution = right singular vector with smallest singular value.
    _, _, vt = jnp.linalg.svd(rows)
    Xh = vt[..., 3, :]
    w = Xh[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return Xh[..., :3] / w[..., None]


def projection_matrix(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """P = K [R | t] — world-to-camera convention (Tcw)."""
    return _mm(K, jnp.concatenate([R, t[..., None]], axis=-1))


# ---------------------------------------------------------------------------
# Normalization (TwoViewReconstruction::Normalize :251-286 behaviour)
# ---------------------------------------------------------------------------

def normalize_points(x: jnp.ndarray, mask: jnp.ndarray):
    """Mean-center and scale to unit mean absolute deviation per axis.

    Returns (xn, T) with xn = T * x in homogeneous sense. mask: (N,) weights.
    """
    wsum = jnp.maximum(mask.sum(), 1.0)
    mean = (x * mask[:, None]).sum(0) / wsum
    dev = (jnp.abs(x - mean) * mask[:, None]).sum(0) / wsum
    s = 1.0 / jnp.where(dev < 1e-9, 1e-9, dev)
    xn = (x - mean) * s
    T = jnp.array([[s[0], 0.0, -mean[0] * s[0]],
                   [0.0, s[1], -mean[1] * s[1]],
                   [0.0, 0.0, 1.0]], jnp.float32)
    T = jnp.stack([
        jnp.stack([s[0], jnp.zeros(()), -mean[0] * s[0]]),
        jnp.stack([jnp.zeros(()), s[1], -mean[1] * s[1]]),
        jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.ones(())]),
    ])
    return xn, T


# ---------------------------------------------------------------------------
# Minimal solvers (batched over hypotheses via vmap)
# ---------------------------------------------------------------------------

def homography_dlt(x1: jnp.ndarray, x2: jnp.ndarray,
                   w: jnp.ndarray | None = None) -> jnp.ndarray:
    """H from >=4 correspondences (uses all rows given). x: (S, 2). -> (3,3)
    with x2 ~ H x1. Optional per-pair weights w zero-out rows (inlier refit).
    (ComputeH21 :287-337 behaviour.)"""
    s = x1.shape[0]
    zeros = jnp.zeros((s,), x1.dtype)
    ones = jnp.ones((s,), x1.dtype)
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    rows_a = jnp.stack([zeros, zeros, zeros, -u1, -v1, -ones, v2 * u1, v2 * v1, v2], -1)
    rows_b = jnp.stack([u1, v1, ones, zeros, zeros, zeros, -u2 * u1, -u2 * v1, -u2], -1)
    if w is not None:
        rows_a = rows_a * w[:, None]
        rows_b = rows_b * w[:, None]
    A = jnp.concatenate([rows_a, rows_b], 0)  # (2S, 9)
    _, _, vt = jnp.linalg.svd(A)
    return vt[8].reshape(3, 3)


def fundamental_8pt(x1: jnp.ndarray, x2: jnp.ndarray,
                    w: jnp.ndarray | None = None) -> jnp.ndarray:
    """F from >=8 correspondences with rank-2 projection. x2^T F x1 = 0.
    Optional per-pair weights w zero-out rows (inlier refit).
    (ComputeF21 :338-380 behaviour.)"""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], -1)
    if w is not None:
        A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A)
    F = vt[8].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return _mm(U * S[None, :], Vt)


# ---------------------------------------------------------------------------
# Hypothesis scoring (CheckHomography :382-473, CheckFundamental :474-568)
# ---------------------------------------------------------------------------

def score_homography(H: jnp.ndarray, x1, x2, mask, sigma: float = 1.0):
    th = 5.991
    inv_s2 = 1.0 / (sigma * sigma)
    Hinv = jnp.linalg.inv(H)

    def transfer(Hm, a, b):
        ah = jnp.concatenate([a, jnp.ones_like(a[:, :1])], -1)
        p = ah @ Hm.T
        w = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        return jnp.sum((b - p[:, :2] / w[:, None]) ** 2, -1)

    chi1 = transfer(H, x1, x2) * inv_s2
    chi2 = transfer(Hinv, x2, x1) * inv_s2
    ok = (chi1 <= th) & (chi2 <= th) & mask
    score = jnp.where(ok, (th - chi1) + (th - chi2), 0.0).sum()
    return score, ok


def score_fundamental(F: jnp.ndarray, x1, x2, mask, sigma: float = 1.0):
    th = 3.841
    th_score = 5.991
    inv_s2 = 1.0 / (sigma * sigma)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], -1)
    l2 = x1h @ F.T        # epipolar line in image 2
    l1 = x2h @ F          # epipolar line in image 1
    d2 = (jnp.sum(l2 * x2h, -1) ** 2) / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d1 = (jnp.sum(l1 * x1h, -1) ** 2) / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    chi1 = d1 * inv_s2
    chi2 = d2 * inv_s2
    ok = (chi1 <= th) & (chi2 <= th) & mask
    score = jnp.where(chi1 <= th, th_score - chi1, 0.0) \
        + jnp.where(chi2 <= th, th_score - chi2, 0.0)
    score = jnp.where(mask, score, 0.0).sum()
    return score, ok


# ---------------------------------------------------------------------------
# RANSAC driver
# ---------------------------------------------------------------------------

def _sample_indices(key, n_iters, sample_size, weights):
    """(n_iters, sample_size) indices drawn from valid correspondences."""
    keys = jax.random.split(key, n_iters)

    def draw(k):
        return jax.random.choice(k, weights.shape[0], (sample_size,),
                                 replace=False, p=weights / weights.sum())

    return jax.vmap(draw)(keys)


def ransac_two_models(key, x1, x2, mask, n_iters: int = 200, sigma: float = 1.0):
    """Score all H and F hypotheses in parallel; return the best of each.

    x1, x2: (N, 2) undistorted pixel coords; mask: (N,) valid pairs.
    Returns dict with best H, F, their scores and inlier masks.
    """
    w = mask.astype(jnp.float32) + 1e-9
    idx = _sample_indices(key, n_iters, 8, w)  # (I, 8)

    x1n, T1 = normalize_points(x1, mask.astype(jnp.float32))
    x2n, T2 = normalize_points(x2, mask.astype(jnp.float32))
    T2inv = jnp.linalg.inv(T2)

    def one_h(sample):
        Hn = homography_dlt(x1n[sample], x2n[sample])
        H = _mm(_mm(T2inv, Hn), T1)
        return H / jnp.where(jnp.abs(H[2, 2]) < 1e-9, 1e-9, H[2, 2])

    def one_f(sample):
        Fn = fundamental_8pt(x1n[sample], x2n[sample])
        return _mm(_mm(T2.T, Fn), T1)

    Hs = jax.vmap(one_h)(idx)
    Fs = jax.vmap(one_f)(idx)
    h_scores, h_inl = jax.vmap(lambda H: score_homography(H, x1, x2, mask, sigma))(Hs)
    f_scores, f_inl = jax.vmap(lambda F: score_fundamental(F, x1, x2, mask, sigma))(Fs)
    bi_h = jnp.argmax(h_scores)
    bi_f = jnp.argmax(f_scores)

    # Inlier refit (deviation from the reference, which keeps the raw 8-point
    # model): re-solve each winning model on all its inliers and keep the
    # refit iff it scores better. Cuts the systematic pose error of the
    # minimal sample roughly in half at sigma~0.5 px.
    w_h = h_inl[bi_h].astype(jnp.float32)
    Hn_r = homography_dlt(x1n, x2n, w_h)
    H_r = _mm(_mm(T2inv, Hn_r), T1)
    H_r = H_r / jnp.where(jnp.abs(H_r[2, 2]) < 1e-9, 1e-9, H_r[2, 2])
    sh_r, h_inl_r = score_homography(H_r, x1, x2, mask, sigma)
    w_f = f_inl[bi_f].astype(jnp.float32)
    Fn_r = fundamental_8pt(x1n, x2n, w_f)
    F_r = _mm(_mm(T2.T, Fn_r), T1)
    sf_r, f_inl_r = score_fundamental(F_r, x1, x2, mask, sigma)

    h_better = sh_r > h_scores[bi_h]
    f_better = sf_r > f_scores[bi_f]
    # NOTE: "SH"/"SF" stay the RAW minimal-sample scores. The H-vs-F model
    # selection ratio RH must use them: a refit F on a planar scene is fit
    # within the degenerate F-family and would beat H spuriously.
    return {
        "H": jnp.where(h_better, H_r, Hs[bi_h]),
        "SH": h_scores[bi_h],
        "h_inliers": jnp.where(h_better, h_inl_r, h_inl[bi_h]),
        "F": jnp.where(f_better, F_r, Fs[bi_f]),
        "SF": f_scores[bi_f],
        "f_inliers": jnp.where(f_better, f_inl_r, f_inl[bi_f]),
    }


# ---------------------------------------------------------------------------
# Pose recovery (ReconstructF :569-700, ReconstructH/Faugeras :701-900,
# CheckRT :901-1100 behaviour)
# ---------------------------------------------------------------------------

def check_rt(R, t, x1, x2, K, mask, sigma2: float = 1.0, th_parallax_cos=0.99998):
    """Triangulate under candidate (R, t) and count good points.

    Returns (n_good, parallax_deg, points3d (N,3), good_mask). Mirrors CheckRT:
    depth>0 in both frames, finite, reprojection chi2 < 4*sigma2 in both,
    parallax cos < 0.99998 for 'good'; reported parallax is the 50th-smallest
    (we use the median of good points).
    """
    eye_R, zero_t = jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32)
    P1 = projection_matrix(K, eye_R, zero_t)
    P2 = projection_matrix(K, R, t)
    X = triangulate_dlt(P1, P2, x1, x2)  # world = cam1 frame
    finite = jnp.isfinite(X).all(-1)

    C1 = jnp.zeros(3)
    C2 = -_mv(R.T, t)
    n1 = X - C1
    n2 = X - C2
    cos_par = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12)

    z1 = X[:, 2]
    Xc2 = _mv(R, X) + t
    z2 = Xc2[:, 2]

    def reproj_err(P, x_obs, Xw):
        Xh = jnp.concatenate([Xw, jnp.ones_like(Xw[:, :1])], -1)
        p = Xh @ P.T
        w_ = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        return jnp.sum((x_obs - p[:, :2] / w_[:, None]) ** 2, -1)

    e1 = reproj_err(P1, x1, X)
    e2 = reproj_err(P2, x2, X)
    has_parallax = cos_par < th_parallax_cos
    # Reference semantics (CheckRT :35-94): negative depth only rejects points
    # that HAVE parallax; low-parallax points still count toward nGood if the
    # reprojection fits, but only parallax points become landmarks (vbGood).
    depth_ok = ((z1 > 0) | ~has_parallax) & ((z2 > 0) | ~has_parallax)
    counted = (mask & finite & depth_ok
               & (e1 < 4.0 * sigma2) & (e2 < 4.0 * sigma2))
    good = counted & has_parallax
    n_good = counted.sum()
    # Parallax report: 50th-LARGEST angle among counted points (reference
    # sorts cosines ascending and indexes min(50, size-1)).
    par_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_par, -1.0, 1.0)))
    par_sorted = jnp.sort(jnp.where(counted, par_deg, -1.0))[::-1]  # descending
    k = jnp.minimum(50, jnp.maximum(n_good - 1, 0))
    parallax = jnp.where(n_good > 0, par_sorted[k], 0.0)
    return n_good, parallax, X, good


def decompose_fundamental(F: jnp.ndarray, K: jnp.ndarray):
    """E = K^T F K -> 4 candidate (R, t) with unit-norm t."""
    E = _mm(_mm(K.T, F), K)
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    R1 = _mm(_mm(U, W), Vt)
    R2 = _mm(_mm(U, W.T), Vt)
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_homography(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras SVD decomposition -> 8 candidate (R, t) (ReconstructH parity)."""
    A = _mm(_mm(jnp.linalg.inv(K), H), K)
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / (d1 * d1 - d3 * d3), 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / (d1 * d1 - d3 * d3), 0.0, None))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' > 0
    aux_stheta = jnp.sqrt(jnp.clip(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)) / ((d1 + d3) * d2)
    ctheta = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2)
    for i in range(4):
        stheta = jnp.array([1.0, -1.0, -1.0, 1.0])[i] * aux_stheta
        Rp = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        Rp = Rp.at[0, 0].set(ctheta).at[0, 2].set(-stheta)
        Rp = Rp.at[2, 0].set(stheta).at[2, 2].set(ctheta)
        tp = jnp.stack([x1s[i], jnp.zeros(()), -x3s[i]]) * (d1 - d3)
        R = s * _mm(_mm(U, Rp), Vt)
        t = _mv(U, tp)
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' < 0
    aux_sphi = jnp.sqrt(jnp.clip(
        (d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0, None)) / ((d1 - d3) * d2)
    cphi = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2)
    for i in range(4):
        sphi = jnp.array([1.0, -1.0, -1.0, 1.0])[i] * aux_sphi
        Rp = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
        Rp = Rp.at[0, 0].set(cphi).at[0, 2].set(sphi)
        Rp = Rp.at[2, 0].set(sphi).at[2, 2].set(-cphi)
        tp = jnp.stack([x1s[i], jnp.zeros(()), x3s[i]]) * (d1 + d3)
        R = s * _mm(_mm(U, Rp), Vt)
        t = _mv(U, tp)
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


class TwoViewResult(NamedTuple):
    success: jnp.ndarray    # () bool
    R: jnp.ndarray          # (3, 3) cam1->cam2
    t: jnp.ndarray          # (3,)
    points: jnp.ndarray     # (N, 3) in cam1 frame
    good: jnp.ndarray       # (N,) triangulated-inlier mask
    used_h: jnp.ndarray     # () bool


def two_view_reconstruct(key, x1, x2, K, mask, n_iters: int = 200,
                         sigma: float = 1.0,
                         min_triangulated: int = 50) -> TwoViewResult:
    """Full monocular initialization (Reconstruct :49-150 behaviour).

    Deviation from the reference (documented): instead of committing to H or F
    purely on the RH = SH/(SH+SF) > 0.5 score ratio, BOTH families are
    decomposed and cheirality-checked (cheap once batched), and a family is
    only chosen if its best candidate actually reconstructs (enough good
    points, dominant over its runner-up, parallax >= 1 deg). RH remains the
    tiebreak when both families pass. The score-only rule mis-picks F on
    low-noise planar scenes, where the F decomposition then reconstructs
    nothing; reference behaviour there is a failed init, ours succeeds via H.
    """
    models = ransac_two_models(key, x1, x2, mask, n_iters, sigma)
    rh = models["SH"] / jnp.maximum(models["SH"] + models["SF"], 1e-9)

    Rs_f, ts_f = decompose_fundamental(models["F"], K)
    Rs_h, ts_h = decompose_homography(models["H"], K)
    sigma2 = sigma * sigma

    def family_best(Rs, ts, inl):
        n_good, parallax, Xs, goods = jax.vmap(
            lambda R, t: check_rt(R, t, x1, x2, K, inl, sigma2))(Rs, ts)
        best = jnp.argmax(n_good)
        second = jnp.sort(n_good)[-2]
        n_inl = inl.sum()
        n_min = jnp.maximum(jnp.int32(min_triangulated),
                            (0.9 * n_inl).astype(jnp.int32))
        ok = (n_good[best] >= n_min) & (second < 0.75 * n_good[best]) \
            & (parallax[best] > 1.0) & (n_good[best] > 0)
        return ok, n_good[best], Rs[best], ts[best], Xs[best], goods[best]

    ok_h, n_h, R_h, t_h, X_h, g_h = family_best(Rs_h, ts_h, models["h_inliers"])
    ok_f, n_f, R_f, t_f, X_f, g_f = family_best(Rs_f, ts_f, models["f_inliers"])

    prefer_h = jnp.where(ok_h & ok_f, rh > 0.50, ok_h)
    success = ok_h | ok_f

    def pick(a, b):
        return jax.tree.map(lambda u, v: jnp.where(prefer_h, u, v), a, b)

    R, t, X, good = pick((R_h, t_h, X_h, g_h), (R_f, t_f, X_f, g_f))
    return TwoViewResult(
        success=success, R=R, t=t, points=X,
        good=good & success, used_h=prefer_h & success)
