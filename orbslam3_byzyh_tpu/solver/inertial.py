"""Inertial factors and optimizers: preintegration residuals, inertial-only
initialization, tracking-time pose-inertial optimization.

Replaces the reference's IMU factor stack:
  * ``EdgeInertial`` 9-dim preintegration factor
    (/root/reference/src/G2oTypes.cc:594-700) and ``EdgeInertialGS`` with
    gravity direction + scale (G2oTypes.h:639)
  * ``Optimizer::InertialOptimization`` (scale/gravity/bias MAP,
    /root/reference/src/Optimizer.cc:3688,:3892,:4067)
  * ``Optimizer::PoseInertialOptimizationLastKeyFrame/Frame`` (:416,:983)
  * bias random-walk edges ``EdgeGyroRW/EdgeAccRW`` (G2oTypes.h:736,:778)

All states here are BODY frame (R_wb, p_w, v_w); camera<->body conversion via
Tbc happens at the pipeline boundary (the reference's ImuCamPose bundles
both; splitting keeps the solvers camera-model-free).

Jacobians come from jax.jacfwd on tangent perturbations — exactly the
linearization the reference hand-derives (G2oTypes.cc:617), at a fraction of
the code.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import imu, lie

_HI = jax.lax.Precision.HIGHEST


def _mv(A, v):
    return jnp.einsum("...ij,...j->...i", A, v, precision=_HI)


def inertial_residual(R_i, p_i, v_i, R_j, p_j, v_j, bg, ba, preint,
                      g_w=None) -> jnp.ndarray:
    """9-dim preintegration residual [r_dR, r_dV, r_dP] (EdgeInertial math).

    preint: an :class:`imu.PreintState` (possibly batched consistently with
    the pose args). bg/ba: the CURRENT bias estimate (correction applied via
    the preintegration's bias Jacobians).
    """
    if g_w is None:
        g_w = imu.GRAVITY_VEC
    t = preint.dT
    bias = jnp.concatenate([bg, ba], -1)
    dR = imu.delta_rotation(preint, bias, normalize=False)
    dV = imu.delta_velocity(preint, bias)
    dP = imu.delta_position(preint, bias)
    Ri_T = jnp.swapaxes(R_i, -1, -2)
    r_dR = lie.so3_log(jnp.matmul(jnp.swapaxes(dR, -1, -2),
                                  jnp.matmul(Ri_T, R_j, precision=_HI),
                                  precision=_HI))
    r_dV = _mv(Ri_T, v_j - v_i - g_w * t[..., None]) - dV
    r_dP = _mv(Ri_T, p_j - p_i - v_i * t[..., None]
               - 0.5 * g_w * (t * t)[..., None]) - dP
    return jnp.concatenate([r_dR, r_dV, r_dP], -1)


def preint_info_sqrt(preint, eps: float = 1e-8) -> jnp.ndarray:
    """Whitening matrix W with W^T W = C[:9,:9]^{-1} (edge information).

    Uses the inverse Cholesky of the (symmetrized, floored) covariance —
    same role as the reference's ``GetInformationMatrix`` (g2o edge info).
    """
    C = preint.C[..., :9, :9]
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    C = C + eps * jnp.eye(9, dtype=C.dtype)
    L = jnp.linalg.cholesky(C)
    eye = jnp.broadcast_to(jnp.eye(9, dtype=C.dtype), C.shape)
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return Linv  # r_white = Linv @ r


class InertialInitResult(NamedTuple):
    R_wg: jnp.ndarray      # (3, 3) gravity-direction rotation (world <- g-frame)
    scale: jnp.ndarray     # () map scale correction
    bg: jnp.ndarray        # (3,)
    ba: jnp.ndarray        # (3,)
    vel: jnp.ndarray       # (K, 3) body velocities
    cost: jnp.ndarray


def _stack_preints(preints):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *preints)


@functools.partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def inertial_only_optimization(R_wb, p_w, preints, prior_g: float,
                               prior_a: float, n_iters: int = 60,
                               fix_scale: bool = False
                               ) -> InertialInitResult:
    """MAP estimate of gravity direction, scale, biases and velocities with
    the visual map FROZEN (InertialOptimization, Optimizer.cc:3688).

    R_wb: (K, 3, 3) body rotations from vision; p_w: (K, 3) body positions
    (visual scale); preints: batched PreintState between consecutive KFs
    (K-1 entries). prior_g/prior_a: bias prior weights (1e2/1e10 etc.,
    LocalMapping.cc:241-293 schedule).
    """
    n_kf = R_wb.shape[0]
    Wsqrt = preint_info_sqrt(preints)     # (K-1, 9, 9)

    # Initial gravity direction from mean preintegrated velocity
    # (LocalMapping::InitializeIMU :1589): dirG = -sum R_i dV_i.
    dirG = -jnp.sum(jnp.einsum("kij,kj->ki", R_wb[:-1], preints.dV), 0)
    dirG = dirG / jnp.maximum(jnp.linalg.norm(dirG), 1e-9)
    gI = jnp.array([0.0, 0.0, -1.0])
    v_axis = jnp.cross(gI, dirG)
    v_axis = v_axis / jnp.maximum(jnp.linalg.norm(v_axis), 1e-9)
    ang = jnp.arccos(jnp.clip(jnp.dot(gI, dirG), -1.0, 1.0))
    Rwg0 = lie.so3_exp(v_axis * ang)

    # Initial velocities by finite differences (:1593-1597).
    dt = preints.dT
    v0 = (p_w[1:] - p_w[:-1]) / jnp.maximum(dt[:, None], 1e-6)
    v0 = jnp.concatenate([v0, v0[-1:]], 0)

    # Parameter vector: [theta_g (2), log_s (1), bg (3), ba (3), v (K*3)].
    x0 = jnp.concatenate([
        jnp.zeros(2), jnp.zeros(1), jnp.zeros(3), jnp.zeros(3),
        v0.reshape(-1)])

    def unpack(x):
        th = jnp.concatenate([x[:2], jnp.zeros(1)])
        Rwg = jnp.matmul(Rwg0, lie.so3_exp(th), precision=_HI)
        s = jnp.where(fix_scale, 1.0, jnp.exp(x[2]))
        bg = x[3:6]
        ba = x[6:9]
        v = x[9:].reshape(n_kf, 3)
        return Rwg, s, bg, ba, v

    def residuals(x):
        Rwg, s, bg, ba, v = unpack(x)
        g_w = _mv(Rwg, jnp.array([0.0, 0.0, -imu.GRAVITY]))
        r = inertial_residual(
            R_wb[:-1], s * p_w[:-1], v[:-1],
            R_wb[1:], s * p_w[1:], v[1:],
            jnp.broadcast_to(bg, (n_kf - 1, 3)),
            jnp.broadcast_to(ba, (n_kf - 1, 3)),
            preints, g_w=g_w)
        r_white = jnp.einsum("kij,kj->ki", Wsqrt, r, precision=_HI)
        prior = jnp.concatenate([
            jnp.sqrt(prior_g) * bg, jnp.sqrt(prior_a) * ba])
        return jnp.concatenate([r_white.reshape(-1), prior])

    def gn_cost(x):
        r = residuals(x)
        return jnp.sum(r * r)

    def step(x, lam, cost):
        J = jax.jacfwd(residuals)(x)
        r = residuals(x)
        H = J.T @ J
        b = -J.T @ r
        dx = jnp.linalg.solve(
            H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-9)), b)
        x_new = x + dx
        cost_new = gn_cost(x_new)
        accept = cost_new < cost
        x = jnp.where(accept, x_new, x)
        lam = jnp.where(accept, lam * 0.5, lam * 10.0)
        cost = jnp.where(accept, cost_new, cost)
        return x, lam, cost

    def body(_, st):
        return step(*st)

    x, _, cost = jax.lax.fori_loop(
        0, n_iters, body, (x0, jnp.asarray(1e-2, jnp.float32), gn_cost(x0)))
    Rwg, s, bg, ba, v = unpack(x)
    return InertialInitResult(R_wg=Rwg, scale=s, bg=bg, ba=ba, vel=v,
                              cost=cost)


class PoseInertialResult(NamedTuple):
    R: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    bg: jnp.ndarray
    ba: jnp.ndarray
    inlier: jnp.ndarray
    n_inliers: jnp.ndarray
    # Marginal information on the SOLVED frame's [pose, v, bg, ba] tangent —
    # the ConstraintPoseImu prior carried into the next frame's solve
    # (Optimizer::Marginalize, /root/reference/src/Optimizer.cc:1644, used
    # by PoseInertialOptimizationLastFrame :983-1283).
    H_marg: jnp.ndarray       # (15, 15)


@functools.partial(jax.jit, static_argnames=("n_rounds", "n_iters",
                                             "with_prior"))
def pose_inertial_optimization(
        R0, p0, v0, bg0, ba0,                 # current-frame initial state
        R_prev, p_prev, v_prev, bg_prev, ba_prev,  # previous state
        preint,                                # preintegration prev->cur
        pts_w, obs_uv, inv_sigma2, valid,      # visual obs in CURRENT frame
        cam_params, R_cb, t_cb,                # camera<-body extrinsics
        walk_info,                             # (6,) bias RW information
        prior_H=None,                          # (15,15) info on PREV state
        obs_ur=None, bf=None,                  # stereo rows (u_r per obs)
        n_rounds: int = 4, n_iters: int = 10,
        with_prior: bool = False) -> PoseInertialResult:
    """Tracking-time visual-inertial pose optimization
    (PoseInertialOptimizationLastKeyFrame/Frame, Optimizer.cc:416,:983).

    ``with_prior=False`` (LastKeyFrame variant): the previous state is FIXED
    and only the current frame's 15-dim tangent is optimized.

    ``with_prior=True`` (LastFrame variant): the previous frame is FREE,
    constrained by the marginalization prior ``prior_H`` (a ConstraintPoseImu
    whose linearization point is the previous state passed in); the joint
    30-dim system is solved and the previous frame is Schur-marginalized out.

    ``obs_ur``/``bf``: optional stereo rows — observations with
    ``obs_ur >= 0`` contribute the EdgeStereoOnlyPose 3-dim residual
    (u, v, u_r) with the reference's {15.6, 9.8, 7.815, 7.815} stereo chi2
    anneal (/root/reference/src/Optimizer.cc:1280-1283); mono rows keep the
    5.991 gate.

    Either way ``H_marg`` returns the marginal information on the solved
    frame, ready to be the next frame's prior.
    """
    from ..ops import camera as cam

    Wsqrt = preint_info_sqrt(preint)
    chi2_sched = jnp.asarray([5.991, 5.991, 5.991, 5.991])
    chi2_stereo_sched = jnp.asarray([15.6, 9.8, 7.815, 7.815])
    use_stereo = obs_ur is not None
    n_x = 30 if with_prior else 15
    if prior_H is None:
        prior_H = jnp.zeros((15, 15), jnp.float32)
    # Information square root of the prior. The carried H_marg is a float32
    # Schur complement that is only approximately PSD, so a plain Cholesky
    # can NaN and silently poison every following frame. Project to the PSD
    # cone via eigh (symmetrize, clamp eigenvalues at 0, trace-scaled
    # damping): L_prior @ L_prior.T == proj(prior_H) by construction.
    prior_H = 0.5 * (prior_H + prior_H.T)
    eigval, eigvec = jnp.linalg.eigh(prior_H)
    damp = 1e-6 * (1.0 + jnp.trace(prior_H) / 15.0)
    L_prior = eigvec * jnp.sqrt(jnp.maximum(eigval, 0.0) + damp)[None, :]

    def split_state(xc, Rb, pb, vb, bgb, bab):
        dpose, dv, dbg, dba = xc[:6], xc[6:9], xc[9:12], xc[12:15]
        dR, dp = lie.se3_exp(dpose)
        R = lie.normalize_rotation(jnp.matmul(dR, Rb, precision=_HI))
        return R, pb + dp, vb + dv, bgb + dbg, bab + dba

    def split(x):
        """Current-frame state from the tangent vector."""
        xc = x[15:] if with_prior else x
        return split_state(xc, R0, p0, v0, bg0, ba0)

    def split_prev(x):
        if with_prior:
            return split_state(x[:15], R_prev, p_prev, v_prev, bg_prev,
                               ba_prev)
        return R_prev, p_prev, v_prev, bg_prev, ba_prev

    def visual_residual(x):
        R, p, v, bg, ba = split(x)
        # Camera pose from body pose: Tcw = Tcb * Tbw.
        R_bw = jnp.swapaxes(R, -1, -2)
        t_bw = -_mv(R_bw, p)
        R_cw = jnp.matmul(R_cb, R_bw, precision=_HI)
        t_cw = _mv(R_cb, t_bw) + t_cb
        pc = pts_w @ R_cw.T + t_cw
        uv = cam.project(cam.PINHOLE, cam_params, pc)
        w = jnp.sqrt(inv_sigma2)
        r = (obs_uv - uv) * w[:, None]
        if use_stereo:
            # u_r = u - bf / z (EdgeStereoOnlyPose third row).
            ur_pred = uv[:, 0] - bf / jnp.maximum(pc[:, 2], 1e-6)
            has_ur = obs_ur >= 0.0
            r_ur = jnp.where(has_ur, (obs_ur - ur_pred) * w, 0.0)
            r = jnp.concatenate([r, r_ur[:, None]], -1)
        depth_ok = pc[:, 2] > 0.05
        return r, depth_ok

    def inertial_residual_x(x):
        R, p, v, bg, ba = split(x)
        Rp, pp, vp, bgp, bap = split_prev(x)
        r9 = inertial_residual(Rp, pp, vp, R, p, v, bg, ba, preint)
        r9w = Wsqrt @ r9
        r_rw = jnp.concatenate([(bg - bgp), (ba - bap)]) * \
            jnp.sqrt(walk_info)
        if not with_prior:
            return jnp.concatenate([r9w, r_rw])
        # EdgePriorPoseImu on the previous frame: its tangent deviation from
        # the prior's linearization point, whitened by the prior sqrt-info.
        r_prior = L_prior.T @ x[:15]
        return jnp.concatenate([r9w, r_rw, r_prior])

    def full_residual(x, inlier_w):
        rv, depth_ok = visual_residual(x)
        rv = rv * (inlier_w * depth_ok)[:, None]
        ri = inertial_residual_x(x)
        return jnp.concatenate([rv.reshape(-1), ri])

    inlier = valid
    x = jnp.zeros(n_x)
    for rd in range(n_rounds):
        if use_stereo:
            delta2 = jnp.where(obs_ur >= 0.0, chi2_stereo_sched[rd],
                               chi2_sched[rd])
        else:
            delta2 = chi2_sched[rd]
        inl_w = inlier.astype(jnp.float32)

        def res_fn(x_, w=inl_w):
            return full_residual(x_, w)

        def cost_fn(x_):
            r = res_fn(x_)
            return jnp.sum(r * r)

        lam = jnp.asarray(1e-3, jnp.float32)
        cost = cost_fn(x)

        def body(_, st):
            x_, lam_, cost_ = st
            J = jax.jacfwd(res_fn)(x_)
            r = res_fn(x_)
            H = J.T @ J
            b = -J.T @ r
            dx = jnp.linalg.solve(
                H + lam_ * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-9)), b)
            x_new = x_ + dx
            c_new = cost_fn(x_new)
            acc = c_new < cost_
            return (jnp.where(acc, x_new, x_),
                    jnp.where(acc, lam_ * 0.5, lam_ * 10.0),
                    jnp.where(acc, c_new, cost_))

        x, _, _ = jax.lax.fori_loop(0, n_iters, body, (x, lam, cost))

        rv, depth_ok = visual_residual(x)
        chi2 = jnp.sum(rv * rv, -1)
        inlier = (chi2 <= delta2) & valid & depth_ok

    # Marginal information for the next frame's ConstraintPoseImu.
    J_fin = jax.jacfwd(lambda x_: full_residual(x_, inlier.astype(
        jnp.float32)))(x)
    H_fin = jnp.matmul(J_fin.T, J_fin, precision=_HI)
    if with_prior:
        Hpp = H_fin[:15, :15] + 1e-6 * jnp.eye(15)
        Hpc = H_fin[:15, 15:]
        H_marg = H_fin[15:, 15:] - Hpc.T @ jnp.linalg.solve(Hpp, Hpc)
    else:
        H_marg = H_fin

    R, p, v, bg, ba = split(x)
    return PoseInertialResult(R=R, p=p, v=v, bg=bg, ba=ba,
                              inlier=inlier, n_inliers=inlier.sum(),
                              H_marg=H_marg)
