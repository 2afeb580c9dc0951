"""Chessboard-based world-frame initialization (the fork's headline feature).

Parity with the Zyh fork additions (/root/reference/src/Tracking.cc):
``DetectChessboard`` (:2044) — findChessboardCornersSB + row-major sort
(y desc, x asc); ``ComputePoseFromChessboard`` (:2115) — plane-homography
decomposition (r1 = K^-1 h1 / ||.||, r2, r3 = r1 x r2, SVD re-orthogonalize)
against the configured board geometry (SquareSize/StartX/StartY/ZHeight);
``TransformAllMapElements`` (:2306) — rigid rebase of all keyframes and
landmarks into the chessboard world frame once SLAM has initialized.

Config keys mirrored: UseChessboardInit, ChessboardWidth/Height, SquareSize,
StartX/StartY, ZHeight (read in the Tracking ctor, Tracking.cc:158-185).

All of this is host-side OpenCV work (it runs once at startup); the rebase
itself is a batched array op on the MapState.
"""

from __future__ import annotations

import dataclasses

import cv2
import numpy as np


@dataclasses.dataclass
class ChessboardConfig:
    width: int            # inner corners per row
    height: int           # inner corners per column
    square_size: float    # meters
    start_x: float = 0.0  # world coords of the board origin corner
    start_y: float = 0.0
    z_height: float = 0.0


def detect_chessboard(img: np.ndarray, cfg: ChessboardConfig):
    """Detect corners in the detector's native row-major grid order.

    The reference re-sorts corners into 5-px y-bands (DetectChessboard
    :2062-2070), which only works when board rows are near-horizontal in the
    image (its top-down rig). findChessboardCornersSB already returns a
    consistent grid order up to the board's 180-deg symmetry, which
    ``pose_from_chessboard`` resolves — so the fragile sort is dropped.
    """
    img8 = img.astype(np.uint8) if img.dtype != np.uint8 else img
    found, corners = cv2.findChessboardCornersSB(
        img8, (cfg.width, cfg.height))
    if not found or corners is None:
        return None
    return corners.reshape(-1, 2).astype(np.float64)


def board_world_points(cfg: ChessboardConfig) -> np.ndarray:
    """3D world corner coordinates (ComputePoseFromChessboard :2150-2160)."""
    pts = []
    for i in range(cfg.height):
        for j in range(cfg.width):
            pts.append([cfg.start_x + j * cfg.square_size,
                        cfg.start_y + i * cfg.square_size,
                        cfg.z_height])
    return np.asarray(pts, np.float64)


def pose_from_chessboard(corners: np.ndarray, cfg: ChessboardConfig,
                         K: np.ndarray):
    """Camera pose (world->cam) in the chessboard world frame.

    Homography-decomposition like the reference (:2155-2260): H maps board
    plane coords -> pixels; r1 = K^-1 h1 / s, r2 = K^-1 h2 / s, r3 = r1 x r2,
    then SVD re-orthogonalization. Refined with solvePnP for accuracy
    (improvement over the reference, which stops at the homography).
    Returns (R_cw (3,3), t_cw (3,)) or None.
    """
    n = cfg.width * cfg.height
    if corners is None or len(corners) != n:
        return None
    # The detector's grid order is ambiguous relative to the configured world
    # layout: 180-deg board symmetry plus the row direction depending on the
    # camera's orientation. Try all four row/column orientations and keep the
    # pose with the lowest reprojection error (robustness improvement — the
    # reference assumes its specific top-down rig orientation).
    grid = corners.reshape(cfg.height, cfg.width, 2)
    candidates = (corners, grid[::-1].reshape(-1, 2),
                  grid[:, ::-1].reshape(-1, 2),
                  grid[::-1, ::-1].reshape(-1, 2))
    # All four fit a plane equally well (planar mirror ambiguity): a flipped
    # correspondence equals the pose reflected through the board plane. The
    # physical tiebreak: the camera sits ABOVE the board (center z >
    # z_height, world z up) — the fork rig's convention.
    best = None
    for cand in candidates:
        pose = _pose_one_ordering(cand, cfg, K)
        if pose is None:
            continue
        R_cw, t_cw = pose
        center = -R_cw.T @ t_cw
        if center[2] <= cfg.z_height:
            continue
        err = _reproj_err(pose, cfg, K, cand)
        if best is None or err < best[0]:
            best = (err, pose)
    if best is None or best[0] > 3.0:
        return None
    return best[1]


def _reproj_err(pose, cfg, K, corners):
    R_cw, t_cw = pose
    world = board_world_points(cfg)
    pc = world @ R_cw.T + t_cw
    uv = pc @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    return float(np.linalg.norm(uv - corners, axis=-1).mean())


def _pose_one_ordering(corners: np.ndarray, cfg: ChessboardConfig,
                       K: np.ndarray):
    """Pose for one corner ordering via planar PnP (IPPE).

    The reference decomposes the plane homography by hand (:2155-2260);
    OpenCV's IPPE solver is the same planar geometry with better
    conditioning, refined by iterative PnP.
    """
    world = board_world_points(cfg)
    try:
        ok, rvec, tvec = cv2.solvePnP(
            world.reshape(-1, 1, 3), corners.reshape(-1, 1, 2),
            K.astype(np.float64), None, flags=cv2.SOLVEPNP_IPPE)
    except cv2.error:
        ok = False
    if not ok:
        ok, rvec, tvec = cv2.solvePnP(
            world.reshape(-1, 1, 3), corners.reshape(-1, 1, 2),
            K.astype(np.float64), None, flags=cv2.SOLVEPNP_ITERATIVE)
        if not ok:
            return None
    ok, rvec, tvec = cv2.solvePnP(
        world.reshape(-1, 1, 3), corners.reshape(-1, 1, 2),
        K.astype(np.float64), None, rvec=rvec, tvec=tvec,
        useExtrinsicGuess=True, flags=cv2.SOLVEPNP_ITERATIVE)
    R_cw = cv2.Rodrigues(rvec)[0]
    t_cw = tvec.reshape(3)
    depths = (world @ R_cw.T + t_cw)[:, 2]
    if (depths <= 0).any():
        return None
    return R_cw.astype(np.float32), t_cw.astype(np.float32)


def rebase_transform(R_chess_cam, t_chess_cam, R_slam_cam, t_slam_cam):
    """SE3 M = chess_world <- slam_world from one camera seen in both frames.

    p_chess = R_m p_slam + t_m with M = Tc_chess^{-1} * Tc_slam
    (TransformAllMapElements :2306 math).
    """
    R_wc = R_chess_cam.T
    t_wc = -R_wc @ t_chess_cam
    R_m = R_wc @ R_slam_cam
    t_m = R_wc @ t_slam_cam + t_wc
    return R_m.astype(np.float32), t_m.astype(np.float32)


def rebase_map(state, R_m, t_m, scale: float = 1.0):
    """Apply p' = s * (R_m p + t_m) to landmarks; Tcw' = Tcw * M^{-1} with
    translation scaled — batched MapState version of TransformAllMapElements.

    scale=1.0 reproduces the fork's rigid-only rebase; a metric scale from
    the board geometry may be passed (improvement, off by default).
    """
    import jax.numpy as jnp

    R_m = jnp.asarray(R_m)
    t_m = jnp.asarray(t_m)
    kfs, lms = state.kfs, state.lms
    # Tcw' = Tcw * M^{-1}: R' = R R_m^T; t' = s*t - R R_m^T t_m ... derive:
    # x_cam = R p_slam + t; p_slam = R_m^T (p_chess/s - t_m)  =>
    # x_cam = (R R_m^T / s) p_chess + (t - R R_m^T t_m). Keep rotations
    # orthonormal: fold 1/s into translation instead (poses scale-consistent
    # with scaled landmarks when t is multiplied by s).
    R_new = jnp.einsum("kij,lj->kil", kfs.R, R_m)   # R @ R_m^T
    t_new = scale * (kfs.t - jnp.einsum("kij,j->ki", R_new, t_m))
    pos_new = scale * (lms.pos @ R_m.T + t_m)
    normal_new = lms.normal @ R_m.T
    kfs = kfs._replace(R=R_new, t=t_new)
    lms = lms._replace(pos=pos_new, normal=normal_new,
                       min_dist=lms.min_dist * scale,
                       max_dist=lms.max_dist * scale)
    return state._replace(kfs=kfs, lms=lms)
