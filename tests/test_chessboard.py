"""Chessboard world-frame initialization tests (fork feature parity)."""

import cv2
import numpy as np

from orbslam3_byzyh_tpu.utils import chessboard as cb

K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float64)
CFG = cb.ChessboardConfig(width=9, height=6, square_size=0.04,
                          start_x=0.1, start_y=0.2, z_height=0.0)


def render_board(R_cw, t_cw, w=640, h=480, square_px=None):
    """Render the configured board under a known camera pose."""
    img = np.full((h, w), 180, np.uint8)
    # Board cells: corner (i,j) of the INNER grid sits between cells; render
    # (width+1)x(height+1) squares around the inner corners.
    sq = CFG.square_size
    for i in range(CFG.height + 1):
        for j in range(CFG.width + 1):
            if (i + j) % 2 == 0:
                continue
            # Cell corners in world coords.
            x0 = CFG.start_x + (j - 1) * sq
            y0 = CFG.start_y + (i - 1) * sq
            corners_w = np.array([
                [x0, y0, CFG.z_height], [x0 + sq, y0, CFG.z_height],
                [x0 + sq, y0 + sq, CFG.z_height], [x0, y0 + sq, CFG.z_height]])
            pc = corners_w @ R_cw.T + t_cw
            if (pc[:, 2] <= 0.05).any():
                continue
            uv = (pc @ K.T)
            uv = uv[:, :2] / uv[:, 2:3]
            cv2.fillConvexPoly(img, uv.astype(np.int32), 20)
    return img


def gt_pose():
    """Camera looking down at the board from 0.8 m with slight tilt."""
    from scipy.spatial.transform import Rotation
    R_wc = Rotation.from_euler("xyz", [180 + 10, 5, 3], degrees=True).as_matrix()
    cam_pos = np.array([0.28, 0.32, 0.8])
    R_cw = R_wc.T
    t_cw = -R_cw @ cam_pos
    return R_cw, t_cw


class TestChessboard:
    def test_detect_and_pose(self):
        R_cw, t_cw = gt_pose()
        img = render_board(R_cw, t_cw)
        corners = cb.detect_chessboard(img, CFG)
        assert corners is not None
        assert len(corners) == 54
        pose = cb.pose_from_chessboard(corners, CFG, K)
        assert pose is not None
        R_est, t_est = pose
        # The board's 180-deg yaw orientation is a rig convention (decided by
        # the pattern's color phase on a physical board); accept the pose up
        # to a yaw flip about the board normal.
        C_est = -R_est.T @ t_est
        C_gt = -R_cw.T @ t_cw
        # Height above the plane is yaw-invariant.
        assert abs(C_est[2] - C_gt[2]) < 0.01
        # Viewing direction w.r.t. the plane normal is yaw-invariant.
        n_est = R_est[2]  # camera z axis in world coords (row of R_cw)
        n_gt = R_cw[2]
        assert abs(n_est[2] - n_gt[2]) < 0.02
        # One of the two yaw hypotheses must match the full pose.
        Rz = np.diag([-1.0, -1.0, 1.0])
        errs = []
        for Ry in (np.eye(3), Rz):
            R_cand = R_est @ Ry  # yaw-flip in world frame (pre-multiplied
            # on world coords => R' = R_est @ Rz since p' = Rz p)
            dR = R_cand.T @ R_cw
            errs.append(np.degrees(np.arccos(
                np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        assert min(errs) < 1.0, errs

    def test_no_board_returns_none(self, rng):
        img = rng.integers(0, 255, (480, 640), dtype=np.uint8)
        assert cb.detect_chessboard(img, CFG) is None

    def test_rebase_transform_consistency(self):
        """Rebase maps the slam-frame camera pose onto the chess-frame one."""
        R_chess, t_chess = gt_pose()
        # Arbitrary slam-world pose of the same camera.
        from scipy.spatial.transform import Rotation
        R_slam = Rotation.from_euler("xyz", [5, -3, 8], degrees=True).as_matrix()
        t_slam = np.array([0.1, -0.2, 0.4])
        R_m, t_m = cb.rebase_transform(R_chess, t_chess,
                                       R_slam.astype(np.float32),
                                       t_slam.astype(np.float32))
        # A world point in slam frame maps into chess frame; reprojection via
        # either path must agree: R_slam p_s + t_s == R_chess (M p_s) + t_chess.
        p_s = np.array([0.3, 0.1, 2.0], np.float32)
        lhs = R_slam @ p_s + t_slam
        rhs = R_chess @ (R_m @ p_s + t_m) + t_chess
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)
