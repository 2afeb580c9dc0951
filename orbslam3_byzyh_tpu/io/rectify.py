"""Stereo rectification map precompute (host-side, OpenCV).

Replaces the rectification block of ``Settings``
(/root/reference/src/Settings.h:157 precomputed maps, applied per frame in
the stereo example mains): from the calibration-1.0 keys (camera1/2
intrinsics + distortion + ``Stereo.T_c1_c2``) build remap tables and the
rectified virtual camera. The SLAM pipeline then runs as a plain rectified
stereo rig (row-aligned epipolar lines).
"""

from __future__ import annotations

import dataclasses

import cv2
import numpy as np


@dataclasses.dataclass
class RectifiedRig:
    map1x: np.ndarray
    map1y: np.ndarray
    map2x: np.ndarray
    map2y: np.ndarray
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float                  # baseline * fx of the rectified rig

    def rectify(self, img_left: np.ndarray, img_right: np.ndarray):
        l = cv2.remap(img_left, self.map1x, self.map1y, cv2.INTER_LINEAR)
        r = cv2.remap(img_right, self.map2x, self.map2y, cv2.INTER_LINEAR)
        return l, r


def build_rectification(cam1, cam2, T_c1_c2: np.ndarray) -> RectifiedRig:
    """cam1/cam2: io.settings.CameraSettings; T_c1_c2: 4x4 cam1<-cam2...
    EuRoC convention (Stereo.T_c1_c2 maps cam2 points into cam1)."""
    K1 = np.array([[cam1.params[0], 0, cam1.params[2]],
                   [0, cam1.params[1], cam1.params[3]], [0, 0, 1]], np.float64)
    K2 = np.array([[cam2.params[0], 0, cam2.params[2]],
                   [0, cam2.params[1], cam2.params[3]], [0, 0, 1]], np.float64)
    d1 = np.asarray(cam1.dist if cam1.dist is not None else np.zeros(4),
                    np.float64)
    d2 = np.asarray(cam2.dist if cam2.dist is not None else np.zeros(4),
                    np.float64)
    T = np.asarray(T_c1_c2, np.float64)
    # stereoRectify wants cam1->cam2: invert.
    R12, t12 = T[:3, :3], T[:3, 3]
    R = R12.T
    t = (-R12.T @ t12).reshape(3, 1)   # OpenCV 5 requires a column vector
    size = (cam1.width, cam1.height)
    R1, R2, P1, P2, _, _, _ = cv2.stereoRectify(
        K1, d1, K2, d2, size, R, t,
        flags=cv2.CALIB_ZERO_DISPARITY, alpha=0)
    m1x, m1y = cv2.initUndistortRectifyMap(K1, d1, R1, P1, size, cv2.CV_32FC1)
    m2x, m2y = cv2.initUndistortRectifyMap(K2, d2, R2, P2, size, cv2.CV_32FC1)
    bf = float(abs(P2[0, 3]))          # P2[0,3] = -fx * baseline
    return RectifiedRig(m1x, m1y, m2x, m2y,
                        fx=float(P1[0, 0]), fy=float(P1[1, 1]),
                        cx=float(P1[0, 2]), cy=float(P1[1, 2]), bf=bf)
