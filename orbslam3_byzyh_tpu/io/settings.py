"""Typed settings reader for the reference's YAML calibration files.

Replaces ``Settings`` (/root/reference/src/Settings.cc, calibration format
"1.0") and the legacy per-section parsers in Tracking
(``ParseCamParamFile`` /root/reference/src/Tracking.cc:688). Reads the same
keys via cv2.FileStorage (the files carry the %YAML:1.0 directive, which
OpenCV wrote and plain YAML parsers reject).

Known reference bug NOT replicated: ``Settings::camera2DistortionCoef``
returns camera1's distortion (Settings.h:72) — we read camera2's own.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import cv2
import numpy as np


@dataclasses.dataclass
class CameraSettings:
    model: str                      # "PinHole" | "KannalaBrandt8" | "Rectified"
    params: np.ndarray              # [fx, fy, cx, cy, (+k0..k3 for KB8)]
    dist: Optional[np.ndarray]      # radtan [k1,k2,p1,p2,(k3)] or None
    width: int
    height: int


@dataclasses.dataclass
class ImuSettings:
    noise_gyro: float
    noise_acc: float
    walk_gyro: float
    walk_acc: float
    frequency: float
    Tbc: np.ndarray                 # (4, 4) body<-camera


@dataclasses.dataclass
class OrbSettings:
    n_features: int = 1200
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7


@dataclasses.dataclass
class ChessboardSettings:
    """Fork-specific chessboard world-frame init keys (read in the Tracking
    ctor, /root/reference/src/Tracking.cc:158-185)."""
    width: int
    height: int
    square_size: float
    start_x: float = 0.0
    start_y: float = 0.0
    z_height: float = 0.0


@dataclasses.dataclass
class SlamSettings:
    cam1: CameraSettings
    cam2: Optional[CameraSettings]
    imu: Optional[ImuSettings]
    orb: OrbSettings
    fps: float
    rgb: bool
    bf: Optional[float] = None      # stereo baseline*fx
    th_depth: Optional[float] = None
    Tlr: Optional[np.ndarray] = None
    chessboard: Optional[ChessboardSettings] = None
    # Atlas persistence (System.SaveAtlasToFile / LoadAtlasFromFile,
    # /root/reference/include/Settings.h:115-116).
    save_atlas: Optional[str] = None
    load_atlas: Optional[str] = None


def _read(fs, key, default=None, required=False):
    node = fs.getNode(key)
    if node is None or node.empty():
        if required:
            raise KeyError(f"missing required setting {key}")
        return default
    if node.isString():
        return node.string()
    if node.isMap() or (node.isSeq() if hasattr(node, "isSeq") else False):
        try:
            return node.mat()
        except cv2.error:
            return None
    return node.real()


def _read_camera(fs, idx: int, fallback_size=None) -> Optional[CameraSettings]:
    prefix = f"Camera{idx}"
    cam_type = _read(fs, f"{prefix}.type") or _read(fs, "Camera.type")
    fx = _read(fs, f"{prefix}.fx")
    if fx is None and idx == 1:
        # Legacy single-camera format (Camera.fx ...).
        prefix = "Camera"
        fx = _read(fs, "Camera.fx")
        cam_type = cam_type or "PinHole"
    if fx is None:
        return None
    fy = _read(fs, f"{prefix}.fy", required=True)
    cx = _read(fs, f"{prefix}.cx", required=True)
    cy = _read(fs, f"{prefix}.cy", required=True)
    w = _read(fs, "Camera.width") or _read(fs, "Camera1.width") or 0
    h = _read(fs, "Camera.height") or _read(fs, "Camera1.height") or 0
    w = int(w or (fallback_size or (0, 0))[0])
    h = int(h or (fallback_size or (0, 0))[1])

    if cam_type and "KannalaBrandt" in str(cam_type):
        ks = [_read(fs, f"{prefix}.k{i}", 0.0) for i in range(1, 5)]
        params = np.array([fx, fy, cx, cy, *ks], np.float32)
        return CameraSettings("KannalaBrandt8", params, None, w, h)

    dist_keys = ["k1", "k2", "p1", "p2", "k3"]
    dist = [_read(fs, f"{prefix}.{k}") for k in dist_keys]
    if dist[0] is None:
        dist_arr = None
    else:
        dist_arr = np.array([d or 0.0 for d in dist], np.float32)
        if abs(dist_arr).sum() == 0:
            dist_arr = None
    params = np.array([fx, fy, cx, cy], np.float32)
    return CameraSettings(str(cam_type or "PinHole"), params, dist_arr, w, h)


def load_settings(path: str) -> SlamSettings:
    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(path)
    try:
        cam1 = _read_camera(fs, 1)
        if cam1 is None:
            raise KeyError(f"no camera intrinsics in {path}")
        cam2 = _read_camera(fs, 2, fallback_size=(cam1.width, cam1.height))

        imu = None
        ng = _read(fs, "IMU.NoiseGyro")
        if ng is not None:
            freq = float(_read(fs, "IMU.Frequency", 200.0))
            Tbc = _read(fs, "IMU.T_b_c1")
            if Tbc is None:
                Tbc = _read(fs, "Tbc")
            imu = ImuSettings(
                noise_gyro=float(ng), noise_acc=float(_read(fs, "IMU.NoiseAcc", 0.0)),
                walk_gyro=float(_read(fs, "IMU.GyroWalk", 0.0)),
                walk_acc=float(_read(fs, "IMU.AccWalk", 0.0)),
                frequency=freq,
                Tbc=np.asarray(Tbc, np.float64) if Tbc is not None else np.eye(4))

        orb = OrbSettings(
            n_features=int(_read(fs, "ORBextractor.nFeatures", 1200)),
            scale_factor=float(_read(fs, "ORBextractor.scaleFactor", 1.2)),
            n_levels=int(_read(fs, "ORBextractor.nLevels", 8)),
            ini_th_fast=int(_read(fs, "ORBextractor.iniThFAST", 20)),
            min_th_fast=int(_read(fs, "ORBextractor.minThFAST", 7)))

        fps = float(_read(fs, "Camera.fps", 30.0))
        rgb = bool(int(_read(fs, "Camera.RGB", 1)))
        bf = _read(fs, "Camera.bf")
        if bf is None:
            # Rectified-pair configs give the metric baseline instead
            # (Stereo.b; bf = b * fx — Settings.cc rectified branch).
            b = _read(fs, "Stereo.b")
            if b is not None:
                bf = float(b) * float(cam1.params[0])
        th_depth = _read(fs, "Camera.ThDepth") or _read(fs, "Stereo.ThDepth")
        Tlr = _read(fs, "Stereo.T_c1_c2")
        if Tlr is None:
            # Legacy 3x4 left->right key (Stereo.Tlr / Tlr, TUM-VI yamls).
            Tlr = _read(fs, "Stereo.Tlr")
            if Tlr is None:
                Tlr = _read(fs, "Tlr")
        if Tlr is not None:
            Tlr = np.asarray(Tlr, np.float64)
            if Tlr.shape == (3, 4):
                Tlr = np.vstack([Tlr, [0.0, 0.0, 0.0, 1.0]])

        chessboard = None
        use_cb = _read(fs, "UseChessboardInit")
        if isinstance(use_cb, str):
            use_cb = use_cb.strip().lower() in ("1", "true", "yes", "on")
        if use_cb:
            chessboard = ChessboardSettings(
                width=int(_read(fs, "ChessboardWidth", 9)),
                height=int(_read(fs, "ChessboardHeight", 6)),
                square_size=float(_read(fs, "SquareSize", 0.025)),
                start_x=float(_read(fs, "StartX", 0.0)),
                start_y=float(_read(fs, "StartY", 0.0)),
                z_height=float(_read(fs, "ZHeight", 0.0)))

        save_atlas = _read(fs, "System.SaveAtlasToFile")
        load_atlas = _read(fs, "System.LoadAtlasFromFile")

        return SlamSettings(
            cam1=cam1, cam2=cam2, imu=imu, orb=orb, fps=fps, rgb=rgb,
            bf=float(bf) if bf is not None else None,
            th_depth=float(th_depth) if th_depth is not None else None,
            Tlr=np.asarray(Tlr, np.float64) if Tlr is not None else None,
            chessboard=chessboard,
            save_atlas=str(save_atlas) if save_atlas else None,
            load_atlas=str(load_atlas) if load_atlas else None)
    finally:
        fs.release()
