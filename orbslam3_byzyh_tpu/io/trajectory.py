"""Trajectory writers in the reference's TUM-format contract.

Output format parity (``System::SaveTrajectoryEuRoC``, SURVEY Appendix A):
``timestamp tx ty tz qx qy qz qw`` per line, timestamps in the same unit the
dataset used (EuRoC: nanoseconds written as float — evaluate_ate_scale.py
associates with max_difference=2e7 ns). Two artifacts per run: ``f_<name>.txt``
(every tracked frame) and ``kf_<name>.txt`` (keyframes only).
"""

from __future__ import annotations

import numpy as np

from ..ops import lie


def _pose_line(stamp: float, R_cw: np.ndarray, t_cw: np.ndarray,
               stamp_scale: float) -> str:
    """One TUM line. Pose written is Twc (camera-in-world), like the
    reference (System.cc SaveTrajectoryEuRoC uses Twc = Tcw^-1)."""
    import jax.numpy as jnp
    R_wc = R_cw.T
    t_wc = -R_wc @ t_cw
    q = np.asarray(lie.rot_to_quat(jnp.asarray(R_wc[None])))[0]  # (qx,qy,qz,qw)
    return (f"{stamp * stamp_scale:.6f} "
            f"{t_wc[0]:.7f} {t_wc[1]:.7f} {t_wc[2]:.7f} "
            f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}")


def save_tum(path: str, stamps, Rs, ts, stamp_scale: float = 1.0):
    """Write poses (world->cam) to a TUM-format file.

    stamp_scale=1e9 reproduces the reference's nanosecond convention for
    EuRoC sequences.
    """
    lines = [_pose_line(float(s), np.asarray(R), np.asarray(t), stamp_scale)
             for s, R, t in zip(stamps, Rs, ts)]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_tum(path: str):
    """Read a TUM trajectory -> (stamps, centers (N,3), quats (N,4))."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    return data[:, 0], data[:, 1:4], data[:, 4:8]
