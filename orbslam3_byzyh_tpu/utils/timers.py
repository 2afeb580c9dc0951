"""Per-stage timing statistics (REGISTER_TIMES parity).

The reference gates per-stage chrono timers behind the compile-time flag
``REGISTER_TIMES`` (/root/reference/include/Settings.h:23-24; vectors in
Tracking.h:182-196, printed by ``Tracking::PrintTimeStats``
src/Tracking.cc:318 into ``ExecTimeMean.txt``). Same stage taxonomy here,
enabled by constructing a ``StageTimers``; JAX dispatch is async, so timed
sections must end with a ``block_until_ready`` on their outputs to be
meaningful (the pipeline does this at stage boundaries).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np

# Reference stage taxonomy (Tracking.h:182-196, LocalMapping.h:114-131).
STAGES = (
    "orb_extract", "stereo_match", "imu_preint", "pose_pred",
    "lm_track", "new_kf_decision", "total_track",
    "kf_insert", "mp_culling", "mp_creation", "lba", "kf_culling",
    "total_mapping", "loop_detect", "loop_correct", "global_ba",
)


class StageTimers:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[stage].append(time.perf_counter() - t0)

    def stats(self):
        out = {}
        for k, v in self.samples.items():
            a = np.asarray(v)
            out[k] = dict(mean=float(a.mean()), std=float(a.std()),
                          n=len(a), total=float(a.sum()))
        return out

    def report(self) -> str:
        lines = ["stage                    mean(ms)   std(ms)      n"]
        for k, s in sorted(self.stats().items()):
            lines.append(f"{k:24s} {s['mean']*1e3:9.2f} {s['std']*1e3:9.2f} "
                         f"{s['n']:6d}")
        return "\n".join(lines)

    def save(self, path: str = "ExecTimeMean.txt"):
        """Same artifact name as the reference's PrintTimeStats output."""
        with open(path, "w") as f:
            f.write(self.report() + "\n")
