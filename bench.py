"""Benchmark: tracking frames/s per chip on the flagship per-frame step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: EuRoC sensor rate = 20 fps (the reference's real-time claim on an
i7-class CPU, /root/reference/README.md:61 + mono_euroc.cc:80). Target from
BASELINE.md: >= 2x real-time per chip (vs_baseline >= 2.0).
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")



def _enable_compile_cache():
    """The axon remote compiler is slow for large programs (minutes); the
    persistent cache makes every compile one-time per machine."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    _enable_compile_cache()
    import jax
    import numpy as np

    from orbslam3_byzyh_tpu import graft

    fn = jax.jit(graft.tracking_step)
    args = list(graft.example_tracking_args())

    # Warmup / compile.
    out = fn(*args)
    jax.block_until_ready(out)

    # Unique image per iteration: the axon runtime memoizes identical
    # (executable, inputs) calls, which would fake the numbers.
    rng = np.random.default_rng(123)
    n_iters = 50
    imgs = [np.asarray(rng.uniform(0, 255, np.asarray(args[0]).shape),
                       np.float32) for _ in range(n_iters)]
    imgs = [jax.device_put(im) for im in imgs]
    jax.block_until_ready(imgs)
    outs = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        args[0] = imgs[i]
        outs.append(fn(*args))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    fps = n_iters / dt

    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
