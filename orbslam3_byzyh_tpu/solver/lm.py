"""Levenberg-Marquardt primitives shared by all optimizers.

Replaces g2o's core machinery (/root/reference/Thirdparty/g2o/g2o/core/
optimization_algorithm_levenberg.cpp, robust_kernel_impl.cpp) with batched,
mask-aware JAX building blocks: robust weights, normal-equation assembly and
damped solves, shaped for vmap/shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# Chi2 thresholds (95%): 2-dof (mono) and 3-dof (stereo) — Optimizer.cc:278-280.
CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """Huber IRLS weight as a function of squared error.

    g2o applies rho'(chi2); for Huber: w = 1 if chi2 <= delta2 else
    delta/sqrt(chi2).
    """
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def assemble_normal(J: jnp.ndarray, r: jnp.ndarray, w: jnp.ndarray):
    """H = sum_i w_i J_i^T J_i, b = sum_i w_i J_i^T r_i.

    J: (N, res_dim, P); r: (N, res_dim); w: (N,) combined weight
    (robust * info * validity). Returns (H (P,P), b (P,)).
    """
    Jw = J * w[:, None, None]
    H = jnp.einsum("nri,nrj->ij", Jw, J, precision=_HI)
    b = jnp.einsum("nri,nr->i", Jw, r, precision=_HI)
    return H, b


def solve_damped(H: jnp.ndarray, b: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Solve (H + lam * diag(H)) dx = b (Marquardt scaling)."""
    diag = jnp.diagonal(H)
    Hd = H + jnp.diag(lam * jnp.maximum(diag, 1e-9))
    return jnp.linalg.solve(Hd, b)


def lm_step(x, lam, cost, build_fn, retract_fn,
            lam_up: float = 10.0, lam_down: float = 0.5):
    """One accept/reject LM iteration, branch-free.

    build_fn(x) -> (H, b, cost); retract_fn(x, dx) -> x'. The candidate step
    is accepted iff it lowers the cost; lambda adapts either way.
    """
    H, b, _ = build_fn(x)
    dx = solve_damped(H, b, lam)
    x_new = retract_fn(x, dx)
    _, _, cost_new = build_fn(x_new)
    accept = cost_new < cost
    x = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), x, x_new)
    lam = jnp.where(accept, lam * lam_down, lam * lam_up)
    cost = jnp.where(accept, cost_new, cost)
    return x, lam, cost
